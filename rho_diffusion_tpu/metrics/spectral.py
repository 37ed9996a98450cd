"""1D spectral structure metrics (rotational-spectroscopy combs).

Shared by the Spectroscopy-1D quality demos and rescoring harnesses
(benchmarks/demo_spectro1d.py, benchmarks/spectro_rescore.py): a rigid
rotor's absorption spectrum is a comb of near-evenly-spaced peaks
(spacing ~ 2B), so generated spectra can be scored for comb STRUCTURE
independently of pixel fidelity. The reference framework trained this
workload (/root/reference/rho_diffusion/data/spectroscopy.py:35-189) but
never scored generated samples at all.
"""
from __future__ import annotations

import numpy as np


def peak_stats(spec: np.ndarray, smooth: int = 5, threshold: float = 0.05):
    """Local maxima above ``threshold`` -> (count, comb regularity std/mean).

    The spectrum is lightly box-smoothed (``smooth`` bins ~ 1/16 linewidth
    at the demo's grid) first: a full-T ancestral sampler leaves per-bin
    speckle that creates spurious local maxima, and the metric should score
    the comb STRUCTURE, not the sampler's noise floor (real spectra are
    unaffected — their peaks are ~3 bins wide and survive the smoothing
    unchanged; calibrated in RESULTS.md round 4)."""
    s = np.convolve(spec, np.ones(smooth) / float(smooth), mode="same")
    pk = (
        np.where((s[1:-1] > s[:-2]) & (s[1:-1] >= s[2:]) & (s[1:-1] > threshold))[0]
        + 1
    )
    # merge peaks closer than 3 bins (shoulders)
    if len(pk) > 1:
        keep = [pk[0]]
        for p in pk[1:]:
            if p - keep[-1] >= 3:
                keep.append(p)
        pk = np.asarray(keep)
    if len(pk) < 3:
        return len(pk), np.nan
    sp = np.diff(pk).astype(np.float64)
    return len(pk), float(sp.std() / sp.mean())


def comb_metrics(gen: np.ndarray, real: np.ndarray) -> dict:
    """Comb-structure summary of generated vs real spectra.

    ``gen``/``real``: [N, G] arrays. Returns comb fraction (>= 3 peaks and
    regularity < 0.25 — the strict threshold under which the REAL corpus
    itself scores ~0.42, the detector's ceiling), median regularities, and
    baseline/negativity fractions."""
    gen_stats = [peak_stats(g) for g in gen]
    real_stats = [peak_stats(r) for r in real]
    reg = np.asarray([r for _, r in gen_stats if np.isfinite(r)])
    reg_real = np.asarray([r for _, r in real_stats if np.isfinite(r)])
    return {
        "comb_fraction": float(
            np.mean([(c >= 3 and np.isfinite(r) and r < 0.25) for c, r in gen_stats]),
        ),
        "comb_fraction_real": float(
            np.mean([(c >= 3 and np.isfinite(r) and r < 0.25) for c, r in real_stats]),
        ),
        "comb_regularity_median_gen": float(np.median(reg)) if reg.size else None,
        "comb_regularity_median_real": float(np.median(reg_real)),
        "baseline_fraction_below_0.02": float((gen < 0.02).mean()),
        "negative_fraction": float((gen < -0.05).mean()),
    }
