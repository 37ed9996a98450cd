"""min-SNR-gamma loss-weighting quality demo on the chip.

Trains TWO identical conditional 3D Ylm Gaussian pipelines — same init
seed, same data order, same step budget — one with the unweighted MSE the
reference uses everywhere (/root/reference/rho_diffusion/diffusion/
gaussian_diffusion.py:861-934) and one with ``loss_weighting='min_snr'``
(Hang et al., arXiv:2303.09556). Then DDIM-samples the SAME (l, m)
conditions from both and measures conditional fidelity (matched-condition
field MSE + Sinkhorn vs the ground-truth fields). A Y_lm density is a
deterministic function of its condition, so matched MSE directly measures
what the weighting buys at a fixed training budget.

Outputs docs/demo/demo_min_snr_metrics.json.

Env knobs: DEMO_GRID (16), DEMO_BATCH (16), DEMO_STEPS (1000),
DEMO_GAMMA (5.0), DEMO_SAMPLER (ddim), DEMO_NUM_STEPS (50).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rho_diffusion_tpu.utils import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()
import jax  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rho_diffusion_tpu.data import DataLoader, SphericalHarmonicDataset  # noqa: E402
from rho_diffusion_tpu.data.loader import prefetch_to_device  # noqa: E402
from rho_diffusion_tpu.data.synthetic import compute_spherical_harmonic  # noqa: E402
from rho_diffusion_tpu.diffusion import (  # noqa: E402
    GaussianDiffusionPipeline,
    LinearSchedule,
)
from rho_diffusion_tpu.metrics import WassersteinWrapper  # noqa: E402
from rho_diffusion_tpu.utils import calculate_sha512_embedding  # noqa: E402

GRID = int(os.environ.get("DEMO_GRID", 16))
BATCH = int(os.environ.get("DEMO_BATCH", 16))
STEPS = int(os.environ.get("DEMO_STEPS", 1000))
GAMMA = float(os.environ.get("DEMO_GAMMA", 5.0))
SAMPLER = os.environ.get("DEMO_SAMPLER", "ddim")
NUM_STEPS = int(os.environ.get("DEMO_NUM_STEPS", 50))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "demo")
os.makedirs(OUT, exist_ok=True)

MC = 64
backbone_kwargs = dict(
    data_shape=(GRID,) * 3, dims=3, in_channels=1, out_channels=1,
    model_channels=MC, num_res_blocks=2, channel_mult=(1, 2, 4),
    attention_resolutions=[8, 4], num_heads=4, num_classes=20,
    use_scale_shift_norm=True, dtype=jnp.bfloat16,
)


def train_one(loss_weighting):
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2", backbone_kwargs=backbone_kwargs,
        schedule=LinearSchedule(1000), model_mean_type="epsilon",
        model_var_type="fixed_large", optimizer="AdamW",
        opt_kwargs={"lr": 2e-4}, ema_decay=0.9999,
        loss_weighting=loss_weighting, min_snr_gamma=GAMMA,
    )
    state = pipe.create_state(jax.random.PRNGKey(777))
    dset = SphericalHarmonicDataset(
        max_l=5, grid_el=GRID, length=max(BATCH * (STEPS + 8), 256),
    )
    # num_workers=0: the controlled comparison ("same data order" between
    # arms) requires a single-threaded draw from the dataset's RNG stream —
    # worker threads would interleave draws nondeterministically. Fields
    # are memoised, so the loader is not the bottleneck here anyway.
    loader = DataLoader(dset, batch_size=BATCH, num_workers=0)
    curve, t0 = [], time.perf_counter()
    for i, b in enumerate(prefetch_to_device(iter(loader))):
        if i >= STEPS:
            break
        state, metrics = pipe.training_step(state, b)
        if i % 100 == 0 or i == STEPS - 1:
            # 'mse' is ALWAYS the unweighted per-target MSE, the comparable
            # quantity across the two objectives
            rec = {"step": i, "loss": float(metrics["train_loss"]),
                   "mse": float(metrics.get("mse", metrics["train_loss"]))}
            curve.append(rec)
            print(f"[{loss_weighting or 'unweighted'}] step {i} "
                  f"loss {rec['loss']:.4f} mse {rec['mse']:.4f} "
                  f"({(i + 1) / (time.perf_counter() - t0):.2f} steps/s)",
                  flush=True)
    return pipe, state, dset, curve, time.perf_counter() - t0


def evaluate(pipe, state, dset, w):
    pairs = [(l, m) for l in range(dset.max_l) for m in range(-l, l + 1)][:BATCH]
    conds = jnp.asarray(np.stack([
        calculate_sha512_embedding({"l": l, "m": m}, l=4 * MC) for l, m in pairs
    ]))
    grid = {k: dset.grid_kwargs[k] for k in ("x", "y", "z")}
    real = np.stack([
        compute_spherical_harmonic(**grid, m=m, l=l)[1].astype(np.float32)[..., None]
        for l, m in pairs
    ])
    params = state.ema_params if state.ema_params is not None else state.params
    shape = pipe.sample_shape(BATCH)
    fn = jax.jit(lambda p, r, c: pipe.reverse_process(
        p, r, shape, c, sampler=SAMPLER, num_steps=NUM_STEPS,
    ))
    t0 = time.perf_counter()
    samples = np.asarray(fn(params, jax.random.PRNGKey(5), conds))
    wall = time.perf_counter() - t0
    return {
        "matched_mse": float(np.mean((samples - real) ** 2)),
        "sinkhorn": float(np.mean(np.asarray(
            w(jnp.asarray(samples), jnp.asarray(real))))),
        "sample_wall_s": round(wall, 2),
        "finite": bool(np.isfinite(samples).all()),
    }, real


w = WassersteinWrapper()
report = {"grid": GRID, "batch": BATCH, "steps": STEPS, "gamma": GAMMA,
          "sampler": f"{SAMPLER}-{NUM_STEPS}", "arms": {}}
real = None
for arm in (None, "min_snr"):
    pipe, state, dset, curve, wall = train_one(arm)
    metrics, real = evaluate(pipe, state, dset, w)
    key = arm or "unweighted"
    report["arms"][key] = {
        "train_wall_s": round(wall, 1), "curve": curve, **metrics,
    }
    print(f"== {key}: matched MSE {metrics['matched_mse']:.5f} "
          f"sinkhorn {metrics['sinkhorn']:.3f}", flush=True)

noise = np.asarray(jax.random.normal(jax.random.PRNGKey(0), real.shape))
report["noise_baseline"] = {
    "matched_mse": float(np.mean((noise - real) ** 2)),
    "sinkhorn": float(np.mean(np.asarray(
        w(jnp.asarray(noise), jnp.asarray(real))))),
}

with open(os.path.join(OUT, "demo_min_snr_metrics.json"), "w") as f:
    json.dump(report, f, indent=2)
print("wrote docs/demo/demo_min_snr_metrics.json", flush=True)
