"""Spectroscopy-1D end-to-end quality demo (round 4).

Trains the reference's 1D workload — `examples/config_spectroscopy.json`
(reference ``/root/reference/rho_diffusion/data/spectroscopy.py:35-189``,
Conv1d UNet over simulated line spectra) — on a rigid-rotor synthetic
corpus with the real HDF5 schema (``rho_diffusion_tpu/data/spectro_synth.py``)
and scores the GENERATED spectra, proving the Conv1d path *trains*, not
just runs:

* **nearest-neighbour MSE** of each generated spectrum against the
  training set (are samples on the data manifold?);
* **Sinkhorn divergence** between generated and real sets;
* **physics checks** exploiting rotor structure: generated spectra must be
  non-negative combs of near-evenly-spaced peaks (spacing ~ 2B) on a flat
  baseline — scored as comb regularity (std/mean of peak spacings), peak
  counts, and baseline fraction;
* an overlay PNG of generated spectra vs their nearest real neighbour.

Training is unconditional, like the reference config (no num_classes).
Env knobs: DEMO_EPOCHS, DEMO_BATCH (16), DEMO_MOLECULES (64), DEMO_GRID
(1024), DEMO_RECIPE (reference | zero_snr), DEMO_SMOKE, DEMO_WORKDIR.
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "demo")
os.makedirs(OUT, exist_ok=True)

SMOKE = int(os.environ.get("DEMO_SMOKE", "0"))
EPOCHS = int(os.environ.get("DEMO_EPOCHS", "4" if SMOKE else "800"))
BATCH = int(os.environ.get("DEMO_BATCH", "16"))
N_MOL = int(os.environ.get("DEMO_MOLECULES", "8" if SMOKE else "64"))
GRID = int(os.environ.get("DEMO_GRID", "256" if SMOKE else "1024"))
RECIPE = os.environ.get("DEMO_RECIPE", "reference")
WORKDIR = os.environ.get("DEMO_WORKDIR", "/tmp/rho_spectro1d_" + RECIPE)
LINEWIDTH = 80.0  # fixed -> spectra deterministic -> NN-MSE meaningful

os.makedirs(WORKDIR, exist_ok=True)
H5 = os.path.join(WORKDIR, "spectra.h5")

from rho_diffusion_tpu.config import ComponentConfig, ExperimentConfig  # noqa: E402
from rho_diffusion_tpu.data.spectro_synth import write_rotor_spectra_h5  # noqa: E402
from rho_diffusion_tpu.metrics import WassersteinWrapper  # noqa: E402
from rho_diffusion_tpu.training.trainer import Trainer  # noqa: E402

if not os.path.exists(H5):
    write_rotor_spectra_h5(H5, N_MOL)
    print(f"wrote {H5} ({N_MOL} rotors)", flush=True)

config = ExperimentConfig.from_json(
    os.path.join(REPO, "examples", "config_spectroscopy.json"),
)
config.dataset.kwargs.update(
    h5_path=H5, grid_size=GRID, linewidth=LINEWIDTH,
)
config.model.kwargs["data_shape"] = [GRID]
config.training.batch_size = BATCH
config.training.max_epochs = EPOCHS
config.training.min_epochs = 1
config.training.sample_every_n_epochs = 10**9
config.training.save_checkpoint_every_n_epochs = max(EPOCHS // 2, 1)
if config.lr_scheduler is not None:
    config.lr_scheduler.kwargs["T_max"] = EPOCHS
if RECIPE == "zero_snr":
    config.noise_schedule.kwargs["zero_terminal_snr"] = True
    config.pipeline = ComponentConfig(
        name="GaussianDiffusionPipeline",
        kwargs={"model_mean_type": "v_prediction", "model_var_type": "fixed_small"},
    )
elif RECIPE != "reference":
    raise SystemExit(f"unknown DEMO_RECIPE {RECIPE!r}")
if SMOKE:
    config.model.kwargs.update(
        model_channels=8, num_res_blocks=1, attention_resolutions=[], num_heads=1,
    )
    config.noise_schedule.kwargs.update(num_steps=20, beta_1=2e-4, beta_T=1e-2)
    config.training.dtype = "float32"

trainer = Trainer(config, work_dir=WORKDIR)
dset = trainer.dataset
real = np.stack([dset[i]["spectrum"] for i in range(len(dset))])  # [N, G, 1]

t0 = time.perf_counter()
state = trainer.fit()
train_wall = time.perf_counter() - t0
print(f"trained {EPOCHS} epochs in {train_wall:.1f}s", flush=True)

pipe = trainer.pipeline
params = state.ema_params if state.ema_params is not None else state.params
n = real.shape[0]

if RECIPE == "zero_snr":
    fn = jax.jit(lambda p, r: pipe.reverse_process(
        p, r, (BATCH, GRID, 1), None, sampler="ddim", num_steps=100,
    ))
else:
    fn = jax.jit(lambda p, r: pipe.reverse_process(
        p, r, (BATCH, GRID, 1), None,
    )["denoised"])
t0 = time.perf_counter()
gen = np.concatenate([
    np.asarray(fn(params, jax.random.PRNGKey(2000 + i)), np.float32)
    for i in range((n + BATCH - 1) // BATCH)
])[:n]
sample_wall = time.perf_counter() - t0

# -- metrics ---------------------------------------------------------------
# nearest-neighbour MSE over the training set (memorisation-style fidelity,
# the right target for a 64-sample corpus)
d2 = ((gen[:, None, :, 0] - real[None, :, :, 0]) ** 2).mean(-1)  # [N, N]
nn_idx = d2.argmin(1)
nn_mse = float(d2[np.arange(n), nn_idx].mean())

w = WassersteinWrapper()
sinkhorn = float(np.mean(np.asarray(w(jnp.asarray(gen), jnp.asarray(real)))))
noise = np.abs(np.asarray(jax.random.normal(jax.random.PRNGKey(0), real.shape)))
noise_nn = float(
    ((noise[:, None, :, 0] - real[None, :, :, 0]) ** 2).mean(-1).min(1).mean(),
)
noise_sink = float(np.mean(np.asarray(w(jnp.asarray(noise), jnp.asarray(real)))))


from rho_diffusion_tpu.metrics import peak_stats  # noqa: E402

gen_stats = [peak_stats(g[:, 0]) for g in gen]
real_stats = [peak_stats(r_[:, 0]) for r_ in real]
reg = np.asarray([r for _, r in gen_stats if np.isfinite(r)])
reg_real = np.asarray([r for _, r in real_stats if np.isfinite(r)])
combs = float(np.mean([
    (c >= 3 and np.isfinite(r) and r < 0.25) for c, r in gen_stats
]))
baseline_frac = float((gen[..., 0] < 0.02).mean())
neg_frac = float((gen[..., 0] < -0.05).mean())

print(
    f"NN-MSE {nn_mse:.5f} (noise {noise_nn:.4f})  sinkhorn {sinkhorn:.3f} "
    f"(noise {noise_sink:.3f})  combs {combs:.2f}  "
    f"regularity {np.median(reg) if reg.size else float('nan'):.3f} "
    f"(real {np.median(reg_real):.3f})",
    flush=True,
)

# -- plot ------------------------------------------------------------------
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

fig, axes = plt.subplots(6, 1, figsize=(10, 12), sharex=True)
for k, ax in enumerate(axes):
    ax.plot(gen[k, :, 0], lw=0.8, label="generated")
    ax.plot(real[nn_idx[k], :, 0], lw=0.8, alpha=0.6, label="nearest real")
    ax.set_ylim(-0.2, 1.1)
    if k == 0:
        ax.legend(loc="upper right")
fig.tight_layout()
fig.savefig(os.path.join(OUT, f"demo_spectro1d_{RECIPE}.png"), dpi=120)

with open(os.path.join(OUT, f"demo_spectro1d_{RECIPE}_metrics.json"), "w") as f:
    json.dump(
        {
            "recipe": RECIPE,
            "epochs": EPOCHS,
            "molecules": int(n),
            "grid": GRID,
            "train_wall_s": round(train_wall, 1),
            "sample_wall_s": round(sample_wall, 1),
            "nn_mse": nn_mse,
            "sinkhorn": sinkhorn,
            "noise_baseline": {"nn_mse": noise_nn, "sinkhorn": noise_sink},
            "comb_fraction": combs,
            "comb_regularity_median_gen": float(np.median(reg)) if reg.size else None,
            "comb_regularity_median_real": float(np.median(reg_real)),
            "baseline_fraction_below_0.02": baseline_frac,
            "negative_fraction": neg_frac,
            "smoke": bool(SMOKE),
        },
        f,
        indent=2,
    )
print(f"wrote docs/demo/demo_spectro1d_{RECIPE}_metrics.json", flush=True)
