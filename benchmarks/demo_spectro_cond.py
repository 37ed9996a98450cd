"""Condition-generalizing Spectroscopy-1D (round 5, VERDICT r4 items 1+4).

Trains the 1D workload CONDITIONED on the generating physics row
(B, T, D, n_lines) — the conditional path the reference's spectroscopy
stack never had (its dataset exposed no parameter space; reference
``spectroscopy.py:35-189`` trains unconditionally) — with 8 of 64
molecules HELD OUT of training, then generates the held-out rotors from
their parameter rows alone and scores them against the deterministic
ground-truth spectra (fixed linewidth makes each spectrum a pure function
of its params row).

The decisive metric: for held-out molecules, **matched-condition MSE vs
the MSE to the nearest TRAINED spectrum**. If matched < nearest-trained,
the model is genuinely interpolating the physics (new line spacings ~2B),
not replaying its closest training neighbour.

Env knobs: SPECTRO_COND (fourier|embed), SPECTRO_EPOCHS (1200),
SPECTRO_SMOKE. Artifacts: docs/demo/demo_spectro_cond_<cond>_*.
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

SMOKE = int(os.environ.get("SPECTRO_SMOKE", "0"))
COND = os.environ.get("SPECTRO_COND", "fourier")
assert COND in ("fourier", "embed")
EPOCHS = int(os.environ.get("SPECTRO_EPOCHS", "2" if SMOKE else "1200"))
BATCH = 16
N_MOL = 16 if SMOKE else 64
GRID = 256 if SMOKE else 1024
LINEWIDTH = 80.0  # fixed -> spectra deterministic in the params row
WORKDIR = os.environ.get("SPECTRO_WORKDIR", f"/tmp/rho_spectro_cond_{COND}")
os.makedirs(WORKDIR, exist_ok=True)
H5 = os.path.join(os.environ.get("SPECTRO_CORPUS_DIR", WORKDIR), "spectra.h5")

HOLDOUT = list(range(5, N_MOL, 8))  # 8 molecules spread across the corpus
TRAIN_IDX = [i for i in range(N_MOL) if i not in HOLDOUT]

from rho_diffusion_tpu.config import ComponentConfig, ExperimentConfig  # noqa: E402
from rho_diffusion_tpu.data.spectro_synth import write_rotor_spectra_h5  # noqa: E402
from rho_diffusion_tpu.data.spectroscopy import SpectroscopyDataset  # noqa: E402
from rho_diffusion_tpu.metrics import WassersteinWrapper, comb_metrics  # noqa: E402
from rho_diffusion_tpu.training.trainer import Trainer  # noqa: E402

if not os.path.exists(H5):
    write_rotor_spectra_h5(H5, N_MOL)
    print(f"wrote {H5} ({N_MOL} rotors)", flush=True)

config = ExperimentConfig.from_json(
    os.path.join(REPO, "examples", "config_spectroscopy.json"),
)
config.dataset.kwargs.update(
    h5_path=H5, grid_size=GRID, linewidth=LINEWIDTH, indices=TRAIN_IDX,
)
config.model.kwargs.update(
    data_shape=[GRID],
    num_classes=N_MOL,
    cond_fn=(
        "FourierConditioning" if COND == "fourier" else "MultiEmbeddings"
    ),
)
config.pipeline = ComponentConfig(
    name="GaussianDiffusionPipeline",
    kwargs={"model_mean_type": "epsilon", "model_var_type": "fixed_small"},
)
config.training.batch_size = BATCH
config.training.max_epochs = EPOCHS
config.training.min_epochs = 1
config.training.sample_every_n_epochs = 10**9
config.training.save_checkpoint_every_n_epochs = max(EPOCHS // 2, 1)
if config.lr_scheduler is not None:
    config.lr_scheduler.kwargs["T_max"] = EPOCHS
if SMOKE:
    config.model.kwargs.update(
        model_channels=8, num_res_blocks=1, attention_resolutions=[], num_heads=1,
    )
    config.noise_schedule.kwargs.update(num_steps=20, beta_1=2e-4, beta_T=1e-2)
    config.training.dtype = "float32"

trainer = Trainer(config, work_dir=WORKDIR)
dset = trainer.dataset
assert len(dset) == len(TRAIN_IDX)
print(f"train: {len(dset)} molecules (cond={COND}); held out: {HOLDOUT}",
      flush=True)

t0 = time.perf_counter()
state = trainer.fit()
train_wall = time.perf_counter() - t0
print(f"trained {EPOCHS} epochs in {train_wall:.1f}s", flush=True)

# ----------------------------------------------------------------- eval --
pipe = trainer.pipeline
params = state.ema_params if state.ema_params is not None else state.params

full = SpectroscopyDataset(H5, grid_size=GRID, linewidth=LINEWIDTH)
items = [full[i] for i in range(N_MOL)]
real = np.stack([it["spectrum"] for it in items])  # [N, G, 1]
labels = np.stack([it["params"] for it in items])  # [N, 4]

fn = jax.jit(lambda p, r, c: pipe.reverse_process(
    p, r, (c.shape[0], GRID, 1), c, sampler="ddim",
    num_steps=10 if SMOKE else 100,
))
t0 = time.perf_counter()
gen = np.concatenate([
    np.asarray(
        fn(params, jax.random.PRNGKey(3000 + lo),
           jnp.asarray(labels[lo : lo + BATCH])),
        np.float32,
    )
    for lo in range(0, N_MOL, BATCH)
])[:N_MOL]
sample_wall = time.perf_counter() - t0

per_mol_mse = np.mean((gen - real) ** 2, axis=(1, 2))
train_mask = np.isin(np.arange(N_MOL), TRAIN_IDX)
# nearest-TRAINED-spectrum distance: the replay-vs-interpolate discriminator
real_trained = real[train_mask][:, :, 0]
d2_train = ((gen[:, None, :, 0] - real_trained[None, :, :]) ** 2).mean(-1)
nn_trained = d2_train.min(1)

w = WassersteinWrapper()
noise = np.abs(np.asarray(jax.random.normal(jax.random.PRNGKey(0), real.shape)))
noise_mse = float(np.mean((noise - real) ** 2))

metrics = {
    "cond": COND,
    "epochs": EPOCHS,
    "molecules": N_MOL,
    "held_out": HOLDOUT,
    "grid": GRID,
    "train_wall_s": round(train_wall, 1),
    "sample_wall_s": round(sample_wall, 1),
    "noise_mse": noise_mse,
    "partitions": {},
}
for name, mask in (("trained", train_mask), ("holdout", ~train_mask)):
    matched = float(per_mol_mse[mask].mean())
    nn_t = float(nn_trained[mask].mean())
    metrics["partitions"][name] = {
        "rows": int(mask.sum()),
        "matched_mse": matched,
        "nn_trained_mse": nn_t,
        "interpolates": bool(matched < nn_t),
        "comb": comb_metrics(gen[mask][..., 0], real[mask][..., 0]),
    }
    print(f"  {name}: matched {matched:.5f}  nn-trained {nn_t:.5f}  "
          f"comb {metrics['partitions'][name]['comb']['comb_fraction']:.3f}",
          flush=True)
metrics["sinkhorn_all"] = float(np.mean(np.asarray(
    w(jnp.asarray(gen), jnp.asarray(real)),
)))

import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

k = min(6, len(HOLDOUT))
fig, axes = plt.subplots(k, 1, figsize=(10, 2 * k), sharex=True)
for ax, i in zip(np.atleast_1d(axes), HOLDOUT[:k]):
    ax.plot(gen[i, :, 0], lw=0.8, label=f"generated (held-out mol {i})")
    ax.plot(real[i, :, 0], lw=0.8, alpha=0.6, label="ground truth")
    ax.set_ylim(-0.2, 1.1)
    ax.legend(loc="upper right", fontsize=7)
fig.tight_layout()
fig.savefig(os.path.join(OUT, f"demo_spectro_cond_{COND}.png"), dpi=120)

with open(os.path.join(OUT, f"demo_spectro_cond_{COND}_metrics.json"), "w") as f:
    json.dump(metrics, f, indent=2)
print(f"wrote docs/demo/demo_spectro_cond_{COND}_metrics.json", flush=True)
