"""DeepGalaxy-2D conditional quality flagship (round 4).

Trains the reference's second flagship workload — 2D galaxy-merger
generation conditioned on (s, m, t, c), `examples/config_deep_galaxy.json`
(reference ``/root/reference/examples/config_deep_galaxy.json:4-57``) — on
physically-structured synthetic data with the real corpus schema
(``rho_diffusion_tpu/data/galaxy_synth.py``), then measures conditional
fidelity:

* **matched-condition MSE**: every frame is a deterministic function of its
  condition row, so MSE(sample | (s,m,t,c), ground-truth render) measures
  how well the conditional model respects its conditioning;
* **mismatched-condition MSE**: the same samples scored against a
  time-shifted ground truth — if conditioning works, matched << mismatched;
* **Sinkhorn divergence** between the generated set and the real set;
* a real-vs-generated PNG grid over (s, t).

Two recipes (DEMO_RECIPE): "reference" runs the example config verbatim
(epsilon DDPM — converges in training loss but mis-tracks the frames'
dominant DC at sampling time, the documented arXiv:2305.08891 failure;
see benchmarks/galaxy_dc_probe.py); "zero_snr" (default) is the
TPU-native recipe — zero-terminal-SNR linear schedule + v-prediction +
trailing DDIM — same model/data/optimizer, measured matched MSE 0.00068
vs 1.21 (RESULTS.md round 4).

Env knobs: DEMO_RECIPE (zero_snr), DEMO_EPOCHS (1400), DEMO_BATCH (25),
DEMO_SMOKE (0 — CPU-sized smoke run), DEMO_WORKDIR
(/tmp/rho_galaxy2d_<recipe>).
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
EPOCHS = int(os.environ.get("DEMO_EPOCHS", "4" if SMOKE else "1400"))
BATCH = int(os.environ.get("DEMO_BATCH", "25"))
# "reference": examples/config_deep_galaxy.json verbatim (epsilon DDPM,
#   truncated terminal SNR) — converges in training loss but mis-tracks the
#   frames' dominant DC component at sampling time (near-black background;
#   see docs/demo/demo_galaxy2d_reference_metrics.json for the documented
#   failure — the reference framework itself has no fix for this).
# "zero_snr": same model/data/optimizer, but the TPU-native training
#   recipe — zero-terminal-SNR linear schedule + v-prediction + trailing
#   DDIM (arXiv:2305.08891), all config-expressible here.
RECIPE = os.environ.get("DEMO_RECIPE", "zero_snr")
# artifact/workdir tag: camera-axis runs get their own names
TAG = RECIPE + (
    "_cam" + os.environ["DEMO_CAMERAS"].replace(",", "")
    if os.environ.get("DEMO_CAMERAS") else ""
)
WORKDIR = os.environ.get("DEMO_WORKDIR", "/tmp/rho_galaxy2d_" + TAG)
H5 = os.path.join(WORKDIR, "output_bw_512.h5")

os.makedirs(WORKDIR, exist_ok=True)

from rho_diffusion_tpu.config import ExperimentConfig  # noqa: E402
from rho_diffusion_tpu.data.deep_galaxy import DeepGalaxyDataset  # noqa: E402
from rho_diffusion_tpu.data.galaxy_synth import write_deep_galaxy_h5  # noqa: E402
from rho_diffusion_tpu.metrics import WassersteinWrapper  # noqa: E402
from rho_diffusion_tpu.training.trainer import Trainer  # noqa: E402
from rho_diffusion_tpu.utils import plot_image_grid  # noqa: E402

# ----------------------------------------------------------------- data --
if not os.path.exists(H5):
    print("rendering synthetic DeepGalaxy corpus ...", flush=True)
    t0 = time.perf_counter()
    write_deep_galaxy_h5(
        H5,
        s_values=(0.25, 0.5, 1.0),
        m_values=(1.0,),
        cameras=(0, 1),
        size=128 if SMOKE else 512,
    )
    print(f"  wrote {H5} in {time.perf_counter() - t0:.1f}s", flush=True)

# --------------------------------------------------------------- config --
config = ExperimentConfig.from_json(os.path.join(REPO, "examples", "config_deep_galaxy.json"))
config.dataset.kwargs["path"] = H5
if os.environ.get("DEMO_CAMERAS"):
    # e.g. "0,1": exercises the camera-conditioning axis too (the corpus
    # is written with cameras 0 and 1; the example config selects [0])
    config.dataset.kwargs["camera_pos"] = [
        int(c) for c in os.environ["DEMO_CAMERAS"].split(",")
    ]
config.training.batch_size = BATCH
config.training.max_epochs = EPOCHS
config.training.min_epochs = 1
config.training.sample_every_n_epochs = 10**9  # eval happens below, once
config.training.save_checkpoint_every_n_epochs = max(EPOCHS // 2, 1)
if config.lr_scheduler is not None:
    config.lr_scheduler.kwargs["T_max"] = EPOCHS
if RECIPE == "zero_snr":
    from rho_diffusion_tpu.config import ComponentConfig

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
    # 1000/T scaling makes the default beta_T hit 1.0 at T=20; scale down
    config.noise_schedule.kwargs.update(num_steps=20, beta_1=2e-4, beta_T=1e-2)
    config.training.dtype = "float32"

trainer = Trainer(config, work_dir=WORKDIR)
dset: DeepGalaxyDataset = trainer.dataset
print(
    f"dataset: {len(dset)} frames, space {dset.loaded_parameter_space.parameters}",
    flush=True,
)

t0 = time.perf_counter()
state = trainer.fit()
train_wall = time.perf_counter() - t0
print(f"trained {EPOCHS} epochs in {train_wall:.1f}s", flush=True)

# ----------------------------------------------------------------- eval --
pipe = trainer.pipeline
params = state.ema_params if state.ema_params is not None else state.params

# ground truth + condition rows exactly as the training data pipeline made
# them (per-stack max normalisation, crop, 2x pool, [-1, 1])
real = np.stack([dset[i][0] for i in range(len(dset))])
labels = np.stack([dset[i][1] for i in range(len(dset))])
order = np.lexsort((labels[:, 2], labels[:, 0]))  # sort by (s, t)
real, labels = real[order], labels[order]
n = real.shape[0]

if RECIPE == "zero_snr":
    # trailing-grid DDIM (the zero-terminal-SNR default) at 100 evals
    sample_fn = jax.jit(
        lambda p, r, c: pipe.reverse_process(
            p, r, (c.shape[0], *real.shape[1:]), c,
            sampler="ddim", num_steps=100,
        )
    )
else:  # reference DDPM pipeline: full-T ancestral, returns a dict
    sample_fn = jax.jit(
        lambda p, r, c: pipe.reverse_process(
            p, r, (c.shape[0], *real.shape[1:]), c,
        )["denoised"]
    )
t0 = time.perf_counter()
gen = []
for lo in range(0, n, BATCH):
    chunk = jnp.asarray(labels[lo : lo + BATCH])
    out = sample_fn(params, jax.random.PRNGKey(1000 + lo), chunk)
    gen.append(np.asarray(out, np.float32))
gen = np.concatenate(gen)
sample_wall = time.perf_counter() - t0

matched = float(np.mean((gen - real) ** 2))
per_cond = np.mean((gen - real) ** 2, axis=(1, 2, 3))
# mismatched baseline: score each sample against the t-shifted ground truth
# within the same s-group (rolling by 5 frames ~ 25 Myr)
mis_idx = np.arange(n)
for s_val in np.unique(labels[:, 0]):
    rows = np.where(labels[:, 0] == s_val)[0]
    mis_idx[rows] = np.roll(rows, 5)
mismatched = float(np.mean((gen - real[mis_idx]) ** 2))

w = WassersteinWrapper()
sinkhorn = float(np.mean(np.asarray(w(jnp.asarray(gen), jnp.asarray(real)))))
noise = np.asarray(jax.random.normal(jax.random.PRNGKey(0), real.shape))
noise_mse = float(np.mean((noise - real) ** 2))
noise_sink = float(np.mean(np.asarray(w(jnp.asarray(noise), jnp.asarray(real)))))

print(
    f"matched MSE {matched:.5f}  mismatched {mismatched:.5f}  "
    f"sinkhorn {sinkhorn:.4f}  (noise: {noise_mse:.3f}/{noise_sink:.3f})",
    flush=True,
)

# ----------------------------------------------------------------- plot --
# rows: real then generated for each s value; cols: 7 evenly-spaced t
s_vals = np.unique(labels[:, 0])
t_vals = np.unique(labels[:, 2])
t_show = t_vals[:: max(len(t_vals) // 7, 1)][:7]
rows = []
row_titles = []
for s_val in s_vals:
    for src, tag in ((real, "real"), (gen, "gen")):
        row = []
        for t_val in t_show:
            (i,) = np.where((labels[:, 0] == s_val) & (labels[:, 2] == t_val))[:1]
            row.append(src[int(i[0])])
        rows.append(np.stack(row))
        row_titles.append(f"s={s_val:g} {tag}")
plot_image_grid(
    np.concatenate(rows),
    ncols=len(t_show),
    filename=os.path.join(OUT, f"demo_galaxy2d_{TAG}_grid.png"),
)

with open(os.path.join(OUT, f"demo_galaxy2d_{TAG}_metrics.json"), "w") as f:
    json.dump(
        {
            "epochs": EPOCHS,
            "batch": BATCH,
            "frames": int(n),
            "train_wall_s": round(train_wall, 1),
            "sample_wall_s": round(sample_wall, 1),
            "matched_mse": matched,
            "mismatched_mse": mismatched,
            "per_condition_mse_max": float(per_cond.max()),
            "sinkhorn": sinkhorn,
            "noise_baseline": {"mse": noise_mse, "sinkhorn": noise_sink},
            "conditioning_separates": bool(matched < 0.5 * mismatched),
            "smoke": bool(SMOKE),
            "recipe": TAG,
        },
        f,
        indent=2,
    )
print(f"wrote docs/demo/demo_galaxy2d_{TAG}_metrics.json", flush=True)
