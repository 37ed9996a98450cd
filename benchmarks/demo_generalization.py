"""Held-out-condition generalization benchmark (round 5, VERDICT r4 item 1+2).

THE claim a conditional generative surrogate exists to make — generate
conditions never seen in training — tested here for the first time, on the
4-axis DeepGalaxy workload (the reference's second flagship,
``/root/reference/examples/config_deep_galaxy.json``; its own inference
script only ever samples the training grid,
``/root/reference/scripts/inference.py:166``).

Design
------
* Corpus: the full 4-axis grid — 3 size ratios x 3 mass ratios x 25 merger
  times (400..520 Myr step 5) x 4 cameras = **900 frames**, each a
  deterministic render of its condition row
  (``rho_diffusion_tpu/data/galaxy_synth.py``), so exact held-out ground
  truth is available for free.
* Training set: **5 interior merger times held out** (410/435/460/485/510)
  and **camera 3 held out** -> 3 x 3 x 20 x 3 = 540 frames
  (``DeepGalaxyDataset(t_exclude=..., camera_pos=[0,1,2])``).
* Eval: sample ALL 900 condition rows, score matched-condition MSE per
  partition — trained / held-out-t (interpolation) / held-out-camera
  (extrapolation) / both — against the deterministic renders, plus a
  per-axis condition-separation table (matched vs single-axis-shifted MSE
  for each of s, m, t, c; VERDICT r4 item 2).
* Two conditioners (GEN_COND): ``embed`` = MultiEmbeddings, the reference's
  discrete per-value embedding rows (a held-out value keeps its random-init
  row — interpolation is structurally impossible; this run measures that
  failure honestly); ``fourier`` = FourierConditioning (round 5), smooth in
  the raw parameter value, so held-out conditions inherit neighbouring
  training signal. Same model/recipe/budget otherwise (zero-terminal-SNR +
  v-prediction + trailing DDIM, the round-4 recipe).

Env knobs: GEN_COND (fourier|embed), GEN_EPOCHS (500), GEN_BATCH (30),
GEN_SMOKE (0), GEN_WORKDIR (/tmp/rho_gen_galaxy_<cond>).
Artifacts: docs/demo/demo_generalization_galaxy_<cond>_{metrics.json,grid.png}.
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

SMOKE = int(os.environ.get("GEN_SMOKE", "0"))
COND = os.environ.get("GEN_COND", "fourier")
assert COND in ("fourier", "embed"), COND
EPOCHS = int(os.environ.get("GEN_EPOCHS", "2" if SMOKE else "500"))
BATCH = int(os.environ.get("GEN_BATCH", "30"))
WORKDIR = os.environ.get("GEN_WORKDIR", f"/tmp/rho_gen_galaxy_{COND}")
H5 = os.path.join(os.environ.get("GEN_CORPUS_DIR", "/tmp/rho_gen_galaxy"),
                  "output_bw_512.h5")
os.makedirs(WORKDIR, exist_ok=True)
os.makedirs(os.path.dirname(H5), exist_ok=True)

S_VALUES = (0.25, 0.5, 1.0)
M_VALUES = (0.5, 1.0, 1.5)
CAMERAS = (0, 1, 2, 3)
T_VALUES = np.arange(400.0, 521.0, 5.0)  # 25 values
HOLD_T = [410.0, 435.0, 460.0, 485.0, 510.0]  # interior: interpolation
TRAIN_CAMS = [0, 1, 2]
HOLD_CAM = 3  # extrapolation (camera rotation/inclination beyond trained)

from rho_diffusion_tpu.config import ComponentConfig, ExperimentConfig  # noqa: E402
from rho_diffusion_tpu.data.deep_galaxy import DeepGalaxyDataset  # noqa: E402
from rho_diffusion_tpu.data.galaxy_synth import write_deep_galaxy_h5  # noqa: E402
from rho_diffusion_tpu.metrics import WassersteinWrapper  # noqa: E402
from rho_diffusion_tpu.training.trainer import Trainer  # noqa: E402
from rho_diffusion_tpu.utils import plot_image_grid  # noqa: E402

# ----------------------------------------------------------------- data --
if not os.path.exists(H5):
    print("rendering 4-axis DeepGalaxy corpus (900 frames) ...", flush=True)
    t0 = time.perf_counter()
    write_deep_galaxy_h5(
        H5,
        s_values=S_VALUES,
        m_values=M_VALUES,
        cameras=CAMERAS,
        t_values=T_VALUES,
        size=128 if SMOKE else 512,
    )
    print(f"  wrote {H5} in {time.perf_counter() - t0:.1f}s", flush=True)

# --------------------------------------------------------------- config --
config = ExperimentConfig.from_json(
    os.path.join(REPO, "examples", "config_deep_galaxy.json"),
)
config.dataset.kwargs["path"] = H5
config.dataset.kwargs["camera_pos"] = TRAIN_CAMS
config.dataset.kwargs["t_lim"] = [400, 520]
config.dataset.kwargs["t_exclude"] = HOLD_T
config.training.batch_size = BATCH
config.training.max_epochs = EPOCHS
config.training.min_epochs = 1
config.training.sample_every_n_epochs = 10**9
config.training.save_checkpoint_every_n_epochs = max(EPOCHS // 2, 1)
if config.lr_scheduler is not None:
    config.lr_scheduler.kwargs["T_max"] = EPOCHS
# round-4 zero-SNR recipe (high-DC frames need it; RESULTS.md round 4)
config.noise_schedule.kwargs["zero_terminal_snr"] = True
config.pipeline = ComponentConfig(
    name="GaussianDiffusionPipeline",
    kwargs={"model_mean_type": "v_prediction", "model_var_type": "fixed_small"},
)
if COND == "fourier":
    config.model.kwargs["cond_fn"] = "FourierConditioning"
if SMOKE:
    config.model.kwargs.update(
        model_channels=8, num_res_blocks=1, attention_resolutions=[], num_heads=1,
    )
    config.noise_schedule.kwargs.update(num_steps=20, beta_1=2e-4, beta_T=1e-2)
    config.training.dtype = "float32"

trainer = Trainer(config, work_dir=WORKDIR)
dset = trainer.dataset
print(
    f"train set: {len(dset)} frames (cond={COND}); held out: "
    f"t={HOLD_T} and camera {HOLD_CAM}",
    flush=True,
)
if not SMOKE:
    assert len(dset) == (
        len(S_VALUES) * len(M_VALUES)
        * (len(T_VALUES) - len(HOLD_T)) * len(TRAIN_CAMS)
    ), len(dset)

t0 = time.perf_counter()
state = trainer.fit()
train_wall = time.perf_counter() - t0
print(f"trained {EPOCHS} epochs in {train_wall:.1f}s", flush=True)

# ----------------------------------------------------------------- eval --
pipe = trainer.pipeline
params = state.ema_params if state.ema_params is not None else state.params

# FULL grid (all cameras, all t) with the same normalisation as training
# (per-stack max runs before any filtering, so frames are bit-identical)
eval_dset = DeepGalaxyDataset(
    H5, use_emb_as_labels=False, dset_name_pattern="s_*",
    camera_pos=list(CAMERAS), t_lim=[400, 520],
)
real = np.stack([eval_dset[i][0] for i in range(len(eval_dset))])
labels = np.stack([eval_dset[i][1] for i in range(len(eval_dset))])
if SMOKE:
    # smoke tier: one (s, m) block (100 rows), short sampler
    keep = (labels[:, 0] == 0.5) & (labels[:, 1] == 1.0)
    real, labels = real[keep], labels[keep]
n = real.shape[0]
print(f"eval grid: {n} condition rows", flush=True)

N_EVALS = 10 if SMOKE else 100
sample_fn = jax.jit(
    lambda p, r, c: pipe.reverse_process(
        p, r, (c.shape[0], *real.shape[1:]), c, sampler="ddim", num_steps=N_EVALS,
    )
)
t0 = time.perf_counter()
gen = []
for lo in range(0, n, BATCH):
    chunk = jnp.asarray(labels[lo : lo + BATCH])
    out = sample_fn(params, jax.random.PRNGKey(1000 + lo), chunk)
    gen.append(np.asarray(out, np.float32))
gen = np.concatenate(gen)[:n]
sample_wall = time.perf_counter() - t0
print(f"sampled {n} frames in {sample_wall:.1f}s", flush=True)

per_row_mse = np.mean((gen - real) ** 2, axis=(1, 2, 3))
is_hold_t = np.isin(labels[:, 2], HOLD_T)
is_hold_c = labels[:, 3] == HOLD_CAM

partitions = {
    "trained": ~is_hold_t & ~is_hold_c,
    "holdout_t_interpolation": is_hold_t & ~is_hold_c,
    "holdout_camera_extrapolation": ~is_hold_t & is_hold_c,
    "holdout_both": is_hold_t & is_hold_c,
}

# t-shift mismatched baseline: each row scored against the ground truth 25
# Myr later within its (s, m, c) group (cyclic) — how far apart DIFFERENT
# conditions are, the scale against which matched MSE is judged
row_of = {tuple(np.round(lab, 4)): i for i, lab in enumerate(labels)}


def partner(lab, axis, values, delta=1):
    """Row index of lab with one axis stepped to the next value (cyclic)."""
    lab2 = lab.copy()
    vals = list(values)
    j = vals.index(lab[axis]) if lab[axis] in vals else 0
    lab2[axis] = vals[(j + delta) % len(vals)]
    return row_of[tuple(np.round(lab2, 4))]


t_list = [float(t) for t in T_VALUES]
mis_idx = np.array([partner(lab, 2, t_list, delta=5) for lab in labels])
mismatched_all = np.mean((gen - real[mis_idx]) ** 2, axis=(1, 2, 3))

w = WassersteinWrapper()
noise = np.asarray(jax.random.normal(jax.random.PRNGKey(0), real[:64].shape))
noise_mse = float(np.mean((noise - real[:64]) ** 2))

metrics = {
    "cond": COND,
    "epochs": EPOCHS,
    "batch": BATCH,
    "frames_train": int(len(dset)),
    "frames_eval": int(n),
    "held_out_t": HOLD_T,
    "held_out_camera": HOLD_CAM,
    "train_wall_s": round(train_wall, 1),
    "sample_wall_s": round(sample_wall, 1),
    "noise_mse": noise_mse,
    "partitions": {},
}
for name, mask in partitions.items():
    if not mask.any():
        continue
    sub = np.where(mask)[0]
    sink = float(np.mean(np.asarray(w(
        jnp.asarray(gen[sub[:180]]), jnp.asarray(real[sub[:180]]),
    ))))
    metrics["partitions"][name] = {
        "rows": int(mask.sum()),
        "matched_mse": float(per_row_mse[mask].mean()),
        "matched_mse_p90": float(np.quantile(per_row_mse[mask], 0.9)),
        "mismatched_t_shift_mse": float(mismatched_all[mask].mean()),
        "separation_x": float(
            mismatched_all[mask].mean() / max(per_row_mse[mask].mean(), 1e-12),
        ),
        "sinkhorn": sink,
    }
    print(f"  {name}: {metrics['partitions'][name]}", flush=True)

# per-axis separation on the TRAINED partition (VERDICT r4 item 2): the
# same sample scored against ground truth with exactly ONE axis shifted to
# another TRAINED value — all four axes must separate (ratio >> 1)
trained_rows = np.where(partitions["trained"])[0]
axis_specs = {
    "s": (0, list(S_VALUES), 1),
    "m": (1, list(M_VALUES), 1),
    "t": (2, [t for t in t_list if t not in HOLD_T], 1),
    "c": (3, [float(c) for c in TRAIN_CAMS], 1),
}
axis_table = {}
matched_trained = float(per_row_mse[trained_rows].mean())
if SMOKE:
    axis_specs = {"t": axis_specs["t"]}  # single (s, m) block in smoke
for ax_name, (axis, values, delta) in axis_specs.items():
    idx = np.array([partner(labels[i], axis, values, delta) for i in trained_rows])
    shifted = float(np.mean((gen[trained_rows] - real[idx]) ** 2))
    axis_table[ax_name] = {
        "shifted_mse": shifted,
        "separation_x": shifted / max(matched_trained, 1e-12),
    }
    print(f"  axis {ax_name}: shifted {shifted:.5f} "
          f"({axis_table[ax_name]['separation_x']:.1f}x matched)", flush=True)
metrics["per_axis_separation_trained"] = axis_table
metrics["matched_mse_trained"] = matched_trained

# ----------------------------------------------------------------- plot --
# rows (real, gen) for s=0.5, m=1.0, camera 1 over all 25 t —
# held-out t columns are the generalization test, visible in context
show = np.where(
    (labels[:, 0] == 0.5) & (labels[:, 1] == 1.0) & (labels[:, 3] == 1),
)[0]
show = show[np.argsort(labels[show, 2])]
# held-out camera strip: s=0.5, m=1.0, camera 3, 7 evenly spaced t
show_c = np.where(
    (labels[:, 0] == 0.5) & (labels[:, 1] == 1.0) & (labels[:, 3] == HOLD_CAM),
)[0]
show_c = show_c[np.argsort(labels[show_c, 2])][::4][:7]
if len(show):
    tiles = np.concatenate([
        real[show], gen[show], real[show_c], gen[show_c],
    ])
    plot_image_grid(
        tiles,
        ncols=len(show),
        filename=os.path.join(OUT, f"demo_generalization_galaxy_{COND}_grid.png"),
    )

with open(
    os.path.join(OUT, f"demo_generalization_galaxy_{COND}_metrics.json"), "w",
) as f:
    json.dump(metrics, f, indent=2)
print(f"wrote demo_generalization_galaxy_{COND}_metrics.json", flush=True)
