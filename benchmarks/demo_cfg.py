"""Classifier-free guidance quality demo on the chip (round 3).

Trains the conditional 3D Ylm Gaussian pipeline WITH ``cond_dropout`` (so
the one network also learns the null condition), then DDIM-samples the
SAME (l, m) conditions at several guidance scales and measures conditional
fidelity. Because a Y_lm density field is a deterministic function of its
condition, matched-condition field MSE is a direct measure of how well the
sampler respects the conditioning — exactly the failure mode CFG exists to
fix (Ho & Salimans, arXiv:2207.12598). The reference framework has no CFG
at all; its only guidance hook is the stubbed classifier path
(/root/reference/rho_diffusion/models/conditioning.py:142-155).

Outputs docs/demo/demo_cfg_metrics.json with per-scale matched MSE +
Sinkhorn divergence and the sampling wall-clocks (the guided programs run
cond+uncond as ONE batched 2B forward, so expect ~2x the model-eval cost).

Env knobs: DEMO_GRID (16), DEMO_BATCH (16), DEMO_STEPS (1200),
DEMO_SCALES ("1.0,1.5,2.0,4.0"), DEMO_DROPOUT (0.1).
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
STEPS = int(os.environ.get("DEMO_STEPS", 1200))
DROPOUT = float(os.environ.get("DEMO_DROPOUT", 0.1))
SCALES = [float(s) for s in
          os.environ.get("DEMO_SCALES", "1.0,1.5,2.0,4.0").split(",")]
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

pipe = GaussianDiffusionPipeline(
    backbone="UNetv2", backbone_kwargs=backbone_kwargs,
    schedule=LinearSchedule(1000), model_mean_type="epsilon",
    model_var_type="fixed_large", optimizer="AdamW",
    opt_kwargs={"lr": 2e-4}, ema_decay=0.9999,
    cond_dropout=DROPOUT,
)
state = pipe.create_state(jax.random.PRNGKey(777))

dset = SphericalHarmonicDataset(
    max_l=5, grid_el=GRID, length=max(BATCH * (STEPS + 8), 256),
)
loader = DataLoader(dset, batch_size=BATCH, num_workers=4)

losses, t0 = [], time.perf_counter()
for i, b in enumerate(prefetch_to_device(iter(loader))):
    if i >= STEPS:
        break
    state, metrics = pipe.training_step(state, b)
    if i % 100 == 0 or i == STEPS - 1:
        loss = float(metrics["train_loss"])
        losses.append({"step": i, "loss": loss})
        print(f"step {i} loss {loss:.4f} "
              f"({(i + 1) / (time.perf_counter() - t0):.2f} steps/s)",
              flush=True)
train_wall = time.perf_counter() - t0

# -- matched conditions: the first BATCH physical (l, m) pairs, as the same
# sha512 hash embeddings the training labels used
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
w = WassersteinWrapper()
shape = pipe.sample_shape(BATCH)
results = []
for s in SCALES:
    fn = jax.jit(lambda p, r, c, s=s: pipe.reverse_process(
        p, r, shape, c, sampler="ddim", num_steps=50,
        guidance_scale=None if s == 1.0 else s,
    ))
    t0 = time.perf_counter()
    samples = np.asarray(fn(params, jax.random.PRNGKey(5), conds))
    wall = time.perf_counter() - t0
    mse = float(np.mean((samples - real) ** 2))
    div = float(np.mean(np.asarray(
        w(jnp.asarray(samples), jnp.asarray(real)))))
    results.append({
        "guidance_scale": s, "matched_mse": mse, "sinkhorn": div,
        "sample_wall_s": round(wall, 2),
        "finite": bool(np.isfinite(samples).all()),
    })
    print(f"scale {s}: matched MSE {mse:.5f} sinkhorn {div:.3f} "
          f"({wall:.1f}s)", flush=True)

noise = np.asarray(jax.random.normal(jax.random.PRNGKey(0), real.shape))
baseline = {
    "matched_mse": float(np.mean((noise - real) ** 2)),
    "sinkhorn": float(np.mean(np.asarray(
        w(jnp.asarray(noise), jnp.asarray(real))))),
}

with open(os.path.join(OUT, "demo_cfg_metrics.json"), "w") as f:
    json.dump({
        "grid": GRID, "batch": BATCH, "steps": STEPS,
        "cond_dropout": DROPOUT,
        "condition_pairs_lm": pairs,
        "losses": losses, "train_wall_s": round(train_wall, 1),
        "per_scale": results, "noise_baseline": baseline,
    }, f, indent=2)
print("wrote docs/demo/demo_cfg_metrics.json", flush=True)
