"""64^3 convergence demo on REAL spherical-harmonics data (round 3).

Trains the flagship 3D UNet (mc=64, mult 1/2/4/8) as a conditional DDPM on
on-the-fly 64^3 Y_lm fields for DEMO_STEPS steps at batch 8 (the measured
single-chip frontier, RESULTS.md), then DDIM-50 samples 8 volumes with the
EMA weights conditioned on the first 8 PHYSICAL (l, m) pairs (|m| <= l —
the combinations the dataset can actually emit), and records:

* the loss curve (docs/demo/demo64_metrics.json),
* centre-slice grids of generated vs ground-truth volumes for the SAME
  (l, m) pairs (docs/demo/demo64_samples.png / demo64_real.png),
* the Sinkhorn-Wasserstein divergence between the condition-matched
  generated and ground-truth batches.

The training program and the DDIM sampler are the same XLA programs as
bench.py's BENCH_GRID=64 runs, so the persistent compile cache makes this
start in seconds after those have run once.
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
from rho_diffusion_tpu.diffusion import (  # noqa: E402
    DDPM,
    GaussianDiffusionPipeline,
    LinearSchedule,
)
from rho_diffusion_tpu.metrics import WassersteinWrapper  # noqa: E402
from rho_diffusion_tpu.utils import plot_tensor_images  # noqa: E402

GRID = int(os.environ.get("DEMO_GRID", 64))
BATCH = int(os.environ.get("DEMO_BATCH", 8))
STEPS = int(os.environ.get("DEMO_STEPS", 600))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "demo")
os.makedirs(OUT, exist_ok=True)

MC = 64
backbone_kwargs = dict(
    data_shape=(GRID,) * 3, dims=3, in_channels=1, out_channels=1,
    model_channels=MC, num_res_blocks=2, channel_mult=(1, 2, 4, 8),
    attention_resolutions=[16, 8], num_heads=4, num_classes=20,
    use_scale_shift_norm=True, use_checkpoint=False, dtype=jnp.bfloat16,
)

pipe = DDPM(
    backbone="UNetv2", backbone_kwargs=backbone_kwargs,
    schedule=LinearSchedule(1000), optimizer="AdamW",
    opt_kwargs={"lr": 1e-4}, ema_decay=0.9999,
)
state = pipe.create_state(jax.random.PRNGKey(777))

dset = SphericalHarmonicDataset(
    max_l=5, grid_el=GRID, length=max(BATCH * (STEPS + 8), 256),
)
loader = DataLoader(dset, batch_size=BATCH, num_workers=4)

losses, t0 = [], time.perf_counter()
metrics = None
for i, b in enumerate(prefetch_to_device(iter(loader))):
    if i >= STEPS:
        break
    state, metrics = pipe.training_step(state, b)
    if i % 50 == 0 or i == STEPS - 1:
        loss = float(metrics["train_loss"])
        losses.append({"step": i, "loss": loss})
        print(f"step {i} loss {loss:.4f} "
              f"({(i + 1) / (time.perf_counter() - t0):.2f} steps/s)",
              flush=True)
train_wall = time.perf_counter() - t0

# -- DDIM-50 sampling with EMA weights, conditioned on the first 8 valid
# (l, m) pairs. NB the raw Cartesian space l x m contains unphysical rows
# (|m| > l) the dataset never emits, so enumerate |m| <= l explicitly and
# build the SAME sha512 hash embeddings the training labels used.
from rho_diffusion_tpu.data.synthetic import compute_spherical_harmonic  # noqa: E402
from rho_diffusion_tpu.utils import calculate_sha512_embedding  # noqa: E402

sampler = GaussianDiffusionPipeline(
    backbone="UNetv2", backbone_kwargs=backbone_kwargs,
    schedule=LinearSchedule(1000), model_mean_type="epsilon",
    model_var_type="fixed_large", optimizer="AdamW",
)
pairs = [(l, m) for l in range(dset.max_l) for m in range(-l, l + 1)][:BATCH]
conds = jnp.asarray(np.stack([
    calculate_sha512_embedding({"l": l, "m": m}, l=4 * MC) for l, m in pairs
]))
params = state.ema_params if state.ema_params is not None else state.params
fn = jax.jit(lambda p, r, c: sampler.reverse_process(
    p, r, sampler.sample_shape(BATCH), c, sampler="ddim", num_steps=50,
))
t0 = time.perf_counter()
samples = np.asarray(fn(params, jax.random.PRNGKey(5), conds))
sample_wall = time.perf_counter() - t0
print(f"sampled {samples.shape} in {sample_wall:.1f}s "
      f"finite={np.isfinite(samples).all()}", flush=True)

# ground-truth volumes for the SAME (l, m) pairs (deterministic fields —
# the dataset's __getitem__ draws random pairs, so compute them directly)
grid = {k: dset.grid_kwargs[k] for k in ("x", "y", "z")}
real = np.stack([
    compute_spherical_harmonic(**grid, m=m, l=l)[1].astype(np.float32)[..., None]
    for l, m in pairs
])
w = WassersteinWrapper()
div = float(np.mean(np.asarray(w(jnp.asarray(samples), jnp.asarray(real)))))
div_untrained = float(np.mean(np.asarray(w(
    jax.random.normal(jax.random.PRNGKey(0), real.shape), jnp.asarray(real),
))))
print(f"sinkhorn generated-vs-real {div:.3f} (noise baseline {div_untrained:.3f})",
      flush=True)

plot_tensor_images(samples, filename=os.path.join(OUT, "demo64_samples.png"))
plot_tensor_images(real, filename=os.path.join(OUT, "demo64_real.png"))
with open(os.path.join(OUT, "demo64_metrics.json"), "w") as f:
    json.dump({
        "grid": GRID, "batch": BATCH, "steps": STEPS,
        "condition_pairs_lm": pairs,
        "losses": losses, "train_wall_s": round(train_wall, 1),
        "ddim50_sample_wall_s": round(sample_wall, 1),
        "sinkhorn_generated_vs_real": div,
        "sinkhorn_noise_baseline": div_untrained,
        "finite": bool(np.isfinite(samples).all()),
    }, f, indent=2)
print("wrote docs/demo/demo64_*", flush=True)
