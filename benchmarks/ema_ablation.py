"""EMA on/off ablation (round 5, VERDICT r4 item 7).

EMA is wired through the jitted train step and used for sampling
(training/trainer.py:348) — the reference DEFINED an EMA callback but never
wired it into sampling (reference SURVEY §2.1 note) — yet its benefit was
never isolated. One training run tracks BOTH parameter sets (raw +
EMA-0.9999), so sampling from each isolates the EMA effect exactly (same
data order, same init, same trajectory — a cleaner control than two runs).

16^3 conditional Y_lm harness (same as benchmarks/sampler_quality.py);
matched-condition MSE + Sinkhorn, ddim-50 and ddpm-1000.

Run: python benchmarks/ema_ablation.py   (TPU, ~5 min)
Artifacts: docs/demo/ema_ablation.json
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
    DDPM,
    GaussianDiffusionPipeline,
    LinearSchedule,
)
from rho_diffusion_tpu.metrics import WassersteinWrapper  # noqa: E402
from rho_diffusion_tpu.utils import calculate_sha512_embedding  # noqa: E402

GRID = int(os.environ.get("EMA_GRID", 16))
BATCH = int(os.environ.get("EMA_BATCH", 8))
STEPS = int(os.environ.get("EMA_STEPS", 3000))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "demo")

MC = 64
backbone_kwargs = dict(
    data_shape=(GRID,) * 3, dims=3, in_channels=1, out_channels=1,
    model_channels=MC, num_res_blocks=2, channel_mult=(1, 2, 4),
    attention_resolutions=[8, 4], num_heads=4, num_classes=20,
    use_scale_shift_norm=True, dtype=jnp.bfloat16,
)
pipe = DDPM(
    backbone="UNetv2", backbone_kwargs=backbone_kwargs,
    schedule=LinearSchedule(1000), optimizer="AdamW",
    opt_kwargs={"lr": 1e-4}, ema_decay=0.9999,
)
state = pipe.create_state(jax.random.PRNGKey(777))
dset = SphericalHarmonicDataset(
    max_l=5, grid_el=GRID, length=BATCH * (STEPS + 8), cache_fields=True,
)
loader = DataLoader(dset, batch_size=BATCH, num_workers=2)
t0 = time.perf_counter()
for i, b in enumerate(prefetch_to_device(iter(loader))):
    if i >= STEPS:
        break
    state, metrics = pipe.training_step(state, b)
print(f"trained {STEPS} steps in {time.perf_counter() - t0:.0f}s "
      f"(final loss {float(metrics['train_loss']):.4f})", flush=True)

# divergence diagnostic: with the reference's warmup decay the shadow at
# step 3000 is a ~4.5-step trailing average (decay_eff = 0.9999 *
# -expm1(-step/2000) = 0.78), so |ema - raw| should be SMALL; a large
# sampling-quality gap with a small parameter gap would implicate
# trajectory chaos, not the EMA mechanism
rel = [
    float(jnp.linalg.norm(e - p) / (jnp.linalg.norm(p) + 1e-9))
    for e, p in zip(
        jax.tree_util.tree_leaves(state.ema_params),
        jax.tree_util.tree_leaves(state.params),
    )
]
print(f"mean rel |ema-raw| {np.mean(rel):.5f}  max {np.max(rel):.5f}", flush=True)

sampler_pipe = GaussianDiffusionPipeline(
    backbone="UNetv2", backbone_kwargs=backbone_kwargs,
    schedule=LinearSchedule(1000), model_mean_type="epsilon",
    model_var_type="fixed_large", optimizer="AdamW",
)
pairs = [(l, m) for l in range(dset.max_l) for m in range(-l, l + 1)][:BATCH]
conds = jnp.asarray(np.stack([
    calculate_sha512_embedding({"l": l, "m": m}, l=4 * MC) for l, m in pairs
]))
grid = {k: dset.grid_kwargs[k] for k in ("x", "y", "z")}
real = np.stack([
    compute_spherical_harmonic(**grid, m=m, l=l)[1].astype(np.float32)[..., None]
    for l, m in pairs
])
w = WassersteinWrapper()

report = {"grid": GRID, "steps": STEPS, "ema_decay": 0.9999, "rows": {}}
for tag, params in (("raw", state.params), ("ema", state.ema_params)):
    rows = {}
    for sampler, nfe in (("ddim", 50), ("ddpm", 1000)):
        fn = jax.jit(lambda p, r, c, _s=sampler, _n=nfe: sampler_pipe.reverse_process(
            p, r, (BATCH, *real.shape[1:]), c, sampler=_s, num_steps=_n,
        ))
        # 3 seeds per row: trajectory chaos decorrelates samples between
        # slightly-different parameter sets, so single-draw comparisons
        # confound seed variance with the EMA effect
        mses, sinks = [], []
        for seed in (5, 6, 7):
            gen = np.asarray(fn(params, jax.random.PRNGKey(seed), conds), np.float32)
            mses.append(float(np.mean((gen - real) ** 2)))
            sinks.append(float(np.mean(np.asarray(
                w(jnp.asarray(gen), jnp.asarray(real)),
            ))))
        rows[f"{sampler}_{nfe}"] = {
            "matched_mse": float(np.mean(mses)),
            "matched_mse_per_seed": [round(m, 4) for m in mses],
            "sinkhorn": float(np.mean(sinks)),
        }
        print(f"  {tag} {sampler}-{nfe}: {rows[f'{sampler}_{nfe}']}", flush=True)
    report["rows"][tag] = rows

with open(os.path.join(OUT, "ema_ablation.json"), "w") as f:
    json.dump(report, f, indent=2)
print("wrote docs/demo/ema_ablation.json", flush=True)
