"""ViT vs UNet trained-quality A/B at MATCHED WALL-CLOCK (round 5,
VERDICT r4 weak #4 / item 5).

The VisionTransformer backbone ships registry-complete with throughput
numbers (55.9 vs 2.44 steps/s at the 32^3 flagship config, RESULTS r3) but
zero trained-quality evidence — the reference shipped its ViT with tests
skipped ("ViT not currently being used", reference tests/models/test_vit.py
:29,54) and never trained it either. Question: at ~20x more updates per
minute, is the third backbone a contender or a toy on the 16^3 Y_lm
workload?

Protocol: train both backbones CONDITIONALLY (sha512 hash embeddings, the
reference's conditioning modality; the ViT's conditional seam is the
round-5 extension in models/vit.py) for the same wall-clock budget, then
score condition-matched generations against the deterministic Y_lm ground
truth: matched MSE + Sinkhorn, ddim-50 and dpm++-10.

Run: python benchmarks/vit_ab.py   (TPU; VIT_AB_WALL seconds/backbone,
default 420)   Artifacts: docs/demo/vit_ab.json
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

GRID = int(os.environ.get("VIT_AB_GRID", 16))
BATCH = int(os.environ.get("VIT_AB_BATCH", 8))
WALL = float(os.environ.get("VIT_AB_WALL", 420.0))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "demo")
os.makedirs(OUT, exist_ok=True)

EMB = 256  # sha512 embedding length == UNet 4*mc == ViT cond input
backbones = {
    "unet": (
        "UNetv2",
        dict(
            data_shape=(GRID,) * 3, dims=3, in_channels=1, out_channels=1,
            model_channels=64, num_res_blocks=2, channel_mult=(1, 2, 4),
            attention_resolutions=[8, 4], num_heads=4, num_classes=20,
            use_scale_shift_norm=True, dtype=jnp.bfloat16,
        ),
    ),
    "vit": (
        "VisionTransformer",
        dict(
            patch_size=4, input_shapes=(GRID,) * 3, num_channels=1,
            embedding_dim=256, hidden_dim=512, transformer_depth=8,
            num_heads=8, dropout=0.0, num_classes=20, dtype=jnp.bfloat16,
        ),
    ),
}

dset = SphericalHarmonicDataset(
    max_l=5, grid_el=GRID, length=1_000_000, cache_fields=True,
)
pairs = [(l, m) for l in range(dset.max_l) for m in range(-l, l + 1)][:BATCH]
conds = jnp.asarray(np.stack([
    calculate_sha512_embedding({"l": l, "m": m}, l=EMB) for l, m in pairs
]))
grid = {k: dset.grid_kwargs[k] for k in ("x", "y", "z")}
real = np.stack([
    compute_spherical_harmonic(**grid, m=m, l=l)[1].astype(np.float32)[..., None]
    for l, m in pairs
])
w = WassersteinWrapper()

report = {"grid": GRID, "batch": BATCH, "wall_budget_s": WALL, "backbones": {}}
for name, (bb, kwargs) in backbones.items():
    pipe = DDPM(
        backbone=bb, backbone_kwargs=kwargs,
        schedule=LinearSchedule(1000), optimizer="AdamW",
        opt_kwargs={"lr": 1e-4}, ema_decay=0.9999,
    )
    state = pipe.create_state(jax.random.PRNGKey(777))
    loader = DataLoader(dset, batch_size=BATCH, num_workers=2)
    steps = 0
    loss = None
    t_start = None  # started after the first (compile) step
    for b in prefetch_to_device(iter(loader)):
        state, metrics = pipe.training_step(state, b)
        steps += 1
        if t_start is None:
            float(metrics["train_loss"])  # block for compile
            t_start = time.perf_counter()
            steps = 0
            continue
        if steps % 200 == 0:
            loss = float(metrics["train_loss"])  # sync point
            if time.perf_counter() - t_start > WALL:
                break
    wall = time.perf_counter() - t_start
    sps = steps / wall
    print(f"{name}: {steps} steps in {wall:.0f}s ({sps:.2f} steps/s), "
          f"final loss {loss:.4f}", flush=True)

    sampler_pipe = GaussianDiffusionPipeline(
        backbone=bb, backbone_kwargs=kwargs,
        schedule=LinearSchedule(1000), model_mean_type="epsilon",
        model_var_type="fixed_large", optimizer="AdamW",
    )
    params = state.ema_params if state.ema_params is not None else state.params
    rows = {}
    for sampler, nfe in (("ddim", 50), ("dpm++", 10)):
        fn = jax.jit(lambda p, r, c, _s=sampler, _n=nfe: sampler_pipe.reverse_process(
            p, r, (BATCH, *real.shape[1:]), c, sampler=_s, num_steps=_n,
        ))
        gen = np.asarray(fn(params, jax.random.PRNGKey(5), conds), np.float32)
        rows[f"{sampler}_{nfe}"] = {
            "matched_mse": float(np.mean((gen - real) ** 2)),
            "sinkhorn": float(np.mean(np.asarray(
                w(jnp.asarray(gen), jnp.asarray(real)),
            ))),
            "finite": bool(np.isfinite(gen).all()),
        }
        print(f"  {name} {sampler}-{nfe}: {rows[f'{sampler}_{nfe}']}", flush=True)
    report["backbones"][name] = {
        "steps": steps, "wall_s": round(wall, 1),
        "steps_per_sec": round(sps, 2), "final_train_loss": loss,
        "params_m": round(sum(
            x.size for x in jax.tree_util.tree_leaves(state.params)
        ) / 1e6, 2),
        "samplers": rows,
    }

noise_mse = float(np.mean(
    (np.asarray(jax.random.normal(jax.random.PRNGKey(0), real.shape)) - real) ** 2,
))
report["noise_matched_mse"] = noise_mse
with open(os.path.join(OUT, "vit_ab.json"), "w") as f:
    json.dump(report, f, indent=2)
print("wrote docs/demo/vit_ab.json", flush=True)
