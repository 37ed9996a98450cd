"""Spherical-harmonics held-out-(l,m)-pair generalization (round 5,
VERDICT r4 item 1, third workload).

Unlike the galaxy t-holdout (a held-out VALUE of one axis), holding out a
PAIR (l, m) while every individual l and m value still appears in other
training pairs tests COMPOSITIONAL generalization — and here the
reference's own conditioner has a fighting chance: MultiEmbeddings SUMS
per-dimension embeddings (reference conditioning.py:31-139), so a held-out
combination's embedding = trained l-row + trained m-row. The sha512 hash
conditioning the reference used by default has no such structure (a new
pair hashes to an uncorrelated vector). FourierConditioning composes
through its MLP on smooth features.

Protocol: train the 16^3 conditional DDPM harness (raw (l, m) rows) with
2 pairs excluded from the training draw (dataset exclude_pairs), generate
ALL valid pairs, score matched-condition MSE vs the deterministic Y_lm
fields: trained vs held-out vs noise, for cond in {embed, fourier}.

Run: python benchmarks/sh_holdout.py   (TPU, ~10 min both conditioners)
Artifacts: docs/demo/sh_holdout_metrics.json
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
from rho_diffusion_tpu.models import FourierConditioning, MultiEmbeddings  # noqa: E402

GRID = int(os.environ.get("SH_GRID", 16))
BATCH = int(os.environ.get("SH_BATCH", 8))
STEPS = int(os.environ.get("SH_STEPS", 3000))
HOLDOUT = [(3, -2), (4, 1)]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "demo")

MC = 64
backbone_kwargs = dict(
    data_shape=(GRID,) * 3, dims=3, in_channels=1, out_channels=1,
    model_channels=MC, num_res_blocks=2, channel_mult=(1, 2, 4),
    attention_resolutions=[8, 4], num_heads=4, num_classes=20,
    use_scale_shift_norm=True, dtype=jnp.bfloat16,
)

dset = SphericalHarmonicDataset(
    max_l=5, grid_el=GRID, length=BATCH * (STEPS + 8), cache_fields=True,
    use_emb_as_labels=False, exclude_pairs=HOLDOUT,
)
all_pairs = [(l, m) for l in range(5) for m in range(-l, l + 1)]  # 25 valid
grid = {k: dset.grid_kwargs[k] for k in ("x", "y", "z")}
real = np.stack([
    compute_spherical_harmonic(**grid, m=m, l=l)[1].astype(np.float32)[..., None]
    for l, m in all_pairs
])
labels = np.asarray(all_pairs, np.float32)
held = np.array([p in HOLDOUT for p in all_pairs])
w = WassersteinWrapper()

report = {"grid": GRID, "steps": STEPS, "held_out_pairs": HOLDOUT, "conds": {}}
for cond_name in ("embed", "fourier"):
    cond_cls = MultiEmbeddings if cond_name == "embed" else FourierConditioning
    cond = cond_cls(parameter_space=dset.parameter_space, embedding_dim=4 * MC)
    pipe = DDPM(
        backbone="UNetv2", backbone_kwargs=backbone_kwargs, cond_fn=cond,
        schedule=LinearSchedule(1000), optimizer="AdamW",
        opt_kwargs={"lr": 1e-4}, ema_decay=0.9999,
    )
    state = pipe.create_state(jax.random.PRNGKey(777))
    loader = DataLoader(dset, batch_size=BATCH, num_workers=2)
    t0 = time.perf_counter()
    for i, b in enumerate(prefetch_to_device(iter(loader))):
        if i >= STEPS:
            break
        state, metrics = pipe.training_step(state, b)
    print(f"{cond_name}: {STEPS} steps in {time.perf_counter() - t0:.0f}s "
          f"(loss {float(metrics['train_loss']):.4f})", flush=True)

    sampler_pipe = GaussianDiffusionPipeline(
        backbone="UNetv2", backbone_kwargs=backbone_kwargs, cond_fn=cond,
        schedule=LinearSchedule(1000), model_mean_type="epsilon",
        model_var_type="fixed_large", optimizer="AdamW",
    )
    params = state.ema_params if state.ema_params is not None else state.params
    fn = jax.jit(lambda p, r, c: sampler_pipe.reverse_process(
        p, r, (c.shape[0], *real.shape[1:]), c, sampler="ddim", num_steps=50,
    ))
    gen = np.concatenate([
        np.asarray(fn(params, jax.random.PRNGKey(5 + lo),
                      jnp.asarray(labels[lo : lo + BATCH])), np.float32)
        for lo in range(0, len(all_pairs), BATCH)
    ])[: len(all_pairs)]
    per_pair = np.mean((gen - real) ** 2, axis=(1, 2, 3, 4))
    row = {
        "matched_mse_trained": float(per_pair[~held].mean()),
        "matched_mse_holdout": float(per_pair[held].mean()),
        "holdout_pair_mse": {
            str(p): float(per_pair[i])
            for i, p in enumerate(all_pairs) if held[i]
        },
        "sinkhorn_all": float(np.mean(np.asarray(
            w(jnp.asarray(gen), jnp.asarray(real)),
        ))),
        "finite": bool(np.isfinite(gen).all()),
    }
    report["conds"][cond_name] = row
    print(f"  {cond_name}: trained {row['matched_mse_trained']:.4f}  "
          f"holdout {row['matched_mse_holdout']:.4f}", flush=True)

noise = np.asarray(jax.random.normal(jax.random.PRNGKey(0), real.shape))
report["noise_matched_mse"] = float(np.mean((noise - real) ** 2))
with open(os.path.join(OUT, "sh_holdout_metrics.json"), "w") as f:
    json.dump(report, f, indent=2)
print("wrote docs/demo/sh_holdout_metrics.json", flush=True)
