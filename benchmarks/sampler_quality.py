"""Sampler quality-vs-cost on a TRAINED model (round 3).

Trains a conditional 3D DDPM on on-the-fly Y_lm fields (QUAL_GRID^3,
default 16^3 — ~40 ms/step on the v5e), then generates condition-matched
batches with each sampler x step-count combination and reports the
Sinkhorn-Wasserstein divergence against the ground-truth fields plus the
measured sampling wall-clock. This turns the analytic DPM-Solver++ claim
(tests/pipeline/test_dpmpp.py: dpm++-10 == ddim-80 endpoint accuracy)
into a trained-model measurement on the chip.

Usage: python benchmarks/sampler_quality.py   (QUAL_GRID/QUAL_STEPS env)
Writes docs/demo/sampler_quality.json.
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

GRID = int(os.environ.get("QUAL_GRID", 16))
BATCH = int(os.environ.get("QUAL_BATCH", 8))
STEPS = int(os.environ.get("QUAL_STEPS", 3000))
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

pipe = DDPM(
    backbone="UNetv2", backbone_kwargs=backbone_kwargs,
    schedule=LinearSchedule(1000), optimizer="AdamW",
    opt_kwargs={"lr": 1e-4}, ema_decay=0.9999,
)
state = pipe.create_state(jax.random.PRNGKey(777))

dset = SphericalHarmonicDataset(
    max_l=5, grid_el=GRID, length=max(BATCH * (STEPS + 8), 256),
    cache_fields=True,
)
loader = DataLoader(dset, batch_size=BATCH, num_workers=4)

t0 = time.perf_counter()
final_loss = None
for i, b in enumerate(prefetch_to_device(iter(loader))):
    if i >= STEPS:
        break
    state, metrics = pipe.training_step(state, b)
    if i % 500 == 0 or i == STEPS - 1:
        final_loss = float(metrics["train_loss"])
        print(f"step {i} loss {final_loss:.4f} "
              f"({(i + 1) / (time.perf_counter() - t0):.2f} steps/s)",
              flush=True)

sampler_pipe = GaussianDiffusionPipeline(
    backbone="UNetv2", backbone_kwargs=backbone_kwargs,
    schedule=LinearSchedule(1000), model_mean_type="epsilon",
    model_var_type="fixed_large", optimizer="AdamW",
)
pairs = [(l, m) for l in range(dset.max_l) for m in range(-l, l + 1)][:BATCH]
conds = jnp.asarray(np.stack([
    calculate_sha512_embedding({"l": l, "m": m}, l=4 * MC) for l, m in pairs
]))
params = state.ema_params if state.ema_params is not None else state.params

grid = {k: dset.grid_kwargs[k] for k in ("x", "y", "z")}
real = np.stack([
    compute_spherical_harmonic(**grid, m=m, l=l)[1].astype(np.float32)[..., None]
    for l, m in pairs
])
w = WassersteinWrapper()


def run(
    sampler: str, num_steps: int, quant: str | None = None,
    spacing: str | None = None,
) -> dict:
    """One sampler config; quant='int8' traces the same checkpoint through
    the W8A8 conv path (ops/quant.py) — quality cost of quantized serving.
    spacing overrides the respacing grid (e.g. 'karras')."""
    from contextlib import nullcontext

    from rho_diffusion_tpu.ops.quant import conv_quant

    with conv_quant(quant) if quant else nullcontext():
        fn = jax.jit(lambda p, r, c: sampler_pipe.reverse_process(
            p, r, sampler_pipe.sample_shape(BATCH), c,
            sampler=sampler, num_steps=num_steps, spacing=spacing,
        ))
        samples = np.asarray(fn(params, jax.random.PRNGKey(5), conds))  # compile
        t0 = time.perf_counter()
        samples = np.asarray(fn(params, jax.random.PRNGKey(5), conds))
        wall = time.perf_counter() - t0
    div = float(np.mean(np.asarray(w(jnp.asarray(samples), jnp.asarray(real)))))
    row = {
        "sampler": sampler, "steps": num_steps,
        "wall_s": round(wall, 3), "sinkhorn_vs_real": round(div, 2),
        "finite": bool(np.isfinite(samples).all()),
    }
    if quant:
        row["quant"] = quant
    if spacing:
        row["spacing"] = spacing
    print(row, flush=True)
    return row


import os

if os.environ.get("SQ_ROWS") == "unipc":
    # focused A/B: the round-4 UniPC-p2 corrector vs DPM-Solver++(2M) at
    # equal NFE (both 1 model eval/step on the same uniform-lambda grid)
    rows = [
        run("unipc", 5),
        run("dpm++", 5),
        run("unipc", 10),
        run("dpm++", 10),
        run("unipc", 15),
        run("dpm++", 15),
        run("ddim", 50),
    ]
elif os.environ.get("SQ_ROWS") == "stochastic":
    # round-5 RNG-lane A/B: the stochastic seam solvers vs their
    # deterministic twins at equal NFE, plus the classic ancestral
    # samplers they generalize (seam 'ancestral' == ddim eta=1 == the
    # respaced 'ddpm' posterior; sde-dpm++ is the 2nd-order SDE sampler
    # the reference could only reach through HF scheduler delegation)
    rows = [
        run("sde-dpm++", 10),
        run("dpm++", 10),
        run("sde-dpm++", 15),
        run("dpm++", 15),
        run("ancestral", 50),
        run("ddim", 50),
        run("ddpm", 1000),
    ]
elif os.environ.get("SQ_ROWS") == "karras":
    # focused A/B: Karras rho=7 grid vs the uniform-t default at equal cost
    rows = [
        run("ddim", 10),
        run("ddim", 10, spacing="karras"),
        run("ddim", 25),
        run("ddim", 25, spacing="karras"),
        run("ddim", 50),
        run("ddim", 50, spacing="karras"),
    ]
else:
    rows = [
        run("dpm++", 5),
        run("dpm++", 10),
        run("dpm++", 15),
        run("ddim", 10),
        run("ddim", 25),
        run("ddim", 50),
        run("ddim", 100),
        run("ddpm", 1000),
        run("dpm++", 10, quant="int8"),
        run("ddim", 50, quant="int8"),
    ]
noise_div = float(np.mean(np.asarray(w(
    jax.random.normal(jax.random.PRNGKey(0), real.shape), jnp.asarray(real),
))))
out = {
    "grid": GRID, "batch": BATCH, "train_steps": STEPS,
    "final_train_loss": final_loss,
    "condition_pairs_lm": pairs,
    "sinkhorn_noise_baseline": round(noise_div, 2),
    "rows": rows,
}
name = (
    f"sampler_quality_{os.environ['SQ_ROWS']}.json"
    if os.environ.get("SQ_ROWS")
    else "sampler_quality.json"
)
with open(os.path.join(OUT, name), "w") as f:
    json.dump(out, f, indent=2)
print(f"wrote docs/demo/{name}", flush=True)
