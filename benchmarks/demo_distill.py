"""Progressive-distillation quality demo on the chip.

Trains a conditional 3D Ylm Gaussian pipeline, then distills it
32 -> 16 -> 8 -> 4 -> 2 sampling steps (Salimans & Ho, arXiv:2202.00512)
and measures conditional fidelity (matched-condition field MSE + Sinkhorn
vs ground truth) of each student at its eval budget AGAINST the teacher
DDIM-strided to the same budget — the honest comparison: distillation must
beat naive striding at equal model evaluations, not just be fast.

The reference framework's only fast-sampling story is DDIM striding
(/root/reference/rho_diffusion/diffusion/gaussian_diffusion.py:654-702).

Outputs docs/demo/demo_distill_metrics.json.

Env knobs: DEMO_GRID (16), DEMO_BATCH (16), DEMO_STEPS (1200),
DEMO_FROM (32), DEMO_TO (2), DEMO_UPDATES (300 per stage),
DEMO_DISTILL_LR (3e-5).
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
    ProgressiveDistiller,
)
from rho_diffusion_tpu.metrics import WassersteinWrapper  # noqa: E402
from rho_diffusion_tpu.utils import calculate_sha512_embedding  # noqa: E402

GRID = int(os.environ.get("DEMO_GRID", 16))
BATCH = int(os.environ.get("DEMO_BATCH", 16))
STEPS = int(os.environ.get("DEMO_STEPS", 1200))
FROM = int(os.environ.get("DEMO_FROM", 32))
TO = int(os.environ.get("DEMO_TO", 2))
UPDATES = int(os.environ.get("DEMO_UPDATES", 300))
DISTILL_LR = float(os.environ.get("DEMO_DISTILL_LR", 3e-5))
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
    model_var_type="fixed_small", optimizer="AdamW",
    opt_kwargs={"lr": 2e-4}, ema_decay=0.9999,
)
state = pipe.create_state(jax.random.PRNGKey(777))
dset = SphericalHarmonicDataset(
    max_l=5, grid_el=GRID,
    length=max(BATCH * (STEPS + 8), 256),
)
loader = DataLoader(dset, batch_size=BATCH, num_workers=0)

print(f"== teacher train: {STEPS} steps, {GRID}^3, b{BATCH}", flush=True)
t0 = time.perf_counter()
for i, b in enumerate(prefetch_to_device(iter(loader))):
    if i >= STEPS:
        break
    state, metrics = pipe.training_step(state, b)
    if i % 200 == 0 or i == STEPS - 1:
        print(f"  step {i} loss {float(metrics['train_loss']):.4f} "
              f"({(i + 1) / (time.perf_counter() - t0):.2f} steps/s)",
              flush=True)
train_wall = time.perf_counter() - t0
teacher_params = (
    state.ema_params if state.ema_params is not None else state.params
)

# -- eval targets: ground-truth fields for the first BATCH (l, m) pairs ----
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
shape = pipe.sample_shape(BATCH)


def quality(samples):
    samples = np.asarray(samples, np.float32)
    return {
        "matched_mse": float(np.mean((samples - real) ** 2)),
        "sinkhorn": float(np.mean(np.asarray(
            w(jnp.asarray(samples), jnp.asarray(real))))),
        "finite": bool(np.isfinite(samples).all()),
    }


def eval_teacher_ddim(n):
    fn = jax.jit(lambda p, r, c: pipe.reverse_process(
        p, r, shape, c, sampler="ddim", num_steps=n,
    ))
    out = fn(teacher_params, jax.random.PRNGKey(5), conds)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    out = fn(teacher_params, jax.random.PRNGKey(5), conds)
    jax.block_until_ready(out)
    return {**quality(out), "wall_s": round(time.perf_counter() - t1, 3)}


report = {
    "grid": GRID, "batch": BATCH, "teacher_steps": STEPS,
    "from_steps": FROM, "to_steps": TO, "updates_per_stage": UPDATES,
    "distill_lr": DISTILL_LR,
    "train_wall_s": round(train_wall, 1),
    "teacher_ddim": {}, "student": {}, "stage_losses": {},
}

print("== teacher DDIM striding baselines", flush=True)
for n in sorted({50, FROM} | {n for n in (16, 8, 4, 2) if TO <= n <= FROM}):
    report["teacher_ddim"][str(n)] = eval_teacher_ddim(n)
    print(f"  ddim-{n}: {report['teacher_ddim'][str(n)]}", flush=True)

# -- distillation cascade; evaluate every student on its own grid ---------
d = ProgressiveDistiller(pipe, opt_kwargs={"lr": DISTILL_LR})


def _epochs():
    while True:  # the cascade consumes stages*UPDATES batches — cycle epochs
        yield from prefetch_to_device(iter(DataLoader(
            dset, batch_size=BATCH, num_workers=0,
        )))


data_iter = _epochs()


def batches(_i):
    return next(data_iter)


params = teacher_params
n = FROM
rng = jax.random.PRNGKey(99)
while n > TO:
    rng, sub = jax.random.split(rng)
    t1 = time.perf_counter()
    params, losses = d.distill_stage(params, batches, n, UPDATES, sub)
    stage_wall = time.perf_counter() - t1
    n //= 2
    report["stage_losses"][f"{n * 2}->{n}"] = {
        "first": losses[0], "last": losses[-1], "min": min(losses),
        "wall_s": round(stage_wall, 1),
    }
    out = d.sample(params, jax.random.PRNGKey(5), shape, n_steps=n,
                   conditions=conds)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    out = d.sample(params, jax.random.PRNGKey(5), shape, n_steps=n,
                   conditions=conds)
    jax.block_until_ready(out)
    report["student"][str(n)] = {
        **quality(out), "wall_s": round(time.perf_counter() - t1, 3),
    }
    print(f"== student {n}-step: {report['student'][str(n)]} "
          f"(stage {stage_wall:.0f}s, loss {losses[0]:.4f}->{losses[-1]:.4f})",
          flush=True)

noise = np.asarray(jax.random.normal(jax.random.PRNGKey(0), real.shape))
report["noise_baseline"] = quality(noise)

# -- serve the student (round-4: the --spacing payoff) ---------------------
# The trailing grid is what the cascade trained on; SamplingService's
# spacing control makes the student a first-class serving config. Latency
# table: distilled student vs the teacher's best few-step samplers, same
# bucket, each with its quality columns.
if int(os.environ.get("DEMO_SERVE", "1")):
    from rho_diffusion_tpu.diffusion.sampling_rng import per_sample_keys
    from rho_diffusion_tpu.serving import SamplingService

    def serve_row(label, params_, **service_kw):
        with SamplingService(
            pipe, params_, batch_buckets=(BATCH,), max_delay_s=0.0,
            cond_dim=4 * MC, warmup=True, **service_kw,
        ) as svc:
            svc.generate(conditions=np.asarray(conds), seed=5)  # warm
            t1 = time.perf_counter()
            res = svc.generate(conditions=np.asarray(conds), seed=5)
            wall = time.perf_counter() - t1
        q = quality(res.samples)
        row = {
            "s_per_request": round(wall, 3),
            "volumes_per_s": round(BATCH / wall, 2),
            **q,
        }
        print(f"  serve[{label}]: {row}", flush=True)
        return row

    print("== serving latency (batch bucket = %d)" % BATCH, flush=True)
    report["serving"] = {
        f"student-ddim-{TO}-trailing": serve_row(
            f"student-{TO}", params,
            sampler="ddim", num_steps=TO, spacing="trailing",
        ),
        "teacher-dpm++-10": serve_row(
            "dpm++-10", teacher_params, sampler="dpm++", num_steps=10,
        ),
        "teacher-ddim-50": serve_row(
            "ddim-50", teacher_params, sampler="ddim", num_steps=50,
        ),
    }

# -- persist weights: the student is servable from disk too ----------------
from rho_diffusion_tpu.training.checkpoint import save_model_weights  # noqa: E402

save_model_weights(teacher_params, f"/tmp/rho_distill_{GRID}_teacher.npz")
save_model_weights(params, f"/tmp/rho_distill_{GRID}_student{TO}.npz")
report["weights"] = {
    "teacher": f"/tmp/rho_distill_{GRID}_teacher.npz",
    "student": f"/tmp/rho_distill_{GRID}_student{TO}.npz",
}

suffix = f"_{GRID}" if GRID != 16 else ""
with open(os.path.join(OUT, f"demo_distill{suffix}_metrics.json"), "w") as f:
    json.dump(report, f, indent=2)
print(f"wrote docs/demo/demo_distill{suffix}_metrics.json", flush=True)
