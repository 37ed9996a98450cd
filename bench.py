"""Benchmark: training steps/sec/chip on the reference's headline workload.

Workload = examples/config_spherical_harmonics.json (reference
BASELINE.md): UNetv2 dims=3, model_channels=64, 32^3 grid, T=1000
LinearSchedule, global batch 32 — the 3D conditional-density flagship.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/sec/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md: "published": {}), so
``vs_baseline`` compares against the most recent recorded BENCH_r*.json in
the repo (1.0 on the first round).

Env knobs:
    BENCH_STEPS (default 10), BENCH_WARMUP (3), BENCH_BATCH (32),
    BENCH_DTYPE (bfloat16|float32, default bfloat16),
    BENCH_GRID (32), BENCH_SMOKE=1 for a tiny CPU-runnable smoke,
    BENCH_MODE=train|sample (sample: DDIM-50 full-volume generation
    wall-clock with EMA weights, the BASELINE.md secondary metric).
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys
import time


def _previous_bench_value(metric: str) -> float | None:
    """Newest BENCH_r{N}.json value FOR THE SAME METRIC, if recorded.

    The BENCH_DIMS/BENCH_MODE/BENCH_GRID knobs emit differently-named
    metrics; comparing across them (2D steps/s vs 3D steps/s, or seconds
    vs steps/s) would be meaningless, so rounds whose recorded metric name
    differs are skipped.
    """
    best = None
    for path in glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                payload = json.load(f)
            # the driver nests the bench line under "parsed"
            rec = payload if "value" in payload else (payload.get("parsed") or {})
            if rec.get("metric") != metric:
                continue
            value = float(rec["value"])
        except Exception:
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            best = (rnd, value)
    return best[1] if best else None


def _grid_name(grid: int, dims: int) -> str:
    return f"{grid}" + {3: "cubed", 2: "sq", 1: ""}[dims]


def _bench_sampling(backbone_kwargs, batch, grid, mc, dtype_name, smoke) -> None:
    """DDIM-50 full-volume generation wall-clock with EMA-style weights."""
    dims = backbone_kwargs["dims"]
    gname = _grid_name(grid, dims)
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rho_diffusion_tpu.diffusion import GaussianDiffusionPipeline, LinearSchedule

    steps = int(os.environ.get("BENCH_DDIM_STEPS", 10 if smoke else 50))
    sampler = os.environ.get("BENCH_SAMPLER", "ddim")  # ddim | ddpm (full-T) | dpm++
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=backbone_kwargs,
        schedule=LinearSchedule(100 if smoke else 1000),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
    )
    params = pipe.init_params(jax.random.PRNGKey(0))
    n = min(batch, 8)
    conds = jnp.zeros((n, 4 * mc), jnp.float32)

    def sample(params, rng):
        # params as an ARGUMENT, not a closure: captured params become
        # giant MLIR constants and blow the remote-compile payload limit
        return pipe.reverse_process(
            params, rng, pipe.sample_shape(n), conds,
            sampler=sampler, num_steps=steps,
        )

    fn = jax.jit(sample)
    out = fn(params, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(params, jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / iters
    finite = bool(np.isfinite(np.asarray(out)).all())
    metric = f"{sampler}{steps}_sample_wall_clock_{gname}_b{n}"
    prev = _previous_bench_value(metric)
    result = {
        "metric": metric,
        "value": round(wall, 4),
        "unit": "seconds",
        "vs_baseline": round(prev / wall, 4) if prev else 1.0,
    }
    print(
        f"backend={jax.default_backend()} dtype={dtype_name} n={n} "
        f"grid={grid} ddim_steps={steps} finite={finite}",
        file=sys.stderr,
    )
    print(json.dumps(result))


def _require_live_backend() -> None:
    """Fail fast if jax's default backend cannot initialise.

    The tunneled-TPU backend BLOCKS indefinitely inside jax.devices() when
    the tunnel is unreachable (observed outage: >3 h), which would hang the
    whole bench run. Probe device init in a subprocess with a deadline and
    exit with a diagnosable error instead. BENCH_BACKEND_TIMEOUT (seconds,
    default 600) tunes the deadline; set 0 to skip the probe.
    """
    import subprocess

    deadline = float(os.environ.get("BENCH_BACKEND_TIMEOUT", 600))
    if deadline <= 0:
        return
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=deadline,
            check=True,
            capture_output=True,
        )
    except subprocess.TimeoutExpired:
        print(
            f"bench: backend device init did not finish within {deadline:.0f}s "
            "— the TPU tunnel appears to be down. Aborting instead of "
            "hanging (retry later, or set BENCH_BACKEND_TIMEOUT).",
            file=sys.stderr,
        )
        sys.exit(3)
    except subprocess.CalledProcessError as exc:
        tail = (exc.stderr or b"").decode(errors="replace")[-2000:]
        print(f"bench: backend init failed:\n{tail}", file=sys.stderr)
        sys.exit(3)


def main() -> None:
    _require_live_backend()
    # persistent compile cache: the tunneled-TPU remote compile of the 3D
    # UNet takes minutes cold; cached reruns are seconds.
    from rho_diffusion_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    import jax

    import jax.numpy as jnp
    import numpy as np

    from rho_diffusion_tpu.diffusion import DDPM, LinearSchedule

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    steps = int(os.environ.get("BENCH_STEPS", 10))
    warmup = int(os.environ.get("BENCH_WARMUP", 3))
    batch = int(os.environ.get("BENCH_BATCH", 8 if smoke else 32))
    grid = int(os.environ.get("BENCH_GRID", 8 if smoke else 32))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    mc = 16 if smoke else 64

    mode = os.environ.get("BENCH_MODE", "train")  # train|sample|realdata
    remat = os.environ.get("BENCH_REMAT") == "1"  # the 64^3 memory recipe
    dims = int(os.environ.get("BENCH_DIMS", 3))  # 3 (flagship) | 2 (DeepGalaxy) | 1
    if dims == 2:
        # the reference's second shipped workload
        # (examples/config_deep_galaxy.json:4-57): 128^2, mc=32, T=500, b64
        grid = int(os.environ.get("BENCH_GRID", 16 if smoke else 128))
        batch = int(os.environ.get("BENCH_BATCH", 8 if smoke else 64))
        mc = 16 if smoke else 32
        num_classes = 25
    elif dims == 1:
        # 1D parametric density profiles (BASELINE.json config #2; Conv1d
        # path, cf. SpectroscopyDataset spectra)
        grid = int(os.environ.get("BENCH_GRID", 64 if smoke else 1024))
        batch = int(os.environ.get("BENCH_BATCH", 8 if smoke else 64))
        num_classes = 20
    else:
        num_classes = 20
    model = os.environ.get("BENCH_MODEL", "unet")  # unet | vit
    if model == "vit":
        # the reference's third backbone family (vit.py:188-372, shipped
        # with skipped tests); transformer over patch tokens — measured
        # here so every model family has a number
        backbone_kwargs = dict(
            patch_size=4 if smoke else 8,
            input_shapes=(grid,) * dims,
            num_channels=1,
            embedding_dim=64 if smoke else 256,
            hidden_dim=128 if smoke else 512,
            transformer_depth=2 if smoke else 8,
            num_heads=4 if smoke else 16,
            dropout=0.0,
            dtype=dtype,
        )
        backbone_name = "VisionTransformer"
    else:
        backbone_kwargs = dict(
            data_shape=(grid,) * dims,
            dims=dims,
            in_channels=1,
            out_channels=1,
            model_channels=mc,
            num_res_blocks=2,
            channel_mult=(1, 2) if smoke else (1, 2, 4, 8),
            attention_resolutions=[16, 8],
            num_heads=4,
            num_classes=num_classes,
            use_scale_shift_norm=True,
            use_checkpoint=remat,
            dtype=dtype,
        )
        backbone_name = "UNetv2"

    if mode == "sample":
        if model != "unet":
            raise SystemExit("BENCH_MODE=sample supports BENCH_MODEL=unet only")
        _bench_sampling(backbone_kwargs, batch, grid, mc, dtype_name, smoke)
        return

    pipe = DDPM(
        backbone=backbone_name,
        backbone_kwargs=backbone_kwargs,
        schedule=LinearSchedule(500 if dims == 2 else 1000),
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-4},
        ema_decay=0.0 if os.environ.get("BENCH_NO_EMA") == "1" else 0.9999,
        log_grad_norm=os.environ.get("BENCH_NO_GRADNORM") != "1",
        # BENCH_ACCUM=k: gradient accumulation over k microbatches — the
        # memory lever for effective batches past the single-chip HBM
        # frontier (64^3 b16 measured OOM; b32 = 4 x b8 microbatches fits)
        grad_accum=int(os.environ.get("BENCH_ACCUM", 1)),
    )
    if os.environ.get("BENCH_FLAT_OPT") == "1":
        import optax

        pipe.tx = optax.flatten(pipe.tx)
    state = pipe.create_state(jax.random.PRNGKey(777))

    if mode == "realdata":
        # REAL on-the-fly spherical-harmonics data through the full host
        # pipeline (DataLoader threads + prefetch + the (l,m) field cache)
        # — the number that was 1.59 vs 2.22 steps/s pure-compute in
        # round 1 (RESULTS.md "Flagship-scale run").
        from rho_diffusion_tpu.data import DataLoader, SphericalHarmonicDataset
        from rho_diffusion_tpu.data.loader import prefetch_to_device

        dset = SphericalHarmonicDataset(
            max_l=5, grid_el=grid, length=max(batch * (steps + warmup + 2), 256),
        )
        loader = DataLoader(dset, batch_size=batch, num_workers=4)
        # BENCH_DEVICE_CACHE=1: dataset resident in HBM, batches as
        # on-device gathers — removes the per-step batch H2D that held
        # realdata at ~94% of the device-resident bound (round 2/3).
        cache = None
        if os.environ.get("BENCH_DEVICE_CACHE") == "1":
            from rho_diffusion_tpu.data.device_cache import DeviceDatasetCache

            cache = DeviceDatasetCache(dset)

        def run(n):
            nonlocal state
            if cache is not None:
                it = cache.batches(loader)
            else:
                it = prefetch_to_device(iter(loader))
            metrics = None
            for i, b in enumerate(it):
                if i >= n:
                    break
                state, metrics = pipe.training_step(state, b)
            jax.block_until_ready(metrics["train_loss"])
            return metrics

        t_compile = time.perf_counter()
        metrics = run(max(warmup, 1))
        compile_s = time.perf_counter() - t_compile
        t0 = time.perf_counter()
        metrics = run(steps)
        elapsed = time.perf_counter() - t0
        n_chips = max(jax.device_count(), 1)
        value = steps / elapsed / n_chips
        prev = _previous_bench_value("train_steps_per_sec_per_chip_3d_unet_realdata")
        print(
            f"backend={jax.default_backend()} mode=realdata batch={batch} "
            f"grid={grid} warmup+compile={compile_s:.1f}s elapsed={elapsed:.2f}s "
            f"loss={float(metrics['train_loss']):.4f}",
            file=sys.stderr,
        )
        print(json.dumps({
            "metric": "train_steps_per_sec_per_chip_3d_unet_realdata",
            "value": round(value, 4),
            "unit": "steps/sec/chip",
            "vs_baseline": round(value / prev, 4) if prev else 1.0,
        }))
        return

    rng = np.random.default_rng(0)
    data = rng.uniform(0.0, 1.0, (batch, *(grid,) * dims, 1)).astype(np.float32)
    labels = rng.uniform(0.0, 1.0, (batch, 4 * mc)).astype(np.float32)
    batch_dict = {"data": jnp.asarray(data), "labels": jnp.asarray(labels)}

    t_compile = time.perf_counter()
    for _ in range(max(warmup, 1)):
        state, metrics = pipe.training_step(state, batch_dict)
    jax.block_until_ready(metrics["train_loss"])
    compile_s = time.perf_counter() - t_compile

    # Best of BENCH_WINDOWS timed windows: single-window timings through the
    # tunnel sit anywhere in a ~1% run-to-run band (RESULTS.md: 2.43-2.45
    # steps/s across rounds); the max over a few windows is the stable
    # throughput statistic (host-side jitter only ever slows a window down).
    windows = int(os.environ.get("BENCH_WINDOWS", 3))
    elapsed = float("inf")
    for _ in range(max(windows, 1)):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = pipe.training_step(state, batch_dict)
        jax.block_until_ready(metrics["train_loss"])
        elapsed = min(elapsed, time.perf_counter() - t0)

    n_chips = max(jax.device_count(), 1)
    steps_per_sec_chip = steps / elapsed / n_chips
    loss = float(metrics["train_loss"])

    metric = (
        f"train_steps_per_sec_per_chip_{dims}d_{model}_{_grid_name(grid, dims)}_b{batch}"
        if not smoke
        else "train_steps_per_sec_per_chip_smoke"
    )
    prev = _previous_bench_value(metric)
    vs_baseline = steps_per_sec_chip / prev if prev else 1.0
    result = {
        "metric": metric,
        "value": round(steps_per_sec_chip, 4),
        "unit": "steps/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
    }
    # diagnostics on stderr so stdout stays one JSON line
    print(
        f"backend={jax.default_backend()} chips={n_chips} dtype={dtype_name} "
        f"batch={batch} grid={grid} warmup+compile={compile_s:.1f}s "
        f"elapsed={elapsed:.2f}s loss={loss:.4f} finite={np.isfinite(loss)}",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
