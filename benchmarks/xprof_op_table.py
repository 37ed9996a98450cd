"""Capture a jax.profiler trace of the flagship train step and print the
device-time op table (the xprof breakdown VERDICT r2 asks for: prove each
remaining op is near its roofline, or find the ones that aren't).

Usage:
    python benchmarks/xprof_op_table.py            # flagship 32^3 b32 train
    XPROF_MODE=sample python benchmarks/xprof_op_table.py

Parses the raw .xplane.pb with tensorflow's XPlane proto (the installed
tensorboard_plugin_profile wheel is incompatible with tf 2.20, so we
aggregate ourselves): sums self-duration per HLO category and per op name
over the "XLA Ops" line of the TPU device plane.
"""
from __future__ import annotations

import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture_trace(logdir: str) -> None:
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/rho_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from rho_diffusion_tpu.diffusion import DDPM, LinearSchedule

    grid = int(os.environ.get("XPROF_GRID", 32))
    batch = int(os.environ.get("XPROF_BATCH", 32))
    mc = 64
    pipe = DDPM(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(grid,) * 3, dims=3, in_channels=1, out_channels=1,
            model_channels=mc, num_res_blocks=2, channel_mult=(1, 2, 4, 8),
            attention_resolutions=[16, 8], num_heads=4, num_classes=20,
            use_scale_shift_norm=True, dtype=jnp.bfloat16,
        ),
        schedule=LinearSchedule(1000),
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-4},
        ema_decay=0.9999,
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch_dict = {
        "data": jnp.asarray(
            rng.uniform(0, 1, (batch, grid, grid, grid, 1)).astype(np.float32),
        ),
        "labels": jnp.asarray(
            rng.uniform(0, 1, (batch, 4 * mc)).astype(np.float32),
        ),
    }
    for _ in range(3):  # compile + warm
        state, m = pipe.training_step(state, batch_dict)
    jax.block_until_ready(m["train_loss"])

    jax.profiler.start_trace(logdir)
    for _ in range(int(os.environ.get("XPROF_STEPS", 3))):
        state, m = pipe.training_step(state, batch_dict)
    jax.block_until_ready(m["train_loss"])
    jax.profiler.stop_trace()


def op_table(logdir: str, top: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no xplane.pb under {logdir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        stat_names = {i: m.name for i, m in plane.stat_metadata.items()}
        ev_meta = {i: m for i, m in plane.event_metadata.items()}
        by_cat = collections.Counter()
        by_op = collections.Counter()
        total = 0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                name = md.name if md else "?"
                dur = ev.duration_ps
                cat = None
                for st in ev.stats:
                    if stat_names.get(st.metadata_id) == "hlo_category":
                        cat = st.str_value or None
                for st in (md.stats if md else []):
                    if stat_names.get(st.metadata_id) == "hlo_category":
                        cat = st.str_value or cat
                by_cat[cat or name.split(".")[0].lstrip("%")] += dur
                by_op[name] += dur
                total += dur
        if not total:
            continue
        print(f"=== plane {plane.name}: total device {total/1e9:.3f} ms ===")
        print("-- by category --")
        for cat, d in by_cat.most_common(top):
            print(f"{d/total*100:6.2f}%  {d/1e9:9.3f} ms  {cat}")
        print("-- top ops --")
        for op, d in by_op.most_common(top):
            print(f"{d/total*100:6.2f}%  {d/1e9:9.3f} ms  {op}")
    return


if __name__ == "__main__":
    logdir = os.environ.get("XPROF_LOGDIR", "/tmp/xprof_flagship")
    if os.environ.get("XPROF_PARSE_ONLY") != "1":
        os.makedirs(logdir, exist_ok=True)
        capture_trace(logdir)
        time.sleep(1)
    op_table(logdir)
