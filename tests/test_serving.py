"""SamplingService: compiled-bucket micro-batching generation service.

The reference has no serving story (its `scripts/inference.py` reloads the
checkpoint per invocation); these tests cover the TPU-native service layer:
bucket quantisation, request coalescing, split-and-reassemble for oversized
requests, per-request noise determinism under batching, and the HTTP
surface.
"""
import http.client
import json
import threading
import time

import jax
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import DDPM, GaussianDiffusionPipeline, LinearSchedule
from rho_diffusion_tpu.serving import SamplingService, make_http_handler


def _backbone_kwargs(num_classes=None):
    kw = dict(
        data_shape=(8, 8),
        dims=2,
        in_channels=1,
        out_channels=1,
        model_channels=8,
        num_res_blocks=1,
        channel_mult=(1, 2),
        attention_resolutions=[],
        num_heads=1,
    )
    if num_classes is not None:
        kw["num_classes"] = num_classes
    return kw


@pytest.fixture(scope="module")
def uncond_service():
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
    )
    params = pipe.init_params(jax.random.PRNGKey(0))
    service = SamplingService(
        pipe, params, sampler="ddim", num_steps=4, eta=0.0,
        batch_buckets=(1, 2, 4), max_delay_s=0.05,
    )
    yield service
    service.close()


def test_keys_from_seeds_matches_per_sample_keys():
    """The in-jit integer->typed-key path (what _launch compiles) must be
    bitwise identical to the eager per_sample_keys contract — request
    determinism across service versions depends on it."""
    from rho_diffusion_tpu.diffusion.sampling_rng import (
        keys_from_seeds,
        per_sample_keys,
    )

    eager = per_sample_keys(1234, 4, start=2)
    traced = jax.jit(keys_from_seeds)(
        np.full(4, 1234, np.uint32), np.arange(2, 6, dtype=np.int32),
    )
    np.testing.assert_array_equal(
        jax.random.key_data(eager), jax.random.key_data(traced),
    )


def test_single_request_roundtrip(uncond_service):
    res = uncond_service.generate(n=3, seed=7)
    assert res.samples.shape == (3, 8, 8, 1)
    assert np.isfinite(res.samples).all()
    assert res.bucket == 4  # smallest bucket >= 3
    assert res.latency_s > 0


def test_oversized_request_split_and_reassembled(uncond_service):
    res = uncond_service.generate(n=6, seed=1)
    assert res.samples.shape == (6, 8, 8, 1)
    assert np.isfinite(res.samples).all()
    # rows must equal two independent requests with the same seed prefix:
    # chunking may not change a request's noise (x_T is per (seed, row))
    again = uncond_service.generate(n=6, seed=1)
    np.testing.assert_array_equal(res.samples, again.samples)


def test_determinism_under_batching(uncond_service):
    """eta=0 DDIM: a request's samples are bit-identical whether it ran
    alone or coalesced with unrelated concurrent requests."""
    alone = uncond_service.generate(n=1, seed=42).samples
    futs = [
        uncond_service.submit(n=1, seed=42),
        uncond_service.submit(n=1, seed=999),
        uncond_service.submit(n=1, seed=1000),
    ]
    batched = futs[0].result(timeout=120).samples
    np.testing.assert_array_equal(alone, batched)
    # and different seeds genuinely differ
    other = futs[1].result(timeout=120).samples
    assert np.abs(alone - other).max() > 0


def test_concurrent_submissions_all_fulfilled(uncond_service):
    futs = [uncond_service.submit(n=1, seed=s) for s in range(7)]
    outs = [f.result(timeout=120) for f in futs]
    assert all(o.samples.shape == (1, 8, 8, 1) for o in outs)
    stats = uncond_service.stats()
    assert stats["requests"] >= 7
    assert stats["samples"] >= 7
    assert stats["launches"] >= 1
    assert 0 < stats["mean_occupancy"] <= 1
    assert stats["latency_p50_s"] > 0
    assert set(stats["compiled_buckets"]) <= {1, 2, 4}


def test_argument_validation(uncond_service):
    with pytest.raises(ValueError):
        uncond_service.submit(conditions=np.zeros((1, 3)))  # uncond service
    with pytest.raises(ValueError):
        uncond_service.submit(n=0)


def test_conditional_service_and_validation():
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(num_classes=20),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
    )
    # zero-init out-convs make an untrained model condition-blind (see
    # RESULTS.md round-3 parity note) — perturb every leaf so conditioning
    # actually reaches the output
    params = jax.tree.map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.PRNGKey(1), p.shape, p.dtype),
        pipe.init_params(jax.random.PRNGKey(0)),
    )
    # hash-embedding-style conditioning rows: width == 4*model_channels
    with SamplingService(
        pipe, params, sampler="ddim", num_steps=4,
        cond_dim=32, batch_buckets=(2,), max_delay_s=0.0,
    ) as service:
        conds = np.random.default_rng(0).normal(size=(2, 32)).astype(np.float32)
        res = service.generate(conditions=conds, seed=3)
        assert res.samples.shape == (2, 8, 8, 1)
        assert np.isfinite(res.samples).all()
        # same conditions + seed -> identical; different conditions -> differ
        res2 = service.generate(conditions=conds, seed=3)
        np.testing.assert_array_equal(res.samples, res2.samples)
        res3 = service.generate(conditions=conds + 1.0, seed=3)
        assert np.abs(res.samples - res3.samples).max() > 0
        with pytest.raises(ValueError):
            service.submit(conditions=np.zeros((2, 5), np.float32))
        with pytest.raises(ValueError):
            service.submit(n=2)  # conditional service needs rows


def test_transfer_dtype_narrows_pull_widens_on_host():
    """transfer_dtype=bfloat16 rounds ONLY the final pulled sample (the
    sampler's internal math stays f32): callers still get float32 arrays,
    within one bf16 ulp of the exact-transfer service."""
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
    )
    params = pipe.init_params(jax.random.PRNGKey(0))
    with SamplingService(
        pipe, params, sampler="ddim", num_steps=4,
        batch_buckets=(2,), max_delay_s=0.0,
    ) as exact:
        ref = exact.generate(n=2, seed=5).samples
    with SamplingService(
        pipe, params, sampler="ddim", num_steps=4,
        batch_buckets=(2,), max_delay_s=0.0, transfer_dtype="bfloat16",
    ) as narrowed:
        out = narrowed.generate(n=2, seed=5).samples
    assert out.dtype == np.float32  # widened back after the transfer
    assert np.isfinite(out).all()
    # bf16 keeps 8 mantissa bits: relative error <= 2^-8 of the magnitude
    np.testing.assert_allclose(out, ref, atol=2 ** -8 * np.abs(ref).max())
    with pytest.raises(ValueError):
        SamplingService(pipe, params, transfer_dtype="int8")


def test_ddpm_pipeline_service():
    """The ancestral DDPM pipeline (reference ddpm.py:132-229) serves too."""
    pipe = DDPM(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        optimizer="AdamW",
    )
    params = pipe.create_state(jax.random.PRNGKey(0)).params
    with SamplingService(
        pipe, params, batch_buckets=(2,), max_delay_s=0.0,
    ) as service:
        res = service.generate(n=2, seed=0)
        assert res.samples.shape == (2, 8, 8, 1)
        assert np.isfinite(res.samples).all()


def test_spacing_control_serves_distilled_grid():
    """--spacing 'trailing' (the grid a distilled student was trained on,
    scripts/distill.py) changes the compiled sampler's respacing grid; the
    DDPM pipeline (full-schedule only) rejects the knob."""
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
    )
    params = pipe.init_params(jax.random.PRNGKey(0))
    outs = {}
    for spacing in ("trailing", "uniform-t"):
        with SamplingService(
            pipe, params, sampler="ddim", num_steps=4, spacing=spacing,
            batch_buckets=(2,), max_delay_s=0.0,
        ) as service:
            assert service.stats()["spacing"] == spacing
            outs[spacing] = service.generate(n=2, seed=0).samples
            assert np.isfinite(outs[spacing]).all()
    # different grid -> different trajectory from the same request seed
    assert not np.allclose(outs["trailing"], outs["uniform-t"])

    ddpm = DDPM(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        optimizer="AdamW",
    )
    dparams = ddpm.create_state(jax.random.PRNGKey(0)).params
    with pytest.raises(ValueError, match="full schedule"):
        SamplingService(ddpm, dparams, spacing="trailing", batch_buckets=(1,))


def test_quantized_service():
    """quantize='int8' serves finite samples from an unchanged checkpoint
    (W8A8 execution mode, ops/quant.py) and resets cleanly."""
    from rho_diffusion_tpu.ops.quant import get_conv_quant, set_conv_quant

    pipe = DDPM(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        optimizer="AdamW",
    )
    params = pipe.create_state(jax.random.PRNGKey(0)).params
    try:
        with SamplingService(
            pipe, params, batch_buckets=(2,), max_delay_s=0.0,
            quantize="int8",
        ) as service:
            assert get_conv_quant() == "int8"
            res = service.generate(n=2, seed=0)
            assert res.samples.shape == (2, 8, 8, 1)
            assert np.isfinite(res.samples).all()
        # close() restores the process-global conv-quant mode so a later
        # service/trace with quantize=None doesn't silently compile int8
        assert get_conv_quant() == "off"
        with pytest.raises(ValueError, match="conv quant mode"):
            SamplingService(pipe, params, quantize="int4")
    finally:
        set_conv_quant("off")


def test_stochastic_samplers_request_deterministic():
    """Ancestral DDPM (and eta>0 DDIM) step noise comes from per-row keys
    (diffusion/sampling_rng.py): a request's samples are bit-identical
    whether it ran alone, coalesced with strangers, split across launches,
    or on a different service instance. The reference's batch-wide torch
    noise (ddpm.py:211-215) has no such property."""
    pipe = DDPM(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        optimizer="AdamW",
    )
    params = pipe.create_state(jax.random.PRNGKey(0)).params

    with SamplingService(
        pipe, params, batch_buckets=(1, 4), max_delay_s=0.05,
    ) as service:
        alone = service.generate(n=1, seed=42).samples
        futs = [
            service.submit(n=1, seed=42),
            service.submit(n=1, seed=7),
            service.submit(n=1, seed=8),
        ]
        batched = futs[0].result(timeout=120).samples
        np.testing.assert_array_equal(alone, batched)
        assert np.abs(alone - futs[1].result(timeout=120).samples).max() > 0
        # splitting: rows 0..3 + 4..5 of an oversized request equal the
        # same rows sampled as one request on a fresh instance
        big = service.generate(n=6, seed=5).samples
    with SamplingService(
        pipe, params, batch_buckets=(1, 4), max_delay_s=0.0,
    ) as service2:
        again = service2.generate(n=6, seed=5).samples
        np.testing.assert_array_equal(big, again)
        # eta>0 DDIM on the Gaussian family rides the same per-row keys
    gpipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
    )
    gparams = gpipe.init_params(jax.random.PRNGKey(0))
    with SamplingService(
        gpipe, gparams, sampler="ddim", num_steps=4, eta=0.7,
        batch_buckets=(1, 2), max_delay_s=0.0,
    ) as ga, SamplingService(
        gpipe, gparams, sampler="ddim", num_steps=4, eta=0.7,
        batch_buckets=(1, 2), max_delay_s=0.0,
    ) as gb:
        np.testing.assert_array_equal(
            ga.generate(n=2, seed=11).samples,
            gb.generate(n=2, seed=11).samples,
        )


def test_http_surface(uncond_service):
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_http_handler(uncond_service),
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read()) == {"ok": True}

        body = json.dumps({"n": 2, "seed": 5})
        conn.request("POST", "/generate", body=body,
                     headers={"Content-Type": "application/json"})
        reply = json.loads(conn.getresponse().read())
        assert reply["shape"] == [2, 8, 8, 1]
        arr = np.asarray(reply["samples"], np.float32)
        assert np.isfinite(arr).all()

        # stats-only replies omit the payload (load-test mode)
        conn.request("POST", "/generate",
                     body=json.dumps({"n": 1, "return": "stats"}),
                     headers={"Content-Type": "application/json"})
        reply = json.loads(conn.getresponse().read())
        assert "samples" not in reply and reply["shape"] == [1, 8, 8, 1]

        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["requests"] >= 3

        # malformed request -> 400, not a crash
        conn.request("POST", "/generate",
                     body=json.dumps({"conditions": [[1, 2, 3]]}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 400
        assert "error" in json.loads(resp.read())

        # /reload on a service without a config is a clean client error
        conn.request("POST", "/reload", body="{}",
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 400
        assert "from_config" in json.loads(resp.read())["error"]
        conn.close()
    finally:
        server.shutdown()
        t.join(timeout=10)


def test_data_parallel_mesh_service_matches_single_device():
    """A mesh-backed service shards each launch over the data axis and
    returns the same samples as a single-device service (pod-slice serving
    shape; conftest provides the 8 virtual devices)."""
    from rho_diffusion_tpu.parallel.mesh import make_mesh

    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
    )
    params = jax.tree.map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.PRNGKey(1), p.shape, p.dtype),
        pipe.init_params(jax.random.PRNGKey(0)),
    )
    mesh = make_mesh(data=8)
    with SamplingService(
        pipe, params, sampler="ddim", num_steps=4,
        batch_buckets=(8,), max_delay_s=0.0, mesh=mesh,
    ) as sharded, SamplingService(
        pipe, params, sampler="ddim", num_steps=4,
        batch_buckets=(8,), max_delay_s=0.0,
    ) as single:
        a = sharded.generate(n=8, seed=5).samples
        b = single.generate(n=8, seed=5).samples
        assert a.shape == (8, 8, 8, 1)
        np.testing.assert_allclose(a, b, atol=2e-5)

    # buckets that don't divide the data axis are rejected up front
    with pytest.raises(ValueError, match="divisible"):
        SamplingService(pipe, params, batch_buckets=(1, 2), mesh=mesh)


@pytest.mark.heavy
def test_context_parallel_mesh_service_matches_single_device():
    """Long-context serving: a data=2 x context=2 mesh shards the volume
    depth (GSPMD halo convs) and the attention tokens (ring attention via
    the active-mesh dispatch); samples must match single-device."""
    from rho_diffusion_tpu.parallel.mesh import make_mesh

    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(8, 8, 8), dims=3, in_channels=1, out_channels=1,
            model_channels=16, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=[2], num_heads=2,
        ),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
    )
    params = jax.tree.map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.PRNGKey(1), p.shape, p.dtype),
        pipe.init_params(jax.random.PRNGKey(0)),
    )
    with SamplingService(
        pipe, params, sampler="ddim", num_steps=3,
        batch_buckets=(2,), max_delay_s=0.0,
        mesh=make_mesh(data=2, context=2, devices=jax.devices()[:4]),
    ) as cp, SamplingService(
        pipe, params, sampler="ddim", num_steps=3,
        batch_buckets=(2,), max_delay_s=0.0,
    ) as single:
        a = cp.generate(n=2, seed=9).samples
        b = single.generate(n=2, seed=9).samples
        assert a.shape == (2, 8, 8, 8, 1)
        np.testing.assert_allclose(a, b, atol=5e-5)


def test_warmup_fails_fast_on_broken_service():
    """warmup=True must surface sampler errors at construction, not defer
    them to the first request: a class-conditional model served without
    cond_dim traces apply(y=None) and dies in the UNet's guard."""
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(num_classes=20),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
    )
    params = pipe.init_params(jax.random.PRNGKey(0))
    with pytest.raises(Exception):
        SamplingService(
            pipe, params, sampler="ddim", num_steps=2,
            cond_dim=None, batch_buckets=(1,), warmup=True,
        )


@pytest.mark.heavy
def test_from_config_derives_cond_dim_and_warns(tmp_path):
    """from_config must serve a class-conditional config out of the box
    (deriving the condition-row width from the model kwargs) and report a
    missing checkpoint instead of silently serving untrained weights."""
    config = {
        "experiment": "serve-cond",
        "model": {
            "name": "UNetv2",
            "kwargs": dict(
                dims=2, in_channels=1, out_channels=1, model_channels=8,
                num_res_blocks=1, data_shape=[8, 8], channel_mult=[1, 2],
                attention_resolutions=[], num_classes=20,
            ),
        },
        "dataset": {"name": "SphericalHarmonicDataset", "kwargs": {"max_l": 2}},
        "optimizer": {"name": "AdamW", "kwargs": {"lr": 1e-3}},
        "noise_schedule": {
            "name": "LinearSchedule",
            "kwargs": {"num_steps": 20, "beta_1": 2e-4, "beta_T": 1e-2},
        },
        "pipeline": {"name": "DDPM", "kwargs": {}},
        "training": {
            "batch_size": 4, "max_epochs": 1, "loss_fn": "MSELoss",
            "checkpoint_dir": str(tmp_path / "does_not_exist"),
        },
        "inference": {"num_samples": 2},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(config))
    logged = []
    service = SamplingService.from_config(
        cfg_path, checkpoint=str(tmp_path / "missing.pth"),
        log=logged.append, batch_buckets=(2,), max_delay_s=0.0,
    )
    try:
        # hash-embedding width = 4 * model_channels (no cond_fn configured)
        assert service.cond_dim == 32
        assert any("WARNING" in m and "missing.pth" in m for m in logged), logged
        conds = np.zeros((2, 32), np.float32)
        res = service.generate(conditions=conds, seed=0)
        assert res.samples.shape == (2, 8, 8, 1)
        assert np.isfinite(res.samples).all()
    finally:
        service.close()


def test_hot_reload_swaps_weights(tmp_path):
    """update_params/reload_from_checkpoint: a from_config service picks up
    newer weights (a live training run's checkpoint) without recompiling —
    same request, different samples after the reload."""
    from rho_diffusion_tpu.training.checkpoint import save_model_weights

    config = {
        "experiment": "serve-reload",
        "model": {
            "name": "UNetv2",
            "kwargs": dict(
                dims=2, in_channels=1, out_channels=1, model_channels=8,
                num_res_blocks=1, data_shape=[8, 8], channel_mult=[1, 2],
                attention_resolutions=[],
            ),
        },
        "dataset": {"name": "SphericalHarmonicDataset", "kwargs": {"max_l": 2}},
        "optimizer": {"name": "AdamW", "kwargs": {"lr": 1e-3}},
        "noise_schedule": {
            "name": "LinearSchedule",
            "kwargs": {"num_steps": 20, "beta_1": 2e-4, "beta_T": 1e-2},
        },
        "pipeline": {"name": "DDPM", "kwargs": {}},
        "training": {
            "batch_size": 4, "max_epochs": 1, "loss_fn": "MSELoss",
            "checkpoint_dir": str(tmp_path / "none"),
        },
        "inference": {"num_samples": 2},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(config))
    service = SamplingService.from_config(
        cfg_path, log=lambda m: None, batch_buckets=(1,), max_delay_s=0.0,
    )
    try:
        before = service.generate(n=1, seed=0).samples
        launches_before = service.stats()["launches"]

        # "training" produced new weights: perturb and save as .npz
        new_params = jax.tree.map(
            lambda p: p + 0.1 * jax.random.normal(
                jax.random.PRNGKey(2), p.shape, p.dtype,
            ),
            service.params,
        )
        ckpt = tmp_path / "model.npz"
        save_model_weights(new_params, ckpt)
        messages = service.reload_from_checkpoint(str(ckpt))
        assert any("loaded weights" in m for m in messages), messages

        after = service.generate(n=1, seed=0).samples  # same seed/x_T
        assert np.abs(before - after).max() > 0
        # no new compile happened: still the one bucket-1 program
        assert sorted(service._compiled) == [1]
        assert service.stats()["launches"] == launches_before + 1
    finally:
        service.close()

    # a service not built by from_config refuses checkpoint reloads but
    # accepts direct param swaps
    pipe = service.pipeline
    with SamplingService(
        pipe, service.params, batch_buckets=(1,), max_delay_s=0.0,
    ) as direct:
        with pytest.raises(RuntimeError, match="from_config"):
            direct.reload_from_checkpoint(str(tmp_path / "model.npz"))
        direct.update_params(new_params)


@pytest.mark.slow
@pytest.mark.heavy
def test_serve_cli_end_to_end(tmp_path):
    """scripts/serve.py: config -> HTTP service -> finite samples."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    config = {
        "experiment": "serve-e2e",
        "model": {
            "name": "UNetv2",
            "kwargs": dict(
                dims=2, in_channels=1, out_channels=1, model_channels=8,
                num_res_blocks=1, data_shape=[8, 8], channel_mult=[1, 2],
                attention_resolutions=[],
            ),
        },
        "dataset": {"name": "SphericalHarmonicDataset", "kwargs": {"max_l": 2}},
        "optimizer": {"name": "AdamW", "kwargs": {"lr": 1e-3}},
        "noise_schedule": {
            "name": "LinearSchedule",
            "kwargs": {"num_steps": 20, "beta_1": 2e-4, "beta_T": 1e-2},
        },
        "pipeline": {"name": "DDPM", "kwargs": {}},
        "training": {
            "batch_size": 4, "max_epochs": 1, "loss_fn": "MSELoss",
            "checkpoint_dir": str(tmp_path / "none"),
        },
        "inference": {"num_samples": 2},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(config))
    repo = Path(__file__).resolve().parents[1]
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}
    # stderr goes to a FILE, not a PIPE: nobody drains it while we block on
    # the HTTP response, and XLA can emit tens of KB of warnings (observed:
    # stale-AOT-cache machine-feature spam after a VM change) — enough to
    # fill a 64 KB pipe and deadlock the server mid-request
    err_path = tmp_path / "server_stderr.log"
    with open(err_path, "w") as err_f:
        proc = subprocess.Popen(
            [sys.executable, str(repo / "scripts" / "serve.py"), str(cfg_path),
             "-d", "cpu", "--port", "0", "--buckets", "1,2"],
            stdout=subprocess.PIPE, stderr=err_f, text=True, env=env,
        )
    try:
        # checkpoint-provenance messages precede the bind line
        for _ in range(20):
            line = proc.stdout.readline()  # blocks until the server binds
            if "serving on http://" in line:
                break
        assert "serving on http://" in line, line
        port = int(line.split(":")[-1].split(" ")[0].split("/")[0])
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/generate",
                     body=json.dumps({"n": 2, "seed": 11}),
                     headers={"Content-Type": "application/json"})
        reply = json.loads(conn.getresponse().read())
        assert reply["shape"] == [2, 8, 8, 1]
        assert np.isfinite(np.asarray(reply["samples"], np.float32)).all()
        conn.close()
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_device_failure_at_pull_fails_futures_not_service():
    """With pipelined pulls, a device-side error surfaces at the blocking
    np.asarray in the pull thread (jax dispatch is async). The failing
    launch's futures must carry the exception, and BOTH worker and pull
    threads must survive to serve later requests."""
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
    )
    params = pipe.init_params(jax.random.PRNGKey(0))
    service = SamplingService(pipe, params, batch_buckets=(1,), max_delay_s=0.0)
    try:
        service.generate(n=1, seed=0)  # compile bucket 1
        real_fn = service._compiled[1]

        class _ExplodesOnPull:
            def __array__(self, *a, **k):
                raise RuntimeError("simulated device failure")

        service._compiled[1] = lambda *a, **k: _ExplodesOnPull()
        with pytest.raises(RuntimeError, match="simulated device failure"):
            service.submit(n=1, seed=1).result(timeout=120)
        service._compiled[1] = real_fn
        ok = service.generate(n=1, seed=2)  # service still alive
        assert np.isfinite(ok.samples).all()
    finally:
        service.close()


def test_close_fails_pending_requests():
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
    )
    params = pipe.init_params(jax.random.PRNGKey(0))
    service = SamplingService(pipe, params, batch_buckets=(1,), max_delay_s=0.0)
    fut = service.submit(n=1, seed=0)
    fut.result(timeout=120)  # let the worker drain before closing
    service.close()
    with pytest.raises(RuntimeError):
        service.submit(n=1)


def test_delivery_exception_does_not_kill_pull_thread():
    """Anything escaping _deliver (e.g. InvalidStateError from a future a
    client cancelled between the done() check and set_result) must not end
    the pull thread: with the bounded pull queue the worker would block on
    put() forever and the whole service would deadlock. The guard fails the
    affected launch's futures and keeps pulling."""
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
    )
    params = pipe.init_params(jax.random.PRNGKey(0))
    service = SamplingService(pipe, params, batch_buckets=(1,), max_delay_s=0.0)
    try:
        service.generate(n=1, seed=0)  # compile bucket 1

        real_deliver = service._deliver

        def exploding_deliver(*a, **k):
            raise RuntimeError("simulated delivery bug")

        service._deliver = exploding_deliver
        fut = service.submit(n=1, seed=1)
        with pytest.raises(RuntimeError, match="simulated delivery bug"):
            fut.result(timeout=120)
        service._deliver = real_deliver
        # pull thread survived: later requests are served normally
        ok = service.generate(n=1, seed=2)
        assert np.isfinite(ok.samples).all()
        assert service._puller.is_alive()
    finally:
        service.close()


def test_from_config_honours_inference_spacing(tmp_path):
    """A student config pinning inference.spacing='trailing' (the
    scripts/distill.py serving contract) flows into the compiled
    samplers without any CLI flag."""
    config = {
        "experiment": "serve-student",
        "model": {
            "name": "UNetv2",
            "kwargs": dict(
                dims=2, in_channels=1, out_channels=1, model_channels=8,
                num_res_blocks=1, data_shape=[8, 8], channel_mult=[1, 2],
                attention_resolutions=[],
            ),
        },
        "dataset": {"name": "SphericalHarmonicDataset", "kwargs": {"max_l": 2}},
        "optimizer": {"name": "AdamW", "kwargs": {"lr": 1e-3}},
        "noise_schedule": {
            "name": "LinearSchedule",
            "kwargs": {"num_steps": 20, "beta_1": 2e-4, "beta_T": 1e-2},
        },
        "pipeline": {
            "name": "GaussianDiffusionPipeline",
            "kwargs": {"model_mean_type": "epsilon"},
        },
        "training": {
            "batch_size": 4, "max_epochs": 1, "loss_fn": "MSELoss",
            "checkpoint_dir": str(tmp_path / "none"),
        },
        "inference": {"sampler": "ddim", "ddim_steps": 4, "spacing": "trailing"},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(config))
    with SamplingService.from_config(
        cfg_path, log=lambda m: None, batch_buckets=(1,), max_delay_s=0.0,
    ) as service:
        assert service.stats()["spacing"] == "trailing"
        assert service.num_steps == 4
        res = service.generate(n=1, seed=0)
        assert np.isfinite(res.samples).all()
