"""Mesh / sharding / ring-attention tests on the 8-device virtual CPU
platform — the multi-device test story the reference lacked entirely
(its DDP was only exercised manually via mpiexec; SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.ops.attention import xla_attention
from rho_diffusion_tpu.parallel import batch_sharding, make_mesh, shard_batch
from rho_diffusion_tpu.parallel.context import context_sharded_attention


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "context")
    mesh2 = make_mesh(data=4, context=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["context"] == 2
    with pytest.raises(AssertionError):
        make_mesh(data=3, context=2)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = {"data": np.ones((16, 4, 4, 1), np.float32), "labels": None}
    out = shard_batch(batch, mesh)
    sh = out["data"].sharding
    assert sh.spec[0] == "data"
    assert out["labels"] is None


def test_data_parallel_mean_matches_single_device():
    """A jitted global-mean over a sharded batch equals the local compute —
    the gradient-psum correctness primitive."""
    mesh = make_mesh()
    x = np.random.default_rng(0).normal(size=(16, 8)).astype(np.float32)
    xs = jax.device_put(x, batch_sharding(mesh))
    got = jax.jit(lambda a: jnp.mean(a * a))(xs)
    np.testing.assert_allclose(float(got), float(np.mean(x * x)), rtol=1e-6)


def test_ring_attention_matches_full_attention():
    """Exact ring attention over a context=8 mesh == single-device full
    softmax attention."""
    mesh = make_mesh(data=1, context=8)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (2, 64, 2, 16)) for kk in keys)
    ref = xla_attention(q, k, v)
    out = context_sharded_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_context4_data2():
    """Mixed mesh: batch on data axis, tokens on context axis."""
    mesh = make_mesh(data=2, context=4)
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (4, 32, 2, 8)) for kk in keys)
    ref = xla_attention(q, k, v)
    out = context_sharded_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.heavy
def test_ring_attention_grads_flow():
    mesh = make_mesh(data=1, context=8)
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (1, 64, 2, 8)) for kk in keys)

    def loss_ring(q, k, v):
        return jnp.sum(context_sharded_attention(q, k, v, mesh) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_runtime_introspection():
    from rho_diffusion_tpu.parallel import (
        accelerator_available,
        get_device_stats,
        parse_devices,
        runtime_summary,
    )

    assert accelerator_available("cpu")
    assert not accelerator_available("nope")
    assert len(parse_devices()) == 8
    assert len(parse_devices(2)) == 2
    assert len(parse_devices([0, 3])) == 2
    info = runtime_summary()
    assert info["device_count"] == 8 and info["process_count"] == 1
    stats = get_device_stats()
    assert stats["platform"] == "cpu"


def test_density_marginalize_and_sample():
    from rho_diffusion_tpu.data import Density

    d = Density(np.ones((4, 4, 4)) / 64.0)
    marg = d.marginalize(axis=2)
    assert marg.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(marg).sum(), 1.0, rtol=1e-6)
    idx = d.sample(100, rng=np.random.default_rng(0))
    assert idx.shape == (100, 3)
    assert idx.min() >= 0 and idx.max() < 4


@pytest.mark.heavy
def test_tensor_parallel_param_sharding_matches_replicated():
    """GSPMD TP: output-channel-sharded params must produce the same train
    step result as fully replicated params (collectives inserted by XLA)."""
    import rho_diffusion_tpu  # noqa: F401
    from rho_diffusion_tpu.diffusion import DDPM, LinearSchedule
    from rho_diffusion_tpu.parallel import (
        make_mesh,
        replicate_state,
        shard_batch,
        shard_params_for_tp,
        tp_sharding_summary,
    )

    pipe = DDPM(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(8, 8), dims=2, in_channels=1, out_channels=1,
            model_channels=16, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=[], num_heads=1,
        ),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
    )
    mesh = make_mesh(data=4, context=2)
    state = pipe.create_state(jax.random.PRNGKey(0))
    batch = {
        "data": np.random.default_rng(0).uniform(-1, 1, (8, 8, 8, 1)).astype(np.float32),
        "labels": None,
    }

    rep_state = replicate_state(state, mesh)
    rep_batch = shard_batch(dict(batch), mesh)
    with mesh:
        s1, m1 = pipe.train_step(rep_state, rep_batch)

    tp_state = shard_params_for_tp(
        pipe.create_state(jax.random.PRNGKey(0)), mesh, min_dim=16,
    )
    summary = tp_sharding_summary(tp_state.params)
    assert summary["sharded"] > 0, "expected some TP-sharded kernels"
    tp_batch = shard_batch(dict(batch), mesh)
    with mesh:
        s2, m2 = pipe.train_step(tp_state, tp_batch)

    np.testing.assert_allclose(
        float(m1["train_loss"]), float(m2["train_loss"]), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4,
    )


def _attn_pipe():
    """Small UNetv2 WITH attention (16 tokens at ds=2) for CP tests."""
    import rho_diffusion_tpu  # noqa: F401
    from rho_diffusion_tpu.diffusion import DDPM, LinearSchedule

    return DDPM(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(8, 8), dims=2, in_channels=1, out_channels=1,
            model_channels=16, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=[2], num_heads=2,
        ),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
    )


@pytest.mark.heavy
def test_context_parallel_train_step_matches_pure_dp():
    """VERDICT round-1 item 3: the full UNetv2 train step on a
    data=4 x context=2 mesh (ring attention auto-dispatched through the
    active mesh) must match the data=8 pure-DP loss."""
    from rho_diffusion_tpu.parallel import active_mesh, replicate_state, shard_batch

    pipe = _attn_pipe()
    batch = {
        "data": np.random.default_rng(1).uniform(-1, 1, (8, 8, 8, 1)).astype(np.float32),
        "labels": None,
    }

    mesh_dp = make_mesh(data=8, context=1)
    with active_mesh(mesh_dp):
        s_dp = replicate_state(pipe.create_state(jax.random.PRNGKey(0)), mesh_dp)
        _, m_dp = pipe.train_step(s_dp, shard_batch(dict(batch), mesh_dp))
        loss_dp = float(m_dp["train_loss"])

    mesh_cp = make_mesh(data=4, context=2)
    with active_mesh(mesh_cp):
        s_cp = replicate_state(pipe.create_state(jax.random.PRNGKey(0)), mesh_cp)
        _, m_cp = pipe.train_step(s_cp, shard_batch(dict(batch), mesh_cp))
        loss_cp = float(m_cp["train_loss"])

    assert np.isfinite(loss_cp)
    np.testing.assert_allclose(loss_cp, loss_dp, rtol=2e-5)


def test_ring_backend_dispatch_under_active_mesh():
    """attention(backend="auto") routes to ring attention exactly when the
    active mesh has context > 1 and the token count divides."""
    from rho_diffusion_tpu.ops.attention import _ring_capable
    from rho_diffusion_tpu.parallel import active_mesh

    q = jnp.zeros((2, 16, 2, 8))
    assert not _ring_capable(q)  # no active mesh
    with active_mesh(make_mesh(data=4, context=2)):
        assert _ring_capable(q)
        assert not _ring_capable(jnp.zeros((2, 15, 2, 8)))  # 15 % 2 != 0
    with active_mesh(make_mesh(data=8, context=1)):
        assert not _ring_capable(q)  # context axis of size 1


@pytest.mark.heavy
def test_zero1_opt_state_sharded_and_loss_matches():
    """VERDICT round-1 item 5 (ZeRO-1): optimizer moments sharded 1/N over
    the data axis; the train step's loss matches fully-replicated DP."""
    from rho_diffusion_tpu.parallel import (
        active_mesh,
        replicate_state,
        shard_batch,
        shard_opt_state_zero1,
    )

    pipe = _attn_pipe()
    batch = {
        "data": np.random.default_rng(2).uniform(-1, 1, (8, 8, 8, 1)).astype(np.float32),
        "labels": None,
    }
    mesh = make_mesh(data=8, context=1)

    with active_mesh(mesh):
        s_rep = replicate_state(pipe.create_state(jax.random.PRNGKey(0)), mesh)
        _, m_rep = pipe.train_step(s_rep, shard_batch(dict(batch), mesh))

        s_z = replicate_state(pipe.create_state(jax.random.PRNGKey(0)), mesh)
        s_z = shard_opt_state_zero1(s_z, mesh)
        # every large moment leaf must be sharded over "data": its
        # per-device footprint is 1/8 of the replicated one
        sharded_leaves = [
            l for l in jax.tree_util.tree_leaves(s_z.opt_state)
            if hasattr(l, "sharding") and l.size >= 8
            and any(s is not None for s in (l.sharding.spec or ()))
        ]
        assert sharded_leaves, "expected sharded optimizer moments"
        big = max(sharded_leaves, key=lambda l: l.size)
        assert big.addressable_shards[0].data.size == big.size // 8

        s_z2, m_z = pipe.train_step(s_z, shard_batch(dict(batch), mesh))

    np.testing.assert_allclose(
        float(m_z["train_loss"]), float(m_rep["train_loss"]), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(m_z["grad_norm"]), float(m_rep["grad_norm"]), rtol=1e-4,
    )
    # updated moments keep their sharding (memory stays 1/N across steps)
    big2 = max(
        (l for l in jax.tree_util.tree_leaves(s_z2.opt_state)
         if hasattr(l, "sharding") and l.size >= 8),
        key=lambda l: l.size,
    )
    assert any(s is not None for s in (big2.sharding.spec or ())), (
        "opt-state sharding lost after one train step"
    )


def test_fsdp_params_sharded_and_loss_matches():
    """FSDP / ZeRO-3 (shard_state_fsdp): params + moments sharded 1/N over
    the data axis; two train steps match fully-replicated DP (the second
    step consumes parameters updated in sharded form), and the shardings
    survive the update."""
    from rho_diffusion_tpu.parallel import (
        active_mesh,
        replicate_state,
        shard_batch,
        shard_state_fsdp,
    )

    pipe = _attn_pipe()
    rng = np.random.default_rng(3)
    batches = [
        {
            "data": rng.uniform(-1, 1, (8, 8, 8, 1)).astype(np.float32),
            "labels": None,
        }
        for _ in range(2)
    ]
    mesh = make_mesh(data=8, context=1)

    def big_sharded(tree):
        return [
            l for l in jax.tree_util.tree_leaves(tree)
            if hasattr(l, "sharding") and l.size >= 8
            and any(s is not None for s in (l.sharding.spec or ()))
        ]

    with active_mesh(mesh):
        s_rep = replicate_state(pipe.create_state(jax.random.PRNGKey(0)), mesh)
        s_f = replicate_state(pipe.create_state(jax.random.PRNGKey(0)), mesh)
        s_f = shard_state_fsdp(s_f, mesh)

        shp = big_sharded(s_f.params)
        assert shp, "expected sharded parameters"
        big = max(shp, key=lambda l: l.size)
        assert big.addressable_shards[0].data.size == big.size // 8
        assert big_sharded(s_f.opt_state), "expected sharded moments"

        losses_rep, losses_f = [], []
        for b in batches:
            s_rep, m_rep = pipe.train_step(s_rep, shard_batch(dict(b), mesh))
            s_f, m_f = pipe.train_step(s_f, shard_batch(dict(b), mesh))
            losses_rep.append(float(m_rep["train_loss"]))
            losses_f.append(float(m_f["train_loss"]))

    np.testing.assert_allclose(losses_f, losses_rep, rtol=2e-5)
    # params keep their sharding across the update (memory stays 1/N)
    assert big_sharded(s_f.params), "param sharding lost after train steps"


@pytest.mark.heavy
def test_fsdp_sharded_init_matches_replicated():
    """create_state_fsdp initialises DIRECTLY into the 1/N shards (jit +
    out_shardings — the full state never lives on one device): values match
    an unsharded create_state bitwise, big leaves hold 1/8 per device, and
    a train step from the sharded-init state matches replicated DP."""
    from rho_diffusion_tpu.parallel import (
        active_mesh,
        create_state_fsdp,
        replicate_state,
        shard_batch,
    )

    pipe = _attn_pipe()
    rng = np.random.default_rng(7)
    batch = {
        "data": rng.uniform(-1, 1, (8, 8, 8, 1)).astype(np.float32),
        "labels": None,
    }
    mesh = make_mesh(data=8, context=1)

    with active_mesh(mesh):
        s_f = create_state_fsdp(pipe.create_state, jax.random.PRNGKey(0), mesh)
        s_rep = replicate_state(pipe.create_state(jax.random.PRNGKey(0)), mesh)

        # identical init values despite the sharded materialisation
        for a, b in zip(
            jax.tree_util.tree_leaves(s_f.params),
            jax.tree_util.tree_leaves(s_rep.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

        big = max(
            jax.tree_util.tree_leaves(s_f.params), key=lambda l: l.size,
        )
        assert any(s is not None for s in (big.sharding.spec or ())), (
            "largest param should be sharded over the data axis"
        )
        assert big.addressable_shards[0].data.size == big.size // 8

        s_f, m_f = pipe.train_step(s_f, shard_batch(dict(batch), mesh))
        s_rep, m_rep = pipe.train_step(s_rep, shard_batch(dict(batch), mesh))

    np.testing.assert_allclose(
        float(m_f["train_loss"]), float(m_rep["train_loss"]), rtol=2e-5,
    )


def test_spatial_sharded_conv3d_exact():
    """Halo-exchange depth-sharded conv == unsharded SAME conv, values and
    gradients (ppermute's non-cyclic zeros reproduce SAME padding)."""
    from rho_diffusion_tpu.parallel.spatial import spatial_sharded_conv3d

    mesh = make_mesh(data=2, context=4)
    kx, kk = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (2, 8, 4, 4, 8))
    k = jax.random.normal(kk, (3, 3, 3, 8, 8)) * 0.2

    def ref(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    got = spatial_sharded_conv3d(x, k, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x, k)), atol=1e-5)

    g1 = jax.grad(lambda x, k: jnp.sum(spatial_sharded_conv3d(x, k, mesh) ** 2),
                  argnums=(0, 1))(x, k)
    g2 = jax.grad(lambda x, k: jnp.sum(ref(x, k) ** 2), argnums=(0, 1))(x, k)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.heavy
def test_spatial_sharding_full_model_loss_parity():
    """GSPMD spatial CP: the FULL 3D UNet train step with the volume's depth
    axis sharded over context must match the pure-DP loss (conv halo
    exchange + GroupNorm psums inserted by GSPMD; ring attention picks up
    the token sharding)."""
    import rho_diffusion_tpu  # noqa: F401
    from rho_diffusion_tpu.diffusion import DDPM, LinearSchedule
    from rho_diffusion_tpu.parallel import (
        active_mesh,
        batch_sharding,
        replicate_state,
    )

    pipe = DDPM(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(8, 8, 8), dims=3, in_channels=1, out_channels=1,
            model_channels=16, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=[2], num_heads=2,
        ),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
    )
    data = np.random.default_rng(5).uniform(-1, 1, (8, 8, 8, 8, 1)).astype(np.float32)

    mesh_dp = make_mesh(data=8, context=1)
    with active_mesh(mesh_dp):
        s = replicate_state(pipe.create_state(jax.random.PRNGKey(0)), mesh_dp)
        batch = {"data": jax.device_put(data, batch_sharding(mesh_dp)), "labels": None}
        _, m_dp = pipe.train_step(s, batch)

    mesh_sp = make_mesh(data=4, context=2)
    with active_mesh(mesh_sp):
        s = replicate_state(pipe.create_state(jax.random.PRNGKey(0)), mesh_sp)
        batch = {
            "data": jax.device_put(data, batch_sharding(mesh_sp, spatial=True)),
            "labels": None,
        }
        _, m_sp = pipe.train_step(s, batch)

    np.testing.assert_allclose(
        float(m_sp["train_loss"]), float(m_dp["train_loss"]), rtol=2e-5,
    )


@pytest.mark.heavy
def test_ulysses_attention_matches_full_attention():
    """Ulysses all-to-all head-scatter SP (SURVEY §5's alternative to ring
    when heads >= shards): exact vs single-device full attention, values
    and gradients."""
    from rho_diffusion_tpu.parallel import ulysses_sharded_attention

    mesh = make_mesh(data=2, context=4)
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, (4, 32, 4, 8)) for kk in keys)  # H=4=ctx
    ref = xla_attention(q, k, v)
    out = ulysses_sharded_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g1 = jax.grad(lambda q: jnp.sum(ulysses_sharded_attention(q, k, v, mesh) ** 2))(q)
    g2 = jax.grad(lambda q: jnp.sum(xla_attention(q, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-5)


def test_ulysses_backend_dispatch_and_fallback():
    """attention(backend="ulysses") under an active context mesh == full
    attention; falls back to xla when heads don't divide the context axis."""
    from rho_diffusion_tpu.ops.attention import attention
    from rho_diffusion_tpu.parallel import active_mesh

    keys = jax.random.split(jax.random.PRNGKey(4), 3)
    q, k, v = (jax.random.normal(kk, (2, 16, 2, 8)) for kk in keys)
    ref = xla_attention(q, k, v)
    with active_mesh(make_mesh(data=4, context=2)):
        out = attention(q, k, v, backend="ulysses")  # H=2 divisible by 2
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    with active_mesh(make_mesh(data=2, context=4)):
        out = attention(q, k, v, backend="ulysses")  # H=2 not divisible by 4
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_rdma_parity():
    """Pallas remote-DMA ring (context_rdma.py, RHO_RING_ATTN_IMPL=rdma):
    interpret mode executes the real make_async_remote_copy + semaphore
    flow control on the virtual mesh; output must match both the XLA
    ppermute ring and full attention to the XLA ring's own bound.

    Context-only meshes: pallas interpret's dma_start discharge supports
    single-axis meshes only; the (data x context) production mesh is
    hardware-pending (see parallel/context_rdma.py docstring)."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("context",))
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, (2, 64, 2, 16)) for kk in keys)
    ref = xla_attention(q, k, v)
    out_xla = context_sharded_attention(q, k, v, mesh, impl="xla")
    out_rdma = context_sharded_attention(q, k, v, mesh, impl="rdma")
    np.testing.assert_allclose(np.asarray(out_rdma), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_rdma), np.asarray(out_xla), atol=2e-5,
    )


def test_ring_attention_rdma_two_ring_edge():
    """n=2 ring: single send, no flow-control signals — the degenerate
    schedule must still match full attention."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:2]), ("context",))
    keys = jax.random.split(jax.random.PRNGKey(12), 3)
    q, k, v = (jax.random.normal(kk, (2, 16, 2, 8)) for kk in keys)
    ref = xla_attention(q, k, v)
    out = context_sharded_attention(q, k, v, mesh, impl="rdma")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_rdma_bf16():
    """bf16 inputs (the production dtype) accumulate in f32 inside the
    kernel and stay within bf16 tolerance of the f32 reference."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("context",))
    keys = jax.random.split(jax.random.PRNGKey(13), 3)
    q, k, v = (jax.random.normal(kk, (2, 32, 2, 8)) for kk in keys)
    ref = xla_attention(q, k, v)
    out = context_sharded_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        mesh, impl="rdma",
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2,
    )


def test_ring_attention_impl_flag_validation():
    mesh = make_mesh(data=4, context=2)
    q = jnp.zeros((4, 8, 1, 4))
    with pytest.raises(ValueError, match="impl"):
        context_sharded_attention(q, q, q, mesh, impl="nope")
