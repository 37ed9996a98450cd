"""int8 (W8A8) quantized inference path (ops/quant.py).

Covers: numeric closeness to the float conv across dims/strides, the
small-channel float fallback, checkpoint compatibility (same param tree —
quantization is an execution mode, not a model change), end-to-end
quantized sampling, and the trainer's inference-only guard.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.ops.convolution import conv_nd
from rho_diffusion_tpu.ops.quant import ConvInt8, conv_quant, set_conv_quant


def _rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


@pytest.mark.parametrize("dims", [1, 2, 3])
def test_conv_int8_close_to_float(dims):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, *(8,) * dims, 32), jnp.float32)
    conv_f = conv_nd(dims, 48, 3)
    params = conv_f.init(jax.random.PRNGKey(1), x)
    ref = conv_f.apply(params, x)
    with conv_quant("int8"):
        conv_q = conv_nd(dims, 48, 3)
        assert isinstance(conv_q, ConvInt8)
        out = conv_q.apply(params, x)
    assert out.shape == ref.shape
    # int8 per-tensor activation + per-channel weight quantization of a
    # well-scaled gaussian: relative L2 error is ~1%, far under 5%
    assert _rel_l2(out, ref) < 0.05


def test_conv_int8_strided():
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (2, 8, 8, 32), jnp.float32)
    conv_f = conv_nd(2, 32, 3, stride=2)
    params = conv_f.init(jax.random.PRNGKey(3), x)
    ref = conv_f.apply(params, x)
    with conv_quant("int8"):
        out = conv_nd(2, 32, 3, stride=2).apply(params, x)
    assert out.shape == ref.shape
    assert _rel_l2(out, ref) < 0.05


def test_small_channel_convs_stay_float():
    # first/last-layer exclusion: 1-channel input conv runs the float path
    rng = jax.random.PRNGKey(4)
    x = jax.random.normal(rng, (2, 8, 8, 1), jnp.float32)
    conv_f = conv_nd(2, 32, 3)
    params = conv_f.init(jax.random.PRNGKey(5), x)
    ref = conv_f.apply(params, x)
    with conv_quant("int8"):
        out = conv_nd(2, 32, 3).apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_zero_init_conv_exact():
    x = jnp.ones((1, 4, 4, 32))
    with conv_quant("int8"):
        conv_q = conv_nd(2, 32, 3, zero_init=True)
        params = conv_q.init(jax.random.PRNGKey(0), x)
        out = conv_q.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def _tiny_pipe():
    from rho_diffusion_tpu.diffusion import DDPM, LinearSchedule

    return DDPM(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(8, 8), dims=2, in_channels=1, out_channels=1,
            model_channels=16, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=[4], num_heads=2,
        ),
        schedule=LinearSchedule(10, 2e-5, 1e-3),
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
        ema_decay=0.0,
    )


@pytest.mark.heavy
def test_quantized_model_forward_and_sampling():
    """A checkpoint trained with the float stack runs quantized unchanged:
    same param tree, close forward outputs, finite samples."""
    pipe = _tiny_pipe()
    state = pipe.create_state(jax.random.PRNGKey(0))
    # a few train steps so weights are not the zero-init degenerate case
    batch = {
        "data": jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 1)),
        "labels": None,
    }
    for _ in range(3):
        state, _ = pipe.training_step(state, batch)

    x = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 1))
    t = jnp.array([1, 3, 5, 7])
    ref = pipe.apply(state.params, x, t, None)
    with conv_quant("int8"):
        pipe_q = _tiny_pipe()  # fresh trace under the quant flag
        out = pipe_q.apply(state.params, x, t, None)
        assert _rel_l2(out, ref) < 0.15
        sample = pipe_q.reverse_process(
            state.params, jax.random.PRNGKey(3), shape=(2, 8, 8, 1),
        )
    leaf = sample["denoised"] if isinstance(sample, dict) else sample
    assert np.isfinite(np.asarray(leaf)).all()


def test_int8_activation_scale_is_per_sample():
    """A row's quantized output is bit-identical no matter what other rows
    share the batch — the property the serving layer's request-determinism
    contract rests on (a per-TENSOR activation scale would couple every
    row's numerics to its co-batched neighbours, including pad rows)."""
    rng = jax.random.PRNGKey(7)
    row = jax.random.normal(rng, (1, 8, 8, 32), jnp.float32)
    huge = 1e3 * jax.random.normal(jax.random.PRNGKey(8), (1, 8, 8, 32))
    with conv_quant("int8"):
        conv_q = conv_nd(2, 48, 3)
        params = conv_q.init(jax.random.PRNGKey(9), row)
        alone = conv_q.apply(params, row)
        batched = conv_q.apply(params, jnp.concatenate([row, huge], axis=0))
    np.testing.assert_array_equal(np.asarray(alone[0]), np.asarray(batched[0]))


def test_int8_wins_over_conv3d_backend_selection():
    """quantize='int8' must take the stride-1 3x3x3 convs (the FLOP bulk it
    targets) even when a float 3-D conv backend is enabled — the dispatch
    order in conv_nd checks quantization first."""
    from rho_diffusion_tpu.ops import convolution as C

    prev = C._CONV3D_PALLAS_MODE
    C.set_conv3d_backend("1")  # force the Pallas backend selection
    try:
        with conv_quant("int8"):
            conv = conv_nd(3, 32, 3)
        assert isinstance(conv, ConvInt8)
    finally:
        C.set_conv3d_backend(prev)


def test_training_refused_while_quantized():
    with conv_quant("int8"):
        pipe = _tiny_pipe()
        set_conv_quant("int8")
        state = pipe.create_state(jax.random.PRNGKey(0))
        batch = {"data": jnp.zeros((2, 8, 8, 1)), "labels": None}
        with pytest.raises(RuntimeError, match="inference-only"):
            pipe.training_step(state, batch)


def test_dense_int8_close_to_float_and_param_compatible():
    """DenseInt8 (attention qkv/proj + channel-mixing skips): same param
    tree as nn.Dense — checkpoints load unchanged — and W8A8 output within
    the usual int8 tolerance."""
    from flax import linen as nn

    from rho_diffusion_tpu.ops.quant import DenseInt8, dense

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 32), jnp.float32)
    dense_f = dense(48)
    assert isinstance(dense_f, nn.Dense)
    params = dense_f.init(jax.random.PRNGKey(1), x)
    ref = dense_f.apply(params, x)
    with conv_quant("int8"):
        dense_q = dense(48)
        assert isinstance(dense_q, DenseInt8)
        out = dense_q.apply(params, x)
    assert out.shape == ref.shape
    assert _rel_l2(out, ref) < 0.05


def test_dense_int8_small_features_stay_float():
    from rho_diffusion_tpu.ops.quant import DenseInt8

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8), jnp.float32)
    m = DenseInt8(features=4)
    params = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(params, x)
    # float fallback is exact vs a manual matmul
    ref = x @ params["params"]["kernel"] + params["params"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.heavy
def test_quantized_unet_covers_attention_dense():
    """A UNet with attention traced under int8 must contain int8 dot ops
    for qkv/proj (not just convs), produce finite output, and share the
    exact param tree with the float trace."""
    from rho_diffusion_tpu.models.unet import UNet

    kw = dict(
        data_shape=(8, 8), dims=2, in_channels=1, out_channels=1,
        model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=[4], num_heads=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 1))
    t = jnp.zeros((1,), jnp.int32)
    model_f = UNet(**kw)
    params = model_f.init(jax.random.PRNGKey(0), x, t)
    # perturb EVERY param (the output conv is zero-init, so fresh-init
    # outputs are exactly 0 and any comparison would be vacuous)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    ref = model_f.apply(params, x, t)
    assert float(jnp.abs(ref).max()) > 0  # non-vacuous
    with conv_quant("int8"):
        model_q = UNet(**kw)
        # identical tree: execution mode, not a model change
        q_params = model_q.init(jax.random.PRNGKey(0), x, t)
        assert jax.tree_util.tree_structure(q_params) == \
            jax.tree_util.tree_structure(params)
        out = model_q.apply(params, x, t)
        txt = jax.jit(lambda p, a, b: model_q.apply(p, a, b)).lower(
            params, x, t,
        ).as_text()
    # int8 operands reached the IR for BOTH convs and the dense matmuls
    assert any("i8" in l and "convolution" in l for l in txt.splitlines())
    assert any("i8" in l and "dot_general" in l for l in txt.splitlines())
    assert np.isfinite(np.asarray(out)).all()
    err = _rel_l2(out, ref)
    assert 0 < err < 0.2, err
