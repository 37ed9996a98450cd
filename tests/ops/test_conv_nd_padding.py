"""conv_nd padding semantics (the r3 stride-2 "SAME" fix and its limits).

The reference builds convs with torch padding=k//2 (layers.py:77-88); for
odd k and stride 1 that equals XLA "SAME". For STRIDED convs XLA "SAME"
pads (0, 1) on even extents — a one-pixel shift vs torch — so conv_nd
lowers those to explicit symmetric padding. Stride-1 "SAME" must stay
true SAME so even kernel sizes remain shape-preserving (torch cannot
express a shape-preserving even-k conv at all).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.ops.convolution import conv_nd


@pytest.mark.parametrize("k", [2, 3, 4, 5])
@pytest.mark.parametrize("dims", [1, 2])
def test_stride1_same_preserves_shape(k, dims):
    x = jnp.ones((2, *([8] * dims), 3))
    conv = conv_nd(dims, 4, k)
    p = conv.init(jax.random.PRNGKey(0), x)
    assert conv.apply(p, x).shape == (2, *([8] * dims), 4)


@pytest.mark.parametrize("extent", [8, 9])
def test_stride2_matches_torch_symmetric_padding(extent):
    """Strided conv output must equal torch's Conv2d(stride=2, padding=1)
    — i.e. symmetric (1, 1) padding — for both even and odd extents."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, extent, extent, 3)).astype(np.float32)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32) * 0.1

    conv = conv_nd(2, 4, 3, stride=2)
    p = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = jax.tree_util.tree_map(lambda a: a, p)
    p["params"]["kernel"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    p["params"]["bias"] = jnp.zeros((4,))
    ours = np.asarray(conv.apply(p, jnp.asarray(x)))

    with torch.no_grad():
        theirs = torch.nn.functional.conv2d(
            torch.tensor(np.moveaxis(x, -1, 1)), torch.tensor(w),
            stride=2, padding=1,
        ).numpy()
    theirs = np.moveaxis(theirs, 1, -1)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_unet_diffuser_attention_head_dim_field():
    """UNetDiffuser exposes attention_head_dim so checkpoints trained with
    a non-default head width construct consistently with the HF weight
    transplant (training/checkpoint.py passes the same value through)."""
    from rho_diffusion_tpu.models.unet_diffusers_compat import UNetDiffuser

    model = UNetDiffuser(
        data_shape=(16, 16), in_channels=1, num_res_blocks=1,
        attention_head_dim=16,
    )
    x = jnp.zeros((1, 16, 16, 1))
    t = jnp.zeros((1,), jnp.int32)
    p = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(p, x, t)
    assert out.shape == (1, 16, 16, 1)
