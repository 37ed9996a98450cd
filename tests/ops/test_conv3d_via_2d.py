"""Conv3dVia2d — the batched-2D decomposition of 3-D convolutions must be
numerically identical to nn.Conv for the framework's kernel/stride family."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from rho_diffusion_tpu.ops.convolution import Conv3dVia2d


@pytest.mark.parametrize("strides", [(1, 1, 1), (1, 2, 2)])
def test_matches_native_conv3d(strides):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 8, 8, 4))
    # torch-style symmetric k//2 padding — the framework convention
    # (ops/convolution.py conv_nd); XLA "SAME" differs for strided convs
    ref = nn.Conv(5, (3, 3, 3), strides=strides, padding=[(1, 1)] * 3,
                  param_dtype=jnp.float32)
    p = ref.init(jax.random.PRNGKey(1), x)["params"]
    alt = Conv3dVia2d(features=5, strides=strides)
    o1 = ref.apply({"params": p}, x)
    o2 = alt.apply({"params": {"kernel": p["kernel"], "bias": p["bias"]}}, x)
    assert o1.shape == o2.shape
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)


def test_gradients_match():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 2))
    ref = nn.Conv(3, (3, 3, 3), padding="SAME", param_dtype=jnp.float32)
    p = ref.init(jax.random.PRNGKey(1), x)["params"]
    alt = Conv3dVia2d(features=3)

    g1 = jax.grad(lambda pp: jnp.sum(ref.apply({"params": pp}, x) ** 2))(p)
    g2 = jax.grad(
        lambda pp: jnp.sum(alt.apply({"params": pp}, x) ** 2),
    )({"kernel": p["kernel"], "bias": p["bias"]})
    np.testing.assert_allclose(
        np.asarray(g1["kernel"]), np.asarray(g2["kernel"]), atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g1["bias"]), np.asarray(g2["bias"]), atol=5e-5,
    )


def test_z_stride_rejected():
    x = jnp.ones((1, 4, 4, 4, 2))
    alt = Conv3dVia2d(features=2, strides=(2, 1, 1))
    with pytest.raises(AssertionError, match="z-stride"):
        alt.init(jax.random.PRNGKey(0), x)
