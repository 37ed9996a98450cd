"""Pallas 3-D conv kernel: interpret-mode parity vs lax.conv_general_dilated
(the CPU-runnable check; compiled TPU A/B lives in benchmarks/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.ops.pallas.conv3d import conv3d_pallas, conv3d_tile_plan


def _ref_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@pytest.mark.parametrize(
    "shape,cout",
    [
        ((1, 4, 4, 4, 8), 8),      # tiny cube
        ((2, 8, 4, 4, 16), 8),     # D-tiled, cout < cin
        ((1, 4, 6, 5, 8), 16),     # non-square, odd W
        ((2, 4, 8, 8, 4), 12),     # cout not a power of two
    ],
)
def test_conv3d_pallas_matches_xla(shape, cout):
    kx, kk = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, shape, jnp.float32)
    k = jax.random.normal(kk, (3, 3, 3, shape[-1], cout), jnp.float32) * 0.1
    got = conv3d_pallas(x, k, interpret=True)
    want = _ref_conv(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_conv3d_pallas_d_tiling_halo():
    """Force a small D tile so the halo DMA path crosses tile boundaries."""
    kx, kk = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (1, 8, 4, 4, 8), jnp.float32)
    k = jax.random.normal(kk, (3, 3, 3, 8, 8), jnp.float32) * 0.1
    got = conv3d_pallas(x, k, tile_d=2, interpret=True)
    want = _ref_conv(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_conv3d_pallas_cout_tiling():
    kx, kk = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (1, 4, 4, 4, 8), jnp.float32)
    k = jax.random.normal(kk, (3, 3, 3, 8, 32), jnp.float32) * 0.1
    got = conv3d_pallas(x, k, tile_cout=8, interpret=True)
    want = _ref_conv(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_conv3d_pallas_bf16():
    kx, kk = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(kx, (1, 4, 4, 4, 16), jnp.bfloat16)
    k = (jax.random.normal(kk, (3, 3, 3, 16, 16), jnp.float32) * 0.1).astype(
        jnp.bfloat16,
    )
    got = conv3d_pallas(x, k, interpret=True)
    want = _ref_conv(x, k)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.05,
    )


def test_conv3d_custom_vjp_grads_match_xla():
    """conv3d (Pallas fwd + Pallas dgrad + XLA wgrad) must produce the same
    input/kernel gradients as differentiating the XLA conv directly.

    Interpret mode is forced globally so the inner conv3d_pallas calls run
    on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    from rho_diffusion_tpu.ops.pallas.conv3d import conv3d

    kx, kk, kg = jax.random.split(jax.random.PRNGKey(4), 3)
    x = jax.random.normal(kx, (2, 4, 4, 4, 8), jnp.float32)
    k = jax.random.normal(kk, (3, 3, 3, 8, 16), jnp.float32) * 0.1
    ct = jax.random.normal(kg, (2, 4, 4, 4, 16), jnp.float32)

    def loss_pallas(x, k):
        return jnp.vdot(conv3d(x, k), ct)

    def loss_xla(x, k):
        return jnp.vdot(_ref_conv(x, k), ct)

    with pltpu.force_tpu_interpret_mode():
        gx_p, gk_p = jax.grad(loss_pallas, argnums=(0, 1))(x, k)
    gx_x, gk_x = jax.grad(loss_xla, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_x), atol=2e-4, rtol=2e-4)


def test_tile_plan_flagship_shapes():
    """The planner must produce VMEM-feasible tiles for every flagship
    UNet level (32^3, mc=64, mult 1/2/4/8 — encoder + skip-concat decoder)."""
    for (d, h, w, cin, cout) in [
        (32, 32, 32, 64, 64),
        (32, 16, 16, 128, 128),
        (32, 8, 8, 256, 256),
        (32, 4, 4, 512, 512),
        (32, 32, 32, 128, 64),
        (32, 4, 4, 1024, 512),
    ]:
        td, tc = conv3d_tile_plan(d, h, w, cin, cout)
        assert d % td == 0 and cout % tc == 0
