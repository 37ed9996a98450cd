"""GroupNorm32 precision tests.

The fp32-statistics island is load-bearing for bf16 mixed precision
(reference layers.py:71-74); these tests bound the bf16-vs-f32 error so the
no-materialised-f32-copy optimization can't silently regress.
"""
import jax
import jax.numpy as jnp
import numpy as np

from rho_diffusion_tpu.ops.norm import GroupNorm32


def _apply(x, dtype):
    gn = GroupNorm32(num_groups=32)
    params = gn.init(jax.random.PRNGKey(0), x.astype(dtype))
    return gn.apply(params, x.astype(dtype))


def test_groupnorm_bf16_stats_match_f32_on_same_values():
    """Isolate the STATISTICS precision from input quantization: quantize
    the input to bf16 once, then compare bf16-dtype GroupNorm against
    f32-dtype GroupNorm on those exact same values. Any gap is cancellation
    error in the E[x^2]-E[x]^2 reduction — the ADVICE round-1 concern."""
    rng = np.random.default_rng(0)
    # large-offset data is the cancellation-prone case
    x = rng.normal(3.0, 0.1, (2, 8, 8, 64)).astype(np.float32)
    xq = np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))
    ref = np.asarray(_apply(xq, jnp.float32))
    out = np.asarray(_apply(xq, jnp.bfloat16).astype(jnp.float32))
    # remaining error is the bf16 rounding of the elementwise normalise
    # (~2^-8 relative on O(1) outputs), not statistics cancellation
    assert np.max(np.abs(out - ref)) < 0.02
    assert np.mean(np.abs(out - ref)) < 0.004


def test_groupnorm_f32_statistics_are_unbiased():
    rng = np.random.default_rng(1)
    x = rng.normal(0.0, 1.0, (2, 16, 16, 32)).astype(np.float32)
    out = np.asarray(_apply(x, jnp.float32))
    # normalised output: per-(batch, group) mean ~0, var ~1
    g = out.reshape(2, -1, 32)
    assert abs(g.mean()) < 1e-5
    assert abs(g.var() - 1.0) < 1e-3
