"""Per-sample PRNG keys for the samplers.

The reference's samplers draw batch-wide torch noise, so a sample's
trajectory depends on which rows happened to share its batch
(reference ddpm.py:211-215, gaussian_diffusion.py:540-556). For a
serving system that micro-batches concurrent requests that is the wrong
contract: a request's result must not depend on its co-batched
neighbours. These helpers let every sampler accept EITHER the usual
scalar PRNG key (batch-wide noise, split-chained per step — the
training-time behaviour) or a batched typed key array of shape [B]
(one key per sample row). In per-row mode the step-t noise key is
``fold_in(row_key, t)`` — a pure function of (row key, timestep), so
results are bitwise independent of batch composition, padding, and
launch order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def is_per_sample_keys(rng) -> bool:
    """True when ``rng`` is a batched typed PRNG key array ([B] keys)."""
    return (
        hasattr(rng, "dtype")
        and jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key)
        and rng.ndim == 1
    )


def per_sample_keys(seed: int, n: int, start: int = 0) -> jax.Array:
    """Typed keys for rows [start, start+n) of a request seeded ``seed``.

    Row i's key is ``fold_in(key(seed), i)`` — splitting a request across
    launches (or padding a launch) never changes a row's noise stream.
    """
    base = jax.random.key(int(seed) & 0xFFFFFFFF)
    return jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(start, start + n),
    )


def keys_from_seeds(seeds, idxs) -> jax.Array:
    """Typed per-row keys from (seed, row-index) INTEGER arrays — the
    jit-traceable equivalent of :func:`per_sample_keys` (bitwise-identical
    rows). Serving passes plain uint32/int32 numpy arrays and builds the
    keys inside the compiled sampler: constructing typed keys eagerly costs
    several tiny device dispatches per request (~0.2 s each through the
    remote-device tunnel — measured to dominate fast-sampler serving)."""
    return jax.vmap(
        lambda s, i: jax.random.fold_in(jax.random.key(s), i),
    )(seeds, idxs)


def keys_at_step(rng: jax.Array, t) -> jax.Array:
    """Per-row noise keys for scan step ``t`` (per-row mode only)."""
    return jax.vmap(lambda k: jax.random.fold_in(k, t))(rng)


def normal_like(rng: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Gaussian noise: batch-wide from a scalar key, or one independent
    stream per row when ``rng`` is a [B] typed key array (B == shape[0])."""
    if is_per_sample_keys(rng):
        return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype))(rng)
    return jax.random.normal(rng, shape, dtype)
