"""Ulysses-style sequence parallelism: all-to-all head scatter.

The alternative to ring attention when heads >= context shards (SURVEY.md
§5): instead of rotating K/V blocks around the ring, one all-to-all
converts the token-sharded layout [B, T/n, H, D] into a head-sharded
layout [B, T, H/n, D], each device runs FULL softmax attention over its
own heads (any single-device kernel — including the Pallas flash kernel —
applies unchanged), and a second all-to-all restores token sharding.

Communication: 2 all-to-alls moving the activation once each — less
traffic than the ring's (n-1) K/V rotations when n is large, at the cost
of requiring H % n == 0. Exact (no approximation).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rho_diffusion_tpu.parallel.mesh import CONTEXT_AXIS, DATA_AXIS

__all__ = ["ulysses_attention", "ulysses_sharded_attention"]


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = CONTEXT_AXIS,
    backend: str = "xla",
) -> jnp.ndarray:
    """shard_map body. Local shapes [B, T/n, H, D] with H % n == 0.

    all_to_all scatters heads and gathers tokens, so each device computes
    exact full-sequence attention for H/n heads, then the inverse
    all-to-all restores the token sharding.
    """
    from rho_diffusion_tpu.ops.attention import attention as _attention

    n = jax.lax.psum(1, axis_name)
    assert q.shape[2] % n == 0, (
        f"heads {q.shape[2]} not divisible by context={n}; use ring attention"
    )
    # [B, T/n, H, D] -> [B, T, H/n, D]: split the head axis, concat tokens
    def scatter(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True,
        )

    def gather(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True,
        )

    qh, kh, vh = scatter(q), scatter(k), scatter(v)
    # any single-device attention backend works here (full T locally)
    o = _attention(qh, kh, vh, backend=backend)
    return gather(o)


def ulysses_sharded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = CONTEXT_AXIS,
    backend: str = "xla",
) -> jnp.ndarray:
    """Global entry: [B, T, H, D] with T sharded over ``axis_name`` (and
    batch over "data" when divisible). Exact vs full attention."""
    batch_axis = None
    if DATA_AXIS in mesh.shape and q.shape[0] % mesh.shape[DATA_AXIS] == 0:
        batch_axis = DATA_AXIS
    spec = P(batch_axis, axis_name, None, None)
    fn = jax.shard_map(
        partial(ulysses_attention, axis_name=axis_name, backend=backend),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
