"""Context (sequence) parallelism: ring attention over the "context" mesh
axis.

The reference has NO long-context story — its attention is a single-device
full softmax over all flattened spatial tokens (unet_v2.py:336-342), capped
only by restricting attention to coarse resolutions. For volumetric fields
(64^3 -> 262,144 tokens) even flash attention on one chip runs out of HBM
for the K/V stream at large batch; the TPU-native answer (SURVEY.md §5) is
to shard the token axis across the ``context`` mesh axis and rotate K/V
shards around the ICI ring with ``jax.lax.ppermute``, merging partial
attention results with online-softmax statistics.

Design: blockwise attention with log-sum-exp merging —
    o, lse  <- attn(q, kv_0)
    repeat n-1 times: kv <- ppermute(kv);  merge(o, lse, attn(q, kv))
XLA overlaps the ppermute with the block matmuls (they are independent per
step), so the ring rides ICI while the MXU stays busy. A Pallas-RDMA
variant can replace the inner block later without changing this interface.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rho_diffusion_tpu.parallel.mesh import CONTEXT_AXIS, DATA_AXIS


def _block_attention_with_lse(q, k, v):
    """Full attention over one K/V block, returning the NORMALISED output
    and per-query log-sum-exp. q/k/v: [B, T, H, D] -> (o, lse [B, T, H])."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(d, jnp.float32))).astype(q.dtype)
    logits = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale).astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhts,bshd->bthd", (p / l).astype(q.dtype), v)
    lse = (m + jnp.log(l))[..., 0]  # [B, H, T]
    return o, jnp.transpose(lse, (0, 2, 1))  # lse -> [B, T, H]


def _merge(o1, lse1, o2, lse2):
    """Online-softmax merge of two partial attention results."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    denom = w1 + w2
    o = (
        o1 * (w1 / denom)[..., None].astype(o1.dtype)
        + o2 * (w2 / denom)[..., None].astype(o2.dtype)
    )
    return o, m + jnp.log(denom)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = CONTEXT_AXIS,
) -> jnp.ndarray:
    """Ring attention body — call INSIDE shard_map with q/k/v sharded on
    the token axis: local shapes [B, T/n, H, D]. Exact (not approximate):
    every query attends to every key across all shards."""
    n = jax.lax.psum(1, axis_name)
    perm = [(j, (j + 1) % n) for j in range(n)]

    o, lse = _block_attention_with_lse(q, k, v)

    def body(_, carry):
        o, lse, k, v = carry
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        o2, lse2 = _block_attention_with_lse(q, k, v)
        o, lse = _merge(o, lse, o2, lse2)
        return o, lse, k, v

    o, lse, _, _ = jax.lax.fori_loop(1, n, body, (o, lse, k, v))
    return o


def context_sharded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = CONTEXT_AXIS,
    impl: str | None = None,
) -> jnp.ndarray:
    """Global entry point: shards the token axis of [B, T, H, D] inputs over
    ``axis_name`` and runs ring attention. T must divide by the axis size.
    The batch axis is additionally sharded over the data axis when divisible,
    so data parallelism is preserved through the attention section (each
    data group runs its own independent K/V ring).

    ``impl``: 'xla' (default; ppermute ring, scheduler-overlapped) or
    'rdma' (Pallas ``make_async_remote_copy`` double-buffered ring with
    explicit compute/ICI overlap and flow control — parallel/context_rdma.py;
    parity-tested on the virtual mesh, perf validation hardware-pending).
    Env override: ``RHO_RING_ATTN_IMPL``."""
    import os

    impl = impl or os.environ.get("RHO_RING_ATTN_IMPL", "xla")
    if impl not in ("xla", "rdma"):
        raise ValueError(f"unknown ring-attention impl {impl!r}: 'xla' | 'rdma'")
    batch_axis = None
    if DATA_AXIS in mesh.shape and q.shape[0] % mesh.shape[DATA_AXIS] == 0:
        batch_axis = DATA_AXIS
    spec = P(batch_axis, axis_name, None, None)
    kwargs = {}
    if impl == "rdma":
        from rho_diffusion_tpu.parallel.context_rdma import ring_attention_rdma

        body = partial(
            ring_attention_rdma,
            axis_name=axis_name,
            single_axis_mesh=len(mesh.axis_names) == 1,
        )
        # pallas out_shape carries no vma info; skip the shard_map check
        kwargs["check_vma"] = False
    else:
        body = partial(ring_attention, axis_name=axis_name)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        **kwargs,
    )
    return fn(q, k, v)
