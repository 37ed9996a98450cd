"""Pallas-RDMA ring attention: double-buffered inter-chip K/V rotation.

The XLA ring (parallel/context.py) rotates K/V shards with
``lax.ppermute`` and relies on XLA's scheduler to overlap the collective
with the block matmuls. This variant owns the overlap explicitly inside
one Pallas kernel per ring step group:

* K/V shards live in a 2-slot VMEM buffer; at step k the kernel STARTS an
  ``pltpu.make_async_remote_copy`` of slot ``k%2`` to the right
  neighbour's slot ``(k+1)%2`` and only then computes block attention on
  slot ``k%2`` — the ICI transfer rides under the MXU work by
  construction, not by scheduler luck;
* a REGULAR semaphore provides ring flow control: each device signals its
  LEFT neighbour after consuming a slot, and a sender waits for that
  signal before overwriting the remote slot — no device can run ahead and
  clobber a buffer still being read (the hazard a bare double-buffer has);
* online-softmax (m, l, acc) state merges the per-slot partial results,
  exactly like the XLA ring's log-sum-exp merge.

Select with ``RHO_RING_ATTN_IMPL=rdma`` (default ``xla``) or
``context_sharded_attention(..., impl="rdma")``. Correctness is parity-
tested against the XLA ring on the virtual CPU mesh (interpret mode
executes the real remote-DMA + semaphore semantics). Two validations are
hardware-pending on real multi-chip ICI (this environment exposes one
physical chip, docs/ROADMAP.md): PERFORMANCE, and the (data x context)
two-axis production mesh — pallas interpret's dma_start discharge only
implements single-axis meshes (jax/_src/pallas/mosaic/primitives.py:620
"Meshes with more than 1 named dimension not implemented"), so the CPU
tests run context-only rings while the MESH-dict peer addressing above
carries the multi-axis semantics for real lowering.

VMEM note: each (b, h) block materialises a [T_local, T_local] f32 logits
tile, so local token counts beyond ~1500 need a q-chunk loop this kernel
does not yet have; the UNet's attention resolutions stay far below that.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.experimental.pallas as pl
import jax.experimental.pallas.tpu as pltpu
import jax.numpy as jnp

from rho_diffusion_tpu.parallel.mesh import CONTEXT_AXIS

_COLLECTIVE_ID = 11


def _kernel(
    q_ref,  # [BH, T, D]
    k_ref,  # [BH, S, D]
    v_ref,  # [BH, S, D]
    o_ref,  # [BH, T, D]
    kv_buf,  # VMEM [2 slots, 2 (k|v), BH, S, D]
    acc_ref,  # VMEM [BH, T, D] f32
    m_ref,  # VMEM [BH, T] f32
    l_ref,  # VMEM [BH, T] f32
    send_sem,  # DMA (2,)
    recv_sem,  # DMA (2,)
    ready_sem,  # REGULAR — ring flow control
    *,
    n: int,
    bh: int,
    axis_name: str,
    single_axis_mesh: bool,
    flow_control: bool,
):
    # LOGICAL scalar addressing on a single-axis mesh (the only form the
    # interpret-mode discharge implements — the CPU test path); MESH-dict
    # on a multi-axis production mesh (real Mosaic lowering), where only
    # the ring axis varies and every other coordinate stays our own
    if single_axis_mesh:
        dev_kw = lambda peer: dict(
            device_id=peer, device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
    else:
        dev_kw = lambda peer: dict(
            device_id={axis_name: peer},
            device_id_type=pltpu.DeviceIdType.MESH,
        )
    me = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(me + 1, n)
    left = jax.lax.rem(me + n - 1, n)

    kv_buf[0, 0] = k_ref[:]
    kv_buf[0, 1] = v_ref[:]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
    l_ref[:] = jnp.zeros_like(l_ref)

    d = q_ref.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))

    def accumulate(cur):
        def body(i, _):
            q = q_ref[i].astype(jnp.float32)  # [T, D]
            k = kv_buf[cur, 0, i].astype(jnp.float32)  # [S, D]
            v = kv_buf[cur, 1, i].astype(jnp.float32)
            logits = jnp.dot(q, k.T) * scale  # [T, S] f32
            m_old = m_ref[i]
            m_new = jnp.maximum(m_old, jnp.max(logits, axis=-1))
            p = jnp.exp(logits - m_new[:, None])
            corr = jnp.exp(m_old - m_new)
            l_ref[i] = l_ref[i] * corr + jnp.sum(p, axis=-1)
            acc_ref[i] = acc_ref[i] * corr[:, None] + jnp.dot(p, v)
            m_ref[i] = m_new
            return 0

        jax.lax.fori_loop(0, bh, body, 0)

    for step in range(n):
        cur, nxt = step % 2, (step + 1) % 2
        rdma = None
        if step < n - 1:
            if flow_control and step >= 1:
                # right neighbour must have consumed the slot this send
                # overwrites (its compute of step-1) — ring backpressure
                pltpu.semaphore_wait(ready_sem, 1)
            rdma = pltpu.make_async_remote_copy(
                src_ref=kv_buf.at[cur],
                dst_ref=kv_buf.at[nxt],
                send_sem=send_sem.at[cur],
                recv_sem=recv_sem.at[nxt],
                **dev_kw(right),
            )
            rdma.start()
        accumulate(cur)
        if rdma is not None:
            # send done (slot cur's outgoing read finished -> safe for the
            # left neighbour to overwrite it) and slot nxt's incoming data
            # landed (safe to compute on next step)
            rdma.wait()
        if flow_control and step < n - 2:
            # tell the LEFT neighbour slot cur is consumed and our own
            # outgoing read of it has drained — their send step+1 may
            # overwrite it now. n-2 signals pair the n-2 waits above.
            pltpu.semaphore_signal(ready_sem, inc=1, **dev_kw(left))

    def finalize(i, _):
        o_ref[i] = (acc_ref[i] / l_ref[i][:, None]).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bh, finalize, 0)


def ring_attention_rdma(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = CONTEXT_AXIS,
    interpret: bool | None = None,
    single_axis_mesh: bool = True,
) -> jnp.ndarray:
    """Drop-in for :func:`parallel.context.ring_attention` (call INSIDE
    shard_map; local shapes [B, T/n, H, D]) using the Pallas remote-DMA
    ring. ``interpret`` defaults to True off-TPU (the CPU test path)."""
    n = jax.lax.psum(1, axis_name)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, H, D = q.shape
    bh = B * H
    to_bh = lambda x: x.transpose(0, 2, 1, 3).reshape(bh, x.shape[1], D)
    qr, kr, vr = to_bh(q), to_bh(k), to_bh(v)
    S = kr.shape[1]
    out = pl.pallas_call(
        partial(
            _kernel, n=n, bh=bh, axis_name=axis_name,
            single_axis_mesh=single_axis_mesh,
            # interpret's dma discharge emulates each copy synchronously
            # (and cannot emulate remote semaphore signals at all), so the
            # backpressure protocol is only compiled for real lowering —
            # its hardware validation is pending with the rest (docstring)
            flow_control=not interpret,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, T, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, bh, S, D), q.dtype),
            pltpu.VMEM((bh, T, D), jnp.float32),
            pltpu.VMEM((bh, T), jnp.float32),
            pltpu.VMEM((bh, T), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(collective_id=_COLLECTIVE_ID),
    )(qr, kr, vr)
    return out.reshape(B, H, T, D).transpose(0, 2, 1, 3)
