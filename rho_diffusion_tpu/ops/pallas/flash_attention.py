"""Pallas TPU flash attention (online softmax, non-causal) with a custom
VJP whose backward passes are also Pallas kernels.

This is the volumetric-attention hot path: the UNet flattens all spatial
positions into one token axis (reference unet_v2.py:296-342), so a 32^3
volume at full resolution is 32,768 tokens and the naive T^2 score matrix
(f32) is 4 GiB per head — far beyond VMEM and HBM bandwidth budgets. The
flash kernel streams K/V blocks through VMEM with online-softmax
rescaling, so memory is O(T*D) and the MXU stays busy.

Semantics match ``ops.attention.xla_attention`` (reference
QKVAttention semantics, unet_v2.py:365-436): scores scaled by 1/sqrt(D),
softmax in float32. Layout: q, k, v are [B, T, H, D].

Grid design (forward): (B*H, T/Bq, T/Bk) with the k axis innermost; Pallas
auto-pipelines HBM->VMEM block fetches across grid steps; the running max
``m``, normaliser ``l`` and accumulator live in VMEM scratch that persists
across the k-sweep (revisited output block). The log-sum-exp residual is
saved for the backward kernels.

Backward: standard two-kernel split —
* dK/dV kernel: grid (B*H, T/Bk, T/Bq), accumulating over the q sweep;
* dQ kernel:    grid (B*H, T/Bq, T/Bk), accumulating over the k sweep;
both recompute P = exp(S - lse) blockwise from the saved lse (no T^2
residual is ever materialised).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block sweep on v5e (state-chained timing, T=16384 d=64 bf16):
# 512/512 = 10.06 ms, 1024/1024 = 5.41 ms, 512/2048 = 5.39 ms vs
# XLA full attention 10.58 ms -> 1024/1024 is ~1.9x XLA and fits VMEM
# (4 MB f32 scores + ~0.5 MB blocks/accumulators)
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30


def _pick_block(t: int, preferred: int) -> int:
    """Largest power-of-two block <= preferred that divides t (t is padded
    to a multiple of 128 by the wrapper, so 128 always works)."""
    b = min(preferred, t)
    while t % b:
        b //= 2
    return max(b, 128) if t % 128 == 0 else t


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *rest, scale, kv_len, block_k, with_lse):
    # the log-sum-exp residual is only needed when the call will be
    # differentiated; the inference/sampling path (with_lse=False) skips the
    # [Bq, 128] f32 lse write — 4x the bytes of the bf16 [Bq, D=64] output
    if with_lse:
        lse_ref, acc, m_scr, l_scr = rest
    else:
        acc, m_scr, l_scr = rest
    j = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    q = q_ref[0]  # [Bq, D]
    k = k_ref[0]  # [Bk, D]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Bq, Bk] f32

    # mask padded kv columns (wrapper pads T up; kv_len is the true length)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:, 0:1]  # [Bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)  # [Bq, Bk]
    alpha = jnp.exp(m_prev - m_new)  # [Bq, 1]

    l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == num_k - 1)
    def _finish():
        l = l_scr[:, 0:1]
        o_ref[0] = (acc[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        if with_lse:
            # lse replicated across a 128-lane axis to satisfy TPU tiling
            lse_ref[0] = jnp.broadcast_to(
                m_scr[:, 0:1] + jnp.log(jnp.maximum(l, 1e-30)),
                lse_ref[0].shape,
            )


def _fwd_kernel_onepass(q_ref, k_ref, v_ref, o_ref, *rest, scale, kv_len, with_lse):
    """Whole K/V in ONE block (the common case at the UNet's coarse-grid
    token counts, 512-2048): plain one-shot softmax — no VMEM scratch, no
    running-max/normaliser rescaling, no revisited output block."""
    q = q_ref[0]  # [Bq, D]
    s = jax.lax.dot_general(
        q, k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Bq, Bk] f32
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if with_lse:
        (lse_ref,) = rest
        lse_ref[0] = jnp.broadcast_to(
            m + jnp.log(jnp.maximum(l, 1e-30)), lse_ref[0].shape,
        )


def _flash_forward(q, k, v, true_kv_len, block_q, block_k, interpret=False,
                   with_lse=True):
    """q, k, v: [BH, T, D] (padded so T % block == 0). Returns (o, lse) —
    lse is None when ``with_lse`` is False (forward-only callers).
    ``true_kv_len`` is the pre-padding K/V length used for masking."""
    bh, t, d = q.shape
    kv_len = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    out_shape = [jax.ShapeDtypeStruct((bh, t, d), q.dtype)]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((bh, t, 128), jnp.float32))

    if kv_len // block_k == 1:
        # single-k-block specialisation: one-shot softmax kernel
        outs = pl.pallas_call(
            functools.partial(
                _fwd_kernel_onepass, scale=scale, kv_len=true_kv_len,
                with_lse=with_lse,
            ),
            grid=(bh, t // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda b, i: (b, i, 0)),
            ][: len(out_shape)],
            out_shape=out_shape,
            interpret=interpret,
        )(q, k, v)
    else:
        outs = pl.pallas_call(
            functools.partial(
                _fwd_kernel, scale=scale, kv_len=true_kv_len, block_k=block_k,
                with_lse=with_lse,
            ),
            grid=(bh, t // block_q, kv_len // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
            ][: len(out_shape)],
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
            interpret=interpret,
        )(q, k, v)
    if with_lse:
        return outs[0], outs[1]
    return outs[0], None


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, kv_len, block_k,
):
    i = pl.program_id(2)  # q-sweep position
    num_q = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]          # [Bq, D]
    k = k_ref[0]          # [Bk, D]
    v = v_ref[0]          # [Bk, D]
    do = do_ref[0].astype(jnp.float32)  # [Bq, D]
    lse = lse_ref[0][:, 0:1]    # [Bq, 1]
    delta = delta_ref[0][:, 0:1]  # [Bq, 1]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Bq, Bk]
    j = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)  # [Bq, Bk]

    # dV += P^T dO
    dv_acc[:] += jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dP = dO V^T ; dS = P * (dP - delta)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, Bk]
    ds = p * (dp - delta)  # [Bq, Bk]
    # dK += dS^T Q * scale
    dk_acc[:] += jax.lax.dot_general(
        ds, q.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(i == num_q - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc,
    *, scale, kv_len, block_k,
):
    j = pl.program_id(2)  # k-sweep position
    num_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, 0:1]
    delta = delta_ref[0][:, 0:1]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    dq_acc[:] += jax.lax.dot_general(
        ds, k.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(j == num_k - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_backward(q, k, v, o, lse, do, true_kv_len, block_q, block_k, interpret=False):
    bh, t, d = q.shape
    kv_len = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    # delta = rowsum(dO * O) — cheap elementwise, leave to XLA; replicated
    # across a 128-lane axis to satisfy TPU tiling
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[:, :, None], (*delta.shape, 128))

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, kv_len=true_kv_len, block_k=block_k,
        ),
        grid=(bh, kv_len // block_k, t // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),  # q
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),  # k
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),  # v
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),  # do
            pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0)),  # lse
            pl.BlockSpec((1, block_q, 128), lambda b, j, i: (b, i, 0)),  # delta
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, kv_len=true_kv_len, block_k=block_k,
        ),
        grid=(bh, t // block_q, kv_len // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API with custom VJP
# ---------------------------------------------------------------------------

def _pad_tokens(x, block):
    t = x.shape[1]
    pad = (-t) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_mha(q, k, v, block_q, block_k, interpret):
    # primal (not-being-differentiated) path: sampling/inference — skip the
    # lse residual entirely (the fwd rule below recomputes with it)
    o, _ = _flash_fwd_padded(q, k, v, block_q, block_k, interpret,
                             with_lse=False)
    return o


def _flash_fwd_padded(q, k, v, block_q, block_k, interpret, with_lse=True):
    t = q.shape[1]
    kv_len = k.shape[1]
    qp = _pad_tokens(q, block_q)
    kp = _pad_tokens(k, block_k)
    vp = _pad_tokens(v, block_k)
    o, lse = _flash_forward(qp, kp, vp, kv_len, block_q, block_k, interpret,
                            with_lse=with_lse)
    return o[:, :t], (qp, kp, vp, o, lse, t, kv_len)


def _flash_fwd_rule(q, k, v, block_q, block_k, interpret):
    o, res = _flash_fwd_padded(q, k, v, block_q, block_k, interpret)
    return o, res


def _flash_bwd_rule(block_q, block_k, interpret, res, do):
    qp, kp, vp, o_p, lse, t, kv_len = res
    do_p = _pad_tokens(do, block_q)
    dq, dk, dv = _flash_backward(
        qp, kp, vp, o_p, lse, do_p, kv_len, block_q, block_k, interpret,
    )
    return dq[:, :t], dk[:, :kv_len], dv[:, :kv_len]


_flash_mha.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head flash attention. q, k, v: [B, T, H, D] -> [B, T, H, D].

    Numerically equivalent to ``ops.attention.xla_attention`` (scores/softmax
    in f32); memory O(T*D) instead of O(T^2). With default (None) blocks,
    short-enough K/V is taken as ONE block so the one-shot-softmax kernel
    runs (no online rescaling); explicit blocks are honoured as given."""
    b, t, h, d = q.shape
    kv_t = k.shape[1]

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    padded_t = t + (-t) % 128
    padded_kv = kv_t + (-kv_t) % 128
    if block_k is None:
        # whole-K/V block when it fits: scores stay <= 4 MB f32 via block_q
        block_k = padded_kv if padded_kv <= 2048 else DEFAULT_BLOCK_K
    if block_q is None:
        budget = (4 * 1024 * 1024) // (4 * block_k)  # rows of f32 scores
        block_q = min(
            DEFAULT_BLOCK_Q, max(128, 1 << (budget.bit_length() - 1)),
        )
    block_q = _pick_block(padded_t, block_q)
    block_k = _pick_block(padded_kv, block_k)
    # true kv_len must be known to mask padding; handled inside the kernels
    o = _flash_mha(fold(q), fold(k), fold(v), block_q, block_k, interpret)
    return o.reshape(b, h, t, d).transpose(0, 2, 1, 3)
