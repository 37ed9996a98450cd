"""Multi-head self-attention over flattened spatial tokens.

Equivalent of the reference's QKVAttention/QKVAttentionLegacy
(/root/reference/rho_diffusion/models/unet_v2.py:365-436): the UNet flattens
all spatial dims into one token axis and runs full softmax attention. The
numerics preserved here:

* the double-sqrt scaling — q and k are each scaled by 1/sqrt(sqrt(d)) before
  the product, for fp16/bf16 stability (unet_v2.py:385-392, 420-427);
* softmax computed in float32 and cast back (unet_v2.py:391, 426).

Layout is [B, T, H, D] (tokens, heads, head-dim channels-last). Two backends:

* ``xla`` — einsum attention; XLA fuses this well for the short token counts
  the UNet produces at coarse resolutions (e.g. 512 tokens for 32^3 at ds=8);
* ``flash`` — the Pallas online-softmax kernel
  (rho_diffusion_tpu.ops.pallas.flash_attention) for long sequences, where
  the T^2 score matrix would blow HBM bandwidth/VMEM.

``attention()`` auto-dispatches on sequence length and platform.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Sequences at least this long route to the Pallas flash kernel on TPU.
# Round-2 sweep (benchmarks/flash_fwd_sweep.py, B*H=128, d=64, chained):
# fwd vs standalone XLA attention is 1.28x/1.65x/1.29x at T=1024/2048/4096
# (1.96x at 16384, round 1) with the default 1024/1024 blocks. At T=512 the
# standalone sweep says 0.82x, but the END-TO-END flagship bench says flash
# wins there too (2.4398 vs 2.4316 steps/s with xla at 512 — in-model the
# XLA attention fuses worse than it benches alone), so dispatch from 512.
FLASH_MIN_SEQ_LEN = 512


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Reference einsum attention. q, k, v: [B, T, H, D] -> [B, T, H, D]."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(d, jnp.float32)))
    scale = scale.astype(q.dtype)
    logits = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", weights, v)


def _ring_capable(q: jnp.ndarray) -> bool:
    """Ring attention applies when the Trainer's active mesh has a context
    axis >1 that divides the token count (SURVEY.md §5: slots into
    AttentionBlock's single call site)."""
    from rho_diffusion_tpu.parallel.mesh import CONTEXT_AXIS, get_active_mesh

    mesh = get_active_mesh()
    if mesh is None or CONTEXT_AXIS not in mesh.shape:
        return False
    ctx = mesh.shape[CONTEXT_AXIS]
    return ctx > 1 and q.shape[1] % ctx == 0 and q.shape[1] // ctx >= 1


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    backend: str = "auto",
) -> jnp.ndarray:
    """Dispatching multi-head attention. q, k, v: [B, T, H, D].

    Backends: "xla" (einsum), "flash" (Pallas online-softmax), "ring"
    (context-parallel over the active mesh's context axis — each device
    holds T/ctx tokens and K/V shards rotate over ICI). "auto" picks ring
    when the Trainer stepped under a context>1 mesh, then flash by length.
    """
    if backend == "auto":
        if _ring_capable(q):
            backend = "ring"
        else:
            use_flash = (
                q.shape[1] >= FLASH_MIN_SEQ_LEN
                and q.shape[-1] <= 256
                and jax.default_backend() == "tpu"
            )
            backend = "flash" if use_flash else "xla"
    if backend == "xla":
        return xla_attention(q, k, v)
    if backend == "flash":
        from rho_diffusion_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v)
    if backend == "ring":
        from rho_diffusion_tpu.parallel.context import context_sharded_attention
        from rho_diffusion_tpu.parallel.mesh import get_active_mesh

        if not _ring_capable(q):
            # token count not divisible by the context axis (or no mesh):
            # full attention is exact and cheap at these sizes
            return xla_attention(q, k, v)
        return context_sharded_attention(q, k, v, get_active_mesh())
    if backend == "ulysses":
        from rho_diffusion_tpu.parallel.mesh import CONTEXT_AXIS, get_active_mesh
        from rho_diffusion_tpu.parallel.ulysses import ulysses_sharded_attention

        mesh = get_active_mesh()
        if (
            not _ring_capable(q)
            or q.shape[2] % mesh.shape[CONTEXT_AXIS] != 0
        ):
            # needs heads % context == 0 on top of the ring conditions
            return xla_attention(q, k, v)
        return ulysses_sharded_attention(q, k, v, mesh)
    raise ValueError(f"Unknown attention backend '{backend}'")
