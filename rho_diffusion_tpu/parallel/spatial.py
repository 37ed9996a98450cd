"""Spatial (depth-axis) sharding for the 3-D conv stack: true context
parallelism for volumes too large for one chip.

Ring attention (parallel/context.py) already shards the attention token
axis; this module completes the picture for convolutions. The 3-D UNet's
layout makes the DEPTH axis the natural shard dimension: every
downsample/upsample touches only the inner two spatial dims (reference
unet_v2.py:124-129, 153 — preserved in ops/convolution.py), so a
D-sharded activation never needs resharding across levels; only the 3x3x3
convs see their neighbours, and a 1-plane halo exchange over the ICI ring
covers that.

Two entry points:

* ``halo_exchange`` / ``spatial_sharded_conv3d`` — explicit shard_map
  building blocks. ``jax.lax.ppermute`` with a non-cyclic permutation
  delivers ZEROS at the global edges, which is exactly SAME-padding
  semantics, so the sharded conv is bit-compatible with the unsharded one.
* Trainer-level: ``training.spatial_sharding: true`` shards the batch's
  depth axis over the "context" mesh axis and lets GSPMD partition the
  whole network (it inserts the halo collective-permutes for convs and the
  cross-shard psums for GroupNorm automatically); the flattened attention
  token axis inherits the depth sharding, which is precisely the layout
  ring attention expects.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rho_diffusion_tpu.parallel.mesh import CONTEXT_AXIS, DATA_AXIS

__all__ = ["halo_exchange", "sharded_conv3d_local", "spatial_sharded_conv3d"]


def halo_exchange(
    x: jnp.ndarray, axis_name: str = CONTEXT_AXIS, axis: int = 1,
) -> jnp.ndarray:
    """Pad a depth-sharded local block with 1-plane halos from the ring
    neighbours. ``x`` local shape [B, D/n, H, W, C] (inside shard_map).

    Non-cyclic ppermute semantics fill the first shard's left halo and the
    last shard's right halo with zeros == global SAME padding.
    """
    n = jax.lax.psum(1, axis_name)
    fwd = [(j, j + 1) for j in range(n - 1)]  # send right
    bwd = [(j + 1, j) for j in range(n - 1)]  # send left
    last = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    left_halo = jax.lax.ppermute(last, axis_name, fwd)
    right_halo = jax.lax.ppermute(first, axis_name, bwd)
    return jnp.concatenate([left_halo, x, right_halo], axis=axis)


def sharded_conv3d_local(x, kernel, axis_name: str = CONTEXT_AXIS):
    """shard_map body: 3x3x3 stride-1 SAME conv on a depth-sharded block.

    Depth is haloed (VALID over the exchanged planes), H/W padded locally.
    """
    xh = halo_exchange(x, axis_name)
    return jax.lax.conv_general_dilated(
        xh,
        kernel,
        (1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def spatial_sharded_conv3d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = CONTEXT_AXIS,
) -> jnp.ndarray:
    """Global entry: conv over [B, D, H, W, C] with D sharded over
    ``axis_name`` (and batch over "data" when divisible). Exact vs the
    unsharded conv — the halo exchange reproduces SAME padding."""
    batch_axis = None
    if DATA_AXIS in mesh.shape and x.shape[0] % mesh.shape[DATA_AXIS] == 0:
        batch_axis = DATA_AXIS
    xspec = P(batch_axis, axis_name, None, None, None)
    fn = jax.shard_map(
        partial(sharded_conv3d_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=(xspec, P()),
        out_specs=xspec,
    )
    return fn(x, kernel)
