"""Tensor parallelism via GSPMD parameter sharding.

The reference has no model parallelism (SURVEY.md §2.6: DP only). For very
large 3D UNets the dominant parameters are conv kernels [*K, I, O] and Dense
kernels [I, O]; sharding their OUTPUT-channel axis over a mesh axis lets
GSPMD partition the matmuls/convs and insert the reduce-scatter/all-gather
collectives automatically — no model-code changes, because the jitted train
step propagates shardings from its inputs.

Usage:
    mesh = make_mesh(data=4, context=2)         # reuse "context" for TP
    state = shard_params_for_tp(state, mesh, axis="context")
    batch = shard_batch(batch, mesh)
    new_state, metrics = pipe.train_step(state, batch)
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rho_diffusion_tpu.parallel.mesh import CONTEXT_AXIS


def tp_spec_for(path_leaf_shape: tuple, axis: str, axis_size: int, min_dim: int) -> P:
    """PartitionSpec for one parameter: shard the trailing (output-channel)
    dim when it's divisible and large enough; replicate otherwise."""
    if len(path_leaf_shape) >= 2:
        out_dim = path_leaf_shape[-1]
        if out_dim % axis_size == 0 and out_dim >= min_dim:
            return P(*((None,) * (len(path_leaf_shape) - 1)), axis)
    return P()


def shard_params_for_tp(
    tree: Any,
    mesh: Mesh,
    axis: str = CONTEXT_AXIS,
    min_dim: int = 64,
) -> Any:
    """Place every large kernel in ``tree`` with its output-channel axis
    sharded over ``axis`` (biases/norm scales replicated). Works on raw
    params or a whole TrainState (optimizer moments follow their params)."""
    axis_size = mesh.shape[axis]

    def place(leaf):
        spec = tp_spec_for(tuple(leaf.shape), axis, axis_size, min_dim)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def tp_sharding_summary(tree: Any) -> dict[str, int]:
    """Count sharded vs replicated leaves (diagnostics)."""
    sharded = replicated = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec and any(s is not None for s in spec):
            sharded += 1
        else:
            replicated += 1
    return {"sharded": sharded, "replicated": replicated}
