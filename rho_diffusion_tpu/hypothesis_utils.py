"""Property-based-testing strategies for jnp arrays.

Equivalent of the reference's torch-tensor hypothesis strategies
(/root/reference/rho_diffusion/hypothesis_utils.py:61-89, adapted from
torch-hypothesis): composite strategies drawing random array shapes, dtypes
and value ranges — here emitting jax.numpy arrays.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

try:
    from hypothesis import strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False


def from_range_value_or_choice(draw, spec, default_strategy):
    """Resolve a flexible spec: a 2-tuple is a range, a list is a choice,
    a scalar is fixed, None falls back to ``default_strategy``
    (reference hypothesis_utils.py:61-79)."""
    if spec is None:
        return draw(default_strategy)
    if isinstance(spec, tuple) and len(spec) == 2:
        lo, hi = spec
        if isinstance(lo, int) and isinstance(hi, int):
            return draw(st.integers(lo, hi))
        return draw(st.floats(float(lo), float(hi), allow_nan=False))
    if isinstance(spec, (list, set)):
        return draw(st.sampled_from(sorted(spec, key=str)))
    return spec


if HAS_HYPOTHESIS:

    @st.composite
    def jnp_arrays(
        draw,
        shape: Optional[Union[tuple, Sequence]] = None,
        dtype=None,
        min_value: float = -10.0,
        max_value: float = 10.0,
        min_dims: int = 1,
        max_dims: int = 4,
        max_side: int = 8,
    ):
        """Draw a random jnp array (reference torch_tensor strategy,
        hypothesis_utils.py:82-89)."""
        if shape is None:
            ndims = draw(st.integers(min_dims, max_dims))
            shape = tuple(
                draw(st.integers(1, max_side)) for _ in range(ndims)
            )
        elif not isinstance(shape, tuple):
            shape = tuple(shape)
        dtype = from_range_value_or_choice(
            draw, dtype, st.sampled_from([np.float32, np.int32]),
        )
        seed = draw(st.integers(0, 2**31 - 1))
        rng = np.random.default_rng(seed)
        if np.issubdtype(np.dtype(dtype), np.integer):
            arr = rng.integers(int(min_value), int(max_value) + 1, size=shape)
        else:
            arr = rng.uniform(min_value, max_value, size=shape)
        return jnp.asarray(arr.astype(dtype))
else:  # pragma: no cover
    def jnp_arrays(*args, **kwargs):
        raise ImportError("hypothesis is required for jnp_arrays")
