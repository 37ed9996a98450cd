"""Dataset base abstractions.

numpy-native equivalents of the reference's torch abstractions
(/root/reference/rho_diffusion/data/base.py): datasets are host-side,
channels-LAST ([*spatial, C]) numpy producers; device placement and sharding
happen in the loader/trainer, never inside a dataset.
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np


class AbstractDataset:
    """Map-style dataset: __len__ + __getitem__ -> (data, label)."""

    parameter_space: Any = None
    attributes: dict = {}

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, index: int):
        raise NotImplementedError


class MultiVariateDataset(AbstractDataset):
    """Marker for datasets conditioned on a multi-dimensional parameter
    space (reference base.py:27-32)."""


class UnivariateDataset(AbstractDataset):
    """Marker for single-parameter datasets (reference base.py:35-38)."""


class Density(np.ndarray):
    """A density field with an optional coordinate grid
    (reference base.py:41-137, a torch.Tensor subclass; here numpy).

    ``normalize()`` rescales so the field integrates to one over the grid.
    """

    def __new__(cls, data, coords: Optional[np.ndarray] = None):
        obj = np.asarray(data).view(cls)
        obj.coords = coords
        return obj

    def __array_finalize__(self, obj):
        if obj is None:
            return
        self.coords = getattr(obj, "coords", None)

    def normalize(self) -> "Density":
        """Normalise by the integral of the density over the grid
        (reference base.py:89-113)."""
        total = float(np.sum(np.abs(self)))
        if total == 0.0:
            return self
        out = Density(np.asarray(self) / total, coords=self.coords)
        return out

    def marginalize(self, axis: int | tuple) -> "Density":
        """Marginal density over the given axes (the reference declared this
        but left it a stub, base.py:115-126)."""
        return Density(np.sum(np.asarray(self), axis=axis))

    def sample(self, n: int, rng: np.random.Generator | None = None) -> np.ndarray:
        """Draw ``n`` grid indices distributed according to the density
        (reference stub at base.py:128-137). Returns [n, ndim] index rows."""
        rng = rng or np.random.default_rng()
        p = np.abs(np.asarray(self, dtype=np.float64)).ravel()
        total = p.sum()
        if total <= 0:
            raise ValueError("cannot sample from an all-zero density")
        flat = rng.choice(p.size, size=n, p=p / total)
        return np.stack(np.unravel_index(flat, self.shape), axis=1)
