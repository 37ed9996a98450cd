"""Framework-wide utilities.

Re-implements the reference's helper surface (cf.
/root/reference/rho_diffusion/utils.py) in numpy/JAX terms:

* ``calculate_sha512_embedding`` — the hash-conditioning trick
  (utils.py:170-177): sha512 of the sorted-key JSON of a parameter dict,
  hexdigest chars -> ASCII codes / 128 -> float vector of length ``l``.
* ``parameter_space_to_embeddings`` / ``vector_to_embeddings`` — Cartesian
  products of parameter values -> stacked hash embeddings (utils.py:180-211).
* ``sample_from_discrete_parameter_space`` — random rows (training) or
  sequential first-N rows (eval grids) of the Cartesian product
  (utils.py:213-220).
* ``number_cast_dict`` — numeric-string coercion for JSON configs
  (utils.py:223-244).
* ``right_pad_dims_to`` — broadcast helper (utils.py:246-254).
* plotting helpers for image grids / voxel plots (utils.py:84-163).

Everything is torch-free; arrays are numpy on the host and jnp on device.
"""
from __future__ import annotations

import hashlib
import itertools
import json
from typing import Any, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Hash-based conditioning embeddings
# ---------------------------------------------------------------------------

def calculate_sha512_embedding(d: dict, l: int = 128) -> np.ndarray:
    """Deterministically embed an arbitrary parameter dict as a float vector.

    sha512 hexdigest is 128 chars; each char's ASCII code is repeated
    ``l // 128`` times element-wise and normalised by 128 (the ASCII range),
    matching the reference semantics (utils.py:170-177) bit-for-bit.
    """
    h = hashlib.sha512(json.dumps(d, sort_keys=True).encode()).hexdigest()
    codes = np.frombuffer(h.encode("ascii"), dtype=np.uint8)
    return (np.repeat(codes, max(l // 128, 1)) / 128.0).astype(np.float32)


def vector_to_embeddings(v: Sequence, keyname: str, l: int = 128) -> np.ndarray:
    """Hash-embed each scalar of ``v`` as ``{keyname: int(v_i)}``
    (reference utils.py:180-184)."""
    return np.stack(
        [calculate_sha512_embedding({keyname: int(x)}, l=l) for x in v],
    )


def parameter_space_to_embeddings(param_dict: dict, l: int = 128) -> np.ndarray:
    """Hash-embed every combination of a discrete parameter space
    (reference utils.py:187-211). Rows follow ``itertools.product`` order."""
    keys, values = zip(*param_dict.items())
    combos = [dict(zip(keys, v)) for v in itertools.product(*values)]
    return np.stack([calculate_sha512_embedding(c, l=l) for c in combos])


def discrete_parameter_combinations(param_dict: dict) -> np.ndarray:
    """All rows of the Cartesian product of a parameter-space dict, as a
    float32 array of shape [prod(len(v_i)), n_params]."""
    values = list(param_dict.values())
    return np.asarray(list(itertools.product(*values)), dtype=np.float32)


def sample_from_discrete_parameter_space(
    param_dict: dict,
    batch_size: int,
    random: bool = True,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Draw ``batch_size`` parameter rows: uniformly at random when training,
    or the first N rows sequentially (cycled) for deterministic eval grids
    (reference utils.py:213-220, parameter_space.py:9-16)."""
    combos = discrete_parameter_combinations(param_dict)
    n = combos.shape[0]
    if random:
        rng = rng or np.random.default_rng()
        idx = rng.integers(0, n, size=batch_size)
    else:
        idx = np.arange(batch_size) % n
    return combos[idx]


# ---------------------------------------------------------------------------
# Config coercion helpers
# ---------------------------------------------------------------------------

def _maybe_number(v: Any) -> Any:
    if isinstance(v, str):
        try:
            f = float(v)
        except ValueError:
            return v
        if f.is_integer() and ("." not in v and "e" not in v.lower()):
            return int(f)
        return f
    return v


def number_cast_dict(d: dict) -> dict:
    """Recursively cast numeric strings ("1e-4", "32") in a (nested) dict to
    numbers, preserving everything else (reference utils.py:223-244)."""
    out: dict = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out[k] = number_cast_dict(v)
        elif isinstance(v, (list, tuple)):
            out[k] = type(v)(
                number_cast_dict(x) if isinstance(x, dict) else _maybe_number(x)
                for x in v
            )
        else:
            out[k] = _maybe_number(v)
    return out


def right_pad_dims_to(x, target_ndim: int):
    """Append trailing singleton dims until ``x.ndim == target_ndim``
    (reference utils.py:246-254). Works on numpy and jnp arrays."""
    pad = target_ndim - x.ndim
    if pad <= 0:
        return x
    return x.reshape(x.shape + (1,) * pad)


# ---------------------------------------------------------------------------
# Persistent compile cache
# ---------------------------------------------------------------------------

def enable_persistent_compile_cache(cache_dir: str | None = None) -> str:
    """Point XLA's persistent compilation cache at ``cache_dir``.

    Through the remote-compile tunnel the flagship train step costs minutes
    to compile cold but seconds from this cache (measured: 212.8 s -> ~20 s,
    RESULTS.md), so every CLI entry point enables it. Call before the first
    jit execution; env ``JAX_CACHE_DIR`` overrides the default location.
    """
    import os

    cache_dir = cache_dir or os.environ.get("JAX_CACHE_DIR", "/tmp/rho_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


# ---------------------------------------------------------------------------
# Plotting (host-side, matplotlib)
# ---------------------------------------------------------------------------

def plot_image_grid(
    images: np.ndarray,
    filename: str | None = None,
    ncols: int = 4,
    cmap: str = "viridis",
):
    """Save/show a grid of 2D images. ``images``: [N, H, W] or [N, H, W, C]
    (channels-last; reference used torchvision.make_grid, utils.py:84-115)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    images = np.asarray(images)
    if images.ndim == 4 and images.shape[-1] == 1:
        images = images[..., 0]
    n = images.shape[0]
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(ncols * 2, nrows * 2))
    axes = np.atleast_1d(axes).ravel()
    for i, ax in enumerate(axes):
        ax.axis("off")
        if i < n:
            ax.imshow(images[i], cmap=cmap)
    fig.tight_layout()
    if filename:
        fig.savefig(filename, dpi=120)
        plt.close(fig)
    return fig


def plot_tensor_images(
    data: np.ndarray,
    filename: str | None = None,
    threshold: float = 0.5,
):
    """Plot a batch of fields: 2D via imshow grids, 3D via thresholded voxel
    scatter (reference utils.py:118-163). ``data``: [N, *spatial, C]."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.asarray(data)
    if data.shape[-1] == 1:
        data = data[..., 0]
    spatial_ndim = data.ndim - 1
    if spatial_ndim <= 2:
        return plot_image_grid(data, filename=filename)
    # 3D voxel plot
    n = data.shape[0]
    ncols = min(n, 4)
    nrows = (n + ncols - 1) // ncols
    fig = plt.figure(figsize=(ncols * 3, nrows * 3))
    for i in range(n):
        ax = fig.add_subplot(nrows, ncols, i + 1, projection="3d")
        vol = data[i]
        mask = vol > threshold * vol.max() if vol.max() > 0 else vol > threshold
        xs, ys, zs = np.nonzero(mask)
        ax.scatter(xs, ys, zs, c=vol[mask], s=2, cmap="viridis", alpha=0.4)
        ax.set_axis_off()
    fig.tight_layout()
    if filename:
        fig.savefig(filename, dpi=120)
        plt.close(fig)
    return fig
