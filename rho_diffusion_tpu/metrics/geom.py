"""Geometric / distributional metrics.

The reference wraps geomloss' SamplesLoss("sinkhorn", p=1, blur=0.01)
(/root/reference/rho_diffusion/metrics/geom.py:28-37) to compare generated
fields against data. geomloss is torch/CUDA; here the entropic-regularised
Wasserstein distance is a pure-JAX Sinkhorn in log-space — jittable, stable
at small blur, and batched over the leading axis like SamplesLoss.

Semantics matched to geomloss: samples are flattened to point clouds of
1-D features, ground cost |x - y|^p with p=1, entropic blur eps = blur^p,
and the debiased Sinkhorn divergence
S(a,b) = OT_eps(a,b) - (OT_eps(a,a) + OT_eps(b,b))/2 >= 0.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rho_diffusion_tpu.registry import registry


def _sinkhorn_potentials(cost, eps, num_iters):
    """Symmetric log-domain Sinkhorn iterations for uniform marginals.
    cost: [N, M]. Returns (f [N], g [M])."""
    n, m = cost.shape
    log_a = -jnp.log(n)
    log_b = -jnp.log(m)

    def body(_, fg):
        f, g = fg
        # g update: g_j = -eps * logsumexp_i ((f_i - C_ij)/eps + log a_i)
        g_new = -eps * jax.nn.logsumexp((f[:, None] - cost) / eps + log_a, axis=0)
        f_new = -eps * jax.nn.logsumexp((g_new[None, :] - cost) / eps + log_b, axis=1)
        return f_new, g_new

    f0 = jnp.zeros((n,), cost.dtype)
    g0 = jnp.zeros((m,), cost.dtype)
    return jax.lax.fori_loop(0, num_iters, body, (f0, g0))


def _ot_cost(x, y, eps, num_iters, p):
    # geomloss ground cost: C = ||x - y||_2^p / p (Euclidean metric)
    sq = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(sq, 1e-20))
    cost = dist if p == 1 else dist**p / p
    f, g = _sinkhorn_potentials(cost, eps, num_iters)
    return jnp.mean(f) + jnp.mean(g)


@partial(jax.jit, static_argnames=("p", "num_iters"))
def sinkhorn_divergence(
    x: jnp.ndarray,
    y: jnp.ndarray,
    blur: float = 0.01,
    p: int = 1,
    num_iters: int = 100,
) -> jnp.ndarray:
    """Debiased Sinkhorn divergence between two point clouds x [N, D],
    y [M, D] with uniform weights (geomloss SamplesLoss semantics)."""
    eps = blur**p
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if x.ndim == 1:
        x = x[:, None]
    if y.ndim == 1:
        y = y[:, None]
    ot_xy = _ot_cost(x, y, eps, num_iters, p)
    ot_xx = _ot_cost(x, x, eps, num_iters, p)
    ot_yy = _ot_cost(y, y, eps, num_iters, p)
    return jnp.maximum(ot_xy - 0.5 * (ot_xx + ot_yy), 0.0)


@registry.register_layer("WassersteinWrapper")
class WassersteinWrapper:
    """Batched Wasserstein metric over flattened fields
    (reference geom.py:28-37): each sample's field becomes a 1-D point
    cloud; returns one divergence per batch element."""

    def __init__(self, blur: float = 0.01, p: int = 1, num_iters: int = 100) -> None:
        self.blur = blur
        self.p = p
        self.num_iters = num_iters

    def __call__(self, pred_data: jnp.ndarray, true_data: jnp.ndarray) -> jnp.ndarray:
        assert pred_data.shape == true_data.shape
        # geomloss semantics: flatten(1) makes each batch element ONE point
        # in R^(prod spatial); the divergence compares the two B-point clouds
        flat_p = pred_data.reshape(pred_data.shape[0], -1)
        flat_t = true_data.reshape(true_data.shape[0], -1)
        return sinkhorn_divergence(
            flat_p, flat_t, blur=self.blur, p=self.p, num_iters=self.num_iters,
        )
