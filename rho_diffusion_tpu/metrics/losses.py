"""Loss functions and training metrics.

Replaces the reference's use of torch.nn losses (registered under the "nn"
category, /root/reference/rho_diffusion/registry.py:160-203) and its VLB
machinery (/root/reference/rho_diffusion/metrics/losses.py): normal KL
divergence and the discretised-Gaussian log-likelihood used for
learned-variance training and bits-per-dim evaluation
(gaussian_diffusion.py:826-1009).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rho_diffusion_tpu.registry import registry


# ---------------------------------------------------------------------------
# Elementwise training losses ("nn" registry category, torch-name parity)
# ---------------------------------------------------------------------------

def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred - target))


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    err = pred - target
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return jnp.mean(0.5 * quad**2 + delta * (abs_err - quad))


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    err = jnp.abs(pred - target)
    return jnp.mean(jnp.where(err < beta, 0.5 * err**2 / beta, err - 0.5 * beta))


def cross_entropy_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss semantics: ``pred`` are logits [N, C];
    ``target`` is class indices [N] (integer) or class probabilities
    [N, C]."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    if jnp.issubdtype(target.dtype, jnp.integer):
        picked = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        return -jnp.mean(picked)
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def nll_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.NLLLoss: ``pred`` are log-probabilities [N, C], ``target``
    integer class indices [N]."""
    picked = jnp.take_along_axis(pred, target[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


def bce_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.BCELoss: ``pred`` are probabilities in [0, 1]."""
    p = jnp.clip(pred, 1e-12, 1.0 - 1e-12)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))


def bce_with_logits_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.BCEWithLogitsLoss (numerically stable log-sigmoid form)."""
    return jnp.mean(
        jnp.maximum(pred, 0.0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred))),
    )


def kldiv_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.KLDivLoss (default 'mean' reduction): ``pred`` are
    log-probabilities, ``target`` probabilities."""
    t = jnp.maximum(target, 0.0)
    elt = jnp.where(t > 0, t * (jnp.log(jnp.maximum(t, 1e-12)) - pred), 0.0)
    return jnp.mean(elt)


# Every name the reference could resolve through its "nn" prepopulation of
# torch losses (registry.py:160-203) — a config naming any of these works
# here too. Aliases match the torch class names exactly.
for _name, _fn in {
    "MSELoss": mse_loss,
    "L1Loss": l1_loss,
    "HuberLoss": huber_loss,
    "SmoothL1Loss": smooth_l1_loss,
    "CrossEntropyLoss": cross_entropy_loss,
    "NLLLoss": nll_loss,
    "BCELoss": bce_loss,
    "BCEWithLogitsLoss": bce_with_logits_loss,
    "KLDivLoss": kldiv_loss,
}.items():
    def _make(fn):
        def factory():
            return fn

        return factory

    registry.add("nn", _name, _make(_fn))


def resolve_loss(loss) -> callable:
    """Resolve a loss name / factory / callable to fn(pred, target) -> scalar."""
    if isinstance(loss, str):
        loss = registry.get("nn", loss)()
    elif isinstance(loss, type):
        loss = loss()
    return loss


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio with data range inferred from the target
    (matches torchmetrics' default behaviour; the reference logs PSNR between
    clean and noised data, abstract_diffusion.py:79, ddpm.py:283-286)."""
    data_range = jnp.max(target) - jnp.min(target)
    mse = jnp.mean(jnp.square(pred - target))
    return 10.0 * jnp.log10(jnp.square(data_range) / jnp.maximum(mse, 1e-20))


# ---------------------------------------------------------------------------
# Variational-lower-bound pieces (for learned-variance training / BPD eval)
# ---------------------------------------------------------------------------

def normal_kl(mean1, logvar1, mean2, logvar2) -> jnp.ndarray:
    """KL(N(mean1, exp(logvar1)) || N(mean2, exp(logvar2))), elementwise,
    in nats (reference metrics/losses.py normal_kl)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh-based approximation of the standard normal CDF (Page 1977), the
    same approximation the reference's discretised Gaussian likelihood uses."""
    return 0.5 * (
        1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * jnp.power(x, 3)))
    )


def discretized_gaussian_log_likelihood(
    x: jnp.ndarray, means: jnp.ndarray, log_scales: jnp.ndarray,
) -> jnp.ndarray:
    """Log-likelihood of a Gaussian discretised to the 1/127.5 image bins,
    elementwise in nats. ``x`` is assumed rescaled to [-1, 1]."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        ),
    )
