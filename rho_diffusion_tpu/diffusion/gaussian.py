"""Full-featured Gaussian diffusion (the reference's "GaussianDiffusionPipeline",
an OpenAI guided-diffusion lineage port —
/root/reference/rho_diffusion/diffusion/gaussian_diffusion.py:143-1228).

Capability parity, re-designed functionally for TPU:

* ModelMeanType {PREVIOUS_X, START_X, EPSILON}, ModelVarType {LEARNED,
  FIXED_SMALL, FIXED_LARGE, LEARNED_RANGE}, LossType {MSE, RESCALED_MSE, KL,
  RESCALED_KL} (reference gaussian_diffusion.py:107-140);
* q/posterior math, p_mean_variance with dynamic thresholding at the 0.9
  abs-quantile (reference :338-443);
* classifier guidance via condition_mean (Sohl-Dickstein) and condition_score
  (Song) (reference :473-510);
* ancestral p_sample and DDIM sampling with eta (reference :512-824), both as
  single ``lax.scan`` loops fully on device, plus DDIM respacing (an index
  table selecting a sub-sequence of timesteps — the fast-sampler capability
  the reference names but never wires);
* VLB terms, learned-variance training with frozen-mean vb term, and
  bits-per-dim evaluation (reference :826-1009), the T-loop as ``lax.scan``.

Conscious fixes over the reference (SURVEY.md "hard parts" #3):
* the injected config schedule IS honoured — coefficients derive from the
  schedule's betas instead of a hard-coded cosine rebuild (reference bug at
  :236-274);
* training noises x_0 exactly once (the reference double-noised: its
  training_step q_sampled the already-noised tensor again, :1186-1200);
* batch size is derived before use in all condition branches (reference
  use-before-assign at :1054-1062).

All arrays are channels-LAST; learned-variance models emit 2*C channels that
split on the last axis.
"""
from __future__ import annotations

import enum
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rho_diffusion_tpu.diffusion.base import AbstractDiffusionPipeline, extract, normalize_batch
from rho_diffusion_tpu.diffusion.sampling_rng import (
    is_per_sample_keys,
    keys_at_step,
    normal_like,
)
from rho_diffusion_tpu.diffusion.schedule import NoiseSchedule, named_beta_schedule
from rho_diffusion_tpu.diffusion.solvers import build_solver, is_solver, solver_names
from rho_diffusion_tpu.metrics.losses import (
    discretized_gaussian_log_likelihood,
    normal_kl,
)
from rho_diffusion_tpu.ops.convolution import mean_flat


class ModelMeanType(enum.Enum):
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"
    # v-parameterisation (Salimans & Ho, progressive distillation):
    # v = sqrt(abar)*eps - sqrt(1-abar)*x0. The reference reached this only
    # via HF DDPMScheduler(prediction_type="v_prediction")
    # (reference diffusers.py:148-151); here it is a first-class mean type.
    VELOCITY = "v_prediction"


class ModelVarType(enum.Enum):
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"

    def is_vb(self) -> bool:
        return self in (LossType.KL, LossType.RESCALED_KL)


@struct.dataclass
class GaussianCoefficients:
    """All precomputed q/posterior tables, float32, shape [T].
    Construction happens in float64 on the host (reference :236-274)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray
    # original-process timestep each (possibly respaced) index maps to
    timestep_map: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def _with_div_ignore(fn):
    with np.errstate(divide="ignore"):
        return fn()


def coefficients_from_betas(
    betas: np.ndarray, timestep_map: Optional[np.ndarray] = None,
) -> GaussianCoefficients:
    betas = np.asarray(betas, dtype=np.float64)
    (T,) = betas.shape
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    acp_next = np.append(acp[1:], 0.0)
    posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
    # log-variance clipped at t=0 because posterior variance is 0 there;
    # a one-step table (respace to 1, e.g. single-eval dpm++) has no t=1
    # entry to borrow, so fall back to beta_0
    pv1 = posterior_variance[1] if T > 1 else betas[0]
    posterior_log_variance_clipped = np.log(
        np.append(pv1, posterior_variance[1:]),
    )
    fixed_large = np.append(pv1, betas[1:])
    if timestep_map is None:
        timestep_map = np.arange(T)
    f32 = lambda a: jnp.asarray(np.asarray(a).astype(np.float32))
    return GaussianCoefficients(
        betas=f32(betas),
        alphas_cumprod=f32(acp),
        alphas_cumprod_prev=f32(acp_prev),
        alphas_cumprod_next=f32(acp_next),
        sqrt_alphas_cumprod=f32(np.sqrt(acp)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - acp)),
        # zero-terminal-SNR schedules (rescale_zero_terminal_snr) have
        # alpha_bar_T == 0: the reciprocal tables are inf there by design
        # (only the EPSILON mean type reads them at t = T-1, and that
        # combination is rejected at pipeline construction)
        sqrt_recip_alphas_cumprod=f32(_with_div_ignore(lambda: np.sqrt(1.0 / acp))),
        sqrt_recipm1_alphas_cumprod=f32(_with_div_ignore(lambda: np.sqrt(1.0 / acp - 1.0))),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
        posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        fixed_large_variance=f32(fixed_large),
        fixed_large_log_variance=f32(np.log(fixed_large)),
        timestep_map=jnp.asarray(np.asarray(timestep_map, dtype=np.int32)),
    )


def coefficients_from_schedule(schedule: NoiseSchedule) -> GaussianCoefficients:
    """Honour the config-injected schedule (fixes reference :236)."""
    return coefficients_from_betas(np.asarray(schedule.beta_t, dtype=np.float64))


def space_timesteps(num_timesteps: int, num_respaced: int) -> np.ndarray:
    """Evenly-spaced sub-sequence of original timesteps for fast (DDIM)
    sampling — guided-diffusion style striding."""
    if num_respaced >= num_timesteps:
        return np.arange(num_timesteps)
    frac = num_timesteps / num_respaced
    return np.round(np.arange(num_respaced) * frac).astype(np.int64)


def space_timesteps_trailing(num_timesteps: int, num_respaced: int) -> np.ndarray:
    """Trailing grid t_i = round((i+1)·T/n) - 1: anchors at t = T-1 (full
    noise) instead of t = 0, and is exactly CLOSED UNDER HALVING (its
    every-other-point subset is the n/2 trailing grid) — the grid
    progressive distillation trains on (diffusion/distill.py). Use this
    spacing when sampling a distilled student through the pipeline API."""
    if num_respaced >= num_timesteps:
        return np.arange(num_timesteps)
    frac = num_timesteps / num_respaced
    use = np.round(np.arange(1, num_respaced + 1) * frac).astype(np.int64) - 1
    if len(np.unique(use)) != num_respaced:
        raise ValueError(
            f"cannot stride {num_timesteps} timesteps to {num_respaced} distinct points",
        )
    return use


def space_timesteps_lambda(
    coeffs: GaussianCoefficients, num_respaced: int,
) -> np.ndarray:
    """Sub-sequence of original timesteps whose log-SNRs are as close to
    uniformly spaced as the discrete grid allows — the step spacing
    DPM-Solver++ is derived for (arXiv:2211.01095 §4). Uniform-t striding
    of a linear-beta schedule makes the final lambda interval several
    times larger than the rest, which wrecks the 2M extrapolation."""
    if num_respaced >= coeffs.num_timesteps:
        return np.arange(coeffs.num_timesteps)
    abar = np.asarray(coeffs.alphas_cumprod, np.float64)
    if abar[-1] == 0.0:
        # lam[-1] would be -inf -> NaN linspace targets -> every argmin
        # snaps to 0 and the spill loop silently returns [0..K-1], feeding
        # x_T = pure noise into near-full-signal steps
        raise ValueError(
            "uniform-lambda spacing needs a finite terminal log-SNR; the "
            "zero-terminal-SNR table has lambda(T-1) = -inf — use "
            "'trailing' spacing there",
        )
    lam = 0.5 * np.log(abar / (1.0 - abar))  # decreasing in t
    targets = np.linspace(lam[-1], lam[0], num_respaced)
    return _snap_targets_unique(lam, targets)


def _snap_targets_unique(values: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Snap each target to the nearest timestep by ``values[t]``, with
    exactly ``len(targets)`` UNIQUE steps: on a grid that is coarse in the
    target coordinate (small T, steep cosine tail) several targets snap to
    the same index; a plain argmin+unique would silently return fewer model
    evaluations than the caller asked for. Greedily spill collisions to the
    nearest free neighbour instead (len(targets) < T guarantees one exists).
    """
    dist = np.abs(values[None, :] - targets[:, None])  # [K, T]
    taken = np.zeros(values.shape[0], bool)
    out = []
    for k in range(targets.shape[0]):
        cand = int(dist[k].argmin())
        offset = 1
        while taken[cand]:
            lo, hi = cand - offset, cand + offset
            if lo >= 0 and not taken[lo]:
                cand = lo
            elif hi < values.shape[0] and not taken[hi]:
                cand = hi
            else:
                offset += 1
        taken[cand] = True
        out.append(cand)
    return np.sort(np.asarray(out, np.int64))


def space_timesteps_karras(
    coeffs: GaussianCoefficients, num_respaced: int, rho: float = 7.0,
) -> np.ndarray:
    """Karras et al. (arXiv:2206.00364 eq. 5) noise grid snapped to the
    discrete timestep table: sigma_i^(1/rho) interpolated linearly between
    sigma_max^(1/rho) (t = T-1) and sigma_min^(1/rho) (t = 0), with the VP
    sigma(t) = sqrt((1-abar)/abar). rho=7 concentrates steps near
    sigma_min, where the probability-flow ODE's curvature concentrates —
    a quality lever for few-step DDIM on regular (nonzero-terminal-SNR)
    schedules. Always includes the terminal step (sigma_max is the first
    grid point)."""
    if num_respaced >= coeffs.num_timesteps:
        return np.arange(coeffs.num_timesteps)
    abar = np.asarray(coeffs.alphas_cumprod, np.float64)
    if abar[-1] == 0.0:
        raise ValueError(
            "karras spacing needs a finite sigma_max; the zero-terminal-SNR "
            "table has sigma(T-1) = inf — use 'trailing' spacing there",
        )
    sigma = np.sqrt((1.0 - abar) / abar)  # increasing in t
    inv = 1.0 / rho
    grid = np.linspace(sigma[-1] ** inv, sigma[0] ** inv, num_respaced) ** rho
    return _snap_targets_unique(sigma, grid)


def respace_subset(
    coeffs: GaussianCoefficients,
    use: np.ndarray,
) -> GaussianCoefficients:
    """Build new coefficients over an EXPLICIT ascending timestep subset:
    new beta_i = 1 - abar(t_i)/abar(t_{i-1}). The returned ``timestep_map``
    converts respaced indices back to original model timesteps. Progressive
    distillation needs exact grid nesting (student grid = every other
    teacher point), which the count-based :func:`respace` can't express."""
    acp = np.asarray(coeffs.alphas_cumprod, dtype=np.float64)
    use = np.asarray(use, np.int64)
    # compose with an existing respacing so a distilled stage can respace
    # its own (already strided) grid again
    tmap = np.asarray(coeffs.timestep_map, np.int64)
    last_acp = 1.0
    new_betas = []
    for t in use:
        new_betas.append(1.0 - acp[t] / last_acp)
        last_acp = acp[t]
    return coefficients_from_betas(
        np.asarray(new_betas), timestep_map=tmap[use],
    )


def respace(
    coeffs: GaussianCoefficients,
    num_respaced: int,
    spacing: str = "uniform-t",
) -> GaussianCoefficients:
    """Build new coefficients over a strided timestep subset: new
    beta_i = 1 - abar(t_i)/abar(t_{i-1}). The returned ``timestep_map``
    converts respaced indices back to original model timesteps.
    ``spacing``: 'uniform-t' (guided-diffusion striding, the DDPM/DDIM
    default), 'uniform-lambda' (uniform log-SNR, for DPM-Solver++),
    'trailing' (halving-closed distillation grid — what a distilled
    student was trained on), or 'karras' (Karras rho=7 sigma grid,
    terminal-anchored and dense near sigma_min)."""
    if spacing == "uniform-lambda":
        use = space_timesteps_lambda(coeffs, num_respaced)
    elif spacing == "uniform-t":
        use = space_timesteps(coeffs.num_timesteps, num_respaced)
    elif spacing == "trailing":
        use = space_timesteps_trailing(coeffs.num_timesteps, num_respaced)
    elif spacing == "karras":
        use = space_timesteps_karras(coeffs, num_respaced)
    else:
        raise ValueError(
            f"unknown spacing {spacing!r}; expected 'uniform-t', "
            f"'uniform-lambda', 'trailing' or 'karras'",
        )
    return respace_subset(coeffs, use)


# ---------------------------------------------------------------------------
# Pure math (reference :277-510)
# ---------------------------------------------------------------------------

def q_mean_variance(c: GaussianCoefficients, x_start, t):
    mean = extract(c.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
    variance = extract(1.0 - c.alphas_cumprod, t, x_start.ndim)
    log_variance = extract(c.log_one_minus_alphas_cumprod, t, x_start.ndim)
    return mean, variance, log_variance


def q_sample(c: GaussianCoefficients, x_start, t, noise):
    return (
        extract(c.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + extract(c.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def q_posterior_mean_variance(c: GaussianCoefficients, x_start, x_t, t):
    mean = (
        extract(c.posterior_mean_coef1, t, x_t.ndim) * x_start
        + extract(c.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    variance = extract(c.posterior_variance, t, x_t.ndim)
    log_variance = extract(c.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, variance, log_variance


def predict_xstart_from_eps(c: GaussianCoefficients, x_t, t, eps):
    return (
        extract(c.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(c.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
    )


def predict_xstart_from_xprev(c: GaussianCoefficients, x_t, t, xprev):
    coef1 = extract(c.posterior_mean_coef1, t, x_t.ndim)
    coef2 = extract(c.posterior_mean_coef2, t, x_t.ndim)
    return xprev / coef1 - (coef2 / coef1) * x_t


def predict_xstart_from_v(c: GaussianCoefficients, x_t, t, v):
    """x0 = sqrt(abar)*x_t - sqrt(1-abar)*v (v-parameterisation inverse)."""
    return (
        extract(c.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(c.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
    )


def velocity_target(c: GaussianCoefficients, x_start, t, noise):
    """v = sqrt(abar)*eps - sqrt(1-abar)*x0 — the v-prediction training
    target (reference reachable only via HF prediction_type, diffusers.py:148)."""
    return (
        extract(c.sqrt_alphas_cumprod, t, x_start.ndim) * noise
        - extract(c.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * x_start
    )


def predict_eps_from_xstart(c: GaussianCoefficients, x_t, t, pred_xstart):
    """eps = (x_t - sqrt(abar)*x0) / sqrt(1-abar).

    Algebraically identical to the reference's reciprocal form
    ``(x_t/sqrt(abar) - x0) / sqrt(1/abar - 1)`` (gaussian_diffusion.py:
    462-470) but finite at alpha_bar == 0, so DDIM sampling works on
    zero-terminal-SNR schedules (the reciprocal form is inf/inf = NaN at
    the terminal step)."""
    return (
        x_t - extract(c.sqrt_alphas_cumprod, t, x_t.ndim) * pred_xstart
    ) / extract(c.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)


def dynamic_threshold(x: jnp.ndarray, percentile: float = 0.9) -> jnp.ndarray:
    """Imagen-style dynamic thresholding (reference :400-415): clamp each
    sample to +/- its ``percentile`` abs-quantile s (>= 1) and rescale by s."""
    flat = jnp.abs(x.reshape(x.shape[0], -1))
    s = jnp.quantile(flat, percentile, axis=-1)
    s = jnp.maximum(s, 1.0)
    s = s.reshape(s.shape[0], *((1,) * (x.ndim - 1)))
    return jnp.clip(x, -s, s) / s


def p_mean_variance(
    c: GaussianCoefficients,
    model_fn: Callable,
    x: jnp.ndarray,
    t: jnp.ndarray,
    mean_type: ModelMeanType,
    var_type: ModelVarType,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
    thresholding_percentile: float = 0.9,
) -> dict:
    """p(x_{t-1} | x_t) mean/variance + x0 prediction (reference :338-443).

    ``model_fn(x, t_scaled)`` must already close over conditioning; ``t`` is
    in respaced index space and is mapped to original model timesteps here.
    """
    model_output = model_fn(x, c.timestep_map[t])

    C = x.shape[-1]
    if var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        assert model_output.shape[-1] == 2 * C
        model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
        if var_type == ModelVarType.LEARNED:
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = extract(c.posterior_log_variance_clipped, t, x.ndim)
            max_log = extract(jnp.log(c.betas), t, x.ndim)
            frac = (model_var_values + 1.0) / 2.0
            model_log_variance = frac * max_log + (1.0 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    elif var_type == ModelVarType.FIXED_LARGE:
        model_variance = extract(c.fixed_large_variance, t, x.ndim)
        model_log_variance = extract(c.fixed_large_log_variance, t, x.ndim)
    elif var_type == ModelVarType.FIXED_SMALL:
        model_variance = extract(c.posterior_variance, t, x.ndim)
        model_log_variance = extract(c.posterior_log_variance_clipped, t, x.ndim)
    else:
        raise NotImplementedError(var_type)

    def process_xstart(xs):
        if denoised_fn is not None:
            xs = denoised_fn(xs)
        if clip_denoised:
            xs = dynamic_threshold(xs, thresholding_percentile)
        return xs

    if mean_type == ModelMeanType.PREVIOUS_X:
        pred_xstart = process_xstart(
            predict_xstart_from_xprev(c, x, t, model_output),
        )
        model_mean = model_output
    else:
        if mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
        elif mean_type == ModelMeanType.VELOCITY:
            pred_xstart = process_xstart(
                predict_xstart_from_v(c, x, t, model_output),
            )
        else:  # EPSILON
            pred_xstart = process_xstart(
                predict_xstart_from_eps(c, x, t, model_output),
            )
        model_mean, _, _ = q_posterior_mean_variance(c, pred_xstart, x, t)

    return {
        "mean": model_mean,
        "variance": model_variance,
        "log_variance": model_log_variance,
        "pred_xstart": pred_xstart,
    }


def condition_mean(c, grad_fn, out, x, t):
    """Sohl-Dickstein conditioning: mean += variance * grad(log p(y|x))
    (reference :473-487)."""
    gradient = grad_fn(x, c.timestep_map[t])
    return out["mean"] + out["variance"] * gradient


def condition_score(c, grad_fn, out, x, t):
    """Song et al. score conditioning (reference :489-510)."""
    alpha_bar = extract(c.alphas_cumprod, t, x.ndim)
    eps = predict_eps_from_xstart(c, x, t, out["pred_xstart"])
    eps = eps - jnp.sqrt(1.0 - alpha_bar) * grad_fn(x, c.timestep_map[t])
    pred_xstart = predict_xstart_from_eps(c, x, t, eps)
    mean, _, _ = q_posterior_mean_variance(c, pred_xstart, x, t)
    return {**out, "pred_xstart": pred_xstart, "mean": mean}


def p_sample_step(
    c, model_fn, x, t, rng, mean_type, var_type,
    clip_denoised=True, cond_grad_fn=None, **kw,
):
    """One ancestral step (reference p_sample :512-556)."""
    out = p_mean_variance(
        c, model_fn, x, t, mean_type, var_type, clip_denoised=clip_denoised, **kw,
    )
    if cond_grad_fn is not None:
        out["mean"] = condition_mean(c, cond_grad_fn, out, x, t)
    noise = normal_like(rng, x.shape, x.dtype)
    nonzero = (t != 0).astype(x.dtype).reshape(-1, *((1,) * (x.ndim - 1)))
    sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
    return sample, out["pred_xstart"]


def ddim_sample_step(
    c, model_fn, x, t, rng, mean_type, var_type,
    clip_denoised=True, cond_grad_fn=None, eta=0.0, **kw,
):
    """One DDIM step, eq. 12 (reference :654-702)."""
    out = p_mean_variance(
        c, model_fn, x, t, mean_type, var_type, clip_denoised=clip_denoised, **kw,
    )
    if cond_grad_fn is not None:
        out = condition_score(c, cond_grad_fn, out, x, t)
    eps = predict_eps_from_xstart(c, x, t, out["pred_xstart"])
    alpha_bar = extract(c.alphas_cumprod, t, x.ndim)
    alpha_bar_prev = extract(c.alphas_cumprod_prev, t, x.ndim)
    sigma = (
        eta
        * jnp.sqrt((1.0 - alpha_bar_prev) / (1.0 - alpha_bar))
        * jnp.sqrt(1.0 - alpha_bar / alpha_bar_prev)
    )
    noise = normal_like(rng, x.shape, x.dtype)
    mean_pred = (
        out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
        + jnp.sqrt(jnp.maximum(1.0 - alpha_bar_prev - sigma**2, 0.0)) * eps
    )
    nonzero = (t != 0).astype(x.dtype).reshape(-1, *((1,) * (x.ndim - 1)))
    sample = mean_pred + nonzero * sigma * noise
    return sample, out["pred_xstart"]


def ddim_reverse_step(c, model_fn, x, t, mean_type, var_type, clip_denoised=True, **kw):
    """Deterministic DDIM reverse-ODE step x_t -> x_{t+1} (reference :704-760),
    used for encoding data into latents."""
    out = p_mean_variance(
        c, model_fn, x, t, mean_type, var_type, clip_denoised=clip_denoised, **kw,
    )
    eps = predict_eps_from_xstart(c, x, t, out["pred_xstart"])
    alpha_bar_next = extract(c.alphas_cumprod_next, t, x.ndim)
    sample = (
        out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
        + jnp.sqrt(1.0 - alpha_bar_next) * eps
    )
    return sample, out["pred_xstart"]


def encode_loop(
    c: GaussianCoefficients,
    model_fn: Callable,
    x0: jnp.ndarray,
    mean_type: ModelMeanType,
    var_type: ModelVarType,
    clip_denoised: bool = False,
):
    """Deterministic DDIM reverse-ODE encoding x_0 -> x_T as one
    ``lax.scan`` over t = 0 .. T-1 (the loop the reference implied around
    ddim_reverse_sample :704-760 but never provided)."""

    def body(x, t):
        tt = jnp.full((x0.shape[0],), t, jnp.int32)
        x, _ = ddim_reverse_step(
            c, model_fn, x, tt, mean_type, var_type, clip_denoised=clip_denoised,
        )
        return x, None

    x_T, _ = jax.lax.scan(body, x0, jnp.arange(c.num_timesteps))
    return x_T


def sample_loop(
    c: GaussianCoefficients,
    model_fn: Callable,
    shape: tuple,
    rng: jax.Array,
    mean_type: ModelMeanType,
    var_type: ModelVarType,
    sampler: str = "ddpm",
    eta: float = 0.0,
    clip_denoised: bool = True,
    cond_grad_fn: Optional[Callable] = None,
    x_T: Optional[jnp.ndarray] = None,
    progressive: bool = False,
    t_checkpoints=None,
    thresholding_percentile: float = 0.9,
):
    """Full sampling loop as one ``lax.scan`` over t = T-1..0 (replaces the
    reference's Python loops :558-652/762-824). ``progressive=True`` also
    returns every intermediate x_t (reference *_progressive variants);
    ``t_checkpoints`` (a list of ORIGINAL-process timesteps) instead fills a
    strided [K, *shape] frame buffer like the reference's reverse_process
    intermediate buffer (gaussian_diffusion.py:1041-1048, 1091-1097) without
    materialising all T frames. Checkpoints compare against
    ``timestep_map[t]`` so they hit under respacing too.

    ``rng`` may be a batched [B] typed key array (see sampling_rng): the
    step-t noise then comes from ``fold_in(row_key, t)`` per row, making
    every sample's trajectory independent of its co-batched neighbours —
    the contract the serving micro-batcher relies on.

    ``sampler``: 'ddpm' (ancestral), 'ddim' (Song et al., eq. 12; eta>0
    adds noise), or 'dpm++' (DPM-Solver++(2M), Lu et al. arXiv:2211.01095
    — 2nd-order multistep ODE solver in data-prediction form; its
    first-order step is exactly DDIM eta=0, so it composes with the same
    clipping/thresholding/guidance machinery and reaches DDIM-50 quality
    in ~10-20 model evaluations; deterministic, eta ignored)."""
    if sampler not in ("ddpm", "ddim") and not is_solver(sampler):
        raise ValueError(
            f"unknown sampler {sampler!r}; expected 'ddpm', 'ddim' or a "
            f"registered ODE solver ({', '.join(solver_names())})",
        )
    per_row = is_per_sample_keys(rng)
    if per_row:
        scan_rng = rng
        # tag T (never a body step, which use 0..T-1) marks the x_T draw
        x = (
            normal_like(keys_at_step(rng, c.num_timesteps), shape)
            if x_T is None
            else x_T
        )
    else:
        init_rng, scan_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, shape) if x_T is None else x_T
    step = p_sample_step if sampler == "ddpm" else ddim_sample_step
    kw = {"eta": eta} if sampler == "ddim" else {}
    kw["thresholding_percentile"] = thresholding_percentile

    if t_checkpoints is not None and len(t_checkpoints) == 0:
        t_checkpoints = None  # empty sequence == no checkpoint buffer
    if t_checkpoints is not None and progressive:
        raise ValueError(
            "progressive=True and t_checkpoints are mutually exclusive: "
            "progressive returns every frame; t_checkpoints a strided "
            "buffer. Pass one or the other.",
        )
    t_ckpt = None
    buf = None
    if t_checkpoints is not None:
        # snap each checkpoint to the nearest timestep the (possibly
        # respaced) trajectory actually visits — a misaligned value would
        # otherwise never match and silently return a zero frame. jnp ops
        # so timestep_map may be a tracer (reverse_process under outer jit)
        tc = jnp.asarray(np.asarray(t_checkpoints), jnp.int32)
        t_ckpt = c.timestep_map[
            jnp.abs(c.timestep_map[None, :] - tc[:, None]).argmin(axis=1)
        ].astype(jnp.int32)
        buf = jnp.zeros((t_ckpt.shape[0], *shape), x.dtype)

    if is_solver(sampler):
        # ODE/SDE solver from the plug-in registry (diffusion/solvers.py):
        # per-step scalar tables precomputed over the (possibly respaced)
        # grid at trace time (jnp, so they stay valid — and constant-folded
        # — under an outer jit), one generic lax.scan here: the body is one
        # model evaluation plus the solver's pure MXU/VPU update. New
        # solvers register there; this loop never changes. Stochastic
        # programs (prog.stochastic, a static flag) get a fresh
        # standard-normal draw per step through the same RNG contract as
        # the ancestral loop: per-row typed keys fold in the ORIGINAL
        # timestep tag, so each sample's trajectory stays independent of
        # its co-batched neighbours (the serving micro-batcher contract).
        prog = build_solver(sampler, c.alphas_cumprod)

        def solver_body(carry, s):
            x, mem, key, buf = carry
            tt = jnp.full((shape[0],), s["i"], jnp.int32)
            out = p_mean_variance(
                c, model_fn, x, tt, mean_type, var_type,
                clip_denoised=clip_denoised,
                thresholding_percentile=thresholding_percentile,
            )
            if cond_grad_fn is not None:
                out = condition_score(c, cond_grad_fn, out, x, tt)
            if prog.stochastic:
                if per_row:
                    noise = normal_like(
                        keys_at_step(key, c.timestep_map[s["i"]]), shape,
                    ).astype(x.dtype)
                else:
                    key, sub = jax.random.split(key)
                    noise = jax.random.normal(sub, shape, x.dtype)
            else:
                noise = jnp.zeros((), x.dtype)  # ignored by the program
            x, mem = prog.step(x, out["pred_xstart"], s, mem, noise)
            if buf is not None:
                hits = (t_ckpt == c.timestep_map[s["i"]]).reshape(
                    -1, *((1,) * x.ndim),
                )
                buf = jnp.where(hits, x[None], buf)
            return (x, mem, key, buf), (x if progressive else None)

        (x, _, _, buf), frames = jax.lax.scan(
            solver_body, (x, prog.init_mem(x), scan_rng, buf), prog.xs,
        )
        if t_checkpoints is not None:
            return x, buf
        return (x, frames) if progressive else x

    def body(carry, t):
        x, key, buf = carry
        if per_row:
            sub = keys_at_step(key, t)
        else:
            key, sub = jax.random.split(key)
        tt = jnp.full((shape[0],), t, jnp.int32)
        x, pred_x0 = step(
            c, model_fn, x, tt, sub, mean_type, var_type,
            clip_denoised=clip_denoised, cond_grad_fn=cond_grad_fn, **kw,
        )
        if buf is not None:
            hits = (t_ckpt == c.timestep_map[t]).reshape(
                -1, *((1,) * x.ndim),
            )
            buf = jnp.where(hits, x[None], buf)
        return (x, key, buf), (x if progressive else None)

    steps = jnp.arange(c.num_timesteps - 1, -1, -1)
    (x, _, buf), frames = jax.lax.scan(body, (x, scan_rng, buf), steps)
    if t_checkpoints is not None:
        return x, buf
    return (x, frames) if progressive else x


def inpaint_loop(
    c: GaussianCoefficients,
    model_fn: Callable,
    known: jnp.ndarray,
    mask: jnp.ndarray,
    rng: jax.Array,
    mean_type: ModelMeanType,
    var_type: ModelVarType,
    sampler: str = "ddpm",
    eta: float = 0.0,
    clip_denoised: bool = True,
    resample_steps: int = 1,
    cond_grad_fn: Optional[Callable] = None,
    thresholding_percentile: float = 0.9,
):
    """RePaint-style inpainting (Lugmayr et al., arXiv:2201.09865, Alg. 1)
    as one ``lax.scan`` over the (possibly respaced) trajectory.

    ``known`` is the reference image/volume, ``mask`` is 1 where ``known``
    must be kept and 0 where content is generated. Each step denoises the
    unknown region with the trained model while the known region is
    replaced by a fresh forward-noising ``q_sample(known, t-1)`` at the
    step's noise level; ``alphas_cumprod_prev[0] == 1`` makes the final
    projection exact (the known region of the output equals ``known``
    bit-for-bit up to masking). ``resample_steps`` > 1 re-noises the
    composite one step forward and re-denoises it U times per level —
    RePaint's resampling with jump length 1, which harmonises the
    known/generated boundary at the cost of U model evaluations per step.

    New capability: the reference has no infilling/editing surface at all —
    its samplers only start from pure noise
    (/root/reference/rho_diffusion/diffusion/gaussian_diffusion.py:558-652).

    ``rng`` follows the sample_loop contract: a scalar key (batch-wide
    noise) or a [B] typed key batch (per-row streams; serving-safe).
    """
    if sampler not in ("ddpm", "ddim"):
        raise ValueError(
            f"inpainting supports 'ddpm' or 'ddim', got {sampler!r} "
            "(multistep dpm++ has no per-step noise level to project onto)",
        )
    if int(resample_steps) < 1:
        raise ValueError(f"resample_steps must be >= 1, got {resample_steps}")
    shape = known.shape
    mask = jnp.broadcast_to(mask.astype(known.dtype), shape)
    per_row = is_per_sample_keys(rng)
    if per_row:
        x = normal_like(keys_at_step(rng, c.num_timesteps), shape)
        scan_rng = rng
    else:
        init_rng, scan_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, shape)
    x = x.astype(known.dtype)
    step = p_sample_step if sampler == "ddpm" else ddim_sample_step
    kw = {"eta": eta} if sampler == "ddim" else {}
    kw["thresholding_percentile"] = thresholding_percentile
    U = int(resample_steps)

    def body(carry, t):
        x, key = carry
        tt = jnp.full((shape[0],), t, jnp.int32)
        abar_prev = extract(c.alphas_cumprod_prev, tt, x.ndim)
        alpha_t = extract(c.alphas_cumprod, tt, x.ndim) / abar_prev
        live = (t > 0).astype(x.dtype)
        for u in range(U):  # static unroll; U is small (1-4)
            if per_row:
                # keys_at_step is generic per-row tag folding: step t, then
                # resample round u, then draw index d — three nested folds
                base = keys_at_step(keys_at_step(key, t), u)
                k_known, k_step, k_renoise = (
                    keys_at_step(base, d) for d in range(3)
                )
            else:
                key, k_known, k_step, k_renoise = jax.random.split(key, 4)
            x_unknown, _ = step(
                c, model_fn, x, tt, k_step, mean_type, var_type,
                clip_denoised=clip_denoised, cond_grad_fn=cond_grad_fn, **kw,
            )
            x_known = (
                jnp.sqrt(abar_prev) * known
                + jnp.sqrt(1.0 - abar_prev)
                * normal_like(k_known, shape, known.dtype)
            )
            x = mask * x_known + (1.0 - mask) * x_unknown
            if u < U - 1:
                # RePaint jump: x_{t-1} -> x_t through one forward step;
                # gated off at t == 0 so extra iterations there re-project
                # instead of corrupting the final output
                renoised = (
                    jnp.sqrt(alpha_t) * x
                    + jnp.sqrt(1.0 - alpha_t)
                    * normal_like(k_renoise, shape, known.dtype)
                )
                x = live * renoised + (1.0 - live) * x
        return (x, key), None

    steps = jnp.arange(c.num_timesteps - 1, -1, -1)
    (x, _), _ = jax.lax.scan(body, (x, scan_rng), steps)
    return x


# ---------------------------------------------------------------------------
# VLB / training losses (reference :826-1009)
# ---------------------------------------------------------------------------

def vb_terms_bpd(
    c, model_fn, x_start, x_t, t, mean_type, var_type, clip_denoised=False,
    thresholding_percentile=0.9,
):
    """KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)) in bits, with the t=0 term
    the discretised decoder NLL (reference _vb_terms_bpd :826-859)."""
    true_mean, _, true_log_var = q_posterior_mean_variance(c, x_start, x_t, t)
    out = p_mean_variance(
        c, model_fn, x_t, t, mean_type, var_type, clip_denoised=clip_denoised,
        thresholding_percentile=thresholding_percentile,
    )
    kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
    kl = mean_flat(kl) / jnp.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, out["mean"], 0.5 * out["log_variance"],
    )
    decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out["pred_xstart"]}


def training_losses(
    c: GaussianCoefficients,
    model_fn: Callable,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    mean_type: ModelMeanType,
    var_type: ModelVarType,
    loss_type: LossType,
    mse_weight: Optional[jnp.ndarray] = None,
) -> dict:
    """Per-sample training losses (reference :861-934). Noise is supplied by
    the caller — exactly once (fixes the reference's double-noising).
    ``mse_weight`` ([B], e.g. :func:`min_snr_weight`) scales the MSE term of
    the composed loss; ``terms['mse']`` stays unweighted for logging."""
    x_t = q_sample(c, x_start, t, noise)
    terms: dict[str, jnp.ndarray] = {}

    if loss_type.is_vb():
        terms["loss"] = vb_terms_bpd(
            c, model_fn, x_start, x_t, t, mean_type, var_type,
        )["output"]
        if loss_type == LossType.RESCALED_KL:
            terms["loss"] = terms["loss"] * c.num_timesteps
        return terms

    model_output = model_fn(x_t, c.timestep_map[t])
    if var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        C = x_t.shape[-1]
        assert model_output.shape[-1] == 2 * C
        mean_out, var_values = jnp.split(model_output, 2, axis=-1)
        # learn variance via the VLB without letting it move the mean
        frozen = jnp.concatenate(
            [jax.lax.stop_gradient(mean_out), var_values], axis=-1,
        )
        terms["vb"] = vb_terms_bpd(
            c, lambda *_args: frozen, x_start, x_t, t, mean_type, var_type,
        )["output"]
        if loss_type == LossType.RESCALED_MSE:
            terms["vb"] = terms["vb"] * (c.num_timesteps / 1000.0)
        model_output = mean_out

    if mean_type == ModelMeanType.PREVIOUS_X:
        target = q_posterior_mean_variance(c, x_start, x_t, t)[0]
    elif mean_type == ModelMeanType.START_X:
        target = x_start
    elif mean_type == ModelMeanType.VELOCITY:
        target = velocity_target(c, x_start, t, noise)
    else:
        target = noise
    terms["mse"] = mean_flat((target - model_output) ** 2)
    weighted = terms["mse"] if mse_weight is None else terms["mse"] * mse_weight
    terms["loss"] = weighted + terms["vb"] if "vb" in terms else weighted
    terms["x_t"] = x_t
    return terms


def min_snr_weight(
    alphas_cumprod: jnp.ndarray,
    t: jnp.ndarray,
    mean_type: ModelMeanType,
    gamma: float = 5.0,
) -> jnp.ndarray:
    """Per-sample min-SNR-gamma loss weight (Hang et al., arXiv:2303.09556).

    Treats the multi-task objective over timesteps as Pareto optimisation:
    clamp each timestep's effective weight at gamma so easy (high-SNR, low-t)
    steps stop dominating the gradient. Expressed for each prediction target
    so that the WEIGHTED loss equals min(SNR, gamma) * x0-space loss:

    * START_X  (x0-pred):  w = min(SNR, gamma)
    * EPSILON  (eps-pred): w = min(SNR, gamma) / SNR
    * VELOCITY (v-pred):   w = min(SNR, gamma) / (SNR + 1)

    PREVIOUS_X has no SNR-space interpretation; callers reject it. The
    reference has no loss-weighting surface at all (its training_step is an
    unweighted MSE, gaussian_diffusion.py:861-934) — this is a TPU-era
    training-quality extension, computed as an O(B) table gather that fuses
    into the loss reduction.
    """
    acp = alphas_cumprod[t]
    snr = acp / jnp.maximum(1.0 - acp, 1e-20)
    clipped = jnp.minimum(snr, gamma)
    if mean_type == ModelMeanType.START_X:
        return clipped
    if mean_type == ModelMeanType.EPSILON:
        return clipped / snr
    if mean_type == ModelMeanType.VELOCITY:
        return clipped / (snr + 1.0)
    raise ValueError(
        f"min-SNR weighting is undefined for mean_type={mean_type}; "
        "use START_X, EPSILON or VELOCITY",
    )


def validate_loss_weighting(
    loss_weighting: Optional[str],
    mean_type: ModelMeanType,
    loss_type: Optional["LossType"] = None,
) -> Optional[str]:
    """Normalise/validate a ``loss_weighting`` config value at construction
    time (fail on a bad config, not steps into a training run)."""
    if loss_weighting in (None, "", "none"):
        return None
    canonical = str(loss_weighting).lower().replace("-", "_")
    if canonical != "min_snr":
        raise ValueError(
            f"unknown loss_weighting {loss_weighting!r}; "
            "expected 'min_snr' or none",
        )
    if mean_type not in (
        ModelMeanType.START_X, ModelMeanType.EPSILON, ModelMeanType.VELOCITY,
    ):
        raise ValueError(
            f"loss_weighting='min_snr' is undefined for mean_type={mean_type}",
        )
    if loss_type is not None and loss_type.is_vb():
        # training_losses' pure-VLB branch returns before any MSE weighting
        # could apply — reject the combination instead of silently training
        # unweighted (mirrors the DDPM pipeline's non-MSE loss_func check).
        raise ValueError(
            f"loss_weighting='min_snr' only applies to MSE loss types, "
            f"not loss_type={loss_type}",
        )
    return canonical


def prior_bpd(c: GaussianCoefficients, x_start: jnp.ndarray) -> jnp.ndarray:
    """KL(q(x_T|x_0) || N(0, I)) in bits/dim (reference :936-953)."""
    t = jnp.full((x_start.shape[0],), c.num_timesteps - 1, jnp.int32)
    qt_mean, _, qt_log_var = q_mean_variance(c, x_start, t)
    kl = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
    return mean_flat(kl) / jnp.log(2.0)


def calc_bpd_loop(
    c: GaussianCoefficients,
    model_fn: Callable,
    x_start: jnp.ndarray,
    rng: jax.Array,
    mean_type: ModelMeanType,
    var_type: ModelVarType,
    clip_denoised: bool = True,
    thresholding_percentile: float = 0.9,
) -> dict:
    """Full VLB in bits/dim, T-loop as ``lax.scan`` (reference :955-1009)."""
    B = x_start.shape[0]

    def body(key, t):
        key, sub = jax.random.split(key)
        tt = jnp.full((B,), t, jnp.int32)
        noise = jax.random.normal(sub, x_start.shape, x_start.dtype)
        x_t = q_sample(c, x_start, tt, noise)
        out = vb_terms_bpd(
            c, model_fn, x_start, x_t, tt, mean_type, var_type,
            clip_denoised=clip_denoised,
            thresholding_percentile=thresholding_percentile,
        )
        eps = predict_eps_from_xstart(c, x_t, tt, out["pred_xstart"])
        return key, (
            out["output"],
            mean_flat((out["pred_xstart"] - x_start) ** 2),
            mean_flat((eps - noise) ** 2),
        )

    steps = jnp.arange(c.num_timesteps - 1, -1, -1)
    _, (vb, xstart_mse, mse) = jax.lax.scan(body, rng, steps)
    vb = vb.T  # [N, T]
    pb = prior_bpd(c, x_start)
    return {
        "total_bpd": vb.sum(axis=1) + pb,
        "prior_bpd": pb,
        "vb": vb,
        "xstart_mse": xstart_mse.T,
        "mse": mse.T,
    }


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

class GaussianDiffusionPipeline(AbstractDiffusionPipeline):
    """Config-driven pipeline wrapping the functional core
    (reference class at gaussian_diffusion.py:143)."""

    def __init__(
        self,
        backbone,
        backbone_kwargs: dict[str, Any],
        schedule: Optional[NoiseSchedule] = None,
        loss_func="MSELoss",  # accepted for API parity; LossType governs
        timesteps: Optional[int] = None,
        cond_fn=None,
        cond_fn_kwargs: Optional[dict] = None,
        optimizer=None,
        opt_kwargs: Optional[dict] = None,
        model_mean_type: ModelMeanType | str = ModelMeanType.START_X,
        model_var_type: ModelVarType | str = ModelVarType.FIXED_LARGE,
        loss_type: LossType | str = LossType.MSE,
        beta_schedule_name: Optional[str] = None,
        clip_denoised: bool = True,
        thresholding_percentile: float = 0.9,
        sampling_batch_size: int = 10,
        sample_every_n_epochs: int = 5,
        sample_parameter_space: Optional[dict] = None,
        save_checkpoint_every_n_epochs: int = 10,
        t_checkpoints=None,
        cond_dropout: float = 0.0,
        loss_weighting: Optional[str] = None,
        min_snr_gamma: float = 5.0,
        **base_kwargs,
    ) -> None:
        if schedule is None:
            # reference defaults: cosine schedule, T=1000 (:199-233)
            schedule = named_beta_schedule(
                beta_schedule_name or "cosine", timesteps or 1000,
            )
        elif beta_schedule_name:
            schedule = named_beta_schedule(beta_schedule_name, timesteps or len(schedule))
        super().__init__(
            backbone=backbone,
            backbone_kwargs=backbone_kwargs,
            schedule=schedule,
            loss_func=loss_func,
            timesteps=timesteps,
            cond_fn=cond_fn,
            cond_fn_kwargs=cond_fn_kwargs,
            optimizer=optimizer,
            opt_kwargs=opt_kwargs,
            **base_kwargs,
        )
        as_enum = lambda e, v: e(v) if isinstance(v, str) else v
        self.model_mean_type = as_enum(ModelMeanType, model_mean_type)
        self.model_var_type = as_enum(ModelVarType, model_var_type)
        self.loss_type = as_enum(LossType, loss_type)
        self.coeffs = coefficients_from_schedule(schedule)
        self._zero_terminal_snr = float(self.coeffs.alphas_cumprod[-1]) == 0.0
        if self._zero_terminal_snr and self.model_mean_type == ModelMeanType.EPSILON:
            raise ValueError(
                "zero-terminal-SNR schedule (alpha_bar_T == 0) with "
                "epsilon-prediction: x0 is unrecoverable from eps at the "
                "terminal step (arXiv:2305.08891). Use "
                "model_mean_type='v_prediction' (or 'x_start') with "
                "rescale_betas_zero_snr.",
            )
        self.clip_denoised = clip_denoised
        self.thresholding_percentile = thresholding_percentile
        self.sampling_batch_size = sampling_batch_size
        self.sample_every_n_epochs = sample_every_n_epochs
        self.sample_parameter_space = sample_parameter_space
        self.save_weights_every_n_epochs = save_checkpoint_every_n_epochs
        self.t_checkpoints = t_checkpoints
        self.cond_dropout = self.validate_cond_dropout(cond_dropout)
        self.loss_weighting = validate_loss_weighting(
            loss_weighting, self.model_mean_type, self.loss_type,
        )
        if self.loss_weighting and self._zero_terminal_snr:
            # SNR(T-1) = 0 makes the VELOCITY weight min(snr,g)/(snr+1) = 0:
            # the terminal step — the step the zero-SNR rescale exists to
            # train (arXiv:2305.08891) — would receive no gradient
            raise ValueError(
                "loss_weighting='min_snr' gives the zero-SNR terminal step "
                "weight 0, silently un-training the step "
                "rescale_betas_zero_snr exists to fix; drop min_snr or the "
                "zero-terminal-SNR rescale",
            )
        self.min_snr_gamma = float(min_snr_gamma)

    def _model_fn(
        self,
        params,
        conditions,
        train: bool = False,
        cond_mask=None,
        guidance_scale: Optional[float] = None,
    ) -> Callable:
        """Close params/conditioning over a ``fn(x, t)`` the samplers call.

        ``guidance_scale`` s != 1 builds the classifier-free-guided model
        (Ho & Salimans, arXiv:2207.12598): out = uncond + s*(cond - uncond),
        evaluated as ONE batched forward over [x; x] with a per-row
        conditioning mask — a single 2B launch keeps the MXU batched instead
        of two half-sized dispatches. Requires a backbone trained with
        ``cond_dropout`` > 0 (the mask-0 rows are the null condition).
        For LEARNED/LEARNED_RANGE variances only the mean-prediction half is
        guided; the variance half comes from the conditional pass
        (guided-diffusion convention).
        """
        if (
            guidance_scale is None
            or float(guidance_scale) == 1.0
            or conditions is None
        ):
            def fn(x, t):
                return self.apply(
                    params, x, t, conditions, train, cond_mask=cond_mask,
                ).astype(x.dtype)

            return fn

        return self.guided_model_fn(params, conditions, guidance_scale, train)

    # -- training ------------------------------------------------------
    def forward_process(self, rng, data, t=None):
        t_rng, n_rng = jax.random.split(rng)
        if t is None:
            t = self.random_timesteps(t_rng, data.shape[0])
        noise = jax.random.normal(n_rng, data.shape, data.dtype)
        return q_sample(self.coeffs, data, t, noise), noise, t

    def loss_and_metrics(self, params, batch, rng):
        """Noise-once training step (reference training_step :1153-1210
        double-noised; fixed here)."""
        batch = normalize_batch(batch)
        data, labels = batch["data"], batch["labels"]
        t_rng, n_rng, m_rng = jax.random.split(rng, 3)
        t = self.random_timesteps(t_rng, data.shape[0])
        noise = jax.random.normal(n_rng, data.shape, data.dtype)
        # classifier-free guidance training: drop each row's conditioning
        # with prob p so the one network also learns the null condition
        cond_mask = self.cond_dropout_mask(m_rng, data.shape[0], labels)
        mse_weight = None
        if self.loss_weighting == "min_snr":
            mse_weight = min_snr_weight(
                self.coeffs.alphas_cumprod, t,
                self.model_mean_type, self.min_snr_gamma,
            )
        terms = training_losses(
            self.coeffs,
            self._model_fn(params, labels, train=True, cond_mask=cond_mask),
            data,
            t,
            noise,
            self.model_mean_type,
            self.model_var_type,
            self.loss_type,
            mse_weight=mse_weight,
        )
        loss = jnp.mean(terms["loss"])
        metrics = self.training_metrics(data, terms.get("x_t", data), loss)
        if "vb" in terms:
            metrics["vb"] = jnp.mean(terms["vb"])
        if "mse" in terms:
            metrics["mse"] = jnp.mean(terms["mse"])
        return loss, metrics

    # -- sampling ------------------------------------------------------
    def reverse_process(
        self,
        params,
        rng,
        shape,
        conditions=None,
        sampler: str = "ddim",
        eta: float = 0.0,
        num_steps: Optional[int] = None,
        x_T=None,
        progressive: bool = False,
        cond_grad_fn=None,
        use_ema_params=None,
        t_checkpoints=None,
        guidance_scale: Optional[float] = None,
        spacing: Optional[str] = None,
    ):
        """DDIM (default, like the reference's reverse_process :1029-1099) or
        ancestral sampling, optionally respaced to ``num_steps`` steps.
        ``t_checkpoints`` (here or at construction) returns
        ``(final, frames[K])`` — the reference's intermediate-frame buffer.
        ``guidance_scale`` != 1 applies classifier-free guidance (needs a
        model trained with ``cond_dropout`` > 0). ``spacing`` overrides the
        respacing grid (default: uniform log-SNR for dpm++, trailing for
        zero-terminal-SNR schedules, uniform-t otherwise; pass 'trailing'
        when sampling a distilled student, 'karras' for the rho=7 sigma
        grid)."""
        coeffs = self.coeffs
        zero_snr = getattr(self, "_zero_terminal_snr", False)
        if zero_snr and is_solver(sampler):
            raise ValueError(
                f"the '{sampler}' ODE solver operates in log-SNR (lambda) "
                "space, which is -inf at the zero-SNR terminal step; sample "
                "zero-terminal-SNR schedules with 'ddim' or 'ddpm' instead.",
            )
        if zero_snr and cond_grad_fn is not None and sampler == "ddim":
            # only the DDIM path (condition_score) inverts eps -> x0; the
            # 'ddpm' path's condition_mean (mean += variance*grad) stays
            # finite at alpha_bar = 0 and remains a valid combination
            raise ValueError(
                "classifier guidance with sampler='ddim' inverts eps -> x0 "
                "(condition_score), which is undefined at the zero-SNR "
                "terminal step; use sampler='ddpm' (condition_mean) or "
                "classifier-free guidance (guidance_scale) instead.",
            )
        if num_steps and num_steps < coeffs.num_timesteps:
            coeffs = respace(
                coeffs,
                num_steps,
                # zero-terminal-SNR sampling must anchor the respaced grid
                # at t = T-1 (alpha_bar == 0) or x_T = pure noise is fed to
                # a step whose schedule entry still has signal — exactly
                # the mismatch the rescale exists to fix (arXiv:2305.08891
                # §3.2 prescribes trailing spacing)
                spacing=spacing or (
                    "trailing" if zero_snr
                    else "uniform-lambda"
                    if is_solver(sampler)
                    else "uniform-t"
                ),
            )
        p = use_ema_params if use_ema_params is not None else params
        if t_checkpoints is None and not progressive:
            # construction-time default; progressive=True already returns
            # every frame, so the buffer would only conflict with it
            t_checkpoints = self.t_checkpoints
        return sample_loop(
            coeffs,
            self._model_fn(p, conditions, guidance_scale=guidance_scale),
            shape,
            rng,
            self.model_mean_type,
            self.model_var_type,
            sampler=sampler,
            eta=eta,
            clip_denoised=self.clip_denoised,
            cond_grad_fn=cond_grad_fn,
            x_T=x_T,
            progressive=progressive,
            t_checkpoints=t_checkpoints,
            thresholding_percentile=self.thresholding_percentile,
        )

    def inpaint(
        self,
        params,
        rng,
        known,
        mask,
        conditions=None,
        sampler: str = "ddpm",
        eta: float = 0.0,
        num_steps: Optional[int] = None,
        resample_steps: int = 1,
        guidance_scale: Optional[float] = None,
        use_ema_params=None,
    ):
        """Regenerate the ``mask == 0`` region of ``known`` (RePaint,
        arXiv:2201.09865) with all the pipeline's conditioning machinery —
        class/hash conditions, classifier-free guidance, respacing.
        ``mask`` broadcasts to ``known``'s shape (1 = keep, 0 = fill).

        The reference framework has no editing/infilling capability; this
        reuses the same jit-compiled scan machinery as sampling, so the
        whole inpainting trajectory is one XLA program."""
        coeffs = self.coeffs
        if num_steps and num_steps < coeffs.num_timesteps:
            coeffs = respace(
                coeffs,
                num_steps,
                # same anchoring rule as reverse_process: zero-terminal-SNR
                # grids must include t = T-1
                spacing="trailing"
                if getattr(self, "_zero_terminal_snr", False)
                else "uniform-t",
            )
        p = use_ema_params if use_ema_params is not None else params
        return inpaint_loop(
            coeffs,
            self._model_fn(p, conditions, guidance_scale=guidance_scale),
            known,
            mask,
            rng,
            self.model_mean_type,
            self.model_var_type,
            sampler=sampler,
            eta=eta,
            clip_denoised=self.clip_denoised,
            resample_steps=resample_steps,
            thresholding_percentile=self.thresholding_percentile,
        )

    def generate(
        self,
        params,
        rng=None,
        batch_size: Optional[int] = None,
        parameter_space: Optional[dict] = None,
        conditions=None,
        random: bool = False,
        as_hash_embeddings: bool = False,
        sampler: str = "ddim",
        num_steps: Optional[int] = None,
        eta: float = 0.0,
        guidance_scale: Optional[float] = None,
        spacing: Optional[str] = None,
    ):
        """Deterministic eval-grid generation (reference generate :1102-1146
        draws sequential parameter-space rows, random=False)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        batch_size = batch_size or self.sampling_batch_size
        shape = self.sample_shape(batch_size)
        space = parameter_space or self.sample_parameter_space
        if conditions is None and space is not None:
            conditions = self.conditions_from_parameter_space(
                space, batch_size, random=random,
                as_hash_embeddings=as_hash_embeddings,
                embedding_dim=self.condition_embedding_dim(),
            )
        else:
            # split so the condition draw ('auto') and the sampler noise
            # never consume the same key (classic JAX key-reuse)
            rng, cond_rng = jax.random.split(rng)
            conditions = self.coerce_conditions(conditions, batch_size, cond_rng)
        # jitted-sampler cache keyed by static sampling options — including
        # the trace-time conv-quant mode, or toggling set_conv_quant between
        # generate() calls would silently reuse a trace from the old mode
        from rho_diffusion_tpu.ops.quant import get_conv_quant

        key = (
            "gauss", shape, conditions is not None, sampler, num_steps, eta,
            guidance_scale, get_conv_quant(), spacing,
        )
        if key not in self._sampler_cache:
            self._sampler_cache[key] = jax.jit(
                lambda p, r, c: self.reverse_process(
                    p, r, shape, c, sampler=sampler, num_steps=num_steps, eta=eta,
                    guidance_scale=guidance_scale, spacing=spacing,
                    t_checkpoints=(),  # final samples only, never the buffer
                ),
            )
        return self._sampler_cache[key](params, rng, conditions)

    def encode(self, params, data, conditions=None, num_steps: Optional[int] = None):
        """Deterministically encode data into DDIM latents (reverse ODE)."""
        coeffs = self.coeffs
        if num_steps and num_steps < coeffs.num_timesteps:
            coeffs = respace(coeffs, num_steps)
        return encode_loop(
            coeffs,
            self._model_fn(params, conditions),
            data,
            self.model_mean_type,
            self.model_var_type,
        )

    def calc_bpd(self, params, data, rng, conditions=None, clip_denoised=True):
        """Bits-per-dim evaluation (reference calc_bpd_loop :955-1009)."""
        return calc_bpd_loop(
            self.coeffs,
            self._model_fn(params, conditions),
            data,
            rng,
            self.model_mean_type,
            self.model_var_type,
            clip_denoised=clip_denoised,
            thresholding_percentile=self.thresholding_percentile,
        )
