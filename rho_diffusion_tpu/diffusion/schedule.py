"""Noise schedules as immutable coefficient tables.

The reference models a schedule as a stateful object with tensor properties
(/root/reference/rho_diffusion/diffusion/schedule.py:34-138). TPU-natively a
schedule is pure data: a frozen pytree of precomputed ``jnp`` arrays that jit
closes over (XLA constant-folds the slicing). Construction happens on the
host in float64 to avoid rounding error (matching the reference's fp64
context, schedule.py:126-131/152-168), then tables are stored in float32.

Reproduces the reference numerics exactly:

* ``LinearSchedule`` (schedule.py:141-168): scale = 1000/T;
  beta = linspace(scale*beta_1, scale*beta_T, T);  alpha = 1-beta;
  alpha_bar = cumprod(alpha);
  sigma = sqrt((1-offset_alpha_bar)/(1-alpha_bar) * beta)  with sigma_0 = 0.
* ``CosineBetaSchedule`` (schedule.py:171-214): Nichol & Dhariwal cos^2
  normalised by f(0), alpha_bar clamped to [0,1], beta clipped to
  [1e-4, 0.9999].
* ``SigmoidSchedule``: NotImplementedError in the reference
  (schedule.py:217-221); implemented here for real (Jabri et al. style
  sigmoid interpolation of alpha_bar).

Also provides the named-beta schedules used by the GaussianDiffusion pipeline
("linear", "cosine"/"squaredcos_cap_v2"; reference gaussian_diffusion.py:45-89).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct

from rho_diffusion_tpu.registry import registry

__all__ = [
    "NoiseSchedule",
    "LinearSchedule",
    "CosineBetaSchedule",
    "SigmoidSchedule",
    "named_beta_schedule",
    "rescale_zero_terminal_snr",
    "schedule_from_betas",
]


@struct.dataclass
class NoiseSchedule:
    """Frozen pytree of DDPM coefficient tables, all shape [T], float32.

    Attribute names match the reference's property protocol
    (schedule.py:34-138) so downstream math reads identically.
    """

    beta_t: jnp.ndarray
    alpha_t: jnp.ndarray
    alpha_bar_t: jnp.ndarray
    sigma_t: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return int(self.beta_t.shape[0])

    def __len__(self) -> int:
        return self.num_steps

    @property
    def offset_alpha_bar_t(self) -> jnp.ndarray:
        """alpha_bar shifted right by one, padded with a leading 1.0
        (i.e. alpha_bar_{t-1}; reference schedule.py:80-86)."""
        return jnp.concatenate(
            [jnp.ones((1,), self.alpha_bar_t.dtype), self.alpha_bar_t[:-1]],
        )

    # Convenience tables used by forward/reverse math. Computed lazily from
    # the canonical four so the pytree stays minimal; XLA folds these.
    @property
    def sqrt_alpha_bar_t(self) -> jnp.ndarray:
        return jnp.sqrt(self.alpha_bar_t)

    @property
    def sqrt_one_minus_alpha_bar_t(self) -> jnp.ndarray:
        return jnp.sqrt(1.0 - self.alpha_bar_t)

    def __getitem__(self, key: str) -> jnp.ndarray:
        return getattr(self, key)

    def state(self, index: int) -> dict[str, jnp.ndarray]:
        """All coefficients sliced at a timestep (reference schedule.py:96-103)."""
        return {
            k: getattr(self, k)[index]
            for k in ("alpha_t", "beta_t", "alpha_bar_t", "sigma_t")
        }


def schedule_from_betas(beta: np.ndarray) -> NoiseSchedule:
    """Build the full coefficient table from a float64 beta array.

    Validates beta in (0, 1): the reference's 1000/T scaling silently makes
    betas > 1 for small T (e.g. LinearSchedule(10) -> beta_T = 2.0), which
    turns alpha negative and every sqrt NaN. We fail loudly instead.
    """
    beta = np.asarray(beta, dtype=np.float64)
    # beta == 1 is legal ONLY at the terminal step (alpha_bar_T == 0, the
    # zero-terminal-SNR convention of rescale_zero_terminal_snr); anywhere
    # earlier it would zero every later alpha_bar and break the posterior.
    interior_ok = ((beta[:-1] > 0.0) & (beta[:-1] < 1.0)).all()
    if not (interior_ok and 0.0 < beta[-1] <= 1.0):
        raise ValueError(
            f"betas must lie in (0, 1) (terminal beta may be exactly 1 for "
            f"zero-terminal-SNR schedules); got range [{beta.min():.4g}, "
            f"{beta.max():.4g}]. With the reference's 1000/T scaling, small "
            f"num_steps needs proportionally smaller beta_1/beta_T.",
        )
    alpha = 1.0 - beta
    alpha_bar = np.cumprod(alpha)
    offset_alpha_bar = np.concatenate([[1.0], alpha_bar[:-1]])
    sigma = np.sqrt((1.0 - offset_alpha_bar) / (1.0 - alpha_bar) * beta)
    f32 = lambda a: jnp.asarray(a.astype(np.float32))
    return NoiseSchedule(
        beta_t=f32(beta),
        alpha_t=f32(alpha),
        alpha_bar_t=f32(alpha_bar),
        sigma_t=f32(sigma),
    )


@registry.register_schedule("LinearSchedule")
def LinearSchedule(
    num_steps: int,
    beta_1: float = 1.0e-3,
    beta_T: float = 0.02,
    device=None,  # accepted for reference-config compatibility; unused
    zero_terminal_snr: bool = False,
) -> NoiseSchedule:
    """Linear beta schedule, scaled by 1000/T (reference schedule.py:141-168).

    ``zero_terminal_snr=True`` applies the Lin et al. (arXiv:2305.08891)
    rescale so alpha_bar_T == 0 exactly — config-expressible for workloads
    whose mean is far from 0 (e.g. DeepGalaxy's near-black frames), where
    the truncated-SNR + epsilon combination mis-tracks the DC component at
    sampling time. Pair with a v-prediction pipeline."""
    del device
    scale = 1000.0 / num_steps
    beta = np.linspace(scale * beta_1, scale * beta_T, num_steps, dtype=np.float64)
    if zero_terminal_snr:
        beta = rescale_zero_terminal_snr(beta)
    return schedule_from_betas(beta)


@registry.register_schedule("CosineBetaSchedule")
def CosineBetaSchedule(
    num_steps: int,
    offset: float = 0.008,
    device=None,
    exact_reference: bool = False,
) -> NoiseSchedule:
    """Nichol & Dhariwal (2021) cosine schedule (reference schedule.py:171-214).

    Deviation, on purpose: the reference builds a (T+1)-long table whose
    leading entry is a degenerate beta_0 = clip(1 - abar_0/1) = 1e-4
    (an off-by-one — schedule.py:185-206). We use the standard formulation
    beta_i = 1 - f(i+1)/f(i) over exactly ``num_steps`` entries, clipped to
    [1e-4, 0.9999] like the reference.

    ``exact_reference=True`` reproduces the reference's table verbatim
    (first ``num_steps`` of its T+1 entries, INCLUDING the degenerate
    beta_0) so torch checkpoints trained under the reference's cosine
    schedule denoise here under numerically identical coefficients —
    use it with ``interop.load_torch_checkpoint`` migrations.
    """
    del device
    t = np.linspace(0.0, num_steps, num_steps + 1, dtype=np.float64) / num_steps
    alpha_bar = np.cos((t + offset) / (1.0 + offset) * math.pi * 0.5) ** 2
    alpha_bar = np.clip(alpha_bar / alpha_bar[0], 0.0, 1.0)
    if exact_reference:
        # reference schedule.py:190-214 verbatim: T+1-long tables where
        # beta_i = clip(1 - abar_i/abar_{i-1}) with abar_{-1} := 1 (leading
        # degenerate beta_0 = 1e-4), alpha = 1-beta, and alpha_bar stays the
        # RAW cos^2 table (NOT a cumprod of the clipped alphas); pipelines
        # index t in [0, T) so we truncate to num_steps entries.
        prev = np.concatenate([[1.0], alpha_bar[:-1]])
        beta = np.clip(1.0 - alpha_bar / prev, 0.0001, 0.9999)
        with np.errstate(divide="ignore", invalid="ignore"):
            sigma = np.sqrt((1.0 - prev) / (1.0 - alpha_bar) * beta)
        sigma = np.nan_to_num(sigma)  # reference sigma_0 is 0/0; unused at t=0
        f32 = lambda a: jnp.asarray(a[:num_steps].astype(np.float32))
        return NoiseSchedule(
            beta_t=f32(beta),
            alpha_t=f32(1.0 - beta),
            alpha_bar_t=f32(alpha_bar),
            sigma_t=f32(sigma),
        )
    beta = 1.0 - alpha_bar[1:] / np.maximum(alpha_bar[:-1], 1e-12)
    beta = np.clip(beta, 0.0001, 0.9999)
    return schedule_from_betas(beta)


@registry.register_schedule("SigmoidSchedule")
def SigmoidSchedule(
    num_steps: int,
    start: float = -3.0,
    end: float = 3.0,
    tau: float = 1.0,
    device=None,
) -> NoiseSchedule:
    """Sigmoid noise schedule (Jabri et al. 2022, arXiv:2212.11972).

    The reference declares this schedule but raises NotImplementedError
    (schedule.py:217-221); implemented here: alpha_bar interpolates a
    sigmoid in t, normalised to [~0, 1], betas derived from successive
    ratios and clipped like the cosine schedule.
    """
    del device

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    t = np.linspace(0.0, 1.0, num_steps + 1, dtype=np.float64)
    v_start, v_end = sig(start / tau), sig(end / tau)
    alpha_bar = (-sig((t * (end - start) + start) / tau) + v_end) / (v_end - v_start)
    alpha_bar = np.clip(alpha_bar / alpha_bar[0], 0.0, 1.0)
    beta = 1.0 - alpha_bar[1:] / np.maximum(alpha_bar[:-1], 1e-12)
    beta = np.clip(beta, 0.0001, 0.9999)
    return schedule_from_betas(beta)


def rescale_zero_terminal_snr(beta: np.ndarray) -> np.ndarray:
    """Rescale betas so the terminal SNR is exactly zero (Lin et al.,
    arXiv:2305.08891 Alg. 1 — the fix for the "diffusion never actually
    reaches pure noise" flaw; the HF surface the reference's diffusers
    pipeline could reach exposes it as DDPMScheduler(rescale_betas_zero_snr)).

    Operates on sqrt(alpha_bar) in float64: shift so the terminal value is 0,
    rescale so the first value is preserved, then recover betas from the
    consecutive alpha_bar ratios. The returned terminal beta is exactly 1
    (alpha_bar_T == 0), which epsilon-prediction cannot sample from —
    pair this with v-prediction (or x0-prediction), as the paper prescribes.
    """
    beta = np.asarray(beta, dtype=np.float64)
    s = np.sqrt(np.cumprod(1.0 - beta))  # sqrt(alpha_bar), decreasing
    s0, sT = s[0], s[-1]
    s = (s - sT) * s0 / (s0 - sT)
    abar = s**2
    alpha = abar / np.concatenate([[1.0], abar[:-1]])
    return 1.0 - alpha


def named_beta_schedule(
    name: str,
    num_steps: int,
    beta_start: float | None = None,
    beta_end: float | None = None,
    zero_terminal_snr: bool = False,
) -> NoiseSchedule:
    """Named beta schedules used by the GaussianDiffusion pipeline
    (reference gaussian_diffusion.py:45-89) plus the HF DDPMScheduler
    surface the reference's diffusers pipeline could reach
    (reference diffusers.py:148-216 accepted any SchedulerMixin config).

    * "linear": Ho et al. betas [0.0001, 0.02] * 1000/T (or explicit
      beta_start/beta_end, HF semantics — no 1000/T rescale then).
    * "scaled_linear": HF latent-diffusion style — linspace in sqrt(beta).
    * "cosine" / "squaredcos_cap_v2": betas_for_alpha_bar with
      cos^2 alpha_bar and max beta 0.999.
    * "sigmoid": HF sigmoid betas over [beta_start, beta_end].
    """
    if (beta_start is None) != (beta_end is None):
        # Half-specified endpoints would mix conventions: the 1000/T
        # guided-diffusion rescale applies only when BOTH are defaulted,
        # so the missing endpoint would silently fall back to the
        # UN-rescaled HF value — a schedule matching neither convention.
        raise ValueError(
            "pass both beta_start and beta_end (HF semantics) or neither "
            f"(guided-diffusion defaults); got beta_start={beta_start}, "
            f"beta_end={beta_end}",
        )

    def _finish(beta: np.ndarray) -> NoiseSchedule:
        if zero_terminal_snr:
            beta = rescale_zero_terminal_snr(beta)
        return schedule_from_betas(beta)

    if name == "linear":
        if beta_start is None and beta_end is None:
            scale = 1000.0 / num_steps
            beta_start, beta_end = scale * 0.0001, scale * 0.02
        beta = np.linspace(beta_start, beta_end, num_steps, dtype=np.float64)
        return _finish(beta)
    if name == "scaled_linear":
        beta = np.linspace(
            math.sqrt(beta_start if beta_start is not None else 0.0001),
            math.sqrt(beta_end if beta_end is not None else 0.02),
            num_steps, dtype=np.float64,
        ) ** 2
        return _finish(beta)
    if name == "sigmoid":
        bs = beta_start if beta_start is not None else 0.0001
        be = beta_end if beta_end is not None else 0.02
        x = np.linspace(-6.0, 6.0, num_steps, dtype=np.float64)
        beta = 1.0 / (1.0 + np.exp(-x)) * (be - bs) + bs
        return _finish(beta)
    if name in ("cosine", "squaredcos_cap_v2"):
        def alpha_bar_fn(s):
            return math.cos((s + 0.008) / 1.008 * math.pi / 2) ** 2

        beta = np.array(
            [
                min(
                    1.0 - alpha_bar_fn((i + 1) / num_steps) / alpha_bar_fn(i / num_steps),
                    0.999,
                )
                for i in range(num_steps)
            ],
            dtype=np.float64,
        )
        return _finish(beta)
    raise ValueError(f"Unknown named beta schedule '{name}'")
