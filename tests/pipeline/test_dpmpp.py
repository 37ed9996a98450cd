"""DPM-Solver++(2M) sampler (diffusion/gaussian.py sample_loop).

The reference has no fast ODE solver beyond DDIM (its reverse_process
loops all T steps, gaussian_diffusion.py:1029-1099); DPM-Solver++ is a
capability addition motivated by serving latency ("full-sample
wall-clock" is a BASELINE.md metric of record).

Correctness is checked against the analytically-solvable Gaussian case:
for data x0 ~ N(mu, gamma^2 I) the exact posterior mean E[x0|x_t] is
linear in x_t and the probability-flow ODE has the closed-form solution
    x*(0) = mu + gamma * (x_T - a_T mu) / sqrt(a_T^2 gamma^2 + s_T^2),
so solver error is measurable exactly. DPM++(2M) is 2nd order: at equal
step counts it must beat 1st-order DDIM, and ~3x fewer steps must reach
DDIM's error.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import LinearSchedule
from rho_diffusion_tpu.diffusion.gaussian import (
    ModelMeanType,
    ModelVarType,
    coefficients_from_schedule,
    respace,
    sample_loop,
)

MU, GAMMA = 0.4, 0.8
SHAPE = (4, 16)


def _exact_x0_model(abar_orig: jnp.ndarray):
    """E[x0 | x_t] for x0 ~ N(mu, gamma^2 I): Gaussian conjugacy."""

    def fn(x, t):  # t is ORIGINAL-process timesteps (post timestep_map)
        ab = abar_orig[t].reshape(-1, *((1,) * (x.ndim - 1)))
        a, s2 = jnp.sqrt(ab), 1.0 - ab
        return MU + (a * GAMMA**2 / (a**2 * GAMMA**2 + s2)) * (x - a * MU)

    return fn


def _solver_error(sampler: str, num_steps: int) -> float:
    """|solver endpoint - exact PF-ODE endpoint| from a fixed x_T."""
    coeffs = coefficients_from_schedule(LinearSchedule(1000))
    abar_orig = jnp.asarray(coeffs.alphas_cumprod)
    # the spacing reverse_process picks per sampler (uniform log-SNR is
    # what DPM-Solver++ is derived for; DDIM keeps reference striding)
    spacing = "uniform-lambda" if sampler == "dpm++" else "uniform-t"
    c = respace(coeffs, num_steps, spacing=spacing)
    x_T = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    out = sample_loop(
        c,
        _exact_x0_model(abar_orig),
        SHAPE,
        jax.random.PRNGKey(1),
        ModelMeanType.START_X,
        ModelVarType.FIXED_SMALL,
        sampler=sampler,
        clip_denoised=False,
        x_T=x_T,
    )
    # exact flow: z = (x_t - a mu)/sqrt(a^2 g^2 + s^2) is conserved; the
    # respaced trajectory starts at original t = timestep_map[-1]
    ab_T = float(c.alphas_cumprod[-1])
    a_T, s2_T = np.sqrt(ab_T), 1.0 - ab_T
    z = (np.asarray(x_T) - a_T * MU) / np.sqrt(a_T**2 * GAMMA**2 + s2_T)
    exact = MU + GAMMA * z
    return float(np.abs(np.asarray(out) - exact).max())


def test_dpmpp_second_order_beats_ddim():
    # measured on this analytic case (see git history): dpm++ 10/20 steps
    # err 0.044/0.019 vs ddim 0.360/0.193 — ~8-10x at equal step count
    for n in (10, 20):
        e_ddim = _solver_error("ddim", n)
        e_dpm = _solver_error("dpm++", n)
        assert e_dpm < 0.25 * e_ddim, (n, e_dpm, e_ddim)
    # >=8x fewer evaluations at matched error: the serving-latency claim
    assert _solver_error("dpm++", 10) < _solver_error("ddim", 80)


def test_dpmpp_converges_with_steps():
    errs = [_solver_error("dpm++", n) for n in (5, 10, 20, 40)]
    assert errs[0] > errs[1] > errs[2] > errs[3]
    assert errs[3] < 5e-3


def test_dpmpp_single_step_is_x0_prediction():
    """M=1 degenerates to one first-order jump: the x0 prediction of x_T."""
    coeffs = respace(coefficients_from_schedule(LinearSchedule(1000)), 1)
    abar_orig = jnp.asarray(
        coefficients_from_schedule(LinearSchedule(1000)).alphas_cumprod,
    )
    model = _exact_x0_model(abar_orig)
    x_T = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    out = sample_loop(
        coeffs, model, SHAPE, jax.random.PRNGKey(3),
        ModelMeanType.START_X, ModelVarType.FIXED_SMALL,
        sampler="dpm++", clip_denoised=False, x_T=x_T,
    )
    t0 = jnp.full((SHAPE[0],), int(coeffs.timestep_map[0]), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(model(x_T, t0)), rtol=1e-5, atol=1e-6,
    )


def test_dpmpp_deterministic_and_per_row_invariant():
    """dpm++ draws no step noise: same x_T -> same output; with per-row
    keys (serving mode) results are independent of batch composition."""
    from rho_diffusion_tpu.diffusion.sampling_rng import per_sample_keys

    coeffs = respace(coefficients_from_schedule(LinearSchedule(1000)), 8)
    abar_orig = jnp.asarray(
        coefficients_from_schedule(LinearSchedule(1000)).alphas_cumprod,
    )
    model = _exact_x0_model(abar_orig)
    keys = per_sample_keys(7, SHAPE[0])
    a = sample_loop(
        coeffs, model, SHAPE, keys,
        ModelMeanType.START_X, ModelVarType.FIXED_SMALL,
        sampler="dpm++", clip_denoised=False,
    )
    b = sample_loop(
        coeffs, model, (2, SHAPE[1]), keys[:2],
        ModelMeanType.START_X, ModelVarType.FIXED_SMALL,
        sampler="dpm++", clip_denoised=False,
    )
    np.testing.assert_array_equal(np.asarray(a)[:2], np.asarray(b))


def test_unknown_sampler_rejected():
    coeffs = respace(coefficients_from_schedule(LinearSchedule(1000)), 4)
    with pytest.raises(ValueError, match="unknown sampler"):
        sample_loop(
            coeffs, lambda x, t: x, SHAPE, jax.random.PRNGKey(0),
            ModelMeanType.START_X, ModelVarType.FIXED_SMALL,
            sampler="euler",
        )


def test_dpmpp_through_pipeline_with_frames():
    """End-to-end via GaussianDiffusionPipeline.reverse_process with the
    t_checkpoints frame buffer and a real (tiny random) backbone."""
    from rho_diffusion_tpu.diffusion import GaussianDiffusionPipeline

    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(8, 8), dims=2, in_channels=1, out_channels=1,
            model_channels=8, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=[], num_heads=1,
        ),
        schedule=LinearSchedule(40, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_small",
        optimizer="AdamW",
    )
    params = pipe.init_params(jax.random.PRNGKey(0))
    final, frames = pipe.reverse_process(
        params, jax.random.PRNGKey(1), pipe.sample_shape(2),
        sampler="dpm++", num_steps=8, t_checkpoints=[0, 20, 39],
    )
    assert np.isfinite(np.asarray(final)).all()
    assert frames.shape[0] == 3 and np.isfinite(np.asarray(frames)).all()
