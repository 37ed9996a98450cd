"""Solver plug-in seam (diffusion/solvers.py).

The reference's extensibility story was duck-typed delegation to any HF
SchedulerMixin (reference diffusers.py:148-151, 200-216); ours is a solver
registry compiled into one generic lax.scan. These tests pin:

* registry dispatch + the error message listing registered solvers;
* sign/coefficient plumbing via an exactly-solvable ODE (eps-hat == 0:
  the probability-flow trajectory is pure signal decay, both solvers must
  track it to float tolerance INCLUDING their multistep/corrector terms);
* UniPC's higher effective order on a smooth analytic score;
* end-to-end pipeline sampling + the zero-terminal-SNR gate for every
  registered solver.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import GaussianDiffusionPipeline, LinearSchedule
from rho_diffusion_tpu.diffusion.gaussian import (
    ModelMeanType,
    ModelVarType,
    coefficients_from_betas,
    respace,
    sample_loop,
)
from rho_diffusion_tpu.diffusion.schedule import named_beta_schedule
from rho_diffusion_tpu.diffusion.solvers import build_solver, is_solver, solver_names


def _coeffs(T=400, **kw):
    sched = named_beta_schedule("linear", T, **kw)
    return coefficients_from_betas(np.asarray(sched.beta_t, np.float64))


def test_registry():
    assert is_solver("dpm++") and is_solver("dpmpp") and is_solver("unipc")
    assert not is_solver("ddim") and not is_solver("ddpm")
    assert "unipc" in solver_names()
    prog = build_solver("unipc", np.linspace(0.99, 0.01, 16))
    assert set(prog.xs) >= {"i", "ratio", "gain", "rho_p"}
    for v in prog.xs.values():
        assert np.isfinite(np.asarray(v)).all()


def test_unknown_sampler_lists_solvers():
    c = _coeffs(20)
    with pytest.raises(ValueError, match="unipc"):
        sample_loop(
            c, lambda x, t: x, (1, 4, 4, 1), jax.random.PRNGKey(0),
            ModelMeanType.EPSILON, ModelVarType.FIXED_SMALL, sampler="nope",
        )


@pytest.mark.parametrize("sampler", ["dpm++", "unipc"])
def test_exact_on_signal_only_ode(sampler):
    """With eps_hat == 0 the PF-ODE solution is x(lambda) = alpha(lambda) C:
    x0 is constant along the trajectory, so every multistep difference and
    corrector term must vanish IDENTICALLY and the final sample equals
    x_T / sqrt(abar_{T-1}) to float32 tolerance. This pins the sign and
    normalisation of every solver table (ratio/gain/rho/D1)."""
    c = respace(_coeffs(400), 12, spacing="uniform-lambda")
    x_T = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4, 4, 1)).astype(np.float32),
    )
    out = sample_loop(
        c, lambda x, t: jnp.zeros_like(x), x_T.shape, jax.random.PRNGKey(0),
        ModelMeanType.EPSILON, ModelVarType.FIXED_SMALL,
        sampler=sampler, clip_denoised=False, x_T=x_T,
    )
    expected = np.asarray(x_T) / np.sqrt(float(c.alphas_cumprod[-1]))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4)


def test_solver_orders_on_smooth_score():
    """Analytic optimal eps for Gaussian data N(mu, s^2 I):
    eps(x, t) = sqrt(1-abar) (x - sqrt(abar) mu) / (abar s^2 + 1 - abar),
    for which the PF-ODE is affine with the closed-form solution
    x(lam) = m(lam) + std(lam)/std(lam_T) (x_T - m(lam_T)) followed by the
    discrete samplers' terminal posterior-mean denoise. At 32 evaluations
    the effective orders must separate: ddim (1st) > dpm++ (2nd) > unipc
    (corrector: 3rd-order local accuracy).

    NOTE model_fn receives ORIGINAL-process timesteps (p_mean_variance maps
    respaced indices through timestep_map before the call — the trained-
    network convention), so the analytic model indexes abar[t] directly."""
    T = 400
    c_full = _coeffs(T)
    abar64 = np.asarray(c_full.alphas_cumprod, np.float64)
    abar = jnp.asarray(abar64.astype(np.float32))
    mu, s2 = 0.3, 0.25

    def model(x, t):
        ab = abar[t].reshape(-1, *((1,) * (x.ndim - 1)))
        return jnp.sqrt(1.0 - ab) * (x - jnp.sqrt(ab) * mu) / (
            ab * s2 + 1.0 - ab
        )

    x_T = np.random.default_rng(1).normal(size=(4, 4, 4, 1)).astype(np.float32)
    ab_T, ab0 = abar64[-1], abar64[0]
    std_T = np.sqrt(ab_T * s2 + 1 - ab_T)
    std0 = np.sqrt(ab0 * s2 + 1 - ab0)
    x_l0 = np.sqrt(ab0) * mu + std0 / std_T * (x_T - np.sqrt(ab_T) * mu)
    sg0 = np.sqrt(1 - ab0)
    eps0 = sg0 * (x_l0 - np.sqrt(ab0) * mu) / std0**2
    exact = (x_l0 - sg0 * eps0) / np.sqrt(ab0)

    kw = dict(
        mean_type=ModelMeanType.EPSILON,
        var_type=ModelVarType.FIXED_SMALL,
        clip_denoised=False,
        rng=jax.random.PRNGKey(0),
        shape=x_T.shape,
        x_T=jnp.asarray(x_T),
    )
    c32 = respace(c_full, 32, spacing="uniform-lambda")
    errs = {
        name: float(
            np.abs(np.asarray(sample_loop(c32, model, sampler=name, **kw)) - exact).max(),
        )
        for name in ("ddim", "dpm++", "unipc")
    }
    assert errs["unipc"] < errs["dpm++"] < errs["ddim"], errs
    assert errs["unipc"] < 0.01, errs


class TestPipelineEndToEnd:
    @pytest.fixture(scope="class")
    def pipe(self):
        return GaussianDiffusionPipeline(
            backbone="UNetv2",
            backbone_kwargs=dict(
                data_shape=(8, 8), dims=2, in_channels=1, out_channels=1,
                model_channels=8, num_res_blocks=1, channel_mult=(1, 2),
                attention_resolutions=[], num_heads=1,
            ),
            schedule=LinearSchedule(40, 2e-4, 1e-2),
            model_mean_type="epsilon",
            optimizer="AdamW",
        )

    def test_unipc_samples_finite_and_distinct(self, pipe):
        state = pipe.create_state(jax.random.PRNGKey(0))
        outs = {
            s: np.asarray(
                pipe.reverse_process(
                    state.params, jax.random.PRNGKey(1), (2, 8, 8, 1), None,
                    sampler=s, num_steps=6,
                ),
            )
            for s in ("unipc", "dpm++")
        }
        for s, o in outs.items():
            assert np.isfinite(o).all(), s
        # corrector makes a different (better) trajectory than 2M
        assert not np.allclose(outs["unipc"], outs["dpm++"])

    def test_zero_snr_rejects_every_solver(self):
        pipe = GaussianDiffusionPipeline(
            backbone="UNetv2",
            backbone_kwargs=dict(
                data_shape=(8, 8), dims=2, in_channels=1, out_channels=1,
                model_channels=8, num_res_blocks=1, channel_mult=(1, 2),
                attention_resolutions=[], num_heads=1,
            ),
            schedule=named_beta_schedule("linear", 20, zero_terminal_snr=True),
            model_mean_type="v_prediction",
            optimizer="AdamW",
        )
        state = pipe.create_state(jax.random.PRNGKey(0))
        for s in solver_names():
            with pytest.raises(ValueError, match="log-SNR"):
                pipe.reverse_process(
                    state.params, jax.random.PRNGKey(1), (1, 8, 8, 1), None,
                    sampler=s, num_steps=4,
                )
