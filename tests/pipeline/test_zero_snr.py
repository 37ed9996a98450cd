"""Zero-terminal-SNR schedules (Lin et al., arXiv:2305.08891).

The reference's diffusers pipeline could reach this via
``DDPMScheduler(rescale_betas_zero_snr=True)`` (reference diffusers.py:148-216
accepted any SchedulerMixin config); here it is a first-class float64 rescale
(schedule.rescale_zero_terminal_snr) paired with v-prediction, a finite
eps-from-x0 form at alpha_bar == 0, and trailing-spacing sampling defaults.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import GaussianDiffusionPipeline
from rho_diffusion_tpu.diffusion.diffusers_compat import DiffusersDDPMPipeline
from rho_diffusion_tpu.diffusion.gaussian import (
    coefficients_from_betas,
    extract,
    predict_eps_from_xstart,
    respace,
)
from rho_diffusion_tpu.diffusion.schedule import (
    named_beta_schedule,
    rescale_zero_terminal_snr,
    schedule_from_betas,
)

MC = 8
EMB = 4 * MC
T = 20


def _backbone_kwargs():
    return dict(
        data_shape=(8, 8),
        dims=2,
        in_channels=1,
        out_channels=1,
        model_channels=MC,
        num_res_blocks=1,
        channel_mult=(1, 2),
        attention_resolutions=[],
        num_heads=1,
        num_classes=1,
    )


def _zero_snr_pipe(prediction_type="v_prediction", **kw):
    return DiffusersDDPMPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        num_train_timesteps=T,
        beta_schedule="linear",
        prediction_type=prediction_type,
        rescale_betas_zero_snr=True,
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
        **kw,
    )


class TestRescaleAlgorithm:
    def test_terminal_snr_exactly_zero_first_preserved(self):
        beta = np.linspace(1e-4, 0.02, 1000)
        rb = rescale_zero_terminal_snr(beta)
        abar = np.cumprod(1.0 - rb)
        assert abar[-1] == 0.0  # exact, not approximate
        # first sqrt(alpha_bar) preserved (Alg. 1 rescales to keep it)
        np.testing.assert_allclose(
            np.sqrt(abar[0]), np.sqrt(1.0 - beta[0]), rtol=1e-12,
        )
        assert (np.diff(abar) < 0).all()  # still strictly decreasing
        assert (rb[:-1] > 0).all() and (rb[:-1] < 1).all()
        assert rb[-1] == 1.0

    def test_named_schedules_zero_terminal(self):
        for name in ("linear", "cosine"):
            s = named_beta_schedule(name, 50, zero_terminal_snr=True)
            assert float(s.alpha_bar_t[-1]) == 0.0
            assert np.isfinite(np.asarray(s.sigma_t)).all()
            # without the flag the terminal SNR is NOT zero
            s0 = named_beta_schedule(name, 50)
            assert float(s0.alpha_bar_t[-1]) > 0.0

    def test_interior_unit_beta_rejected(self):
        beta = np.full(10, 0.1)
        beta[4] = 1.0  # mid-run beta == 1 is a broken schedule
        with pytest.raises(ValueError, match="terminal"):
            schedule_from_betas(beta)
        beta = np.full(10, 0.1)
        beta[-1] = 1.0  # terminal beta == 1 is the zero-SNR convention
        s = schedule_from_betas(beta)
        assert float(s.alpha_bar_t[-1]) == 0.0


class TestFiniteEpsForm:
    def test_matches_reciprocal_form_on_regular_schedule(self):
        """The rewritten eps-from-x0 is algebraically identical to the
        reference's reciprocal form (gaussian_diffusion.py:462-470)."""
        sched = named_beta_schedule("linear", 100)
        c = coefficients_from_betas(np.asarray(sched.beta_t, np.float64))
        rng = np.random.default_rng(0)
        x_t = jnp.asarray(rng.normal(size=(4, 8, 8, 1)).astype(np.float32))
        x0 = jnp.asarray(rng.normal(size=(4, 8, 8, 1)).astype(np.float32))
        t = jnp.asarray([0, 3, 50, 99], jnp.int32)
        got = predict_eps_from_xstart(c, x_t, t, x0)
        recip = (
            extract(c.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
        ) / extract(c.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)
        np.testing.assert_allclose(np.asarray(got), np.asarray(recip), atol=2e-5)

    def test_finite_at_zero_terminal(self):
        sched = named_beta_schedule("linear", 50, zero_terminal_snr=True)
        c = coefficients_from_betas(np.asarray(sched.beta_t, np.float64))
        x_t = jnp.ones((2, 4, 4, 1))
        x0 = 0.5 * jnp.ones((2, 4, 4, 1))
        t = jnp.asarray([49, 49], jnp.int32)  # alpha_bar == 0 exactly
        eps = predict_eps_from_xstart(c, x_t, t, x0)
        # limit form: eps -> x_t as alpha_bar -> 0
        np.testing.assert_allclose(np.asarray(eps), np.asarray(x_t), atol=1e-6)


class TestPipelineGates:
    def test_epsilon_prediction_rejected(self):
        with pytest.raises(ValueError, match="zero-terminal-SNR"):
            _zero_snr_pipe(prediction_type="epsilon")

    def test_gaussian_pipeline_direct_gate(self):
        with pytest.raises(ValueError, match="zero-terminal-SNR"):
            GaussianDiffusionPipeline(
                backbone="UNetv2",
                backbone_kwargs=_backbone_kwargs(),
                schedule=named_beta_schedule("linear", T, zero_terminal_snr=True),
                model_mean_type="epsilon",
                optimizer="AdamW",
            )

    def test_dpmpp_rejected(self):
        pipe = _zero_snr_pipe()
        state = pipe.create_state(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="log-SNR"):
            pipe.reverse_process(
                state.params, jax.random.PRNGKey(1), (1, 8, 8, 1), None,
                sampler="dpm++", num_steps=5,
            )

    def test_uniform_lambda_spacing_rejected(self):
        """Explicit spacing='uniform-lambda' on a zero-SNR table used to
        silently return grid [0..K-1] (lam[-1]=-inf -> NaN targets)."""
        sched = named_beta_schedule("linear", T, zero_terminal_snr=True)
        c = coefficients_from_betas(np.asarray(sched.beta_t, np.float64))
        with pytest.raises(ValueError, match="trailing"):
            respace(c, 5, spacing="uniform-lambda")

    def test_min_snr_weighting_rejected(self):
        """min_snr gives the zero-SNR terminal step weight exactly 0 —
        silently un-training the step the rescale exists to fix."""
        with pytest.raises(ValueError, match="min_snr"):
            GaussianDiffusionPipeline(
                backbone="UNetv2",
                backbone_kwargs=_backbone_kwargs(),
                schedule=named_beta_schedule("linear", T, zero_terminal_snr=True),
                model_mean_type="v_prediction",
                loss_weighting="min_snr",
                optimizer="AdamW",
            )

    def test_ddpm_pipeline_rejects_zero_snr_schedule(self):
        """Epsilon-only DDPM divides by sqrt(alpha_T)=0 in its reverse
        step; the schedule must be rejected at construction."""
        from rho_diffusion_tpu.diffusion.ddpm import DDPM

        with pytest.raises(ValueError, match="zero-terminal-SNR"):
            DDPM(
                backbone="UNetv2",
                backbone_kwargs=_backbone_kwargs(),
                schedule=named_beta_schedule("linear", T, zero_terminal_snr=True),
                optimizer="AdamW",
            )

    def test_classifier_guidance_allowed_for_ddpm_sampler(self):
        """condition_mean (mean += variance*grad) is finite at alpha_bar=0:
        only the DDIM/condition_score path is blocked under zero-SNR."""
        pipe = _zero_snr_pipe()
        state = pipe.create_state(jax.random.PRNGKey(0))
        grad_fn = lambda x, t: jnp.zeros_like(x)
        y = jnp.zeros((1, EMB), jnp.float32)
        with pytest.raises(ValueError, match="condition_score"):
            pipe.reverse_process(
                state.params, jax.random.PRNGKey(1), (1, 8, 8, 1), y,
                sampler="ddim", cond_grad_fn=grad_fn, num_steps=3,
            )
        out = pipe.reverse_process(
            state.params, jax.random.PRNGKey(1), (1, 8, 8, 1), y,
            sampler="ddpm", cond_grad_fn=grad_fn, num_steps=3,
        )
        assert np.isfinite(np.asarray(out)).all()


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def pipe(self):
        return _zero_snr_pipe()

    @pytest.fixture(scope="class")
    def batch(self):
        rng = np.random.default_rng(0)
        return {
            "data": rng.uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32),
            "labels": rng.normal(size=(4, EMB)).astype(np.float32),
        }

    def test_vpred_train_step_finite(self, pipe, batch):
        state = pipe.create_state(jax.random.PRNGKey(0))
        state, metrics = pipe.train_step(state, batch)
        assert np.isfinite(float(metrics["train_loss"]))
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_ddim_respaced_trailing_default_finite(self, pipe):
        """Respaced DDIM on a zero-SNR schedule: the default grid must
        anchor at t = T-1 (alpha_bar == 0) and produce finite samples —
        NaN here is exactly the inf/inf the finite eps form removes."""
        state = pipe.create_state(jax.random.PRNGKey(0))
        y = jnp.zeros((2, EMB), jnp.float32)
        out = pipe.reverse_process(
            state.params, jax.random.PRNGKey(1), (2, 8, 8, 1), y,
            sampler="ddim", num_steps=5,
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_full_t_samplers_finite(self, pipe):
        state = pipe.create_state(jax.random.PRNGKey(0))
        y = jnp.zeros((1, EMB), jnp.float32)
        for sampler in ("ddim", "ddpm"):
            out = pipe.reverse_process(
                state.params, jax.random.PRNGKey(2), (1, 8, 8, 1), y,
                sampler=sampler,
            )
            assert np.isfinite(np.asarray(out)).all(), sampler

    def test_trailing_respace_anchors_terminal(self):
        sched = named_beta_schedule("linear", T, zero_terminal_snr=True)
        c = coefficients_from_betas(np.asarray(sched.beta_t, np.float64))
        r = respace(c, 5, spacing="trailing")
        assert int(r.timestep_map[-1]) == T - 1
        assert float(r.alphas_cumprod[-1]) == 0.0
        # uniform-t would MISS the terminal step — the documented flaw
        r2 = respace(c, 5, spacing="uniform-t")
        assert int(r2.timestep_map[-1]) != T - 1


def test_linear_schedule_zero_terminal_snr_kwarg():
    """Config-expressible zero-SNR (round 4): LinearSchedule's own factory
    accepts zero_terminal_snr=True — the knob the DeepGalaxy quality
    recipe drives through examples configs (RESULTS.md round 4)."""
    from rho_diffusion_tpu.diffusion.schedule import LinearSchedule
    from rho_diffusion_tpu.registry import registry

    s = LinearSchedule(50, zero_terminal_snr=True)
    assert float(s.alpha_bar_t[-1]) == 0.0
    assert float(np.asarray(s.beta_t)[-1]) == 1.0
    # reachable through the registry (the config path)
    s2 = registry.get("schedules", "LinearSchedule")(
        num_steps=50, zero_terminal_snr=True,
    )
    np.testing.assert_array_equal(np.asarray(s.beta_t), np.asarray(s2.beta_t))
    # default unchanged
    assert float(LinearSchedule(50).alpha_bar_t[-1]) > 0.0
