"""Round-3 pipeline features: v-prediction (the HF prediction_type the
reference could reach through diffusers.SchedulerMixin delegation,
reference diffusers.py:148-216), the t_checkpoints intermediate-frame
buffer (reference gaussian_diffusion.py:1041-1048, 1091-1097), the widened
DDPMScheduler kwarg surface, and construction-time ClassifierGuidance
validation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import (
    GaussianDiffusionPipeline,
    LinearSchedule,
    LossType,
    ModelMeanType,
    ModelVarType,
)
from rho_diffusion_tpu.diffusion.diffusers_compat import DiffusersDDPMPipeline
from rho_diffusion_tpu.diffusion.gaussian import (
    coefficients_from_betas,
    predict_xstart_from_v,
    training_losses,
    velocity_target,
)


def _backbone_kwargs(out_channels=1):
    return dict(
        data_shape=(8, 8),
        dims=2,
        in_channels=1,
        out_channels=out_channels,
        model_channels=8,
        num_res_blocks=1,
        channel_mult=(1, 2),
        attention_resolutions=[],
        num_heads=1,
    )


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    return {
        "data": rng.uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32),
        "labels": None,
    }


# ---------------------------------------------------------------------------
# v-prediction
# ---------------------------------------------------------------------------

def test_velocity_target_closed_form():
    """An oracle that outputs exactly v = sqrt(abar)*eps - sqrt(1-abar)*x0
    must incur zero MSE, and predict_xstart_from_v must invert it."""
    c = coefficients_from_betas(np.linspace(1e-4, 2e-2, 50))
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(4, 8, 8, 1)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    t = jnp.asarray([0, 10, 25, 49])

    v = velocity_target(c, x0, t, noise)
    from rho_diffusion_tpu.diffusion.gaussian import q_sample

    x_t = q_sample(c, x0, t, noise)
    np.testing.assert_allclose(
        np.asarray(predict_xstart_from_v(c, x_t, t, v)), np.asarray(x0),
        atol=1e-5,
    )

    terms = training_losses(
        c, lambda x, tt: v, x0, t, noise,
        ModelMeanType.VELOCITY, ModelVarType.FIXED_SMALL, LossType.MSE,
    )
    assert float(jnp.max(terms["mse"])) < 1e-10


@pytest.mark.heavy
def test_v_prediction_pipeline_trains_and_samples(batch):
    pipe = DiffusersDDPMPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        timesteps=20,
        prediction_type="v_prediction",
        beta_schedule="linear",
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
    )
    assert pipe.model_mean_type == ModelMeanType.VELOCITY
    state = pipe.create_state(jax.random.PRNGKey(0))
    state, m = pipe.training_step(state, batch)
    assert np.isfinite(float(m["train_loss"]))
    out = pipe.reverse_process(
        state.params, jax.random.PRNGKey(1), (2, 8, 8, 1), None,
        sampler="ddim", num_steps=5,
    )
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_diffusers_kwarg_surface():
    """The DDPMScheduler kwargs the reference's scripts could pass reach the
    Gaussian pipeline: beta_schedule/beta_start/beta_end/variance_type/
    clip_sample/num_train_timesteps."""
    pipe = DiffusersDDPMPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        num_train_timesteps=30,
        beta_schedule="scaled_linear",
        beta_start=0.0005,
        beta_end=0.012,
        prediction_type="epsilon",
        variance_type="fixed_small",
        clip_sample=False,
    )
    assert pipe.coeffs.num_timesteps == 30
    assert pipe.model_var_type == ModelVarType.FIXED_SMALL
    assert pipe.clip_denoised is False
    betas = np.asarray(pipe.coeffs.betas)
    np.testing.assert_allclose(betas[0], 0.0005, rtol=1e-5)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-5)
    # scaled_linear: sqrt(betas) is linear
    d = np.diff(np.sqrt(betas.astype(np.float64)))
    np.testing.assert_allclose(d, d[0], rtol=1e-4)

    with pytest.raises(ValueError, match="prediction_type"):
        DiffusersDDPMPipeline(
            backbone="UNetv2", backbone_kwargs=_backbone_kwargs(),
            prediction_type="bogus",
        )
    with pytest.raises(ValueError, match="variance_type"):
        DiffusersDDPMPipeline(
            backbone="UNetv2", backbone_kwargs=_backbone_kwargs(),
            variance_type="bogus",
        )


def test_sigmoid_beta_schedule():
    from rho_diffusion_tpu.diffusion.schedule import named_beta_schedule

    s = named_beta_schedule("sigmoid", 100, beta_start=1e-4, beta_end=2e-2)
    betas = np.asarray(s.beta_t)
    assert betas.shape == (100,)
    # HF formula: sigmoid(linspace(-6, 6)) * (end - start) + start
    assert betas[0] == pytest.approx(1e-4 + 2e-2 / (1 + np.exp(6)), rel=0.02)
    assert betas[-1] == pytest.approx(2e-2, rel=0.02)
    assert (np.diff(betas) > 0).all()
    assert (betas > 0).all() and (betas < 1).all()


# ---------------------------------------------------------------------------
# t_checkpoints frame buffer
# ---------------------------------------------------------------------------

def test_t_checkpoints_frame_buffer(batch):
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        optimizer="AdamW",
        t_checkpoints=[0, 10, 19],
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    final, frames = pipe.reverse_process(
        state.params, jax.random.PRNGKey(1), (2, 8, 8, 1), None,
        sampler="ddim",
    )
    assert frames.shape == (3, 2, 8, 8, 1)
    assert np.isfinite(np.asarray(frames)).all()
    # the t=0 checkpoint is the final denoised sample
    np.testing.assert_array_equal(np.asarray(frames[0]), np.asarray(final))
    # distinct timesteps give distinct frames
    assert not np.allclose(np.asarray(frames[1]), np.asarray(frames[2]))


def test_t_checkpoints_respaced_hits_original_timesteps(batch):
    """Checkpoints are original-process timesteps; under respacing they must
    still land (timestep_map comparison)."""
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        optimizer="AdamW",
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    # respaced to 5 steps: original timesteps {0, 4, 8, 12, 16}
    final, frames = pipe.reverse_process(
        state.params, jax.random.PRNGKey(1), (1, 8, 8, 1), None,
        sampler="ddim", num_steps=5, t_checkpoints=[0, 8],
    )
    assert frames.shape == (2, 1, 8, 8, 1)
    np.testing.assert_array_equal(np.asarray(frames[0]), np.asarray(final))
    assert np.abs(np.asarray(frames[1])).max() > 0  # buffer was written


def test_generate_ignores_construction_t_checkpoints(batch):
    """generate() must return only final samples even when the pipeline was
    constructed with t_checkpoints (the reference's generate also returned
    final frames only)."""
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        optimizer="AdamW",
        t_checkpoints=[0, 5],
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    out = pipe.generate(state.params, jax.random.PRNGKey(1), batch_size=2)
    assert out.shape == (2, 8, 8, 1)


# ---------------------------------------------------------------------------
# ClassifierGuidance construction-time validation
# ---------------------------------------------------------------------------

def test_classifier_guidance_as_cond_fn_fails_fast():
    with pytest.raises(ValueError, match="ClassifierGuidance"):
        GaussianDiffusionPipeline(
            backbone="UNetv2",
            backbone_kwargs=_backbone_kwargs(),
            schedule=LinearSchedule(20, 2e-4, 1e-2),
            cond_fn="ClassifierGuidance",
            cond_fn_kwargs={},
            optimizer="AdamW",
        )


def test_diffusers_injected_schedule_infers_timesteps():
    """An explicitly injected schedule must set T = len(schedule), not 1000
    (regression: training drew t from [0, 1000) against a shorter table)."""
    pipe = DiffusersDDPMPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
    )
    assert pipe.timesteps == 20
    assert pipe.coeffs.num_timesteps == 20


def test_progressive_usable_with_construction_t_checkpoints():
    """progressive=True must NOT inherit the construction-time checkpoint
    buffer (regression: the None default was replaced by self.t_checkpoints
    and sample_loop raised 'mutually exclusive' for a call that never
    passed t_checkpoints)."""
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        optimizer="AdamW",
        t_checkpoints=[0, 10],
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    final, all_frames = pipe.reverse_process(
        state.params, jax.random.PRNGKey(1), (1, 8, 8, 1), None,
        sampler="ddim", progressive=True,
    )
    assert all_frames.shape[0] == 20
    np.testing.assert_array_equal(np.asarray(all_frames[-1]), np.asarray(final))


def test_progressive_and_t_checkpoints_conflict():
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        optimizer="AdamW",
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="mutually exclusive"):
        pipe.reverse_process(
            state.params, jax.random.PRNGKey(1), (1, 8, 8, 1), None,
            progressive=True, t_checkpoints=[0, 10],
        )


def test_t_checkpoints_snap_to_respaced_grid():
    """A checkpoint between respaced timesteps snaps to the nearest visited
    one instead of silently returning a zero frame."""
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        optimizer="AdamW",
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    # respaced original timesteps {0,4,8,12,16}; 7 snaps to 8
    final, frames = pipe.reverse_process(
        state.params, jax.random.PRNGKey(1), (1, 8, 8, 1), None,
        sampler="ddim", num_steps=5, t_checkpoints=[7],
    )
    assert np.abs(np.asarray(frames[0])).max() > 0
