"""GaussianDiffusionPipeline / DiffusersDDPMPipeline driven with a real
backbone: training steps (incl. learned-range variance + VLB term), DDIM
respaced sampling, and bits-per-dim evaluation."""
import jax
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


@pytest.mark.heavy
def test_epsilon_fixed_large_trains_and_samples(batch):
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    for _ in range(2):
        state, m = pipe.training_step(state, batch)
    assert np.isfinite(float(m["train_loss"]))

    out = pipe.reverse_process(
        state.params, jax.random.PRNGKey(1), (2, 8, 8, 1), None,
        sampler="ddim", num_steps=5,
    )
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.heavy
def test_learned_range_vlb_training(batch):
    """Learned-range variance: backbone emits 2C channels; loss carries a
    vb term (reference gaussian_diffusion.py:895-917)."""
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(out_channels=2),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.LEARNED_RANGE,
        loss_type=LossType.RESCALED_MSE,
        optimizer="AdamW",
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    state, m = pipe.training_step(state, batch)
    assert "vb" in m and np.isfinite(float(m["vb"]))
    assert np.isfinite(float(m["train_loss"]))
    # sampling splits the variance channels
    out = pipe.reverse_process(
        state.params, jax.random.PRNGKey(1), (2, 8, 8, 1), None,
        sampler="ddpm", num_steps=5,
    )
    assert out.shape == (2, 8, 8, 1)


def test_bpd_evaluation(batch):
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(10, 1e-4, 5e-3),
        model_mean_type="epsilon",
        model_var_type="fixed_small",
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    out = pipe.calc_bpd(
        state.params, jax.numpy.asarray(batch["data"][:2]), jax.random.PRNGKey(1),
    )
    assert out["total_bpd"].shape == (2,)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()


def test_diffusers_compat_pipeline(batch):
    """Grad-clip 1.0 + squaredcos betas + epsilon target
    (reference diffusers.py:106-146)."""
    pipe = DiffusersDDPMPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        timesteps=20,
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
    )
    assert pipe.coeffs.num_timesteps == 20
    state = pipe.create_state(jax.random.PRNGKey(0))
    state, m = pipe.training_step(state, batch)
    assert np.isfinite(float(m["train_loss"]))
    # sample-prediction variant
    pipe2 = DiffusersDDPMPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        timesteps=20,
        prediction_type="sample",
    )
    assert pipe2.model_mean_type == ModelMeanType.START_X


def test_validation_step(batch):
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    m = pipe.validation_step(state, batch)
    assert np.isfinite(float(m["train_loss"]))
    # params untouched
    m2 = pipe.validation_step(state, batch)
    np.testing.assert_allclose(float(m["train_loss"]), float(m2["train_loss"]))


@pytest.mark.heavy
def test_classifier_guidance_end_to_end(batch):
    """Drive cond_grad_fn through BOTH samplers with a real (toy, trained-
    for-2-steps) classifier — the path the reference only stubbed
    (conditioning.py:142-155): guided samples must be finite, and guidance
    must actually change the trajectory vs the unguided run."""
    import jax.numpy as jnp
    from flax import linen as nn

    from rho_diffusion_tpu.models.conditioning import (
        ClassifierGuidance,
        classifier_grad_fn,
    )

    class ToyClassifier(nn.Module):
        num_classes: int = 3

        @nn.compact
        def __call__(self, x, t):
            h = x.reshape(x.shape[0], -1)
            h = nn.Dense(16)(h)
            h = nn.silu(h + nn.Dense(16)(t[:, None].astype(jnp.float32)))
            return nn.Dense(self.num_classes)(h)

    clf = ToyClassifier()
    cparams = clf.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 8, 8, 1)),
        jnp.zeros((2,), jnp.int32),
    )

    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
    )
    state = pipe.create_state(jax.random.PRNGKey(1))
    state, _ = pipe.training_step(state, batch)

    y = jnp.asarray([0, 2])
    grad_fn = classifier_grad_fn(
        lambda x, t: clf.apply(cparams, x, t), y, scale=5.0,
    )
    common = dict(shape=(2, 8, 8, 1), conditions=None, num_steps=5)
    for sampler in ("ddim", "ddpm"):
        guided = pipe.reverse_process(
            state.params, jax.random.PRNGKey(2), sampler=sampler,
            cond_grad_fn=grad_fn, **common,
        )
        unguided = pipe.reverse_process(
            state.params, jax.random.PRNGKey(2), sampler=sampler, **common,
        )
        assert np.isfinite(np.asarray(guided)).all(), sampler
        assert float(np.abs(np.asarray(guided) - np.asarray(unguided)).max()) > 1e-6

    # the module-level hook builds the same grad_fn
    module = ClassifierGuidance(
        classifier=lambda x, t: clf.apply(cparams, x, t), guidance_scale=5.0,
    )
    g1 = module.grad_fn(y)(
        jnp.ones((2, 8, 8, 1)), jnp.zeros((2,), jnp.int32),
    )
    g2 = grad_fn(jnp.ones((2, 8, 8, 1)), jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))


@pytest.mark.heavy
def test_respaced_ancestral_ddpm_sampler(batch):
    """Respacing applies to the ANCESTRAL sampler too (ROADMAP round-1 #7):
    a 10-step respaced DDPM rollout must be finite and statistically close
    to the full-T rollout (trained-ish model, shared x_T)."""
    import jax.numpy as jnp

    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(50, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_small",
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    for _ in range(3):
        state, _ = pipe.training_step(state, batch)

    x_T = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 1))
    full = pipe.reverse_process(
        state.params, jax.random.PRNGKey(3), (4, 8, 8, 1), None,
        sampler="ddpm", x_T=x_T,
    )
    fast = pipe.reverse_process(
        state.params, jax.random.PRNGKey(3), (4, 8, 8, 1), None,
        sampler="ddpm", num_steps=10, x_T=x_T,
    )
    assert np.isfinite(np.asarray(fast)).all()
    assert fast.shape == full.shape
    # same target distribution: clipped outputs, matching moments loosely
    mf, sf = float(jnp.mean(full)), float(jnp.std(full))
    mr, sr = float(jnp.mean(fast)), float(jnp.std(fast))
    assert abs(mf - mr) < 0.5 and abs(sf - sr) < 0.5
