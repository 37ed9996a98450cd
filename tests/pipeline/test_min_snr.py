"""min-SNR-gamma loss weighting (Hang et al., arXiv:2303.09556).

The reference has no loss-weighting surface (its training losses are
unweighted MSE, /root/reference/rho_diffusion/diffusion/gaussian_diffusion.py
:861-934) — this is a TPU-era training-quality extension. Closed-form weight
checks per prediction target, end-to-end weighted training on both pipelines,
and construction-time validation of bad configs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import (
    DDPM,
    GaussianDiffusionPipeline,
    LinearSchedule,
    ModelMeanType,
)
from rho_diffusion_tpu.diffusion.gaussian import (
    coefficients_from_schedule,
    min_snr_weight,
    training_losses,
    validate_loss_weighting,
)


def _backbone_kwargs():
    return dict(
        data_shape=(8, 8),
        dims=2,
        in_channels=1,
        out_channels=1,
        model_channels=8,
        num_res_blocks=1,
        channel_mult=(1, 2),
        attention_resolutions=[],
        num_heads=1,
    )


@pytest.fixture(scope="module")
def coeffs():
    return coefficients_from_schedule(LinearSchedule(50, 2e-4, 1e-2))


def test_weight_closed_form_epsilon(coeffs):
    """eps-pred: w = min(SNR, gamma)/SNR — 1 where SNR <= gamma, gamma/SNR
    where SNR > gamma (early t of a linear schedule has huge SNR)."""
    t = jnp.arange(50)
    acp = np.asarray(coeffs.alphas_cumprod)
    snr = acp / (1.0 - acp)
    gamma = 5.0
    w = np.asarray(min_snr_weight(coeffs.alphas_cumprod, t, ModelMeanType.EPSILON, gamma))
    expected = np.minimum(snr, gamma) / snr
    np.testing.assert_allclose(w, expected, rtol=1e-5)
    assert (w <= 1.0 + 1e-6).all()
    assert w[0] < 0.05  # t=0 has SNR ~ 250 on this schedule -> w = gamma/SNR
    assert w[-1] == pytest.approx(1.0)  # late t: SNR << gamma -> unweighted


def test_weight_closed_form_x0_and_velocity(coeffs):
    t = jnp.arange(50)
    acp = np.asarray(coeffs.alphas_cumprod)
    snr = acp / (1.0 - acp)
    gamma = 5.0
    w_x0 = np.asarray(min_snr_weight(coeffs.alphas_cumprod, t, ModelMeanType.START_X, gamma))
    np.testing.assert_allclose(w_x0, np.minimum(snr, gamma), rtol=1e-5)
    w_v = np.asarray(min_snr_weight(coeffs.alphas_cumprod, t, ModelMeanType.VELOCITY, gamma))
    np.testing.assert_allclose(w_v, np.minimum(snr, gamma) / (snr + 1.0), rtol=1e-5)


def test_weight_consistency_across_targets(coeffs):
    """All three parameterisations express the SAME x0-space objective:
    w_eps * SNR = w_v * (SNR+1) = w_x0 = min(SNR, gamma)."""
    t = jnp.arange(50)
    acp = np.asarray(coeffs.alphas_cumprod)
    snr = acp / (1.0 - acp)
    g = 3.0
    w_eps = np.asarray(min_snr_weight(coeffs.alphas_cumprod, t, ModelMeanType.EPSILON, g))
    w_v = np.asarray(min_snr_weight(coeffs.alphas_cumprod, t, ModelMeanType.VELOCITY, g))
    w_x0 = np.asarray(min_snr_weight(coeffs.alphas_cumprod, t, ModelMeanType.START_X, g))
    np.testing.assert_allclose(w_eps * snr, w_x0, rtol=1e-4)
    np.testing.assert_allclose(w_v * (snr + 1.0), w_x0, rtol=1e-4)


def test_training_losses_applies_weight(coeffs):
    """training_losses(mse_weight=w): loss == w * mse per sample; the logged
    'mse' stays unweighted."""
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(4, 8, 8, 1)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    t = jnp.array([0, 10, 25, 49])
    model_fn = lambda x, tt: x * 0.5  # deterministic stand-in backbone
    w = min_snr_weight(coeffs.alphas_cumprod, t, ModelMeanType.EPSILON, 5.0)
    from rho_diffusion_tpu.diffusion.gaussian import LossType, ModelVarType

    unweighted = training_losses(
        coeffs, model_fn, x0, t, noise,
        ModelMeanType.EPSILON, ModelVarType.FIXED_LARGE, LossType.MSE,
    )
    weighted = training_losses(
        coeffs, model_fn, x0, t, noise,
        ModelMeanType.EPSILON, ModelVarType.FIXED_LARGE, LossType.MSE,
        mse_weight=w,
    )
    np.testing.assert_allclose(
        np.asarray(weighted["loss"]),
        np.asarray(w) * np.asarray(unweighted["loss"]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(weighted["mse"]), np.asarray(unweighted["mse"]), rtol=1e-6,
    )


def test_gaussian_pipeline_trains_with_min_snr():
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
        loss_weighting="min_snr",
        min_snr_gamma=5.0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "data": rng.uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32),
        "labels": None,
    }
    state = pipe.create_state(jax.random.PRNGKey(0))
    for _ in range(2):
        state, m = pipe.training_step(state, batch)
    assert np.isfinite(float(m["train_loss"]))
    # weighting scales the composed loss but never the logged raw mse
    assert float(m["train_loss"]) <= float(m["mse"]) + 1e-6


def test_ddpm_pipeline_trains_with_min_snr():
    pipe = DDPM(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
        loss_weighting="min-snr",  # hyphen spelling normalises too
        min_snr_gamma=5.0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "data": rng.uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32),
        "labels": None,
    }
    state = pipe.create_state(jax.random.PRNGKey(0))
    state, m = pipe.training_step(state, batch)
    assert np.isfinite(float(m["train_loss"]))


def test_validation_rejects_bad_configs():
    assert validate_loss_weighting(None, ModelMeanType.EPSILON) is None
    assert validate_loss_weighting("none", ModelMeanType.EPSILON) is None
    assert validate_loss_weighting("Min-SNR", ModelMeanType.VELOCITY) == "min_snr"
    with pytest.raises(ValueError, match="unknown loss_weighting"):
        validate_loss_weighting("p2", ModelMeanType.EPSILON)
    with pytest.raises(ValueError, match="undefined for mean_type"):
        validate_loss_weighting("min_snr", ModelMeanType.PREVIOUS_X)
    with pytest.raises(ValueError, match="requires an MSE loss_func"):
        DDPM(
            backbone="UNetv2",
            backbone_kwargs=_backbone_kwargs(),
            schedule=LinearSchedule(20, 2e-4, 1e-2),
            loss_func="L1Loss",
            loss_weighting="min_snr",
        )
    # pure-VLB loss types return before any MSE weighting could apply —
    # reject at construction instead of silently training unweighted
    with pytest.raises(ValueError, match="MSE loss types"):
        GaussianDiffusionPipeline(
            backbone="UNetv2",
            backbone_kwargs=_backbone_kwargs(),
            schedule=LinearSchedule(20, 2e-4, 1e-2),
            model_mean_type="epsilon",
            model_var_type="learned_range",
            loss_type="kl",
            loss_weighting="min_snr",
        )
