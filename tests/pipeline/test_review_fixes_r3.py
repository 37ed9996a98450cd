"""Regression tests for the round-3 whole-package review findings:
thresholding_percentile plumbed to sampling, timesteps/schedule mismatch
rejected, uniform-lambda respacing returning exactly the requested step
count, the jitted-sampler cache keying on the conv-quant mode, callable
MSE losses allowed with min-SNR, and half-specified named-schedule
endpoints rejected."""
import jax
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import (
    DDPM,
    GaussianDiffusionPipeline,
    LinearSchedule,
)
from rho_diffusion_tpu.diffusion.gaussian import (
    coefficients_from_betas,
    respace,
    space_timesteps_lambda,
)
from rho_diffusion_tpu.diffusion.schedule import named_beta_schedule


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


def _gauss(**kw):
    return GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
        **kw,
    )


def test_thresholding_percentile_reaches_sampling():
    """The configured percentile must change what dynamic thresholding
    clamps — before the fix, sampling always ran the hard-coded 0.9."""
    outs = {}
    for pct in (0.5, 1.0):
        pipe = _gauss(clip_denoised=True, thresholding_percentile=pct)
        params = pipe.init_params(jax.random.PRNGKey(0))
        outs[pct] = np.asarray(
            pipe.reverse_process(
                params, jax.random.PRNGKey(1), (2, 8, 8, 1), sampler="ddim",
            ),
        )
    assert np.isfinite(outs[0.5]).all() and np.isfinite(outs[1.0]).all()
    # an aggressive 0.5-quantile clamp must produce different samples than
    # the max-abs (1.0) clamp for the same weights and noise
    assert not np.allclose(outs[0.5], outs[1.0])


def test_timesteps_schedule_mismatch_rejected():
    with pytest.raises(ValueError, match="disagrees with the schedule"):
        DDPM(
            backbone="UNetv2",
            backbone_kwargs=_backbone_kwargs(),
            schedule=LinearSchedule(20, 2e-4, 1e-2),
            timesteps=10,
        )
    with pytest.raises(ValueError, match="disagrees with the schedule"):
        _gauss(timesteps=40)
    # equal values stay accepted (DiffusersDDPMPipeline passes both)
    pipe = _gauss(timesteps=20)
    assert pipe.timesteps == 20


def test_uniform_lambda_respacing_exact_count():
    """Coarse-in-lambda grids snap several targets to the same index; the
    spacing must spill collisions to neighbours, not silently drop steps."""
    for T, K in ((25, 20), (1000, 50), (30, 29)):
        beta = np.linspace(2e-4, 2e-2, T)
        coeffs = coefficients_from_betas(beta)
        use = space_timesteps_lambda(coeffs, K)
        assert len(use) == K, f"T={T}, K={K}: got {len(use)}"
        assert len(np.unique(use)) == K
        assert (np.diff(use) > 0).all()
        re = respace(coeffs, K, spacing="uniform-lambda")
        assert re.num_timesteps == K


def test_sampler_cache_keys_on_quant_mode():
    """Toggling set_conv_quant between generate() calls must re-trace, not
    silently reuse the float trace (the flag is read at trace time)."""
    from rho_diffusion_tpu.ops.quant import conv_quant

    pipe = _gauss()
    params = pipe.init_params(jax.random.PRNGKey(0))
    pipe.generate(params, jax.random.PRNGKey(1), batch_size=2, num_steps=4)
    assert len(pipe._sampler_cache) == 1
    with conv_quant("int8"):
        pipe.generate(params, jax.random.PRNGKey(1), batch_size=2, num_steps=4)
    assert len(pipe._sampler_cache) == 2  # a second, quantized trace


def test_min_snr_allows_callable_mse():
    def my_mse(pred, target):
        return ((pred - target) ** 2).mean()

    pipe = DDPM(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        loss_func=my_mse,
        loss_weighting="min_snr",
    )
    assert pipe.loss_weighting == "min_snr"


def test_named_schedule_half_specified_endpoints_rejected():
    with pytest.raises(ValueError, match="both beta_start and beta_end"):
        named_beta_schedule("linear", 500, beta_start=2e-4)
    with pytest.raises(ValueError, match="both beta_start and beta_end"):
        named_beta_schedule("scaled_linear", 500, beta_end=1e-2)
    # both-or-neither stays accepted
    assert len(named_beta_schedule("linear", 500)) == 500
    assert len(named_beta_schedule("linear", 500, 2e-4, 1e-2)) == 500
