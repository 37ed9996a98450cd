"""Karras rho=7 respacing grid (arXiv:2206.00364 eq. 5).

A new fast-sampling spacing the reference's DDIM striding could not express:
steps concentrate near sigma_min where the probability-flow ODE's curvature
concentrates, anchored at the terminal step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import GaussianDiffusionPipeline, LinearSchedule
from rho_diffusion_tpu.diffusion.gaussian import (
    coefficients_from_betas,
    respace,
    space_timesteps,
    space_timesteps_karras,
)
from rho_diffusion_tpu.diffusion.schedule import named_beta_schedule


def _coeffs(T=1000, name="linear", **kw):
    sched = named_beta_schedule(name, T, **kw)
    return coefficients_from_betas(np.asarray(sched.beta_t, np.float64))


@pytest.mark.parametrize("T,n", [(1000, 10), (1000, 50), (100, 25), (50, 49)])
def test_grid_properties(T, n):
    c = _coeffs(T)
    use = space_timesteps_karras(c, n)
    assert use.shape == (n,)
    assert len(np.unique(use)) == n  # collision spill keeps all evals
    assert (np.diff(use) > 0).all()
    assert use[-1] == T - 1  # sigma_max anchor: starts from full noise
    assert use[0] == 0  # sigma_min end: finishes the trajectory


def test_denser_near_low_noise_than_uniform():
    """rho=7 concentrates steps at small sigma (low t). Note the grid is
    dense at BOTH ends in t-space for a VP schedule (half the sigma^(1/rho)
    linspace maps into the steep high-t region), so assert low-t density
    directly rather than via the t-median: more karras points below t=100
    than uniform striding, and a tighter first gap."""
    c = _coeffs(1000)
    karras = space_timesteps_karras(c, 20)
    uniform = space_timesteps(1000, 20)
    assert (karras < 100).sum() > (uniform < 100).sum()
    assert karras[1] - karras[0] < uniform[1] - uniform[0]


def test_degenerate_and_invalid():
    c = _coeffs(50)
    # n >= T: identity grid
    np.testing.assert_array_equal(space_timesteps_karras(c, 50), np.arange(50))
    # zero-terminal-SNR: sigma_max is inf — rejected with guidance
    cz = _coeffs(50, zero_terminal_snr=True)
    with pytest.raises(ValueError, match="trailing"):
        space_timesteps_karras(cz, 10)


def test_respace_dispatch_and_tables():
    c = _coeffs(200)
    r = respace(c, 12, spacing="karras")
    assert r.num_timesteps == 12
    assert int(r.timestep_map[-1]) == 199
    # rebuilt tables are a consistent schedule: abar matches the subset
    np.testing.assert_allclose(
        np.asarray(r.alphas_cumprod),
        np.asarray(c.alphas_cumprod)[np.asarray(r.timestep_map)],
        rtol=1e-5,
    )
    with pytest.raises(ValueError, match="karras"):
        respace(c, 12, spacing="nope")


def test_ddim_karras_end_to_end():
    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(8, 8),
            dims=2,
            in_channels=1,
            out_channels=1,
            model_channels=8,
            num_res_blocks=1,
            channel_mult=(1, 2),
            attention_resolutions=[],
            num_heads=1,
        ),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        optimizer="AdamW",
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    out = pipe.reverse_process(
        state.params, jax.random.PRNGKey(1), (2, 8, 8, 1), None,
        sampler="ddim", num_steps=6, spacing="karras",
    )
    assert np.isfinite(np.asarray(out)).all()
    # a different grid than uniform-t: same seed, different trajectory
    out_u = pipe.reverse_process(
        state.params, jax.random.PRNGKey(1), (2, 8, 8, 1), None,
        sampler="ddim", num_steps=6, spacing="uniform-t",
    )
    assert not np.allclose(np.asarray(out), np.asarray(out_u))
