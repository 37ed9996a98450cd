"""Progressive distillation (Salimans & Ho, arXiv:2202.00512).

New TPU-native capability — the reference's only fast-sampling story is
DDIM striding (gaussian_diffusion.py:654-702); it has no distillation
surface. Key invariants tested here:

* the trailing grid is closed under halving (each stage's student grid IS
  the next stage's teacher grid);
* the one-step target inversion is algebraically exact: with an oracle
  teacher (predicts the true noise), the distillation target equals the
  true x0 to float tolerance at every student index;
* a full halving cascade runs jitted end to end and the distilled-grid
  sampler returns finite samples in exactly n model evaluations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import (
    GaussianDiffusionPipeline,
    LinearSchedule,
    ModelMeanType,
    ModelVarType,
    ProgressiveDistiller,
    distill_grid,
    distilled_coefficients,
)
from rho_diffusion_tpu.diffusion.distill import distill_targets, nested_grids
from rho_diffusion_tpu.diffusion.gaussian import (
    coefficients_from_schedule,
    q_sample,
)


def test_trailing_grid_closed_under_halving():
    for T, n in [(1000, 64), (1000, 8), (100, 20), (64, 64)]:
        g = distill_grid(T, n)
        assert g[-1] == T - 1  # always tops out at full noise
        assert len(g) == n
        np.testing.assert_array_equal(g[1::2], distill_grid(T, n // 2))


def test_nested_grids_validation():
    c = coefficients_from_schedule(LinearSchedule(100))
    with pytest.raises(ValueError, match="even"):
        nested_grids(c, 7)
    with pytest.raises(ValueError, match="exceeds"):
        nested_grids(c, 200)


def test_oracle_teacher_target_is_true_x0():
    """With a teacher that predicts the exact noise, two DDIM steps stay on
    the trajectory x_t = a(t) x0 + s(t) eps, and the inverted single-step
    target must be the true x0 — at EVERY student index."""
    c = coefficients_from_schedule(LinearSchedule(100, 2e-4, 2e-2))
    c_t, c_s = nested_grids(c, 16)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-1, 1, (8, 5, 5, 1)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(8, 5, 5, 1)).astype(np.float32))

    acp_full = jnp.asarray(c.alphas_cumprod)

    def oracle(x, t_orig):
        a = jnp.sqrt(acp_full[t_orig]).reshape(-1, 1, 1, 1)
        s = jnp.sqrt(1.0 - acp_full[t_orig]).reshape(-1, 1, 1, 1)
        return (x - a * x0) / s

    for j_val in [0, 3, 7]:
        j = jnp.full((8,), j_val, jnp.int32)
        x_t = q_sample(c_s, x0, j, eps)
        tgt = distill_targets(
            c_t, c_s, oracle, x_t, j,
            ModelMeanType.EPSILON, ModelVarType.FIXED_SMALL,
            clip_denoised=False,
        )
        np.testing.assert_allclose(
            np.asarray(tgt), np.asarray(x0), atol=5e-4,
        )


MC = 8


def _pipe():
    return GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(8, 8),
            dims=2,
            in_channels=1,
            out_channels=1,
            model_channels=MC,
            num_res_blocks=1,
            channel_mult=(1, 2),
            attention_resolutions=[],
            num_heads=1,
        ),
        schedule=LinearSchedule(32, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_small",
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
    )


@pytest.mark.heavy
def test_distill_cascade_and_grid_sampler():
    """8 -> 4 -> 2 cascade on a tiny UNet: losses finite, per-stage curves
    recorded, and the distilled-grid 2-step sampler returns finite samples
    of the right shape."""
    pipe = _pipe()
    params = pipe.create_state(jax.random.PRNGKey(0)).params
    rng = np.random.default_rng(1)
    batches = [
        {"data": rng.uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32),
         "labels": None}
        for _ in range(2)
    ]
    d = ProgressiveDistiller(pipe, opt_kwargs={"lr": 1e-3})
    student, info = d.distill(
        params, batches, from_steps=8, to_steps=2,
        updates_per_stage=3, rng=jax.random.PRNGKey(2),
    )
    assert set(info) == {"8->4", "4->2"}
    assert all(np.isfinite(l) for ls in info.values() for l in ls)

    out = d.sample(student, jax.random.PRNGKey(3), (2, 8, 8, 1), n_steps=2)
    out = np.asarray(out)
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(out).all()


def test_distilled_coefficients_match_training_grid():
    """d.sample's table == the student grid of the last stage (the whole
    point of the trailing grid: what is trained is what is sampled)."""
    c = coefficients_from_schedule(LinearSchedule(64))
    _, c_s = nested_grids(c, 8)
    c_d = distilled_coefficients(c, 4)
    np.testing.assert_array_equal(
        np.asarray(c_s.timestep_map), np.asarray(c_d.timestep_map),
    )
    np.testing.assert_allclose(
        np.asarray(c_s.alphas_cumprod), np.asarray(c_d.alphas_cumprod),
    )


def test_distill_validation():
    pipe = _pipe()
    d = ProgressiveDistiller(pipe)
    params = pipe.create_state(jax.random.PRNGKey(0)).params
    with pytest.raises(ValueError, match="2\\^k multiple"):
        d.distill(params, [], from_steps=6, to_steps=4,
                  updates_per_stage=1, rng=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="truncated_snr"):
        ProgressiveDistiller(pipe, loss_weight="nope")
