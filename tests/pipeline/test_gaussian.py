"""Gaussian-diffusion functional math tests — closed-form and consistency
checks the reference lacked (its only pipeline tests were smoke-level,
reference tests/pipeline/test_lightning_ddpm.py). Uses trivial closure
models instead of the UNet so everything compiles in milliseconds."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import gaussian as g
from rho_diffusion_tpu.diffusion.schedule import LinearSchedule


@pytest.fixture(scope="module")
def coeffs():
    return g.coefficients_from_schedule(LinearSchedule(100))


def test_coefficients_honor_injected_schedule(coeffs):
    """The pipeline must use the config schedule's betas (the reference
    ignored them and rebuilt a cosine schedule, gaussian_diffusion.py:236)."""
    sch = LinearSchedule(100)
    np.testing.assert_allclose(
        np.asarray(coeffs.betas), np.asarray(sch.beta_t), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(coeffs.alphas_cumprod), np.asarray(sch.alpha_bar_t), rtol=1e-5,
    )


def test_q_sample_forward_consistency(coeffs):
    """x0 recovered from (x_t, eps) must invert q_sample exactly."""
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8, 8, 1))
    t = jnp.array([0, 10, 50, 99])
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    x_t = g.q_sample(coeffs, x0, t, eps)
    x0_hat = g.predict_xstart_from_eps(coeffs, x_t, t, eps)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=2e-4)
    eps_hat = g.predict_eps_from_xstart(coeffs, x_t, t, x0_hat)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps), atol=2e-3)


def test_posterior_at_t0_targets_x0(coeffs):
    """q(x_{t-1}|x_t, x_0) at t=0 has mean == x0 (coef1[0]+coef2[0]*... the
    posterior collapses onto x_start)."""
    x0 = jnp.ones((2, 4, 4, 1)) * 0.5
    x_t = jnp.ones_like(x0) * 0.3
    t = jnp.zeros((2,), jnp.int32)
    mean, var, _ = g.q_posterior_mean_variance(coeffs, x0, x_t, t)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x0), atol=1e-5)
    assert float(var[0, 0, 0, 0]) == 0.0


def test_training_losses_epsilon_mse_closed_form(coeffs):
    """With a model that returns a constant, EPSILON/MSE loss must equal
    mean((noise - const)^2) per sample."""
    x0 = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 1))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([5, 20, 80])
    const = 0.25

    terms = g.training_losses(
        coeffs,
        lambda x, tt: jnp.full_like(x, const),
        x0,
        t,
        noise,
        g.ModelMeanType.EPSILON,
        g.ModelVarType.FIXED_SMALL,
        g.LossType.MSE,
    )
    expected = np.mean(np.asarray((noise - const) ** 2), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(terms["loss"]), expected, rtol=1e-5)


def test_vb_zero_for_true_posterior(coeffs):
    """A model that outputs the TRUE posterior mean and log-variance gets
    (nearly) zero KL at t>0 — the VLB sanity check."""
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 1)) * 0.1
    t = jnp.array([30, 70])
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    x_t = g.q_sample(coeffs, x0, t, eps)
    true_mean, _, true_log_var = g.q_posterior_mean_variance(coeffs, x0, x_t, t)
    true_log_var = jnp.broadcast_to(true_log_var, true_mean.shape)

    def perfect_model(x, tt):
        # LEARNED variance: emit [mean, log_var] on the channel axis
        return jnp.concatenate([true_mean, true_log_var], axis=-1)

    out = g.vb_terms_bpd(
        coeffs, perfect_model, x0, x_t, t,
        g.ModelMeanType.PREVIOUS_X, g.ModelVarType.LEARNED,
    )
    assert np.asarray(out["output"]).max() < 1e-4


def test_dynamic_threshold_semantics():
    """Values beyond the 0.9 abs-quantile are clamped and rescaled; inputs
    already in [-1, 1] pass through (s clamps to 1)."""
    x = jnp.asarray(np.linspace(-0.9, 0.9, 64, dtype=np.float32)).reshape(1, 64)
    np.testing.assert_allclose(np.asarray(g.dynamic_threshold(x)), np.asarray(x))
    big = x * 10.0
    out = np.asarray(g.dynamic_threshold(big))
    s = np.quantile(np.abs(np.asarray(big)), 0.9)
    np.testing.assert_allclose(out.max(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(out, np.clip(np.asarray(big), -s, s) / s, rtol=1e-5)


def test_respace_preserves_alpha_bar(coeffs):
    """Respaced coefficients must hit the original alpha_bar at the mapped
    timesteps (the DDIM-respacing invariant)."""
    rs = g.respace(coeffs, 10)
    assert rs.num_timesteps == 10
    orig_ab = np.asarray(coeffs.alphas_cumprod)
    mapped = np.asarray(rs.timestep_map)
    np.testing.assert_allclose(
        np.asarray(rs.alphas_cumprod), orig_ab[mapped], rtol=1e-4,
    )


def test_ddim_eta0_deterministic(coeffs):
    """DDIM with eta=0 must be noise-free: two different RNGs give the same
    sample from the same x_T."""
    x_T = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 1))
    model = lambda x, t: x * 0.1

    def run(seed):
        return g.sample_loop(
            g.respace(coeffs, 5), model, x_T.shape, jax.random.PRNGKey(seed),
            g.ModelMeanType.EPSILON, g.ModelVarType.FIXED_SMALL,
            sampler="ddim", eta=0.0, x_T=x_T,
        )

    np.testing.assert_array_equal(np.asarray(run(0)), np.asarray(run(123)))


def test_ddpm_sampler_stochastic(coeffs):
    x_T = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 1))
    model = lambda x, t: x * 0.1
    a = g.sample_loop(
        g.respace(coeffs, 5), model, x_T.shape, jax.random.PRNGKey(0),
        g.ModelMeanType.EPSILON, g.ModelVarType.FIXED_SMALL, x_T=x_T,
    )
    b = g.sample_loop(
        g.respace(coeffs, 5), model, x_T.shape, jax.random.PRNGKey(1),
        g.ModelMeanType.EPSILON, g.ModelVarType.FIXED_SMALL, x_T=x_T,
    )
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_progressive_returns_frames(coeffs):
    rs = g.respace(coeffs, 4)
    model = lambda x, t: x * 0.0
    x, frames = g.sample_loop(
        rs, model, (1, 8, 1), jax.random.PRNGKey(0),
        g.ModelMeanType.EPSILON, g.ModelVarType.FIXED_LARGE,
        sampler="ddim", progressive=True,
    )
    assert frames.shape == (4, 1, 8, 1)
    np.testing.assert_array_equal(np.asarray(frames[-1]), np.asarray(x))


def test_prior_bpd_small_for_standard_normal(coeffs):
    """q(x_T|x0) for x0 ~ 0 is ~N(0,1) under a full schedule, so the prior
    KL must be tiny."""
    x0 = jnp.zeros((2, 32, 1))
    bpd = g.prior_bpd(coeffs, x0)
    assert np.asarray(bpd).max() < 0.01


def test_calc_bpd_loop_shapes(coeffs):
    rs = g.respace(coeffs, 8)
    model = lambda x, t: jnp.zeros_like(x)
    out = g.calc_bpd_loop(
        rs, model, jnp.zeros((2, 8, 1)), jax.random.PRNGKey(0),
        g.ModelMeanType.EPSILON, g.ModelVarType.FIXED_SMALL,
    )
    assert out["vb"].shape == (2, 8)
    assert out["total_bpd"].shape == (2,)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()


def test_classifier_guidance_moves_mean(coeffs):
    """condition_mean shifts the posterior mean along the classifier grad
    (reference :473-487); condition_score recomputes x0/mean (:489-510)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 1))
    t = jnp.array([50, 50])
    model = lambda xx, tt: xx * 0.1
    out = g.p_mean_variance(
        coeffs, model, x, t, g.ModelMeanType.EPSILON, g.ModelVarType.FIXED_SMALL,
    )
    grad_fn = lambda xx, tt: jnp.ones_like(xx)
    new_mean = g.condition_mean(coeffs, grad_fn, out, x, t)
    np.testing.assert_allclose(
        np.asarray(new_mean - out["mean"]),
        np.broadcast_to(np.asarray(out["variance"]), new_mean.shape),
        rtol=1e-3, atol=1e-6,  # (mean+v)-mean loses low bits in f32
    )
    out2 = g.condition_score(coeffs, grad_fn, out, x, t)
    assert not np.allclose(np.asarray(out2["mean"]), np.asarray(out["mean"]))


def test_learned_range_variance_interpolates(coeffs):
    """LEARNED_RANGE: v=-1 -> posterior (min) log-var, v=+1 -> beta (max)."""
    x = jnp.zeros((1, 4, 1))
    t = jnp.array([50])
    for v, table in [
        (-1.0, coeffs.posterior_log_variance_clipped),
        (1.0, jnp.log(coeffs.betas)),
    ]:
        model = lambda xx, tt, vv=v: jnp.concatenate(
            [jnp.zeros_like(xx), jnp.full_like(xx, vv)], axis=-1,
        )
        out = g.p_mean_variance(
            coeffs, model, x, t, g.ModelMeanType.EPSILON,
            g.ModelVarType.LEARNED_RANGE, clip_denoised=False,
        )
        np.testing.assert_allclose(
            np.asarray(out["log_variance"][0, 0, 0]), float(table[50]), rtol=1e-5,
        )


def test_ddim_encode_decode_roundtrip(coeffs):
    """DDIM reverse-ODE encode then eta=0 decode approximately recovers the
    input (exact in the continuum limit; loose here at T=10)."""
    rs = g.respace(coeffs, 10)
    model = lambda x, t: x * 0.05
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 1)) * 0.3

    # a single interior reverse-ODE step must be inverted by the matching
    # eta=0 DDIM step: encode t -> t+1, decode at t+1 -> t
    t_enc = jnp.full((2,), 4, jnp.int32)
    x_up, _ = g.ddim_reverse_step(
        rs, model, x0, t_enc, g.ModelMeanType.EPSILON,
        g.ModelVarType.FIXED_SMALL, clip_denoised=False,
    )
    x_back, _ = g.ddim_sample_step(
        rs, model, x_up, t_enc + 1, jax.random.PRNGKey(0),
        g.ModelMeanType.EPSILON, g.ModelVarType.FIXED_SMALL,
        clip_denoised=False, eta=0.0,
    )
    # first-order ODE discretisation error across a 10x-respaced step
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x0), atol=2e-2)

    # and the full encode loop runs finite end-to-end
    x_T = g.encode_loop(
        rs, model, x0, g.ModelMeanType.EPSILON, g.ModelVarType.FIXED_SMALL,
    )
    assert np.isfinite(np.asarray(x_T)).all()
