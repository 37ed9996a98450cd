"""RePaint-style inpainting (Lugmayr et al., arXiv:2201.09865).

New TPU-native capability: the reference's samplers only start from pure
noise (/root/reference/rho_diffusion/diffusion/gaussian_diffusion.py:558-652)
— it has no infilling/editing surface. ``GaussianDiffusionPipeline.inpaint``
regenerates the masked-out region of a known field with the full
conditioning/guidance/respacing machinery, as one jit-able ``lax.scan``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import GaussianDiffusionPipeline, LinearSchedule
from rho_diffusion_tpu.diffusion.sampling_rng import per_sample_keys

MC = 8


def _pipe(**kw):
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
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type="fixed_small",
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
        **kw,
    )


def _live_params(pipe):
    state = pipe.create_state(jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [
        l + 0.3 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.fixture(scope="module")
def setup():
    pipe = _pipe()
    params = _live_params(pipe)
    rng = np.random.default_rng(7)
    known = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 1)).astype(np.float32))
    mask = jnp.zeros((2, 8, 8, 1), np.float32).at[:, :4].set(1.0)  # top half known
    return pipe, params, known, mask


@pytest.mark.parametrize("sampler", ["ddpm", "ddim"])
def test_known_region_exact_and_finite(setup, sampler):
    """The mask==1 region of the output equals `known` exactly (the final
    q_sample projection has alphas_cumprod_prev[0] == 1, zero noise), and
    the generated region is finite and actually differs from `known`."""
    pipe, params, known, mask = setup
    out = pipe.inpaint(
        params, jax.random.PRNGKey(1), known, mask, sampler=sampler,
    )
    out = np.asarray(out)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(
        out[:, :4], np.asarray(known)[:, :4], atol=1e-6,
    )
    assert np.abs(out[:, 4:] - np.asarray(known)[:, 4:]).max() > 1e-3


def test_full_mask_returns_known(setup):
    """mask == 1 everywhere: the model never contributes to the output."""
    pipe, params, known, _ = setup
    out = pipe.inpaint(
        params, jax.random.PRNGKey(2), known, jnp.ones_like(known),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(known), atol=1e-6)


def test_respaced_resampled_and_jittable(setup):
    """num_steps respacing + resample_steps > 1 (the RePaint jump) work
    under an outer jit — the whole trajectory is one XLA program."""
    pipe, params, known, mask = setup

    fn = jax.jit(
        lambda p, r: pipe.inpaint(
            p, r, known, mask, sampler="ddim", num_steps=5, resample_steps=2,
        ),
    )
    out = np.asarray(fn(params, jax.random.PRNGKey(3)))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:, :4], np.asarray(known)[:, :4], atol=1e-6)


def test_per_row_keys_row_independence(setup):
    """With a [B] typed key batch, each row's fill is a pure function of
    its own key — independent of co-batched neighbours (serving contract)."""
    pipe, params, known, mask = setup
    keys = per_sample_keys(seed=11, n=2)
    out = np.asarray(pipe.inpaint(params, keys, known, mask, num_steps=5))

    # same rows inpainted in flipped batch order give identical results
    flip = jax.vmap(lambda i: keys[i])(jnp.asarray([1, 0]))
    out_flip = np.asarray(
        pipe.inpaint(params, flip, known[::-1], mask[::-1], num_steps=5),
    )
    np.testing.assert_allclose(out, out_flip[::-1], atol=1e-6)


def test_inpaint_rejects_multistep_sampler(setup):
    pipe, params, known, mask = setup
    with pytest.raises(ValueError, match="dpm"):
        pipe.inpaint(params, jax.random.PRNGKey(0), known, mask, sampler="dpm++")
    with pytest.raises(ValueError, match="resample_steps"):
        pipe.inpaint(
            params, jax.random.PRNGKey(0), known, mask, resample_steps=0,
        )
