"""Classifier-free guidance (Ho & Salimans, arXiv:2207.12598).

New TPU-native capability on top of the reference's conditioning surface
(unet_v2.py:702-719): per-sample conditioning dropout during training
(``cond_dropout``) and guided sampling (``guidance_scale``) as one batched
2B forward. The reference has no CFG at all — its only guidance is the
stubbed classifier path (conditioning.py:142-155).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import (
    DDPM,
    GaussianDiffusionPipeline,
    LinearSchedule,
)

MC = 8
EMB = 4 * MC  # time-embedding width == sha512 hash-conditioning width


def _pipe(out_channels=1, **kw):
    return GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(8, 8),
            dims=2,
            in_channels=1,
            out_channels=out_channels,
            model_channels=MC,
            num_res_blocks=1,
            channel_mult=(1, 2),
            attention_resolutions=[],
            num_heads=1,
            num_classes=1,  # enables the conditioning branch (hash path)
        ),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        model_mean_type="epsilon",
        model_var_type=kw.pop("model_var_type", "fixed_large"),
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
        **kw,
    )


@pytest.fixture(scope="module")
def cond_batch():
    rng = np.random.default_rng(0)
    return {
        "data": rng.uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32),
        "labels": rng.normal(size=(4, EMB)).astype(np.float32),
    }


def _live_params(pipe):
    """Perturb every weight off init: the zero-init ResBlock out-convs are
    the only route for the conditioning embedding, so fresh (or barely
    trained) params would make every comparison here vacuous — the lesson
    of the round-3 Downsample-padding bug the zero-masked parity tests hid."""
    state = pipe.create_state(jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [
        l + 0.3 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.mark.heavy
def test_cond_mask_semantics(cond_batch):
    """mask=1 == no mask; mask=0 makes the conditioning vanish (null cond)."""
    pipe = _pipe()
    params = _live_params(pipe)
    x = jnp.asarray(cond_batch["data"])
    y = jnp.asarray(cond_batch["labels"])
    t = jnp.zeros((4,), jnp.int32) + 3

    base = pipe.apply(params, x, t, y)
    ones = pipe.apply(params, x, t, y, cond_mask=jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(base), np.asarray(ones), atol=1e-6)

    # masked-out rows ignore y entirely
    zeros_a = pipe.apply(params, x, t, y, cond_mask=jnp.zeros((4,)))
    zeros_b = pipe.apply(params, x, t, y * 7.0, cond_mask=jnp.zeros((4,)))
    np.testing.assert_allclose(
        np.asarray(zeros_a), np.asarray(zeros_b), atol=1e-6,
    )
    # and differ from the conditioned output
    assert float(np.abs(np.asarray(zeros_a) - np.asarray(base)).max()) > 1e-6


def test_cond_dropout_training(cond_batch):
    pipe = _pipe(cond_dropout=0.5)
    state = pipe.create_state(jax.random.PRNGKey(0))
    for _ in range(2):
        state, m = pipe.training_step(state, cond_batch)
    assert np.isfinite(float(m["train_loss"]))


def test_cond_dropout_validation():
    with pytest.raises(ValueError, match="cond_dropout"):
        _pipe(cond_dropout=1.5)


def test_cfg_requires_capable_backbone():
    """Backbones without cond_mask support fail AT CONSTRUCTION (not with a
    flax kwarg TypeError mid-trace on training step 1), and guided sampling
    on them fails with the same clear error."""
    import re

    from rho_diffusion_tpu.diffusion import DDPM

    def _simple(**kw):
        return DDPM(
            backbone="UNet",  # the v1 simple UNet has no cond_mask hook
            backbone_kwargs=dict(
                input_channels=1, down_channels=(8, 16), up_channels=(16, 8),
                dims=2,
            ),
            schedule=LinearSchedule(20, 2e-4, 1e-2),
            optimizer="AdamW",
            sampling_batch_size=2,
            **kw,
        )

    with pytest.raises(ValueError, match=re.escape("cond_mask")):
        _simple(cond_dropout=0.1)

    pipe = _simple()
    params = pipe.backbone.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)),
        jnp.zeros((2,), jnp.int32),
    )["params"]
    with pytest.raises(ValueError, match=re.escape("cond_mask")):
        pipe.reverse_process(
            params, jax.random.PRNGKey(1), (2, 8, 8, 1),
            conditions=jnp.zeros((2, 4)), guidance_scale=2.0,
        )


def test_guided_model_fn_closed_form(cond_batch):
    """guided == uncond + s*(cond - uncond), computed per-row via masks."""
    pipe = _pipe()
    params = _live_params(pipe)
    y = jnp.asarray(cond_batch["labels"][:2])
    x = jnp.asarray(cond_batch["data"][:2])
    t = jnp.zeros((2,), jnp.int32) + 5
    s = 3.0

    guided = pipe._model_fn(params, y, guidance_scale=s)(x, t)
    cond = pipe.apply(params, x, t, y, cond_mask=jnp.ones((2,)))
    uncond = pipe.apply(params, x, t, y, cond_mask=jnp.zeros((2,)))
    expect = uncond + s * (cond - uncond)
    np.testing.assert_allclose(
        np.asarray(guided), np.asarray(expect), atol=1e-5,
    )

    # scale 1 (or None) short-circuits to the plain conditional model
    plain = pipe._model_fn(params, y, guidance_scale=1.0)(x, t)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(cond), atol=1e-6)


def test_guided_learned_range_variance_from_cond_pass(cond_batch):
    """LEARNED_RANGE: only the mean half is guided; the variance half must
    come from the conditional pass (guided-diffusion convention)."""
    pipe = _pipe(out_channels=2, model_var_type="learned_range")
    params = _live_params(pipe)
    y = jnp.asarray(cond_batch["labels"][:2])
    x = jnp.asarray(cond_batch["data"][:2])
    t = jnp.zeros((2,), jnp.int32) + 5

    guided = pipe._model_fn(params, y, guidance_scale=4.0)(x, t)
    cond = pipe.apply(params, x, t, y, cond_mask=jnp.ones((2,)))
    assert guided.shape == cond.shape == (2, 8, 8, 2)
    # atol 1e-5: the guided pass runs one 2B-batched forward whose GroupNorm
    # reductions order differently than the separate B-batch forward
    np.testing.assert_allclose(
        np.asarray(guided[..., 1:]), np.asarray(cond[..., 1:]), atol=1e-5,
    )


def _ddpm_pipe(**kw):
    return DDPM(
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
            num_classes=1,
        ),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
        **kw,
    )


@pytest.mark.heavy
def test_ddpm_cond_dropout_training(cond_batch):
    """The DDPM pipeline trains with conditioning dropout too — and with
    dropout OFF its RNG stream (loss) is unchanged vs a no-CFG pipeline."""
    pipe = _ddpm_pipe(cond_dropout=0.5)
    state = pipe.create_state(jax.random.PRNGKey(0))
    for _ in range(2):
        state, m = pipe.training_step(state, cond_batch)
    assert np.isfinite(float(m["train_loss"]))

    plain, with_zero = _ddpm_pipe(), _ddpm_pipe(cond_dropout=0.0)
    s1 = plain.create_state(jax.random.PRNGKey(0))
    s2 = with_zero.create_state(jax.random.PRNGKey(0))
    _, m1 = plain.training_step(s1, cond_batch)
    _, m2 = with_zero.training_step(s2, cond_batch)
    assert float(m1["train_loss"]) == float(m2["train_loss"])

    with pytest.raises(ValueError, match="cond_dropout"):
        _ddpm_pipe(cond_dropout=-0.1)


def test_ddpm_guided_sampling(cond_batch):
    """DDPM ancestral sampling honours guidance_scale: scale 1 reproduces
    the unguided trajectory exactly, scale != 1 changes it, all finite."""
    pipe = _ddpm_pipe(cond_dropout=0.2)
    params = _live_params(pipe)
    y = jnp.asarray(cond_batch["labels"][:2])
    shape = (2, 8, 8, 1)

    unguided = pipe.reverse_process(params, jax.random.PRNGKey(3), shape, y)
    same = pipe.reverse_process(
        params, jax.random.PRNGKey(3), shape, y, guidance_scale=1.0,
    )
    guided = pipe.reverse_process(
        params, jax.random.PRNGKey(3), shape, y, guidance_scale=3.0,
    )
    np.testing.assert_allclose(
        np.asarray(same["denoised"]), np.asarray(unguided["denoised"]), atol=1e-6,
    )
    assert np.isfinite(np.asarray(guided["denoised"])).all()
    assert float(np.abs(
        np.asarray(guided["denoised"]) - np.asarray(unguided["denoised"]),
    ).max()) > 1e-6

    # generate() surface passes the scale through (explicit conditions —
    # hash embeddings have a 128-dim floor, this test model's emb is 32)
    out = pipe.generate(
        params, jax.random.PRNGKey(4), batch_size=2,
        conditions=y, guidance_scale=2.0,
    )
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.heavy
def test_sampling_with_guidance(cond_batch):
    """End-to-end guided sampling: finite, differs from unguided, and
    scale=1.0 reproduces the unguided trajectory exactly."""
    pipe = _pipe(cond_dropout=0.2)
    params = _live_params(pipe)
    y = jnp.asarray(cond_batch["labels"][:2])
    common = dict(shape=(2, 8, 8, 1), conditions=y, num_steps=5)

    for sampler in ("ddim", "ddpm", "dpm++"):
        unguided = pipe.reverse_process(
            params, jax.random.PRNGKey(2), sampler=sampler, **common,
        )
        guided = pipe.reverse_process(
            params, jax.random.PRNGKey(2), sampler=sampler,
            guidance_scale=3.0, **common,
        )
        same = pipe.reverse_process(
            params, jax.random.PRNGKey(2), sampler=sampler,
            guidance_scale=1.0, **common,
        )
        assert np.isfinite(np.asarray(guided)).all(), sampler
        assert float(np.abs(np.asarray(guided) - np.asarray(unguided)).max()) > 1e-6
        np.testing.assert_allclose(
            np.asarray(same), np.asarray(unguided), atol=1e-6, err_msg=sampler,
        )
