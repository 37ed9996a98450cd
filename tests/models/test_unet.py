"""nd-UNet shape/NaN tests across dims 1/2/3 and conditioning modalities
(reference had only a single 2D forward test, tests/models/test_unet.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.models import MultiEmbeddings, UNet
from rho_diffusion_tpu.registry import registry


def _build(dims, spatial, **kw):
    kwargs = dict(
        data_shape=spatial,
        in_channels=1,
        out_channels=1,
        model_channels=16,
        num_res_blocks=1,
        channel_mult=(1, 2),
        attention_resolutions=[2],
        num_heads=2,
        dims=dims,
        use_scale_shift_norm=True,
    )
    kwargs.update(kw)
    return UNet(**kwargs)


def test_registry_lookup():
    assert registry.get("models", "UNetv2") is UNet


@pytest.mark.parametrize(
    "dims,spatial",
    [(1, (16,)), (2, (8, 8)), (3, (4, 8, 8))],
)
def test_forward_shapes_nd(dims, spatial):
    model = _build(dims, spatial)
    x = jnp.ones((2, *spatial, 1))
    t = jnp.array([0, 5])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == x.shape
    assert jnp.isfinite(out).all()


def test_zero_init_output_head():
    """Output conv is zero-initialised (reference unet_v2.py:679-683), so an
    untrained model predicts exactly zero."""
    model = _build(2, (8, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    t = jnp.array([3, 7])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_conditioning_modalities():
    """1-D class ids, 2-D parameter rows, and 2-D precomputed embeddings
    must all be accepted (reference unet_v2.py:702-719)."""
    space = {"l": [0, 1, 2], "m": [-1, 0, 1]}
    cond = MultiEmbeddings(parameter_space=space, embedding_dim=64)
    model = _build(2, (8, 8), num_classes=9, cond_fn=cond)
    x = jnp.ones((2, 8, 8, 1))
    t = jnp.array([0, 1])

    # 2-D raw parameter rows -> MultiEmbeddings lookup-sum
    y_rows = jnp.asarray([[0.0, -1.0], [2.0, 1.0]])
    params = model.init(jax.random.PRNGKey(0), x, t, y_rows)["params"]
    out = model.apply({"params": params}, x, t, y_rows)
    assert out.shape == x.shape

    # 2-D precomputed embeddings with shape == emb -> added directly
    y_emb = jnp.ones((2, 16 * 4))
    out2 = model.apply({"params": params}, x, t, y_emb)
    assert out2.shape == x.shape

    # different rows give different outputs after perturbing params away
    # from the zero-init head: compare pre-head activations via embeddings
    e1 = cond.apply(
        {"params": params["cond_fn"]}, jnp.asarray([[0.0, -1.0]]),
    )
    e2 = cond.apply(
        {"params": params["cond_fn"]}, jnp.asarray([[2.0, 1.0]]),
    )
    assert not np.allclose(np.asarray(e1), np.asarray(e2))


def test_multiembeddings_sum_semantics():
    """Embedding of a row equals the SUM of per-parameter table rows
    (reference conditioning.py:124-139)."""
    space = {"a": [10, 20], "b": [5, 6, 7]}
    cond = MultiEmbeddings(parameter_space=space, embedding_dim=8)
    y = jnp.asarray([[20.0, 6.0]])
    params = cond.init(jax.random.PRNGKey(0), y)["params"]
    out = cond.apply({"params": params}, y)
    expected = (
        params["embedding_a"]["embedding"][1] + params["embedding_b"]["embedding"][1]
    )
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(expected), rtol=1e-6)


def test_multiembeddings_1d_labels():
    space = {"digit": list(range(10))}
    cond = MultiEmbeddings(parameter_space=space, embedding_dim=8)
    y = jnp.asarray([3, 7])
    params = cond.init(jax.random.PRNGKey(0), y)["params"]
    out = cond.apply({"params": params}, y)
    assert out.shape == (2, 8)


def test_3d_downsample_inner_dims_only():
    """3D UNet downsamples only the inner two spatial dims
    (reference unet_v2.py:124-129, 153): a (4, 8, 8) volume survives two
    levels without the leading dim shrinking."""
    model = _build(3, (4, 8, 8))
    x = jnp.ones((1, 4, 8, 8, 1))
    t = jnp.array([0])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == x.shape


def test_remat_variant_matches():
    """use_checkpoint only changes memory, not values."""
    kwargs = dict(dims=2, spatial=(8, 8))
    m1 = _build(**kwargs)
    m2 = _build(**kwargs, use_checkpoint=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
    t = jnp.array([1, 2])
    params = m1.init(jax.random.PRNGKey(0), x, t)["params"]
    o1 = m1.apply({"params": params}, x, t)
    o2 = m2.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


@pytest.mark.heavy
def test_degenerate_depth_config_warns():
    """Regression fence for the bisected backend bug (RESULTS.md "Known
    backend issue"): 3D configs whose deep levels collapse to spatial
    (N, 1, 1) produce one NaN gradient leaf on the tunneled-TPU backend.
    The UNet must warn on such configs at trace time so users choose a
    shallower channel_mult or a larger grid; this pins the warning path."""
    import warnings

    import jax
    import jax.numpy as jnp

    from rho_diffusion_tpu.models import UNet

    model = UNet(
        data_shape=(8, 8, 8), dims=3, in_channels=1, out_channels=1,
        model_channels=8, num_res_blocks=1, channel_mult=(1, 2, 4, 8),
        attention_resolutions=[],
    )
    x = jnp.zeros((1, 8, 8, 8, 1))
    t = jnp.zeros((1,), jnp.int32)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        model.init(jax.random.PRNGKey(0), x, t)
    assert any("shrinks below the 3x3" in str(w.message) for w in caught)

    # a healthy config (inner dims stay >= 3 at the deepest level) is quiet
    ok = UNet(
        data_shape=(8, 8, 8), dims=3, in_channels=1, out_channels=1,
        model_channels=8, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=[],
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ok.init(jax.random.PRNGKey(0), x, t)
    assert not any("shrinks below" in str(w.message) for w in caught)


class TestFourierConditioning:
    """Continuous Fourier-feature conditioner (round 5): the held-out-
    condition generalization seam MultiEmbeddings structurally lacks —
    an unseen grid value keeps a random-init embedding row there, while
    the Fourier map is smooth in the raw parameter value."""

    def _cond(self, **kw):
        from rho_diffusion_tpu.models import FourierConditioning

        space = {"s": [0.25, 0.5, 1.0], "t": list(range(300, 655, 5))}
        return FourierConditioning(parameter_space=space, embedding_dim=64, **kw)

    def test_registry_and_shapes(self):
        from rho_diffusion_tpu.models import FourierConditioning

        assert registry.get("layers", "FourierConditioning") is FourierConditioning
        cond = self._cond()
        y = jnp.asarray([[0.25, 300.0], [1.0, 650.0]])
        params = cond.init(jax.random.PRNGKey(0), y)
        out = cond.apply(params, y)
        assert out.shape == (2, 64)
        assert np.isfinite(np.asarray(out)).all()
        # jit-safe (static normalisation constants, no data-dep shapes)
        out_j = jax.jit(lambda p, y: cond.apply(p, y))(params, y)
        np.testing.assert_allclose(np.asarray(out_j), np.asarray(out), atol=1e-6)

    def test_smooth_in_parameter(self):
        """Embeddings must be CONTINUOUS in the raw value: a 2.5 Myr
        perturbation moves the embedding far less than a 175 Myr one —
        the property that makes held-out-t interpolation possible at all
        (MultiEmbeddings has no such structure: each grid value is an
        independent row)."""
        cond = self._cond()
        base = jnp.asarray([[0.5, 450.0]])
        params = cond.init(jax.random.PRNGKey(0), base)
        e = lambda t: np.asarray(cond.apply(params, jnp.asarray([[0.5, t]])))
        d_near = np.linalg.norm(e(452.5) - e(450.0))
        d_far = np.linalg.norm(e(625.0) - e(450.0))
        assert d_near < 0.15 * d_far, (d_near, d_far)

    def test_unet_end_to_end(self):
        """Same cond_fn seam as MultiEmbeddings: raw parameter rows into
        the UNet's conditioning hook."""
        cond = self._cond()
        model = _build(2, (8, 8), num_classes=71, cond_fn=cond)
        x = jnp.ones((2, 8, 8, 1))
        t = jnp.array([0, 1])
        y = jnp.asarray([[0.25, 400.0], [1.0, 500.0]])
        params = model.init(jax.random.PRNGKey(0), x, t, y)["params"]
        out = model.apply({"params": params}, x, t, y)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_pipeline_config_seam(self):
        """cond_fn='FourierConditioning' resolves through the registry the
        same way the reference resolves 'MultiEmbeddings' from config
        (reference abstract_diffusion.py:64-75)."""
        from rho_diffusion_tpu.diffusion import (
            GaussianDiffusionPipeline,
            LinearSchedule,
        )

        pipe = GaussianDiffusionPipeline(
            backbone="UNetv2",
            backbone_kwargs=dict(
                data_shape=(8, 8), dims=2, in_channels=1, out_channels=1,
                model_channels=8, num_res_blocks=1, channel_mult=(1, 2),
                attention_resolutions=[], num_heads=1, num_classes=3,
                cond_fn="FourierConditioning",
            ),
            cond_fn_kwargs={
                "parameter_space": {"s": [0.25, 0.5, 1.0]},
                "embedding_dim": 32,
            },
            schedule=LinearSchedule(40, 2e-4, 1e-2),
            model_mean_type="epsilon",
            optimizer="AdamW",
        )
        state = pipe.create_state(jax.random.PRNGKey(0))
        x = jnp.ones((2, 8, 8, 1))
        y = jnp.asarray([[0.5], [1.0]])
        state, metrics = pipe.train_step(
            state, {"data": np.asarray(x), "labels": np.asarray(y)},
        )
        assert np.isfinite(float(metrics["train_loss"]))
