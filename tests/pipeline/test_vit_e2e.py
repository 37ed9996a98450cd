"""VisionTransformer driven END-TO-END through a DDPM pipeline — train
steps and full reverse-process sampling. The reference shipped its ViT with
skipped tests ("ViT not currently being used",
reference tests/models/test_vit.py:29,54); here it is a first-class
backbone (VERDICT r2 item 10)."""
import jax
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import DDPM, LinearSchedule


@pytest.fixture(scope="module")
def pipe():
    return DDPM(
        backbone="VisionTransformer",
        backbone_kwargs=dict(
            patch_size=4,
            input_shapes=(8, 8),
            num_channels=1,
            embedding_dim=32,
            hidden_dim=64,
            activation="GELU",
            transformer_depth=2,
            num_heads=4,
            dropout=0.0,
        ),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
        ema_decay=0.9,
    )


def test_vit_ddpm_trains(pipe):
    rng = np.random.default_rng(0)
    batch = {
        "data": rng.uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32),
        "labels": None,
    }
    state = pipe.create_state(jax.random.PRNGKey(0))
    losses = []
    for _ in range(3):
        state, m = pipe.training_step(state, batch)
        losses.append(float(m["train_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3


def test_vit_ddpm_samples(pipe):
    state = pipe.create_state(jax.random.PRNGKey(1))
    out = pipe.reverse_process(
        state.params, jax.random.PRNGKey(2), pipe.sample_shape(2),
    )["denoised"]
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_sample_shape_from_input_shapes(pipe):
    assert pipe.sample_shape(3) == (3, 8, 8, 1)


def test_vit_conditional_seam():
    """Round-5 conditional extension: num_classes flags the conditional
    path; y may be precomputed embeddings or raw rows through a cond_fn —
    the same seam as the UNet (the reference ViT is unconditional,
    vit.py:324-339). Unconditional construction stays param-identical."""
    import jax.numpy as jnp

    from rho_diffusion_tpu.models import FourierConditioning, VisionTransformer

    kwargs = dict(
        patch_size=4, input_shapes=(8, 8), num_channels=1,
        embedding_dim=32, hidden_dim=64, transformer_depth=2,
        num_heads=4, dropout=0.0,
    )
    x = jnp.ones((2, 8, 8, 1))
    t = jnp.array([0, 1])

    # precomputed-embedding modality
    vit = VisionTransformer(**kwargs, num_classes=5)
    y_emb = jnp.ones((2, 16))
    params = vit.init(jax.random.PRNGKey(0), x, t, y_emb)["params"]
    out = vit.apply({"params": params}, x, t, y_emb)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    # conditioning reaches the output: different embeddings, different out
    y2 = jnp.concatenate([jnp.ones((1, 16)), -jnp.ones((1, 16))])
    out2 = vit.apply({"params": params}, x, t, y2)
    assert not np.allclose(np.asarray(out)[1], np.asarray(out2)[1])

    # raw parameter rows through a cond_fn module
    cond = FourierConditioning(
        parameter_space={"B": [100.0, 500.0]}, embedding_dim=16,
    )
    vit_c = VisionTransformer(**kwargs, num_classes=5, cond_fn=cond)
    y_rows = jnp.asarray([[150.0], [400.0]])
    params_c = vit_c.init(jax.random.PRNGKey(0), x, t, y_rows)["params"]
    out_c = vit_c.apply({"params": params_c}, x, t, y_rows)
    assert out_c.shape == x.shape and np.isfinite(np.asarray(out_c)).all()

    # unconditional stays param-identical to the parity version
    vit_u = VisionTransformer(**kwargs)
    params_u = vit_u.init(jax.random.PRNGKey(0), x, t)["params"]
    assert "cond_proj" not in params_u
