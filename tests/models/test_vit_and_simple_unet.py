"""ViT and baseline-UNet shape tests across dims — the reference skipped its
ViT tests entirely ("ViT not currently being used",
reference tests/models/test_vit.py:29,54); ours run."""
import jax
import jax.numpy as jnp
import pytest

from rho_diffusion_tpu.models import SimpleUNet, VisionTransformer
from rho_diffusion_tpu.registry import registry


@pytest.mark.parametrize(
    "shapes,patch",
    [((16,), 4), ((8, 8), 4), ((8, 8, 8), 4)],
)
def test_vit_forward_shapes(shapes, patch):
    model = VisionTransformer(
        patch_size=patch,
        input_shapes=shapes,
        num_channels=1,
        embedding_dim=32,
        hidden_dim=64,
        activation="GELU",
        transformer_depth=2,
        num_heads=4,
        dropout=0.0,
    )
    x = jnp.ones((2, *shapes, 1))
    t = jnp.array([0, 3])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == x.shape
    assert jnp.isfinite(out).all()


def test_vit_registered():
    assert registry.get("models", "VisionTransformer") is VisionTransformer


@pytest.mark.parametrize("block_type,dims", [("UNetBlock2d", 2), ("UNetBlock3d", 3)])
def test_simple_unet_forward(block_type, dims):
    model = SimpleUNet(
        input_channels=1,
        block_type=block_type,
        down_channels=(8, 16, 32),
        up_channels=(32, 16, 8),
        time_embedding_dim=16,
    )
    spatial = (8,) * dims
    x = jnp.ones((2, *spatial, 1))
    t = jnp.array([1, 2])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == x.shape
    assert jnp.isfinite(out).all()


def test_simple_unet_registered_as_UNet():
    assert registry.get("models", "UNet") is SimpleUNet


def test_unet_diffuser_shim():
    """UNet_Diffuser parity shim: 2D fixed-architecture wrapper."""
    import jax
    import jax.numpy as jnp

    from rho_diffusion_tpu.models import UNetDiffuser

    cls = registry.get("models", "UNet_Diffuser")
    assert cls is UNetDiffuser
    m = cls(data_shape=(8, 8), in_channels=1, num_res_blocks=1)
    x = jnp.ones((2, 8, 8, 1))
    t = jnp.array([0, 1])
    params = m.init(jax.random.PRNGKey(0), x, t)["params"]
    out = m.apply({"params": params}, x, t)
    assert out.shape == (2, 8, 8, 1)
