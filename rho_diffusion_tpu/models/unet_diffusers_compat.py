""""UNet_Diffuser" — parity shim for the reference's HuggingFace
UNet2DModel adapter (/root/reference/rho_diffusion/models/unet_diffusers.py:
7-74).

The reference wrapped `diffusers.UNet2DModel` with a FIXED architecture:
2D only, three levels with block channels (32, 64, 64), attention on the
two inner levels, `class_embed_type='identity'` (conditioning embeddings
added directly to the time embedding), `layers_per_block=num_res_blocks`,
out_channels hard-coded to 1. The diffusers package is not a dependency
here; the equivalent capability is our own UNet pinned to that
configuration. All the reference adapter's kwargs are accepted; the ones
its fixed architecture ignored (channel_mult, num_heads, ...) are ignored
the same way.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from rho_diffusion_tpu.models.unet import UNet
from rho_diffusion_tpu.registry import registry


@registry.register_model("UNet_Diffuser")
class UNetDiffuser(nn.Module):
    data_shape: Sequence[int]
    in_channels: int
    model_channels: int = 32  # accepted; the reference pinned (32, 64, 64)
    out_channels: int = 1
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (16, 8)  # ignored, like upstream
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)  # ignored, like upstream
    conv_resample: bool = True
    dims: int = 2
    num_classes: Optional[int] = None
    cond_fn: Optional[nn.Module] = None
    use_checkpoint: bool = False
    use_fp16: bool = False
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    # UNet2DModel's per-head channel width (its ctor default is 8). Kept as
    # a real field so checkpoints trained with a different head_dim can be
    # constructed AND transplanted consistently (training/checkpoint.py
    # forwards the same value to the HF weight transplant).
    attention_head_dim: int = 8
    activation: Any = "SiLU"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, y=None, train: bool = False):
        assert self.dims == 2, "UNet_Diffuser is 2D-only (reference parity)"
        # UNet2DModel(block_out_channels=(32, 64, 64)) == base 32 with
        # mult (1, 2, 2); attention on the two inner levels -> ds in {2, 4}
        model = UNet(
            data_shape=tuple(self.data_shape),
            in_channels=self.in_channels,
            out_channels=1,  # the reference hard-coded 1
            model_channels=32,
            num_res_blocks=self.num_res_blocks,
            channel_mult=(1, 2, 2),
            attention_resolutions=(2, 4),
            dims=2,
            num_classes=self.num_classes,
            cond_fn=self.cond_fn,
            use_checkpoint=self.use_checkpoint,
            use_fp16=self.use_fp16,
            # UNet2DModel uses channels/attention_head_dim heads at every
            # attention site; mirror that head structure so HF checkpoints
            # transplant faithfully (interop/hf_unet_weights.py)
            num_heads=1,
            num_head_channels=self.attention_head_dim,
            activation=self.activation,
            dtype=self.dtype,
            name="model",
        )
        return model(x, timesteps, y, train)
