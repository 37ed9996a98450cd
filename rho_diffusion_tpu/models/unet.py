"""The n-dimensional diffusion UNet backbone (flagship model).

TPU-native re-design of the reference's guided-diffusion-style UNet
(/root/reference/rho_diffusion/models/unet_v2.py:439-732, registered
"UNetv2"), generalised over dims in {1, 2, 3}. Differences from the
reference are layout/idiom only, not semantics:

* channels-LAST ([B, *spatial, C]) so convs/attention tile onto the MXU and
  the channel axis rides the 128-lane dimension;
* one flax.linen module; 1x1 convs become Dense; gradient checkpointing is
  ``nn.remat`` instead of a custom autograd.Function (reference
  layers.py:153-199);
* compute dtype is a policy field (default bfloat16-ready float32) with the
  reference's fp32 islands kept: GroupNorm and softmax always run in fp32
  (layers.py:71-74; unet_v2.py:391).

Preserved reference semantics (checked against unet_v2.py):
* time embedding: Dense(4*mc) -> act -> Dense(4*mc) over the interleaved
  sinusoidal embedding of t (unet_v2.py:516-524, 699-701);
* conditioning: emb += cond_fn(y) for 1-D class ids or 2-D parameter rows;
  2-D y whose shape equals emb is added directly (the sha512-hash path)
  (unet_v2.py:702-719);
* ResBlock: GN -> act -> conv3; emb readout via add or FiLM scale-shift
  (use_scale_shift_norm); zero-init final conv; optional resblock
  up/down-sampling (unet_v2.py:172-293);
* attention at downsample ratios in ``attention_resolutions`` and in the
  middle block, over ALL flattened spatial tokens, with double-sqrt scaling
  (unet_v2.py:296-342, 365-436);
* 3D up/downsampling touches only the inner two spatial dims
  (unet_v2.py:124-129, 153);
* decoder skip connections via channel concat (unet_v2.py:726-730);
* zero-init output conv (unet_v2.py:679-683).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from rho_diffusion_tpu.ops.activations import resolve_activation
from rho_diffusion_tpu.ops.attention import attention
from rho_diffusion_tpu.ops.convolution import Downsample, Upsample, conv_nd
from rho_diffusion_tpu.ops.embeddings import sinusoidal_position_embedding
from rho_diffusion_tpu.ops.norm import GroupNorm32
from rho_diffusion_tpu.registry import registry


class ResBlock(nn.Module):
    """Residual block with timestep-embedding conditioning
    (reference unet_v2.py:172-293)."""

    out_channels: int
    dims: int
    dropout: float = 0.0
    use_conv_skip: bool = False
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    activation: Callable = nn.silu
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, emb: jnp.ndarray, train: bool = False,
    ) -> jnp.ndarray:
        act = self.activation
        in_ch = x.shape[-1]

        h = GroupNorm32(name="norm_in")(x)
        h = act(h)
        if self.up:
            h = Upsample(self.dims, use_conv=False)(h)
            x = Upsample(self.dims, use_conv=False)(x)
        elif self.down:
            h = Downsample(self.dims, use_conv=False)(h)
            x = Downsample(self.dims, use_conv=False)(x)
        h = conv_nd(self.dims, self.out_channels, 3, dtype=self.dtype, name="conv_in")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="emb_proj",
        )(act(emb))
        # broadcast [B, C] across the spatial dims: [B, 1, ..., 1, C]
        emb_out = emb_out.reshape(
            emb_out.shape[0], *(1,) * self.dims, emb_out.shape[-1],
        ).astype(h.dtype)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="norm_out")(h) * (1.0 + scale) + shift
            h = act(h)
        else:
            h = h + emb_out
            h = GroupNorm32(name="norm_out")(h)
            h = act(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = conv_nd(
            self.dims, self.out_channels, 3, zero_init=True, dtype=self.dtype,
            name="conv_out",
        )(h)

        if self.out_channels == in_ch:
            skip = x
        elif self.use_conv_skip:
            skip = conv_nd(self.dims, self.out_channels, 3, dtype=self.dtype, name="skip")(x)
        else:
            from rho_diffusion_tpu.ops.quant import dense

            skip = dense(self.out_channels, dtype=self.dtype, name="skip")(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Self-attention over all flattened spatial positions
    (reference unet_v2.py:296-342)."""

    num_heads: int = 1
    num_head_channels: int = -1
    backend: str = "auto"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, *spatial, c = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert c % self.num_head_channels == 0, (
                f"channels {c} not divisible by num_head_channels "
                f"{self.num_head_channels}"
            )
            heads = c // self.num_head_channels
        assert c % heads == 0
        head_dim = c // heads

        tokens = 1
        for s in spatial:
            tokens *= s
        h = x.reshape(b, tokens, c)
        h = GroupNorm32(name="norm")(h)
        from rho_diffusion_tpu.ops.quant import dense

        qkv = dense(3 * c, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(b, tokens, heads, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = attention(q, k, v, backend=self.backend)
        a = a.reshape(b, tokens, c)
        a = dense(
            c, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="proj_out",
        )(a)
        return x + a.reshape(b, *spatial, c)


@registry.register_model("UNetv2")
class UNet(nn.Module):
    """n-dimensional UNet with attention, timestep embedding, and
    parameter-space conditioning. Config kwargs match the reference
    "UNetv2" JSON surface (unet_v2.py:472-496)."""

    data_shape: Sequence[int]
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = (16, 8)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
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
    use_new_attention_order: bool = False  # accepted for config parity;
    # both reference orders are numerically identical attention.
    activation: Any = "SiLU"
    attention_backend: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        train: bool = False,
        cond_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        act = resolve_activation(self.activation)
        compute_dtype = jnp.bfloat16 if self.use_fp16 else self.dtype
        heads_up = (
            self.num_heads if self.num_heads_upsample == -1 else self.num_heads_upsample
        )
        # warn when deep levels collapse below the conv kernel: gradients of
        # 3x3x3 convs over (N, 1, 1) volumes are a known trouble spot on
        # experimental TPU backends, and such configs waste the deep levels
        # anyway (data_shape too small for this channel_mult depth)
        min_inner = min(self.data_shape[-2:]) if self.dims >= 2 else self.data_shape[0]
        if min_inner // (2 ** (len(self.channel_mult) - 1)) < 3:
            import warnings

            warnings.warn(
                f"data_shape {tuple(self.data_shape)} shrinks below the 3x3 "
                f"kernel after {len(self.channel_mult) - 1} downsamplings; "
                f"reduce channel_mult depth or enlarge the grid",
                stacklevel=2,
            )
        embedding_dim = self.model_channels * 4

        res_block = ResBlock
        attn_block = AttentionBlock
        if self.use_checkpoint:
            res_block = nn.remat(ResBlock, static_argnums=(2,))
            attn_block = nn.remat(AttentionBlock)

        # --- timestep + condition embedding (unet_v2.py:516-524, 699-719) ---
        emb = sinusoidal_position_embedding(timesteps, self.model_channels)
        emb = nn.Dense(embedding_dim, param_dtype=jnp.float32, name="time_dense_0")(emb)
        emb = act(emb)
        emb = nn.Dense(embedding_dim, param_dtype=jnp.float32, name="time_dense_1")(emb)

        if self.num_classes is not None:
            assert y is not None, "class-conditional model requires y"
            if y.ndim == 2 and y.shape == emb.shape:
                cond = y.astype(emb.dtype)  # precomputed embeddings (sha512 path)
            else:
                assert self.cond_fn is not None, (
                    "conditioning labels require a cond_fn module"
                )
                cond = self.cond_fn(y)
            if cond_mask is not None:
                # classifier-free guidance: per-sample conditioning dropout.
                # mask 0 == the null condition (zero embedding contribution);
                # param tree is unchanged, so CFG never invalidates checkpoints
                cond = cond * cond_mask.astype(cond.dtype)[:, None]
            emb = emb + cond
        emb = emb.astype(compute_dtype)

        # explicit module names keep the parameter tree identical whether
        # or not blocks are wrapped in nn.remat (the transform changes
        # auto-generated names), so use_checkpoint never invalidates
        # checkpoints.
        def maybe_attn(h, ds, heads, name):
            if ds in tuple(self.attention_resolutions):
                h = attn_block(
                    num_heads=heads,
                    num_head_channels=self.num_head_channels,
                    backend=self.attention_backend,
                    dtype=compute_dtype,
                    name=name,
                )(h)
            return h

        def res(h, out_ch, name, up=False, down=False):
            return res_block(
                out_channels=out_ch,
                dims=self.dims,
                dropout=self.dropout,
                use_scale_shift_norm=self.use_scale_shift_norm,
                up=up,
                down=down,
                activation=act,
                dtype=compute_dtype,
                name=name,
            )(h, emb, train)

        # --- encoder (unet_v2.py:533-595) ---
        ch = int(self.channel_mult[0] * self.model_channels)
        h = conv_nd(self.dims, ch, 3, dtype=compute_dtype, name="conv_in")(
            x.astype(compute_dtype),
        )
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = int(mult * self.model_channels)
                h = res(h, ch, name=f"enc_res_{level}_{i}")
                h = maybe_attn(h, ds, self.num_heads, name=f"enc_attn_{level}_{i}")
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(h, ch, name=f"down_{level}", down=True)
                else:
                    h = Downsample(
                        self.dims, use_conv=self.conv_resample, out_channels=ch,
                        dtype=compute_dtype, name=f"down_{level}",
                    )(h)
                hs.append(h)
                ds *= 2

        # --- middle block (unet_v2.py:597-623) ---
        h = res(h, ch, name="mid_res_0")
        h = attn_block(
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            backend=self.attention_backend,
            dtype=compute_dtype,
            name="mid_attn",
        )(h)
        h = res(h, ch, name="mid_res_1")

        # --- decoder with skip concat (unet_v2.py:626-677) ---
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                ch = int(self.model_channels * mult)
                h = res(h, ch, name=f"dec_res_{level}_{i}")
                h = maybe_attn(h, ds, heads_up, name=f"dec_attn_{level}_{i}")
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res(h, ch, name=f"up_{level}", up=True)
                    else:
                        h = Upsample(
                            self.dims, use_conv=self.conv_resample, out_channels=ch,
                            dtype=compute_dtype, name=f"up_{level}",
                        )(h)
                    ds //= 2
        assert not hs

        # --- output head, zero-init conv (unet_v2.py:679-683) ---
        h = GroupNorm32(name="norm_out")(h)
        h = act(h)
        h = h.astype(jnp.float32)
        return conv_nd(self.dims, self.out_channels, 3, zero_init=True, name="conv_out")(h)
