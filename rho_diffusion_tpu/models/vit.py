"""Vision Transformer backbone for 1-3D diffusion.

Re-design of /root/reference/rho_diffusion/models/vit.py:30-372 in flax,
channels-LAST. Capability parity:

* patch embedding via a stride=patch_size convolution over 1/2/3-D data
  (reference PatchEmbedding :30-129) — channels-last, so the conv is a
  single nn.Conv with kernel=stride=patch_size;
* sinusoidal PATCH-position embedding -> Dense -> activation, added to the
  patch sequence (reference :291-295, 344-349);
* a stack of pre-LN transformer blocks, each adding a per-block sinusoidal
  DIFFUSION-TIME embedding (Dense, no bias, + activation) to its input
  (reference AttentionBlock :130-184). The reference's idiosyncratic
  residual wiring is preserved exactly: attn_residual = norm(x+t) + attn(
  norm(x+t)); out = attn_residual + mlp(norm(attn_residual));
* output: Dense projection to hidden_dim, reshape to the patch grid, and a
  transpose convolution recovering the original spatial shape
  (reference :279-288, 360-372).

The reference ViT takes no conditioning labels; ``y`` is accepted and
ignored for pipeline-interface compatibility.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from rho_diffusion_tpu.ops.activations import resolve_activation
from rho_diffusion_tpu.ops.attention import attention
from rho_diffusion_tpu.ops.embeddings import sinusoidal_position_embedding
from rho_diffusion_tpu.registry import registry


class ViTBlock(nn.Module):
    """Transformer block with per-block additive time embedding
    (reference vit.py:130-184)."""

    embed_dim: int
    hidden_dim: int
    num_heads: int
    dropout: float = 0.0
    activation: Any = "GELU"
    time_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        train: bool = False,
        cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        act = resolve_activation(self.activation)
        t_emb = sinusoidal_position_embedding(t, self.time_dim)
        t_emb = nn.Dense(
            self.embed_dim, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="time_proj",
        )(t_emb)
        t_emb = act(t_emb)
        if cond is not None:
            # conditional extension (round 5): condition embedding rides the
            # same per-block additive channel as time (the reference ViT is
            # unconditional, vit.py:324-339; unconditional use is
            # param-identical — this branch adds no modules when cond=None)
            t_emb = t_emb + cond
        h = x + t_emb[:, None, :].astype(x.dtype)

        norm = nn.LayerNorm(dtype=jnp.float32, name="norm_1")(h).astype(x.dtype)
        b, s, c = norm.shape
        d = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(norm)
        q, k, v = jnp.split(qkv.reshape(b, s, self.num_heads, 3 * d), 3, axis=-1)
        attn = attention(q, k, v).reshape(b, s, c)
        attn = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="attn_out")(attn)
        # reference residual wiring: norm'd input + attention output
        attn_residual = norm + attn

        norm2 = nn.LayerNorm(dtype=jnp.float32, name="norm_2")(attn_residual).astype(x.dtype)
        mlp = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_0")(norm2)
        mlp = act(mlp)
        if self.dropout > 0:
            mlp = nn.Dropout(self.dropout)(mlp, deterministic=not train)
        mlp = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_1")(mlp)
        if self.dropout > 0:
            mlp = nn.Dropout(self.dropout)(mlp, deterministic=not train)
        return attn_residual + mlp


@registry.register_model("VisionTransformer")
class VisionTransformer(nn.Module):
    """ViT diffusion backbone (reference vit.py:188-372). Input
    [B, *input_shapes, num_channels]."""

    patch_size: int
    input_shapes: Sequence[int]
    num_channels: int
    embedding_dim: int
    hidden_dim: int
    activation: Any = "GELU"
    transformer_depth: int = 8
    pos_embedding_dim: int = 128
    time_embedding_dim: int = 128
    max_seq_length: int = 20_000  # accepted for config parity; unused, as
    # in the reference (vit.py:201, 264)
    dropout: float = 0.2
    num_heads: int = 16
    dtype: Any = jnp.float32
    # conditional extension (round 5; the reference ViT is unconditional,
    # vit.py:324-339): same seam as the UNet — num_classes flags the
    # conditional path; y may be raw parameter rows (mapped through
    # cond_fn) or precomputed embeddings (projected directly). When
    # num_classes is None the model is param-identical to the reference
    # parity version and y is ignored.
    num_classes: Optional[int] = None
    cond_fn: Optional[nn.Module] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        act = resolve_activation(self.activation)
        cond = None
        if self.num_classes is not None:
            assert y is not None, "class-conditional ViT requires y"
            raw = y if (y.ndim == 2 and self.cond_fn is None) else (
                self.cond_fn(y) if self.cond_fn is not None
                else nn.Embed(
                    self.num_classes, self.embedding_dim,
                    param_dtype=jnp.float32, name="class_embed",
                )(y.astype(jnp.int32))
            )
            cond = nn.Dense(
                self.embedding_dim, dtype=self.dtype, param_dtype=jnp.float32,
                name="cond_proj",
            )(raw.astype(self.dtype))
        else:
            del y  # the reference ViT is unconditional (vit.py:324-339)
        dims = len(self.input_shapes)
        assert x.ndim == dims + 2, (
            f"expected [B, {'x'.join(map(str, self.input_shapes))}, C] input, "
            f"got shape {x.shape}"
        )

        # -- patch embedding (stride=patch conv), keep grid shape ----------
        patches = nn.Conv(
            self.embedding_dim,
            kernel_size=(self.patch_size,) * dims,
            strides=(self.patch_size,) * dims,
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )(x.astype(self.dtype))
        grid_shape = patches.shape[1:-1]
        seq_len = math.prod(grid_shape)
        h = patches.reshape(x.shape[0], seq_len, self.embedding_dim)

        # -- patch position embedding (reference :291-295) -----------------
        pos = sinusoidal_position_embedding(
            jnp.arange(seq_len), self.pos_embedding_dim,
        )
        pos = nn.Dense(
            self.embedding_dim, dtype=self.dtype, param_dtype=jnp.float32,
            name="pos_proj",
        )(pos)
        h = h + act(pos)[None, :, :].astype(h.dtype)

        for i in range(self.transformer_depth):
            h = ViTBlock(
                embed_dim=self.embedding_dim,
                hidden_dim=self.hidden_dim,
                num_heads=self.num_heads,
                dropout=self.dropout,
                activation=self.activation,
                time_dim=self.time_embedding_dim,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, t, train, cond)

        # -- unpatchify: Dense -> grid -> transpose conv (reference :360-372)
        h = nn.Dense(
            self.hidden_dim, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="output_projection",
        )(h)
        h = h.reshape(x.shape[0], *grid_shape, self.hidden_dim)
        out = nn.ConvTranspose(
            self.num_channels,
            kernel_size=(self.patch_size,) * dims,
            strides=(self.patch_size,) * dims,
            padding="VALID",
            param_dtype=jnp.float32,
            name="output_conv",
        )(h.astype(jnp.float32))
        return out
