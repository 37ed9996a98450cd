"""HF ``UNet2DModel`` weight-transplant parity.

The diffusers package is not installed here, so these tests verify the
mapping against a test-local torch mirror of the reference's pinned
UNet2DModel architecture (/root/reference/rho_diffusion/models/
unet_diffusers.py:37-55: block_out_channels (32, 64, 64), DownBlock2D +
2x AttnDownBlock2D, attention_head_dim 8, class_embed_type='identity').
The mirror reproduces diffusers' documented forward semantics —
"default"-mode resnets (time emb added before norm2), per-8-channel-head
attention with residual, [cos | sin] ``flip_sin_to_cos`` time projection —
and emits diffusers' exact state_dict key names, so the transplant's
layout transposes, qkv head interleave, and sinusoidal-order permutation
are all numerically checked end-to-end.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

from rho_diffusion_tpu.interop import transplant_hf_unet2d_state_dict  # noqa: E402
from rho_diffusion_tpu.models.unet_diffusers_compat import UNetDiffuser  # noqa: E402

TEMB = 128  # 4 * block_out_channels[0]


def hf_time_proj(t: torch.Tensor, dim: int = 32) -> torch.Tensor:
    """diffusers Timesteps(32, flip_sin_to_cos=True, downscale_freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    args = t.float()[:, None] * torch.exp(exponent)[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimeEmbedding(nn.Module):
    def __init__(self):
        super().__init__()
        self.linear_1 = nn.Linear(32, TEMB)
        self.linear_2 = nn.Linear(TEMB, TEMB)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class Resnet(nn.Module):
    """diffusers ResnetBlock2D, time_embedding_norm='default'."""

    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(32 if cin % 32 == 0 else cin, cin, eps=1e-5)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(TEMB, cout)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-5)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class Attn(nn.Module):
    """diffusers Attention (residual_connection=True, head_dim 8)."""

    def __init__(self, c, head_dim=8):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, c, eps=1e-5)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])
        self.heads = c // head_dim

    def forward(self, x):
        b, c, hh, ww = x.shape
        res = x
        h = self.group_norm(x).reshape(b, c, hh * ww).transpose(1, 2)

        def split(t):
            return t.reshape(b, -1, self.heads, c // self.heads).transpose(1, 2)

        q, k, v = split(self.to_q(h)), split(self.to_k(h)), split(self.to_v(h))
        a = F.scaled_dot_product_attention(q, k, v)  # softmax(qk/sqrt(d)) v
        a = a.transpose(1, 2).reshape(b, -1, c)
        a = self.to_out[0](a)
        return a.transpose(1, 2).reshape(b, c, hh, ww) + res


class Downsampler(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsampler(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class DownBlock(nn.Module):
    def __init__(self, cin, cout, layers, attn, last):
        super().__init__()
        self.resnets = nn.ModuleList(
            [Resnet(cin if i == 0 else cout, cout) for i in range(layers)],
        )
        if attn:
            self.attentions = nn.ModuleList([Attn(cout) for _ in range(layers)])
        if not last:
            self.downsamplers = nn.ModuleList([Downsampler(cout)])

    def forward(self, h, temb, skips):
        for i, r in enumerate(self.resnets):
            h = r(h, temb)
            if hasattr(self, "attentions"):
                h = self.attentions[i](h)
            skips.append(h)
        if hasattr(self, "downsamplers"):
            h = self.downsamplers[0](h)
            skips.append(h)
        return h


class MidBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = nn.ModuleList([Resnet(c, c), Resnet(c, c)])
        self.attentions = nn.ModuleList([Attn(c)])

    def forward(self, h, temb):
        h = self.resnets[0](h, temb)
        h = self.attentions[0](h)
        return self.resnets[1](h, temb)


class UpBlock(nn.Module):
    def __init__(self, cins, cout, attn, last):
        super().__init__()
        self.resnets = nn.ModuleList([Resnet(cin, cout) for cin in cins])
        if attn:
            self.attentions = nn.ModuleList(
                [Attn(cout) for _ in range(len(cins))],
            )
        if not last:
            self.upsamplers = nn.ModuleList([Upsampler(cout)])

    def forward(self, h, temb, skips):
        for i, r in enumerate(self.resnets):
            h = torch.cat([h, skips.pop()], dim=1)
            h = r(h, temb)
            if hasattr(self, "attentions"):
                h = self.attentions[i](h)
        if hasattr(self, "upsamplers"):
            h = self.upsamplers[0](h)
        return h


class HFUNet2DMirror(nn.Module):
    """UNet2DModel((32, 64, 64), layers_per_block=2, attn head dim 8)."""

    def __init__(self, in_channels=1, out_channels=1):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, 32, 3, padding=1)
        self.time_embedding = TimeEmbedding()
        self.down_blocks = nn.ModuleList([
            DownBlock(32, 32, 2, attn=False, last=False),
            DownBlock(32, 64, 2, attn=True, last=False),
            DownBlock(64, 64, 2, attn=True, last=True),
        ])
        self.mid_block = MidBlock(64)
        # resnet input channels = prev output + popped skip (see the skip
        # bookkeeping in the module docstring / unet.py:307-323)
        self.up_blocks = nn.ModuleList([
            UpBlock((128, 128, 128), 64, attn=True, last=False),
            UpBlock((128, 128, 96), 64, attn=True, last=False),
            UpBlock((96, 64, 64), 32, attn=False, last=True),
        ])
        self.conv_norm_out = nn.GroupNorm(32, 32, eps=1e-5)
        self.conv_out = nn.Conv2d(32, out_channels, 3, padding=1)

    def forward(self, x, t, class_emb=None):
        temb = self.time_embedding(hf_time_proj(t))
        if class_emb is not None:  # class_embed_type='identity'
            temb = temb + class_emb
        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            h = blk(h, temb, skips)
        h = self.mid_block(h, temb)
        for blk in self.up_blocks:
            h = blk(h, temb, skips)
        assert not skips
        return self.conv_out(F.silu(self.conv_norm_out(h)))


def _mirror_and_input(seed=0, batch=2, size=16):
    torch.manual_seed(seed)
    mirror = HFUNet2DMirror().eval()
    x = torch.randn(batch, 1, size, size)
    t = torch.tensor([3, 777 % (batch * 400)][:batch])
    return mirror, x, t


def _ours(params, x, t, y=None, size=16):
    model = UNetDiffuser(data_shape=(size, size), in_channels=1,
                         num_res_blocks=2)
    out = model.apply(
        {"params": params},
        jnp.asarray(x.numpy()).transpose(0, 2, 3, 1),
        jnp.asarray(t.numpy()),
        y,
    )
    return np.asarray(out).transpose(0, 3, 1, 2)


def test_hf_unet2d_transplant_forward_parity():
    mirror, x, t = _mirror_and_input()
    with torch.no_grad():
        ref = mirror(x, t).numpy()

    params = transplant_hf_unet2d_state_dict(mirror.state_dict())
    ours = _ours(params, x, t)

    mse = float(np.mean((ours - ref) ** 2))
    assert mse < 1e-9, f"field MSE {mse} vs HF-layout mirror"


def test_hf_transplant_tree_matches_init_shapes():
    import chex

    mirror, x, t = _mirror_and_input()
    params = transplant_hf_unet2d_state_dict(mirror.state_dict())
    model = UNetDiffuser(data_shape=(16, 16), in_channels=1, num_res_blocks=2)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,), jnp.int32),
    )["params"]
    chex.assert_trees_all_equal_shapes(
        jax.tree.map(jnp.asarray, params), init,
    )


def test_hf_transplant_legacy_attention_naming():
    """diffusers < 0.18 used query/key/value/proj_attn — must map
    identically to the modern to_q/to_k/to_v/to_out.0 names."""
    mirror, _, _ = _mirror_and_input()
    sd = mirror.state_dict()
    legacy = {}
    for k, v in sd.items():
        k = (k.replace(".to_q.", ".query.").replace(".to_k.", ".key.")
              .replace(".to_v.", ".value.").replace(".to_out.0.", ".proj_attn."))
        legacy[k] = v
    a = transplant_hf_unet2d_state_dict(sd)
    b = transplant_hf_unet2d_state_dict(legacy)
    flat_a, flat_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_array_equal(la, lb)


def test_hf_transplant_adapter_prefix_and_cond_fn():
    """The reference saved the ADAPTER's state_dict (UNet_nd: model.* +
    cond_fn.*, unet_diffusers.py:37-74) — both namespaces must land."""
    mirror, x, t = _mirror_and_input()
    sd = {f"model.{k}": v for k, v in mirror.state_dict().items()}
    emb_table = torch.randn(5, TEMB)
    sd["cond_fn.embedding_layers.mass.weight"] = emb_table

    params = transplant_hf_unet2d_state_dict(sd)
    assert "cond_fn" in params["model"] or "cond_fn" in params
    # identity class embedding: y added straight onto the time embedding
    cond = emb_table[2].numpy()[None].repeat(2, axis=0)
    with torch.no_grad():
        ref = mirror(x, t, class_emb=torch.tensor(cond)).numpy()
    model = UNetDiffuser(data_shape=(16, 16), in_channels=1,
                         num_res_blocks=2, num_classes=5)
    ours = model.apply(
        {"params": params},
        jnp.asarray(x.numpy()).transpose(0, 2, 3, 1),
        jnp.asarray(t.numpy()),
        jnp.asarray(cond),
    )
    mse = float(np.mean((np.asarray(ours).transpose(0, 3, 1, 2) - ref) ** 2))
    assert mse < 1e-9


def test_hf_transplant_strict_leftover_and_missing():
    mirror, _, _ = _mirror_and_input()
    sd = dict(mirror.state_dict())
    sd["unexpected.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unconsumed"):
        transplant_hf_unet2d_state_dict(sd)
    sd2 = dict(mirror.state_dict())
    del sd2["mid_block.resnets.0.conv1.weight"]
    with pytest.raises(KeyError):
        transplant_hf_unet2d_state_dict(sd2)
    with pytest.raises(ValueError, match="down_blocks"):
        transplant_hf_unet2d_state_dict({"foo.weight": torch.zeros(1)})
