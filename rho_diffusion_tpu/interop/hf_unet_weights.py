"""Transplant HuggingFace ``UNet2DModel`` state_dicts into our flax tree.

The reference's ``UNet_Diffuser`` wrapped a real ``diffusers.UNet2DModel``
(/root/reference/rho_diffusion/models/unet_diffusers.py:37-55) with a fixed
architecture — block_out_channels (32, 64, 64), DownBlock2D +
2x AttnDownBlock2D, ``layers_per_block=num_res_blocks``,
``class_embed_type='identity'`` — so checkpoints trained with the reference
exist in the HF parameter layout.  ``models/unet_diffusers_compat.py``
reproduces that architecture natively (same math: "default"-mode resnets
add the time embedding before norm2 exactly like our ResBlock, attention
is per-8-channel-head softmax); this module converts the weights.

Layout facts this mapping encodes (diffusers==0.2x ``UNet2DModel``):

* ``time_embedding.linear_1/linear_2`` == our ``time_dense_0/1``. The
  sinusoidal projection is parameter-free and uses the SAME frequencies
  (omega_j = 10000^(j/half)) but a different channel ORDER: HF's
  ``Timesteps(flip_sin_to_cos=True, freq_shift=0)`` emits
  [cos_0..cos_{h-1} | sin_0..sin_{h-1}] halves while our
  ``sinusoidal_position_embedding`` interleaves [sin_0, cos_0, sin_1, ...]
  (reference common.py:27-43). The permutation is absorbed into
  linear_1's input columns here, so the transplanted ``time_dense_0``
  reads our interleaved embedding identically;
* ``down_blocks.L.resnets.I`` -> ``enc_res_{L}_{I}`` with
  norm1/conv1/time_emb_proj/norm2/conv2/conv_shortcut ->
  norm_in/conv_in/emb_proj/norm_out/conv_out/skip (1x1 conv -> Dense);
* ``down_blocks.L.attentions.I`` -> ``enc_attn_{L}_{I}``: separate
  to_q/to_k/to_v Linears are fused into our qkv Dense with the per-head
  [q_h | k_h | v_h] channel interleave our AttentionBlock splits on; both
  the modern (``to_q``/``to_out.0``) and legacy (``query``/``proj_attn``)
  diffusers namings are accepted;
* ``down_blocks.L.downsamplers.0.conv`` -> ``down_{L}.op`` (stride-2 3x3),
  ``up_blocks.U.upsamplers.0.conv`` -> ``up_{level}.conv`` (nearest + 3x3);
* ``mid_block.resnets.{0,1}`` / ``attentions.0`` -> ``mid_res_0/1``,
  ``mid_attn``; ``conv_norm_out``/``conv_out`` -> ``norm_out``/``conv_out``;
* ``class_embed_type='identity'`` has no parameters; the reference
  adapter's own ``cond_fn.embedding_layers.*`` (MultiEmbeddings) transplant
  like the UNetv2 path (torch_weights.py:259-265).

Architecture metadata (#blocks, layers per block, attention placement,
shortcut presence) is inferred from the keys, so any UNet2DModel
configuration whose block types are {Down,AttnDown,Up,AttnUp}Block2D
converts — not just the reference's pinned one.
"""
from __future__ import annotations

import re

import numpy as np

from rho_diffusion_tpu.interop.torch_weights import (
    _SD,
    _conv_kernel,
    _dense_from_conv1x1,
    _dense_from_linear,
    _groupnorm as _gn,
    _to_numpy,
)


def _resnet(sd: _SD, prefix: str) -> dict:
    out = {
        "norm_in": _gn(sd, f"{prefix}.norm1"),
        "conv_in": {
            "kernel": _conv_kernel(sd(f"{prefix}.conv1.weight")),
            "bias": sd(f"{prefix}.conv1.bias"),
        },
        "emb_proj": {
            "kernel": _dense_from_linear(sd(f"{prefix}.time_emb_proj.weight")),
            "bias": sd(f"{prefix}.time_emb_proj.bias"),
        },
        "norm_out": _gn(sd, f"{prefix}.norm2"),
        "conv_out": {
            "kernel": _conv_kernel(sd(f"{prefix}.conv2.weight")),
            "bias": sd(f"{prefix}.conv2.bias"),
        },
    }
    if f"{prefix}.conv_shortcut.weight" in sd.sd:
        out["skip"] = {
            "kernel": _dense_from_conv1x1(sd(f"{prefix}.conv_shortcut.weight")),
            "bias": sd(f"{prefix}.conv_shortcut.bias"),
        }
    return out


def _attention(sd: _SD, prefix: str, head_dim: int) -> dict:
    """Fuse HF's separate q/k/v projections into our qkv Dense.

    HF splits the C output channels of each projection into contiguous
    per-head blocks of ``head_dim``; our AttentionBlock reads its fused
    3C output as per-head [q_h | k_h | v_h] blocks (unet.py:149-150), so
    output channels are interleaved head-by-head here.
    """
    if f"{prefix}.to_q.weight" in sd.sd:  # diffusers >= 0.18 "Attention"
        names = {"q": "to_q", "k": "to_k", "v": "to_v", "o": "to_out.0",
                 "norm": "group_norm"}
    else:  # legacy "AttentionBlock"
        names = {"q": "query", "k": "key", "v": "value", "o": "proj_attn",
                 "norm": "group_norm"}

    wq, bq = sd(f"{prefix}.{names['q']}.weight"), sd(f"{prefix}.{names['q']}.bias")
    wk, bk = sd(f"{prefix}.{names['k']}.weight"), sd(f"{prefix}.{names['k']}.bias")
    wv, bv = sd(f"{prefix}.{names['v']}.weight"), sd(f"{prefix}.{names['v']}.bias")
    c = wq.shape[0]
    if c % head_dim:
        raise ValueError(
            f"{prefix}: {c} channels not divisible by attention_head_dim "
            f"{head_dim}",
        )
    heads = c // head_dim
    rows_w, rows_b = [], []
    for h in range(heads):
        s = slice(h * head_dim, (h + 1) * head_dim)
        rows_w += [wq[s], wk[s], wv[s]]
        rows_b += [bq[s], bk[s], bv[s]]
    return {
        "norm": _gn(sd, f"{prefix}.{names['norm']}"),
        "qkv": {
            "kernel": _dense_from_linear(np.concatenate(rows_w, axis=0)),
            "bias": np.concatenate(rows_b, axis=0),
        },
        "proj_out": {
            "kernel": _dense_from_linear(sd(f"{prefix}.{names['o']}.weight")),
            "bias": sd(f"{prefix}.{names['o']}.bias"),
        },
    }


def _count(sd: _SD, pattern: str) -> int:
    """Highest index + 1 matched by ``pattern`` (one capture group)."""
    best = -1
    rx = re.compile(pattern)
    for key in sd.sd:
        m = rx.match(key)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def transplant_hf_unet2d_state_dict(
    state_dict: dict,
    attention_head_dim: int = 8,
    strict: bool = True,
) -> dict:
    """Convert a HF ``UNet2DModel`` state_dict (torch tensors or numpy)
    into the flax ``params`` tree of our ``UNet_Diffuser`` shim
    (models/unet_diffusers_compat.py), i.e. ``{"model": <UNet tree>}``.

    Accepts both a bare UNet2DModel state_dict and the reference adapter's
    backbone state_dict (keys prefixed ``model.``, plus the adapter's own
    ``cond_fn.*`` MultiEmbeddings tables — unet_diffusers.py:37-74).
    ``attention_head_dim`` is UNet2DModel's ctor default (8); pass the
    model's value if it was configured differently.
    """
    flat = {k: _to_numpy(v) for k, v in state_dict.items()}
    cond = {}
    unet_sd = {}
    for k, v in flat.items():
        if k.startswith("cond_fn.embedding_layers."):
            cond[f"embedding_{k.split('.')[2]}"] = {"embedding": v}
        elif k.startswith("model."):
            unet_sd[k[len("model."):]] = v
        else:
            unet_sd[k] = v
    sd = _SD(unet_sd)

    n_levels = _count(sd, r"down_blocks\.(\d+)\.")
    if n_levels == 0:
        raise ValueError(
            "no down_blocks.* keys — not a UNet2DModel state_dict",
        )

    # absorb HF's [cos | sin] half-order into linear_1: our input channel
    # 2j is sin_j (HF column half+j), channel 2j+1 is cos_j (HF column j)
    w1 = sd("time_embedding.linear_1.weight")
    half = w1.shape[1] // 2
    perm = np.empty(w1.shape[1], dtype=np.int64)
    perm[0::2] = np.arange(half) + half  # sin half
    perm[1::2] = np.arange(half)         # cos half
    tree: dict = {
        "time_dense_0": {
            "kernel": _dense_from_linear(w1[:, perm]),
            "bias": sd("time_embedding.linear_1.bias"),
        },
        "time_dense_1": {
            "kernel": _dense_from_linear(sd("time_embedding.linear_2.weight")),
            "bias": sd("time_embedding.linear_2.bias"),
        },
        "conv_in": {
            "kernel": _conv_kernel(sd("conv_in.weight")),
            "bias": sd("conv_in.bias"),
        },
        "norm_out": _gn(sd, "conv_norm_out"),
        "conv_out": {
            "kernel": _conv_kernel(sd("conv_out.weight")),
            "bias": sd("conv_out.bias"),
        },
    }

    for level in range(n_levels):
        n_res = _count(sd, rf"down_blocks\.{level}\.resnets\.(\d+)\.")
        for i in range(n_res):
            tree[f"enc_res_{level}_{i}"] = _resnet(
                sd, f"down_blocks.{level}.resnets.{i}",
            )
            attn = f"down_blocks.{level}.attentions.{i}"
            if any(k.startswith(attn + ".") for k in sd.sd):
                tree[f"enc_attn_{level}_{i}"] = _attention(
                    sd, attn, attention_head_dim,
                )
        down = f"down_blocks.{level}.downsamplers.0.conv"
        if f"{down}.weight" in sd.sd:
            tree[f"down_{level}"] = {
                "op": {
                    "kernel": _conv_kernel(sd(f"{down}.weight")),
                    "bias": sd(f"{down}.bias"),
                },
            }

    tree["mid_res_0"] = _resnet(sd, "mid_block.resnets.0")
    tree["mid_attn"] = _attention(sd, "mid_block.attentions.0", attention_head_dim)
    tree["mid_res_1"] = _resnet(sd, "mid_block.resnets.1")

    n_up = _count(sd, r"up_blocks\.(\d+)\.")
    for u in range(n_up):
        level = n_up - 1 - u  # up_blocks run deepest-first
        n_res = _count(sd, rf"up_blocks\.{u}\.resnets\.(\d+)\.")
        for i in range(n_res):
            tree[f"dec_res_{level}_{i}"] = _resnet(sd, f"up_blocks.{u}.resnets.{i}")
            attn = f"up_blocks.{u}.attentions.{i}"
            if any(k.startswith(attn + ".") for k in sd.sd):
                tree[f"dec_attn_{level}_{i}"] = _attention(
                    sd, attn, attention_head_dim,
                )
        up = f"up_blocks.{u}.upsamplers.0.conv"
        if f"{up}.weight" in sd.sd:
            tree[f"up_{level}"] = {
                "conv": {
                    "kernel": _conv_kernel(sd(f"{up}.weight")),
                    "bias": sd(f"{up}.bias"),
                },
            }

    leftover = sd.unused()
    if strict and leftover:
        raise ValueError(f"unconsumed HF weights: {leftover[:10]}...")
    if cond:
        tree["cond_fn"] = cond
    return {"model": tree}


def load_hf_unet2d_checkpoint(path, **kwargs) -> dict:
    """Load a ``UNet_Diffuser``/UNet2DModel ``.pth``/``.bin`` state_dict
    (torch serialization) and transplant it. Requires torch."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return transplant_hf_unet2d_state_dict(sd, **kwargs)
