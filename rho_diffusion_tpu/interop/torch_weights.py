"""Interop with the PyTorch reference: load its modules standalone and
transplant UNetv2 ``state_dict`` weights into our flax parameter tree.

Two purposes:
* migration — users of intel/rho-diffusion can load their trained
  ``model.pth`` checkpoints (backbone state_dicts, reference
  utils.py:166-167) directly into this framework;
* verification — the numerical-parity harness (tools/parity_check.py,
  tests/parity/) transplants weights and measures field MSE between the
  torch reference forward pass and ours (<1e-4 target, BASELINE.md).

The reference package cannot be imported wholesale here (its pipeline layer
hard-imports lightning/diffusers, which are not installed); we construct a
synthetic ``rho_diffusion`` package in sys.modules from the read-only
reference checkout, loading only the torch-only modules (registry, layers,
common, conditioning, unet_v2, schedule) with torchvision stubbed out.
"""
from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path
from typing import Any

import numpy as np

REFERENCE_ROOT = Path("/root/reference")


def _load_module(fqname: str, path: Path):
    spec = importlib.util.spec_from_file_location(fqname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fqname] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_modules(root: Path = REFERENCE_ROOT) -> dict[str, Any]:
    """Load the torch-only reference modules under a synthetic package.

    Returns a dict with keys: registry, layers, common, parameter_space,
    conditioning, unet_v2, schedule, utils.
    """
    if not root.exists():
        raise FileNotFoundError(f"reference checkout not found at {root}")
    # stub heavy optional deps the target modules import at module level
    def _permissive_stub(name: str) -> types.ModuleType:
        stub = types.ModuleType(name)

        # PEP 562 module __getattr__: any NON-dunder attribute resolves to a
        # no-op callable, so `from torchvision.utils import save_image` etc.
        # work. Dunders raise normally — tooling that introspects sys.modules
        # (e.g. hypothesis's constant scanner) must see a sane module.
        def _getattr(attr, _name=name):
            if attr.startswith("__") and attr.endswith("__"):
                raise AttributeError(f"module '{_name}' has no attribute '{attr}'")
            return lambda *a, **kw: None

        stub.__getattr__ = _getattr
        return stub

    import importlib.util as _ilu

    for stub_name in ("torchvision", "torchvision.transforms",
                      "torchvision.transforms.transforms", "torchvision.utils",
                      "matplotlib", "matplotlib.pyplot", "tqdm"):
        if stub_name in sys.modules:
            continue
        # only stub what is genuinely missing — clobbering an importable
        # module (e.g. matplotlib) would break unrelated consumers later
        try:
            if _ilu.find_spec(stub_name) is not None:
                continue
        except (ImportError, ModuleNotFoundError, ValueError):
            pass
        sys.modules[stub_name] = _permissive_stub(stub_name)

    pkg_root = root / "rho_diffusion"
    if "rho_diffusion" not in sys.modules:
        pkg = types.ModuleType("rho_diffusion")
        pkg.__path__ = [str(pkg_root)]
        sys.modules["rho_diffusion"] = pkg
        for sub in ("models", "data", "diffusion"):
            sp = types.ModuleType(f"rho_diffusion.{sub}")
            sp.__path__ = [str(pkg_root / sub)]
            sys.modules[f"rho_diffusion.{sub}"] = sp

    mods = {}
    order = [
        ("registry", "registry.py"),
        ("utils", "utils.py"),
        ("layers", "layers.py"),
        ("activations", "activations.py"),
        ("models.common", "models/common.py"),
        ("data.parameter_space", "data/parameter_space.py"),
        ("models.conditioning", "models/conditioning.py"),
        ("models.unet_v2", "models/unet_v2.py"),
        ("diffusion.schedule", "diffusion/schedule.py"),
    ]
    for name, rel in order:
        fq = f"rho_diffusion.{name}"
        if fq in sys.modules and hasattr(sys.modules[fq], "__file__"):
            mods[name.split(".")[-1]] = sys.modules[fq]
            continue
        mods[name.split(".")[-1]] = _load_module(fq, pkg_root / rel)
    return mods


# ---------------------------------------------------------------------------
# state_dict -> flax params
# ---------------------------------------------------------------------------

def _to_numpy(v) -> np.ndarray:
    """torch tensor (any dtype, incl. bfloat16, which numpy can't represent
    natively) or array-like -> float numpy array."""
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach()
        if str(v.dtype) == "torch.bfloat16":
            v = v.float()
        return v.numpy()
    return np.asarray(v)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv weight [O, I, *K] -> flax [*K, I, O]."""
    spatial = list(range(2, w.ndim))
    return np.transpose(w, (*spatial, 1, 0))


def _dense_from_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _dense_from_conv1x1(w: np.ndarray) -> np.ndarray:
    """torch 1x1 conv_nd weight [O, I, 1...] -> flax Dense kernel [I, O]."""
    return np.transpose(w.reshape(w.shape[0], w.shape[1]), (1, 0))


def load_torch_checkpoint(path, **transplant_kwargs) -> dict:
    """Load a reference ``model.pth`` backbone state_dict (saved via
    torch.save(state_dict), reference utils.py:166-167) and transplant it
    into a flax params tree. Requires torch."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return transplant_unet_state_dict(sd, **transplant_kwargs)


class _SD:
    """state_dict accessor tracking consumed keys."""

    def __init__(self, sd: dict) -> None:
        self.sd = {k: _to_numpy(v) for k, v in sd.items()}
        self.used: set[str] = set()

    def __call__(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"missing reference weight '{key}'")
        self.used.add(key)
        return self.sd[key]

    def unused(self) -> list[str]:
        return sorted(set(self.sd) - self.used)


def _groupnorm(sd: _SD, prefix: str) -> dict:
    return {
        "GroupNorm_0": {
            "scale": sd(f"{prefix}.weight"),
            "bias": sd(f"{prefix}.bias"),
        },
    }


def _resblock(sd: _SD, prefix: str, has_skip: bool) -> dict:
    out = {
        "norm_in": _groupnorm(sd, f"{prefix}.in_layers.0"),
        "conv_in": {
            "kernel": _conv_kernel(sd(f"{prefix}.in_layers.2.weight")),
            "bias": sd(f"{prefix}.in_layers.2.bias"),
        },
        "emb_proj": {
            "kernel": _dense_from_linear(sd(f"{prefix}.emb_layers.1.weight")),
            "bias": sd(f"{prefix}.emb_layers.1.bias"),
        },
        "norm_out": _groupnorm(sd, f"{prefix}.out_layers.0"),
        "conv_out": {
            "kernel": _conv_kernel(sd(f"{prefix}.out_layers.3.weight")),
            "bias": sd(f"{prefix}.out_layers.3.bias"),
        },
    }
    if has_skip:
        w = sd(f"{prefix}.skip_connection.weight")
        out["skip"] = {
            "kernel": _dense_from_conv1x1(w),
            "bias": sd(f"{prefix}.skip_connection.bias"),
        }
    return out


def _attnblock(sd: _SD, prefix: str, num_heads: int, new_order: bool) -> dict:
    """Attention block weights. The reference has two qkv channel layouts
    (unet_v2.py:365-436): legacy = per-head [q|k|v] blocks ([H, 3, D]),
    "new order" = [q|k|v] thirds each per-head ([3, H, D]). Our AttentionBlock
    uses the legacy layout, so new-order checkpoints get their qkv output
    channels permuted here."""
    qkv_w = sd(f"{prefix}.qkv.weight")  # [3C, C, 1]
    qkv_b = sd(f"{prefix}.qkv.bias")
    if new_order:
        three_c = qkv_w.shape[0]
        d = three_c // (3 * num_heads)
        perm = (
            np.arange(three_c)
            .reshape(3, num_heads, d)    # new order: [j, h, d]
            .transpose(1, 0, 2)          # -> legacy: [h, j, d]
            .reshape(-1)
        )
        qkv_w = qkv_w[perm]
        qkv_b = qkv_b[perm]
    return {
        "norm": _groupnorm(sd, f"{prefix}.norm"),
        "qkv": {
            "kernel": _dense_from_conv1x1(qkv_w),
            "bias": qkv_b,
        },
        "proj_out": {
            "kernel": _dense_from_conv1x1(sd(f"{prefix}.proj_out.weight")),
            "bias": sd(f"{prefix}.proj_out.bias"),
        },
    }


def transplant_unet_state_dict(
    state_dict: dict,
    model_channels: int,
    num_res_blocks: int,
    channel_mult=(1, 2, 4, 8),
    attention_resolutions=(16, 8),
    conv_resample: bool = True,
    resblock_updown: bool = False,
    num_heads: int = 1,
    num_head_channels: int = -1,
    num_heads_upsample: int = -1,
    use_new_attention_order: bool = False,
    strict: bool = True,
) -> dict:
    """Convert a reference UNetv2 ``state_dict`` (torch tensors or numpy)
    into our flax ``params`` tree (channels-last kernels).

    The encoder/decoder enumeration mirrors the reference's module-list
    construction (unet_v2.py:533-683) so torch's flat ``input_blocks.N``
    indices land on our named blocks (enc_res_{level}_{i}, down_{level},
    mid_*, dec_res_{level}_{i}, up_{level}).
    """
    sd = _SD(state_dict)
    params: dict = {}

    def heads_for(ch: int) -> int:
        return ch // num_head_channels if num_head_channels != -1 else num_heads

    def dec_heads_for(ch: int) -> int:
        # the reference builds output_blocks attention with
        # num_heads_upsample (unet_v2.py:648); num_head_channels still wins
        # inside AttentionBlock when set
        if num_head_channels != -1:
            return ch // num_head_channels
        return num_heads if num_heads_upsample == -1 else num_heads_upsample

    params["time_dense_0"] = {
        "kernel": _dense_from_linear(sd("time_embed.0.weight")),
        "bias": sd("time_embed.0.bias"),
    }
    params["time_dense_1"] = {
        "kernel": _dense_from_linear(sd("time_embed.2.weight")),
        "bias": sd("time_embed.2.bias"),
    }
    # conditioning embeddings, if present
    cond = {}
    for key in list(sd.sd):
        if key.startswith("cond_fn.embedding_layers."):
            pname = key.split(".")[2]
            cond[f"embedding_{pname}"] = {"embedding": sd(key)}
    if cond:
        params["cond_fn"] = cond

    params["conv_in"] = {
        "kernel": _conv_kernel(sd("input_blocks.0.0.weight")),
        "bias": sd("input_blocks.0.0.bias"),
    }

    # --- encoder ---
    idx = 1
    ch = int(channel_mult[0] * model_channels)
    ds = 1
    for level, mult in enumerate(channel_mult):
        for i in range(num_res_blocks):
            out_ch = int(mult * model_channels)
            params[f"enc_res_{level}_{i}"] = _resblock(
                sd, f"input_blocks.{idx}.0", has_skip=out_ch != ch,
            )
            ch = out_ch
            if ds in tuple(attention_resolutions):
                params[f"enc_attn_{level}_{i}"] = _attnblock(
                    sd, f"input_blocks.{idx}.1", heads_for(ch),
                    use_new_attention_order,
                )
            idx += 1
        if level != len(channel_mult) - 1:
            if resblock_updown:
                params[f"down_{level}"] = _resblock(
                    sd, f"input_blocks.{idx}.0", has_skip=False,
                )
            elif conv_resample:
                params[f"down_{level}"] = {
                    "op": {
                        "kernel": _conv_kernel(sd(f"input_blocks.{idx}.0.op.weight")),
                        "bias": sd(f"input_blocks.{idx}.0.op.bias"),
                    },
                }
            # conv_resample=False: avg-pool downsample, no weights
            idx += 1
            ds *= 2

    # --- middle ---
    params["mid_res_0"] = _resblock(sd, "middle_block.0", has_skip=False)
    params["mid_attn"] = _attnblock(
        sd, "middle_block.1", heads_for(ch), use_new_attention_order,
    )
    params["mid_res_1"] = _resblock(sd, "middle_block.2", has_skip=False)

    # --- decoder ---
    idx = 0
    for level, mult in reversed(list(enumerate(channel_mult))):
        for i in range(num_res_blocks + 1):
            out_ch = int(model_channels * mult)
            params[f"dec_res_{level}_{i}"] = _resblock(
                sd, f"output_blocks.{idx}.0", has_skip=True,
            )
            ch = out_ch
            layer = 1
            if ds in tuple(attention_resolutions):
                params[f"dec_attn_{level}_{i}"] = _attnblock(
                    sd, f"output_blocks.{idx}.{layer}", dec_heads_for(ch),
                    use_new_attention_order,
                )
                layer += 1
            if level and i == num_res_blocks:
                if resblock_updown:
                    params[f"up_{level}"] = _resblock(
                        sd, f"output_blocks.{idx}.{layer}", has_skip=False,
                    )
                elif conv_resample:
                    params[f"up_{level}"] = {
                        "conv": {
                            "kernel": _conv_kernel(
                                sd(f"output_blocks.{idx}.{layer}.conv.weight"),
                            ),
                            "bias": sd(f"output_blocks.{idx}.{layer}.conv.bias"),
                        },
                    }
                # conv_resample=False: nearest upsample only, no weights
                ds //= 2
            idx += 1

    params["norm_out"] = _groupnorm(sd, "out.0")
    params["conv_out"] = {
        "kernel": _conv_kernel(sd("out.2.weight")),
        "bias": sd("out.2.bias"),
    }

    leftover = sd.unused()
    if strict and leftover:
        raise ValueError(f"unconsumed reference weights: {leftover[:10]}...")
    return params


# ---------------------------------------------------------------------------
# flax params -> state_dict (the reverse direction: export OUR weights in
# the reference's torch layout so reference users can take checkpoints back)
# ---------------------------------------------------------------------------


def _torch_conv(kernel: np.ndarray) -> np.ndarray:
    """flax conv kernel [*K, I, O] -> torch [O, I, *K]."""
    k = np.asarray(kernel)
    spatial = list(range(k.ndim - 2))
    return np.transpose(k, (k.ndim - 1, k.ndim - 2, *spatial))


def _torch_linear(kernel: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(kernel), (1, 0))


def _torch_conv1x1(kernel: np.ndarray, dims: int) -> np.ndarray:
    """flax Dense kernel [I, O] -> torch 1x1 conv_nd weight [O, I, 1*dims]."""
    k = np.asarray(kernel)
    return np.transpose(k, (1, 0)).reshape(k.shape[1], k.shape[0], *([1] * dims))


class _Out:
    """state_dict writer tracking leaves consumed from the params tree."""

    def __init__(self) -> None:
        self.sd: dict[str, np.ndarray] = {}

    def __setitem__(self, key: str, value: np.ndarray) -> None:
        if key in self.sd:
            raise ValueError(f"duplicate export key '{key}'")
        self.sd[key] = np.asarray(value)


def _export_groupnorm(out: _Out, prefix: str, p: dict) -> None:
    gn = p["GroupNorm_0"]
    out[f"{prefix}.weight"] = gn["scale"]
    out[f"{prefix}.bias"] = gn["bias"]


def _export_resblock(out: _Out, prefix: str, p: dict, dims: int) -> None:
    _export_groupnorm(out, f"{prefix}.in_layers.0", p["norm_in"])
    out[f"{prefix}.in_layers.2.weight"] = _torch_conv(p["conv_in"]["kernel"])
    out[f"{prefix}.in_layers.2.bias"] = p["conv_in"]["bias"]
    out[f"{prefix}.emb_layers.1.weight"] = _torch_linear(p["emb_proj"]["kernel"])
    out[f"{prefix}.emb_layers.1.bias"] = p["emb_proj"]["bias"]
    _export_groupnorm(out, f"{prefix}.out_layers.0", p["norm_out"])
    out[f"{prefix}.out_layers.3.weight"] = _torch_conv(p["conv_out"]["kernel"])
    out[f"{prefix}.out_layers.3.bias"] = p["conv_out"]["bias"]
    if "skip" in p:
        out[f"{prefix}.skip_connection.weight"] = _torch_conv1x1(
            p["skip"]["kernel"], dims,
        )
        out[f"{prefix}.skip_connection.bias"] = p["skip"]["bias"]


def _export_attnblock(
    out: _Out, prefix: str, p: dict, dims: int, num_heads: int, new_order: bool,
) -> None:
    """Inverse of ``_attnblock``: our qkv Dense (legacy per-head [q|k|v]
    channel blocks) back to the reference's 1x1-conv qkv, re-permuting to
    the 'new order' [3, H, D] layout when the target architecture uses
    ``use_new_attention_order=True`` (unet_v2.py:365-436).

    The reference's AttentionBlock builds qkv/proj_out with ``conv_nd(1,
    ...)`` over the FLATTENED token axis (unet_v2.py:320, 331) — so these
    weights are Conv1d-shaped [O, I, 1] for every ``dims``; only the
    ResBlock skip connection is ``conv_nd(dims)``-shaped."""
    del dims  # qkv/proj_out are always 1-D in the reference
    qkv_w = _torch_conv1x1(p["qkv"]["kernel"], 1)
    qkv_b = np.asarray(p["qkv"]["bias"])
    if new_order:
        three_c = qkv_w.shape[0]
        d = three_c // (3 * num_heads)
        perm = (
            np.arange(three_c)
            .reshape(num_heads, 3, d)    # legacy: [h, j, d]
            .transpose(1, 0, 2)          # -> new order: [j, h, d]
            .reshape(-1)
        )
        qkv_w = qkv_w[perm]
        qkv_b = qkv_b[perm]
    _export_groupnorm(out, f"{prefix}.norm", p["norm"])
    out[f"{prefix}.qkv.weight"] = qkv_w
    out[f"{prefix}.qkv.bias"] = qkv_b
    out[f"{prefix}.proj_out.weight"] = _torch_conv1x1(p["proj_out"]["kernel"], 1)
    out[f"{prefix}.proj_out.bias"] = p["proj_out"]["bias"]


def export_unet_state_dict(
    params: dict,
    dims: int = 2,
    model_channels: int = 64,
    num_res_blocks: int = 2,
    channel_mult=(1, 2, 4, 8),
    attention_resolutions=(16, 8),
    conv_resample: bool = True,
    resblock_updown: bool = False,
    num_heads: int = 1,
    num_head_channels: int = -1,
    num_heads_upsample: int = -1,
    use_new_attention_order: bool = False,
) -> dict:
    """Convert our flax UNet ``params`` tree into a reference-layout UNetv2
    ``state_dict`` of numpy arrays — the exact inverse of
    ``transplant_unet_state_dict`` (same encoder/decoder enumeration,
    unet_v2.py:533-683), so checkpoints trained here can be handed back to
    torch users of the reference (``torch.load`` after ``torch.save`` of
    this mapping, utils.py:166-167). ``dims`` shapes the 1x1 convolutions
    (skip/qkv/proj_out) that our model stores as Dense kernels.

    Round-trip and torch-forward parity are asserted in
    tests/parity/test_torch_migration.py.
    """
    out = _Out()

    def heads_for(ch: int) -> int:
        return ch // num_head_channels if num_head_channels != -1 else num_heads

    def dec_heads_for(ch: int) -> int:
        # output_blocks attention uses num_heads_upsample (unet_v2.py:648)
        if num_head_channels != -1:
            return ch // num_head_channels
        return num_heads if num_heads_upsample == -1 else num_heads_upsample

    out["time_embed.0.weight"] = _torch_linear(params["time_dense_0"]["kernel"])
    out["time_embed.0.bias"] = params["time_dense_0"]["bias"]
    out["time_embed.2.weight"] = _torch_linear(params["time_dense_1"]["kernel"])
    out["time_embed.2.bias"] = params["time_dense_1"]["bias"]

    for name, sub in params.get("cond_fn", {}).items():
        pname = name[len("embedding_"):]
        out[f"cond_fn.embedding_layers.{pname}.weight"] = sub["embedding"]

    out["input_blocks.0.0.weight"] = _torch_conv(params["conv_in"]["kernel"])
    out["input_blocks.0.0.bias"] = params["conv_in"]["bias"]

    idx = 1
    ch = int(channel_mult[0] * model_channels)
    ds = 1
    for level, mult in enumerate(channel_mult):
        for i in range(num_res_blocks):
            out_ch = int(mult * model_channels)
            _export_resblock(
                out, f"input_blocks.{idx}.0", params[f"enc_res_{level}_{i}"], dims,
            )
            ch = out_ch
            if ds in tuple(attention_resolutions):
                _export_attnblock(
                    out, f"input_blocks.{idx}.1", params[f"enc_attn_{level}_{i}"],
                    dims, heads_for(ch), use_new_attention_order,
                )
            idx += 1
        if level != len(channel_mult) - 1:
            if resblock_updown:
                _export_resblock(
                    out, f"input_blocks.{idx}.0", params[f"down_{level}"], dims,
                )
            elif conv_resample:
                op = params[f"down_{level}"]["op"]
                out[f"input_blocks.{idx}.0.op.weight"] = _torch_conv(op["kernel"])
                out[f"input_blocks.{idx}.0.op.bias"] = op["bias"]
            idx += 1
            ds *= 2

    _export_resblock(out, "middle_block.0", params["mid_res_0"], dims)
    _export_attnblock(
        out, "middle_block.1", params["mid_attn"], dims, heads_for(ch),
        use_new_attention_order,
    )
    _export_resblock(out, "middle_block.2", params["mid_res_1"], dims)

    idx = 0
    for level, mult in reversed(list(enumerate(channel_mult))):
        for i in range(num_res_blocks + 1):
            out_ch = int(model_channels * mult)
            _export_resblock(
                out, f"output_blocks.{idx}.0", params[f"dec_res_{level}_{i}"], dims,
            )
            ch = out_ch
            layer = 1
            if ds in tuple(attention_resolutions):
                _export_attnblock(
                    out, f"output_blocks.{idx}.{layer}",
                    params[f"dec_attn_{level}_{i}"], dims, dec_heads_for(ch),
                    use_new_attention_order,
                )
                layer += 1
            if level and i == num_res_blocks:
                if resblock_updown:
                    _export_resblock(
                        out, f"output_blocks.{idx}.{layer}", params[f"up_{level}"],
                        dims,
                    )
                elif conv_resample:
                    conv = params[f"up_{level}"]["conv"]
                    out[f"output_blocks.{idx}.{layer}.conv.weight"] = _torch_conv(
                        conv["kernel"],
                    )
                    out[f"output_blocks.{idx}.{layer}.conv.bias"] = conv["bias"]
                ds //= 2
            idx += 1

    _export_groupnorm(out, "out.0", params["norm_out"])
    out["out.2.weight"] = _torch_conv(params["conv_out"]["kernel"])
    out["out.2.bias"] = params["conv_out"]["bias"]
    return out.sd


def save_torch_checkpoint(params: dict, path, **export_kwargs) -> None:
    """``torch.save`` our backbone params as a reference-layout ``model.pth``
    (the reference's own save format, utils.py:166-167). Requires torch."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v, dtype=np.float32))
        for k, v in export_unet_state_dict(params, **export_kwargs).items()
    }
    torch.save(sd, str(path))
