"""Checkpoint / resume of the FULL training state.

The reference saved backbone-only state_dicts every N epochs
(/root/reference/rho_diffusion/utils.py:166-167; ddpm.py:312-317,363-365) —
optimizer moments, EMA, step and RNG were lost on restart. Here orbax
checkpoints the entire ``TrainState`` pytree {params, opt_state, ema_params,
step, rng}, giving exact resume (strictly-better parity, SURVEY.md §5).
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from rho_diffusion_tpu.training.state import TrainState


class CheckpointManager:
    """Thin orbax wrapper: numbered step checkpoints with retention."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3) -> None:
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
            ),
        )

    def save(self, state: TrainState, step: Optional[int] = None, wait: bool = False) -> bool:
        step = int(state.step) if step is None else step
        saved = self._mgr.save(step, args=ocp.args.StandardSave(state))
        if not saved:
            # orbax's should_save() refuses steps <= an existing latest step
            # — e.g. a fresh (non-resumed) run writing into a directory that
            # still holds a previous run's checkpoints, or a final save
            # landing on the same step as the epoch-end save. Never skip
            # silently: a "saved" checkpoint that was not written loses the
            # run at the next resume (which would restore the STALE step).
            # Drain any in-flight async save FIRST — deleting a step whose
            # background serialization is still writing races the deleter
            # against tensorstore (observed: OSError 39 / NOT_FOUND) — then
            # overwrite a same-step collision and force past the
            # stale-latest policy.
            self._mgr.wait_until_finished()
            if step in self._mgr.all_steps():
                self._mgr.delete(step)
            saved = self._mgr.save(
                step, args=ocp.args.StandardSave(state), force=True,
            )
        if wait:
            self._mgr.wait_until_finished()
        return saved

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``template`` — a concrete
        TrainState, or an abstract one (ShapeDtypeStruct leaves). Leaves
        carrying a ``sharding`` (concrete sharded arrays, or abstract
        leaves built via ``jax.ShapeDtypeStruct(..., sharding=...)``)
        restore DIRECTLY into those shards: each device reads only its 1/N
        slice from disk, so an FSDP state larger than one device's memory
        restores without ever materialising fully anywhere."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        abstract = jax.tree_util.tree_map(
            lambda x: x if isinstance(x, jax.ShapeDtypeStruct)
            else ocp.utils.to_shape_dtype_struct(x),
            template,
        )
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_model_weights(params, path: str | Path) -> None:
    """Backbone-only weight export (reference save_model_weights
    ddpm.py:363-365 / utils.py:166-167 parity) as an .npz of flattened leaves."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, **arrays)


_TRANSPLANT_KEYS = (
    "model_channels", "num_res_blocks", "channel_mult",
    "attention_resolutions", "conv_resample", "resblock_updown",
    "num_heads", "num_head_channels", "num_heads_upsample",
    "use_new_attention_order",
)


def load_weights_auto(params_template, path: str | Path, model_kwargs=None):
    """Load backbone weights from either our ``.npz`` export or a reference
    PyTorch ``model.pth`` state_dict (torch.save path, reference
    utils.py:166-167) — dispatch on the file suffix.

    ``model_kwargs`` is the model section of the JSON config; the
    architecture keys the transplant needs to re-derive torch's flat
    ``input_blocks.N`` indexing are extracted from it (VERDICT r2 item 4:
    migration UX for reference-trained checkpoints).
    """
    path = Path(path)
    if path.suffix in (".pth", ".pt", ".bin"):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if any("down_blocks." in k for k in sd):
            # HF UNet2DModel layout (reference UNet_Diffuser checkpoints,
            # unet_diffusers.py:37-74) — detected by its distinctive keys
            from rho_diffusion_tpu.interop.hf_unet_weights import (
                transplant_hf_unet2d_state_dict,
            )

            params = transplant_hf_unet2d_state_dict(
                sd,
                attention_head_dim=(model_kwargs or {}).get(
                    "attention_head_dim", 8,
                ),
            )
        else:
            from rho_diffusion_tpu.interop.torch_weights import (
                transplant_unet_state_dict,
            )

            kw = {
                k: v for k, v in (model_kwargs or {}).items()
                if k in _TRANSPLANT_KEYS
            }
            if "model_channels" not in kw or "num_res_blocks" not in kw:
                raise ValueError(
                    "transplanting a torch .pth checkpoint requires the model "
                    "config to specify at least model_channels and "
                    "num_res_blocks "
                    f"(got keys {sorted((model_kwargs or {}).keys())})",
                )
            params = transplant_unet_state_dict(sd, **kw)
        # validate against the template: same leaves, same shapes
        tpl_flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
        got = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
        leaves = []
        for k, v in tpl_flat:
            key = jax.tree_util.keystr(k)
            if key not in got:
                raise KeyError(f"transplant missing weight '{key}'")
            if got[key].shape != v.shape:
                raise ValueError(
                    f"shape mismatch for '{key}': torch checkpoint "
                    f"{got[key].shape} vs model {v.shape}",
                )
            leaves.append(np.asarray(got[key], dtype=v.dtype))
        # strict both ways (the reference's load_state_dict default): a
        # checkpoint carrying weights the model has no slot for (e.g. a
        # cond_fn trained in, but absent from this config) must fail
        # loudly, not silently drop the conditioning
        extra = sorted(set(got) - {jax.tree_util.keystr(k) for k, _ in tpl_flat})
        if extra:
            raise KeyError(
                f"checkpoint has {len(extra)} weight(s) the model config "
                f"cannot place (first few: {extra[:4]}) — does the config "
                "omit a cond_fn/conditioning block the checkpoint was "
                "trained with?",
            )
        treedef = jax.tree_util.tree_structure(params_template)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return load_model_weights(params_template, path)


def load_model_weights(params_template, path: str | Path):
    """Load an .npz produced by ``save_model_weights`` back into a pytree
    with the structure of ``params_template``."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    for k, v in flat:
        key = jax.tree_util.keystr(k)
        if key not in data:
            raise KeyError(f"weight '{key}' missing from {path}")
        saved = data[key]
        if saved.shape != v.shape:
            raise ValueError(
                f"shape mismatch for '{key}': checkpoint {saved.shape} vs "
                f"model {v.shape}",
            )
        leaves.append(saved.astype(v.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def resolve_inference_params(state, config, ckpt=None, work_dir: str | Path = "."):
    """Pick the sampling weights the way ``scripts/inference.py`` does.

    Resolution order: an explicit checkpoint FILE (``.pth``/``.npz``,
    auto-transplanted) > an explicit orbax checkpoint DIRECTORY > the
    config's ``training.checkpoint_dir`` (EMA weights preferred per
    ``inference.use_ema``) > untrained params with a warning. Shared by the
    inference CLI and ``serving.SamplingService.from_config`` so the two
    cannot drift. Returns ``(params, messages)`` — callers decide where the
    messages go (stdout, logger).
    """
    import os

    params = state.params
    messages: list[str] = []

    def _from_orbax(directory: Path):
        cm = CheckpointManager(directory)
        if cm.latest_step() is None:
            messages.append(
                f"WARNING: no checkpoints in {directory}; sampling untrained model",
            )
            return None
        restored = cm.restore(state)
        use_ema = config.inference.use_ema and restored.ema_params is not None
        messages.append(
            f"loaded {'EMA ' if use_ema else ''}weights from orbax step "
            f"{cm.latest_step()} in {directory}",
        )
        return restored.ema_params if use_ema else restored.params

    ckpt_dir = Path(config.training.checkpoint_dir or (Path(work_dir) / "checkpoints"))
    if ckpt and os.path.isfile(ckpt):
        params = load_weights_auto(
            params, ckpt, model_kwargs=dict(config.model.kwargs),
        )
        messages.append(f"loaded weights from {ckpt}")
    elif ckpt and Path(ckpt).is_dir():
        restored = _from_orbax(Path(ckpt))
        params = params if restored is None else restored
    elif ckpt:
        messages.append(
            f"WARNING: checkpoint '{ckpt}' not found; sampling untrained model",
        )
    elif ckpt_dir.exists():
        restored = _from_orbax(ckpt_dir)
        params = params if restored is None else restored
    else:
        messages.append(
            "WARNING: no checkpoint given and no checkpoint_dir; sampling "
            "untrained model",
        )
    return params, messages
