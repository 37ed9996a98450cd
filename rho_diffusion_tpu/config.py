"""JSON experiment configuration.

Keeps the exact JSON schema of the reference framework
(/root/reference/rho_diffusion/config.py:36-110) so that the shipped example
configs (examples/config_spherical_harmonics.json, config_deep_galaxy.json)
load unchanged apart from the device string. Implemented with pydantic v2.

Schema:
    {
      "experiment": str,
      "model":          {"name": str, "kwargs": {...}},
      "dataset":        {"name": str, "kwargs": {...}},
      "optimizer":      {"name": str, "kwargs": {...}},
      "lr_scheduler":   {"name": str, "kwargs": {...}},   (optional)
      "noise_schedule": {"name": str, "kwargs": {...}},
      "training":  {...},
      "inference": {...}
    }
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Literal, Optional, Union

from pydantic import BaseModel, ConfigDict, field_validator

from rho_diffusion_tpu.utils import number_cast_dict


class ComponentConfig(BaseModel):
    """A named component plus its constructor kwargs, resolved via the
    registry (reference: config.py:36-48)."""

    model_config = ConfigDict(extra="ignore", protected_namespaces=())

    name: str
    kwargs: dict[str, Any] = {}

    @field_validator("kwargs", mode="before")
    @classmethod
    def _cast_numeric_strings(cls, v: dict) -> dict:
        # The reference coerces numeric strings like "1e-4" -> float
        # (config.py validator + utils.number_cast_dict).
        return number_cast_dict(v or {})


class TrainingConfig(BaseModel):
    """Training hyperparameters (reference: config.py:51-64).

    ``benchmark_mode`` existed in the reference example configs but was never
    read by any code; here it actually enables throughput logging.
    """

    model_config = ConfigDict(extra="ignore")

    device: str = "tpu"
    np: int = 1
    loss_fn: str = "MSELoss"
    ema_decay: float = 0.0
    batch_size: int = 16
    seed: int = 0
    min_epochs: int = 1
    max_epochs: int = 1
    save_checkpoint_every_n_epochs: int = 0
    sample_every_n_epochs: int = 0
    benchmark_mode: bool = False
    # TPU-native additions (absent in the reference):
    dtype: str = "bfloat16"  # compute dtype under jit; params stay float32
    checkpoint_dir: Optional[str] = None
    log_every_n_steps: int = 50
    # grad_norm logging re-reads every gradient (~2% of the flagship step);
    # the reference logged only loss+psnr, so it is opt-out.
    log_grad_norm: bool = True
    # Gradient accumulation: average gradients over N sequential
    # microbatches (batch_size must divide evenly) before the single
    # optimizer update — large effective batches within one chip's HBM
    # (e.g. 64^3 at effective b32 = 4 x b8 where b16 measured OOM).
    grad_accum: int = 1
    val_fraction: float = 0.0  # held-out split evaluated each epoch
    validate_every_n_epochs: int = 1
    # Parallel layout. ``mesh`` picks the ("data", "context") device mesh,
    # e.g. {"data": 4, "context": 2}; "data": -1 means all remaining
    # devices. context > 1 enables ring attention over the context axis
    # (sequence parallelism for volumetric token counts). Omitted -> pure
    # data parallelism over every device.
    mesh: Optional[dict[str, int]] = None
    # Shard large parameter kernels' output channels over the context axis
    # (tensor parallelism; GSPMD inserts the collectives).
    tensor_parallel: bool = False
    # Spatial context parallelism: shard the volume's depth axis over the
    # context axis (GSPMD conv halo exchange + norm psums; ring attention
    # picks up the token sharding). Needs mesh.context > 1.
    spatial_sharding: bool = False
    tp_min_dim: int = 64  # smallest channel count worth sharding
    # ZeRO-1: shard optimizer moments (and the EMA shadow) over the data
    # axis — 1/N memory per device (the reference's commented
    # deepspeed_stage_1, scripts/training.py:139).
    zero1: bool = False
    # FSDP / ZeRO-3: shard the PARAMETERS too (plus moments and EMA) 1/N
    # over the data axis; GSPMD inserts the weight all-gathers and gradient
    # reduce-scatters (parallel/mesh.py:shard_state_fsdp). Mutually
    # exclusive with zero1 (strict superset).
    fsdp: bool = False
    # Device-resident dataset cache (single-host, TPU-native addition):
    # upload the collated dataset to HBM once and build each batch as an
    # on-device gather — per-step H2D shrinks from the full batch to a few
    # int32 indices (data/device_cache.py). Raises if the dataset exceeds
    # the HBM budget; keep False to stream batches from host. Note the
    # dataset is snapshotted once: stochastic-per-access datasets (the
    # synthetic Ylm family) train on frozen draws, like a to_hdf5 export.
    device_cache: bool = False
    # Under a multi-device data mesh, shard the cached table's rows 1/N
    # over the data axis (batches assemble via one small psum_scatter over
    # ICI; bit-identical to host-streamed batches). False = replicate the
    # full table on every chip (the single-device behaviour).
    device_cache_shard: bool = True
    # Metric sinks, resolved via the "loggers" registry category
    # ("stdout" | "jsonl" | "csv" | "mlflow"); the default reproduces the
    # stdout + metrics.jsonl behaviour.
    loggers: list[Any] = ["stdout", "jsonl"]
    # Which parameter set epoch-end sampling/validation draws from. The
    # round-5 ablation (RESULTS.md, benchmarks/ema_ablation.py) measured
    # the EMA benefit as BUDGET-DEPENDENT: at ~3k-step budgets raw params
    # beat EMA-0.9999 ~3x on matched MSE (the shadow lags a fast descent),
    # while at the 9k-step flagship budget EMA wins 15-18%. "ema" (default,
    # falls back to raw when ema_decay == 0) | "raw".
    sample_params: Literal["ema", "raw"] = "ema"


class InferenceConfig(BaseModel):
    """Sampling-time configuration (reference: config.py:67-77)."""

    model_config = ConfigDict(extra="ignore")

    device: str = "tpu"
    checkpoint: Optional[str] = None
    parameter_space: Optional[dict[str, list]] = None
    cache_file: Optional[str] = None
    plot_output_file: Optional[str] = None
    seed: int = 0
    # TPU-native additions:
    num_samples: int = 16
    sampler: str = "ddpm"  # "ddpm" | "ddim" | "dpm++" | "unipc"
    ddim_steps: int = 0  # 0 -> full T
    # respacing grid: None -> sampler-aware default (uniform-lambda for
    # dpm++, trailing for zero-terminal-SNR, uniform-t otherwise); set
    # "trailing" when sampling a distilled student
    spacing: Optional[str] = None
    use_ema: bool = True
    # classifier-free guidance scale (1.0 = off); needs a model trained
    # with pipeline cond_dropout > 0
    guidance_scale: float = 1.0


class ExperimentConfig(BaseModel):
    """Top-level experiment config (reference: config.py:80-110)."""

    model_config = ConfigDict(extra="ignore", protected_namespaces=())

    experiment: str
    model: ComponentConfig
    dataset: ComponentConfig
    optimizer: ComponentConfig
    lr_scheduler: Optional[ComponentConfig] = None
    noise_schedule: ComponentConfig
    # TPU-native addition: select the diffusion pipeline by name
    # (DDPM | GaussianDiffusionPipeline | DiffusersDDPMPipeline); the
    # reference hardcoded the choice in each script.
    pipeline: Optional[ComponentConfig] = None
    training: TrainingConfig = TrainingConfig()
    inference: InferenceConfig = InferenceConfig()

    @classmethod
    def from_json(cls, path: Union[str, Path]) -> "ExperimentConfig":
        """Load and validate an experiment config from a JSON file
        (reference API: config.py:97-110)."""
        with open(path) as f:
            payload = json.load(f)
        return cls.model_validate(payload)

    def to_json(self, path: Union[str, Path]) -> None:
        with open(path, "w") as f:
            json.dump(self.model_dump(), f, indent=2, default=str)


def apply_torch_checkpoint_schedule_fixup(config: "ExperimentConfig", ckpt) -> bool:
    """When loading a reference-trained torch checkpoint (``model.pth``)
    under a cosine schedule, flip the schedule to the reference's exact
    degenerate T+1 coefficient table (``exact_reference=True``) so denoising
    matches the framework the weights were trained in. Shared by the
    training/inference/evaluate CLIs (one place, not three copies).
    Returns True when the fixup was applied."""
    if (
        ckpt
        and str(ckpt).endswith((".pth", ".pt"))
        and config.noise_schedule.name == "CosineBetaSchedule"
        and "exact_reference" not in config.noise_schedule.kwargs
    ):
        config.noise_schedule.kwargs["exact_reference"] = True
        return True
    return False
