"""The training orchestrator — TPU-native replacement for the reference's
PyTorch-Lightning + IPEX + DDP stack (reference scripts/training.py:135-157,
xpu.py:245-422, ipex.py:29-60).

What Lightning strategies/plugins did there is compile-time SPMD here:

* one ("data", "context") mesh; the batch is sharded over "data", the train
  state is replicated; XLA inserts the gradient all-reduce on ICI —
  no DDP wrapper, no process-group warm-up collectives;
* the per-epoch loop feeds device-prefetched host batches into ONE jitted
  train step (loss+grad+optax+EMA, state donated);
* epoch-end hooks match the reference cadence: sample every
  ``sample_every_n_epochs`` (PNG grids), checkpoint every
  ``save_checkpoint_every_n_epochs`` (orbax full state + model.npz weights,
  reference ddpm.py:301-317);
* NaN in the loss raises a RuntimeError with context (the reference called
  sys.exit(0), ddpm.py:268-272);
* ``benchmark_mode`` (present-but-dead flag in the reference configs,
  config_spherical_harmonics.json:66) actually reports steps/sec here;
* metrics stream to stdout and a JSONL file; optional ``jax.profiler`` trace.
"""
from __future__ import annotations

import signal
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from rho_diffusion_tpu.config import ExperimentConfig
from rho_diffusion_tpu.data.loader import DataLoader, prefetch_to_device
from rho_diffusion_tpu.diffusion.base import AbstractDiffusionPipeline
from rho_diffusion_tpu.parallel.mesh import (
    DATA_AXIS,
    active_mesh,
    batch_sharding,
    make_mesh,
    replicate_state,
)
from rho_diffusion_tpu.registry import registry
from rho_diffusion_tpu.training.checkpoint import CheckpointManager, save_model_weights
from rho_diffusion_tpu.training.optimizers import build_lr_schedule
from rho_diffusion_tpu.training.state import TrainState
from rho_diffusion_tpu.utils import plot_tensor_images


def build_pipeline_from_config(
    config: ExperimentConfig,
    dataset=None,
    world_size: int = 1,
    pipeline_name: Optional[str] = None,
    steps_per_epoch: int = 1,
) -> AbstractDiffusionPipeline:
    """Construct the diffusion pipeline the way the reference scripts do
    (training.py:86-126): schedule from config, backbone by name,
    MultiEmbeddings conditioned on the dataset's parameter space."""
    from rho_diffusion_tpu.diffusion.ddpm import DDPM
    from rho_diffusion_tpu.diffusion.diffusers_compat import DiffusersDDPMPipeline
    from rho_diffusion_tpu.diffusion.gaussian import GaussianDiffusionPipeline

    pipelines = {
        "DDPM": DDPM,
        "GaussianDiffusionPipeline": GaussianDiffusionPipeline,
        "DiffusersDDPMPipeline": DiffusersDDPMPipeline,
    }
    name = pipeline_name or (config.pipeline.name if config.pipeline else "DDPM")
    pipeline_cls = pipelines.get(name)
    if pipeline_cls is None:
        raise KeyError(f"unknown pipeline '{name}'; available: {sorted(pipelines)}")
    pipeline_kwargs = dict(config.pipeline.kwargs) if config.pipeline else {}

    schedule_factory = registry.get("schedules", config.noise_schedule.name)
    schedule = schedule_factory(**config.noise_schedule.kwargs)

    opt_kwargs = dict(config.optimizer.kwargs)
    base_lr = opt_kwargs.get("lr", opt_kwargs.get("learning_rate", 1e-3))
    learning_rate = None
    if config.lr_scheduler is not None:
        learning_rate = build_lr_schedule(
            config.lr_scheduler.name,
            base_lr,
            steps_per_epoch,
            config.lr_scheduler.kwargs,
        )

    cond_fn = None
    cond_fn_kwargs = None
    model_kwargs = dict(config.model.kwargs)
    if (
        dataset is not None
        and getattr(dataset, "parameter_space", None) is not None
        and isinstance(model_kwargs.get("cond_fn"), str)
    ):
        cond_fn = model_kwargs["cond_fn"]
        embedding_dim = model_kwargs.get("model_channels", 64) * 4
        cond_fn_kwargs = {
            "parameter_space": dataset.parameter_space,
            "embedding_dim": embedding_dim,
        }

    # compute dtype policy from TrainingConfig (TPU-native addition)
    if "dtype" not in model_kwargs and config.training.dtype:
        import jax.numpy as jnp

        model_kwargs["dtype"] = getattr(jnp, config.training.dtype)

    return pipeline_cls(
        backbone=config.model.name,
        backbone_kwargs=model_kwargs,
        schedule=schedule,
        loss_func=config.training.loss_fn,
        cond_fn=cond_fn,
        cond_fn_kwargs=cond_fn_kwargs,
        optimizer=config.optimizer.name,
        opt_kwargs=opt_kwargs,
        learning_rate=learning_rate,
        world_size=world_size,
        ema_decay=config.training.ema_decay,
        log_grad_norm=config.training.log_grad_norm,
        grad_accum=config.training.grad_accum,
        sample_every_n_epochs=config.training.sample_every_n_epochs,
        save_checkpoint_every_n_epochs=config.training.save_checkpoint_every_n_epochs,
        **pipeline_kwargs,
    )


def build_inference_session(
    config: ExperimentConfig,
    checkpoint=None,
    work_dir=".",
    pipeline_name: Optional[str] = None,
):
    """Pipeline + dataset + sampling weights: the shared setup path of
    ``scripts/inference.py`` and ``serving.SamplingService.from_config``
    (mirrors reference inference.py:83-163). Returns
    ``(pipeline, dataset, params, messages)``; callers decide where the
    messages (checkpoint provenance, warnings) are printed/logged."""
    import jax

    from rho_diffusion_tpu.config import apply_torch_checkpoint_schedule_fixup
    from rho_diffusion_tpu.training.checkpoint import resolve_inference_params

    messages: list[str] = []
    ds_cls = registry.get("datasets", config.dataset.name)
    try:
        dataset = ds_cls(**config.dataset.kwargs)
    except Exception:
        dataset = None  # e.g. HDF5 file not present at inference time
    if apply_torch_checkpoint_schedule_fixup(config, checkpoint):
        messages.append(
            "torch checkpoint + cosine schedule: using exact_reference table",
        )
    pipeline = build_pipeline_from_config(
        config,
        dataset=dataset,
        pipeline_name=pipeline_name or (
            config.pipeline.name if config.pipeline
            else "GaussianDiffusionPipeline"
        ),
    )
    state = pipeline.create_state(jax.random.PRNGKey(config.inference.seed))
    params, msgs = resolve_inference_params(state, config, checkpoint, work_dir)
    return pipeline, dataset, params, messages + msgs


class Trainer:
    """Config-driven training loop over a device mesh."""

    def __init__(
        self,
        config: ExperimentConfig,
        pipeline: Optional[AbstractDiffusionPipeline] = None,
        dataset=None,
        work_dir: str | Path = ".",
        mesh=None,
        profile_dir: Optional[str] = None,
        loggers=None,
    ) -> None:
        self.config = config
        self.work_dir = Path(work_dir)
        self.work_dir.mkdir(parents=True, exist_ok=True)

        if dataset is None:
            ds_cls = registry.get("datasets", config.dataset.name)
            dataset = ds_cls(**config.dataset.kwargs)
        self.dataset = dataset

        if mesh is None:
            mesh_cfg = config.training.mesh or {}
            data = int(mesh_cfg.get("data", -1))
            context = int(mesh_cfg.get("context", 1))
            devices = None
            if data != -1 and data * context < len(jax.devices()):
                # config asks for a sub-mesh (e.g. small-batch debugging)
                devices = jax.devices()[: data * context]
            mesh = make_mesh(data=data, context=context, devices=devices)
        self.mesh = mesh
        self.world_size = self.mesh.devices.size
        data_size = self.mesh.shape["data"]
        if config.training.batch_size % data_size:
            # no silent device-stranding (round-1 gcd fallback removed):
            # every data-axis device must get equal batch rows
            raise ValueError(
                f"batch_size {config.training.batch_size} is not divisible "
                f"by the {data_size}-device data axis. Set training.batch_size "
                f"to a multiple of {data_size}, or pick a smaller mesh via "
                f'training.mesh = {{"data": N, "context": M}}.'
            )

        train_ds, self.val_ds = dataset, None
        if config.training.val_fraction > 0:
            from rho_diffusion_tpu.data.loader import Subset

            n = len(dataset)
            n_val = max(int(n * config.training.val_fraction), 1)
            rng = np.random.default_rng(config.training.seed)
            perm = rng.permutation(n)
            train_ds = Subset(dataset, perm[n_val:])
            self.val_ds = Subset(dataset, perm[:n_val])
        self.loader = DataLoader(
            train_ds,
            batch_size=config.training.batch_size,
            shuffle=True,
            seed=config.training.seed,
        )
        self.val_loader = (
            DataLoader(
                self.val_ds,
                batch_size=config.training.batch_size,
                shuffle=False,
                seed=config.training.seed,
                drop_last=False,
            )
            if self.val_ds is not None and len(self.val_ds) > 0
            else None
        )
        steps_per_epoch = max(len(self.loader), 1)

        if pipeline is None:
            pipeline = build_pipeline_from_config(
                config,
                dataset=dataset,
                world_size=self.world_size,
                steps_per_epoch=steps_per_epoch,
            )
        self.pipeline = pipeline

        ckpt_dir = config.training.checkpoint_dir or str(self.work_dir / "checkpoints")
        self.checkpoints = CheckpointManager(ckpt_dir)
        self.metrics_path = self.work_dir / "metrics.jsonl"
        self.profile_dir = profile_dir
        from rho_diffusion_tpu.training.loggers import build_loggers

        self.loggers = build_loggers(
            loggers if loggers is not None else config.training.loggers,
            self.work_dir,
        )

    # -- logging --------------------------------------------------------
    def log(self, record: dict) -> None:
        if jax.process_index() != 0:
            return
        for lg in self.loggers:
            lg.log(record)

    # -- state ----------------------------------------------------------
    def init_state(self, resume: bool = True, weights_path: Optional[str] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.config.training.seed)
        cfg = self.config.training
        if cfg.fsdp and cfg.zero1:
            raise ValueError(
                "training.fsdp and training.zero1 are mutually exclusive: "
                "fsdp (ZeRO-3) already shards the optimizer state",
            )
        # FSDP keeps the full state off any single device end to end:
        # fresh runs initialize DIRECTLY into the 1/N shards (jit +
        # out_shardings) and resumes restore each device's slice straight
        # from disk (sharded abstract template), so models larger than a
        # chip's HBM both start AND resume. Transplants (weights_path)
        # still build a template state first.
        resuming = resume and self.checkpoints.latest_step() is not None
        sharded_init = cfg.fsdp and not cfg.tensor_parallel and not weights_path
        if sharded_init and resuming:
            from rho_diffusion_tpu.parallel.mesh import fsdp_abstract_state

            state = self.checkpoints.restore(
                fsdp_abstract_state(self.pipeline.create_state, rng, self.mesh),
            )
        elif sharded_init:
            from rho_diffusion_tpu.parallel.mesh import create_state_fsdp

            state = create_state_fsdp(
                self.pipeline.create_state, rng, self.mesh,
            )
        else:
            state = self.pipeline.create_state(rng)
        if weights_path:
            from rho_diffusion_tpu.training.checkpoint import load_weights_auto

            params = load_weights_auto(
                state.params, weights_path,
                model_kwargs=dict(self.config.model.kwargs),
            )
            state = state.replace(params=params)
        elif resuming:
            if not sharded_init:  # sharded restore already happened above
                state = self.checkpoints.restore(state)
            self.log({"event": "resumed", "step": int(state.step)})
        elif self.checkpoints.latest_step() is not None:
            # fresh run into a directory holding a previous run's steps:
            # saves force past the stale steps (checkpoint.py:save), but a
            # later auto-resume picks the numerically LATEST step — warn so
            # the user clears the dir rather than mixing two runs' history
            self.log({
                "event": "stale_checkpoints",
                "latest_step": int(self.checkpoints.latest_step()),
                "warning": "starting fresh over existing checkpoints; "
                "consider a clean checkpoint_dir",
            })
        if cfg.tensor_parallel:
            from rho_diffusion_tpu.parallel.tensor import shard_params_for_tp

            state = shard_params_for_tp(
                state, self.mesh, min_dim=cfg.tp_min_dim,
            )
        elif not cfg.fsdp:
            state = replicate_state(state, self.mesh)
        # under fsdp (and no TP) the state goes STRAIGHT from wherever the
        # template landed to its 1/N shards below — replicating first would
        # put the full params+moments+EMA on every device and defeat
        # ZeRO-3's memory point at exactly the moment it matters
        if cfg.fsdp and not sharded_init:
            from rho_diffusion_tpu.parallel.mesh import shard_state_fsdp

            state = shard_state_fsdp(state, self.mesh)
        elif cfg.zero1:
            from rho_diffusion_tpu.parallel.mesh import shard_opt_state_zero1

            state = shard_opt_state_zero1(state, self.mesh)
        return state

    # -- epoch-end hooks (reference on_train_epoch_end, ddpm.py:301-317) --
    def maybe_sample(self, state: TrainState, epoch: int) -> None:
        every = self.config.training.sample_every_n_epochs
        if not every or (epoch + 1) % every:
            return
        # training.sample_params picks the parameter set: "ema" (default;
        # falls back to raw when EMA is off) or "raw" — the round-5
        # ablation showed the EMA benefit is budget-dependent (RESULTS.md)
        params = (
            state.ema_params
            if state.ema_params is not None
            and self.config.training.sample_params != "raw"
            else state.params
        )
        space = getattr(self.dataset, "parameter_space", None)
        use_hash = bool(getattr(self.dataset, "use_emb_as_labels", False))
        samples = self.pipeline.generate(
            params,
            jax.random.PRNGKey(epoch),
            batch_size=min(self.config.training.batch_size, 16),
            parameter_space=space.parameters if space is not None else None,
            as_hash_embeddings=use_hash,
        )
        if jax.process_index() == 0:
            out = self.work_dir / f"output_{epoch}.png"
            plot_tensor_images(np.asarray(samples), filename=str(out))
            self.log({"event": "sampled", "epoch": epoch, "file": str(out)})

    def maybe_validate(self, state: TrainState, epoch: int) -> None:
        """Held-out evaluation each N epochs (the reference's
        validation_step was a stub returning 0, ddpm.py:367-371)."""
        every = self.config.training.validate_every_n_epochs
        if self.val_loader is None or not every or (epoch + 1) % every:
            return
        losses, psnrs, weights = [], [], []
        for batch in self.val_loader:
            valid = batch.pop("valid", None)
            if valid is not None:
                # short final batch was wrap-padded by the loader: evaluate
                # only the real rows (they form a prefix of the local slice)
                # so val metrics don't double-count early samples
                n = int(np.sum(valid))
                if n == 0:
                    continue
                assert bool(np.all(valid[:n])), "padded rows must be a suffix"
                batch = {
                    k: v[:n]
                    if isinstance(v, np.ndarray) and v.shape[:1] == valid.shape[:1]
                    else v
                    for k, v in batch.items()
                }
            m = self.pipeline.validation_step(state, batch)
            losses.append(float(m["train_loss"]))
            psnrs.append(float(m["psnr"]))
            weights.append(len(batch["data"]))
        if not losses:
            return
        self.log({
            "event": "validation", "epoch": epoch,
            "val_loss": float(np.average(losses, weights=weights)),
            "val_psnr": float(np.average(psnrs, weights=weights)),
        })

    def maybe_checkpoint(self, state: TrainState, epoch: int) -> None:
        every = self.config.training.save_checkpoint_every_n_epochs
        if not every or (epoch + 1) % every:
            return
        self.checkpoints.save(state)
        if jax.process_index() == 0:
            save_model_weights(state.params, self.work_dir / "model.npz")

    # -- main loop --------------------------------------------------------
    def fit(self, state: Optional[TrainState] = None, max_epochs: Optional[int] = None) -> TrainState:
        """Train. With no ``max_epochs`` argument, ``training.max_epochs``
        is the TOTAL epoch budget — a preempted-and-auto-resumed run
        finishes the remaining epochs instead of training for the full
        budget again. An explicit ``max_epochs=N`` means "N further epochs
        from the current cursor" (interactive continuation)."""
        cfg = self.config.training
        if state is None:
            state = self.init_state()
        # spatial sharding applies to the 5-D volume only; labels/masks
        # keep plain batch sharding
        sharding = batch_sharding(self.mesh)
        per_key = (
            {"data": batch_sharding(self.mesh, spatial=True)}
            if cfg.spatial_sharding
            else None
        )
        log_every = max(cfg.log_every_n_steps, 1)
        bench = cfg.benchmark_mode

        device_cache = None
        if cfg.device_cache:
            from rho_diffusion_tpu.data.device_cache import DeviceDatasetCache

            device_cache = getattr(self, "_device_cache", None)
            if device_cache is None:
                device_cache = DeviceDatasetCache(
                    self.loader.dataset,
                    collate_fn=self.loader.collate_fn,
                    sharding=sharding,
                    per_key=per_key,
                    # rows 1/N per chip under a data mesh (N x the HBM
                    # budget); replicated on a single device
                    shard_over_data=(
                        cfg.device_cache_shard
                        and self.mesh.shape.get(DATA_AXIS, 1) > 1
                    ),
                )
                self._device_cache = device_cache

        # Preemption handling (absent in the reference, SURVEY §5): on
        # SIGTERM/SIGINT (TPU maintenance events, scheduler evictions) set a
        # flag; the step loop checkpoints the full train state and exits
        # cleanly so auto-resume continues from the same step.
        preempted: list = []
        prev_handlers = {}

        def _on_signal(signum, frame):
            # Second Ctrl-C force-stops: a hung/compiling step can't reach
            # the deferred checkpoint path, so restore the original handler
            # and raise so the user regains control (ADVICE r2).
            if signum == signal.SIGINT and signal.SIGINT in [s for s in preempted]:
                signal.signal(signal.SIGINT, prev_handlers.get(signal.SIGINT, signal.default_int_handler))
                raise KeyboardInterrupt
            preempted.append(signum)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # non-main thread
                pass

        # Exact mid-epoch resume (VERDICT r2 item 6): state.step counts
        # optimizer steps and the per-epoch permutation is a pure function of
        # (seed, epoch) via loader.set_epoch, so the data cursor is
        # (step // steps_per_epoch, step % steps_per_epoch). Fast-forwarding
        # the first resumed epoch replays the identical batch sequence an
        # uninterrupted run would have consumed (tests/training/
        # test_round3_fixes.py). No checkpoint-format change needed.
        spe = max(len(self.loader), 1)
        start_step = int(state.step)
        start_epoch = start_step // spe
        skip_batches = start_step % spe
        if max_epochs is not None:
            # explicit request: N further epochs (a partial resumed epoch
            # counts as the first)
            end_epoch = start_epoch + max_epochs
        else:
            # config budget: TOTAL epochs — resume finishes the remainder
            end_epoch = max(cfg.max_epochs, start_epoch)

        if self.profile_dir:
            jax.profiler.start_trace(self.profile_dir)
        try:
            step_times: list[float] = []
            for epoch in range(start_epoch, end_epoch):
                if preempted:
                    break
                self.loader.set_epoch(epoch)
                skip = skip_batches if epoch == start_epoch else 0
                if device_cache is not None:
                    batch_iter = device_cache.batches(self.loader, skip)
                else:
                    batch_iter = prefetch_to_device(
                        self.loader.iter_batches(skip), sharding, per_key=per_key,
                    )
                epoch_loss, n_steps = 0.0, 0
                t_step = time.perf_counter()
                for batch in batch_iter:
                    if preempted:
                        break
                    # active_mesh (not bare `with mesh`) so trace-time
                    # dispatch — e.g. ring attention on context>1 meshes —
                    # can see the mesh (parallel/mesh.py:get_active_mesh)
                    with active_mesh(self.mesh):
                        state, metrics = self.pipeline.training_step(state, batch)
                    n_steps += 1
                    step = int(state.step)
                    if step % log_every == 0 or n_steps == 1:
                        loss = float(metrics["train_loss"])
                        if not np.isfinite(loss):
                            raise RuntimeError(
                                f"non-finite train_loss {loss} at step {step} "
                                f"(epoch {epoch}) — aborting (the reference "
                                f"sys.exit(0)'d here; we fail loudly)",
                            )
                        epoch_loss = loss
                        now = time.perf_counter()
                        dt = (now - t_step) / min(n_steps, log_every)
                        t_step = now
                        rec = {
                            "step": step,
                            "epoch": epoch,
                            "train_loss": loss,
                            "psnr": float(metrics["psnr"]),
                        }
                        if "grad_norm" in metrics:
                            rec["grad_norm"] = float(metrics["grad_norm"])
                        if bench:
                            rec["steps_per_sec"] = 1.0 / max(dt, 1e-9)
                            step_times.append(dt)
                        self.log(rec)
                if preempted:
                    # checkpoint-on-signal: persist the full train state and
                    # exit cleanly so auto-resume continues from this step
                    self.checkpoints.save(state, wait=True)
                    self.log({
                        "event": "preempted",
                        "signal": int(preempted[0]),
                        "step": int(state.step),
                    })
                    break  # skip epoch hooks
                self.maybe_validate(state, epoch)
                self.maybe_sample(state, epoch)
                self.maybe_checkpoint(state, epoch)
                if epoch + 1 >= end_epoch:
                    break
            if bench and step_times:
                self.log(
                    {
                        "event": "benchmark",
                        "median_step_s": float(np.median(step_times)),
                        "steps_per_sec": float(1.0 / np.median(step_times)),
                    },
                )
        finally:
            if self.profile_dir:
                jax.profiler.stop_trace()
            for sig, handler in prev_handlers.items():
                signal.signal(sig, handler)
        self.checkpoints.save(state, wait=True)
        if jax.process_index() == 0:
            save_model_weights(state.params, self.work_dir / "model.npz")
        for lg in self.loggers:
            lg.close()
        return state
