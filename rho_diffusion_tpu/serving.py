"""Production sampling service: compiled-sampler buckets + request batching.

The reference ships only a one-shot CLI (`/root/reference/scripts/
inference.py`): every invocation re-imports torch, re-loads the checkpoint
and re-runs the full reverse loop eagerly. A deployment serving many
generation requests needs the opposite shape, and on TPU the design is
dictated by XLA's compilation model:

* **Static shapes** — each distinct batch size is a separate compiled
  program, so the service quantises requests onto a small ladder of
  ``batch_buckets`` (padding the tail) instead of compiling per-request.
* **Compile once, reuse forever** — per-bucket samplers are jitted once
  (optionally pre-warmed at startup) and live for the process lifetime.
* **Micro-batching** — a worker thread coalesces concurrent requests into
  one device program launch; under jit the per-launch overhead dominates
  small-batch sampling, so occupancy = throughput.
* **Pipelined pulls** — jax dispatch is async, so the worker hands each
  launch's unmaterialised device array to a pull thread and immediately
  coalesces/dispatches the next launch: the device→host sample transfer
  (the blocking ``np.asarray``) overlaps the next launch's compute. Depth
  capped at 2 in-flight launches. ``transfer_dtype`` further narrows the
  transferred bytes.
* **Request-deterministic noise** — both the initial latent x_T and the
  sampler's per-step noise stream are derived from (request seed, row
  index) via per-row PRNG keys built INSIDE the compiled program
  (``diffusion.sampling_rng``: ``keys_from_seeds``; x_T at tag T, step
  noise ``fold_in(row_key, t)``). The host ships only integers — no
  per-request device dispatches, no x_T megabytes over H2D. Every sampler —
  DDIM at any eta AND ancestral DDPM — returns bit-identical samples for a
  given (conditions, seed) regardless of which other requests it was
  batched with, how a large request was split, or which service instance
  ran it.

Typical use::

    service = SamplingService.from_config("config.json")  # loads EMA ckpt
    fut = service.submit(conditions=rows, seed=123)
    volumes = fut.result().samples            # np.ndarray [n, *grid, C]

or over HTTP via ``scripts/serve.py``.
"""
from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Sequence

import numpy as np


@dataclass
class GenerationResult:
    """One fulfilled request."""

    samples: np.ndarray  # [n, *data_shape, out_channels]
    latency_s: float  # enqueue -> fulfilment wall-clock
    bucket: int  # compiled batch size the request rode in
    batch_occupancy: float  # real samples / bucket for that launch


@dataclass
class _Chunk:
    """A request (or a split piece of one) awaiting a device launch."""

    conditions: Optional[np.ndarray]  # [n, cond_dim] or None
    seed: int  # request seed; row i's noise streams (x_T + steps) are (seed, offset + i)
    n: int
    enqueued_at: float
    assembly: "_Assembly"
    offset: int  # row offset of this chunk inside its request


class _Assembly:
    """Collects chunk outputs back into one request-ordered result."""

    def __init__(self, total: int, future: Future) -> None:
        self.total = total
        self.future = future
        self.parts: list[tuple[int, np.ndarray, int, float]] = []
        self.lock = threading.Lock()

    def deliver(
        self, offset: int, samples: np.ndarray, bucket: int, occupancy: float,
        enqueued_at: float,
    ) -> None:
        with self.lock:
            self.parts.append((offset, samples, bucket, occupancy))
            done = sum(p[1].shape[0] for p in self.parts) >= self.total
        if done and not self.future.done():
            self.parts.sort(key=lambda p: p[0])
            out = np.concatenate([p[1] for p in self.parts], axis=0)
            self.future.set_result(
                GenerationResult(
                    samples=out,
                    latency_s=time.perf_counter() - enqueued_at,
                    bucket=max(p[2] for p in self.parts),
                    batch_occupancy=min(p[3] for p in self.parts),
                ),
            )

    def fail(self, exc: BaseException) -> None:
        if not self.future.done():
            self.future.set_exception(exc)


class SamplingService:
    """Always-on generation service around one diffusion pipeline.

    Parameters
    ----------
    pipeline:
        A constructed pipeline (``DDPM`` / ``GaussianDiffusionPipeline`` /
        ``DiffusersDDPMPipeline``).
    params:
        The weights to sample with (typically EMA weights).
    sampler / num_steps / eta:
        Sampling configuration, fixed per service (one compiled program per
        bucket). ``sampler`` is ignored for the DDPM pipeline (always
        ancestral, like the reference's ``reverse_process``).
    cond_dim:
        Width of the condition rows ([n, cond_dim]); ``None`` for an
        unconditional service. Fixed per service — conditioning changes the
        traced program.
    batch_buckets:
        Ascending compiled batch sizes. A request larger than the biggest
        bucket is split across launches and reassembled transparently.
    max_delay_s:
        How long the batching worker waits to coalesce more requests after
        the first one arrives. 0 disables coalescing (every request
        launches immediately at the smallest fitting bucket).
    warmup:
        Compile every bucket at startup (otherwise first use pays compile).
    mesh:
        Optional ``jax.sharding.Mesh`` (e.g. ``parallel.mesh.make_mesh``):
        every launch runs SPMD — the bucket batch shards over the mesh's
        "data" axis, params are replicated once, and a context axis > 1
        additionally shards the volume depth (halo convs + ring attention,
        like ``training.spatial_sharding``) so volumes past one chip's HBM
        are servable. Every bucket must be divisible by the data axis
        size. This is the pod-slice serving shape: one service per host,
        N chips per launch.
    transfer_dtype:
        Optional narrow dtype ("bfloat16" / "float16") the compiled
        sampler casts its OUTPUT to before the device→host pull; the host
        widens back to float32 after the transfer, so callers always see
        float32 samples. Halves the D2H bytes per launch — measured to
        matter when the device link is slow relative to the sampler (the
        64^3 b8 launch pulls 8.4 MB of f32 volumes at ~60 ms/MB through a
        remote-device tunnel, ~0.4 s of the ~3.3 s launch). Costs one
        rounding step on the final denoised sample only (the sampler's
        internal state stays at full precision); None (default) transfers
        float32 exactly.
    """

    def __init__(
        self,
        pipeline,
        params,
        *,
        sampler: str = "ddim",
        num_steps: Optional[int] = 50,
        spacing: Optional[str] = None,
        eta: float = 0.0,
        guidance_scale: Optional[float] = None,
        cond_dim: Optional[int] = None,
        batch_buckets: Sequence[int] = (1, 2, 4, 8),
        max_delay_s: float = 0.002,
        warmup: bool = False,
        mesh=None,
        transfer_dtype: Optional[str] = None,
        quantize: Optional[str] = None,
    ) -> None:
        import jax

        from rho_diffusion_tpu.ops.quant import get_conv_quant, set_conv_quant

        # W8A8 convs on the int8 MXU (2x bf16 peak; ops/quant.py) — an
        # execution-mode switch, the checkpoint is unchanged. Trace-time
        # global: set before the bucket samplers compile and restored by
        # close(), so a later service (or any other sampler trace) in the
        # same process doesn't silently inherit this service's mode.
        # Measured speedups in RESULTS.md "int8 quantized serving".
        self._prev_quant = get_conv_quant()
        if quantize is not None:
            set_conv_quant(str(quantize))  # validates ("off" | "int8")
        self.quantize = quantize

        if transfer_dtype is not None:
            if str(transfer_dtype) not in ("bfloat16", "float16"):
                raise ValueError(
                    f"transfer_dtype must be 'bfloat16' or 'float16' (or "
                    f"None for exact float32 transfers), got {transfer_dtype!r}",
                )
            transfer_dtype = str(transfer_dtype)
        self.transfer_dtype = transfer_dtype

        if not batch_buckets or list(batch_buckets) != sorted(set(batch_buckets)):
            raise ValueError(
                f"batch_buckets must be ascending and unique, got {batch_buckets!r}",
            )
        self.mesh = mesh
        if mesh is not None:
            from rho_diffusion_tpu.parallel.mesh import DATA_AXIS, replicated

            n_data = mesh.shape.get(DATA_AXIS, 1)
            bad = [b for b in batch_buckets if b % n_data]
            if bad:
                raise ValueError(
                    f"batch_buckets {bad} not divisible by the mesh data "
                    f"axis ({n_data}) — each launch shards its batch evenly "
                    f"over the data axis",
                )
            params = jax.device_put(params, replicated(mesh))
        self.pipeline = pipeline
        self.params = params
        self.sampler = sampler
        self.num_steps = num_steps
        # respacing grid (None = the pipeline's sampler-aware default).
        # 'trailing' is REQUIRED to serve a progressively-distilled student
        # (scripts/distill.py): the student was trained on the trailing
        # grid; uniform-t would evaluate it at timesteps it never saw.
        self.spacing = spacing
        if spacing is not None and not hasattr(pipeline, "coeffs"):
            raise ValueError(
                "spacing is a GaussianDiffusion-family respacing control; "
                "the DDPM pipeline always samples its full schedule",
            )
        self.eta = eta
        if (
            guidance_scale is not None
            and float(guidance_scale) != 1.0
            and cond_dim is None
        ):
            # fail loudly like submit()'s conditions/cond_dim checks: the
            # guided sampler needs condition rows, so an unconditional
            # service would silently serve UNGUIDED samples otherwise
            raise ValueError(
                f"guidance_scale={guidance_scale} requires a conditional "
                "service (cond_dim is None)",
            )
        self.guidance_scale = guidance_scale
        self.cond_dim = cond_dim
        self.buckets = tuple(int(b) for b in batch_buckets)
        self.max_delay_s = float(max_delay_s)
        self._compiled: dict[int, object] = {}
        self._queue: queue.Queue[Optional[_Chunk]] = queue.Queue()
        self._stats_lock = threading.Lock()
        self._stats = {
            "requests": 0,
            "samples": 0,
            "launches": 0,
            "occupancy_sum": 0.0,
            "latencies_s": [],
        }
        self._closed = False
        self._lifecycle_lock = threading.Lock()
        # device->host pulls happen on a separate thread so the worker can
        # dispatch launch N+1 while launch N's samples stream back (jax
        # dispatch is async; np.asarray is the blocking pull). Queue depth
        # bounds in-flight launches (device memory) to 2.
        self._pull_queue: queue.Queue = queue.Queue(maxsize=2)
        if warmup:
            # compile AND execute each bucket synchronously so a broken
            # sampler (shape error, OOM, missing conditioning) fails the
            # constructor instead of every future request
            for b in self.buckets:
                fn = self._get_compiled(b)
                conds = (
                    np.zeros((b, cond_dim), np.float32) if cond_dim else None
                )
                seeds = np.zeros(b, np.uint32)
                idxs = np.arange(b, dtype=np.int32)
                jax.block_until_ready(fn(self.params, seeds, idxs, conds))
        self._worker = threading.Thread(
            target=self._worker_loop, name="sampling-service", daemon=True,
        )
        self._worker.start()
        self._puller = threading.Thread(
            target=self._pull_loop, name="sampling-service-pull", daemon=True,
        )
        self._puller.start()

    # -- construction helpers -----------------------------------------
    @classmethod
    def from_config(
        cls,
        config_path: str | Path,
        checkpoint: str | Path | None = None,
        log=print,
        **service_kwargs,
    ) -> "SamplingService":
        """Build pipeline + weights exactly like ``scripts/inference.py``
        (shared `build_inference_session` path): registry-resolved
        components from the JSON config, weights from a ``.pth``/``.npz``
        file or an orbax checkpoint dir (EMA preferred,
        ``inference.use_ema``). ``cond_dim`` is derived from the model
        config when not given: parameter-row width for a MultiEmbeddings
        cond_fn, hash-embedding width (4·model_channels) otherwise."""
        from rho_diffusion_tpu.config import ExperimentConfig
        from rho_diffusion_tpu.training.trainer import build_inference_session

        config = ExperimentConfig.from_json(config_path)
        ckpt = checkpoint or config.inference.checkpoint
        pipeline, dataset, params, messages = build_inference_session(
            config, checkpoint=ckpt,
        )
        for m in messages:
            log(m)
        if "cond_dim" not in service_kwargs:
            mk = dict(config.model.kwargs)
            if mk.get("num_classes"):
                space = getattr(dataset, "parameter_space", None)
                if space is not None and isinstance(mk.get("cond_fn"), str):
                    # raw parameter rows through MultiEmbeddings
                    service_kwargs["cond_dim"] = len(space)
                else:
                    # sha512 hash-embedding rows (width == time-emb width)
                    service_kwargs["cond_dim"] = 4 * mk.get("model_channels", 64)
        if "sampler" not in service_kwargs:
            service_kwargs["sampler"] = config.inference.sampler
        if "num_steps" not in service_kwargs:
            service_kwargs["num_steps"] = config.inference.ddim_steps or None
        if "spacing" not in service_kwargs:
            service_kwargs["spacing"] = config.inference.spacing
        if "guidance_scale" not in service_kwargs:
            # 1.0 is the unguided no-op everywhere downstream; no
            # normalization needed (reverse_process short-circuits on it)
            service_kwargs["guidance_scale"] = getattr(
                config.inference, "guidance_scale", 1.0,
            )
        service = cls(pipeline, params, **service_kwargs)
        service._config = config  # enables reload_from_checkpoint
        return service

    # -- public API ----------------------------------------------------
    def submit(
        self,
        conditions: Optional[np.ndarray] = None,
        n: Optional[int] = None,
        seed: int = 0,
    ) -> Future:
        """Enqueue a generation request; returns a Future[GenerationResult].

        ``conditions`` is [n, cond_dim] (or None for an unconditional
        service); ``n`` defaults to ``len(conditions)`` (or 1). The request
        is deterministic in ``seed`` for every sampler (per-row noise
        streams — batching, splitting and padding never change a result).
        """
        if conditions is not None:
            conditions = np.asarray(conditions, np.float32)
            if conditions.ndim == 1:
                conditions = conditions[None]
            if self.cond_dim is None:
                raise ValueError(
                    "unconditional service (cond_dim=None) got conditions",
                )
            if conditions.shape[-1] != self.cond_dim:
                raise ValueError(
                    f"conditions last dim {conditions.shape[-1]} != service "
                    f"cond_dim {self.cond_dim}",
                )
            n = conditions.shape[0] if n is None else n
            if conditions.shape[0] != n:
                raise ValueError(
                    f"n={n} but {conditions.shape[0]} condition rows given",
                )
        elif self.cond_dim is not None:
            raise ValueError(
                f"conditional service (cond_dim={self.cond_dim}) needs "
                f"condition rows",
            )
        else:
            n = 1 if n is None else n
        if n < 1:
            raise ValueError(f"n must be >= 1, got {n}")
        future: Future = Future()
        assembly = _Assembly(n, future)
        # one noise stream per row (x_T AND step noise), derived from
        # (seed, row index) INSIDE the compiled sampler from plain integers
        # (keys_from_seeds): independent of micro-batch composition and
        # service instance, and submit touches no jax and ships no x_T
        # bytes — both measured to throttle fast-sampler serving through a
        # remote-device tunnel (~0.2 s/request of eager key dispatches;
        # 1-8.4 MB of H2D per launch)
        now = time.perf_counter()
        max_bucket = self.buckets[-1]
        # closed-check and enqueue under one lock so a concurrent close()
        # (e.g. server shutdown racing an HTTP handler thread) cannot strand
        # chunks in a queue nobody drains
        with self._lifecycle_lock:
            if self._closed:
                raise RuntimeError("service is closed")
            with self._stats_lock:
                self._stats["requests"] += 1
                self._stats["samples"] += n
            for off in range(0, n, max_bucket):
                m = min(max_bucket, n - off)
                self._queue.put(
                    _Chunk(
                        conditions=(
                            conditions[off : off + m]
                            if conditions is not None
                            else None
                        ),
                        seed=seed,
                        n=m,
                        enqueued_at=now,
                        assembly=assembly,
                        offset=off,
                    ),
                )
        return future

    def generate(self, conditions=None, n=None, seed: int = 0) -> GenerationResult:
        """Synchronous convenience wrapper around :meth:`submit`."""
        return self.submit(conditions, n, seed).result()

    def update_params(self, params) -> None:
        """Swap the served weights in place — no recompile (params are a
        jit ARGUMENT, not a closure). Serving a live training run: point
        :meth:`reload_from_checkpoint` at its checkpoint dir every few
        epochs and requests pick up the newest EMA weights."""
        import jax

        if self.mesh is not None:
            from rho_diffusion_tpu.parallel.mesh import replicated

            params = jax.device_put(params, replicated(self.mesh))
        # atomic reference swap; in-flight launches finish on the old
        # weights, the next launch reads the new ones
        self.params = params

    def reload_from_checkpoint(self, checkpoint=None) -> list[str]:
        """Re-resolve weights (orbax dir / .pth / .npz) and serve them.

        Only available on services built by :meth:`from_config` (the config
        is needed to rebuild the state template). Returns the resolution
        messages (checkpoint provenance or warnings)."""
        import jax

        config = getattr(self, "_config", None)
        if config is None:
            raise RuntimeError(
                "reload_from_checkpoint needs a from_config-built service; "
                "call update_params(params) directly instead",
            )
        from rho_diffusion_tpu.training.checkpoint import resolve_inference_params

        state = self.pipeline.create_state(jax.random.PRNGKey(config.inference.seed))
        params, messages = resolve_inference_params(
            state, config, checkpoint or config.inference.checkpoint,
        )
        self.update_params(params)
        return messages

    def stats(self) -> dict:
        """Service counters: requests/samples/launches, mean batch
        occupancy, latency p50/p95 (seconds)."""
        with self._stats_lock:
            lat = sorted(self._stats["latencies_s"])
            launches = self._stats["launches"]
            return {
                "requests": self._stats["requests"],
                "samples": self._stats["samples"],
                "launches": launches,
                "mean_occupancy": (
                    self._stats["occupancy_sum"] / launches if launches else 0.0
                ),
                "latency_p50_s": lat[len(lat) // 2] if lat else 0.0,
                "latency_p95_s": lat[int(len(lat) * 0.95)] if lat else 0.0,
                "buckets": list(self.buckets),
                "compiled_buckets": sorted(self._compiled),
                "sampler": self.sampler,
                "num_steps": self.num_steps,
                "spacing": self.spacing,
            }

    def close(self) -> None:
        """Stop the worker; queued-but-unlaunched requests fail cleanly.

        The worker itself drains the queue when it sees the sentinel (even
        if it was mid-compile when close() was called and this join times
        out), so pending futures always resolve — no chunk is ever stranded
        behind a consumed sentinel."""
        with self._lifecycle_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)
        self._worker.join(timeout=30)
        self._puller.join(timeout=30)
        if self.quantize is not None:
            # restore the process-global conv-quant mode this service set
            from rho_diffusion_tpu.ops.quant import set_conv_quant

            set_conv_quant(self._prev_quant)

    def __enter__(self) -> "SamplingService":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- internals -----------------------------------------------------

    def _get_compiled(self, bucket: int):
        fn = self._compiled.get(bucket)
        if fn is not None:
            return fn
        import jax

        pipeline = self.pipeline
        shape = pipeline.sample_shape(bucket)
        from rho_diffusion_tpu.diffusion.sampling_rng import keys_from_seeds

        if hasattr(pipeline, "coeffs"):  # GaussianDiffusion family
            sampler, eta, num_steps = self.sampler, self.eta, self.num_steps
            guidance = self.guidance_scale
            spacing = self.spacing

            def raw(params, seeds, idxs, conds):
                return pipeline.reverse_process(
                    params, keys_from_seeds(seeds, idxs), shape, conds,
                    sampler=sampler, eta=eta, num_steps=num_steps,
                    spacing=spacing, guidance_scale=guidance,
                    t_checkpoints=(),
                )

        else:  # DDPM pipeline: ancestral only, like the reference
            guidance = self.guidance_scale

            def raw(params, seeds, idxs, conds):
                return pipeline.reverse_process(
                    params, keys_from_seeds(seeds, idxs), shape, conds,
                    guidance_scale=guidance,
                )["denoised"]

        if self.transfer_dtype is not None:
            # narrow ONLY the final pulled array inside the compiled
            # program; all sampler-internal math stays full precision
            import jax.numpy as jnp

            narrow, inner_raw = jnp.dtype(self.transfer_dtype), raw

            def raw(params, seeds, idxs, conds):  # noqa: F811 - output cast
                return inner_raw(params, seeds, idxs, conds).astype(narrow)

        if self.mesh is not None:
            # pod-slice SPMD: the bucket batch shards over the mesh's data
            # axis (params/rng replicated) and, when the mesh has a
            # context axis > 1, the volume depth additionally shards over
            # it — the model's halo convs + ring attention activate via
            # the active-mesh dispatch exactly as in the Trainer, so 64^3+
            # volumes that exceed one chip's HBM are servable too
            from rho_diffusion_tpu.parallel.mesh import (
                CONTEXT_AXIS,
                active_mesh,
                batch_sharding,
                replicated,
            )

            mesh = self.mesh
            spatial = mesh.shape.get(CONTEXT_AXIS, 1) > 1
            inner = raw

            def raw(params, seeds, idxs, conds):  # noqa: F811 - mesh wrapper
                with active_mesh(mesh):
                    return inner(params, seeds, idxs, conds)

            x_sh = batch_sharding(mesh, spatial=spatial)
            c_sh = batch_sharding(mesh)
            rsh = replicated(mesh)
            # seeds/idxs are the [bucket] per-row noise identities — they
            # ride the data axis with their rows
            fn = jax.jit(
                raw,
                in_shardings=(
                    rsh, c_sh, c_sh, c_sh if self.cond_dim else None,
                ),
                out_shardings=x_sh,
            )
        else:
            fn = jax.jit(raw)
        self._compiled[bucket] = fn
        return fn

    def _pick_bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _launch(self, chunks: list[_Chunk]) -> None:
        total = sum(c.n for c in chunks)
        bucket = self._pick_bucket(total)
        try:
            pad = bucket - total
            # per-row noise identities as PLAIN integer arrays; the compiled
            # sampler turns them into typed keys (keys_from_seeds) on device
            # and draws x_T from them too. Pad rows reuse (seed 0, row 0..)
            # and are discarded below.
            seeds = np.concatenate(
                [np.full(c.n, c.seed & 0xFFFFFFFF, np.uint32) for c in chunks]
                + ([np.zeros(pad, np.uint32)] if pad else []),
            )
            idxs = np.concatenate(
                [np.arange(c.offset, c.offset + c.n, dtype=np.int32)
                 for c in chunks]
                + ([np.arange(pad, dtype=np.int32)] if pad else []),
            )
            conds = None
            if self.cond_dim is not None:
                conds = np.concatenate(
                    [c.conditions for c in chunks], axis=0,
                ).astype(np.float32)
                if pad:
                    conds = np.concatenate(
                        [conds, np.zeros((pad, self.cond_dim), np.float32)],
                        axis=0,
                    )
            fn = self._get_compiled(bucket)
            # async dispatch: returns an unmaterialised device array; the
            # pull thread blocks on the actual D2H transfer so this worker
            # can coalesce + dispatch the NEXT launch meanwhile
            dev_out = fn(self.params, seeds, idxs, conds)
        except Exception as exc:
            # compile/tracing/assembly failures resolve the futures; the
            # worker thread itself must never die (that would strand every
            # later request)
            for c in chunks:
                c.assembly.fail(exc)
            return
        self._pull_queue.put((dev_out, chunks, bucket, total / bucket))

    def _deliver(self, dev_out, chunks, bucket, occupancy) -> None:
        try:
            out = np.asarray(dev_out)
            if out.dtype != np.float32:
                # widen the narrowed transfer (bf16/f16 over the wire)
                # back to the float32 the public API promises
                out = out.astype(np.float32)
        except Exception as exc:
            # device-side failures surface at the pull
            for c in chunks:
                c.assembly.fail(exc)
            return
        now = time.perf_counter()
        # stats BEFORE resolving futures: a caller unblocked by its result
        # must see this launch already counted in stats()
        with self._stats_lock:
            self._stats["launches"] += 1
            self._stats["occupancy_sum"] += occupancy
            for c in chunks:
                self._stats["latencies_s"].append(now - c.enqueued_at)
            # bound the latency reservoir for long-lived services
            if len(self._stats["latencies_s"]) > 10_000:
                self._stats["latencies_s"] = self._stats["latencies_s"][-5_000:]
        off = 0
        for c in chunks:
            c.assembly.deliver(
                c.offset, out[off : off + c.n], bucket, occupancy, c.enqueued_at,
            )
            off += c.n

    def _pull_loop(self) -> None:
        while True:
            item = self._pull_queue.get()
            if item is None:
                return
            try:
                self._deliver(*item)
            except Exception as exc:
                # The pull thread must never die: the bounded _pull_queue
                # would back the worker up on put() and deadlock the whole
                # service. Anything escaping _deliver's own guards (e.g.
                # InvalidStateError from a future a client cancelled
                # between done() and set_result, or a stats bookkeeping
                # bug) fails this launch's outstanding futures and moves on.
                for c in item[1]:
                    try:
                        c.assembly.fail(exc)
                    except Exception:
                        pass

    def _worker_loop(self) -> None:
        try:
            self._worker_loop_inner()
        finally:
            # the worker is the only producer of pulls, so its exit sentinel
            # lands strictly after every dispatched launch (FIFO): the pull
            # thread drains all in-flight results before stopping
            self._pull_queue.put(None)

    def _worker_loop_inner(self) -> None:
        max_bucket = self.buckets[-1]
        while True:
            chunk = self._queue.get()
            if chunk is None:
                return
            batch = [chunk]
            total = chunk.n
            deadline = time.perf_counter() + self.max_delay_s
            # coalesce until the biggest bucket is full or the window closes
            while total < max_bucket:
                budget = deadline - time.perf_counter()
                try:
                    nxt = self._queue.get(timeout=max(budget, 0.0))
                except queue.Empty:
                    break
                if nxt is None:
                    # sentinel: the queue is FIFO and submit-after-close
                    # raises, so `batch` holds the only remaining work
                    self._launch(batch)
                    return
                if total + nxt.n > max_bucket:
                    # launch what we have; the oversized remainder starts
                    # the next batch
                    self._launch(batch)
                    batch, total = [nxt], nxt.n
                    deadline = time.perf_counter() + self.max_delay_s
                    continue
                batch.append(nxt)
                total += nxt.n
            self._launch(batch)


def make_http_handler(service: SamplingService):
    """An http.server handler class bound to ``service``.

    Endpoints:
      GET  /healthz  -> {"ok": true}
      GET  /stats    -> service.stats()
      POST /generate -> body {"conditions": [[...]] | null, "n": int,
                        "seed": int, "return": "list" | "stats"}
                        reply {"shape": [...], "samples": nested list,
                        "latency_s": float, "bucket": int}
      POST /reload   -> body {"checkpoint": path | null} — re-resolve and
                        hot-swap the served weights (no recompile)
    ``return: "stats"`` omits the sample payload (for load tests)."""
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            elif self.path == "/stats":
                self._reply(200, service.stats())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self) -> None:  # noqa: N802
            if self.path == "/reload":
                # pick up newer weights (e.g. a live training run's latest
                # EMA checkpoint) without restarting or recompiling
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    messages = service.reload_from_checkpoint(
                        req.get("checkpoint"),
                    )
                except RuntimeError as exc:
                    self._reply(400, {"error": str(exc)})
                    return
                except Exception as exc:
                    self._reply(500, {"error": str(exc)})
                    return
                self._reply(200, {"ok": True, "messages": messages})
                return
            if self.path != "/generate":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                conds = req.get("conditions")
                conds = (
                    np.asarray(conds, np.float32) if conds is not None else None
                )
                n = req.get("n")
                seed = int(req.get("seed", 0))
            except Exception as exc:  # malformed JSON/fields
                self._reply(400, {"error": str(exc)})
                return
            try:
                result = service.generate(conditions=conds, n=n, seed=seed)
            except ValueError as exc:  # request validation (submit)
                self._reply(400, {"error": str(exc)})
                return
            except Exception as exc:  # device/sampler fault: server-side
                self._reply(500, {"error": str(exc)})
                return
            payload = {
                "shape": list(result.samples.shape),
                "latency_s": result.latency_s,
                "bucket": result.bucket,
            }
            if req.get("return", "list") == "list":
                payload["samples"] = result.samples.astype(float).tolist()
            self._reply(200, payload)

        def log_message(self, *args) -> None:  # quiet by default
            pass

    return Handler
