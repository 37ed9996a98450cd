"""Host-side data loading: batching, shuffling, threaded prefetch, and
device placement with mesh sharding.

Replaces the reference's torch DataLoader + DistributedSampler
(/root/reference/scripts/training_ddp.py:136-143): per-host index sharding
is computed from ``jax.process_index()`` (no sampler object), batches are
assembled by a thread pool (scipy/h5py work releases the GIL), and
``prefetch_to_device`` keeps N batches in flight so the TPU never waits on
the host.
"""
from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, Optional

import jax
import numpy as np


def default_collate(samples: list) -> dict:
    """Stack (data, label) tuples into {'data': [B, ...], 'labels': [B, ...]}.

    Dict samples (e.g. SpectroscopyDataset's {'spectrum', 'params', ...},
    reference spectroscopy.py:113-140) are stacked key-wise; 'spectrum' maps
    to 'data' and 'params' to 'labels'."""
    first = samples[0]
    if isinstance(first, dict):
        out = {
            k: np.stack([np.asarray(s[k]) for s in samples]) for k in first
        }
        if "data" not in out and "spectrum" in out:
            out["data"] = out.pop("spectrum")
        if "labels" not in out:
            out["labels"] = out.pop("params", None)
        return out
    if isinstance(first, (tuple, list)):
        data = np.stack([np.asarray(s[0]) for s in samples])
        labels = None
        if len(first) > 1 and first[1] is not None:
            labels = np.stack([np.asarray(s[1]) for s in samples])
        return {"data": data, "labels": labels}
    return {"data": np.stack([np.asarray(s) for s in samples]), "labels": None}


class Subset:
    """Index-subset view of a dataset (train/val splits)."""

    def __init__(self, dataset, indices) -> None:
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.parameter_space = getattr(dataset, "parameter_space", None)
        self.use_emb_as_labels = getattr(dataset, "use_emb_as_labels", False)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[int(self.indices[i])]


class DataLoader:
    """Map-style dataset -> iterator of numpy batches.

    * ``shuffle`` uses a per-epoch seeded permutation (epoch folded into the
      seed so resume is deterministic);
    * in multi-process (multi-host) runs each process loads only its
      1/num_processes slice of every global batch — ``batch_size`` is the
      GLOBAL batch size;
    * ``num_workers`` threads build samples concurrently.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 8,
        collate_fn: Callable = default_collate,
        process_index: Optional[int] = None,
        num_processes: Optional[int] = None,
    ) -> None:
        self.dataset = dataset
        self.global_batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.collate_fn = collate_fn
        self.process_index = (
            process_index if process_index is not None else jax.process_index()
        )
        self.num_processes = (
            num_processes if num_processes is not None else jax.process_count()
        )
        assert batch_size % self.num_processes == 0, (
            f"global batch size {batch_size} must divide across "
            f"{self.num_processes} processes"
        )
        self.local_batch_size = batch_size // self.num_processes
        self.epoch = 0
        self._pool = (
            ThreadPoolExecutor(max_workers=num_workers) if num_workers > 0 else None
        )

    def __len__(self) -> int:
        n = len(self.dataset) // self.global_batch_size
        if not self.drop_last and len(self.dataset) % self.global_batch_size:
            n += 1
        return n

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch]),
            )
            return rng.permutation(n)
        return np.arange(n)

    def _build_batch(self, idx: np.ndarray) -> dict:
        if self._pool is not None:
            samples = list(self._pool.map(self.dataset.__getitem__, idx))
        else:
            samples = [self.dataset[i] for i in idx]
        return self.collate_fn(samples)

    def __iter__(self) -> Iterator[dict]:
        return self.iter_batches(0)

    def iter_batches(self, start: int = 0) -> Iterator[dict]:
        """Iterate this epoch's batches from batch index ``start`` — the
        mid-epoch resume fast-forward (the permutation is a pure function of
        (seed, epoch), so skipping re-creates the exact uninterrupted
        sequence without building the skipped batches).

        Built on :meth:`iter_index_batches` (the single source of the
        permutation/wrap-padding/epoch semantics) by materialising this
        host's slice of each global index batch."""
        gbs = self.global_batch_size
        for rec in self.iter_index_batches(start):
            # this host's slice of the global batch
            parts = np.array_split(np.arange(gbs), self.num_processes)
            local_pos = parts[self.process_index]
            batch = self._build_batch(rec["idx"][local_pos])
            if "valid" in rec:
                batch["valid"] = rec["valid"][local_pos]
            yield batch

    def iter_index_batches(self, start: int = 0) -> Iterator[dict]:
        """Index-only core of the epoch iteration: yields the GLOBAL
        sample indices (and wrap-padding validity mask) of each batch
        without building the samples. Consumed directly by
        :class:`~rho_diffusion_tpu.data.device_cache.DeviceDatasetCache`
        (the batch is an on-device gather) and, sliced per host, by
        :meth:`iter_batches` (parity-tested in
        tests/data/test_device_cache.py)."""
        indices = self._epoch_indices()
        gbs = self.global_batch_size
        n_batches = len(self)
        for b in range(start, n_batches):
            chunk = indices[b * gbs : (b + 1) * gbs]
            n_real = len(chunk)
            if n_real < gbs:
                if self.drop_last:
                    break
                # pad by wrapping so shapes stay static for jit; mark the
                # padded rows so consumers (validation) can exclude them
                # instead of double-counting early samples. np.resize tiles
                # cyclically, so datasets SMALLER than the pad (tiny val
                # splits) still fill the batch instead of coming up short.
                chunk = np.concatenate(
                    [chunk, np.resize(indices, gbs - n_real)],
                )
            rec = {"idx": chunk}
            if n_real < gbs:
                rec["valid"] = np.arange(gbs) < n_real
            yield rec
        self.epoch += 1


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Run ``iterator`` in a background thread, keeping ``size`` items ready."""
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []

    def producer():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def prefetch_to_device(
    iterator: Iterator[dict],
    sharding: Optional[Any] = None,
    size: int = 2,
    per_key: Optional[dict] = None,
) -> Iterator[dict]:
    """Move numpy batches onto device(s) ahead of consumption.

    ``sharding`` is a ``jax.sharding.Sharding`` for the batch (typically
    NamedSharding(mesh, P("data", ...))); when None, default placement.

    Multi-host: each process's batch is its LOCAL 1/num_processes slice
    (DataLoader contract above), so the global array must be assembled with
    ``jax.make_array_from_process_local_data`` — ``jax.device_put`` would
    treat the local slice as the global value, silently shrinking the
    effective global batch to batch_size/num_processes."""
    buf = collections.deque()
    multi_host = jax.process_count() > 1

    def put(batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            sh = (per_key or {}).get(k, sharding)
            if v is None:
                out[k] = None
            elif sh is not None:
                if multi_host:
                    out[k] = jax.make_array_from_process_local_data(
                        sh, np.asarray(v),
                    )
                else:
                    out[k] = jax.device_put(v, sh)
            else:
                out[k] = jax.device_put(v)
        return out

    for batch in iterator:
        buf.append(put(batch))
        while len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
