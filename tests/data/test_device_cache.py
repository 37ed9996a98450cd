"""Device-resident dataset cache (data/device_cache.py): cached batches
must be bit-identical to host-streamed ones, the HBM budget must be
enforced, and a Trainer run with ``training.device_cache`` must reproduce
the host-path losses exactly (same permutation, same values — only the
transport differs)."""
import json

import numpy as np
import pytest

from rho_diffusion_tpu.data.device_cache import DeviceDatasetCache
from rho_diffusion_tpu.data.loader import DataLoader


class ArangeDataset:
    """Deterministic (data, label) pairs so mismatches are attributable."""

    def __init__(self, n=23, shape=(4, 4, 1)):
        self.n, self.shape = n, shape

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        data = np.full(self.shape, float(i), np.float32)
        label = np.array([i, i * 2], np.float32)
        return data, label


class UnlabelledDataset(ArangeDataset):
    def __getitem__(self, i):
        return super().__getitem__(i)[0], None


@pytest.mark.parametrize("drop_last", [True, False])
def test_cached_batches_match_host_batches(drop_last):
    ds = ArangeDataset()
    mk = lambda: DataLoader(
        ds, batch_size=8, shuffle=True, seed=3, drop_last=drop_last,
        num_workers=0, process_index=0, num_processes=1,
    )
    host = list(mk().iter_batches())
    cache = DeviceDatasetCache(ds, num_workers=0)
    cached = list(cache.batches(mk()))
    assert len(host) == len(cached) == (2 if drop_last else 3)
    for hb, cb in zip(host, cached):
        np.testing.assert_array_equal(hb["data"], np.asarray(cb["data"]))
        np.testing.assert_array_equal(hb["labels"], np.asarray(cb["labels"]))
        assert ("valid" in hb) == ("valid" in cb)
        if "valid" in hb:
            np.testing.assert_array_equal(hb["valid"], np.asarray(cb["valid"]))


def test_index_iterator_epoch_semantics():
    """iter_index_batches advances the epoch counter exactly like
    iter_batches, so host and cached runs see the same permutations."""
    ds = ArangeDataset(n=16)
    a = DataLoader(ds, batch_size=8, shuffle=True, seed=0,
                   process_index=0, num_processes=1, num_workers=0)
    b = DataLoader(ds, batch_size=8, shuffle=True, seed=0,
                   process_index=0, num_processes=1, num_workers=0)
    for _ in range(2):
        host = [bt["data"][:, 0, 0, 0] for bt in a.iter_batches()]
        idxs = [rec["idx"] for rec in b.iter_index_batches()]
        for h, i in zip(host, idxs):
            np.testing.assert_array_equal(h.astype(np.int64), i)
    assert a.epoch == b.epoch == 2


def test_none_labels_roundtrip():
    ds = UnlabelledDataset(n=8)
    cache = DeviceDatasetCache(ds, num_workers=0)
    batch = cache.batch(np.arange(4))
    assert batch["labels"] is None
    np.testing.assert_array_equal(
        np.asarray(batch["data"])[:, 0, 0, 0], np.arange(4, dtype=np.float32),
    )


def test_budget_enforced():
    with pytest.raises(ValueError, match="device-cache budget"):
        DeviceDatasetCache(ArangeDataset(n=64), max_bytes=128, num_workers=0)


def test_mid_epoch_start_matches_host():
    ds = ArangeDataset(n=24)
    mk = lambda: DataLoader(ds, batch_size=8, shuffle=True, seed=7,
                            process_index=0, num_processes=1, num_workers=0)
    host = list(mk().iter_batches(1))
    cache = DeviceDatasetCache(ds, num_workers=0)
    cached = list(cache.batches(mk(), start=1))
    assert len(host) == len(cached) == 2
    for hb, cb in zip(host, cached):
        np.testing.assert_array_equal(hb["data"], np.asarray(cb["data"]))


@pytest.mark.heavy
def test_trainer_device_cache_loss_parity(tmp_path):
    """Full Trainer fit with and without the cache: identical loss history
    (the cache changes the transport, not the values)."""
    from tests.pipeline.test_trainer import ToyDataset, _config
    from rho_diffusion_tpu.training.trainer import Trainer

    losses = {}
    for flag in (False, True):
        wd = tmp_path / f"cache_{flag}"
        wd.mkdir()
        config = _config(
            wd, device_cache=flag, max_epochs=1,
            checkpoint_dir=str(wd / "ckpts"),
        )
        trainer = Trainer(config, dataset=ToyDataset(), work_dir=wd)
        trainer.fit()
        recs = [
            json.loads(line)
            for line in (wd / "metrics.jsonl").read_text().splitlines()
        ]
        losses[flag] = [r["train_loss"] for r in recs if "train_loss" in r]
    assert losses[True] == losses[False]
    assert len(losses[True]) > 0


def test_tables_replicated_on_mesh():
    """With a batch sharding over a data-parallel mesh, the cached tables
    must be explicitly REPLICATED across the mesh devices (a bare
    device_put would strand the whole table on one device, re-introducing
    a per-step cross-device copy) and gathered batches must carry the
    batch sharding."""
    import jax

    from rho_diffusion_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(data=4, devices=jax.devices()[:4])
    cache = DeviceDatasetCache(
        ArangeDataset(n=16), sharding=batch_sharding(mesh), num_workers=0,
    )
    for tab in cache._tables.values():
        assert tab.sharding.is_fully_replicated
        assert len(tab.sharding.device_set) == 4
    batch = cache.batch(np.arange(8))
    data_sh = batch["data"].sharding
    assert not data_sh.is_fully_replicated  # sharded along the batch axis
    np.testing.assert_array_equal(
        np.asarray(batch["data"])[:, 0, 0, 0], np.arange(8, dtype=np.float32),
    )


def test_sharded_cache_rows_split_and_batches_exact():
    """shard_over_data=True: each chip holds a 1/N row slice of the table
    (per-device memory drops N x) and assembled batches are bit-identical
    to the replicated gather AND the host loader (same global indices —
    sharding changes where rows LIVE, not which rows a batch contains)."""
    import jax

    from rho_diffusion_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(data=4, devices=jax.devices()[:4])
    ds = ArangeDataset(n=18)  # not a multiple of 4: exercises row padding
    sharding = batch_sharding(mesh)
    sharded = DeviceDatasetCache(
        ds, sharding=sharding, num_workers=0, shard_over_data=True,
    )
    replicated = DeviceDatasetCache(ds, sharding=sharding, num_workers=0)
    for tab in sharded._tables.values():
        assert not tab.sharding.is_fully_replicated
        shard_rows = {
            s.data.shape[0] for s in tab.addressable_shards
        }
        assert shard_rows == {5}  # ceil(18/4) rows per chip, not 18
    idx = np.array([17, 0, 9, 4, 13, 2, 6, 11])  # rows from every shard
    a = sharded.batch(idx)
    b = replicated.batch(idx)
    for k in ("data", "labels"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    assert not a["data"].sharding.is_fully_replicated  # P("data") batch

    # host-loader parity through the full epoch iterator
    mk = lambda: DataLoader(
        ds, batch_size=8, shuffle=True, seed=11, drop_last=False,
        num_workers=0, process_index=0, num_processes=1,
    )
    host = list(mk().iter_batches())
    cached = list(sharded.batches(mk()))
    assert len(host) == len(cached)
    for hb, cb in zip(host, cached):
        np.testing.assert_array_equal(hb["data"], np.asarray(cb["data"]))
        np.testing.assert_array_equal(hb["labels"], np.asarray(cb["labels"]))


def test_sharded_cache_requires_data_mesh():
    with pytest.raises(ValueError, match="data"):
        DeviceDatasetCache(
            ArangeDataset(n=8), num_workers=0, shard_over_data=True,
        )


def test_sharded_cache_budget_scales_with_mesh():
    """The HBM budget is per-chip: a table over max_bytes fits when its
    1/N shards do."""
    import jax

    from rho_diffusion_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(data=4, devices=jax.devices()[:4])
    ds = ArangeDataset(n=64, shape=(16, 16, 1))
    nbytes = 64 * 16 * 16 * 4  # data table only (labels negligible)
    with pytest.raises(ValueError, match="budget"):
        DeviceDatasetCache(ds, num_workers=0, max_bytes=nbytes // 2)
    cache = DeviceDatasetCache(
        ds, sharding=batch_sharding(mesh), num_workers=0,
        max_bytes=nbytes // 2, shard_over_data=True,
    )
    assert cache.nbytes >= nbytes


@pytest.mark.heavy
def test_trainer_sharded_cache_loss_parity_on_mesh(tmp_path):
    """training.device_cache under training.mesh {"data": 4}: the sharded
    table (default device_cache_shard=True) reproduces the host-streamed
    loss history exactly — the VERDICT-r3 multi-chip cache contract."""
    from tests.pipeline.test_trainer import ToyDataset, _config
    from rho_diffusion_tpu.training.trainer import Trainer

    losses = {}
    for flag in (False, True):
        wd = tmp_path / f"mesh_cache_{flag}"
        wd.mkdir()
        config = _config(
            wd, device_cache=flag, max_epochs=1, mesh={"data": 4},
            checkpoint_dir=str(wd / "ckpts"),
        )
        trainer = Trainer(config, dataset=ToyDataset(), work_dir=wd)
        trainer.fit()
        if flag:
            cache = trainer._device_cache
            assert cache.shard_over_data
            for tab in cache._tables.values():
                assert not tab.sharding.is_fully_replicated
        recs = [
            json.loads(line)
            for line in (wd / "metrics.jsonl").read_text().splitlines()
        ]
        losses[flag] = [r["train_loss"] for r in recs if "train_loss" in r]
    assert losses[True] == losses[False]
    assert len(losses[True]) > 0
