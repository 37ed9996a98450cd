"""Round-3 review fixes, batch 2: loader tiny-dataset wrap padding,
orbax stale-step force save, optimizer lr-default preservation,
camera_pos string coercion, and threaded spectroscopy RNG safety."""
import threading

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rho_diffusion_tpu.data.loader import DataLoader


class _ArrayDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((4,), float(i), np.float32), np.array([i], np.float32)


# ---------------------------------------------------------------------------
# DataLoader: dataset SMALLER than the wrap pad must still fill the batch
# ---------------------------------------------------------------------------

def test_loader_pads_dataset_smaller_than_batch():
    """A 3-sample dataset with batch_size=8 (tiny val split) must yield one
    full static-shape batch: the old single-concat pad came up short when
    gbs - n_real > len(dataset) and broke jit's static shapes."""
    loader = DataLoader(
        _ArrayDataset(3), batch_size=8, shuffle=False, drop_last=False,
        num_workers=0, process_index=0, num_processes=1,
    )
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["data"].shape[0] == 8  # static shape preserved
    np.testing.assert_array_equal(
        b["data"][:, 0], [0, 1, 2, 0, 1, 2, 0, 1],  # cyclic tiling
    )
    np.testing.assert_array_equal(b["valid"], [True] * 3 + [False] * 5)


# ---------------------------------------------------------------------------
# CheckpointManager: stale/duplicate steps must never be skipped silently
# ---------------------------------------------------------------------------

def _tiny_state(value: float):
    from rho_diffusion_tpu.training.state import create_train_state

    params = {"w": jnp.full((2,), value, jnp.float32)}
    tx = optax.sgd(1e-2)
    return create_train_state(params, tx, jax.random.PRNGKey(0))


def test_checkpoint_save_forces_past_stale_latest(tmp_path):
    """A fresh run writing into a directory holding a PREVIOUS run's later
    steps: orbax's should_save() would silently skip; save() must force the
    write and return True (losing the new run's checkpoints is data loss)."""
    from rho_diffusion_tpu.training.checkpoint import CheckpointManager

    cm = CheckpointManager(tmp_path)
    assert cm.save(_tiny_state(1.0), step=10, wait=True)
    cm.close()

    cm2 = CheckpointManager(tmp_path)  # fresh (non-resumed) run, same dir
    assert cm2.save(_tiny_state(2.0), step=3, wait=True)
    restored = cm2.restore(_tiny_state(0.0), step=3)
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 2.0)
    cm2.close()


def test_checkpoint_same_step_collision_overwrites(tmp_path):
    """Saving the SAME step twice (e.g. signal-checkpoint then epoch-end in
    the same step) must overwrite, and a restore must see the newest state."""
    from rho_diffusion_tpu.training.checkpoint import CheckpointManager

    cm = CheckpointManager(tmp_path)
    assert cm.save(_tiny_state(1.0), step=5, wait=True)
    assert cm.save(_tiny_state(7.0), step=5, wait=True)
    restored = cm.restore(_tiny_state(0.0), step=5)
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 7.0)
    cm.close()


# ---------------------------------------------------------------------------
# build_optimizer: sqrt(world_size) scaling only applies to an EXPLICIT lr
# ---------------------------------------------------------------------------

def test_world_size_scaling_preserves_factory_default_lr():
    """With NO lr in the config, the factory default must survive a device-
    count change — the old code fabricated lr=1e-3 and scaled that,
    silently overriding e.g. Adafactor's learning_rate=None rule."""
    from rho_diffusion_tpu.training.optimizers import build_optimizer

    params = {"w": jnp.ones((4,), jnp.float32)}
    grads = {"w": jnp.full((4,), 0.5, jnp.float32)}

    def one_update(tx):
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        return np.asarray(updates["w"])

    # no explicit lr: world_size must not change the update at all
    u1 = one_update(build_optimizer("AdamW", {}, world_size=1))
    u4 = one_update(build_optimizer("AdamW", {}, world_size=4))
    np.testing.assert_allclose(u1, u4)

    # explicit lr: scaled by sqrt(world_size) exactly
    e1 = one_update(build_optimizer("SGD", {"lr": 0.1}, world_size=1))
    e4 = one_update(build_optimizer("SGD", {"lr": 0.1}, world_size=4))
    np.testing.assert_allclose(e4, 2.0 * e1, rtol=1e-6)


# ---------------------------------------------------------------------------
# DeepGalaxyDataset: JSON-quoted camera_pos strings ("3" / "0,1")
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def galaxy_h5(tmp_path_factory):
    import h5py

    path = tmp_path_factory.mktemp("dg2") / "galaxies.h5"
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        name = "s_1.0_m_1.0"
        for cpos in (0, 1):
            ts = np.arange(300, 320, 5)
            f[f"{name}/images_camera_{cpos:02d}"] = rng.uniform(
                0, 255, (len(ts), 64, 64),
            ).astype(np.float32)
            f[f"{name}/t_myr_camera_{cpos:02d}"] = ts
    return path


def test_deep_galaxy_camera_pos_string_coercion(galaxy_h5):
    """camera_pos from a JSON config often arrives as a quoted string; the
    old code iterated it per CHARACTER ('0,1' -> ['0', ',', '1']) and
    crashed formatting the dataset key."""
    from rho_diffusion_tpu.data.deep_galaxy import DeepGalaxyDataset

    ds_str = DeepGalaxyDataset(
        str(galaxy_h5), use_emb_as_labels=False, dset_name_pattern="s_.*",
        camera_pos="0,1",
    )
    ds_list = DeepGalaxyDataset(
        str(galaxy_h5), use_emb_as_labels=False, dset_name_pattern="s_.*",
        camera_pos=[0, 1],
    )
    assert len(ds_str) == len(ds_list)
    assert ds_str.loaded_parameter_space["c"] == [0, 1]

    ds_one = DeepGalaxyDataset(
        str(galaxy_h5), use_emb_as_labels=False, dset_name_pattern="s_.*",
        camera_pos="1",
    )
    assert ds_one.loaded_parameter_space["c"] == [1]


# ---------------------------------------------------------------------------
# SpectroscopyDataset: numpy Generator use is locked under worker threads
# ---------------------------------------------------------------------------

def test_spectroscopy_linewidth_thread_safe(tmp_path):
    """The threaded DataLoader maps __getitem__ over worker threads; the
    per-sample linewidth draw uses a shared numpy Generator, which is not
    thread-safe without the lock (same failure class as synthetic.py)."""
    import h5py

    from rho_diffusion_tpu.data.spectroscopy import SpectroscopyDataset

    path = tmp_path / "spectra.h5"
    rng = np.random.default_rng(1)
    with h5py.File(path, "w") as f:
        f["0/transitions"] = np.stack(
            [rng.uniform(1500, 30000, 5), rng.uniform(-8, -3, 5)],
        )
        f["0/params"] = rng.uniform(0, 1, 4)

    ds = SpectroscopyDataset(path, grid_size=64, linewidth=(1.0, 0.1), seed=0)
    errs = []

    def draw_many():
        try:
            for _ in range(200):
                lw = ds.sample_linewidth()
                assert np.isfinite(lw) and lw >= 0.0
        except Exception as e:  # pragma: no cover - only on regression
            errs.append(e)

    threads = [threading.Thread(target=draw_many) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
