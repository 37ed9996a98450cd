"""Dataset + loader tests (deeper than the reference, which had no data
tests at all)."""
import numpy as np
import pytest

from rho_diffusion_tpu.data import (
    DataLoader,
    DeepGalaxyDataset,
    DiscreteParameterSpace,
    SphericalHarmonicDataset,
    SpectroscopyDataset,
)
from rho_diffusion_tpu.data.deep_galaxy import center_crop, default_transform, downscale_2x
from rho_diffusion_tpu.registry import registry


# ---------------------------------------------------------------------------
# SphericalHarmonicDataset
# ---------------------------------------------------------------------------

def test_spherical_harmonic_sample_properties():
    ds = SphericalHarmonicDataset(max_l=3, grid_el=8, length=12, random_seed=7)
    assert len(ds) == 12
    x, emb = ds[0]
    assert x.shape == (8, 8, 8, 1)
    assert x.dtype == np.float32
    assert np.isfinite(x).all()
    # |field| after the reference's complex min-max normalisation: the
    # scaling is lexicographic over complex values (synthetic.py:117-120),
    # so the magnitude is >= 0 but can exceed 1 for m != 0 harmonics.
    assert 0.0 <= x.min() and x.max() < 10.0
    assert emb.shape == (256,)
    # same seed -> same stream
    ds2 = SphericalHarmonicDataset(max_l=3, grid_el=8, length=12, random_seed=7)
    x2, emb2 = ds2[0]
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
    np.testing.assert_array_equal(emb, emb2)


def test_spherical_harmonic_lm_within_parameter_space():
    ds = SphericalHarmonicDataset(max_l=4, grid_el=8, length=8)
    for _ in range(50):
        l, m = ds.random_set()
        assert 0 <= l < 4 and -l <= m <= l
        assert l in ds.parameter_space["l"]
        assert m in ds.parameter_space["m"]


def test_spherical_harmonic_hdf5_roundtrip(tmp_path):
    ds = SphericalHarmonicDataset(max_l=2, grid_el=8, length=6)
    path = tmp_path / "ylm.h5"
    ds.to_hdf5(path, num_samples=6)
    loaded = SphericalHarmonicDataset.from_hdf5(path)
    assert len(loaded) == 6
    x, emb = loaded[3]
    assert x.shape == (8, 8, 8, 1)
    assert np.isfinite(np.asarray(x)).all()


def test_spherical_harmonic_raw_labels():
    ds = SphericalHarmonicDataset(
        max_l=3, grid_el=8, length=4, use_emb_as_labels=False,
    )
    _, lab = ds[0]
    assert lab.shape == (2,)


# ---------------------------------------------------------------------------
# DeepGalaxyDataset (synthetic HDF5 fixture mirroring the real layout)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def galaxy_h5(tmp_path_factory):
    import h5py

    path = tmp_path_factory.mktemp("dg") / "galaxies.h5"
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for s, m in [(0.5, 1.0), (1.0, 0.5)]:
            name = f"s_{s}_m_{m}"
            for cpos in (0, 1):
                ts = np.arange(300, 400, 5)
                f[f"{name}/images_camera_{cpos:02d}"] = rng.uniform(
                    0, 255, (len(ts), 300, 300),
                ).astype(np.float32)
                f[f"{name}/t_myr_camera_{cpos:02d}"] = ts
    return path


def test_deep_galaxy_selection_and_labels(galaxy_h5):
    ds = DeepGalaxyDataset(
        str(galaxy_h5), use_emb_as_labels=False, dset_name_pattern="s_0.5_*",
        camera_pos=[0], t_lim=[310, 350],
    )
    # pattern matched one group, one camera, t filtered to 310..350 (9 steps)
    assert len(ds) == 9
    img, label = ds[0]
    assert img.shape == (128, 128, 1)
    assert -1.0 <= img.min() and img.max() <= 1.0
    # label rows are (s, m, t, c)
    assert label.shape == (4,)
    assert label[0] == 0.5 and label[1] == 1.0
    assert 310 <= label[2] <= 350 and label[3] == 0
    # loaded space rebuilt from data
    assert ds.loaded_parameter_space["s"] == [0.5]
    assert ds.loaded_parameter_space["c"] == [0]
    assert ds.num_classes == 9


def test_deep_galaxy_multi_camera(galaxy_h5):
    ds = DeepGalaxyDataset(
        str(galaxy_h5), use_emb_as_labels=False, dset_name_pattern="s_.*",
        camera_pos=[0, 1],
    )
    assert len(ds) == 2 * 2 * 20
    assert ds.loaded_parameter_space["c"] == [0, 1]


def test_deep_galaxy_t_exclude_holdout(galaxy_h5):
    """Condition-holdout seam (round 5): t_exclude drops exact time values
    AFTER per-stack normalisation, so retained frames are bit-identical to
    a full load — the generalization benchmark's training/eval contract."""
    full = DeepGalaxyDataset(
        str(galaxy_h5), use_emb_as_labels=False, dset_name_pattern="s_0.5_*",
        camera_pos=[0],
    )
    held = [310.0, 330.0]
    ds = DeepGalaxyDataset(
        str(galaxy_h5), use_emb_as_labels=False, dset_name_pattern="s_0.5_*",
        camera_pos=[0], t_exclude=held,
    )
    assert len(ds) == len(full) - 2
    assert not set(held) & set(ds.loaded_parameter_space["t"])
    # retained frames bit-identical to the corresponding full-load frames
    t_of = lambda d, i: float(d[i][1][2])
    fmap = {t_of(full, i): full[i][0] for i in range(len(full))}
    for i in range(len(ds)):
        img, lab = ds[i]
        np.testing.assert_array_equal(img, fmap[float(lab[2])])


def test_deep_galaxy_hash_labels(galaxy_h5):
    ds = DeepGalaxyDataset(str(galaxy_h5), use_emb_as_labels=True,
                           dset_name_pattern="s_.*", camera_pos=[0])
    _, label = ds[0]
    assert label.shape == (128,)


def test_deep_galaxy_no_match_raises(galaxy_h5):
    with pytest.raises(ValueError, match="no datasets matched"):
        DeepGalaxyDataset(str(galaxy_h5), dset_name_pattern="nope_.*")


def test_center_crop_and_downscale():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    c = center_crop(img, 2)
    np.testing.assert_array_equal(c, [[5, 6], [9, 10]])
    d = downscale_2x(img, 2)
    assert d.shape == (2, 2)
    assert d[0, 0] == pytest.approx((0 + 1 + 4 + 5) / 4)
    padded = center_crop(np.ones((2, 2)), 4)
    assert padded.shape == (4, 4)


# ---------------------------------------------------------------------------
# SpectroscopyDataset
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def spectro_h5(tmp_path_factory):
    import h5py

    path = tmp_path_factory.mktemp("spec") / "spectra.h5"
    rng = np.random.default_rng(1)
    with h5py.File(path, "w") as f:
        for i in range(3):
            centers = rng.uniform(1500, 30000, 20)
            intens = rng.uniform(-8, -3, 20)
            f[f"{i}/transitions"] = np.stack([centers, intens])
            f[f"{i}/params"] = rng.uniform(0, 1, 4)
    return path


def test_spectroscopy_sample(spectro_h5):
    ds = SpectroscopyDataset(spectro_h5, grid_size=5000)
    assert len(ds) == 3
    item = ds[0]
    spec = item["spectrum"]
    assert spec.shape == (5000, 1)
    assert spec.max() == pytest.approx(1.0)
    assert (spec >= 0).all()
    assert item["params"].shape == (4,)
    assert item["max_int"].shape == (1,)


def test_spectroscopy_indices_subset_and_parameter_space(spectro_h5):
    """Round-5 conditional/holdout seams: ``indices`` gives a subset view
    over the h5 groups (train/holdout splits without corpus rewrites) and
    ``parameter_space`` rebuilds the (B, T, D, n_lines) space from the FULL
    corpus (held-out values keep their slots — the generalization eval
    contract, benchmarks/demo_spectro_cond.py)."""
    full = SpectroscopyDataset(spectro_h5, grid_size=512, linewidth=50.0)
    sub = SpectroscopyDataset(
        spectro_h5, grid_size=512, linewidth=50.0, indices=[0, 2],
    )
    assert len(full) == 3 and len(sub) == 2
    np.testing.assert_array_equal(sub[1]["params"], full[2]["params"])
    np.testing.assert_allclose(sub[1]["spectrum"], full[2]["spectrum"])
    space = sub.parameter_space
    assert list(space.keys()) == ["B", "T", "D", "n_lines"]
    # the subset's space still spans the whole corpus
    for i, k in enumerate(space.keys()):
        assert len(space[k]) == 3
        # __getitem__ rows are float32 casts of the stored values
        assert min(
            abs(v - float(full[1]["params"][i])) for v in space[k]
        ) < 1e-6


def test_spectroscopy_lineprofile_physics():
    grid = np.linspace(0, 100, 1001, dtype=np.float32)
    prof = SpectroscopyDataset.simulate_lineprofile(
        grid, np.array([50.0]), np.array([2.0]), 1.0,
    )
    # peak at the center with the transition's intensity
    assert prof.argmax() == 500
    assert prof.max() == pytest.approx(2.0, rel=1e-3)
    # out-of-range transitions are masked
    empty = SpectroscopyDataset.simulate_lineprofile(
        grid, np.array([500.0]), np.array([2.0]), 1.0,
    )
    np.testing.assert_array_equal(empty, 0.0)


# ---------------------------------------------------------------------------
# Wrappers (gated) + registry
# ---------------------------------------------------------------------------

def test_wrappers_registered_and_gated(tmp_path):
    for name in ("MNISTDataset", "CIFAR10Dataset"):
        cls = registry.get("datasets", name)
        with pytest.raises(FileNotFoundError, match="egress"):
            cls(root=str(tmp_path / "missing"))


# ---------------------------------------------------------------------------
# DataLoader
# ---------------------------------------------------------------------------

class _ToyDataset:
    def __len__(self):
        return 20

    def __getitem__(self, i):
        return np.full((4, 4, 1), i, np.float32), np.int32(i)


def test_loader_batching_and_shuffle_determinism():
    dl1 = DataLoader(_ToyDataset(), batch_size=8, seed=3, num_workers=0)
    dl2 = DataLoader(_ToyDataset(), batch_size=8, seed=3, num_workers=0)
    b1, b2 = next(iter(dl1)), next(iter(dl2))
    np.testing.assert_array_equal(b1["data"], b2["data"])
    assert b1["data"].shape == (8, 4, 4, 1)
    assert b1["labels"].shape == (8,)
    assert len(dl1) == 2  # drop_last


def test_loader_epoch_reshuffles():
    dl = DataLoader(_ToyDataset(), batch_size=8, seed=3, num_workers=0)
    e0 = next(iter(dl))["labels"]
    dl.set_epoch(1)
    e1 = next(iter(dl))["labels"]
    assert not np.array_equal(e0, e1)


def test_loader_process_sharding():
    """Each process gets a disjoint 1/num_processes slice of every global
    batch (replaces DistributedSampler, reference training_ddp.py:136-143)."""
    shards = []
    for pi in range(2):
        dl = DataLoader(
            _ToyDataset(), batch_size=8, seed=0, num_workers=0,
            process_index=pi, num_processes=2,
        )
        shards.append(next(iter(dl))["labels"])
    assert shards[0].shape == (4,)
    assert set(shards[0]).isdisjoint(set(shards[1]))


def test_loader_worker_threads_match_serial():
    dl0 = DataLoader(_ToyDataset(), batch_size=8, seed=1, num_workers=0)
    dl4 = DataLoader(_ToyDataset(), batch_size=8, seed=1, num_workers=4)
    np.testing.assert_array_equal(
        next(iter(dl0))["data"], next(iter(dl4))["data"],
    )


@pytest.mark.heavy
def test_spectroscopy_through_loader_and_1d_pipeline(spectro_h5):
    """Dict samples (spectrum/params) flow through collate into a 1D DDPM
    training step."""
    import jax

    from rho_diffusion_tpu.diffusion import DDPM, LinearSchedule

    ds = SpectroscopyDataset(spectro_h5, grid_size=256)
    dl = DataLoader(ds, batch_size=2, num_workers=0, seed=0, drop_last=False)
    batch = next(iter(dl))
    assert batch["data"].shape == (2, 256, 1)
    assert batch["labels"].shape == (2, 4)
    assert "max_int" in batch

    pipe = DDPM(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(256,), dims=1, in_channels=1, out_channels=1,
            model_channels=8, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=[], num_heads=1,
        ),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        optimizer="AdamW",
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    state, m = pipe.training_step(state, batch)
    assert np.isfinite(float(m["train_loss"]))


# ---------------------------------------------------------------------------
# Synthetic corpus generators (round 4): real schemas, deterministic physics
# ---------------------------------------------------------------------------

def test_galaxy_synth_schema_and_determinism(tmp_path):
    """galaxy_synth writes the exact DeepGalaxy layout and renders a pure
    function of (s, m, t, c) with the merger physics the quality demo
    scores against."""
    from rho_diffusion_tpu.data.galaxy_synth import (
        render_merger,
        write_deep_galaxy_h5,
    )

    a = render_merger(0.5, 1.0, 400, 0, size=128)
    assert a.shape == (128, 128) and np.isfinite(a).all()
    np.testing.assert_array_equal(a, render_merger(0.5, 1.0, 400, 0, size=128))
    # every condition axis moves the image
    for other in (
        render_merger(1.0, 1.0, 400, 0, size=128),  # s
        render_merger(0.5, 0.5, 400, 0, size=128),  # m
        render_merger(0.5, 1.0, 500, 0, size=128),  # t
        render_merger(0.5, 1.0, 400, 3, size=128),  # camera
    ):
        assert np.abs(a - other).max() > 1e-3
    # separation shrinks as the merger progresses (flux second moment)
    def spread(img):
        yy, xx = np.mgrid[0:128, 0:128]
        w = img / img.sum()
        cx, cy = (xx * w).sum(), (yy * w).sum()
        return (w * ((xx - cx) ** 2 + (yy - cy) ** 2)).sum()
    assert spread(render_merger(1.0, 1.0, 630, 0, size=128)) < spread(
        render_merger(1.0, 1.0, 310, 0, size=128),
    )

    p = tmp_path / "g.h5"
    write_deep_galaxy_h5(
        str(p), s_values=[0.5], m_values=[1.0], cameras=[0, 1],
        t_values=[400, 450], size=64,
    )
    import h5py

    with h5py.File(p, "r") as f:
        assert set(f.keys()) == {"s_0.5_m_1"}
        g = f["s_0.5_m_1"]
        assert g["images_camera_00"].shape == (2, 64, 64)
        assert g["images_camera_00"].dtype == np.uint16
        np.testing.assert_array_equal(g["t_myr_camera_01"][:], [400, 450])
    ds = DeepGalaxyDataset(str(p), use_emb_as_labels=False,
                           dset_name_pattern="s_.*", camera_pos=[0, 1])
    assert len(ds) == 4
    img, lab = ds[0]
    assert img.shape == (128, 128, 1)


def test_spectro_synth_rotor_physics(tmp_path):
    """spectro_synth: rigid-rotor line combs (spacing ~ 2B), Boltzmann
    intensity envelope in the reference's log10 band, loadable by
    SpectroscopyDataset."""
    from rho_diffusion_tpu.data.spectro_synth import (
        rotor_transitions,
        write_rotor_spectra_h5,
    )

    centers, logI = rotor_transitions(B=800.0, T=1e6)
    assert (np.diff(centers) > 0).all()
    # line spacing = 2B up to the tiny distortion term
    np.testing.assert_allclose(np.diff(centers), 1600.0, rtol=1e-6)
    assert logI.max() <= -3.0 + 1e-9 and logI.min() >= -8.0 - 1e-9

    p = tmp_path / "s.h5"
    write_rotor_spectra_h5(str(p), n_molecules=3, seed=1)
    ds = SpectroscopyDataset(str(p), grid_size=512, linewidth=60.0)
    assert len(ds) == 3
    item = ds[0]
    assert item["spectrum"].shape == (512, 1)
    assert item["params"].shape == (4,)
    # deterministic at fixed linewidth (the quality-demo contract)
    np.testing.assert_array_equal(item["spectrum"], ds[0]["spectrum"])
