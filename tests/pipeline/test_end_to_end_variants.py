"""End-to-end variants: the Conv1d path, pipeline selection from config,
and the DeepGalaxy multi-parameter conditioning through the Trainer."""
import json

import jax
import numpy as np
import pytest

from rho_diffusion_tpu.config import ExperimentConfig
from rho_diffusion_tpu.diffusion import DDPM, LinearSchedule
from rho_diffusion_tpu.training.trainer import Trainer, build_pipeline_from_config


@pytest.mark.heavy
def test_1d_conv_path_trains_and_samples():
    """n=1 UNet (Conv1d path — the spectroscopy testbed, BASELINE.md)."""
    pipe = DDPM(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(64,), dims=1, in_channels=1, out_channels=1,
            model_channels=8, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=[2], num_heads=2,
        ),
        schedule=LinearSchedule(20, 2e-4, 1e-2),
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
    )
    state = pipe.create_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {"data": rng.uniform(-1, 1, (4, 64, 1)).astype(np.float32),
             "labels": None}
    for _ in range(2):
        state, m = pipe.training_step(state, batch)
    assert np.isfinite(float(m["train_loss"]))
    out = pipe.generate(state.params, jax.random.PRNGKey(1), batch_size=2)
    assert out.shape == (2, 64, 1)
    assert np.isfinite(np.asarray(out)).all()


def _smoke_config(tmp_path, pipeline_name):
    payload = {
        "experiment": "variant",
        "model": {"name": "UNetv2", "kwargs": {
            "dims": 2, "in_channels": 1, "out_channels": 1,
            "model_channels": 8, "num_res_blocks": 1, "data_shape": [8, 8],
            "channel_mult": [1, 2], "attention_resolutions": [], "num_heads": 1,
        }},
        "dataset": {"name": "SphericalHarmonicDataset", "kwargs": {"max_l": 2}},
        "optimizer": {"name": "AdamW", "kwargs": {"lr": 1e-3}},
        "noise_schedule": {"name": "LinearSchedule",
                            "kwargs": {"num_steps": 20, "beta_1": 2e-4, "beta_T": 1e-2}},
        "pipeline": {"name": pipeline_name, "kwargs": {}},
        "training": {"batch_size": 4, "max_epochs": 1, "seed": 0,
                      "dtype": "float32", "loss_fn": "MSELoss"},
        "inference": {},
    }
    p = tmp_path / f"{pipeline_name}.json"
    p.write_text(json.dumps(payload))
    return ExperimentConfig.from_json(p)


@pytest.mark.parametrize(
    "name", ["DDPM", "GaussianDiffusionPipeline", "DiffusersDDPMPipeline"],
)
@pytest.mark.heavy
def test_pipeline_selection_from_config(tmp_path, name):
    cfg = _smoke_config(tmp_path, name)
    pipe = build_pipeline_from_config(cfg)
    assert type(pipe).__name__ == name
    state = pipe.create_state(jax.random.PRNGKey(0))
    batch = {"data": np.random.default_rng(0).uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32),
             "labels": None}
    state, m = pipe.training_step(state, batch)
    assert np.isfinite(float(m["train_loss"]))


def test_unknown_pipeline_errors(tmp_path):
    cfg = _smoke_config(tmp_path, "DDPM")
    with pytest.raises(KeyError, match="unknown pipeline"):
        build_pipeline_from_config(cfg, pipeline_name="NoSuchPipeline")


@pytest.mark.heavy
def test_deep_galaxy_conditioned_training(tmp_path):
    """MultiEmbeddings raw-row conditioning end-to-end through the Trainer
    (the reference's DeepGalaxy call stack, SURVEY §3.1)."""
    import h5py

    h5 = tmp_path / "galaxies.h5"
    rng = np.random.default_rng(0)
    with h5py.File(h5, "w") as f:
        ts = np.arange(300, 340, 5)
        f["s_0.5_m_1.0/images_camera_00"] = rng.uniform(
            0, 255, (len(ts), 32, 32),
        ).astype(np.float32)
        f["s_0.5_m_1.0/t_myr_camera_00"] = ts

    payload = {
        "experiment": "dg",
        "model": {"name": "UNetv2", "kwargs": {
            "dims": 2, "in_channels": 1, "out_channels": 1,
            "model_channels": 8, "num_res_blocks": 1, "data_shape": [16, 16],
            "channel_mult": [1, 2], "attention_resolutions": [], "num_heads": 1,
            "num_classes": 8, "cond_fn": "MultiEmbeddings",
        }},
        "dataset": {"name": "DeepGalaxyDataset", "kwargs": {
            "path": str(h5), "use_emb_as_labels": False,
            "dset_name_pattern": "s_.*", "camera_pos": [0],
        }},
        "optimizer": {"name": "AdamW", "kwargs": {"lr": 1e-3}},
        "noise_schedule": {"name": "LinearSchedule",
                            "kwargs": {"num_steps": 20, "beta_1": 2e-4, "beta_T": 1e-2}},
        "pipeline": {"name": "DDPM", "kwargs": {}},
        "training": {"batch_size": 4, "max_epochs": 1, "seed": 0,
                      "dtype": "float32", "log_every_n_steps": 1,
                      "checkpoint_dir": str(tmp_path / "ck"),
                      # batch 4 < 8 devices: select the mesh explicitly
                      # (indivisible batches now hard-error by design)
                      "mesh": {"data": 4},
                      "save_checkpoint_every_n_epochs": 0},
        "inference": {},
    }
    cfg_path = tmp_path / "dg.json"
    cfg_path.write_text(json.dumps(payload))
    config = ExperimentConfig.from_json(cfg_path)

    import rho_diffusion_tpu.data.deep_galaxy as dg

    ds = dg.DeepGalaxyDataset(
        str(h5), use_emb_as_labels=False, dset_name_pattern="s_.*",
        camera_pos=[0],
        transform=lambda img: (img.astype(np.float32) * 2 - 1)[::2, ::2, None],
    )
    # conditioning must use the LOADED parameter space (values present in
    # the data), like the reference wiring dataset.parameter_space into
    # MultiEmbeddings (training.py:112-126)
    ds.parameter_space = ds.loaded_parameter_space
    trainer = Trainer(config, dataset=ds, work_dir=tmp_path)
    state = trainer.fit(max_epochs=1)
    assert int(state.step) >= 1


def test_multichip_example_config_parses_and_selects_layout():
    """examples/config_multichip.json: the documented multi-chip recipe
    (data x context mesh, spatial sharding, ZeRO-1) must parse and produce
    the right Trainer layout on the 8-device test platform."""
    from rho_diffusion_tpu.config import ExperimentConfig

    cfg = ExperimentConfig.from_json("examples/config_multichip.json")
    assert cfg.training.mesh == {"data": 4, "context": 2}
    assert cfg.training.spatial_sharding and cfg.training.zero1
    assert cfg.training.batch_size % 4 == 0
