"""End-to-end migration of a reference-trained torch checkpoint
(VERDICT r2 item 4): save a reference-format ``model.pth`` state_dict
(torch.save path, reference utils.py:166-167), load it through the
framework's auto-detecting weight loader and the inference CLI, and verify
parity + finite generation."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rho_diffusion_tpu.training.checkpoint import load_weights_auto  # noqa: E402

from test_reference_parity import _build_pair, ref  # noqa: F401 - same dir


MODEL_KWARGS = dict(
    dims=2, in_channels=1, out_channels=1, model_channels=32,
    num_res_blocks=1, data_shape=[8, 8], channel_mult=[1, 2],
    attention_resolutions=[2], num_heads=2, use_scale_shift_norm=True,
)


@pytest.fixture(scope="module")
def saved_pth(ref, tmp_path_factory):  # noqa: F811
    """A reference torch UNetv2 checkpoint exactly as the reference saves it."""
    t_model, j_model, params = _build_pair(ref, 2, (8, 8))
    path = tmp_path_factory.mktemp("ckpt") / "model.pth"
    torch.save(t_model.state_dict(), str(path))
    return path, t_model, j_model, params


def test_load_weights_auto_transplants_pth(saved_pth):
    """load_weights_auto('.pth') must reproduce the transplant exactly and
    the loaded forward pass must match the torch reference."""
    path, t_model, j_model, params = saved_pth
    template = jax.tree_util.tree_map(np.zeros_like, params)
    loaded = load_weights_auto(
        template, path,
        model_kwargs=dict(
            model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=(2,), num_heads=2,
        ),
    )
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    t = np.array([3, 7])
    with torch.no_grad():
        out_t = t_model(
            torch.tensor(np.moveaxis(x, -1, 1)), torch.tensor(t),
        ).numpy()
    out_t = np.moveaxis(out_t, 1, -1)
    out_j = np.asarray(
        j_model.apply({"params": loaded}, jnp.asarray(x), jnp.asarray(t)),
    )
    assert float(np.mean((out_t - out_j) ** 2)) < 1e-10


def test_load_weights_auto_requires_arch_kwargs(saved_pth):
    path, _, _, params = saved_pth
    with pytest.raises(ValueError, match="model_channels"):
        load_weights_auto(params, path, model_kwargs={})


@pytest.mark.slow
def test_inference_cli_accepts_pth(saved_pth, tmp_path):
    """scripts/inference.py -p model.pth: auto-transplant + finite samples
    (the reference's own inference.py:129-131 torch.load path parity)."""
    path, *_ = saved_pth
    cache = tmp_path / "gen.h5"
    config = {
        "experiment": "migration",
        "model": {"name": "UNetv2", "kwargs": MODEL_KWARGS},
        "dataset": {"name": "SphericalHarmonicDataset", "kwargs": {"max_l": 2}},
        "optimizer": {"name": "AdamW", "kwargs": {"lr": 1e-3}},
        "noise_schedule": {"name": "LinearSchedule",
                            "kwargs": {"num_steps": 20, "beta_1": 2e-4,
                                       "beta_T": 1e-2}},
        "pipeline": {"name": "DDPM", "kwargs": {}},
        "training": {"batch_size": 4, "max_epochs": 1, "loss_fn": "MSELoss",
                      "checkpoint_dir": str(tmp_path / "none")},
        "inference": {"cache_file": str(cache), "num_samples": 2},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(config))
    repo = Path(__file__).resolve().parents[2]
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}
    out = subprocess.run(
        [sys.executable, str(repo / "scripts" / "inference.py"),
         str(cfg_path), "-p", str(path), "-d", "cpu"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    assert "loaded weights" in out.stdout
    assert "finite=True" in out.stdout

    import h5py

    with h5py.File(cache, "r") as f:
        data = np.asarray(f["data"])
    assert data.shape == (2, 8, 8, 1)
    assert np.isfinite(data).all()
