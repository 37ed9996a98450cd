"""Registry, config, and utils unit tests."""
import json

import numpy as np
import pytest

import rho_diffusion_tpu  # noqa: F401  (populates the registry)
from rho_diffusion_tpu.config import ExperimentConfig
from rho_diffusion_tpu.registry import registry
from rho_diffusion_tpu.utils import (
    calculate_sha512_embedding,
    number_cast_dict,
    parameter_space_to_embeddings,
    right_pad_dims_to,
    sample_from_discrete_parameter_space,
)


def test_registry_categories_populated():
    assert registry.get("models", "UNetv2")
    assert registry.get("layers", "MultiEmbeddings")
    assert registry.get("datasets", "SphericalHarmonicDataset")
    assert registry.get("optimizers", "AdamW")
    assert registry.get("schedules", "LinearSchedule")
    assert registry.get("nn", "MSELoss")
    act = registry.get("activations", "SiLU")()
    assert np.isfinite(act(np.float32(1.0)))


def test_registry_errors():
    with pytest.raises(KeyError):
        registry.get("models", "NoSuchModel")
    with pytest.raises(KeyError):
        registry.get("nocategory", "x")


@pytest.mark.parametrize("name", sorted(registry.mapping["activations"]))
def test_every_activation_callable(name):
    """Smoke test over every registered activation
    (reference tests/test_activations.py:26-35)."""
    import jax.numpy as jnp

    fn = registry.get("activations", name)()
    out = fn(jnp.linspace(-2.0, 2.0, 8))
    assert jnp.isfinite(out).all()


def test_sha512_embedding_reference_semantics():
    """The hash embedding must be the hexdigest's ASCII codes / 128,
    element-wise repeated to length l (reference utils.py:170-177)."""
    import hashlib

    d = {"l": 3, "m": -2}
    emb = calculate_sha512_embedding(d, l=256)
    assert emb.shape == (256,)
    assert emb.dtype == np.float32
    h = hashlib.sha512(json.dumps(d, sort_keys=True).encode()).hexdigest()
    expected = np.repeat(np.frombuffer(h.encode(), dtype=np.uint8), 2) / 128.0
    np.testing.assert_allclose(emb, expected.astype(np.float32))
    # determinism + key-order independence
    np.testing.assert_array_equal(
        emb, calculate_sha512_embedding({"m": -2, "l": 3}, l=256),
    )


def test_parameter_space_embeddings_product_order():
    embs = parameter_space_to_embeddings({"m": [1, 2], "n": [3, 4, 5]})
    assert embs.shape == (6, 128)
    first = calculate_sha512_embedding({"m": 1, "n": 3})
    np.testing.assert_array_equal(embs[0], first)


def test_sample_from_discrete_parameter_space():
    space = {"a": [1, 2], "b": [10, 20, 30]}
    seq = sample_from_discrete_parameter_space(space, 4, random=False)
    np.testing.assert_array_equal(seq[0], [1, 10])
    np.testing.assert_array_equal(seq[1], [1, 20])
    rnd = sample_from_discrete_parameter_space(
        space, 100, random=True, rng=np.random.default_rng(0),
    )
    assert rnd.shape == (100, 2)
    assert set(rnd[:, 0]).issubset({1.0, 2.0})


def test_number_cast_dict():
    d = {"lr": "1e-4", "n": "32", "name": "UNetv2", "nested": {"x": "2.5"},
         "lst": ["7", "a"]}
    out = number_cast_dict(d)
    assert out["lr"] == pytest.approx(1e-4) and isinstance(out["lr"], float)
    assert out["n"] == 32 and isinstance(out["n"], int)
    assert out["name"] == "UNetv2"
    assert out["nested"]["x"] == 2.5
    assert out["lst"] == [7, "a"]


def test_right_pad_dims_to():
    x = np.ones((4,))
    assert right_pad_dims_to(x, 3).shape == (4, 1, 1)


def test_experiment_config_loads_reference_example(tmp_path):
    """The shipped reference example configs must parse unchanged."""
    cfg = ExperimentConfig.from_json(
        "/root/reference/examples/config_spherical_harmonics.json",
    )
    assert cfg.model.name == "UNetv2"
    assert cfg.model.kwargs["dims"] == 3
    assert cfg.model.kwargs["model_channels"] == 64
    assert cfg.noise_schedule.kwargs["num_steps"] == 1000
    assert cfg.training.batch_size == 32
    assert cfg.training.seed == 777
    assert cfg.inference.parameter_space["l"][0] == -5
    # round trip
    p = tmp_path / "cfg.json"
    cfg.to_json(p)
    cfg2 = ExperimentConfig.from_json(p)
    assert cfg2.model.kwargs == cfg.model.kwargs


def test_config_numeric_string_coercion(tmp_path):
    payload = {
        "experiment": "t",
        "model": {"name": "UNetv2", "kwargs": {"lr_like": "1e-3"}},
        "dataset": {"name": "D", "kwargs": {}},
        "optimizer": {"name": "AdamW", "kwargs": {"lr": "0.0001"}},
        "noise_schedule": {"name": "LinearSchedule", "kwargs": {"num_steps": "100"}},
        "training": {"batch_size": 8},
        "inference": {},
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(payload))
    cfg = ExperimentConfig.from_json(p)
    assert cfg.optimizer.kwargs["lr"] == pytest.approx(1e-4)
    assert cfg.noise_schedule.kwargs["num_steps"] == 100
