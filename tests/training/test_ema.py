"""EMA warmup semantics vs the reference (ema.py:41-73)."""
import jax.numpy as jnp
import numpy as np

from rho_diffusion_tpu.training.ema import ema_update


def test_first_update_uses_step_one_warmup():
    """The reference increments its counter BEFORE computing the warmup
    fraction, so the first update's decay_eff is decay*(1-exp(-1/2000)),
    not 0 (which would snap the shadow onto the params)."""
    shadow = {"w": jnp.ones((3,))}
    params = {"w": jnp.zeros((3,))}
    out = ema_update(shadow, params, jnp.asarray(0), decay=0.999)
    decay_eff = 0.999 * (1.0 - np.exp(-1.0 / 2000.0))
    np.testing.assert_allclose(
        np.asarray(out["w"]), np.full(3, decay_eff), rtol=1e-4,
    )
    # and crucially NOT 0 (what pre-increment indexing would give)
    assert np.all(np.asarray(out["w"]) > 1e-4)


def test_converges_to_reference_decay():
    shadow = {"w": jnp.ones((1,))}
    params = {"w": jnp.zeros((1,))}
    out = ema_update(shadow, params, jnp.asarray(100_000), decay=0.999)
    np.testing.assert_allclose(np.asarray(out["w"]), [0.999], rtol=1e-6)


def test_sample_params_knob_selects_raw_or_ema(tmp_path):
    """training.sample_params = 'raw' makes epoch-end sampling draw from
    the raw parameters; 'ema' (default) keeps the shadow (round-5
    ablation: the EMA benefit is budget-dependent, RESULTS.md)."""
    import jax
    import pytest
    from pydantic import ValidationError

    from rho_diffusion_tpu.config import ExperimentConfig

    base = {
        "experiment": "t",
        "model": {"name": "UNetv2", "kwargs": {
            "dims": 2, "in_channels": 1, "out_channels": 1,
            "model_channels": 8, "num_res_blocks": 1, "channel_mult": [1, 2],
            "data_shape": [8, 8], "attention_resolutions": [], "num_heads": 1,
        }},
        "dataset": {"name": "SphericalHarmonicDataset",
                    "kwargs": {"max_l": 2, "grid_el": 8, "length": 8}},
        "optimizer": {"name": "AdamW", "kwargs": {"lr": 1e-3}},
        "noise_schedule": {"name": "LinearSchedule",
                           "kwargs": {"num_steps": 20, "beta_1": 2e-4,
                                      "beta_T": 1e-2}},
        "pipeline": {"name": "DDPM", "kwargs": {}},
        "training": {"max_epochs": 1, "batch_size": 8, "ema_decay": 0.99,
                     "mesh": {"data": 1},
                     "dtype": "float32", "sample_params": "raw"},
    }
    cfg = ExperimentConfig.model_validate(base)
    assert cfg.training.sample_params == "raw"

    # invalid values are rejected at config-parse time
    bad = dict(base)
    bad["training"] = dict(base["training"], sample_params="nope")
    with pytest.raises(ValidationError):
        ExperimentConfig.model_validate(bad)

    # wiring: maybe_sample reads the raw params when 'raw' is selected
    from unittest.mock import patch

    from rho_diffusion_tpu.training.trainer import Trainer

    cfg.training.sample_every_n_epochs = 1
    trainer = Trainer(cfg, work_dir=str(tmp_path))
    state = trainer.init_state(resume=False)
    assert state.ema_params is not None
    seen = {}

    def fake_generate(params, *a, **k):
        seen["params"] = params
        import numpy as np
        return np.zeros((1, 8, 8, 1), np.float32)

    with patch.object(trainer.pipeline, "generate", side_effect=fake_generate):
        trainer.maybe_sample(state, epoch=0)
    assert seen["params"] is state.params

    trainer.config.training.sample_params = "ema"
    with patch.object(trainer.pipeline, "generate", side_effect=fake_generate):
        trainer.maybe_sample(state, epoch=0)
    assert seen["params"] is state.ema_params
