"""scripts/distill.py end-to-end + the 'trailing' respacing surface.

The reference framework has no distillation CLI (or any distillation at
all); its fast sampling is DDIM striding only
(/root/reference/rho_diffusion/diffusion/gaussian_diffusion.py:654-702).
Drives the real subprocess on the smoke config (Gaussian pipeline), then
samples the student through scripts/inference.py with --spacing trailing.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def test_trailing_spacing_matches_distill_grid():
    """respace(..., 'trailing') builds the same table ProgressiveDistiller
    students are trained on (distilled_coefficients), and the grid is
    closed under halving."""
    from rho_diffusion_tpu.diffusion import LinearSchedule
    from rho_diffusion_tpu.diffusion.distill import (
        distill_grid,
        distilled_coefficients,
    )
    from rho_diffusion_tpu.diffusion.gaussian import (
        coefficients_from_schedule,
        respace,
        space_timesteps_trailing,
    )

    c = coefficients_from_schedule(LinearSchedule(100, beta_1=2e-4, beta_T=1e-2))
    r = respace(c, 8, spacing="trailing")
    d = distilled_coefficients(c, 8)
    np.testing.assert_array_equal(
        np.asarray(r.timestep_map), np.asarray(d.timestep_map),
    )
    np.testing.assert_allclose(
        np.asarray(r.alphas_cumprod), np.asarray(d.alphas_cumprod),
    )
    g8 = space_timesteps_trailing(100, 8)
    g4 = space_timesteps_trailing(100, 4)
    np.testing.assert_array_equal(g8[1::2], g4)  # halving closure
    assert g8[-1] == 99  # anchored at full noise


def test_reverse_process_trailing_spacing_runs():
    import jax

    from rho_diffusion_tpu.diffusion import GaussianDiffusionPipeline, LinearSchedule

    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(8, 8), dims=2, in_channels=1, out_channels=1,
            model_channels=8, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=[], num_heads=1,
        ),
        schedule=LinearSchedule(16, beta_1=2e-4, beta_T=1e-2),
        model_mean_type="epsilon", model_var_type="fixed_small",
        optimizer="AdamW", opt_kwargs={"lr": 1e-3},
    )
    st = pipe.create_state(jax.random.PRNGKey(0))
    out = pipe.reverse_process(
        st.params, jax.random.PRNGKey(1), (2, 8, 8, 1),
        sampler="ddim", num_steps=4, spacing="trailing",
    )
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
@pytest.mark.heavy
def test_distill_cli_then_trailing_inference(tmp_path):
    config = json.loads((REPO / "examples" / "config_smoke.json").read_text())
    config["pipeline"] = {"name": "GaussianDiffusionPipeline", "kwargs": {
        "model_mean_type": "epsilon", "model_var_type": "fixed_small",
    }}
    config["training"]["checkpoint_dir"] = str(tmp_path / "ckpts")
    config["inference"]["checkpoint"] = None
    config["inference"]["cache_file"] = str(tmp_path / "cache.h5")
    config["inference"]["num_samples"] = 2
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(config))

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}
    student = tmp_path / "student.npz"
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "distill.py"), str(cfg_path),
         "-d", "cpu", "--from", "8", "--to", "4", "--updates", "2",
         "--batch-size", "4", "-o", str(student)],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    assert student.exists()
    assert "stage 8->4" in out.stdout, out.stdout

    out2 = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "inference.py"), str(cfg_path),
         "-d", "cpu", "-p", str(student), "--sampler", "ddim",
         "--steps", "4", "--spacing", "trailing", "-n", "2", "-f"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert out2.returncode == 0, out2.stderr[-4000:]
    assert "finite=True" in out2.stdout, out2.stdout
