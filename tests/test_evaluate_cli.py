"""scripts/evaluate.py end-to-end: the quality-metrics CLI the reference
never had (its validation_step was a stub returning 0,
reference ddpm.py:367-371). Drives the real subprocess on the smoke config
and checks the JSON report."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
@pytest.mark.heavy
def test_evaluate_cli_reports_metrics(tmp_path):
    config = json.loads((REPO / "examples" / "config_smoke.json").read_text())
    config["training"]["checkpoint_dir"] = str(tmp_path / "ckpts")
    config["inference"]["checkpoint"] = None
    config["inference"]["cache_file"] = str(tmp_path / "cache.h5")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(config))

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "evaluate.py"), str(cfg_path),
         "-d", "cpu", "--num-batches", "1", "--steps", "2"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    # untrained run: the shared resolver must SAY it found no weights
    assert "WARNING" in out.stdout, out.stdout
    report = json.loads(out.stdout[out.stdout.index("{"):])
    assert np.isfinite(report["val_loss"])
    assert np.isfinite(report["val_psnr"])
    assert np.isfinite(report["wasserstein_gen_vs_real"])
    assert report["generated_finite"] is True
