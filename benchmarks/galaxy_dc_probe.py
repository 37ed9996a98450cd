"""Why the reference DeepGalaxy recipe fails at sampling: the DC probe.

Reproduces the round-4 diagnosis (RESULTS.md "DeepGalaxy-2D quality
flagship"): a trained epsilon-model on the galaxy corpus is near-Bayes at
EVERY timestep on real (x_t, t) pairs, yet full sampling produces wrong
background levels — the classic high-DC failure of truncated-terminal-SNR
epsilon schedules (arXiv:2305.08891). The probe loads the weights that
`DEMO_RECIPE=reference benchmarks/demo_galaxy2d.py` trained and prints the
eps-MSE and implied-x0-MSE across t: eps error stays ~2e-4 while the
1/alpha_bar amplification makes x0 indeterminate at high t, so the sampler
depends on trajectory self-correction the truncated schedule never
trained near its t=T-1 starting point.

Usage (after a reference-recipe demo run):
    python benchmarks/galaxy_dc_probe.py  [GALAXY_WORKDIR=/tmp/rho_galaxy2d_reference]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rho_diffusion_tpu.utils import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rho_diffusion_tpu.config import ExperimentConfig  # noqa: E402
from rho_diffusion_tpu.data.deep_galaxy import DeepGalaxyDataset  # noqa: E402
from rho_diffusion_tpu.diffusion import (  # noqa: E402
    GaussianDiffusionPipeline,
    LinearSchedule,
)
from rho_diffusion_tpu.training.checkpoint import load_model_weights  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKDIR = os.environ.get("GALAXY_WORKDIR", "/tmp/rho_galaxy2d_reference")

cfg = ExperimentConfig.from_json(
    os.path.join(REPO, "examples", "config_deep_galaxy.json"),
)
mk = dict(cfg.model.kwargs)
mk["dtype"] = jnp.bfloat16
ds = DeepGalaxyDataset(
    os.path.join(WORKDIR, "output_bw_512.h5"),
    use_emb_as_labels=False, dset_name_pattern="s_*", camera_pos=[0],
    t_lim=[400, 520],
)
pipe = GaussianDiffusionPipeline(
    backbone="UNetv2", backbone_kwargs=mk,
    schedule=LinearSchedule(500), model_mean_type="epsilon",
    model_var_type="fixed_small", optimizer="AdamW",
    cond_fn="MultiEmbeddings",
    cond_fn_kwargs={
        "parameter_space": ds.parameter_space,
        "embedding_dim": 4 * mk["model_channels"],
    },
)
params = load_model_weights(
    pipe.init_params(jax.random.PRNGKey(0)),
    os.path.join(WORKDIR, "model.npz"),
)
n = min(len(ds), 25)
x0 = jnp.asarray(np.stack([ds[i][0] for i in range(n)]))
labels = jnp.asarray(np.stack([ds[i][1] for i in range(n)]))
print(f"frames: {n}, data mean {float(x0.mean()):+.3f} (the DC the probe "
      "is about), std {:.3f}".format(float(x0.std())), flush=True)

abar = np.asarray(pipe.coeffs.alphas_cumprod, np.float64)
mf = pipe._model_fn(params, labels)
fn = jax.jit(lambda x, t: mf(x, t))
rng = jax.random.PRNGKey(7)
for t in (10, 100, 250, 400, 480, 499):
    ab = abar[t]
    eps = jax.random.normal(jax.random.fold_in(rng, t), x0.shape)
    x_t = np.sqrt(ab) * x0 + np.sqrt(1 - ab) * eps
    eps_hat = fn(x_t, jnp.full((n,), t, jnp.int32)).astype(jnp.float32)
    err = float(jnp.mean((eps_hat - eps) ** 2))
    x0_pred = (x_t - np.sqrt(1 - ab) * eps_hat) / np.sqrt(ab)
    x0err = float(jnp.mean((x0_pred - x0) ** 2))
    print(
        f"t={t:3d} abar={ab:.2e} eps-MSE {err:.5f} -> implied x0-MSE "
        f"{x0err:.4f} (amplification 1/abar = {1 / ab:.0f}x)",
        flush=True,
    )
print(
    "\nverdict: eps error is Bayes-level everywhere; the schedule's "
    "truncated terminal SNR leaves the frames' dominant DC untrained at "
    "the sampler's starting point. Fix = zero_terminal_snr + v-prediction "
    "(DEMO_RECIPE=zero_snr), measured 1.21 -> 0.0007 matched MSE.",
)
