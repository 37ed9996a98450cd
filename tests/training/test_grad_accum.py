"""Gradient accumulation: one optimizer step over N sequential microbatches.

The accumulated step must be EXACTLY the optax update applied to the
average of the per-microbatch gradients (each microbatch drawn with its own
split of the step RNG) — verified against a hand-rolled eager computation
of the same quantities. The reference framework has no equivalent; this is
the memory lever that reaches effective-b32 at 64^3 where the monolithic
b16 batch measured OOM (RESULTS.md round-3 memory frontier).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import DDPM, LinearSchedule


def _backbone_kwargs():
    return dict(
        data_shape=(8, 8),
        dims=2,
        in_channels=1,
        out_channels=1,
        model_channels=8,
        num_res_blocks=1,
        channel_mult=(1, 2),
        attention_resolutions=[],
        num_heads=1,
    )


def _make_pipe(grad_accum: int) -> DDPM:
    return DDPM(
        backbone="UNetv2",
        backbone_kwargs=_backbone_kwargs(),
        # 1000/T scaling: at T=20 the default beta_T would exceed 1
        schedule=LinearSchedule(20, beta_1=1e-4, beta_T=2e-3),
        optimizer="AdamW",
        opt_kwargs={"lr": 1e-3},
        ema_decay=0.99,
        grad_accum=grad_accum,
    )


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    return {
        "data": rng.uniform(-1, 1, (8, 8, 8, 1)).astype(np.float32),
        "labels": None,
    }


@pytest.mark.heavy
def test_accumulated_step_equals_manual_average(batch):
    """training_step with grad_accum=4 == optax update on the mean of the
    four per-microbatch gradients, and train_loss == mean of micro losses."""
    accum = 4
    pipe = _make_pipe(accum)
    state = pipe.create_state(jax.random.PRNGKey(0))

    # --- hand-rolled expectation, mirroring the step's RNG discipline ---
    _, step_rng = jax.random.split(state.rng)
    rngs = jax.random.split(step_rng, accum)
    micro = {
        "data": batch["data"].reshape(accum, 2, 8, 8, 1),
        "labels": None,
    }
    grads_list, losses = [], []
    for i in range(accum):
        mb = {"data": jnp.asarray(micro["data"][i]), "labels": None}
        (_, metrics), grads = jax.value_and_grad(
            lambda p: pipe.loss_and_metrics(p, mb, rngs[i]), has_aux=True,
        )(state.params)
        grads_list.append(grads)
        losses.append(float(metrics["train_loss"]))
    avg_grads = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / accum, *grads_list,
    )
    updates, _ = pipe.tx.update(avg_grads, state.opt_state, state.params)
    expected_params = jax.tree_util.tree_map(
        lambda p, u: p + u.astype(p.dtype), state.params, updates,
    )

    # --- the accumulated jitted step ---
    new_state, metrics = pipe.training_step(state, batch)

    np.testing.assert_allclose(
        float(metrics["train_loss"]), np.mean(losses), rtol=1e-5,
    )
    flat_new = jax.tree_util.tree_leaves(new_state.params)
    flat_exp = jax.tree_util.tree_leaves(expected_params)
    for got, want in zip(flat_new, flat_exp):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-7,
        )


@pytest.mark.heavy
def test_grad_norm_matches_accumulated_gradient(batch):
    """The logged grad_norm is the norm of the AVERAGED gradient (what the
    optimizer consumed), not of any single microbatch."""
    accum = 2
    pipe = _make_pipe(accum)
    state = pipe.create_state(jax.random.PRNGKey(1))

    _, step_rng = jax.random.split(state.rng)
    rngs = jax.random.split(step_rng, accum)
    grads_list = []
    for i in range(accum):
        mb = {
            "data": jnp.asarray(batch["data"].reshape(accum, 4, 8, 8, 1)[i]),
            "labels": None,
        }
        _, grads = jax.value_and_grad(
            lambda p: pipe.loss_and_metrics(p, mb, rngs[i]), has_aux=True,
        )(state.params)
        grads_list.append(grads)
    avg = jax.tree_util.tree_map(lambda *gs: sum(gs) / accum, *grads_list)
    want = float(
        jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.square(g)), avg, jnp.zeros(()),
        )
        ** 0.5,
    )

    _, metrics = pipe.training_step(state, batch)
    np.testing.assert_allclose(float(metrics["grad_norm"]), want, rtol=1e-5)


def test_indivisible_batch_raises(batch):
    pipe = _make_pipe(3)
    state = pipe.create_state(jax.random.PRNGKey(2))
    with pytest.raises(ValueError, match="grad_accum"):
        pipe.training_step(state, batch)  # 8 % 3 != 0


def test_config_plumbs_grad_accum():
    from rho_diffusion_tpu.config import ExperimentConfig
    from rho_diffusion_tpu.training.trainer import build_pipeline_from_config

    cfg = ExperimentConfig.model_validate(
        {
            "experiment": "accum",
            "model": {"name": "UNetv2", "kwargs": _backbone_kwargs()},
            "dataset": {
                "name": "SphericalHarmonicDataset",
                "kwargs": {"max_l": 2, "grid_el": 8, "length": 8},
            },
            "optimizer": {"name": "AdamW", "kwargs": {"lr": 1e-4}},
            "noise_schedule": {
                "name": "LinearSchedule",
                "kwargs": {"num_steps": 10, "beta_1": 1e-4, "beta_T": 2e-3},
            },
            "training": {"batch_size": 4, "grad_accum": 2, "max_epochs": 1},
        },
    )
    pipe = build_pipeline_from_config(cfg)
    assert pipe.grad_accum == 2
