"""Optimizer/lr-schedule factories and profiling utilities."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_diffusion_tpu.registry import registry
from rho_diffusion_tpu.training import (
    StepTimer,
    check_finite,
    compiled_cost,
    find_nonfinite,
)
from rho_diffusion_tpu.training.optimizers import build_lr_schedule, build_optimizer


@pytest.mark.parametrize("name", sorted(registry.mapping["optimizers"]))
def test_every_optimizer_updates(name):
    """Every registered optimizer must construct from torch-style kwargs and
    produce finite updates (reference prepopulated 13 torch optimizers)."""
    tx = registry.get("optimizers", name)(lr=1e-3)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    for u in jax.tree_util.tree_leaves(updates):
        assert jnp.isfinite(u).all()


def test_build_optimizer_world_scaling_and_clip():
    """lr scales by sqrt(world_size) (reference abstract_diffusion.py:118)
    and grad clipping bounds the update."""
    params = {"w": jnp.ones((2,))}
    grads = {"w": jnp.asarray([1e6, -1e6])}

    tx = build_optimizer("SGD", {"lr": 1.0}, world_size=4, clip_grad_norm=1.0)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # clipped to norm 1, then lr 1*sqrt(4)=2
    np.testing.assert_allclose(
        float(jnp.linalg.norm(updates["w"])), 2.0, rtol=1e-5,
    )


def test_lr_schedules():
    cos = build_lr_schedule(
        "CosineAnnealingLR", base_lr=1e-3, steps_per_epoch=10,
        kwargs={"T_max": 2, "eta_min": 1e-5},
    )
    assert float(cos(0)) == pytest.approx(1e-3)
    assert float(cos(20)) == pytest.approx(1e-5, rel=1e-3)
    assert float(cos(100)) == pytest.approx(1e-5, rel=1e-3)  # holds at min
    step = build_lr_schedule(
        "StepLR", base_lr=1.0, steps_per_epoch=1, kwargs={"step_size": 5, "gamma": 0.1},
    )
    assert float(step(0)) == pytest.approx(1.0)
    assert float(step(5)) == pytest.approx(0.1)
    # None -> constant
    assert build_lr_schedule(None, 5e-4, 10) == 5e-4


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        t.tick()
    stats = t.stats()
    assert stats["n_steps"] == 3  # 4 intervals, first skipped
    assert stats["steps_per_sec"] > 0


def test_compiled_cost():
    cost = compiled_cost(lambda a, b: a @ b, jnp.ones((64, 64)), jnp.ones((64, 64)))
    # 2*M*N*K flops
    assert cost["flops"] == pytest.approx(2 * 64**3, rel=0.2)


def test_find_nonfinite_and_check():
    tree = {"ok": jnp.ones((3,)), "bad": jnp.asarray([1.0, np.nan]),
            "ints": jnp.ones((2,), jnp.int32)}
    bad = find_nonfinite(tree)
    assert bad == ["['bad']"]
    with pytest.raises(FloatingPointError, match="bad"):
        check_finite(tree, context="unit-test")
    check_finite({"ok": jnp.ones(2)})  # no raise
