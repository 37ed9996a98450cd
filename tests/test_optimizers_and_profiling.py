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


def test_torch_named_lr_schedulers_resolve_and_behave():
    """Every common torch scheduler name resolves via the registry and
    follows torch semantics at the checkpoints below (reference registry
    resolved any torch scheduler by name)."""
    import numpy as np

    from rho_diffusion_tpu.registry import registry

    spe = 10  # steps per epoch

    def sched(name, **kw):
        return registry.get("lr_schedulers", name)(1.0, spe, **kw)

    s = sched("MultiStepLR", milestones=[2, 4], gamma=0.1)
    np.testing.assert_allclose(float(s(0)), 1.0)
    np.testing.assert_allclose(float(s(25)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(45)), 0.01, rtol=1e-6)

    s = sched("ConstantLR", factor=0.5, total_iters=2)
    np.testing.assert_allclose(float(s(5)), 0.5)
    np.testing.assert_allclose(float(s(25)), 1.0)

    s = sched("PolynomialLR", total_iters=2, power=1.0)
    np.testing.assert_allclose(float(s(10)), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s(30)), 0.0, atol=1e-9)

    s = sched("CosineAnnealingWarmRestarts", T_0=1, T_mult=2, eta_min=0.0)
    np.testing.assert_allclose(float(s(0)), 1.0)
    np.testing.assert_allclose(float(s(10)), 1.0)  # restart at T_0 epochs
    assert 0.0 <= float(s(15)) < 1.0

    s = sched("OneCycleLR", max_lr=2.0, epochs=4, pct_start=0.25)
    np.testing.assert_allclose(float(s(10)), 2.0, rtol=1e-5)  # peak at 25%
    assert float(s(0)) < 0.1  # starts at max_lr/div_factor
    assert float(s(39)) < 0.01  # anneals far below the peak
