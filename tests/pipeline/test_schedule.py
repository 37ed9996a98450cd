"""Schedule numerics — golden values from the reference's own test suite
(/root/reference/tests/pipeline/test_schedule.py:28-53) plus closed-form
checks the reference lacked."""
import numpy as np
import pytest

from rho_diffusion_tpu.diffusion import schedule as s
from rho_diffusion_tpu.registry import registry


def test_linear_schedule_golden():
    """Reference golden endpoints: LinearSchedule(100, 1e-4, 0.02) with
    scale=10 has beta in [0.001, 0.2] (test_schedule.py:28-46)."""
    sch = s.LinearSchedule(100, 1e-4, 0.02)
    beta = np.asarray(sch.beta_t)
    assert beta.shape == (100,)
    assert beta.dtype == np.float32
    assert beta[0] == pytest.approx(0.001)
    assert beta[-1] == pytest.approx(0.2)
    alpha = np.asarray(sch.alpha_t)
    assert alpha[0] == pytest.approx(0.999)
    assert alpha[-1] == pytest.approx(0.8)
    sigma = np.asarray(sch.sigma_t)
    assert sigma[0] == 0.0
    assert sigma[-1] == pytest.approx(0.4472, rel=1e-4)


def test_linear_schedule_closed_form():
    sch = s.LinearSchedule(1000)  # default beta_1=1e-3, beta_T=0.02
    beta = np.asarray(sch.beta_t, dtype=np.float64)
    alpha_bar = np.asarray(sch.alpha_bar_t, dtype=np.float64)
    np.testing.assert_allclose(
        alpha_bar, np.cumprod(1.0 - beta), rtol=1e-5,
    )
    # offset table: alpha_bar_{t-1} with leading 1
    offset = np.asarray(sch.offset_alpha_bar_t)
    assert offset[0] == 1.0
    np.testing.assert_allclose(offset[1:], np.asarray(sch.alpha_bar_t)[:-1])


def test_cosine_schedule_monotone_and_bounded():
    sch = s.CosineBetaSchedule(1000)
    beta = np.asarray(sch.beta_t)
    assert beta.shape == (1000,)
    assert (beta >= 1e-4 - 1e-8).all() and (beta <= 0.9999).all()
    ab = np.asarray(sch.alpha_bar_t)
    assert (np.diff(ab) <= 1e-7).all(), "alpha_bar must be non-increasing"
    assert 0.0 <= ab[-1] < 1e-3


def test_sigmoid_schedule_implemented():
    """The reference raises NotImplementedError (schedule.py:217-221);
    ours works."""
    sch = s.SigmoidSchedule(100)
    assert len(sch) == 100
    ab = np.asarray(sch.alpha_bar_t)
    assert (np.diff(ab) <= 1e-7).all()


def test_named_beta_schedules():
    for name in ("linear", "cosine", "squaredcos_cap_v2"):
        sch = s.named_beta_schedule(name, 50)
        assert len(sch) == 50
        assert np.isfinite(np.asarray(sch.sigma_t)).all()
    with pytest.raises(ValueError):
        s.named_beta_schedule("nope", 10)


def test_registry_membership():
    """All three schedules resolvable by name (test_schedule.py:49-53)."""
    for name in s.__all__:
        if name in (
            "NoiseSchedule",
            "named_beta_schedule",
            "schedule_from_betas",
            "rescale_zero_terminal_snr",  # beta transform, not a schedule class
        ):
            continue
        assert registry.get("schedules", name)


def test_schedule_is_pytree():
    """Schedules must flow through jit/scan as pytrees."""
    import jax

    sch = s.LinearSchedule(100)
    leaves = jax.tree_util.tree_leaves(sch)
    assert len(leaves) == 4
    out = jax.jit(lambda sc: sc.alpha_bar_t[-1])(sch)
    assert np.isfinite(out)


def test_invalid_scaled_betas_fail_loudly():
    """1000/T scaling can push betas out of (0,1) for small T; the reference
    produced silent NaNs — we raise."""
    with pytest.raises(ValueError, match="betas must lie in"):
        s.LinearSchedule(10)
