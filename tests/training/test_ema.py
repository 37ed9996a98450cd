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
