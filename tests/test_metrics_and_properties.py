"""Wasserstein/Sinkhorn metric tests + hypothesis property tests over the
core math (the reference shipped hypothesis strategies but no test used
them; SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rho_diffusion_tpu.diffusion.ddpm import q_sample
from rho_diffusion_tpu.diffusion.schedule import LinearSchedule
from rho_diffusion_tpu.hypothesis_utils import jnp_arrays
from rho_diffusion_tpu.metrics import WassersteinWrapper, sinkhorn_divergence
from rho_diffusion_tpu.ops.embeddings import sinusoidal_position_embedding
from rho_diffusion_tpu.utils import calculate_sha512_embedding


# ---------------------------------------------------------------------------
# Sinkhorn / Wasserstein
# ---------------------------------------------------------------------------

def test_sinkhorn_zero_for_identical_clouds():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)), jnp.float32)
    d = sinkhorn_divergence(x, x, blur=0.05)
    assert float(d) == pytest.approx(0.0, abs=1e-5)


def test_sinkhorn_orders_by_distance():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32, 2)), jnp.float32)
    near = x + 0.1
    far = x + 3.0
    d_near = float(sinkhorn_divergence(x, near, blur=0.05))
    d_far = float(sinkhorn_divergence(x, far, blur=0.05))
    assert 0 < d_near < d_far


def test_sinkhorn_approximates_true_w1_for_points():
    """Two single-point clouds: W1 == the Euclidean distance."""
    x = jnp.asarray([[0.0, 0.0]])
    y = jnp.asarray([[3.0, 4.0]])
    d = float(sinkhorn_divergence(x, y, blur=0.01, num_iters=200))
    assert d == pytest.approx(5.0, rel=1e-2)


def test_wasserstein_wrapper_batched_fields():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(6, 8, 8, 1)), jnp.float32)
    w = WassersteinWrapper(blur=0.05, num_iters=50)
    assert float(w(a, a)) == pytest.approx(0.0, abs=1e-4)
    b = a + 1.0
    assert float(w(a, b)) > 0.1


# ---------------------------------------------------------------------------
# Property tests (hypothesis)
# ---------------------------------------------------------------------------

@settings(max_examples=20, deadline=None)
@given(t=st.integers(0, 99), seed=st.integers(0, 2**31 - 1))
def test_q_sample_interpolates_bounds(t, seed):
    """x_t must satisfy |x_t| <= sqrt(ab)|x0| + sqrt(1-ab)|eps| elementwise
    and reduce to x0 noise-free at ab -> 1."""
    sch = LinearSchedule(100)
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(size=(2, 8, 1)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 8, 1)), jnp.float32)
    tt = jnp.full((2,), t, jnp.int32)
    x_t = q_sample(sch, x0, tt, eps)
    ab = float(sch.alpha_bar_t[t])
    bound = np.sqrt(ab) * np.abs(np.asarray(x0)) + np.sqrt(1 - ab) * np.abs(
        np.asarray(eps),
    )
    assert (np.abs(np.asarray(x_t)) <= bound + 1e-5).all()


@settings(max_examples=20, deadline=None)
@given(dim=st.sampled_from([16, 64, 128]), seed=st.integers(0, 10_000))
def test_sinusoidal_embedding_bounded_and_unique(dim, seed):
    rng = np.random.default_rng(seed)
    t = jnp.asarray(rng.integers(0, 1000, size=8))
    emb = np.asarray(sinusoidal_position_embedding(t, dim))
    assert emb.shape == (8, dim)
    assert (np.abs(emb) <= 1.0 + 1e-6).all()


@settings(max_examples=20, deadline=None)
@given(
    l=st.integers(-50, 50),
    m=st.integers(-50, 50),
    length=st.sampled_from([128, 256, 512]),
)
def test_sha512_embedding_properties(l, m, length):
    emb = calculate_sha512_embedding({"l": l, "m": m}, l=length)
    assert emb.shape == (length,)
    assert (0 <= emb).all() and (emb < 1.0).all()  # ASCII codes / 128
    # injective on distinct dicts (hash collision practically impossible)
    other = calculate_sha512_embedding({"l": l, "m": m + 1}, l=length)
    assert not np.array_equal(emb, other)


@settings(max_examples=10, deadline=None)
@given(arr=jnp_arrays(shape=(4, 8), dtype=np.float32))
def test_jnp_arrays_strategy(arr):
    assert arr.shape == (4, 8)
    assert arr.dtype == jnp.float32
    assert jnp.isfinite(arr).all()
