"""Native (C++) spherical-harmonics generator vs scipy.

The unnormalised magnitude field must match scipy exactly; the normalised
field matches except where the reference's tie-sensitive complex min-max
picks a different (equally valid) normalisation point — see
rho_diffusion_tpu/native/__init__.py.
"""
import numpy as np
import pytest

from rho_diffusion_tpu.data.synthetic import (
    SphericalHarmonicDataset,
    _legacy_sph_harm,
    make_spherical_grid,
)
from rho_diffusion_tpu.native import get_ylm_lib, ylm_field_native

pytestmark = pytest.mark.skipif(
    get_ylm_lib() is None, reason="no C++ toolchain to build libylm",
)


@pytest.mark.parametrize("l,m", [(0, 0), (1, 1), (2, -1), (3, 2), (5, -4), (8, 8)])
def test_unnormalized_matches_scipy(l, m):
    g = np.linspace(-2.0, 2.0, 16)
    native = ylm_field_native(g, g, g, m=m, l=l, normalize=False)
    _, theta, phi = make_spherical_grid(g, g, g)
    xg, yg, zg = np.meshgrid(g, g, g, indexing="xy")
    r = np.sqrt(xg**2 + yg**2 + zg**2)
    ref = np.abs(_legacy_sph_harm(abs(m), l, theta, phi) * r)
    np.testing.assert_allclose(native, ref, atol=1e-6)


def test_normalized_field_sane():
    g = np.linspace(-2.0, 2.0, 16)
    for l, m in [(0, 0), (2, 1), (4, -3)]:
        field = ylm_field_native(g, g, g, m=m, l=l, normalize=True)
        assert np.isfinite(field).all()
        assert field.min() >= 0.0


def test_dataset_native_path():
    ds = SphericalHarmonicDataset(
        max_l=3, grid_el=8, length=4, use_native=True, random_seed=5,
    )
    x, emb = ds[0]
    assert x.shape == (8, 8, 8, 1)
    assert np.isfinite(np.asarray(x)).all()
    assert emb.shape == (256,)


def test_invalid_lm_rejected():
    g = np.linspace(-2.0, 2.0, 8)
    with pytest.raises(ValueError, match="code 2"):
        ylm_field_native(g, g, g, m=5, l=2)
