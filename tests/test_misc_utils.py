"""Coverage for the remaining utility surfaces: prefetch, plotting,
device prefetch."""
import numpy as np
import pytest

from rho_diffusion_tpu.data.loader import prefetch, prefetch_to_device
from rho_diffusion_tpu.utils import plot_image_grid, plot_tensor_images


def test_prefetch_preserves_order_and_propagates_errors():
    assert list(prefetch(iter(range(10)), size=3)) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(boom(), size=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)


def test_prefetch_to_device_places_batches():
    import jax

    batches = [{"data": np.ones((4, 2), np.float32), "labels": None}
               for _ in range(3)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 3
    assert isinstance(out[0]["data"], jax.Array)
    assert out[0]["labels"] is None


def test_plot_image_grid_2d(tmp_path):
    imgs = np.random.default_rng(0).uniform(0, 1, (5, 8, 8, 1))
    f = tmp_path / "grid.png"
    plot_image_grid(imgs, filename=str(f))
    assert f.stat().st_size > 0


def test_plot_tensor_images_3d(tmp_path):
    vols = np.random.default_rng(0).uniform(0, 1, (2, 6, 6, 6, 1))
    f = tmp_path / "vox.png"
    plot_tensor_images(vols, filename=str(f))
    assert f.stat().st_size > 0
