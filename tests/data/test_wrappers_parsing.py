"""MNIST/CIFAR wrapper parsing against synthetic files in the standard
on-disk formats (idx / python pickle batches)."""
import gzip
import pickle

import numpy as np
import pytest

from rho_diffusion_tpu.data.wrappers import CIFAR10Dataset, MNISTDataset


def _write_idx_images(path, arr):
    with open(path, "wb") as f:
        f.write((0x00000803).to_bytes(4, "big"))
        for d in arr.shape:
            f.write(int(d).to_bytes(4, "big"))
        f.write(arr.astype(np.uint8).tobytes())


def _write_idx_labels(path, arr):
    with open(path, "wb") as f:
        f.write((0x00000801).to_bytes(4, "big"))
        f.write(int(arr.shape[0]).to_bytes(4, "big"))
        f.write(arr.astype(np.uint8).tobytes())


@pytest.fixture()
def mnist_root(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (10, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, (10,), dtype=np.uint8)
    _write_idx_images(tmp_path / "train-images-idx3-ubyte", imgs)
    _write_idx_labels(tmp_path / "train-labels-idx1-ubyte", labels)
    # test split gzipped, exercising the .gz path
    with gzip.open(tmp_path / "t10k-images-idx3-ubyte.gz", "wb") as f:
        f.write((0x00000803).to_bytes(4, "big"))
        for d in imgs.shape:
            f.write(int(d).to_bytes(4, "big"))
        f.write(imgs.tobytes())
    with gzip.open(tmp_path / "t10k-labels-idx1-ubyte.gz", "wb") as f:
        f.write((0x00000801).to_bytes(4, "big"))
        f.write((10).to_bytes(4, "big"))
        f.write(labels.tobytes())
    return tmp_path, imgs, labels


def test_mnist_idx_parsing(mnist_root):
    root, imgs, labels = mnist_root
    ds = MNISTDataset(root=str(root), train=True)
    assert len(ds) == 10
    x, y = ds[3]
    assert x.shape == (28, 28, 1)
    assert -1.0 <= x.min() and x.max() <= 1.0
    assert y == labels[3]
    np.testing.assert_allclose(
        x[..., 0], imgs[3].astype(np.float32) / 255.0 * 2 - 1,
    )
    # gz split
    ds_test = MNISTDataset(root=str(root), train=False)
    assert len(ds_test) == 10
    assert ds.parameter_space["labels"] == list(range(10))


def test_cifar_pickle_parsing(tmp_path):
    rng = np.random.default_rng(1)
    for i in range(1, 6):
        batch = {
            b"data": rng.integers(0, 256, (4, 3072), dtype=np.uint8),
            b"labels": rng.integers(0, 10, 4).tolist(),
        }
        with open(tmp_path / f"data_batch_{i}", "wb") as f:
            pickle.dump(batch, f)
    ds = CIFAR10Dataset(root=str(tmp_path), train=True)
    assert len(ds) == 20
    x, y = ds[0]
    assert x.shape == (32, 32, 3)
    assert -1.0 <= x.min() and x.max() <= 1.0
    assert 0 <= y < 10
