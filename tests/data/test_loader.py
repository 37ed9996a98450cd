"""DataLoader semantics: padding masks, per-epoch shuffling, process slicing."""
import numpy as np

from rho_diffusion_tpu.data.loader import DataLoader


class _ArrayDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((4,), float(i), np.float32), np.array([i], np.float32)


def test_short_final_batch_carries_valid_mask():
    """drop_last=False pads by wrapping but must mark padded rows so
    validation doesn't double-count early samples (ADVICE round 1)."""
    loader = DataLoader(
        _ArrayDataset(10), batch_size=4, shuffle=False, drop_last=False,
        num_workers=0, process_index=0, num_processes=1,
    )
    batches = list(loader)
    assert len(batches) == 3
    assert "valid" not in batches[0] and "valid" not in batches[1]
    mask = batches[2]["valid"]
    np.testing.assert_array_equal(mask, [True, True, False, False])
    # padded rows wrap to the first indices
    np.testing.assert_array_equal(batches[2]["data"][:, 0], [8.0, 9.0, 0.0, 1.0])


def test_full_batches_have_no_mask_and_cover_dataset():
    loader = DataLoader(
        _ArrayDataset(8), batch_size=4, shuffle=True, drop_last=True,
        num_workers=0, process_index=0, num_processes=1, seed=3,
    )
    seen = []
    for b in loader:
        assert "valid" not in b
        seen.extend(b["data"][:, 0].tolist())
    assert sorted(seen) == list(range(8))


def test_process_slicing_partitions_global_batch():
    batches = []
    for pi in range(2):
        loader = DataLoader(
            _ArrayDataset(8), batch_size=4, shuffle=False, drop_last=True,
            num_workers=0, process_index=pi, num_processes=2,
        )
        batches.append(list(loader))
    for b0, b1 in zip(*batches):
        assert b0["data"].shape[0] == 2 and b1["data"].shape[0] == 2
        combined = sorted(
            b0["data"][:, 0].tolist() + b1["data"][:, 0].tolist(),
        )
        assert combined == sorted(set(combined)), "processes must not overlap"
