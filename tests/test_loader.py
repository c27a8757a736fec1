"""BatchLoader behaviour: shapes, shuffle determinism, drop_last, early abort."""

import numpy as np

from ssunet_gan_tpu.data.dataset import SyntheticDataset
from ssunet_gan_tpu.data.loader import BatchLoader


def _ds(n=10):
    return SyntheticDataset(n, 16, 16, 2, 3, seed=1)


def test_batches_and_drop_last():
    loader = BatchLoader(_ds(10), 4, shuffle=False, drop_last=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    ori, img, mask, meta = batches[0]
    assert img.shape == (4, 16, 16, 3) and mask.shape == (4, 16, 16, 2)
    assert len(meta["img_id"]) == 4

    loader = BatchLoader(_ds(10), 4, drop_last=False)
    assert len(list(loader)) == 3 == len(loader)


def test_shuffle_changes_order_and_is_seeded():
    a = [m["img_id"] for *_, m in BatchLoader(_ds(16), 4, shuffle=True, seed=7)]
    b = [m["img_id"] for *_, m in BatchLoader(_ds(16), 4, shuffle=True, seed=7)]
    c = [m["img_id"] for *_, m in BatchLoader(_ds(16), 4, shuffle=False)]
    assert a == b
    assert a != c


def test_early_abort_does_not_hang():
    loader = BatchLoader(_ds(64), 2, num_workers=2, prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # generator abandoned mid-epoch; producer must shut down


def test_second_iteration_fresh():
    loader = BatchLoader(_ds(6), 2)
    assert len(list(loader)) == 3
    assert len(list(loader)) == 3
