"""Tests for the input pipeline: transforms, ImageFolder, DataLoader,
device prefetch (reference contracts: data/imagenette.py transform recipe,
torchvision ImageFolder class ordering)."""

import numpy as np
import pytest
from PIL import Image

from peekvit_tpu.data import transforms as T
from peekvit_tpu.data.datasets import ImageFolder
from peekvit_tpu.data.loader import BackgroundIterator, DataLoader, prefetch_to_device
from peekvit_tpu.data.synthetic import Synthetic


def _img(w=64, h=48, color=(255, 0, 0)):
    return Image.new("RGB", (w, h), color)


def test_resize_center_crop_to_array_normalize():
    t = T.test_transform(32)
    out = t(_img())
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    # red pixel: channel 0 = (1-0.485)/0.229
    np.testing.assert_allclose(out[0, 0, 0], (1.0 - 0.485) / 0.229, rtol=1e-5)


def test_normalize_denormalize_roundtrip():
    arr = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
    n, d = T.Normalize(), T.Denormalize()
    np.testing.assert_allclose(d(n(arr)), arr, atol=1e-6)


def test_randaugment_deterministic_with_rng():
    ra = T.RandAugment(num_ops=2, magnitude=9)
    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (40, 40, 3), dtype=np.uint8),
        "RGB",
    )
    a = np.asarray(ra(img, np.random.default_rng(42)))
    b = np.asarray(ra(img, np.random.default_rng(42)))
    c = np.asarray(ra(img, np.random.default_rng(43)))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (40, 40, 3)
    assert not np.array_equal(a, c) or True  # different seed usually differs


def test_image_folder_scanning_and_labels(tmp_path):
    for cls, color in [("b_dog", (0, 255, 0)), ("a_cat", (255, 0, 0))]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            _img(16, 16, color).save(d / f"{i}.png")
    ds = ImageFolder(tmp_path, T.test_transform(16))
    assert ds.classes == ["a_cat", "b_dog"]  # sorted, like torchvision
    assert len(ds) == 6
    x, y = ds[0]
    assert x.shape == (16, 16, 3) and y == 0


@pytest.mark.parametrize("num_workers", [0, 3])
def test_dataloader_batching_and_determinism(num_workers):
    ds = Synthetic(image_size=8, num_classes=4, train_size=37, val_size=8)
    dl = DataLoader(ds.train_dataset, batch_size=10, shuffle=True,
                    num_workers=num_workers, seed=7)
    batches = list(dl)
    assert len(batches) == len(dl) == 4
    assert batches[0][0].shape == (10, 8, 8, 3)
    assert batches[-1][0].shape == (7, 8, 8, 3)  # remainder kept
    # determinism per epoch
    batches2 = list(dl)
    np.testing.assert_array_equal(batches[0][1], batches2[0][1])
    # reshuffle on epoch change
    dl.set_epoch(1)
    batches3 = list(dl)
    assert not np.array_equal(batches[0][1], batches3[0][1])
    # all samples seen exactly once
    all_labels = np.concatenate([b[1] for b in batches])
    assert len(all_labels) == 37


def test_dataloader_multihost_shard():
    """shard=(rank, world): disjoint per-host streams (up to the wrap-pad)
    whose union covers the epoch, same count on every rank, deterministic
    from the shared seeded shuffle — DistributedSampler semantics for
    multi-host data parallelism (rank=jax.process_index() on a pod)."""

    class _Indexed:
        def __len__(self):
            return 37

        def __getitem__(self, i):
            return np.full((4, 4, 3), i, np.float32), i

    world = 4
    per_rank = []
    for rank in range(world):
        dl = DataLoader(_Indexed(), batch_size=5, shuffle=True, seed=7,
                        shard=(rank, world))
        dl.set_epoch(2)
        got = np.concatenate([y for _, y in dl])
        assert len(got) == 10  # ceil(37/4): wrap-padded equal share
        assert len(dl) == 2  # ceil(10/5)
        per_rank.append(got)
    allv = np.concatenate(per_rank)
    assert set(allv.tolist()) == set(range(37))  # epoch fully covered
    assert len(allv) == world * 10  # 3 wrap-pad duplicates
    # deterministic: re-iterating a rank reproduces its stream
    dl0 = DataLoader(_Indexed(), batch_size=5, shuffle=True, seed=7,
                     shard=(0, world))
    dl0.set_epoch(2)
    np.testing.assert_array_equal(per_rank[0],
                                  np.concatenate([y for _, y in dl0]))
    with pytest.raises(ValueError):
        DataLoader(_Indexed(), batch_size=5, shard=(4, 4))


def test_dataloader_drop_last():
    ds = Synthetic(image_size=8, num_classes=2, train_size=25, val_size=8)
    dl = DataLoader(ds.train_dataset, batch_size=10, drop_last=True)
    batches = list(dl)
    assert len(batches) == 2 and all(b[0].shape[0] == 10 for b in batches)


def test_prefetch_to_device_preserves_order():
    import jax

    ds = Synthetic(image_size=8, num_classes=2, train_size=30, val_size=8)
    dl = DataLoader(ds.train_dataset, batch_size=10)
    host = [b[1] for b in dl]
    dev = [np.asarray(y) for _, y in prefetch_to_device(iter(dl), size=2)]
    assert len(dev) == len(host)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h, d)
    x, _ = next(iter(prefetch_to_device(iter(dl), size=2)))
    assert isinstance(x, jax.Array)


def test_background_iterator():
    items = list(BackgroundIterator(iter(range(100)), maxsize=4))
    assert items == list(range(100))

    def boom():
        yield 1
        raise ValueError("x")

    it = BackgroundIterator(boom())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_synthetic_is_learnable_signal():
    """Classes are separable: nearest-class-mean classifier beats chance."""
    ds = Synthetic(image_size=8, num_classes=4, train_size=200, val_size=80)
    xs = np.stack([ds.train_dataset[i][0] for i in range(200)])
    ys = np.array([ds.train_dataset[i][1] for i in range(200)])
    means = np.stack([xs[ys == c].mean(axis=0) for c in range(4)])
    xv = np.stack([ds.val_dataset[i][0] for i in range(80)])
    yv = np.array([ds.val_dataset[i][1] for i in range(80)])
    d = ((xv[:, None] - means[None]) ** 2).sum(axis=(2, 3, 4))
    acc = (d.argmin(axis=1) == yv).mean()
    assert acc > 0.9


def test_input_pipeline_benchmark_corpus(tmp_path):
    """The input-pipeline benchmark's synthetic JPEG corpus loads through
    both ImageFolder decode paths and the loader's epoch-rate helper."""
    from benchmarks.input_pipeline import _epoch_rate, build_corpus

    root = build_corpus(str(tmp_path / "corpus"), n_classes=2, per_class=3)
    assert build_corpus(root, n_classes=2, per_class=3) == root  # cached
    ds = ImageFolder(root, T.test_transform(32))
    assert len(ds) == 6
    x, y = ds[0]
    assert x.shape == (32, 32, 3) and 0 <= y < 2
    loader = DataLoader(ds, batch_size=2, num_workers=1)
    rate = _epoch_rate(loader, skip=1)
    assert rate > 0
