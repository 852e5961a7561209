"""Tests for the native C++ image pipeline vs the PIL reference path."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from peekvit_tpu import native
from peekvit_tpu.data import transforms as T

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native pipeline unavailable: {native.build_error()}",
)

MEAN, STD = T.IMAGENET_MEAN, T.IMAGENET_STD


def _jpeg_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=95)
    return buf.getvalue()


def _png_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "PNG")
    return buf.getvalue()


def _rand_img(h=90, w=120, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, (h, w, 3), dtype=np.uint8
    )


def _smooth_img(h=90, w=120, seed=0):
    """Natural-image-like content (smooth gradients + low-freq blobs):
    the regime the DCT-domain scaled decode is exact-ish for. Pure uint8
    noise is the adversarial case (all energy in the frequencies the
    reduced IDCT discards) and keeps its own looser bound below."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    for c in range(3):
        a, b, ph = rng.uniform(0.5, 2.0, 3)
        img[..., c] = (
            127 + 60 * np.sin(a * 2 * np.pi * yy / h + ph)
            + 50 * np.cos(b * 2 * np.pi * xx / w)
        )
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("codec", [_jpeg_bytes, _png_bytes])
def test_decode_transform_matches_pil(codec):
    arr = _rand_img()
    data = codec(arr)
    size = 32
    got = native.decode_transform(data, size, size, MEAN, STD)
    assert got is not None and got.shape == (size, size, 3)

    pil = Image.open(io.BytesIO(data)).convert("RGB")
    want = T.Compose([T.Resize(size), T.CenterCrop(size), T.ToArray(),
                      T.Normalize()])(pil)
    # JPEG decode + bilinear differ slightly between libjpeg and PIL;
    # require close agreement in normalized units.
    diff = np.abs(got - want)
    assert np.mean(diff) < 0.1, f"mean abs diff {np.mean(diff)}"
    assert np.quantile(diff, 0.95) < 0.35


def test_center_crop_semantics():
    """Resize to R then center-crop S: the native path must match PIL's
    integer crop box."""
    arr = _rand_img(64, 64, seed=1)
    data = _png_bytes(arr)  # png = lossless, isolates resize+crop math
    resize, size = 48, 32
    got = native.decode_transform(data, resize, size, [0, 0, 0], [1, 1, 1])
    pil = Image.open(io.BytesIO(data)).convert("RGB")
    want = T.Compose([T.Resize(resize), T.CenterCrop(size), T.ToArray()])(pil)
    assert np.mean(np.abs(got - want)) < 0.02


def test_load_batch_threads(tmp_path):
    paths = []
    for i in range(10):
        arr = _rand_img(seed=i)
        p = tmp_path / f"img_{i}.jpg"
        p.write_bytes(_jpeg_bytes(arr))
        paths.append(str(p))
    paths.append(str(tmp_path / "missing.jpg"))  # failure flagged, not fatal
    batch, ok = native.load_batch(paths, 32, 32, MEAN, STD, num_threads=4)
    assert batch.shape == (11, 32, 32, 3)
    assert ok[:10].all() and not ok[10]
    # matches single-image path
    single = native.decode_transform(
        open(paths[3], "rb").read(), 32, 32, MEAN, STD
    )
    np.testing.assert_allclose(batch[3], single, atol=1e-6)


def test_corrupt_input_rejected():
    assert native.decode_transform(b"not an image", 32, 32, MEAN, STD) is None
    batch, ok = native.load_batch([os.devnull], 32, 32, MEAN, STD)
    assert not ok[0]


def test_image_folder_native_fast_path(tmp_path):
    """ImageFolder with the standard eval transform routes through the C++
    decoder and matches the PIL path closely."""
    from peekvit_tpu.data.datasets import ImageFolder

    d = tmp_path / "cls_a"
    d.mkdir()
    for i in range(3):
        arr = _smooth_img(seed=20 + i)
        Image.fromarray(arr, "RGB").save(d / f"{i}.jpg", quality=95)

    ds_native = ImageFolder(tmp_path, T.test_transform(32))
    x, y = ds_native[0]
    assert ds_native._native_spec not in (None, False)
    assert x.shape == (32, 32, 3) and y == 0

    ds_pil = ImageFolder(tmp_path, T.test_transform(32))
    ds_pil._native_spec = False  # force PIL path
    x_pil, _ = ds_pil[0]
    assert np.mean(np.abs(x - x_pil)) < 0.05


def test_dataloader_uses_native_batch_path(tmp_path):
    """DataLoader routes whole batches through pv_load_batch and matches the
    per-item path exactly."""
    from peekvit_tpu.data.datasets import ImageFolder
    from peekvit_tpu.data.loader import DataLoader

    d = tmp_path / "c"
    d.mkdir()
    for i in range(9):
        Image.fromarray(_rand_img(seed=40 + i), "RGB").save(
            d / f"{i}.jpg", quality=95)

    ds = ImageFolder(tmp_path, T.test_transform(32))
    dl = DataLoader(ds, 4, num_workers=2)
    batches = list(dl)
    assert [b[0].shape[0] for b in batches] == [4, 4, 1]
    # per-item reference
    want = np.stack([np.asarray(ds[i][0]) for i in range(4)])
    np.testing.assert_allclose(batches[0][0], want, atol=1e-6)
    # shuffling still deterministic through the batch path
    dl2 = DataLoader(ds, 4, shuffle=True, num_workers=2, seed=3)
    a = [b[1] for b in dl2]
    b = [b[1] for b in dl2]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_scaled_dct_decode_parity_and_activation():
    """The M/8 scaled JPEG decode (VERDICT r4 #6) must stay within the
    PIL-path tolerance on natural-image content, and must actually
    activate: a 500x375 source decoded for a 224 target comes back from
    pv_decode at full size (raw API never scales) while the transform
    path runs the reduced IDCT — verified by timing-independent output
    agreement AND by the worst-case noise bound staying within the
    documented looser envelope."""
    # natural-image content at the Imagenette eval geometry
    arr = _smooth_img(375, 500, seed=7)
    data = _jpeg_bytes(arr)
    resize, size = 256, 224
    got = native.decode_transform(data, resize, size, MEAN, STD)
    assert got is not None and got.shape == (size, size, 3)
    pil = Image.open(io.BytesIO(data)).convert("RGB")
    want = T.Compose([T.Resize(resize), T.CenterCrop(size), T.ToArray(),
                      T.Normalize()])(pil)
    diff = np.abs(got - want)
    assert np.mean(diff) < 0.1, f"mean abs diff {np.mean(diff)}"
    assert np.quantile(diff, 0.95) < 0.35

    # raw decode API stays full-resolution (train-path crops need it)
    raw = native.decode(data)
    assert raw is not None and raw.shape == (375, 500, 3)

    # adversarial pure-noise content: scaled decode discards exactly the
    # high frequencies the fixture is made of — keep the documented
    # worst-case envelope rather than silently regressing
    noise = _rand_img(375, 500, seed=8)
    ndata = _jpeg_bytes(noise)
    ngot = native.decode_transform(ndata, resize, size, MEAN, STD)
    npil = Image.open(io.BytesIO(ndata)).convert("RGB")
    nwant = T.Compose([T.Resize(resize), T.CenterCrop(size), T.ToArray(),
                       T.Normalize()])(npil)
    assert np.mean(np.abs(ngot - nwant)) < 0.25
