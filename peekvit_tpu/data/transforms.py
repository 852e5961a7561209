"""Image transforms on PIL + numpy (replaces the torchvision transform
stacks the reference composes, e.g. data/imagenette.py:70-83).

The reference recipe per dataset is:
  train: RandAugment(num_ops, magnitude) -> Resize -> ToTensor -> Normalize
  test:  Resize -> CenterCrop -> ToTensor -> Normalize
with ImageNet mean/std everywhere. We reproduce those semantics natively,
producing NHWC float32 (TPU layout) instead of CHW tensors.

RandAugment implements the 14-op space of torchvision's RandAugment
(AutoAugment paper, arXiv 1909.13719) with the standard magnitude binning
(31 bins, magnitude 0-30).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, x, rng: Optional[np.random.Generator] = None):
        for t in self.transforms:
            x = t(x, rng) if getattr(t, "random", False) else t(x)
        return x


class Resize:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img: Image.Image) -> Image.Image:
        return img.resize((self.size[1], self.size[0]), Image.BILINEAR)


class CenterCrop:
    def __init__(self, size: int):
        self.size = size

    def __call__(self, img: Image.Image) -> Image.Image:
        w, h = img.size
        s = self.size
        left, top = (w - s) // 2, (h - s) // 2
        return img.crop((left, top, left + s, top + s))


class ToArray:
    """PIL -> float32 HWC in [0, 1] (torchvision ToTensor minus the CHW flip)."""

    def __call__(self, img) -> np.ndarray:
        if isinstance(img, Image.Image):
            img = img.convert("RGB")
            arr = np.asarray(img, dtype=np.float32) / 255.0
        else:
            arr = np.asarray(img, dtype=np.float32)
        return arr


class Normalize:
    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, arr: np.ndarray) -> np.ndarray:
        return (arr - self.mean) / self.std


class Denormalize:
    """Inverse of Normalize — the ``denormalize_transform`` contract the
    visualizers rely on (reference data/imagenette.py:36-38). Accepts HWC or
    NHWC numpy/JAX arrays."""

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, arr) -> np.ndarray:
        return np.asarray(arr) * self.std + self.mean


# --------------------------------------------------------------- RandAugment

_FILL = (128, 128, 128)
_NUM_BINS = 31


def _affine(img, matrix):
    return img.transform(img.size, Image.AFFINE, matrix, Image.BILINEAR,
                         fillcolor=_FILL)


def _shear_x(img, v):
    return _affine(img, (1, v, 0, 0, 1, 0))


def _shear_y(img, v):
    return _affine(img, (1, 0, 0, v, 1, 0))


def _translate_x(img, v):
    return _affine(img, (1, 0, v * img.size[0], 0, 1, 0))


def _translate_y(img, v):
    return _affine(img, (1, 0, 0, 0, 1, v * img.size[1]))


def _enhance(factory):
    def op(img, v):
        return factory(img).enhance(1.0 + v)

    return op


# (name, magnitude range, signed) — torchvision RandAugment op space.
_OPS = [
    ("Identity", None, False, lambda img, v: img),
    ("ShearX", (0.0, 0.3), True, _shear_x),
    ("ShearY", (0.0, 0.3), True, _shear_y),
    ("TranslateX", (0.0, 150.0 / 331.0), True, _translate_x),
    ("TranslateY", (0.0, 150.0 / 331.0), True, _translate_y),
    ("Rotate", (0.0, 30.0), True,
     lambda img, v: img.rotate(v, Image.BILINEAR, fillcolor=_FILL)),
    ("Brightness", (0.0, 0.9), True, _enhance(ImageEnhance.Brightness)),
    ("Color", (0.0, 0.9), True, _enhance(ImageEnhance.Color)),
    ("Contrast", (0.0, 0.9), True, _enhance(ImageEnhance.Contrast)),
    ("Sharpness", (0.0, 0.9), True, _enhance(ImageEnhance.Sharpness)),
    ("Posterize", (8, 4), False,
     lambda img, v: ImageOps.posterize(img, int(round(v)))),
    ("Solarize", (255.0, 0.0), False,
     lambda img, v: ImageOps.solarize(img, int(v))),
    ("AutoContrast", None, False, lambda img, v: ImageOps.autocontrast(img)),
    ("Equalize", None, False, lambda img, v: ImageOps.equalize(img)),
]


class RandAugment:
    """torchvision-style RandAugment (num_ops random ops at a fixed
    magnitude bin), PRNG passed explicitly for reproducibility."""

    random = True

    def __init__(self, num_ops: int = 2, magnitude: int = 9):
        self.num_ops = num_ops
        self.magnitude = magnitude

    def __call__(self, img: Image.Image,
                 rng: Optional[np.random.Generator] = None) -> Image.Image:
        rng = rng or np.random.default_rng()
        img = img.convert("RGB")
        for _ in range(self.num_ops):
            name, rng_range, signed, fn = _OPS[int(rng.integers(len(_OPS)))]
            if rng_range is None:
                v = 0.0
            else:
                lo, hi = rng_range
                v = lo + (hi - lo) * self.magnitude / (_NUM_BINS - 1)
                if signed and rng.random() < 0.5:
                    v = -v
            img = fn(img, v)
        return img


def train_transform(image_size: int, augmentation_ops: int = 2,
                    augmentation_magnitude: int = 9) -> Compose:
    """RandAugment -> Resize -> ToArray -> Normalize
    (reference data/imagenette.py:79-83)."""
    return Compose([
        RandAugment(augmentation_ops, augmentation_magnitude),
        Resize(image_size),
        ToArray(),
        Normalize(),
    ])


def test_transform(image_size: int) -> Compose:
    """Resize -> CenterCrop -> ToArray -> Normalize
    (reference data/imagenette.py:72-76)."""
    return Compose([
        Resize(image_size),
        CenterCrop(image_size),
        ToArray(),
        Normalize(),
    ])


def native_spec(transform):
    """If ``transform`` is the standard eval recipe (Resize -> CenterCrop ->
    ToArray -> Normalize), return ``(resize, crop, mean, std)`` so the C++
    pipeline (peekvit_tpu.native) can run it end to end; else None."""
    if not isinstance(transform, Compose):
        return None
    ts = transform.transforms
    if (
        len(ts) == 4
        and isinstance(ts[0], Resize)
        and isinstance(ts[1], CenterCrop)
        and isinstance(ts[2], ToArray)
        and isinstance(ts[3], Normalize)
        and ts[0].size[0] == ts[0].size[1]
    ):
        return (ts[0].size[0], ts[1].size, ts[3].mean, ts[3].std)
    return None
