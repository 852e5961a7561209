"""Dataset primitives: ImageFolder scanning, download/extract helpers
(replaces torchvision.datasets usage in reference data/*.py)."""

from __future__ import annotations

import os
import pathlib
import tarfile
import urllib.request
import zipfile
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".webp", ".tif")


class Dataset:
    """Minimal map-style dataset protocol: __len__ + __getitem__."""

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int):
        raise NotImplementedError


class ImageFolder(Dataset):
    """torchvision.datasets.ImageFolder equivalent: class-per-subdirectory
    layout, sorted class names -> indices (reference data/imagenette.py:130)."""

    def __init__(self, root, transform: Optional[Callable] = None,
                 target_transform: Optional[Callable] = None,
                 seed: int = 0):
        self.root = str(root)
        self.transform = transform
        self.target_transform = target_transform
        self.classes = sorted(
            d.name for d in os.scandir(self.root) if d.is_dir()
        )
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: List[Tuple[str, int]] = []
        for cls in self.classes:
            cdir = os.path.join(self.root, cls)
            for dirpath, _, files in sorted(os.walk(cdir)):
                for fname in sorted(files):
                    if fname.lower().endswith(IMG_EXTENSIONS):
                        self.samples.append(
                            (os.path.join(dirpath, fname), self.class_to_idx[cls])
                        )
        if not self.samples:
            raise RuntimeError(f"No images found under {self.root}")
        self._rng = np.random.default_rng(seed)
        self._native_spec = None  # resolved lazily; False = unavailable

    def __len__(self):
        return len(self.samples)

    def _native_decode(self, path):
        """C++ decode+transform fast path when the transform is the standard
        eval recipe and the native library built (peekvit_tpu/native)."""
        if self._native_spec is False:
            return None
        if self._native_spec is None:
            from peekvit_tpu import native
            from peekvit_tpu.data.transforms import native_spec

            spec = native_spec(self.transform)
            self._native_spec = spec if (spec and native.available()) else False
            if self._native_spec is False:
                return None
        from peekvit_tpu import native

        resize, size, mean, std = self._native_spec
        with open(path, "rb") as f:
            return native.decode_transform(f.read(), resize, size, mean, std)

    def native_batch(self, indices, num_threads: int = 8):
        """Decode+transform a whole batch in C++ worker threads (one GIL
        release for the batch — peekvit_tpu/native pv_load_batch). Returns
        (batch, labels) or None when the fast path is unavailable; files the
        native decoder rejects fall back to PIL individually."""
        if self._native_spec is False:
            return None
        # resolve the spec lazily (shared with _native_decode)
        if self._native_spec is None:
            self._native_decode(self.samples[0][0])
        if self._native_spec is False:
            return None
        from peekvit_tpu import native

        resize, size, mean, std = self._native_spec
        paths = [self.samples[int(i)][0] for i in indices]
        batch, ok = native.load_batch(paths, resize, size, mean, std,
                                      num_threads=num_threads)
        if batch is None:
            return None
        for j in np.nonzero(~ok)[0]:
            batch[j] = np.asarray(self[int(indices[j])][0], np.float32)
        labels = np.asarray(
            [self.samples[int(i)][1] for i in indices], np.int64
        )
        if self.target_transform:
            labels = np.asarray([self.target_transform(int(t)) for t in labels])
        return batch, labels

    def __getitem__(self, idx):
        path, target = self.samples[idx]
        sample = self._native_decode(path)
        if sample is None:
            with Image.open(path) as img:
                img = img.convert("RGB")
                sample = self.transform(img, self._rng) if _is_random(
                    self.transform) else (
                        self.transform(img) if self.transform else img)
        if self.target_transform:
            target = self.target_transform(target)
        return sample, target


def _is_random(t) -> bool:
    from peekvit_tpu.data.transforms import Compose

    if t is None:
        return False
    if isinstance(t, Compose):
        return True  # Compose threads the rng itself
    return getattr(t, "random", False)


class ArrayDataset(Dataset):
    """In-memory (data, labels) pairs with optional per-sample transform."""

    def __init__(self, data: np.ndarray, labels: np.ndarray,
                 transform: Optional[Callable] = None):
        assert len(data) == len(labels)
        self.data, self.labels = data, labels
        self.transform = transform

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        x, y = self.data[idx], self.labels[idx]
        if self.transform:
            x = self.transform(x)
        return x, y


class TransformedSubset(Dataset):
    def __init__(self, base: Dataset, indices: Sequence[int]):
        self.base, self.indices = base, list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.base[self.indices[idx]]


# ------------------------------------------------------------ download utils


def download_url(url: str, dest: str) -> str:
    """Download with a clear no-egress error message (this image has no
    network; datasets must be staged locally)."""
    dest_path = pathlib.Path(dest)
    if dest_path.exists():
        return str(dest_path)
    dest_path.parent.mkdir(parents=True, exist_ok=True)
    tmp = str(dest_path) + ".part"
    try:
        urllib.request.urlretrieve(url, tmp)  # noqa: S310
        os.replace(tmp, dest_path)
    except Exception as e:  # zero-egress environment
        if os.path.exists(tmp):
            os.remove(tmp)
        raise RuntimeError(
            f"Could not download {url} -> {dest}: {e}. "
            "This environment has no network egress; stage the archive at "
            f"{dest} manually, or use dataset=synthetic."
        ) from e
    return str(dest_path)


def extract_archive(archive: str, dest_dir: str) -> None:
    os.makedirs(dest_dir, exist_ok=True)
    if archive.endswith((".tgz", ".tar.gz", ".tar")):
        with tarfile.open(archive) as f:
            f.extractall(path=dest_dir)  # noqa: S202
    elif archive.endswith(".zip"):
        with zipfile.ZipFile(archive) as f:
            f.extractall(path=dest_dir)  # noqa: S202
    else:
        raise ValueError(f"Unknown archive format: {archive}")
