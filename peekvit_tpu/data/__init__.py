"""Input pipeline (L1 of the layer map; reference data/).

Host-side decode/augment on PIL+numpy (torchvision isn't in the image and a
TPU host shouldn't depend on torch anyway), batched by a threaded
:class:`~peekvit_tpu.data.loader.DataLoader`, fed to the chip through
``prefetch_to_device`` double-buffering.

Every dataset wrapper keeps the reference duck-typed surface:
``.train_dataset`` / ``.val_dataset`` / ``.denormalize_transform`` /
class-name lists (reference data/imagenette.py:43-56).

Arrays are NHWC float32 — the TPU-native image layout (conv lowers to MXU
without the NCHW transpose torch inserts).
"""

from peekvit_tpu.data.loader import DataLoader, prefetch_to_device
from peekvit_tpu.data.synthetic import Synthetic

__all__ = ["DataLoader", "prefetch_to_device", "Synthetic"]
