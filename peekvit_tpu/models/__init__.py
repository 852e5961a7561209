"""Model zoo (L3): ViT family with token-budget sparsification.

``build_model`` + ``MODELS_MAP`` mirror the reference registry contract
(models/models.py); every model forward returns ``(logits_or_tuple, aux)``
with masks/gating/halting state in the explicit aux pytree.
"""

from peekvit_tpu.models.base import Model
from peekvit_tpu.models.registry import MODELS_MAP, build_model, init_rngs, resolve_model_class

__all__ = ["Model", "MODELS_MAP", "build_model", "init_rngs", "resolve_model_class"]
