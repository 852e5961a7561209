"""Model registry + build_model (reference: models/models.py).

Checkpoint/metadata contract preserved: ``build_model(model_class,
model_args, noise_args, remove_layers)`` with the same alias map. Classes are
resolved lazily so partially-built trees still import.

Deliberately omitted from the reference inventory (SURVEY.md §7.18):
``batchvit.py`` (an unimported duplicate of the plain ViT) and
``topology.add_class_tokens`` (NotImplementedError stub in the reference).
"""

from __future__ import annotations

import importlib
from typing import Optional

import jax
import jax.numpy as jnp

from peekvit_tpu.models.base import Model

# name -> (module path, class name). Aliases mirror reference models.py:15-46.
_REGISTRY: dict[str, tuple[str, str]] = {}


def _register(aliases, module_path, class_name):
    for a in aliases:
        _REGISTRY[a] = (module_path, class_name)


_register(
    ["visiontransformer", "VisionTransformer", "vit"],
    "peekvit_tpu.models.vit",
    "VisionTransformer",
)
_register(
    ["residualvisiontransformer", "ResidualVisionTransformer", "residualvit"],
    "peekvit_tpu.models.residualvit",
    "ResidualVisionTransformer",
)
_register(
    ["visiontransformermoe", "VisionTransformerMoE", "vitmoe", "moevit",
     # reference configs/model/moevit.yaml targets this (nonexistent) name;
     # we accept it so those configs work (SURVEY.md §7.5)
     "MoEVisionTransformer"],
    "peekvit_tpu.models.moevit",
    "VisionTransformerMoE",
)
_register(
    ["EEResidualVisionTransformer", "eeResidualVisionTransformer", "eeResidualvit",
     "eeresidualvit"],
    "peekvit_tpu.models.eeresidualvit",
    "EEResidualVisionTransformer",
)
_register(
    ["ResidualVisionTransformerWithDecoder", "encdecresidualvit"],
    "peekvit_tpu.models.encdecresidualvit",
    "ResidualVisionTransformerWithDecoder",
)
_register(
    ["RankingVisionTransformer", "RankVisionTransformer", "rankvit"],
    "peekvit_tpu.models.rankvit",
    "RankVisionTransformer",
)
_register(
    ["PointCloudTransformer", "pointcloudtransformer", "pct"],
    "peekvit_tpu.models.pct",
    "PointCloudTransformer",
)
_register(
    ["RankPointCloudTransformer", "rankpointcloudtransformer", "rankpct"],
    "peekvit_tpu.models.rankpct",
    "RankPointCloudTransformer",
)
_register(
    ["AdaptiveVisionTransformer", "adavit"],
    "peekvit_tpu.models.adavit",
    "AdaptiveVisionTransformer",
)
_register(
    ["MAEVisionTransformer", "maevit"],
    "peekvit_tpu.models.maevit",
    "MAEVisionTransformer",
)


def resolve_model_class(model_class: str):
    if model_class not in _REGISTRY:
        raise ValueError(
            f"Unknown model class {model_class}. Available: {sorted(_REGISTRY)}"
        )
    module_path, class_name = _REGISTRY[model_class]
    return getattr(importlib.import_module(module_path), class_name)


def MODELS_MAP():
    """Materialized name->class map (reference API parity)."""
    return {name: resolve_model_class(name) for name in _REGISTRY}


def _dummy_input(module) -> jax.Array:
    """A minimal batch-1 input matching the module's expected layout."""
    if hasattr(module, "num_points"):  # point-cloud models
        return jnp.zeros((1, module.num_points, 3), jnp.float32)
    return jnp.zeros((1, module.image_size, module.image_size, 3), jnp.float32)


def init_rngs(seed: int = 0) -> dict:
    k = jax.random.key(seed)
    names = ("params", "dropout", "gumbel", "budget", "noise", "shuffle")
    keys = jax.random.split(k, len(names))
    return dict(zip(names, keys))


def build_model(
    model_class: str,
    model_args: dict,
    noise_args: Optional[dict] = None,
    remove_layers: Optional[list] = None,
    seed: int = 0,
    params=None,
) -> Model:
    """Build (and init) a model. Mirrors reference models.py:52-87.

    - pops ``torch_pretrained_weights`` / ``timm_pretrained_weights`` from
      model_args and loads them through the adapters;
    - optional layer removal surgery;
    - optional noise insertion (as module config — noise magnitude is a
      traced call operand, initially the 0.0 no-noise sentinel).
    """
    model_args = dict(model_args)
    model_args.pop("_target_", None)
    torch_w = model_args.pop("torch_pretrained_weights", None)
    timm_w = model_args.pop("timm_pretrained_weights", None)
    ctor_args = dict(model_args)

    noise_kwargs = {}
    if noise_args:
        na = dict(noise_args)
        noise_kwargs = {
            "noise_layer": na.get("layer"),
            "noise_type": na.get("noise_type", "gaussian"),
        }

    cls = resolve_model_class(model_class)
    module = cls(**ctor_args, **noise_kwargs)

    state = {}
    if params is None:
        dummy = _dummy_input(module)
        budget = 1.0 if getattr(module, "accepts_budget", False) else None
        variables = module.init(
            init_rngs(seed), dummy, train=False, budget=budget, noise_value=None
        )
        variables = dict(variables)
        params = variables.pop("params")
        state = variables  # e.g. batch_stats for PCT models

    model = Model(
        module=module,
        params=params,
        model_class=model_class,
        model_args=model_args,
        noise_args=dict(noise_args) if noise_args else None,
        state=state,
    )
    if model.has_noise:
        model.set_noise(0.0)  # reference models.py:80-84 resets noise to 0.0

    if torch_w is not None or timm_w is not None:
        from peekvit_tpu.models import adapters

        model = adapters.load_pretrained(model, torch_w, timm_w)

    if remove_layers:
        from peekvit_tpu.models import topology

        model = topology.remove_layers_and_stitch(model, remove_layers)

    return model
