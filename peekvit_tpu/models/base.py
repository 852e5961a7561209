"""Model wrapper: pairs a linen module with params and run-state.

The reference drives models through mutable-module APIs (``model.set_budget``,
``noise_module.set_value``, attribute side channels). Under jit those must be
traced operands, so the functional core is::

    logits, aux = model.module.apply({'params': params}, x,
                                     train=..., budget=..., noise_value=...,
                                     rngs=...)

:class:`Model` layers the reference's OO surface on top for eval scripts and
notebooks: ``set_budget``/``set_noise`` store scalars that are fed as traced
operands at call time — re-setting them never recompiles.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

PyTree = Any


@dataclasses.dataclass
class Model:
    """A built model: module + params + self-describing metadata.

    ``model_class``/``model_args``/``noise_args`` mirror the reference's
    self-describing checkpoint contract (utils/utils.py:198-213).
    """

    module: Any
    params: PyTree
    model_class: str
    model_args: dict
    noise_args: Optional[dict] = None
    current_budget: Optional[float] = None
    current_noise: Optional[float] = None
    state: dict = dataclasses.field(default_factory=dict)  # e.g. batch_stats
    _jitted: Any = dataclasses.field(default=None, repr=False)

    # ---- capability surface (replaces hasattr duck-typing) ----
    @property
    def accepts_budget(self) -> bool:
        return bool(getattr(self.module, "accepts_budget", False))

    @property
    def has_noise(self) -> bool:
        return self.noise_args is not None and getattr(self.module, "noise_layer", None) is not None

    def set_budget(self, budget) -> None:
        if not self.accepts_budget:
            raise AttributeError(f"{self.model_class} does not accept a budget")
        self.current_budget = budget

    def set_noise(self, value: float) -> None:
        """Reference NoiseBlock.set_value equivalent (blocks.py:182-186)."""
        self.current_noise = value

    def enable_ranking(self, sort_tokens=True) -> None:
        """RankPCT enable_ranking (reference rankpct.py:330-345): toggles
        per-block ranking. Rebuilds the module config (one recompile)."""
        if not hasattr(self.module, "ranking_enabled"):
            raise AttributeError(f"{self.model_class} does not support enable_ranking")
        n = self.module.num_layers
        if isinstance(sort_tokens, bool):
            sort_tokens = [sort_tokens] * n
        self.module = dataclasses.replace(
            self.module, ranking_enabled=tuple(bool(s) for s in sort_tokens)
        )
        self._jitted = None

    # ---- functional forward ----
    def apply_fn(self):
        """The pure forward fn for jit/grad: (params, x, budget, noise, rngs).

        Captures non-param collections (batch_stats) statically; training
        loops that must *update* batch_stats call module.apply directly with
        ``mutable=['batch_stats']``.
        """
        module = self.module
        state = self.state
        # modules with an explicit noise_rng param receive the RAW
        # rngs["noise"] key (not the path-folded make_rng derivation), so
        # the fused engines can reproduce linen noise bitwise
        import inspect

        takes_noise_rng = "noise_rng" in inspect.signature(
            type(module).__call__).parameters

        def fn(params, x, budget, noise_value, rngs, train=False):
            kw = {}
            if takes_noise_rng and rngs and "noise" in rngs:
                kw["noise_rng"] = rngs["noise"]
            return module.apply(
                {"params": params, **state},
                x,
                train=train,
                budget=budget,
                noise_value=noise_value,
                rngs=rngs,
                **kw,
            )

        return fn

    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        rngs: Optional[dict] = None,
        budget=None,
        noise_value=None,
    ):
        """Eager convenience forward using the stored budget/noise state.

        jit-compiled once; budget/noise are traced operands so sweeps over
        ``set_budget``/``set_noise`` values reuse the compilation.
        """
        if budget is None:
            budget = self.current_budget
        if noise_value is None:
            noise_value = self.current_noise
        if rngs is None:
            rngs = {}
        rngs = dict(rngs)
        # stochastic collections the models may pull from at eval time
        for name in ("noise",):
            rngs.setdefault(name, jax.random.key(0))
        if train:
            for name in ("dropout", "gumbel", "budget"):
                rngs.setdefault(name, jax.random.key(0))

        needs_budget = self.accepts_budget and budget is not None
        b = jnp.float32(budget) if needs_budget else None
        nv = jnp.float32(noise_value) if noise_value is not None else None

        if self._jitted is None:
            self._jitted = {}
        key = (train, b is not None, nv is not None)
        if key not in self._jitted:
            fn = self.apply_fn()
            self._jitted[key] = jax.jit(
                lambda p, x, bb, nn_, r: fn(p, x, bb, nn_, r, train=train)
            )
        return self._jitted[key](self.params, x, b, nv, rngs)
