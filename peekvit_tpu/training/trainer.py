"""Jitted train/eval harness (reference train/train.py:97-161 inner loops).

TPU-native structure:
- ONE compiled train step for the whole run: budget and noise are traced
  scalar operands, the lr lives in the optax opt-state (optim.py), and the
  per-step PRNG is derived in-graph with ``jax.random.fold_in`` — nothing
  recompiles across epochs, budget sweeps, or lr schedule steps.
- mesh-first: batches are sharded over the ``data`` axis, params replicated
  (or TP-sharded); XLA inserts the gradient all-reduce over ICI
  (parallel/mesh.py). The same code path runs 1..N chips.
- models that emit early-exit lists / reconstruction tuples are handled by
  ``output_format`` (replacing the reference's isinstance checks,
  train_img_reconstruction.py:97-108).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from peekvit_tpu.models.base import Model
from peekvit_tpu.training.optim import (
    OptimizerSpec,
    SchedulerSpec,
    get_learning_rate,
    set_learning_rate,
)
from peekvit_tpu.utils.losses import LossCompose

# params that stay trainable when train_backbone=False
# (reference train.py:99-100 -> topology.py:128-157)
FINETUNE_KEYWORDS = ("gate", "class", "head", "threshold", "budget")


def param_filter_mask(params, keywords=FINETUNE_KEYWORDS):
    """True = trainable. Matches the reference's substring filter over
    parameter names (topology.train_only_these_params)."""

    def visit(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path).lower()
        return any(kw in name for kw in keywords)

    return jax.tree_util.tree_map_with_path(visit, params)


def _main_logits(out, output_format: Optional[str]):
    if output_format == "early_exits":
        return out[-1]
    if output_format in ("logits_recon_mask", "logits_recon"):
        return out[0]
    return out


@dataclasses.dataclass
class Trainer:
    """Owns the compiled step fns + host-side schedule/checkpoint logic."""

    model: Model
    optimizer: OptimizerSpec
    scheduler: Optional[SchedulerSpec] = None
    main_criterion: Optional[Callable] = None
    loss_compose: Optional[LossCompose] = None
    clip_grad_norm: Optional[float] = None
    train_backbone: bool = True
    reconstruction_weight: float = 0.0  # masked-pixel MSE (recon trainer)
    ee_weights: Optional[list] = None  # early-exit head weights (mean if None)
    seed: int = 0
    mesh: Any = None
    # fused Pallas train path (training/fused.py): 'auto' uses it for plain
    # ViTs with no dropout/noise/regularizers on the TPU backend
    fused: Any = "auto"
    # flush per-batch log records every N steps: metrics stay on device
    # between flushes (ONE host fetch per flush — through the axon tunnel a
    # blocking fetch per batch stalls the dispatch pipeline)
    log_every: int = 50
    # >1: pipeline the encoder blocks over a 'stage' mesh axis (GPipe
    # microbatching, parallel/pipeline.py) — plain-ViT family, dropout=0
    pipeline_stages: int = 0
    pipeline_microbatches: int = 0  # default: == pipeline_stages
    # >1: shard the TOKEN axis over that many devices (Megatron-SP,
    # parallel/sequence.py) — plain-ViT family, dropout=0
    sequence_parallel_devices: int = 0
    # per-stage math for the pipeline train step: 'auto' uses the MERGED
    # Pallas layer VJP (bf16) on TPU for plain ViTs whose weights +
    # grad accumulators fit VMEM, linen XLA math otherwise; 'pallas'/'xla'
    # force it (pallas on CPU runs the interpreter — tests only)
    parallel_kernels: str = "auto"
    # >1: average gradients over k train_step calls before the optimizer
    # applies (optax.MultiSteps) — an effective batch of k*train_batch_size
    # on a fixed per-step HBM budget. Composes with every step builder
    # (fused/pipeline/SP/linen) because they all route through tx.update;
    # grad clipping sees the AVERAGED gradient, matching a true big batch.
    grad_accumulation: int = 1
    # ZeRO-1: shard the optimizer state (adam m/v, MultiSteps accumulators)
    # over the mesh's data axis instead of replicating it — each chip
    # holds 1/n_data of the state and updates only its shard; XLA derives
    # the update-shard + all-gather schedule from the shardings alone.
    # Requires mesh=; composes with the dp linen AND dp-fused steps (the
    # optimizer update runs outside the fused shard_map).
    zero_sharded_optimizer: bool = False
    # FSDP / ZeRO-3: ALSO shard the params themselves over the data axis
    # (parallel.fsdp_param_sharding) — 1/n_data of the model per chip; the
    # forward/backward all-gathers each weight just-in-time and grads come
    # back reduce-scattered, all derived by XLA from the shardings.
    # Implies a sharded optimizer state. Requires mesh=; runs the LINEN
    # step (the Pallas fused path's shard_map needs replicated params),
    # so ``fused`` is coerced off.
    fsdp_sharded_params: bool = False
    # Quantization-aware training (ops/fake_quant.py): the linen forward's
    # qkv/out-proj/fc1/fc2 matmuls see int8-grid fake-quantized operands
    # (the EXACT engine grid: per-column weights, per-token dynamic
    # activations) with straight-through gradients, so the fine-tuned
    # weights tolerate the rounding the int8 serving engine later commits
    # for real. Runs the linen step (the Pallas fused/parallel kernels
    # carry no fake-quant hooks — ``fused`` is coerced off); the eval step
    # fake-quantizes too, so per-budget val accuracy during QAT tracks the
    # metric that matters: the quantized model's.
    # ``qat='static'`` trains against the STATIC-CAPS engine grid instead
    # (fixed scale cap/127 with saturation per quantized site —
    # quant_blocks._quant_rows(x, cap), the engine's
    # ``calib_static_caps=True`` mode) and requires ``qat_caps``: the
    # calibration tuple from inference.collect_activation_caps (or the
    # residual stats collector), one ((attn_ln, attn_out), (mlp_ln,
    # mlp_h)) per encoder layer. Clipped-STE gradients: zero where the
    # engine would saturate.
    qat: bool | str = False
    qat_caps: tuple | None = None
    # SmoothQuant equalization vectors (one (s1, s2) pair per encoder
    # layer, from inference.collect_qat_calibration): the LN-output sites
    # fake-quantize (x/s, w*s) so training sees the SMOOTHED grid the
    # engine's default calib_images= mode serves (exact in fp for the
    # matmul product). Pair with qat='static' and caps collected on the
    # smoothed model — collect_qat_calibration returns the matched pair.
    qat_smoothing: tuple | None = None
    # Tensor-parallel TRAINING: shard the attention/MLP weights over the
    # mesh's ``model`` axis by the Megatron column/row rules
    # (parallel.shard_params(tensor_parallel=True); MoE expert stacks
    # shard their leading expert axis — expert parallelism). XLA's
    # partitioner inserts the per-block psums from the shardings alone;
    # composes with dp over the ``data`` axis of the same mesh. Runs the
    # linen step (the Pallas fused path's shard_map needs replicated
    # params — ``fused`` is coerced off).
    tensor_parallel: bool = False
    # Per-block jax.checkpoint on the fused plain-ViT train path (the
    # OOM ladder's first fallback, benchmarks/train_scale.py: backward
    # recomputes each block instead of saving its intermediates —
    # ViT-H/14 single-chip training fits only with it). Costs ~25% step
    # time at ViT-B (train_step.json split+remat row); prefer
    # grad_accumulation when activations are not the binding constraint.
    remat: bool = False

    def __post_init__(self):
        if self.main_criterion is None:
            from peekvit_tpu.training.optim import CrossEntropyLoss

            self.main_criterion = CrossEntropyLoss()
        mask = None
        if not self.train_backbone:
            mask = param_filter_mask(self.model.params)
        tx = self.optimizer.build(param_mask=mask)
        if self.clip_grad_norm:
            tx = optax.chain(optax.clip_by_global_norm(self.clip_grad_norm), tx)
        if self.grad_accumulation and self.grad_accumulation > 1:
            # MultiStepsState is a NamedTuple, so the lr stays reachable for
            # the per-epoch scheduler write (optim._walk_opt_state recurses
            # through tuples into inner_opt_state).
            tx = optax.MultiSteps(tx, every_k_schedule=self.grad_accumulation)
        self.tx = tx
        self.opt_state = tx.init(self.model.params)
        self._base_key = jax.random.key(self.seed)
        self._train_step = None
        self._eval_step = None
        self.output_format = getattr(self.model.module, "output_format", None)
        self._opt_shardings = None
        self._param_shardings = None
        if self.qat:
            if self.qat not in (True, "dynamic", "static"):
                raise ValueError(
                    f"qat={self.qat!r}: expected False, True/'dynamic', "
                    "or 'static'")
            if self.qat == "static" and self.qat_caps is None:
                raise ValueError(
                    "qat='static' requires qat_caps= (the per-layer static "
                    "calibration tuple from "
                    "inference.collect_activation_caps)")
            if (self.qat_smoothing is not None and self.qat_caps is not None
                    and len(self.qat_smoothing) != len(self.qat_caps)):
                raise ValueError(
                    f"qat_smoothing covers {len(self.qat_smoothing)} layers "
                    f"but qat_caps {len(self.qat_caps)} — calibrate both "
                    "together (inference.collect_qat_calibration)")
            if (self.pipeline_stages and self.pipeline_stages > 1) or (
                    self.sequence_parallel_devices
                    and self.sequence_parallel_devices > 1):
                raise NotImplementedError(
                    "qat=True runs the (dp/FSDP) linen step; the pipeline/"
                    "sequence-parallel stage math carries no fake-quant "
                    "hooks")
            # fake-quant lives in the linen ops (ops/attention.py,
            # ops/mlp.py), not in the Pallas custom-VJP kernels
            self.fused = False
        if self.tensor_parallel:
            from peekvit_tpu.parallel import MODEL_AXIS

            if self.mesh is None or self.mesh.shape.get(MODEL_AXIS, 1) < 2:
                raise ValueError(
                    "tensor_parallel=True requires mesh= with a "
                    f"'{MODEL_AXIS}' axis of size >= 2 "
                    "(parallel.make_mesh(n_model=...))")
            if self.fsdp_sharded_params:
                raise NotImplementedError(
                    "tensor_parallel and fsdp_sharded_params both own the "
                    "param placement; pick one")
            if (self.pipeline_stages and self.pipeline_stages > 1) or (
                    self.sequence_parallel_devices
                    and self.sequence_parallel_devices > 1):
                raise NotImplementedError(
                    "tensor_parallel composes with the dp linen step; "
                    "pipeline/sequence-parallel modes own their placement")
            # Megatron sharding is GSPMD-derived in the linen step; the
            # Pallas fused path's shard_map needs replicated params.
            self.fused = False
        if self.fsdp_sharded_params:
            if self.mesh is None:
                raise ValueError(
                    "fsdp_sharded_params requires mesh= (params shard over "
                    "the mesh's data axis)")
            if (self.pipeline_stages and self.pipeline_stages > 1) or (
                    self.sequence_parallel_devices
                    and self.sequence_parallel_devices > 1):
                raise NotImplementedError(
                    "fsdp_sharded_params composes with the dp linen step; "
                    "pipeline/sequence-parallel modes own their param "
                    "placement")
            # The fused path's shard_map replicates params per data shard —
            # incompatible with FSDP's whole point; force the linen step,
            # where XLA derives the gather/reduce-scatter schedule.
            self.fused = False
        if self.mesh is not None:
            from peekvit_tpu.parallel import (fsdp_param_sharding,
                                              replicated_sharding,
                                              shard_params,
                                              zero1_optimizer_sharding)

            if self.fsdp_sharded_params:
                self._param_shardings = fsdp_param_sharding(
                    self.model.params, self.mesh)
                self.model.params = jax.device_put(
                    self.model.params, self._param_shardings)
            else:
                self.model.params = shard_params(
                    self.model.params, self.mesh,
                    tensor_parallel=self.tensor_parallel)
            if self.zero_sharded_optimizer or self.fsdp_sharded_params:
                self._opt_shardings = zero1_optimizer_sharding(
                    self.opt_state, self.mesh)
                self.opt_state = jax.device_put(
                    self.opt_state, self._opt_shardings)
            elif self.tensor_parallel:
                # re-init from the placed params: param-shaped moments
                # (adam m/v, accumulators) inherit the Megatron shardings
                self.opt_state = self.tx.init(self.model.params)
            else:
                self.opt_state = jax.device_put(
                    self.opt_state, replicated_sharding(self.mesh)
                )
        elif self.zero_sharded_optimizer:
            raise ValueError(
                "zero_sharded_optimizer requires mesh= (the optimizer "
                "state shards over the mesh's data axis)")

    # ------------------------------------------------------------ train step

    def _fused_kind(self):
        """'vit' | 'residual' | None — which fused train path applies."""
        module = self.model.module
        if self.fused in (False, "never"):
            return None
        if self.fused == "auto" and jax.default_backend() != "tpu":
            return None
        if (
            getattr(module, "dropout", 0.0) != 0.0
            or getattr(module, "attention_dropout", 0.0) != 0.0
            or getattr(module, "noise_layer", None) is not None
            or self.output_format is not None
        ):
            return None
        name = type(module).__name__
        # RankViT trains exactly as a plain ViT (ranking is a train-free
        # eval-time mechanism, reference rankvit.py:85-88), so it shares the
        # fused path; its param tree is block-identical.
        if name in ("VisionTransformer", "RankVisionTransformer"):
            if self.loss_compose and self.loss_compose.additional_losses:
                return None  # plain ViT emits no aux for regularizers
            return "vit"
        if name == "ResidualVisionTransformer":
            layers = module.residual_layers or (
                ["attention+mlp"] * module.num_layers)
            if (set(layers) == {"attention+mlp"}
                    and module.gate_type == "sigmoid"
                    and not module.add_input
                    and module.add_budget_token):
                return "residual"
        return None

    def _fused_eligible(self) -> bool:
        return self._fused_kind() is not None

    def _build_train_step(self):
        self._train_kind = "linen"
        if self.remat and self._fused_kind() != "vit":
            raise NotImplementedError(
                "remat=True is a fused plain-ViT train-path knob "
                "(training/fused.vit_forward_trainable jax.checkpoint per "
                "block); for other paths trade memory with "
                "grad_accumulation or a smaller batch")
        if self.pipeline_stages and self.pipeline_stages > 1:
            self._train_kind = "pipeline"
            return self._build_pipeline_train_step()
        if self.sequence_parallel_devices and self.sequence_parallel_devices > 1:
            self._train_kind = "sp"
            return self._build_sp_train_step()
        if self._fused_eligible():
            self._train_kind = f"fused_{self._fused_kind()}"
            return self._build_fused_train_step()
        apply_fn = self.model.apply_fn()
        criterion = self.main_criterion
        compose = self.loss_compose
        out_fmt = self.output_format
        tx = self.tx
        recon_w = self.reconstruction_weight
        ee_w = self.ee_weights
        opt_shardings = self._opt_shardings
        param_shardings = self._param_shardings

        qat = self.qat
        qat_caps = self.qat_caps if self.qat == "static" else None
        qat_smoothing = self.qat_smoothing

        def loss_fn(params, x, y, budget, noise_value, rngs):
            from peekvit_tpu.ops.fake_quant import fake_quant

            # trace-time switch: no-op when off
            with fake_quant(bool(qat), caps=qat_caps,
                            smoothing=qat_smoothing):
                out, aux = apply_fn(params, x, budget, noise_value, rngs,
                                    train=True)
            metrics = {}
            if out_fmt == "early_exits":
                # mean (or weighted) CE over every exit head
                ces = jnp.stack([criterion(o, y) for o in out])
                w = (
                    jnp.asarray(ee_w, jnp.float32) / sum(ee_w)
                    if ee_w
                    else jnp.full((len(out),), 1.0 / len(out))
                )
                ce = jnp.sum(ces * w)
            else:
                ce = criterion(_main_logits(out, out_fmt), y)
            total = ce
            metrics["classification_loss"] = ce
            if out_fmt == "logits_recon_mask" and recon_w:
                _, recon, rmask = out
                rec = jnp.mean(((x - recon) ** 2) * rmask)
                metrics["reconstruction_loss"] = rec
                total = total + recon_w * rec
            if compose is not None and compose.additional_losses:
                # per-sample budgets: regularize against the batch mean
                b = aux.get("current_budget", budget)
                if b is not None and getattr(b, "ndim", 0) > 0:
                    b = jnp.mean(b)
                d, reg = compose.compute(aux, budget=b)
                metrics.update(d)
                total = total + reg
            metrics["total_loss"] = total
            return total, metrics

        def step(params, opt_state, x, y, budget, noise_value, step_idx):
            key = jax.random.fold_in(self._base_key, step_idx)
            names = ("dropout", "gumbel", "budget", "noise", "shuffle")
            rngs = dict(zip(names, jax.random.split(key, len(names))))
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x, y, budget, noise_value, rngs
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if opt_shardings is not None:  # pin the ZeRO-1 layout step-over-step
                opt_state = jax.tree.map(jax.lax.with_sharding_constraint,
                                         opt_state, opt_shardings)
            if param_shardings is not None:  # pin the FSDP param layout
                params = jax.tree.map(jax.lax.with_sharding_constraint,
                                      params, param_shardings)
            return params, opt_state, metrics

        return jax.jit(step, donate_argnums=(0, 1))

    def _build_pipeline_train_step(self):
        """Pipeline-parallel train step: encoder blocks sharded into
        ``pipeline_stages`` contiguous groups over a 'stage' mesh axis,
        jax.grad through the GPipe ppermute schedule
        (parallel/pipeline.pipelined_vit_forward). Param/grad parity vs the
        single-device step is pinned in tests/test_parallel.py."""
        import functools

        import numpy as np
        from jax.sharding import Mesh

        from peekvit_tpu.parallel.pipeline import (
            STAGE_AXIS,
            pipelined_vit_forward,
        )

        module = self._check_deterministic_parallel_model("pipeline_stages")
        s = int(self.pipeline_stages)
        if module.num_layers % s:
            raise ValueError(
                f"num_layers={module.num_layers} not divisible into "
                f"{s} pipeline stages")

        data_axis = None
        if self.mesh is not None and STAGE_AXIS in self.mesh.axis_names:
            mesh = self.mesh
            if mesh.shape[STAGE_AXIS] != s:
                raise ValueError(
                    f"mesh 'stage' axis has {mesh.shape[STAGE_AXIS]} "
                    f"devices but pipeline_stages={s}")
            from peekvit_tpu.parallel.mesh import DATA_AXIS

            # dp x pp composition: batch sharded over 'data', pipeline over
            # 'stage'; grads all-reduce over data via the shard_map
            # transpose (parity-tested on a (2, 4) virtual mesh)
            if DATA_AXIS in mesh.axis_names and mesh.shape[DATA_AXIS] > 1:
                data_axis = DATA_AXIS
        else:
            devices = jax.devices()
            if len(devices) < s:
                raise ValueError(
                    f"pipeline_stages={s} needs {s} devices, "
                    f"have {len(devices)}")
            mesh = Mesh(np.asarray(devices[:s]), (STAGE_AXIS,))
        m = int(self.pipeline_microbatches) or s
        if m < 2 * s:
            import warnings

            from peekvit_tpu.parallel.pipeline import bubble_fraction

            warnings.warn(
                f"pipeline_microbatches={m} with pipeline_stages={s} idles "
                f"{bubble_fraction(s, m):.0%} of every stage (GPipe bubble "
                f"(S-1)/(M+S-1)); set pipeline_microbatches >= {2 * s} to "
                f"keep it under ~33%", stacklevel=2)

        if type(module).__name__ == "ResidualVisionTransformer":
            from peekvit_tpu.parallel.residual import (
                pipelined_residualvit_forward,
            )

            fwd = functools.partial(
                pipelined_residualvit_forward,
                mesh=mesh, num_microbatches=m,
                num_heads=module.num_heads, patch_size=module.patch_size,
                num_class_tokens=getattr(module, "num_class_tokens", 1),
                num_registers=getattr(module, "num_registers", 0),
                gate_temp=module.gate_temp, gate_bias=module.gate_bias,
                budget_token=module.add_budget_token,
                data_axis=data_axis,
            )
            return self._build_residual_parallel_step(fwd)

        criterion = self.main_criterion
        tx = self.tx
        kernels = self.parallel_kernels
        if kernels == "auto":
            from peekvit_tpu.training.fused import _train_layer_fusable

            on_tpu = jax.default_backend() == "tpu"
            kernels = "pallas" if on_tpu and _train_layer_fusable(
                module.hidden_dim, module.mlp_dim) else "xla"
        fwd = functools.partial(
            pipelined_vit_forward,
            mesh=mesh, num_microbatches=m,
            num_heads=module.num_heads, patch_size=module.patch_size,
            num_class_tokens=getattr(module, "num_class_tokens", 1),
            num_registers=getattr(module, "num_registers", 0),
            ln_eps=getattr(module, "ln_eps", 1e-5),
            data_axis=data_axis,
            kernels=kernels,
            compute_dtype=(jnp.bfloat16 if jax.default_backend() == "tpu"
                           else jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )

        def step(params, opt_state, x, y, budget, noise_value, step_idx):
            def loss_fn(p):
                ce = criterion(fwd(p, x), y)
                return ce, {"classification_loss": ce, "total_loss": ce}

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, metrics

        return jax.jit(step, donate_argnums=(0, 1))

    def _check_deterministic_parallel_model(self, what: str):
        module = self.model.module
        name = type(module).__name__
        if name == "ResidualVisionTransformer":
            # gated family (VERDICT r3 #4): aux flows through the parallel
            # schedules, so gate regularizers work — shipped-config mode
            layers = module.residual_layers or (
                ["attention+mlp"] * module.num_layers)
            if (set(layers) != {"attention+mlp"}
                    or module.gate_type != "sigmoid"
                    or module.add_input
                    or module.add_budget_token != "learnable"):
                raise NotImplementedError(
                    f"{what} supports ResidualViT in the shipped-config "
                    "mode: sigmoid gates, attention+mlp skip, "
                    "budget_token='learnable', add_input=False")
        elif name not in ("VisionTransformer", "RankVisionTransformer"):
            raise NotImplementedError(
                f"{what} applies to the plain-ViT family (uniform blocks) "
                f"and gated ResidualViT, not {name}")
        if (getattr(module, "dropout", 0.0) != 0.0
                or getattr(module, "attention_dropout", 0.0) != 0.0
                or getattr(module, "noise_layer", None) is not None):
            raise NotImplementedError(
                f"{what} training is deterministic: set dropout=0 and "
                "no noise_layer")
        if (name != "ResidualVisionTransformer" and self.loss_compose
                and self.loss_compose.additional_losses):
            raise NotImplementedError(
                f"plain ViT emits no aux for regularizers under {what}")
        return module

    def _build_residual_parallel_step(self, fwd):
        """Shared pipeline/SP train step for the gated ResidualViT:
        ``fwd(params, x, budget_vec) -> (logits, aux)``; CE + LossCompose
        over the stitched aux, exactly like the single-device step."""
        import optax as _optax

        from peekvit_tpu.training.fused import sample_budgets

        module = self.model.module
        criterion = self.main_criterion
        compose = self.loss_compose
        tx = self.tx
        base_key = self._base_key

        def step(params, opt_state, x, y, budget, noise_value, step_idx):
            if budget is None:  # per-sample sampling (train_budget off)
                key = jax.random.fold_in(base_key, step_idx)
                bvec = sample_budgets(module, key, x.shape[0])
            else:
                bvec = jnp.broadcast_to(
                    jnp.asarray(budget, jnp.float32), (x.shape[0],))

            def loss_fn(p):
                logits, aux = fwd(p, x, bvec)
                ce = criterion(logits, y)
                metrics = {"classification_loss": ce}
                total = ce
                if compose is not None and compose.additional_losses:
                    d, reg = compose.compute(aux, budget=jnp.mean(bvec))
                    metrics.update(d)
                    total = total + reg
                metrics["total_loss"] = total
                return total, metrics

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return _optax.apply_updates(params, updates), opt_state2, metrics

        return jax.jit(step, donate_argnums=(0, 1))

    def _build_sp_train_step(self):
        """Sequence-parallel train step: token axis sharded over a 'model'
        mesh axis, jax.grad through the per-block K/V all-gather
        (parallel/sequence.sequence_parallel_vit_forward). Parity vs the
        single-device step is pinned in tests/test_parallel.py."""
        import functools

        import numpy as np
        from jax.sharding import Mesh

        from peekvit_tpu.parallel.mesh import MODEL_AXIS
        from peekvit_tpu.parallel.sequence import (
            sequence_parallel_vit_forward,
        )

        module = self._check_deterministic_parallel_model(
            "sequence_parallel_devices")
        s = int(self.sequence_parallel_devices)
        data_axis = None
        if self.mesh is not None and MODEL_AXIS in self.mesh.axis_names:
            mesh = self.mesh
            if mesh.shape[MODEL_AXIS] != s:
                # mirror the pipeline path's mismatched-'stage' ValueError:
                # silently building a private mesh would drop the user's
                # intended dp composition (ADVICE r3)
                raise ValueError(
                    f"mesh 'model' axis has {mesh.shape[MODEL_AXIS]} "
                    f"devices but sequence_parallel_devices={s}")
            from peekvit_tpu.parallel.mesh import DATA_AXIS

            if DATA_AXIS in mesh.axis_names and mesh.shape[DATA_AXIS] > 1:
                data_axis = DATA_AXIS  # dp x sp composition
        else:
            devices = jax.devices()
            if len(devices) < s:
                raise ValueError(
                    f"sequence_parallel_devices={s} needs {s} devices, "
                    f"have {len(devices)}")
            mesh = Mesh(np.asarray(devices[:s]), (MODEL_AXIS,))

        if type(module).__name__ == "ResidualVisionTransformer":
            from peekvit_tpu.parallel.residual import (
                sequence_parallel_residualvit_forward,
            )

            fwd = functools.partial(
                sequence_parallel_residualvit_forward,
                mesh=mesh, num_heads=module.num_heads,
                patch_size=module.patch_size,
                num_class_tokens=getattr(module, "num_class_tokens", 1),
                num_registers=getattr(module, "num_registers", 0),
                gate_temp=module.gate_temp, gate_bias=module.gate_bias,
                budget_token=module.add_budget_token,
                data_axis=data_axis,
            )
            return self._build_residual_parallel_step(fwd)

        criterion = self.main_criterion
        tx = self.tx
        kernels = self.parallel_kernels
        if kernels == "auto":
            from peekvit_tpu.training.fused import _train_layer_fusable

            on_tpu = jax.default_backend() == "tpu"
            kernels = "pallas" if on_tpu and _train_layer_fusable(
                module.hidden_dim, module.mlp_dim) else "xla"
        fwd = functools.partial(
            sequence_parallel_vit_forward,
            mesh=mesh, num_heads=module.num_heads,
            patch_size=module.patch_size,
            num_class_tokens=getattr(module, "num_class_tokens", 1),
            num_registers=getattr(module, "num_registers", 0),
            ln_eps=getattr(module, "ln_eps", 1e-5),
            # RankViT budgets flow through the SP forward's cross-shard
            # ranking cascade (ADVICE r3: a silently-dropped budget would
            # train at full budget, diverging from the single-device step)
            rankvit_layers=tuple(getattr(module, "rankvit_layers", ()) or ()),
            data_axis=data_axis,
            kernels=kernels,
            compute_dtype=(jnp.bfloat16 if jax.default_backend() == "tpu"
                           else jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )

        def step(params, opt_state, x, y, budget, noise_value, step_idx):
            def loss_fn(p):
                ce = criterion(fwd(p, x, budget=budget), y)
                return ce, {"classification_loss": ce, "total_loss": ce}

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, metrics

        return jax.jit(step, donate_argnums=(0, 1))

    def _build_fused_train_step(self):
        """Pallas fused-attention train step (training/fused.py): plain-ViT
        and gated-ResidualViT variants, same signature/metrics as linen.

        With a multi-device ``mesh`` the forward runs under a shard_map
        over the data axis (Pallas calls are not GSPMD-partitionable, so
        dp must be explicit — same layout as the serving engine): batch
        sharded, params replicated in, and the gradient all-reduce over
        data falls out of the shard_map TRANSPOSE. The loss/optimizer
        stay outside the shard_map, so metrics, LossCompose regularizers
        (incl. batch-global terms) and ZeRO-1 optimizer sharding are
        exactly the single-device math."""
        import functools

        module = self.model.module
        criterion = self.main_criterion
        tx = self.tx
        interpret = jax.default_backend() != "tpu"
        kind = self._fused_kind()
        opt_shardings = self._opt_shardings

        dp = 0
        if self.mesh is not None:
            from peekvit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
            if (MODEL_AXIS in self.mesh.axis_names
                    and self.mesh.shape[MODEL_AXIS] > 1):
                raise NotImplementedError(
                    "the fused train path shards over 'data' only; for a "
                    "'model' axis use sequence_parallel_devices/"
                    "pipeline_stages or fused='never'")
            if DATA_AXIS in self.mesh.axis_names:
                dp = self.mesh.shape[DATA_AXIS]

        def _dp_shard_map(fn, n_batch_args):
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            from peekvit_tpu.parallel.mesh import DATA_AXIS
            specs = (P(),) + (P(DATA_AXIS),) * n_batch_args
            # check_rep/vma off: Pallas calls carry no replication/vma
            # metadata (same as the serving engine / SP / pipeline wraps)
            return shard_map(fn, mesh=self.mesh, in_specs=specs,
                             out_specs=P(DATA_AXIS), check_rep=False)

        if kind == "residual":
            from peekvit_tpu.training.fused import (
                residualvit_forward_trainable,
                sample_budgets,
            )

            compose = self.loss_compose
            base_key = self._base_key
            fwd = functools.partial(
                residualvit_forward_trainable,
                patch_size=module.patch_size,
                num_heads=module.num_heads,
                num_class_tokens=getattr(module, "num_class_tokens", 1),
                num_registers=getattr(module, "num_registers", 0),
                gate_temp=module.gate_temp,
                gate_bias=module.gate_bias,
                budget_token=module.add_budget_token,
                interpret=interpret,
            )
            if dp > 1:
                from peekvit_tpu.parallel.mesh import DATA_AXIS
                fwd = _dp_shard_map(
                    functools.partial(fwd, pmean_axis=DATA_AXIS), 2)

            def step(params, opt_state, x, y, budget, noise_value, step_idx):
                if budget is None:  # per-sample sampling (train_budget off)
                    key = jax.random.fold_in(base_key, step_idx)
                    bvec = sample_budgets(module, key, x.shape[0])
                else:
                    bvec = jnp.broadcast_to(
                        jnp.asarray(budget, jnp.float32), (x.shape[0],))

                def loss_fn(p):
                    logits, aux = fwd(p, x, bvec)
                    ce = criterion(logits, y)
                    metrics = {"classification_loss": ce}
                    total = ce
                    if compose is not None and compose.additional_losses:
                        d, reg = compose.compute(aux, budget=jnp.mean(bvec))
                        metrics.update(d)
                        total = total + reg
                    metrics["total_loss"] = total
                    return total, metrics

                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state2 = tx.update(grads, opt_state, params)
                if opt_shardings is not None:
                    opt_state2 = jax.tree.map(
                        jax.lax.with_sharding_constraint, opt_state2,
                        opt_shardings)
                return (optax.apply_updates(params, updates), opt_state2,
                        metrics)

            return jax.jit(step, donate_argnums=(0, 1),
                           static_argnums=())

        from peekvit_tpu.training.fused import vit_forward_trainable

        fwd = functools.partial(
            vit_forward_trainable,
            patch_size=module.patch_size,
            num_heads=module.num_heads,
            num_class_tokens=getattr(module, "num_class_tokens", 1),
            num_registers=getattr(module, "num_registers", 0),
            ln_eps=getattr(module, "ln_eps", 1e-5),
            remat=self.remat,
            interpret=interpret,
        )
        if dp > 1:
            fwd = _dp_shard_map(fwd, 1)

        def step(params, opt_state, x, y, budget, noise_value, step_idx):
            def loss_fn(p):
                logits = fwd(p, x)
                ce = criterion(logits, y)
                return ce, {"classification_loss": ce, "total_loss": ce}

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state2 = tx.update(grads, opt_state, params)
            if opt_shardings is not None:
                opt_state2 = jax.tree.map(jax.lax.with_sharding_constraint,
                                          opt_state2, opt_shardings)
            return optax.apply_updates(params, updates), opt_state2, metrics

        return jax.jit(step, donate_argnums=(0, 1))

    def train_step(self, x, y, budget=None, noise_value=None, step_idx=0):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if budget is not None and getattr(
                self.model.module, "rankvit_layers", None):
            # paths without a ranking cascade must not silently train a
            # RankViT at full budget (ADVICE r3); SP and linen honor it
            kind = getattr(self, "_train_kind", "linen")
            if kind == "pipeline":
                raise NotImplementedError(
                    "pipeline_stages training has no RankViT ranking path: "
                    "a train budget would be silently ignored (use "
                    "sequence_parallel_devices or the single-device step)")
            if kind == "fused_vit":
                raise NotImplementedError(
                    "the fused train path treats RankViT as a plain ViT: "
                    "pass fused='never' to train with an active ranking "
                    "budget")
        if self.mesh is not None and getattr(
                self, "_train_kind", "").startswith("fused"):
            from peekvit_tpu.parallel.mesh import DATA_AXIS

            if DATA_AXIS in self.mesh.axis_names:
                dp = self.mesh.shape[DATA_AXIS]
                if dp > 1 and x.shape[0] % dp:
                    # same guard as the dp serving engine: the shard_map
                    # error for an uneven split is opaque
                    raise ValueError(
                        f"batch size {x.shape[0]} must divide the mesh's "
                        f"'{DATA_AXIS}' axis size {dp} for the dp-fused "
                        "train step (shard_map splits the batch evenly)")
        b = None if budget is None else jnp.float32(budget)
        nv = None if noise_value is None else jnp.float32(noise_value)
        self.model.params, self.opt_state, metrics = self._train_step(
            self.model.params, self.opt_state, x, y, b, nv,
            jnp.int32(step_idx),
        )
        return metrics

    # ------------------------------------------------------------- eval step

    def _build_eval_step(self):
        apply_fn = self.model.apply_fn()
        criterion = self.main_criterion
        out_fmt = self.output_format
        qat = self.qat
        qat_caps = self.qat_caps if self.qat == "static" else None
        qat_smoothing = self.qat_smoothing

        def step(params, x, y, budget, noise_value):
            from peekvit_tpu.ops.fake_quant import fake_quant

            rngs = {"noise": jax.random.key(0)}
            # QAT: validate the quantized forward
            with fake_quant(bool(qat), caps=qat_caps,
                            smoothing=qat_smoothing):
                out, aux = apply_fn(params, x, budget, noise_value, rngs,
                                    train=False)
            logits = _main_logits(out, out_fmt)
            loss = criterion(logits, y)
            correct = jnp.sum(jnp.argmax(logits, -1) == y)
            return correct, loss, aux

        return jax.jit(step)

    def eval_step(self, x, y, budget=None, noise_value=None):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        b = None if budget is None else jnp.float32(budget)
        nv = None if noise_value is None else jnp.float32(noise_value)
        return self._eval_step(self.model.params, x, y, b, nv)

    # --------------------------------------------------------------- epochs

    def train_epoch(self, loader, epoch: int, logger=None, budget=None,
                    noise_value=None, log_prefix: str = "train/",
                    should_stop=None) -> Dict[str, float]:
        """One epoch (reference train.py:97-127): per-batch step + logging,
        per-epoch scheduler step.

        ``should_stop``: optional zero-arg callable polled between steps
        (a utils.preemption.PreemptionGuard); when it returns True the
        epoch stops after the in-flight step, flushes its metrics, and
        the summary carries ``interrupted=1.0`` so the entry point can
        checkpoint and exit inside the preemption grace window."""
        if self.scheduler is not None:
            lr = self.scheduler.lr_at(epoch, self.optimizer.lr)
            self.opt_state = set_learning_rate(self.opt_state, lr)
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(epoch)

        steps_per_epoch = len(loader) if hasattr(loader, "__len__") else 0
        count = 0
        running = None  # device-side metric sums: no per-batch host fetch
        pending = []  # buffered per-batch device metrics awaiting a flush

        def flush():
            if logger is None or not pending:
                pending.clear()
                return
            for rec in _fetch_metric_records(pending):  # ONE host fetch
                logger.log({f"{log_prefix}{k}": v for k, v in rec.items()})
            pending.clear()

        for i, (x, y) in enumerate(self._device_batches(loader)):
            step_idx = epoch * max(steps_per_epoch, 1) + i
            metrics = self.train_step(x, y, budget=budget,
                                      noise_value=noise_value, step_idx=step_idx)
            if logger is not None:
                pending.append(metrics)
                if len(pending) >= max(self.log_every, 1):
                    flush()
            if running is None:
                running = {k: jnp.asarray(v, jnp.float32)
                           for k, v in metrics.items()}
            else:
                running = {k: running[k] + jnp.asarray(metrics[k], jnp.float32)
                           for k in running}
            count += 1
            if should_stop is not None and should_stop():
                interrupted = True
                break
        else:
            interrupted = False
        flush()
        # epoch summary = MEAN over batches (not the last batch's sample)
        sums: Dict[str, float] = (
            {} if running is None
            else _to_float({k: v / count for k, v in running.items()})
        )
        lr_now = get_learning_rate(self.opt_state)
        if logger is not None and lr_now is not None:
            logger.log({f"{log_prefix}lr": lr_now})
        sums["num_batches"] = count
        if interrupted:
            sums["interrupted"] = 1.0
        return sums

    def validate(self, loader, budget=None, noise_value=None):
        """Accuracy + mean loss over a loader (reference train.py:129-145).
        Per-batch results accumulate on device; ONE host fetch at the end."""
        total, batches = 0, 0
        correct = jnp.int32(0)
        loss_sum = jnp.float32(0.0)
        for x, y in self._device_batches(loader):
            c, l, _ = self.eval_step(x, y, budget=budget, noise_value=noise_value)
            correct = correct + c
            loss_sum = loss_sum + l
            total += int(y.shape[0])
            batches += 1
        acc = int(correct) / max(total, 1)
        return acc, float(loss_sum) / max(batches, 1)

    def _device_batches(self, loader):
        from peekvit_tpu.data.loader import prefetch_to_device

        sharding = None
        if self.mesh is not None:
            from peekvit_tpu.parallel import batch_sharding

            sharding = batch_sharding(self.mesh)
        return prefetch_to_device(iter(loader), size=2, sharding=sharding)


def _to_float(metrics: Dict[str, Any]) -> Dict[str, float]:
    return {k: float(v) for k, v in metrics.items()}


def _fetch_metric_records(pending) -> list:
    """Materialize buffered per-batch metric dicts with ONE device->host
    transfer (stack to a single (batches, keys) array). Module-level so
    tests can count fetches (tests/test_train_entry.py)."""
    import numpy as np

    keys = list(pending[0].keys())
    mat = np.asarray(jnp.stack(
        [jnp.stack([jnp.asarray(m[k], jnp.float32) for k in keys])
         for m in pending]))
    return [dict(zip(keys, map(float, row))) for row in mat]
