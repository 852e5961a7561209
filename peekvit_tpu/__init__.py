"""peekvit_tpu — a TPU-native (JAX/XLA/Pallas) vision-transformer train/eval framework.

Re-implements the full capability surface of the peekvit reference
(ViT-family classifiers with token-budget sparsification: residual gating,
norm-based ranking, adaptive halting, mixture-of-experts, early exits,
masked reconstruction), redesigned TPU-first:

- functional models returning ``(logits, aux)`` — per-layer masks, gating
  probabilities and halting scores travel in an explicit aux pytree instead
  of mutable module attributes (no side channels under jit);
- static shapes everywhere — budgets are traced scalar operands that change
  mask *contents*, never array shapes, so one compilation serves a whole
  budget sweep;
- explicit PRNG threading for every stochastic op (gumbel gates, budget
  sampling, token shuffling, channel noise);
- a mesh-first parallel layer (``peekvit_tpu.parallel``) so every entry
  point runs unchanged from 1 to N chips.
"""

__version__ = "0.1.0"
