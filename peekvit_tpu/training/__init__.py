"""Training harness: optimizers, train state, loops (reference L4/L6)."""
