"""Batched compute kernels: Lie groups, projection, small-matrix linalg,
message-passing marginalisation (pure-XLA and Pallas paths)."""

from . import lie, linalg, planes, projection  # noqa: F401
# reduce_kernel / sweep_kernel are imported lazily by the solver (they pull
# in jax.experimental.pallas); import them explicitly where needed.
