"""Batched compute kernels: Lie groups, projection, small-matrix linalg,
message-passing marginalisation (pure-XLA and Pallas paths)."""

from . import lie, linalg, projection  # noqa: F401
