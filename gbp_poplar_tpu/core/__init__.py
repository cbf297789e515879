"""Solver core: factor-graph state, GBP sweeps, Gauss-Newton baseline."""

from .factor_graph import GBPGraph, GBPState, build_graph, init_state  # noqa: F401
from . import gauss_newton, gbp, slam  # noqa: F401
