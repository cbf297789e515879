"""Multi-chip SPMD: mesh construction, shardings, and the sharded solver."""

from .sharding import (  # noqa: F401
    EDGE_AXIS,
    ShardedSolver,
    device_put_sharded,
    graph_specs,
    make_mesh,
    make_sharded_solver,
    pad_edges,
    state_specs,
)
