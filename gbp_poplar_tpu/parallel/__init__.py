"""Multi-chip SPMD: mesh construction, shardings, and the sharded solvers.

Two strategies:
  - ``make_sharded_solver`` (sharding.py): edge axis sharded, all variable
    beliefs replicated + psum-combined. Simple; right for problems whose
    variable state is small.
  - ``make_map_sharded_solver`` (map_sharding.py): landmark blocks sharded
    with their edges, keyframes as the replicated boundary variables —
    psum payload independent of problem size. The scaling design for
    Ladybug-and-larger maps.
"""

from .map_sharding import (  # noqa: F401
    MapShardedSolver,
    make_map_sharded_solver,
    partition_by_landmark,
)
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
