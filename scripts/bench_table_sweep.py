"""Chained-scan comparison: plane-form fused sweep vs table-carried sweep.

    python scripts/bench_table_sweep.py [seq ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from gbp_poplar_tpu.config import GBPConfig
from gbp_poplar_tpu.core import build_graph, init_state, gbp
from gbp_poplar_tpu.utils import balio


def bench(prob, name, cfg, K=2000):
    graph = build_graph(prob, cfg)
    s = jax.jit(lambda st: gbp.initialise(st, graph, cfg))(
        init_state(prob, cfg))
    jax.block_until_ready(s)

    @jax.jit
    def run_plane(x):
        return jax.lax.scan(
            lambda c, _: (gbp.gbp_sweep(c, graph, cfg), None),
            x, None, length=K)[0]

    @jax.jit
    def run_table(x):
        ptbls = gbp._prior_tables(x, graph)
        tbls = gbp._make_tables(x, graph, widths=(128, 128))

        def body(carry, _):
            st, ct, lt = carry
            st, ct, lt = gbp._gbp_sweep_tables(st, ct, lt, *ptbls,
                                               graph, cfg)
            return (st, ct, lt), None

        (st, ct, lt), _ = jax.lax.scan(body, (x, *tbls), None, length=K)
        return gbp._beliefs_from_tables(st, graph, ct, lt)

    for label, fn in (("plane", run_plane), ("table", run_table)):
        jax.block_until_ready(fn(s))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(s))
            ts.append(time.perf_counter() - t0)
        print(f"{name:12s} {label}  E={graph.n_edges:8d} "
              f"{min(ts)/K*1e3:8.3f} ms/sweep", flush=True)


def main():
    names = sys.argv[1:] or ["fr1xyz"]
    cfg = GBPConfig()
    for n in names:
        if n == "ladybug":
            bench(balio.synthetic_problem_large(1723, 156000, 7), n, cfg, 50)
        else:
            bench(balio.load_bal(n), n, cfg)


if __name__ == "__main__":
    main()
