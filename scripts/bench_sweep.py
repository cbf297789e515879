"""Canonical sweep-time measurement (chained scan, K=2000, min of 3).

    python scripts/bench_sweep.py [fr1xyz|fr2robot2|ladybug] ...

K must be large: one dispatch through the axon tunnel costs a fixed
~25-35 ms of host/tunnel latency on top of the device time, so a K=200
chain over-reports per-sweep time by ~0.15 ms. For per-op truth, take a
jax.profiler perfetto trace and read the while-loop duration.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from gbp_poplar_tpu.config import GBPConfig
from gbp_poplar_tpu.core import build_graph, init_state, gbp
from gbp_poplar_tpu.utils import balio


def bench(prob, name, cfg, K):
    graph = build_graph(prob, cfg)
    s = jax.jit(lambda st: gbp.initialise(st, graph, cfg))(
        init_state(prob, cfg))
    jax.block_until_ready(s)

    @jax.jit
    def run(x):
        return jax.lax.scan(
            lambda c, _: (gbp.gbp_sweep(c, graph, cfg), None),
            x, None, length=K)[0]

    r = run(s)
    jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(s))
        ts.append(time.perf_counter() - t0)
    print(f"{name:16s} E={graph.n_edges:8d} {min(ts)/K*1e3:8.3f} ms/sweep",
          flush=True)


def main():
    names = sys.argv[1:] or ["fr1xyz"]
    cfg = GBPConfig()
    for n in names:
        if n == "ladybug":
            bench(balio.synthetic_problem_large(1723, 156000, 7), n, cfg, 100)
        elif n == "ladybug_snavely":
            bench(balio.synthetic_problem_large(1723, 156000, 7,
                                                snavely=True), n, cfg, 100)
        else:
            bench(balio.load_bal(n), n, cfg, 2000)


if __name__ == "__main__":
    main()
