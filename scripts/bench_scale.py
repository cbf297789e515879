"""Throughput scaling across problem sizes (TUM -> Ladybug-1723 scale).

Prints sweeps/sec and per-sweep time for each problem; run on the TPU.

    python scripts/bench_scale.py [n_sweeps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from gbp_poplar_tpu.config import GBPConfig
from gbp_poplar_tpu.core import build_graph, init_state, gbp
from gbp_poplar_tpu.utils import balio

N_SWEEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def bench(name, problem, cfg):
    graph = build_graph(problem, cfg)
    state0 = init_state(problem, cfg)

    @jax.jit
    def hot(state):
        st = gbp.initialise(state, graph, cfg)
        st, _ = gbp.run_gbp(st, graph, cfg, N_SWEEPS, with_diagnostics=False)
        return st

    out = hot(state0)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(hot(state0))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / N_SWEEPS
    # sanity: converging?
    run = jax.jit(lambda s: gbp.solve(s, graph, cfg, n_iters=60))
    _, diag = run(state0)
    errs = np.asarray(diag.reproj_err)
    print(f"{name:22s} E={graph.n_edges:9d} C={problem.n_keyframes:5d} "
          f"L={problem.n_points:7d}  {dt*1e3:8.3f} ms/sweep "
          f"({1/dt:8.1f} sweeps/s)  err[0]={errs[0]:8.2f} -> err[59]={errs[-1]:6.2f}",
          flush=True)


def main():
    cfg = GBPConfig()
    for seq in ["fr2robot2", "fr1xyz", "fr1desk"]:
        try:
            bench(seq, balio.load_bal(seq), cfg)
        except FileNotFoundError:
            print(f"{seq}: not found, skipping")
    for (c, l, o, name) in [
        (200, 20_000, 7, "synthetic-140k"),
        (800, 60_000, 7, "synthetic-420k"),
        (1723, 156_000, 7, "ladybug-scale-1.1M"),
    ]:
        bench(name, balio.synthetic_problem_large(c, l, o), cfg)


if __name__ == "__main__":
    main()
