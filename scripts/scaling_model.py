"""Predicted multi-chip scaling efficiency, from measured inputs.

The environment has ONE physical TPU chip, so the BASELINE >=0.7
scaling-efficiency target at N >= 2 cannot be measured directly (the
reference ran --ipus 1..16 on hardware, ba/ba.cpp:614-649). This script
produces the next-best thing — a quantitative prediction with every input
either measured or a stated hardware constant:

  1. **Comm payload per sweep — measured**: the solver is lowered for an
     N-device mesh and the per-sweep all-reduce bytes are read out of the
     compiled HLO (counting the collectives inside the sweep loop body),
     not hand-derived from the code.
  2. **Compute time per sweep — measured**: single-chip per-sweep wall
     time from scripts/bench_sweep.py / bench.py (pass via --sweep_ms, or
     use the recorded defaults below).
  3. **ICI bandwidth — hardware constant**: v5e has 4 ICI links/chip at
     ~45 GB/s usable each; a ring all-reduce of B bytes over N chips moves
     2(N-1)/N * B per link.

  efficiency(N) = T1 / (N * (T1/N + t_comm(N)))
               = 1 / (1 + N * t_comm(N) / T1)

Compute is embarrassingly parallel over the edge axis (equal-size shards
by construction: parallel/sharding.pad_edges pads every shard to a common
edge count; map mode pads landmark blocks), so the serial fraction is the
collective alone. The model intentionally EXCLUDES compile time and the
per-dispatch host constant (identical at any N; a production solve is one
dispatch).

    python scripts/scaling_model.py [--json SCALING.json]

Runs on the CPU backend (forced internally) — lowering for a virtual mesh
gives the same HLO collectives a real slice would get.
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

# Measured single-chip per-sweep wall time (v5e, round 4; chained scan,
# min of 3 — scripts/bench_sweep.py). Keys match --problem choices.
MEASURED_SWEEP_MS = {
    "fr1xyz": 0.056,
    "ladybug": 3.28,
}
# v5e ICI: 4 links/chip, ~45 GB/s usable per link per direction.
ICI_GBPS = 45.0
# all-reduce launch/sync overhead per sweep (conservative; XLA's ring
# all-reduce latency floor on ICI is ~1-2 us)
LAT_US = 2.0


def _problem(name):
    from gbp_poplar_tpu.utils import balio
    if name == "ladybug":
        return balio.synthetic_problem_large(1723, 156000, 7)
    return balio.load_bal(name)


def measure_psum_bytes(problem, mode, n_devices=8):
    """Lower ONE sharded gbp_sweep and count its all-reduce bytes from the
    compiled HLO — the per-sweep ICI payload, measured rather than
    hand-derived (diagnostics, accel chunk boundaries, and annealing add
    collectives at chunk/solve cadence only and amortise to ~0)."""
    import jax as _jax
    from gbp_poplar_tpu.config import GBPConfig
    from gbp_poplar_tpu.core import build_graph, init_state, gbp
    from gbp_poplar_tpu.parallel import (
        make_map_sharded_solver, make_mesh, make_sharded_solver,
    )
    from gbp_poplar_tpu.parallel.sharding import EDGE_AXIS

    cfg = GBPConfig()
    mesh = make_mesh(n_devices)
    if mode == "map":
        from gbp_poplar_tpu.parallel.map_sharding import (
            map_graph_specs, map_state_specs,
        )
        solver = make_map_sharded_solver(mesh, cfg)
        gspec, sspec = map_graph_specs(), map_state_specs()
        lmk_sharded = True
    else:
        from gbp_poplar_tpu.parallel.sharding import graph_specs, state_specs
        solver = make_sharded_solver(mesh, cfg)
        gspec, sspec = graph_specs(mesh), state_specs(mesh)
        lmk_sharded = False
    graph, state = solver.prepare(build_graph(problem, cfg),
                                  init_state(problem, cfg))
    sweep = _jax.jit(_jax.shard_map(
        lambda s, g: gbp.gbp_sweep(s, g, cfg, axis_name=EDGE_AXIS,
                                   lmk_sharded=lmk_sharded),
        mesh=mesh, in_specs=(sspec, gspec), out_specs=sspec,
        check_vma=False))
    hlo = sweep.lower(state, graph).compile().as_text()

    dtype_bytes = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "pred": 1,
                   "bf16": 2, "u8": 1, "s8": 1}
    total = 0
    for m in re.finditer(r"all-reduce(?:-start)?\(", hlo):
        # operand shapes appear in the op's result type, which precedes
        # the op name on the line, e.g.
        # "%ar = (f32[27,216]{1,0}) all-reduce(..."
        line = hlo[hlo.rfind("\n", 0, m.start()) + 1:m.start()]
        for sm in re.finditer(r"(\w+)\[([\d,]*)\]", line):
            dt, dims = sm.group(1), sm.group(2)
            if dt not in dtype_bytes:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * dtype_bytes[dt]
    return float(total)


def predict(sweep_ms, payload_bytes, n):
    """(efficiency, comm_us) for a ring all-reduce of payload over n chips."""
    if n == 1:
        return 1.0, 0.0
    t1 = sweep_ms * 1e-3
    ring = 2.0 * (n - 1) / n * payload_bytes / (ICI_GBPS * 1e9)
    t_comm = ring + LAT_US * 1e-6
    eff = 1.0 / (1.0 + n * t_comm / t1)
    return eff, t_comm * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="write the model artifact")
    ap.add_argument("--problems", default="fr1xyz,ladybug")
    ap.add_argument("--sweep_ms", default=None,
                    help="override measured ms/sweep as name=ms,...")
    args = ap.parse_args()

    sweep_ms = dict(MEASURED_SWEEP_MS)
    if args.sweep_ms:
        for kv in args.sweep_ms.split(","):
            k, v = kv.split("=")
            sweep_ms[k] = float(v)

    out = {"ici_gbps": ICI_GBPS, "latency_us": LAT_US,
           "model": "eff = 1/(1 + N*t_comm/T1); ring all-reduce "
                    "2(N-1)/N * B / BW + latency",
           "problems": {}}
    for name in args.problems.split(","):
        problem = _problem(name)
        rows = {}
        for mode in ("edges", "map"):
            payload = measure_psum_bytes(problem, mode)
            t1 = sweep_ms[name]
            effs = {n: predict(t1, payload, n) for n in (1, 2, 4, 8, 16)}
            rows[mode] = {
                "psum_bytes_per_sweep_hlo": int(payload),
                "sweep_ms_single_chip": t1,
                "efficiency": {str(n): round(e, 4)
                               for n, (e, _) in effs.items()},
                "comm_us": {str(n): round(c, 2)
                            for n, (_, c) in effs.items()},
            }
            print(f"{name} [{mode}]: payload {payload/1024:.1f} KB/sweep "
                  f"(from compiled HLO), T1 {t1} ms")
            for n in (2, 4, 8, 16):
                e, c = effs[n]
                print(f"   N={n:2d}: comm {c:7.1f} us  eff {e:.3f}")
        out["problems"][name] = {
            "n_keyframes": problem.n_keyframes,
            "n_points": problem.n_points,
            "n_edges": problem.n_edges,
            **rows,
        }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
