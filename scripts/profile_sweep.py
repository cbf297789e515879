"""Per-op device-time breakdown of the sweep via a jax.profiler trace.

    python scripts/profile_sweep.py [problem] [K]

Chained-scan timings (bench_sweep.py) give the per-sweep wall truth;
this script answers WHERE the time goes on device: it traces a K-sweep
chain, parses the perfetto trace, and prints total device time per op
name (kernel vs gather/reduce/combine/copy glue). Dispatch/tunnel
latency does not pollute these numbers — they are device-track events.
"""

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from gbp_poplar_tpu.config import GBPConfig
from gbp_poplar_tpu.core import build_graph, init_state, gbp
from gbp_poplar_tpu.utils import balio


def main():
    args = [a for a in sys.argv[1:] if a != "--production"]
    production = "--production" in sys.argv
    name = args[0] if args else "fr1xyz"
    k = int(args[1]) if len(args) > 1 else 50
    cfg = GBPConfig()
    if name == "ladybug":
        prob = balio.synthetic_problem_large(1723, 156000, 7)
    elif name == "ladybug_snavely":
        prob = balio.synthetic_problem_large(1723, 156000, 7, snavely=True)
    elif name == "venice":
        # BAL-Venice shape: 5 obs/landmark (the density regime where the
        # per-block landmark window doubles; docs/PERFORMANCE.md round 4)
        prob = balio.synthetic_problem_large(1778, 994000, 5)
    else:
        prob = balio.load_bal(name)
    graph = build_graph(prob, cfg)
    s = jax.jit(lambda st: gbp.initialise(st, graph, cfg))(
        init_state(prob, cfg))
    jax.block_until_ready(s)

    if production:
        # the chunked packed-carry hot loop with LIVE accel boundaries —
        # what bench.py's run_gbp rows time
        run = jax.jit(lambda x: gbp.run_gbp(
            x, graph, cfg, k, with_diagnostics=False,
            iter_offset=cfg.accel_start)[0])
    else:
        @jax.jit
        def run(x):
            return jax.lax.scan(
                lambda c, _: (gbp.gbp_sweep(c, graph, cfg), None),
                x, None, length=k)[0]

    jax.block_until_ready(run(s))          # compile outside the trace
    tmp = tempfile.mkdtemp(prefix="gbp_prof_")
    with jax.profiler.trace(tmp):
        jax.block_until_ready(run(s))

    traces = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print(f"no trace found under {tmp}", file=sys.stderr)
        return 1
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)

    # device-track complete events only (the TPU op track has tid/pid
    # metadata; host threads carry python/runtime names we drop below)
    by_name = collections.Counter()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        nm = ev.get("name", "")
        if nm.startswith(("$", "process_", "thread_")):
            continue
        by_name[nm] += ev["dur"]

    total = sum(by_name.values())
    print(f"{name}: K={k} sweeps; top ops by accumulated duration "
          f"(all tracks, us):")
    for nm, dur in by_name.most_common(25):
        print(f"  {dur/k:10.1f} us/sweep  {100*dur/total:5.1f}%  {nm[:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
