"""Sweep solver-schedule variants on a sequence and report convergence.

Usage: python scripts/tune_schedule.py [sequence] [n_iters]
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

seq = sys.argv[1] if len(sys.argv) > 1 else "fr2robot2"
n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 400

prob = balio.load_bal(seq)
print(f"{seq}: {prob.n_keyframes} kf / {prob.n_points} lmk / {prob.n_edges} edges")

VARIANTS = {
    "reference": GBPConfig(),
    "damp-both": GBPConfig(lambda_damping=True),
    "damp-both-noreset": GBPConfig(lambda_damping=True, reset_damping_on_relin=False),
    "damp-both-drift0.1": GBPConfig(
        lambda_damping=True, reset_damping_on_relin=False, relin_drift_threshold=0.1),
    "damp-both-drift0.02": GBPConfig(
        lambda_damping=True, reset_damping_on_relin=False, relin_drift_threshold=0.02),
    "ref-drift0.1": GBPConfig(relin_drift_threshold=0.1),
}

for name, cfg in VARIANTS.items():
    graph = build_graph(prob, cfg)
    state = init_state(prob, cfg)
    run = jax.jit(lambda s, g=graph, c=cfg: gbp.solve(s, g, c, n_iters=n_iters))
    t0 = time.time()
    final, diag = run(state)
    jax.block_until_ready(final)
    dt = time.time() - t0
    errs = np.asarray(diag.reproj_err)
    idx = [9, 20, 30, 50, 100, 200, n_iters - 1]
    idx = [i for i in idx if i < n_iters]
    print(
        f"{name:22s} t={dt:6.1f}s  "
        + "  ".join(f"e[{i}]={errs[i]:.3f}" for i in idx)
        + f"  min={np.nanmin(errs):.3f}",
        flush=True,
    )
