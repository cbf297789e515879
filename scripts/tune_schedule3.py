"""Third sweep: robust relin-every-iter variants, long runs, all sequences."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from gbp_poplar_tpu.config import GBPConfig
from gbp_poplar_tpu.core import build_graph, init_state, gbp
from gbp_poplar_tpu.utils import balio

n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

VARIANTS = {
    "ra-db-u0-d0.4": GBPConfig(
        relin_every_iter=True, lambda_damping=True, iters_before_damping=0),
    "ra-db-u0-d0.7": GBPConfig(
        relin_every_iter=True, lambda_damping=True, iters_before_damping=0,
        eta_damping=0.7),
    "ra-db-u0-d0.55": GBPConfig(
        relin_every_iter=True, lambda_damping=True, iters_before_damping=0,
        eta_damping=0.55),
}

for seq in ["fr2robot2", "fr1xyz", "fr1desk"]:
    prob = balio.load_bal(seq)
    print(f"--- {seq}: {prob.n_keyframes} kf / {prob.n_points} lmk / {prob.n_edges} edges")
    for name, cfg in VARIANTS.items():
        graph = build_graph(prob, cfg)
        state = init_state(prob, cfg)
        run = jax.jit(lambda s, g=graph, c=cfg: gbp.solve(s, g, c, n_iters=n_iters))
        t0 = time.time()
        final, diag = run(state)
        jax.block_until_ready(final)
        dt = time.time() - t0
        errs = np.asarray(diag.reproj_err)
        idx = [i for i in [9, 30, 100, 300, 600, n_iters - 1] if i < n_iters]
        print(
            f"{name:16s} t={dt:6.1f}s  "
            + "  ".join(f"e[{i}]={errs[i]:.3f}" for i in idx)
            + f"  min={np.nanmin(errs):.4f} @{int(np.nanargmin(errs))}",
            flush=True,
        )
