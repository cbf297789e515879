"""Sequence-level regression guard on a real TUM sequence (fr2robot2, the
smallest shipped problem): reference-schedule GBP must converge to the
Gauss-Newton MAP solution. Previously this behaviour was only checked by
scripts/docs; a drift in the solver schedule now fails CI.

Skipped when the reference sequences are not on disk (conftest)."""

import jax
import numpy as np
import pytest

from gbp_poplar_tpu.config import GBPConfig
from gbp_poplar_tpu.core import build_graph, gauss_newton, gbp, init_state
from gbp_poplar_tpu.utils import balio, evaluation

from conftest import requires_sequences


@requires_sequences
def test_fr2robot2_reference_schedule_matches_gn():
    prob = balio.load_bal("fr2robot2")
    cfg = GBPConfig()
    graph = build_graph(prob, cfg)
    state = init_state(prob, cfg)
    final, diag = jax.jit(
        lambda s: gbp.solve(s, graph, cfg, n_iters=300))(state)
    errs = np.asarray(diag.reproj_err)
    assert np.isfinite(errs).all()
    # converged mean reprojection error at the GN level (GN: 0.879 px)
    assert errs[-1] < 1.0, errs[-1]

    res = gauss_newton.solve_problem(prob, cfg, n_lm_iters=25)
    assert float(res.reproj_err[-1]) < 1.0
    cam_mu = np.asarray(pl_means(final))
    ate = evaluation.ate_rmse(cam_mu, np.asarray(res.cam))
    # round-1/2 measured 0.001 m; fail on an order-of-magnitude regression
    assert ate < 0.01, ate


def pl_means(state):
    from gbp_poplar_tpu.utils import analysis
    cam_mu, _ = analysis.belief_means(state)
    return cam_mu
