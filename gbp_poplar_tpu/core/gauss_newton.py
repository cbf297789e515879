"""Levenberg-Marquardt / Schur-complement bundle-adjustment baseline.

The reference cross-checks GBP only by eyeballing reprojection error
(ba/ba.cpp:1022-1028); BASELINE.md asks for a real Gauss-Newton /
Schur-complement cross-check solver. This is a Ceres-style *iterative Schur*
solver, designed TPU-first:

  - No global sparse matrix is ever materialised. The reduced camera system
    ``S = A + P_c - W M^-1 W^T`` is applied **matrix-free**: every matvec is
    per-edge batched 6x3/3x3 work (gathers over ``cam_idx``/``lmk_idx`` +
    ``segment_sum``), exactly the data layout the GBP sweep uses.
  - Landmarks are marginalised in closed form per landmark (3x3 inverses,
    batched), cameras solved by preconditioned CG with the **exact block
    diagonal of S** as block-Jacobi preconditioner (each (cam, lmk) pair
    appears in at most one edge, so the diagonal correction
    ``segment_sum(W M^-1 W^T)`` is exact, not an approximation).
  - Huber robustness enters as IRLS reweighting with the same
    variance-inflation rule as the GBP factors (ops/projection.py,
    reference: ba/gbp_codelets.cpp:134-141).
  - The same per-variable Gaussian priors the GBP solver anneals to are
    added to the normal equations, so both solvers optimise the same MAP
    objective and their solutions are directly comparable.

Everything is jit-compatible; the LM accept/reject loop is a ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GBPConfig
from ..ops import linalg, projection
from .factor_graph import GBPGraph


class GNPriors(NamedTuple):
    """Per-variable Gaussian priors (information form) for the MAP objective."""

    cam_lam: jax.Array  # [C] isotropic precision
    cam_mu: jax.Array   # [C, 6]
    lmk_lam: jax.Array  # [L] isotropic precision
    lmk_mu: jax.Array   # [L, 3]


class GNResult(NamedTuple):
    cam: jax.Array        # [C, 6] final poses
    lmk: jax.Array        # [L, 3] final landmarks
    cost: jax.Array       # [n_lm_iters] robust cost trace
    reproj_err: jax.Array  # [n_lm_iters] mean reprojection error (px)
    accepted: jax.Array   # [n_lm_iters] bool, LM step accepted
    lm_lambda: jax.Array  # final damping


def annealed_priors(
    graph: GBPGraph, cam_mu0: jax.Array, lmk_mu0: jax.Array,
    cam_lam0: jax.Array, lmk_lam0: jax.Array, cfg: GBPConfig,
) -> GNPriors:
    """The priors GBP ends up with after its annealing schedule.

    After `steps` applications of the per-variable scaling
    (utils/priors.build_priors): anchor keyframes end at
    1/first_cam_prior_std^2, all other variables are weakened by
    prior_std_weaker_factor^2 (reference: ba/ba.cpp:560-572).
    """
    c = cam_lam0.shape[0]
    anchor = jnp.arange(c) < cfg.num_anchor_cams
    weak = cfg.prior_std_weaker_factor ** 2
    cam_lam = jnp.where(anchor, 1.0 / cfg.first_cam_prior_std ** 2,
                        cam_lam0 / weak)
    lmk_lam = lmk_lam0 / weak
    return GNPriors(cam_lam=cam_lam, cam_mu=cam_mu0,
                    lmk_lam=lmk_lam, lmk_mu=lmk_mu0)


def _weights(r: jax.Array, meas_var: jax.Array, nstds: float) -> jax.Array:
    """IRLS weights 1/var' with the GBP Huber variance-inflation rule."""
    err = jnp.linalg.norm(r, axis=-1)
    var, _ = projection.huber_meas_var(err, meas_var, nstds)
    return 1.0 / var


def _robust_cost(
    r: jax.Array, meas_var: jax.Array, nstds: float
) -> jax.Array:
    """Sum of Huber losses (in whitened units) over edges."""
    err2 = jnp.sum(r * r, axis=-1) / meas_var
    err = jnp.sqrt(err2)
    k = nstds
    quad = 0.5 * err2
    lin = k * err - 0.5 * k * k
    return jnp.sum(jnp.where(err > k, lin, quad))


def _prior_cost(cam, lmk, priors: GNPriors) -> jax.Array:
    dc = cam - priors.cam_mu
    dl = lmk - priors.lmk_mu
    return 0.5 * (jnp.sum(priors.cam_lam[:, None] * dc * dc)
                  + jnp.sum(priors.lmk_lam[:, None] * dl * dl))


def map_cost(cam, lmk, graph: GBPGraph, priors: GNPriors,
             cfg: GBPConfig) -> jax.Array:
    """The MAP objective both solvers optimise (robust reprojection +
    Gaussian priors) at the given means — the cross-solver comparison
    metric for docs/VALIDATION.md. Evaluated in _GN_CHUNK_EDGES-edge
    chunks so it runs at >= 1M edges (the reference's cost print is
    ba/ba.cpp:1022-1028)."""
    e = graph.cam_idx.shape[0]
    ce = min(_GN_CHUNK_EDGES, e)
    n_ch = -(-e // ce)
    e_pad = n_ch * ce
    ci = _chunk_pad(graph.cam_idx, e_pad).reshape(n_ch, ce)
    li = _chunk_pad(graph.lmk_idx, e_pad).reshape(n_ch, ce)
    meas = _chunk_pad(graph.meas.T, e_pad).reshape(n_ch, ce, 2)
    mvar = _chunk_pad(graph.meas_var, e_pad, 1.0).reshape(n_ch, ce)
    valid = (jnp.arange(e_pad) < e).astype(cam.dtype).reshape(n_ch, ce)
    intr = (None if graph.intr is None
            else _chunk_pad(graph.intr.T, e_pad).reshape(n_ch, ce, 3))

    def body(acc, xs):
        ci_k, li_k, meas_k, mvar_k, val_k = xs[:5]
        intr_k = xs[5] if len(xs) > 5 else None
        r = meas_k - projection.project(cam[ci_k], lmk[li_k], graph.k,
                                        intr_k)
        err2 = jnp.sum(r * r, axis=-1) / mvar_k
        err = jnp.sqrt(err2)
        k = cfg.huber_nstds
        loss = jnp.where(err > k, k * err - 0.5 * k * k, 0.5 * err2)
        return acc + jnp.sum(loss * val_k), None

    xs = (ci, li, meas, mvar, valid) + (() if intr is None else (intr,))
    robust, _ = jax.lax.scan(body, jnp.zeros((), cam.dtype), xs)
    return robust + _prior_cost(cam, lmk, priors)


class _NormalEqs(NamedTuple):
    a_c: jax.Array      # [C, 6, 6] camera diag blocks (incl prior + LM damping)
    m_inv: jax.Array    # [L, 3, 3] inverted landmark blocks
    w: jax.Array        # [E, 6, 3] cross blocks
    b_c: jax.Array      # [C, 6] camera rhs
    b_l: jax.Array      # [L, 3] landmark rhs
    s_diag_inv: jax.Array  # [C, 6, 6] inverse of exact S block diagonal


# Edge-chunk size for the normal-equation build at large E. The [E, 6, 6]
# batched block temporaries are the same non-plane-layout memory trap fixed
# in utils/priors.build_priors (round 4): at 5M edges jtj_cc + wmw alone
# request ~1.4 GB and the whole build several GB of HBM. Above this many
# edges the build streams 512k-edge chunks through a lax.scan, accumulating
# the per-variable segment sums in the carry — only the [E, 6, 3] cross
# blocks (needed by every CG matvec) stay whole. Reduction order changes
# (chunked partial sums), so small problems keep the single-shot path and
# the pinned oracle numbers.
_GN_CHUNK_EDGES = 1 << 19


def _build(
    cam, lmk, graph: GBPGraph, priors: GNPriors, nstds: float,
    lm_lambda: jax.Array,
) -> _NormalEqs:
    c, l = graph.n_keyframes, graph.n_points
    e = graph.cam_idx.shape[0]
    if e > _GN_CHUNK_EDGES:
        a_c, m_l, b_c, b_l, w_cl = _build_sums_chunked(
            cam, lmk, graph, nstds)
    else:
        cam_e = cam[graph.cam_idx]
        lmk_e = lmk[graph.lmk_idx]
        intr_e = None if graph.intr is None else graph.intr.T  # [E, 3]
        j_c, j_l = projection.reproj_jacobians(cam_e, lmk_e, graph.k, intr_e)
        r = graph.meas.T - projection.project(cam_e, lmk_e, graph.k, intr_e)
        w_e = _weights(r, graph.meas_var, nstds)[:, None, None]  # [E,1,1]

        jtj_cc = linalg.bmm(linalg.transpose(j_c), j_c) * w_e    # [E,6,6]
        jtj_ll = linalg.bmm(linalg.transpose(j_l), j_l) * w_e    # [E,3,3]
        w_cl = linalg.bmm(linalg.transpose(j_c), j_l) * w_e      # [E,6,3]
        jtr_c = linalg.bmv(linalg.transpose(j_c), r) * w_e[..., 0]
        jtr_l = linalg.bmv(linalg.transpose(j_l), r) * w_e[..., 0]

        a_c = jax.ops.segment_sum(jtj_cc, graph.cam_idx, num_segments=c)
        m_l = jax.ops.segment_sum(jtj_ll, graph.lmk_idx, num_segments=l)
        b_c = jax.ops.segment_sum(jtr_c, graph.cam_idx, num_segments=c)
        b_l = jax.ops.segment_sum(jtr_l, graph.lmk_idx, num_segments=l)

    eye6 = jnp.eye(6, dtype=cam.dtype)
    eye3 = jnp.eye(3, dtype=cam.dtype)
    # priors + LM damping (additive Marquardt: lambda * (diag + prior))
    a_c = a_c + (priors.cam_lam[:, None, None] * eye6)
    m_l = m_l + (priors.lmk_lam[:, None, None] * eye3)
    b_c = b_c + priors.cam_lam[:, None] * (priors.cam_mu - cam)
    b_l = b_l + priors.lmk_lam[:, None] * (priors.lmk_mu - lmk)
    damp = 1.0 + lm_lambda
    a_c = a_c * jnp.where(eye6 > 0, damp, 1.0)
    m_l = m_l * jnp.where(eye3 > 0, damp, 1.0)

    m_inv = linalg.inv3x3(m_l)

    # exact block diagonal of S: each (cam, lmk) pair occurs in one edge
    if e > _GN_CHUNK_EDGES:
        wmw_sum = _wmw_sum_chunked(w_cl, m_inv, graph, c)
    else:
        wmw = linalg.bmm(w_cl, linalg.bmm(m_inv[graph.lmk_idx],
                                          linalg.transpose(w_cl)))
        wmw_sum = jax.ops.segment_sum(wmw, graph.cam_idx, num_segments=c)
    s_diag = a_c - wmw_sum
    s_diag_inv = linalg.inv6x6(s_diag)
    return _NormalEqs(a_c, m_inv, w_cl, b_c, b_l, s_diag_inv)


def _chunk_pad(x, e_pad: int, fill=0):
    pad = e_pad - x.shape[0]
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=fill)


def _build_sums_chunked(cam, lmk, graph: GBPGraph, nstds: float):
    """Segment sums of the normal-equation blocks, streamed in
    _GN_CHUNK_EDGES-edge chunks through a lax.scan so no [E, d, d] batched
    temporary is ever materialised (28 GB at 5M edges unchunked — the
    utils/priors.build_priors trap). Padding edges carry weight 0 and
    index 0, contributing exactly nothing to every sum; the [E, 6, 3]
    cross blocks are emitted per chunk and reshaped back (CG needs them
    every matvec)."""
    c, l = graph.n_keyframes, graph.n_points
    e = graph.cam_idx.shape[0]
    ce = _GN_CHUNK_EDGES
    n_ch = -(-e // ce)
    e_pad = n_ch * ce
    ci = _chunk_pad(graph.cam_idx, e_pad).reshape(n_ch, ce)
    li = _chunk_pad(graph.lmk_idx, e_pad).reshape(n_ch, ce)
    meas = _chunk_pad(graph.meas.T, e_pad).reshape(n_ch, ce, 2)
    mvar = _chunk_pad(graph.meas_var, e_pad, 1.0).reshape(n_ch, ce)
    valid = (jnp.arange(e_pad) < e).astype(cam.dtype).reshape(n_ch, ce)
    intr = (None if graph.intr is None
            else _chunk_pad(graph.intr.T, e_pad).reshape(n_ch, ce, 3))

    def body(carry, xs):
        a_c, m_l, b_c, b_l = carry
        ci_k, li_k, meas_k, mvar_k, val_k, intr_k = xs
        cam_e = cam[ci_k]
        lmk_e = lmk[li_k]
        j_c, j_l = projection.reproj_jacobians(cam_e, lmk_e, graph.k, intr_k)
        r = meas_k - projection.project(cam_e, lmk_e, graph.k, intr_k)
        w_e = (_weights(r, mvar_k, nstds) * val_k)[:, None, None]
        jtj_cc = linalg.bmm(linalg.transpose(j_c), j_c) * w_e
        jtj_ll = linalg.bmm(linalg.transpose(j_l), j_l) * w_e
        w_cl = linalg.bmm(linalg.transpose(j_c), j_l) * w_e
        jtr_c = linalg.bmv(linalg.transpose(j_c), r) * w_e[..., 0]
        jtr_l = linalg.bmv(linalg.transpose(j_l), r) * w_e[..., 0]
        a_c = a_c + jax.ops.segment_sum(jtj_cc, ci_k, num_segments=c)
        m_l = m_l + jax.ops.segment_sum(jtj_ll, li_k, num_segments=l)
        b_c = b_c + jax.ops.segment_sum(jtr_c, ci_k, num_segments=c)
        b_l = b_l + jax.ops.segment_sum(jtr_l, li_k, num_segments=l)
        return (a_c, m_l, b_c, b_l), w_cl

    f = cam.dtype
    init = (jnp.zeros((c, 6, 6), f), jnp.zeros((l, 3, 3), f),
            jnp.zeros((c, 6), f), jnp.zeros((l, 3), f))
    xs = (ci, li, meas, mvar, valid) + ((intr,) if intr is not None else ())
    if intr is None:
        (a_c, m_l, b_c, b_l), w_cl = jax.lax.scan(
            lambda cr, x: body(cr, x + (None,)), init, xs)
    else:
        (a_c, m_l, b_c, b_l), w_cl = jax.lax.scan(body, init, xs)
    return a_c, m_l, b_c, b_l, w_cl.reshape(e_pad, 6, 3)[:e]


def _wmw_sum_chunked(w_cl, m_inv, graph: GBPGraph, c: int):
    """segment_sum(W M^-1 W^T) over cameras, chunked like the build (the
    [E, 6, 6] wmw temporary is the largest single build buffer)."""
    e = graph.cam_idx.shape[0]
    ce = _GN_CHUNK_EDGES
    n_ch = -(-e // ce)
    e_pad = n_ch * ce
    # padding cross blocks are zero -> zero contribution at index 0
    w_p = _chunk_pad(w_cl, e_pad).reshape(n_ch, ce, 6, 3)
    ci = _chunk_pad(graph.cam_idx, e_pad).reshape(n_ch, ce)
    li = _chunk_pad(graph.lmk_idx, e_pad).reshape(n_ch, ce)

    def body(acc, xs):
        w_k, ci_k, li_k = xs
        wmw = linalg.bmm(w_k, linalg.bmm(m_inv[li_k],
                                         linalg.transpose(w_k)))
        return acc + jax.ops.segment_sum(wmw, ci_k, num_segments=c), None

    acc0 = jnp.zeros((c, 6, 6), w_cl.dtype)
    acc, _ = jax.lax.scan(body, acc0, (w_p, ci, li))
    return acc


def _schur_matvec(ne: _NormalEqs, graph: GBPGraph, v: jax.Array) -> jax.Array:
    """S v = (A - W M^-1 W^T) v, matrix-free over edges. v: [C, 6]."""
    c, l = graph.n_keyframes, graph.n_points
    av = linalg.bmv(ne.a_c, v)
    v_e = v[graph.cam_idx]                                    # [E, 6]
    y_l = jax.ops.segment_sum(
        linalg.bmv(linalg.transpose(ne.w), v_e), graph.lmk_idx,
        num_segments=l)                                       # [L, 3]
    z_l = linalg.bmv(ne.m_inv, y_l)
    u_e = linalg.bmv(ne.w, z_l[graph.lmk_idx])                # [E, 6]
    return av - jax.ops.segment_sum(u_e, graph.cam_idx, num_segments=c)


def _schur_rhs(ne: _NormalEqs, graph: GBPGraph) -> jax.Array:
    """b_c - W M^-1 b_l, the reduced-system right-hand side."""
    c = graph.n_keyframes
    z_l = linalg.bmv(ne.m_inv, ne.b_l)
    u_e = linalg.bmv(ne.w, z_l[graph.lmk_idx])
    return ne.b_c - jax.ops.segment_sum(u_e, graph.cam_idx, num_segments=c)


def _pcg(ne: _NormalEqs, graph: GBPGraph, rhs: jax.Array,
         n_iters: int, tol: float) -> jax.Array:
    """Block-Jacobi preconditioned CG on the reduced camera system."""

    def precond(r):
        return linalg.bmv(ne.s_diag_inv, r)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    rhs_norm2 = jnp.maximum(jnp.sum(rhs * rhs), 1e-30)

    def body(carry, _):
        x, r, p, rz = carry
        ap = _schur_matvec(ne, graph, p)
        pap = jnp.sum(p * ap)
        converged = jnp.sum(r * r) / rhs_norm2 < tol * tol
        alpha = jnp.where(pap > 0, rz / jnp.maximum(pap, 1e-30), 0.0)
        alpha = jnp.where(converged, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-30), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, p0, rz0),
                                   None, length=n_iters)
    return x


def _back_substitute(
    ne: _NormalEqs, graph: GBPGraph, dx_c: jax.Array
) -> jax.Array:
    """dx_l = M^-1 (b_l - W^T dx_c)."""
    l = graph.n_points
    wt_dx = jax.ops.segment_sum(
        linalg.bmv(linalg.transpose(ne.w), dx_c[graph.cam_idx]),
        graph.lmk_idx, num_segments=l)
    return linalg.bmv(ne.m_inv, ne.b_l - wt_dx)


def solve_lm(
    cam0: jax.Array,
    lmk0: jax.Array,
    graph: GBPGraph,
    priors: GNPriors,
    cfg: GBPConfig,
    n_lm_iters: int = 30,
    cg_iters: int = 50,
    cg_tol: float = 1e-6,
    lambda0: float = 1e-4,
) -> GNResult:
    """Levenberg-Marquardt with iterative-Schur steps. Jit-compatible.

    All batched matmuls run at HIGHEST precision (ops/linalg). NOTE: the
    COLD start from the prior means is fp32-rounding sensitive on the fr1
    sequences (TPU and CPU runs can land ~0.1 px apart); warm starts (e.g.
    polishing a GBP solution) are robust. Give cold starts >= 60 LM
    iterations when using this as an accuracy oracle.
    """
    nstds = cfg.huber_nstds

    intr_e = None if graph.intr is None else graph.intr.T

    def total_cost(cam, lmk):
        r = graph.meas.T - projection.project(
            cam[graph.cam_idx], lmk[graph.lmk_idx], graph.k, intr_e)
        return _robust_cost(r, graph.meas_var, nstds) + _prior_cost(
            cam, lmk, priors)

    def mean_err(cam, lmk):
        r = graph.meas.T - projection.project(
            cam[graph.cam_idx], lmk[graph.lmk_idx], graph.k, intr_e)
        return jnp.mean(jnp.linalg.norm(r, axis=-1))

    def body(carry, _):
        cam, lmk, lm_lambda, cost = carry
        ne = _build(cam, lmk, graph, priors, nstds, lm_lambda)
        rhs = _schur_rhs(ne, graph)
        dx_c = _pcg(ne, graph, rhs, cg_iters, cg_tol)
        dx_l = _back_substitute(ne, graph, dx_c)
        cam_new = cam + dx_c
        lmk_new = lmk + dx_l
        cost_new = total_cost(cam_new, lmk_new)
        accept = (cost_new < cost) & jnp.isfinite(cost_new)
        cam = jnp.where(accept, cam_new, cam)
        lmk = jnp.where(accept, lmk_new, lmk)
        cost = jnp.where(accept, cost_new, cost)
        lm_lambda = jnp.where(accept, jnp.maximum(lm_lambda / 3.0, 1e-9),
                              jnp.minimum(lm_lambda * 5.0, 1e6))
        return (cam, lmk, lm_lambda, cost), (cost, mean_err(cam, lmk), accept)

    cost0 = total_cost(cam0, lmk0)
    (cam, lmk, lm_lambda, _), (costs, errs, accepted) = jax.lax.scan(
        body, (cam0, lmk0, jnp.asarray(lambda0, cam0.dtype), cost0),
        None, length=n_lm_iters)
    return GNResult(cam=cam, lmk=lmk, cost=costs, reproj_err=errs,
                    accepted=accepted, lm_lambda=lm_lambda)


def solve_problem(problem, cfg: GBPConfig, dtype=jnp.float32, **kw) -> GNResult:
    """Convenience wrapper: build graph + annealed priors from a BAProblem."""
    import dataclasses

    from ..utils import priors as priors_lib
    from .factor_graph import build_graph

    # GN has no per-edge activity mask, so it must see the exact edge set
    # (the GBP graph's inert padding edges would corrupt the normal eqs).
    graph = build_graph(problem,
                        dataclasses.replace(cfg, edge_pad_multiple=1), dtype)
    cam_lam0, lmk_lam0 = priors_lib.prior_lambdas(problem, cfg.meas_var, dtype)
    cam0 = jnp.asarray(problem.cam_means, dtype)
    lmk0 = jnp.asarray(problem.lmk_means, dtype)
    pri = annealed_priors(graph, cam0, lmk0, cam_lam0, lmk_lam0, cfg)
    return solve_lm(cam0, lmk0, graph, pri, cfg, **kw)
