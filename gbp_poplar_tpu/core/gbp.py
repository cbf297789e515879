"""Synchronous Gaussian Belief Propagation — the solver core.

One GBP iteration on the IPU is five compute sets chained by the host
(reference: ba/ba.cpp:895-905): prep (damping/relinearisation state machine),
message computation (4 vertex types), belief reduction, and message
double-buffer copies. Here the whole iteration is ONE jitted dense function
over the edge axis, and a full solve is a single ``lax.scan`` — no
host<->device round-trips inside the loop (the reference streams all beliefs
to the host every iteration, ba/ba.cpp:1009; we fetch diagnostics from the
scan outputs instead).

Branchy per-vertex control flow (active/robust/relinearise) becomes masked
dense compute: the relinearisation path is evaluated for every edge every
sweep and selected with ``jnp.where`` — on TPU this is cheaper than any form
of divergence, and XLA fuses the masks into the surrounding elementwise work.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GBPConfig
from ..ops import lie, linalg, projection
from .factor_graph import GBPGraph, GBPState


def _regularised(mat: jax.Array, rel_eps: float) -> jax.Array:
    """Add relative Tikhonov jitter before a cavity inversion.

    The reference inverts the raw cavity and relies on IPU FP traps to abort
    on failure (ba/ba.cpp:888); a production solver must survive transiently
    ill-conditioned cavities instead.
    """
    if rel_eps <= 0.0:
        return mat
    d = mat.shape[-1]
    mean_diag = jnp.trace(mat, axis1=-2, axis2=-1) / d
    eye = jnp.eye(d, dtype=mat.dtype)
    return mat + (rel_eps * jnp.abs(mean_diag))[..., None, None] * eye


# ---------------------------------------------------------------------------
# belief update (replaces popops reduceWithOutput, reference: ba/ba.cpp:104-139)
# ---------------------------------------------------------------------------

def update_beliefs(
    state: GBPState, graph: GBPGraph, axis_name: str | None = None
) -> GBPState:
    """belief = prior + sum of incoming messages (scatter-add over edges).

    Under ``shard_map`` with the edge axis sharded, each shard computes a
    partial segment-sum over its local edges; ``axis_name`` names the mesh
    axis over which the partials are ``psum``-reduced — the TPU-native
    equivalent of Poplar's cross-tile ``reduceWithOutput``
    (reference: ba/ba.cpp:104-139) riding ICI instead of exchange fabric.
    """
    c, l = graph.n_keyframes, graph.n_points
    msg_cam_eta = jax.ops.segment_sum(state.msg_c_eta, graph.cam_idx, num_segments=c)
    msg_cam_lam = jax.ops.segment_sum(state.msg_c_lam, graph.cam_idx, num_segments=c)
    msg_lmk_eta = jax.ops.segment_sum(state.msg_l_eta, graph.lmk_idx, num_segments=l)
    msg_lmk_lam = jax.ops.segment_sum(state.msg_l_lam, graph.lmk_idx, num_segments=l)
    if axis_name is not None:
        msg_cam_eta, msg_cam_lam, msg_lmk_eta, msg_lmk_lam = jax.lax.psum(
            (msg_cam_eta, msg_cam_lam, msg_lmk_eta, msg_lmk_lam), axis_name)
    return state._replace(
        cam_eta=state.cam_prior_eta + msg_cam_eta,
        cam_lam=state.cam_prior_lam + msg_cam_lam,
        lmk_eta=state.lmk_prior_eta + msg_lmk_eta,
        lmk_lam=state.lmk_prior_lam + msg_lmk_lam)


# ---------------------------------------------------------------------------
# relinearisation
# ---------------------------------------------------------------------------

def linearise_all(state: GBPState, graph: GBPGraph, cfg: GBPConfig) -> GBPState:
    """Unconditionally relinearise every factor at current belief means.

    Mirrors LINEARISE_PROG's cs_relinearise (reference: ba/ba.cpp:890-893,
    gbp_codelets.cpp:20-172): runs once after beliefs are first set to priors.
    """
    mu_c = linalg.inf_to_mu(state.cam_eta[graph.cam_idx],
                            state.cam_lam[graph.cam_idx])
    mu_l = linalg.inf_to_mu(state.lmk_eta[graph.lmk_idx],
                            state.lmk_lam[graph.lmk_idx])
    pot, robust = projection.linearise_factor(
        mu_c, mu_l, graph.k, graph.meas, graph.meas_var, cfg.huber_nstds)
    return state._replace(
        f_eta_c=pot.eta_c, f_eta_l=pot.eta_l, f_lam_cc=pot.lam_cc,
        f_lam_cl=pot.lam_cl, f_lam_ll=pot.lam_ll, robust=robust,
        lin_mu=jnp.concatenate([mu_c, mu_l], axis=-1))


# ---------------------------------------------------------------------------
# prior annealing (reference: gbp_codelets.cpp:176-197 + ba/ba.cpp:1003-1006)
# ---------------------------------------------------------------------------

def weaken_priors(
    state: GBPState, graph: GBPGraph, axis_name: str | None = None
) -> GBPState:
    """Scale priors by the per-variable annealing factor while the weaken
    flag is live, decrementing the flag; then refresh beliefs."""
    # The reference hardcodes flag in {1..5} (gbp_codelets.cpp:185); flags are
    # only ever set to `steps` and decremented, so `> 0` is the exact intent.
    cam_live = state.cam_weaken > 0
    lmk_live = state.lmk_weaken > 0
    cs = jnp.where(cam_live, graph.cam_scaling, 1.0)
    ls = jnp.where(lmk_live, graph.lmk_scaling, 1.0)
    state = state._replace(
        cam_prior_eta=state.cam_prior_eta * cs[:, None],
        cam_prior_lam=state.cam_prior_lam * cs[:, None, None],
        lmk_prior_eta=state.lmk_prior_eta * ls[:, None],
        lmk_prior_lam=state.lmk_prior_lam * ls[:, None, None],
        cam_weaken=state.cam_weaken - cam_live.astype(state.cam_weaken.dtype),
        lmk_weaken=state.lmk_weaken - lmk_live.astype(state.lmk_weaken.dtype),
    )
    return update_beliefs(state, graph, axis_name)


# ---------------------------------------------------------------------------
# one synchronous GBP sweep (= GBP_PROG, reference: ba/ba.cpp:895-905)
# ---------------------------------------------------------------------------

def gbp_sweep(
    state: GBPState, graph: GBPGraph, cfg: GBPConfig,
    axis_name: str | None = None,
) -> GBPState:
    active = state.active > 0

    # --- gather adjacent beliefs (replaces Poplar inter-tile exchange) ---
    bc_eta = state.cam_eta[graph.cam_idx]      # [E, 6]
    bc_lam = state.cam_lam[graph.cam_idx]      # [E, 6, 6]
    bl_eta = state.lmk_eta[graph.lmk_idx]      # [E, 3]
    bl_lam = state.lmk_lam[graph.lmk_idx]      # [E, 3, 3]

    # --- prep: damping state machine + drift-triggered relinearisation ---
    # (reference: gbp_codelets.cpp:215-379)
    damping = jnp.where(active & (state.damping_count == 0),
                        cfg.eta_damping, state.damping)
    damping_count = state.damping_count + active.astype(jnp.int32)

    mu_c = linalg.inf_to_mu(bc_eta, bc_lam)    # [E, 6]
    mu_l = linalg.inf_to_mu(bl_eta, bl_lam)    # [E, 3]
    mu = jnp.concatenate([mu_c, mu_l], axis=-1)
    dmu = jnp.linalg.norm(mu - state.mu, axis=-1)

    if cfg.relin_every_iter:
        relin = active
    else:
        relin = (
            active
            & (dmu < cfg.dmu_threshold)
            & (damping_count > cfg.relin_count_threshold)
        )
    if not cfg.relin_every_iter and cfg.relin_drift_threshold > 0.0:
        # Runaway-edge recapture: relinearise when the belief mean has left
        # the stored linearisation point (standard drift-triggered relin; the
        # reference only relinearises on quiescence, which cannot catch edges
        # that never settle).
        drift = jnp.linalg.norm(mu - state.lin_mu, axis=-1)
        relin = relin | (
            active
            & (drift > cfg.relin_drift_threshold)
            & (damping_count > cfg.relin_count_threshold)
        )
    if cfg.min_depth > 0.0:
        # Never adopt a linearisation with the landmark at/behind the camera
        # plane — the projection Jacobians blow up as z -> 0.
        z = lie.w2c_apply(mu_c, mu_l)[..., 2]
        relin = relin & (z > cfg.min_depth)
    pot, robust_new = projection.linearise_factor(
        mu_c, mu_l, graph.k, graph.meas, graph.meas_var, cfg.huber_nstds)

    def sel(mask, new, old):
        return jnp.where(mask.reshape(mask.shape + (1,) * (new.ndim - 1)), new, old)

    f_eta_c = sel(relin, pot.eta_c, state.f_eta_c)
    f_eta_l = sel(relin, pot.eta_l, state.f_eta_l)
    f_lam_cc = sel(relin, pot.lam_cc, state.f_lam_cc)
    f_lam_cl = sel(relin, pot.lam_cl, state.f_lam_cl)
    f_lam_ll = sel(relin, pot.lam_ll, state.f_lam_ll)
    lin_mu = sel(relin, mu, state.lin_mu)
    robust = jnp.where(relin, robust_new, state.robust)
    if cfg.reset_damping_on_relin and not cfg.relin_every_iter:
        damping = jnp.where(relin, 0.0, damping)
    if not cfg.relin_every_iter:
        damping_count = jnp.where(relin, -cfg.num_undamped_iters, damping_count)
    new_mu = sel(active, mu, state.mu)  # inactive edges keep stale mu (prep skipped)

    # --- factor -> variable messages (reference: gbp_codelets.cpp:382-710) ---
    # to keyframe: marginalise the landmark out of the factor (3x3 inverse)
    lam_ll_cav = _regularised(f_lam_ll + bl_lam - state.msg_l_lam,
                              cfg.cavity_jitter)
    eta_l_cav = f_eta_l + bl_eta - state.msg_l_eta
    w_cl = linalg.bmm(f_lam_cl, linalg.inv3x3(lam_ll_cav))          # [E, 6, 3]
    msg_c_eta = f_eta_c - linalg.bmv(w_cl, eta_l_cav)
    msg_c_lam = f_lam_cc - linalg.bmm(w_cl, linalg.transpose(f_lam_cl))

    # to landmark: marginalise the keyframe out (6x6 inverse)
    lam_cc_cav = _regularised(f_lam_cc + bc_lam - state.msg_c_lam,
                              cfg.cavity_jitter)
    eta_c_cav = f_eta_c + bc_eta - state.msg_c_eta
    w_lc = linalg.bmm(linalg.transpose(f_lam_cl), linalg.inv6x6(lam_cc_cav))
    msg_l_eta = f_eta_l - linalg.bmv(w_lc, eta_c_cav)
    msg_l_lam = f_lam_ll - linalg.bmm(w_lc, f_lam_cl)

    # eta messages are damped against the previous message; the reference
    # leaves Lambda undamped (gbp_codelets.cpp:458-462 vs 618-627), while
    # lambda_damping blends both (log-domain damped BP; PSD-preserving).
    d1 = damping[:, None]
    msg_c_eta = (1.0 - d1) * msg_c_eta + d1 * state.msg_c_eta
    msg_l_eta = (1.0 - d1) * msg_l_eta + d1 * state.msg_l_eta
    if cfg.lambda_damping:
        d2 = d1[..., None]
        msg_c_lam = (1.0 - d2) * msg_c_lam + d2 * state.msg_c_lam
        msg_l_lam = (1.0 - d2) * msg_l_lam + d2 * state.msg_l_lam

    # Inactive factors emit zeros (reference: gbp_codelets.cpp:464-468).
    # jnp.where (not multiply-by-mask) so a non-finite value computed on an
    # inactive/padding edge cannot poison the reduction (NaN * 0 = NaN).
    a1 = active[:, None]
    a2 = a1[..., None]
    msg_c_eta = jnp.where(a1, msg_c_eta, 0.0)
    msg_l_eta = jnp.where(a1, msg_l_eta, 0.0)
    msg_c_lam = jnp.where(a2, msg_c_lam, 0.0)
    msg_l_lam = jnp.where(a2, msg_l_lam, 0.0)

    state = state._replace(
        f_eta_c=f_eta_c, f_eta_l=f_eta_l, f_lam_cc=f_lam_cc,
        f_lam_cl=f_lam_cl, f_lam_ll=f_lam_ll,
        msg_c_eta=msg_c_eta, msg_c_lam=msg_c_lam,
        msg_l_eta=msg_l_eta, msg_l_lam=msg_l_lam,
        damping=damping, damping_count=damping_count,
        mu=new_mu, lin_mu=lin_mu, robust=robust,
    )

    # --- belief update (reduce) ---
    return update_beliefs(state, graph, axis_name)


# ---------------------------------------------------------------------------
# diagnostics (device-side replacement for the host TBB eval,
# reference: ba/util.cpp:74-144)
# ---------------------------------------------------------------------------

class Diagnostics(NamedTuple):
    reproj_err: jax.Array   # mean residual norm over active edges (px)
    cost: jax.Array         # 0.5 * sum ||r||^2
    n_relins: jax.Array     # edges that just relinearised
    n_robust: jax.Array     # edges with Huber active


def reprojection_error(
    state: GBPState, graph: GBPGraph, axis_name: str | None = None
) -> tuple[jax.Array, jax.Array]:
    """Mean reprojection residual norm and total cost over active edges."""
    mu_c = linalg.inf_to_mu(state.cam_eta[graph.cam_idx],
                            state.cam_lam[graph.cam_idx])
    mu_l = linalg.inf_to_mu(state.lmk_eta[graph.lmk_idx],
                            state.lmk_lam[graph.lmk_idx])
    pred = projection.project(mu_c, mu_l, graph.k)
    r = graph.meas - pred
    norm = jnp.linalg.norm(r, axis=-1)
    active = (state.active > 0).astype(norm.dtype)
    norm = jnp.where(state.active > 0, norm, 0.0)
    n_active = jnp.sum(active)
    sum_norm = jnp.sum(norm)
    cost = 0.5 * jnp.sum(norm * norm)
    if axis_name is not None:
        n_active, sum_norm, cost = jax.lax.psum(
            (n_active, sum_norm, cost), axis_name)
    mean_err = sum_norm / jnp.maximum(n_active, 1.0)
    return mean_err, cost


def diagnostics(
    state: GBPState, graph: GBPGraph, cfg: GBPConfig,
    axis_name: str | None = None,
) -> Diagnostics:
    err, cost = reprojection_error(state, graph, axis_name)
    n_relins = jnp.sum(
        (state.damping_count == -cfg.num_undamped_iters).astype(jnp.int32)
        * state.active.astype(jnp.int32))
    n_robust = jnp.sum((state.robust & (state.active > 0)).astype(jnp.int32))
    if axis_name is not None:
        n_relins, n_robust = jax.lax.psum((n_relins, n_robust), axis_name)
    return Diagnostics(err, cost, n_relins, n_robust)


# ---------------------------------------------------------------------------
# full solves
# ---------------------------------------------------------------------------

def initialise(
    state: GBPState, graph: GBPGraph, cfg: GBPConfig,
    axis_name: str | None = None,
) -> GBPState:
    """WRITE + LINEARISE: beliefs <- priors, then linearise every factor
    (reference: ba/ba.cpp:982-987)."""
    state = update_beliefs(state, graph, axis_name)
    return linearise_all(state, graph, cfg)


def iteration(
    state: GBPState, graph: GBPGraph, cfg: GBPConfig, i: jax.Array,
    axis_name: str | None = None,
) -> GBPState:
    """One scheduled solver iteration: weaken priors on every 2nd iteration
    (flag-gated, so annealing self-terminates after `steps` applications;
    reference: ba/ba.cpp:1003-1006), then one GBP sweep."""
    do_weaken = (i + 1) % 2 == 0
    state = jax.lax.cond(
        do_weaken, lambda s: weaken_priors(s, graph, axis_name),
        lambda s: s, state)
    return gbp_sweep(state, graph, cfg, axis_name)


def run_gbp(
    state: GBPState,
    graph: GBPGraph,
    cfg: GBPConfig,
    n_iters: int,
    with_diagnostics: bool = True,
    iter_offset: jax.Array | int = 0,
    axis_name: str | None = None,
):
    """Run `n_iters` GBP iterations as one lax.scan on device.

    Returns (final_state, Diagnostics stacked over iterations) — the per-iter
    telemetry the reference prints from the host each sweep
    (reference: ba/ba.cpp:1022-1028) without any per-iter host round-trip.
    """

    def body(s, i):
        s = iteration(s, graph, cfg, i + iter_offset, axis_name)
        out = diagnostics(s, graph, cfg, axis_name) if with_diagnostics else None
        return s, out

    return jax.lax.scan(body, state, jnp.arange(n_iters))


def solve(
    problem_state: GBPState,
    graph: GBPGraph,
    cfg: GBPConfig,
    n_iters: int | None = None,
    axis_name: str | None = None,
):
    """Full batch-BA solve: initialise + scan. Jit-compatible end to end."""
    n = cfg.n_iters if n_iters is None else n_iters
    state = initialise(problem_state, graph, cfg, axis_name)
    return run_gbp(state, graph, cfg, n, axis_name=axis_name)
