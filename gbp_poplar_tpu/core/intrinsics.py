"""Per-camera intrinsics refinement for Snavely/BAL problems.

Real BAL workflows optimise the 9-parameter camera (pose + f, k1, k2);
the GBP message dimensions here are fixed at 6/3 DoF, so intrinsics are
refined by BLOCK-COORDINATE DESCENT instead: between GBP execution chunks
the ba driver solves, per camera, the tiny 3-parameter damped Gauss-Newton
system for (f, k1, k2) at the current belief means — one batched
segment-sum assembly + a [C, 3, 3] solve — and accepts the step only when
the on-device MAP objective decreases. Poses/landmarks and intrinsics thus
descend the same robust objective alternately; at the joint optimum both
steps are zero.

The reference has no counterpart (its camera model has no distortion and
intrinsics are shared constants); this exists so original BAL datasets —
whose shipped intrinsics are themselves estimates — can be solved to their
usual Ceres-style quality. Everything is jit-compatible; the per-edge
gradient of the Snavely model wrt (f, k1, k2) is closed-form:

  uv = f * dist(rho) * p,  dist = 1 + k1 rho + k2 rho^2,  p = -(x/z, y/z)
  d uv / d f  = dist * p
  d uv / d k1 = f * rho * p
  d uv / d k2 = f * rho^2 * p
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import GBPConfig
from ..ops import lie
from .factor_graph import GBPGraph, GBPState
from . import gbp


def refit_intrinsics(
    state: GBPState, graph: GBPGraph, cfg: GBPConfig,
) -> tuple[jax.Array, jax.Array]:
    """One damped GN step on every camera's (f, k1, k2) at current means.

    ``graph.intr`` must be present ([3, E] per-edge planes). Returns
    (new_intr [3, E], accepted bool) — new_intr equals graph.intr when the
    candidate step does not decrease the MAP objective (map_cost with the
    updated graph), so the GBP fixed point is preserved.
    """
    assert graph.intr is not None, "refit_intrinsics needs a Snavely problem"
    c = graph.n_keyframes
    cam_mu, lmk_mu = gbp._variable_means(state)       # [6, C], [3, L]
    cam_e = cam_mu.T[graph.cam_idx]                   # [E, 6]
    lmk_e = lmk_mu.T[graph.lmk_idx]                   # [E, 3]
    f, k1, k2 = graph.intr                            # [E] each

    y_cf = lie.w2c_apply(cam_e, lmk_e)                # [E, 3]
    z = y_cf[..., 2]
    px = -y_cf[..., 0] / z
    py = -y_cf[..., 1] / z
    rho = px * px + py * py
    dist = 1.0 + rho * (k1 + k2 * rho)
    u = f * dist * px
    v = f * dist * py
    ru = graph.meas[0] - u
    rv = graph.meas[1] - v

    # Huber-IRLS weight at the current residual (same inflation rule as the
    # factors, ops/projection.huber_meas_var)
    err = jnp.sqrt(ru * ru + rv * rv)
    sigma = jnp.sqrt(graph.meas_var)
    nstds = cfg.huber_nstds
    robust = err > nstds * sigma
    denom = 2.0 * (nstds * sigma * err - 0.5 * nstds * nstds * graph.meas_var)
    var = jnp.where(robust,
                    graph.meas_var * err * err / jnp.where(robust, denom, 1.0),
                    graph.meas_var)
    ok = ((state.active > 0) & (jnp.abs(z) > cfg.min_depth)
          & jnp.isfinite(err) & jnp.isfinite(rho))
    w = jnp.where(ok, 1.0 / var, 0.0)                 # [E]

    # J[e] = d(u,v)/d(f,k1,k2): rows built from the closed forms above
    ju = jnp.stack([dist * px, f * rho * px, f * rho * rho * px], -1)
    jv = jnp.stack([dist * py, f * rho * py, f * rho * rho * py], -1)
    ju = jnp.where(ok[:, None] & jnp.isfinite(ju), ju, 0.0)
    jv = jnp.where(ok[:, None] & jnp.isfinite(jv), jv, 0.0)
    ru = jnp.where(ok & jnp.isfinite(ru), ru, 0.0)
    rv = jnp.where(ok & jnp.isfinite(rv), rv, 0.0)

    jtj = (ju[:, :, None] * ju[:, None, :]
           + jv[:, :, None] * jv[:, None, :]) * w[:, None, None]
    jtr = (ju * ru[:, None] + jv * rv[:, None]) * w[:, None]
    a = jax.ops.segment_sum(jtj, graph.cam_idx, num_segments=c)   # [C,3,3]
    b = jax.ops.segment_sum(jtr, graph.cam_idx, num_segments=c)   # [C,3]

    # damped solve; cameras with no active edges get delta ~ 0
    diag = jnp.diagonal(a, axis1=-2, axis2=-1)
    damp = 1e-3 * jnp.maximum(diag, 1e-8) + 1e-8
    a = a + jax.vmap(jnp.diag)(damp)
    fin = jnp.all(jnp.isfinite(a), axis=(-2, -1)) & jnp.all(
        jnp.isfinite(b), axis=-1)
    a = jnp.where(fin[:, None, None], a,
                  jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), a.shape))
    b = jnp.where(fin[:, None], b, 0.0)
    delta = jnp.linalg.solve(a, b[..., None])[..., 0]             # [C, 3]
    delta = jnp.where(jnp.isfinite(delta), delta, 0.0)

    per_cam = jnp.stack(
        [jax.ops.segment_max(f, graph.cam_idx, num_segments=c),
         jax.ops.segment_max(k1, graph.cam_idx, num_segments=c),
         jax.ops.segment_max(k2, graph.cam_idx, num_segments=c)], -1)
    per_cam = jnp.where(jnp.isfinite(per_cam), per_cam, 0.0)

    def candidate(scale):
        new = per_cam + scale * delta
        # keep the focal positive (a sign flip is never a descent direction
        # the quadratic model can be trusted on)
        new = new.at[:, 0].set(jnp.maximum(new[:, 0], 1.0))
        return new

    def cost_of(per_cam_new):
        intr_new = per_cam_new[graph.cam_idx].T        # [3, E]
        return gbp.map_cost(state, graph._replace(intr=intr_new), cfg)

    cost0 = gbp.map_cost(state, graph, cfg)
    cand1 = candidate(1.0)
    cand2 = candidate(0.25)
    c1 = cost_of(cand1)
    c2 = cost_of(cand2)
    best = jnp.where(c1 <= c2, c1, c2)
    pick = jnp.where(c1 <= c2, cand1, cand2)       # scalar cond broadcasts
    accepted = jnp.isfinite(best) & (best < cost0)
    new_per_cam = jnp.where(accepted, pick, per_cam)
    return new_per_cam[graph.cam_idx].T, accepted
