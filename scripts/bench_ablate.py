"""Sweep-cost ablation at a given scale: where do the milliseconds go?

Times (chained scan, min of 3) four programs at the same problem size:
  full    — the real gbp_sweep (gathers + edge kernel + reduction)
  kernel  — edge_math kernel only (beliefs pre-gathered once, held fixed)
  gather  — the two belief gathers only
  reduce  — update_beliefs only (messages held fixed)

Each variant threads its outputs back into the next iteration's inputs so
XLA cannot dead-code or hoist the work out of the scan.

    python scripts/bench_ablate.py [ladybug|fr1xyz|...] [n_sweeps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gbp_poplar_tpu.drivers.common import maybe_force_platform  # noqa: E402

maybe_force_platform()

import jax
import jax.numpy as jnp

from gbp_poplar_tpu.config import GBPConfig
from gbp_poplar_tpu.core import build_graph, gbp, init_state
from gbp_poplar_tpu.utils import balio


def timed(fn, arg, k, reps=3):
    out = fn(arg)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        ts.append(time.perf_counter() - t0)
    return min(ts) / k * 1e3


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "ladybug"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    if name == "ladybug":
        prob = balio.synthetic_problem_large(1723, 156000, 7)
    else:
        prob = balio.load_bal(name)
    cfg = GBPConfig()
    graph = build_graph(prob, cfg)
    state = jax.jit(lambda s: gbp.initialise(s, graph, cfg))(
        init_state(prob, cfg))
    print(f"{name}: E={graph.n_edges} C={graph.n_keyframes} "
          f"L={graph.n_points} backend={jax.default_backend()}")

    @jax.jit
    def full(s):
        return jax.lax.scan(
            lambda c, _: (gbp.gbp_sweep(c, graph, cfg), None),
            s, None, length=k)[0]

    # --- kernel only: gather once outside, scan the fused edge kernel ---
    bc0 = jnp.take(jnp.concatenate([state.cam_eta, state.cam_lam]),
                   graph.cam_idx, axis=1)
    bl0 = jnp.take(jnp.concatenate([state.lmk_eta, state.lmk_lam]),
                   graph.lmk_idx, axis=1)

    def kernel_body(s, _):
        inputs = (bc0, bl0, graph.meas, graph.meas_var,
                  s.f_eta_c, s.f_eta_l, s.f_lam_cc, s.f_lam_cl, s.f_lam_ll,
                  s.msg_c_eta, s.msg_c_lam, s.msg_l_eta, s.msg_l_lam,
                  s.damping, s.damping_count, s.mu, s.lin_mu,
                  s.robust, s.active)
        if gbp._use_pallas(cfg):
            from gbp_poplar_tpu.ops.sweep_kernel import sweep_edge_math_pallas
            outs = sweep_edge_math_pallas(inputs, graph.k, cfg)
        else:
            outs = gbp.edge_math(*inputs, graph.k, cfg)
        (f_eta_c, f_eta_l, f_lam_cc, f_lam_cl, f_lam_ll,
         msg_c_eta, msg_c_lam, msg_l_eta, msg_l_lam,
         damping, damping_count, new_mu, lin_mu, robust) = outs
        return s._replace(
            f_eta_c=f_eta_c, f_eta_l=f_eta_l, f_lam_cc=f_lam_cc,
            f_lam_cl=f_lam_cl, f_lam_ll=f_lam_ll,
            msg_c_eta=msg_c_eta, msg_c_lam=msg_c_lam,
            msg_l_eta=msg_l_eta, msg_l_lam=msg_l_lam,
            damping=damping[0], damping_count=damping_count[0],
            mu=new_mu, lin_mu=lin_mu, robust=robust[0]), None

    kernel = jax.jit(lambda s: jax.lax.scan(kernel_body, s, None,
                                            length=k)[0])

    # --- gathers only (output feeds back through the beliefs) ---
    def gather_body(s, _):
        bc = jnp.take(jnp.concatenate([s.cam_eta, s.cam_lam]),
                      graph.cam_idx, axis=1)
        bl = jnp.take(jnp.concatenate([s.lmk_eta, s.lmk_lam]),
                      graph.lmk_idx, axis=1)
        tick = 1.0 + 1e-30 * (bc[0, 0] + bl[0, 0])
        return s._replace(cam_eta=s.cam_eta * tick,
                          lmk_eta=s.lmk_eta * tick), None

    gather = jax.jit(lambda s: jax.lax.scan(gather_body, s, None,
                                            length=k)[0])

    # --- reduction only (messages perturbed by the produced beliefs) ---
    def reduce_body(s, _):
        s2 = gbp.update_beliefs(s, graph)
        tick = 1.0 + 1e-30 * s2.cam_eta[0, 0]
        return s2._replace(msg_c_eta=s.msg_c_eta * tick), None

    reduce = jax.jit(lambda s: jax.lax.scan(reduce_body, s, None,
                                            length=k)[0])

    # --- pairwise compositions to localise interaction costs ---
    def gk_body(s, _):
        bc = jnp.take(jnp.concatenate([s.cam_eta, s.cam_lam]),
                      graph.cam_idx, axis=1)
        bl = jnp.take(jnp.concatenate([s.lmk_eta, s.lmk_lam]),
                      graph.lmk_idx, axis=1)
        inputs = (bc, bl, graph.meas, graph.meas_var,
                  s.f_eta_c, s.f_eta_l, s.f_lam_cc, s.f_lam_cl, s.f_lam_ll,
                  s.msg_c_eta, s.msg_c_lam, s.msg_l_eta, s.msg_l_lam,
                  s.damping, s.damping_count, s.mu, s.lin_mu,
                  s.robust, s.active)
        if gbp._use_pallas(cfg):
            from gbp_poplar_tpu.ops.sweep_kernel import sweep_edge_math_pallas
            outs = sweep_edge_math_pallas(inputs, graph.k, cfg)
        else:
            outs = gbp.edge_math(*inputs, graph.k, cfg)
        s = s._replace(msg_c_eta=outs[5], msg_c_lam=outs[6],
                       msg_l_eta=outs[7], msg_l_lam=outs[8],
                       cam_eta=s.cam_eta * (1 + 1e-30 * outs[5][0, 0]))
        return s, None

    gk = jax.jit(lambda s: jax.lax.scan(gk_body, s, None, length=k)[0])

    def kr_body(s, _):
        inputs = (bc0, bl0, graph.meas, graph.meas_var,
                  s.f_eta_c, s.f_eta_l, s.f_lam_cc, s.f_lam_cl, s.f_lam_ll,
                  s.msg_c_eta, s.msg_c_lam, s.msg_l_eta, s.msg_l_lam,
                  s.damping, s.damping_count, s.mu, s.lin_mu,
                  s.robust, s.active)
        if gbp._use_pallas(cfg):
            from gbp_poplar_tpu.ops.sweep_kernel import sweep_edge_math_pallas
            outs = sweep_edge_math_pallas(inputs, graph.k, cfg)
        else:
            outs = gbp.edge_math(*inputs, graph.k, cfg)
        s = s._replace(msg_c_eta=outs[5], msg_c_lam=outs[6],
                       msg_l_eta=outs[7], msg_l_lam=outs[8])
        return gbp.update_beliefs(s, graph), None

    kr = jax.jit(lambda s: jax.lax.scan(kr_body, s, None, length=k)[0])

    for nm, fn in [("full", full), ("kernel", kernel),
                   ("gather", gather), ("reduce", reduce),
                   ("gath+kern", gk), ("kern+red", kr)]:
        print(f"  {nm:9s} {timed(fn, state, k):8.3f} ms/sweep", flush=True)


if __name__ == "__main__":
    main()
