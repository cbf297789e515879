"""Incremental SLAM driver (TPU equivalent of the reference `slam` binary,
ba/slam.cpp:479-1135).

    python -m gbp_poplar_tpu.drivers.slam --bal_file fr2robot2 \
        --iters_between_kfs 700

Keyframes activate one at a time; each new keyframe's prior is handed off
from the previous keyframe's converged belief, newly observed landmarks
start at --avdepth on the previous keyframe's optic axis (all on device,
core/slam.py).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..core import build_graph, init_state, slam
from ..utils import analysis, balio, checkpoint, evaluation, flags as flags_lib, priors
from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Incremental GBP SLAM on TPU")
    common.add_common_args(p)
    p.add_argument("--iters_between_kfs", type=int, default=700)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    common.maybe_force_platform()
    # Incremental solves are stabilised by drift-triggered relinearisation +
    # PSD-preserving Lambda damping (late keyframes otherwise oscillate on
    # fr2robot2); --relin_drift 0 --no_lambda_damping restores the exact
    # reference schedule.
    cfg, init_cfg = common.config_from_args(
        args, default_relin_drift=0.05, default_lambda_damping=True)

    problem = balio.load_bal(args.bal_file)
    problem = priors.apply_init_noise(problem, init_cfg,
                                      k_anchor=cfg.num_anchor_cams)
    print(f"{args.bal_file}: {problem.n_keyframes} keyframes, "
          f"{problem.n_points} landmarks, {problem.n_edges} edges "
          f"({args.iters_between_kfs} iters/keyframe)", file=sys.stderr)

    graph = build_graph(problem, cfg)
    flags = flags_lib.create_flags(problem, cfg.steps)
    state = init_state(problem, cfg, flags=flags)

    step = {"i": 0}

    def progress(k, errs):
        n = errs.shape[0]
        stride = max(1, args.print_every)
        for j in range(0, n, stride):
            common.print_iteration(step["i"] + j, errs[j], float("nan"), 0, 0)
        step["i"] += n
        if k + 1 < problem.n_keyframes:
            print(f"-- keyframe {k + 1} inserted --", file=sys.stderr)

    t0 = time.perf_counter()
    result = slam.solve_slam(
        state, graph, cfg,
        iters_between_kfs=args.iters_between_kfs,
        av_depth=args.avdepth,
        progress=progress)
    dt = time.perf_counter() - t0
    total_iters = (problem.n_keyframes - 1) * args.iters_between_kfs
    print(f"total {dt:.3f}s, {total_iters / dt:.1f} sweeps/s",
          file=sys.stderr)

    cam_mu, lmk_mu = analysis.belief_means(result.state)
    if args.v:
        np.set_printoptions(precision=5, suppress=True)
        print("cam means:\n", cam_mu)
    if args.save_traj:
        evaluation.export_tum(args.save_traj, cam_mu)
        print(f"trajectory written to {args.save_traj}", file=sys.stderr)
    if args.checkpoint:
        checkpoint.save_checkpoint(args.checkpoint, result.state, graph,
                                   step=total_iters, cfg=cfg)
        print(f"checkpoint written to {args.checkpoint}", file=sys.stderr)
    final_err = result.reproj_err[-1, -10:].mean()
    print(f"final reprojection error: {final_err:.5f} px", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
