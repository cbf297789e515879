"""Sharded solver == single-device solver, numerically.

Runs on the virtual 8-device CPU mesh configured in conftest.py. The sharded
path reuses the exact single-chip sweep code with one psum added to the
belief reduction, so results should agree to float32 reduction-order noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gbp_poplar_tpu.config import GBPConfig
from gbp_poplar_tpu.core import build_graph, init_state, gbp
from gbp_poplar_tpu.parallel import (
    make_mesh, make_sharded_solver, pad_edges,
)


@pytest.fixture(scope="module")
def problem(synthetic):
    return synthetic


def _solve_single(problem, cfg, n_iters):
    graph = build_graph(problem, cfg)
    state = init_state(problem, cfg)
    run = jax.jit(lambda s: gbp.solve(s, graph, cfg, n_iters=n_iters))
    return run(state)


def _solve_sharded(problem, cfg, n_iters, n_devices):
    mesh = make_mesh(n_devices)
    solver = make_sharded_solver(mesh, cfg)
    graph = build_graph(problem, cfg)
    state = init_state(problem, cfg)
    graph, state = solver.prepare(graph, state)
    return solver.solve(state, graph, n_iters)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_single_sweep_close(problem, n_devices):
    """One initialise + sweep: sharded == single up to fp32 psum
    reduction-order noise (partial per-shard segment sums are summed in a
    different order than one global segment_sum)."""
    assert len(jax.devices()) >= n_devices, "conftest should force 8 CPU devices"
    cfg = GBPConfig()
    # drop the one-hot camera reduction so both sides sum in segment order
    graph = build_graph(problem, cfg)._replace(cam_onehot=None)
    state = init_state(problem, cfg)
    s1 = gbp.gbp_sweep(gbp.initialise(state, graph, cfg), graph, cfg)

    mesh = make_mesh(n_devices)
    solver = make_sharded_solver(mesh, cfg)
    g2, st2 = solver.prepare(graph, state)
    s2 = solver.sweep(solver.initialise(st2, g2), g2)

    # fp32 + different XLA compilations (per-shard body vs global fusion)
    # contract differently; 1e-4 of the max is well below any structural
    # error and well above benign rounding noise.
    scale = np.abs(np.asarray(s1.cam_eta)).max()
    np.testing.assert_allclose(
        np.asarray(s2.cam_eta) / scale, np.asarray(s1.cam_eta) / scale,
        rtol=0, atol=1e-4)
    e = problem.n_edges
    mscale = np.abs(np.asarray(s1.msg_c_eta)).max()
    np.testing.assert_allclose(
        np.asarray(s2.msg_c_eta)[:, :e] / mscale,
        np.asarray(s1.msg_c_eta)[:, :e] / mscale, rtol=0, atol=1e-4)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_converges_like_single(problem, n_devices):
    """Full solve: the discrete relin/robust state machine makes long fp32
    runs bitwise-divergent between reduction orders, so compare converged
    solution quality, not raw state."""
    cfg = GBPConfig()
    n_iters = 80
    _, diag_s = _solve_single(problem, cfg, n_iters)
    _, diag_p = _solve_sharded(problem, cfg, n_iters, n_devices)

    err_s = np.asarray(diag_s.reproj_err)
    err_p = np.asarray(diag_p.reproj_err)
    assert np.isfinite(err_p).all()
    # same converged reprojection error (px) within a few percent
    tail_s, tail_p = err_s[-10:].mean(), err_p[-10:].mean()
    assert abs(tail_p - tail_s) < 0.05 * max(tail_s, 1e-3) + 5e-3


def test_padding_is_inert(problem):
    """Padded inactive edges contribute nothing to beliefs."""
    cfg = GBPConfig()
    # pad_edges drops the one-hot camera reduction; drop it from the
    # unpadded graph too so both sides reduce in the same order
    graph = build_graph(problem, cfg)._replace(cam_onehot=None)
    state = init_state(problem, cfg)
    graph_p, state_p, pad = pad_edges(graph, state, 7)
    assert pad > 0 and graph_p.n_edges % 7 == 0

    run = jax.jit(lambda s, g: gbp.solve(s, g, cfg, n_iters=10))
    final_a, diag_a = run(state, graph)
    final_b, diag_b = run(state_p, graph_p)
    # different edge extents compile to different fusions -> fp32
    # contraction noise; padding being *inert* is the exact-zero check below
    np.testing.assert_allclose(
        np.asarray(diag_b.reproj_err), np.asarray(diag_a.reproj_err),
        rtol=1e-4, atol=1e-4)
    scale = np.abs(np.asarray(final_a.cam_eta)).max()
    np.testing.assert_allclose(
        np.asarray(final_b.cam_eta) / scale,
        np.asarray(final_a.cam_eta) / scale, rtol=0, atol=1e-4)
    # padding edges never emitted a message
    assert np.all(np.asarray(final_b.msg_c_eta)[:, problem.n_edges:] == 0.0)


def test_sharded_sweep_and_init(problem):
    """Piecewise entry points (initialise + sweep) compose like solve."""
    cfg = GBPConfig()
    mesh = make_mesh(4)
    solver = make_sharded_solver(mesh, cfg)
    graph = build_graph(problem, cfg)
    state = init_state(problem, cfg)
    graph, state = solver.prepare(graph, state)
    state = solver.initialise(state, graph)
    state = solver.sweep(state, graph)
    assert np.isfinite(np.asarray(state.cam_eta)).all()


def test_sharded_pallas_on_tpu():
    """The Pallas sweep kernel must compile and converge inside shard_map
    (the multi-chip execution path; interpreted off-TPU so CI covers it)."""
    from gbp_poplar_tpu.utils import balio
    prob = balio.synthetic_problem(n_keyframes=6, n_points=60, seed=0,
                                   pixel_noise=0.5)
    on_tpu = jax.default_backend() == "tpu"
    cfg = GBPConfig(use_pallas=True if on_tpu else "interpret",
                    edge_pad_multiple=256, pallas_block_edges=256)
    mesh = make_mesh(1)
    solver = make_sharded_solver(mesh, cfg)
    graph, state = solver.prepare(build_graph(prob, cfg),
                                  init_state(prob, cfg))
    final, diag = solver.solve(state, graph, 60)
    errs = np.asarray(diag.reproj_err)
    assert np.isfinite(errs).all()
    assert errs[-1] < errs[0]


@pytest.mark.parametrize("n_devices", [2, 4])
def test_sharded_fused_kernel_path(problem, n_devices):
    """Multi-chip runs the SAME fused sweep kernel as single-chip (the
    reference compiles one set of codelets for any --ipus N,
    ba/ba.cpp:614-649): prepare() must rebuild per-shard windows, the
    sharded sweep must take the fused path, and one initialise+sweep must
    match the single-chip fused sweep to fp32 reduction-order noise."""
    cfg = GBPConfig(use_pallas="interpret")
    graph = build_graph(problem, cfg)
    assert graph.cam_win is not None       # single-chip fused available
    state = init_state(problem, cfg)
    s1 = gbp.gbp_sweep(gbp.initialise(state, graph, cfg), graph, cfg)

    mesh = make_mesh(n_devices)
    solver = make_sharded_solver(mesh, cfg)
    g2, st2 = solver.prepare(build_graph(problem, cfg),
                             init_state(problem, cfg))
    # the windows survived sharding -> gbp_sweep takes the fused branch
    assert g2.cam_win is not None and g2.lmk_win is not None
    assert g2.cam_win.base.shape[0] % n_devices == 0
    s2 = solver.sweep(solver.initialise(st2, g2), g2)

    scale = np.abs(np.asarray(s1.cam_eta)).max()
    np.testing.assert_allclose(
        np.asarray(s2.cam_eta) / scale, np.asarray(s1.cam_eta) / scale,
        rtol=0, atol=1e-4)
    lscale = np.abs(np.asarray(s1.lmk_eta)).max()
    np.testing.assert_allclose(
        np.asarray(s2.lmk_eta) / lscale, np.asarray(s1.lmk_eta) / lscale,
        rtol=0, atol=1e-4)
    e = problem.n_edges
    mscale = np.abs(np.asarray(s1.msg_c_eta)).max()
    np.testing.assert_allclose(
        np.asarray(s2.msg_c_eta)[:, :e] / mscale,
        np.asarray(s1.msg_c_eta)[:, :e] / mscale, rtol=0, atol=1e-4)


@pytest.mark.parametrize("n_devices", [2, 4])
def test_map_sharded_fused_kernel_path(problem, n_devices):
    """Map-partitioned mode also runs the fused kernel per shard; beliefs
    after initialise + 1 iteration match single-chip (landmark axis is the
    global order plus trailing dummy padding)."""
    from gbp_poplar_tpu.parallel import make_map_sharded_solver
    cfg = GBPConfig(use_pallas="interpret")
    graph = build_graph(problem, cfg)
    state = init_state(problem, cfg)
    _, diag1 = jax.jit(lambda s: gbp.solve(s, graph, cfg, n_iters=1))(state)

    mesh = make_mesh(n_devices)
    solver = make_map_sharded_solver(mesh, cfg)
    g2, st2 = solver.prepare(build_graph(problem, cfg),
                             init_state(problem, cfg))
    assert g2.cam_win is not None and g2.lmk_win is not None
    _, diag2 = solver.solve(st2, g2, 1)
    np.testing.assert_allclose(
        np.asarray(diag2.reproj_err), np.asarray(diag1.reproj_err),
        rtol=1e-4, atol=1e-5)


def test_stacked_window_invariants(problem):
    """Every real edge's variable id lies inside its block's window on
    every shard, for both sharding modes (the structural guarantee the
    in-kernel one-hot gather/reduce depends on)."""
    from gbp_poplar_tpu.parallel import partition_by_landmark
    from gbp_poplar_tpu.parallel.sharding import real_edge_count

    def check(idx, base, w, be, k):
        idx = np.asarray(idx)
        base = np.asarray(base)
        for b in range(len(base)):
            blk = idx[b * be:(b + 1) * be]
            if blk.size == 0:
                continue
            lo = 0 if k == -1 else base[b]
            assert blk.min() >= lo and blk.max() < lo + w, (
                f"block {b}: ids [{blk.min()}, {blk.max()}] outside "
                f"window [{lo}, {lo + w})")

    cfg = GBPConfig()
    n = 4
    graph = build_graph(problem, cfg)
    state = init_state(problem, cfg)

    # edge-sharded: global order split at shard boundaries
    g2, _, _ = pad_edges(graph, state, n, cfg)
    e_loc = g2.n_edges // n
    real = real_edge_count(g2.cam_idx, g2.lmk_idx)
    nb = g2.cam_win.base.shape[0] // n
    be = g2.cam_win.block_edges
    for s in range(n):
        sl = slice(s * e_loc, min((s + 1) * e_loc, real))
        check(np.asarray(g2.cam_idx)[sl],
              np.asarray(g2.cam_win.base)[s * nb:(s + 1) * nb],
              g2.cam_win.w, be, g2.cam_win.k)
        check(np.asarray(g2.lmk_idx)[sl],
              np.asarray(g2.lmk_win.base)[s * nb:(s + 1) * nb],
              g2.lmk_win.w, be, g2.lmk_win.k)

    # map-partitioned: block-local landmark ids, replicated cams
    g3, s3 = partition_by_landmark(graph, state, n, cfg)
    e_blk = g3.n_edges // n
    nb3 = g3.lmk_win.base.shape[0] // n
    be3 = g3.lmk_win.block_edges
    act = np.asarray(s3.active) > 0
    for s in range(n):
        sl = slice(s * e_blk, (s + 1) * e_blk)
        m = act[sl]
        li = np.asarray(g3.lmk_idx)[sl][m]
        ci = np.asarray(g3.cam_idx)[sl][m]
        if li.size == 0:
            continue
        # per-block check needs the in-block position of each active edge
        pos = np.flatnonzero(m)
        for b in range(nb3):
            inb = (pos >= b * be3) & (pos < (b + 1) * be3)
            if not inb.any():
                continue
            lo_l = (0 if g3.lmk_win.k == -1
                    else np.asarray(g3.lmk_win.base)[s * nb3 + b])
            lo_c = (0 if g3.cam_win.k == -1
                    else np.asarray(g3.cam_win.base)[s * nb3 + b])
            assert li[inb].min() >= lo_l
            assert li[inb].max() < lo_l + g3.lmk_win.w
            assert ci[inb].min() >= lo_c
            assert ci[inb].max() < lo_c + g3.cam_win.w


@pytest.mark.parametrize("n_devices", [2, 8])
def test_map_sharded_converges_like_single(problem, n_devices):
    """Map-partitioned mode (landmark blocks sharded, keyframes boundary):
    same converged quality as the single-device solver."""
    from gbp_poplar_tpu.parallel import make_map_sharded_solver
    cfg = GBPConfig()
    n_iters = 80
    _, diag_s = _solve_single(problem, cfg, n_iters)
    err_s = np.asarray(diag_s.reproj_err)

    mesh = make_mesh(n_devices)
    solver = make_map_sharded_solver(mesh, cfg)
    graph, state = solver.prepare(build_graph(problem, cfg),
                                  init_state(problem, cfg))
    _, diag_p = solver.solve(state, graph, n_iters)
    err_p = np.asarray(diag_p.reproj_err)
    assert np.isfinite(err_p).all()
    tail_s, tail_p = err_s[-10:].mean(), err_p[-10:].mean()
    assert abs(tail_p - tail_s) < 0.05 * max(tail_s, 1e-3) + 5e-3


def test_partition_by_landmark_bookkeeping(problem):
    """Each shard owns a contiguous landmark block + exactly its edges."""
    from gbp_poplar_tpu.parallel import partition_by_landmark
    cfg = GBPConfig()
    graph = build_graph(problem, cfg)
    state = init_state(problem, cfg)
    n = 4
    g2, s2 = partition_by_landmark(graph, state, n)
    l_blk = g2.n_points // n
    assert g2.n_points % n == 0 and g2.n_edges % n == 0
    e_blk = g2.n_edges // n
    lmk_local = np.asarray(g2.lmk_idx)
    active = np.asarray(s2.active)
    # local landmark ids stay within the block; active edge count preserved
    assert (lmk_local[active > 0] < l_blk).all()
    assert active.sum() == np.asarray(state.active).sum()
    # reconstruct global ids and compare edge multisets
    shard_of = np.repeat(np.arange(n), e_blk)
    glob = lmk_local + shard_of * l_blk
    got = sorted(zip(np.asarray(g2.cam_idx)[active > 0],
                     glob[active > 0]))
    act0 = np.asarray(state.active) > 0
    want = sorted(zip(np.asarray(graph.cam_idx)[act0],
                      np.asarray(graph.lmk_idx)[act0]))
    assert got == want


def test_map_sharded_slam(problem):
    """Incremental keyframe insertion under the map-partitioned sharding."""
    from gbp_poplar_tpu.parallel import make_map_sharded_solver
    from gbp_poplar_tpu.utils import flags as flags_lib
    cfg = GBPConfig()
    graph = build_graph(problem, cfg)
    flags = flags_lib.create_flags(problem, cfg.steps)
    state = init_state(problem, cfg, flags=flags)
    mesh = make_mesh(4)
    solver = make_map_sharded_solver(mesh, cfg)
    g2, st2 = solver.prepare(graph, state)
    st2 = solver.initialise(st2, g2)
    last = None
    for k in range(1, problem.n_keyframes):
        st2, diag = solver.run(st2, g2, 60, 0)
        last = np.asarray(diag.reproj_err)
        if k + 1 < problem.n_keyframes:
            st2 = solver.insert_keyframe(st2, g2, k + 1, 6.0)
    final = last[-10:].mean()
    assert np.isfinite(final) and final < 1.5


def test_rebuild_partitioned_windows(problem):
    """A map-sharded checkpoint drops the derived window structures; the
    resume path must re-derive per-shard stacked windows IDENTICAL to the
    ones partition_by_landmark built (drivers/slam.py --resume under
    --devices N must keep the fused sweep path)."""
    from gbp_poplar_tpu.parallel import partition_by_landmark
    from gbp_poplar_tpu.parallel.map_sharding import (
        rebuild_partitioned_windows,
    )

    def roundtrip(prob, n):
        cfg = GBPConfig()
        graph = build_graph(prob, cfg)
        state = init_state(prob, cfg)
        pg, _ = partition_by_landmark(graph, state, n, cfg)
        assert pg.cam_win is not None and pg.lmk_win is not None
        stripped = pg._replace(cam_win=None, lmk_win=None)
        rg = rebuild_partitioned_windows(stripped, n, cfg)
        for f in ("cam_win", "lmk_win"):
            a, b = getattr(pg, f), getattr(rg, f)
            assert b is not None
            assert (a.w, a.block_edges, a.stride, a.k) == \
                   (b.w, b.block_edges, b.stride, b.k)
            np.testing.assert_array_equal(np.asarray(a.base),
                                          np.asarray(b.base))
            np.testing.assert_array_equal(np.asarray(a.visited),
                                          np.asarray(b.visited))
        return pg

    roundtrip(problem, 4)

    # per-shard landmark block larger than the whole-table limit: the
    # rebuilt windows must be genuine grid windows, not a fallback
    from gbp_poplar_tpu.utils import balio
    big = balio.synthetic_problem_large(n_keyframes=40, n_points=9000,
                                        obs_per_lmk=4, seed=1)
    pg = roundtrip(big, 2)
    assert pg.lmk_win.k == 0
