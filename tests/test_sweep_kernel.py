"""Fused Pallas sweep kernel vs the pure-XLA oracle (core/gbp.edge_math).

The kernel body *is* edge_math, so parity here checks the blocking/padding/
brick plumbing of ops/sweep_kernel.py. Off-TPU the kernel runs through the
Pallas interpreter — every CI pass exercises the kernel code path, not just
hardware rounds (both brick strategies, padded and unpadded edge counts).
"""

import jax
import numpy as np
import pytest

from gbp_poplar_tpu.config import GBPConfig
from gbp_poplar_tpu.core import build_graph, gbp, init_state
from gbp_poplar_tpu.ops import planes as pl
from gbp_poplar_tpu.utils import balio

ON_TPU = jax.default_backend() == "tpu"
KERNEL = True if ON_TPU else "interpret"


def test_dot3_limb_exactness():
    """The 3-limb split contraction (sweep_kernel._dot3) is EXACT for
    one-hot gathers and matches a float64 reduction to f32 ulp for
    one-hot-grouped reductions — the TPU kernel's replacement for
    Precision.HIGHEST (interpret-mode kernels take the single_pass path,
    so the limb math is pinned here directly)."""
    import jax.numpy as jnp
    from gbp_poplar_tpu.ops.sweep_kernel import _dot3

    rng = np.random.default_rng(3)
    # values spanning many magnitudes — needs all 24 mantissa bits
    v = (rng.standard_normal((32, 64)) *
         10.0 ** rng.integers(-6, 6, (32, 64))).astype(np.float32)
    idx = rng.integers(0, 32, 128)
    oh = (np.arange(32)[:, None] == idx[None]).astype(np.float32)
    # limbs reconstruct v exactly
    hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    r = jnp.asarray(v) - hi
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r - mid
    np.testing.assert_array_equal(np.asarray(hi + mid + lo), v)
    # gather direction: window[:, comp] x one-hot -> bit-exact take
    g = _dot3(jnp.asarray(v), jnp.asarray(oh), (((0,), (0,)), ((), ())))
    np.testing.assert_array_equal(np.asarray(g), v[idx].T)
    # reduction direction: msg [comp, E] x oh^T [W, E] -> f64-level sums
    msg = rng.standard_normal((64, 128)).astype(np.float32)
    red = _dot3(jnp.asarray(msg), jnp.asarray(oh),
                (((1,), (1,)), ((), ())))
    want = msg.astype(np.float64) @ oh.T.astype(np.float64)
    np.testing.assert_allclose(np.asarray(red), want, rtol=0, atol=1e-4)
    # single_pass (interpreter path) agrees to summation order
    red1 = _dot3(jnp.asarray(msg), jnp.asarray(oh),
                 (((1,), (1,)), ((), ())), single_pass=True)
    np.testing.assert_allclose(np.asarray(red1), want, rtol=0, atol=1e-4)
    # the limb-STACKED fast path (free axis <= 42) must be bit-identical
    # to the explicit 3-pass loop it replaces, in both directions
    def loop3(val, dims):
        h = val.astype(jnp.bfloat16).astype(jnp.float32)
        rr = val - h
        m_ = rr.astype(jnp.bfloat16).astype(jnp.float32)
        l_ = rr - m_
        out = None
        for part in (h, m_, l_):
            d = jax.lax.dot_general(part, jnp.asarray(oh), dims,
                                    preferred_element_type=jnp.float32)
            out = d if out is None else out + d
        return out
    gather_dims = (((0,), (0,)), ((), ()))
    reduce_dims = (((1,), (1,)), ((), ()))
    vg = jnp.asarray(v[:, :32])     # free axis 32 -> stacked fast path
    np.testing.assert_array_equal(np.asarray(_dot3(vg, jnp.asarray(oh),
                                                   gather_dims)),
                                  np.asarray(loop3(vg, gather_dims)))
    mr = jnp.asarray(rng.standard_normal((27, 128)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(_dot3(mr, jnp.asarray(oh),
                                                   reduce_dims)),
                                  np.asarray(loop3(mr, reduce_dims)))


@pytest.fixture(scope="module")
def prob():
    return balio.synthetic_problem(n_keyframes=5, n_points=40, seed=4,
                                   pixel_noise=0.5)


def _sweep_pair(prob, **cfg_kw):
    """One warmed-up sweep through the oracle and the kernel paths.

    pallas_fused is off unless requested: the UNFUSED kernel runs the
    byte-identical reduction, so parity is bit-exact; the fused kernel's
    in-kernel one-hot reduction changes fp32 summation order (tested
    separately with a tolerance)."""
    cfg_kw.setdefault("pallas_fused", False)
    cfg_x = GBPConfig(use_pallas=False, **cfg_kw)
    cfg_p = GBPConfig(use_pallas=KERNEL, **cfg_kw)
    g = build_graph(prob, cfg_x)
    s0 = init_state(prob, cfg_x)
    s0 = jax.jit(lambda s: gbp.initialise(s, g, cfg_x))(s0)
    # a couple of oracle sweeps first so messages/damping state are non-trivial
    for _ in range(3):
        s0 = jax.jit(lambda s: gbp.gbp_sweep(s, g, cfg_x))(s0)
    s_x = jax.jit(lambda s: gbp.gbp_sweep(s, g, cfg_x))(s0)
    s_p = jax.jit(lambda s: gbp.gbp_sweep(s, g, cfg_p))(s0)
    return s_x, s_p


def _assert_state_close(s_x, s_p, atol=0.0):
    for f in s_x._fields:
        a, b = np.asarray(getattr(s_x, f)), np.asarray(getattr(s_p, f))
        np.testing.assert_allclose(b, a, rtol=0, atol=atol, err_msg=f)


def test_sweep_kernel_parity_hbm_brick(prob):
    """Small-E strategy: whole arrays pre-bricked in HBM."""
    s_x, s_p = _sweep_pair(prob, edge_pad_multiple=256,
                           pallas_block_edges=256,
                           pallas_hbm_brick_max_edges=1 << 20)
    _assert_state_close(s_x, s_p, atol=0.0 if not ON_TPU else 1e-4)


def test_sweep_kernel_parity_vmem_brick(prob):
    """Large-E strategy: per-block relayout inside the kernel."""
    s_x, s_p = _sweep_pair(prob, edge_pad_multiple=256,
                           pallas_block_edges=256,
                           pallas_hbm_brick_max_edges=0)
    _assert_state_close(s_x, s_p, atol=0.0 if not ON_TPU else 1e-4)


def test_sweep_kernel_parity_unaligned_edges(prob):
    """Edge count not a multiple of the kernel block: wrapper pads/slices."""
    s_x, s_p = _sweep_pair(prob, edge_pad_multiple=1,
                           pallas_block_edges=256)
    _assert_state_close(s_x, s_p, atol=0.0 if not ON_TPU else 1e-4)


def test_sweep_kernel_fused_parity(prob):
    """The FULLY-FUSED kernel (in-kernel windowed one-hot gather +
    reduction epilogue) matches the oracle up to fp32 summation order."""
    s_x, s_p = _sweep_pair(prob, edge_pad_multiple=256,
                           pallas_block_edges=256, pallas_fused=True)
    for f in s_x._fields:
        a = np.asarray(getattr(s_x, f)).astype(np.float64)
        b = np.asarray(getattr(s_p, f)).astype(np.float64)
        np.testing.assert_allclose(b, a, rtol=0, atol=2e-3 + 1e-4 *
                                   np.abs(a).max(), err_msg=f)


def test_sweep_kernel_short_solve(prob):
    """A short solve through the (fused) kernel path converges like the
    oracle."""
    cfg_p = GBPConfig(use_pallas=KERNEL, edge_pad_multiple=256,
                      pallas_block_edges=256)
    cfg_x = GBPConfig(use_pallas=False, edge_pad_multiple=256,
                      pallas_block_edges=256)
    g = build_graph(prob, cfg_x)
    s0 = init_state(prob, cfg_x)
    _, d_x = jax.jit(lambda s: gbp.solve(s, g, cfg_x, n_iters=30))(s0)
    _, d_p = jax.jit(lambda s: gbp.solve(s, g, cfg_p, n_iters=30))(s0)
    e_x = np.asarray(d_x.reproj_err)
    e_p = np.asarray(d_p.reproj_err)
    assert np.isfinite(e_p).all()
    # same trajectory up to fp32 fusion-order noise
    np.testing.assert_allclose(e_p[-1], e_x[-1], rtol=1e-2)
    assert e_p[-1] < e_p[0]


@pytest.fixture(scope="module")
def prob_grid():
    """Enough landmarks that the fused windows use the GRID path (cell-keyed
    window accumulation), not whole-table windows."""
    return balio.synthetic_problem_large(n_keyframes=24, n_points=2000,
                                         obs_per_lmk=4, seed=7,
                                         pixel_noise=0.5)


@pytest.mark.parametrize("chunked", [False, True])
def test_packed_carry_matches_plain(prob_grid, chunked):
    """run_gbp's packed edge-state hot scan (cfg.pallas_packed_carry, ONE
    [109, E] carry instead of 14 arrays — kills the per-sweep scan-carry
    copies XLA inserts in the chunked production loop) is bit-exact
    against the plain carry: the kernel slices the packed rows into the
    identical plane views.

    iter_offset is past the annealing warmup so the HOT scan actually runs
    (with offset 0 and n <= 2*steps every sweep takes the annealing body
    and neither carry engages — the original form of this test pinned
    nothing). ``chunked`` additionally drives the accel chunk path, whose
    packed body accumulates the premu table's PRE-sweep means (one solve
    per chunk instead of per sweep) — the accumulated averages, accepted
    jumps, and final states must stay bit-exact vs the plain body's
    post-sweep accumulation."""
    import dataclasses

    base = GBPConfig(use_pallas=KERNEL, edge_pad_multiple=256,
                     pallas_block_edges=256, pallas_fused=True)
    if chunked:
        base = dataclasses.replace(base, accel_every=4, accel_start=0)
    states = {}
    spy = {"n": 0}
    orig = gbp._gbp_sweep_fused_packed

    def spied(*a, **k):
        spy["n"] += 1
        return orig(*a, **k)

    gbp._gbp_sweep_fused_packed = spied
    try:
        for name, cfg in [
                ("packed", base),
                ("plain",
                 dataclasses.replace(base, pallas_packed_carry=False))]:
            g = build_graph(prob_grid, cfg)
            if name == "packed":
                assert g.cam_win is not None  # fused windows -> packed path
            s = init_state(prob_grid, cfg)
            s = jax.jit(lambda s: gbp.initialise(s, g, cfg))(s)
            n = 16 if chunked else 8
            before = spy["n"]
            s, d = jax.jit(
                lambda s: gbp.run_gbp(s, g, cfg, n, iter_offset=10))(s)
            if name == "packed":
                assert spy["n"] > before   # the packed hot scan traced
            states[name] = (s, np.asarray(d.reproj_err))
    finally:
        gbp._gbp_sweep_fused_packed = orig
    atol = 0.0 if not ON_TPU else 1e-5
    for f in states["plain"][0]._fields:
        a = np.asarray(getattr(states["plain"][0], f))
        b = np.asarray(getattr(states["packed"][0], f))
        np.testing.assert_allclose(b, a, rtol=0, atol=atol, err_msg=f)
    np.testing.assert_allclose(states["packed"][1], states["plain"][1],
                               rtol=0 if not ON_TPU else 1e-6)


@pytest.mark.parametrize("which", ["whole_table", "grid"])
def test_sweep_tables_matches_fused(prob, prob_grid, which):
    """The table-carried sweep (var-major kernel epilogue +
    combine_grid_var) computes the same beliefs as the plane-form fused
    sweep — same contraction per output element, transposed emit order."""
    p = prob if which == "whole_table" else prob_grid
    cfg = GBPConfig(use_pallas=KERNEL, edge_pad_multiple=256,
                    pallas_block_edges=256, pallas_fused=True)
    g = build_graph(p, cfg)
    if which == "grid":
        assert g.lmk_win is not None and g.lmk_win.k != -1
    s0 = init_state(p, cfg)
    s0 = jax.jit(lambda s: gbp.initialise(s, g, cfg))(s0)
    for _ in range(2):
        s0 = jax.jit(lambda s: gbp.gbp_sweep(s, g, cfg))(s0)
    s_f = jax.jit(lambda s: gbp.gbp_sweep(s, g, cfg))(s0)

    def tbl_step(s):
        tbls = gbp._make_tables(s, g, widths=(128, 128))
        ptbls = gbp._prior_tables(s, g)
        s, ct, lt = gbp._gbp_sweep_tables(s, *tbls, *ptbls, g, cfg)
        return gbp._beliefs_from_tables(s, g, ct, lt)

    s_t = jax.jit(tbl_step)(s0)
    atol = 0.0 if not ON_TPU else 1e-5
    for f in s_f._fields:
        a, b = np.asarray(getattr(s_f, f)), np.asarray(getattr(s_t, f))
        np.testing.assert_allclose(b, a, rtol=0, atol=atol, err_msg=f)


def test_table_carried_solve_matches_oracle(prob):
    """run_gbp's hot phase switches to the table-carried scan when
    cfg.table_carry is on; the solve trajectory must match the pure-XLA
    oracle up to fp32 summation order."""
    cfg_p = GBPConfig(use_pallas=KERNEL, edge_pad_multiple=256,
                      pallas_block_edges=256, table_carry=True)
    cfg_x = GBPConfig(use_pallas=False, edge_pad_multiple=256,
                      pallas_block_edges=256)
    g = build_graph(prob, cfg_x)
    assert gbp._table_carry_ok(g, cfg_p, None)
    s0 = init_state(prob, cfg_x)
    _, d_x = jax.jit(lambda s: gbp.solve(s, g, cfg_x, n_iters=60))(s0)
    _, d_p = jax.jit(lambda s: gbp.solve(s, g, cfg_p, n_iters=60))(s0)
    e_x = np.asarray(d_x.reproj_err)
    e_p = np.asarray(d_p.reproj_err)
    assert np.isfinite(e_p).all()
    np.testing.assert_allclose(e_p[-1], e_x[-1], rtol=1e-2)
    assert e_p[-1] < e_p[0]


def test_subblock_sweep_matches_big_window(prob_grid):
    """cfg.pallas_subblock: per-128-edge sub-windows with max-derived
    bases replace the [W, BE] one-hots. Gathers are value-exact, so every
    EDGE-state output is bit-identical to the big-window path; the belief
    sums differ only in fp32 accumulation order (per-sub-block partials
    vs one big contraction)."""
    import dataclasses

    base = GBPConfig(use_pallas=KERNEL, edge_pad_multiple=256,
                     pallas_block_edges=256, pallas_fused=True)
    g = build_graph(prob_grid, base)
    assert g.cam_win.sub_w > 0 and g.lmk_win.sub_w > 0
    s0 = init_state(prob_grid, base)
    s0 = jax.jit(lambda s: gbp.initialise(s, g, base))(s0)
    s_big = jax.jit(lambda s: gbp.gbp_sweep(s, g, base))(s0)
    cfg_sub = dataclasses.replace(base, pallas_subblock=True)
    s_sub = jax.jit(lambda s: gbp.gbp_sweep(s, g, cfg_sub))(s0)
    beliefs = {"cam_eta", "cam_lam", "lmk_eta", "lmk_lam"}
    for f in s_big._fields:
        a = np.asarray(getattr(s_big, f))
        b = np.asarray(getattr(s_sub, f))
        if f in beliefs:
            # belief sums over hundreds of edges: summation-order noise
            # scales with magnitude and edge degree
            np.testing.assert_allclose(b, a, rtol=3e-4, atol=1e-3,
                                       err_msg=f)
        else:
            np.testing.assert_array_equal(b, a, err_msg=f)


def test_lmk_table_kernel_matches_xla():
    """ops/table_kernel.build_lmk_table (interpreter) == the XLA
    _make_tables landmark chain: same cols, same sanitized means, same
    validity flags — including singular (zero-Lambda) and NaN-poisoned
    beliefs."""
    import jax.numpy as jnp

    from gbp_poplar_tpu.ops.table_kernel import build_lmk_table

    rng = np.random.default_rng(11)
    l, rows = 1000, 1024
    lam = rng.normal(0, 1, (6, l)).astype(np.float32)
    lam[:3] += 3.0                            # mostly well-conditioned
    eta = rng.normal(0, 1, (3, l)).astype(np.float32)
    lam[:, 17] = 0.0                          # singular -> inf/nan mean
    eta[0, 42] = np.nan                       # poisoned eta -> nan mean

    eta_j, lam_j = jnp.asarray(eta), jnp.asarray(lam)
    tbl, mu4 = build_lmk_table(eta_j, lam_j, rows, interpret=True)

    # XLA oracle: exactly what _make_tables does on the landmark side
    mu = pl.pack_vec(pl.matvec(pl.inv_sym3(pl.unpack_sym(lam_j, 3)),
                               pl.unpack_vec(eta_j, 3)))
    ok = jnp.all(jnp.isfinite(mu), axis=0, keepdims=True)
    mu_s = jnp.where(ok, mu, 0.0)
    cols = jnp.concatenate([eta_j, lam_j, mu_s, ok.astype(jnp.float32)])
    ref = jnp.pad(cols.T, [(0, rows - l), (0, 128 - 13)])

    t, r = np.asarray(tbl), np.asarray(ref)
    # eta/lambda columns and the validity flag are pure copies: bit-exact
    np.testing.assert_array_equal(t[:, :9], r[:, :9])
    np.testing.assert_array_equal(t[:, 12:], r[:, 12:])
    # mean columns: same expression, different fusion (brick layout).
    # fp32 solve error amplifies with the 3x3 condition number (verified:
    # the worst column here has cond 6e4 and kernel/XLA values straddle
    # the f64 truth) — bound the deviation per column by cond * 32 ulps
    conds = np.empty(l)
    for i in range(l):
        m = np.zeros((3, 3))
        for s, (a, b) in enumerate(pl.SYM3_IDX):
            m[a, b] = m[b, a] = lam[s, i]
        conds[i] = np.linalg.cond(m.astype(np.float64)) if lam[:, i].any() \
            else np.inf
    tol = np.maximum(conds, 1e2) * 32 * np.finfo(np.float32).eps
    dmu = np.abs(t[:l, 9:12] - r[:l, 9:12]) / (1.0 + np.abs(r[:l, 9:12]))
    viol = np.nan_to_num(dmu.max(axis=1)) > tol
    assert not viol.any(), np.flatnonzero(viol)[:5]
    dmu4 = (np.abs(np.asarray(mu4[:3, :l]) - np.asarray(mu_s))
            / (1.0 + np.abs(np.asarray(mu_s))))
    viol4 = np.nan_to_num(dmu4.max(axis=0)) > tol
    assert not viol4.any(), np.flatnonzero(viol4)[:5]
    np.testing.assert_array_equal(np.asarray(mu4[3, :l]),
                                  np.asarray(ok[0]).astype(np.float32))
    assert not np.asarray(tbl)[:, 13:].any()   # pad lanes stay zero
    ok_np = np.asarray(ok[0])
    assert not ok_np[17] and not ok_np[42] and ok_np.sum() > 990
