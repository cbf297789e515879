"""Blocked one-hot reduction: index-builder logic (NumPy) + kernel parity.

Kernel math runs every CI pass: on TPU natively, elsewhere through the
Pallas interpreter (`interpret=True`) — a kernel regression surfaces in the
CPU suite, not only on hardware rounds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gbp_poplar_tpu.ops import reduce_kernel as rk

# run kernels natively on TPU, interpreted elsewhere
INTERP = jax.default_backend() != "tpu"


def _oracle(planes, idx, n_var):
    out = np.zeros((planes.shape[0], n_var), planes.dtype)
    np.add.at(out.T, idx, np.asarray(planes).T)
    return out


def test_build_blocked_index_sorted():
    idx = np.repeat(np.arange(100), 11)     # 1100 edges, sorted
    b = rk.build_blocked_index(idx, 100, block_edges=128)
    assert b is not None
    # sorted + uniform density -> windows cover every block's span
    base = np.asarray(b.base)
    blocks = np.pad(idx, (0, len(base) * 128 - len(idx)),
                    constant_values=idx[-1]).reshape(-1, 128)
    assert (blocks.min(1) >= base).all()
    assert (blocks.max(1) < base + b.w).all()


def test_build_blocked_index_rejects_shuffled():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 5000, 10000)
    assert rk.build_blocked_index(idx, 5000, block_edges=512) is None


def test_blocked_reduce_matches_segment_sum():
    rng = np.random.default_rng(1)
    n_var, deg = 4000, 7
    idx = np.repeat(np.arange(n_var), deg)
    e = len(idx)
    e_pad = -(-e // 1024) * 1024
    planes = rng.normal(0, 1, (9, e_pad)).astype(np.float32)
    planes[:, e:] = 0.0
    idx_pad = np.pad(idx, (0, e_pad - e)).astype(np.int32)
    b = rk.build_blocked_index(idx, n_var, block_edges=1024,
                               n_edges_padded=e_pad)
    assert b is not None
    got = np.asarray(rk.blocked_reduce(
        jnp.asarray(planes), jnp.asarray(idx_pad), b, n_var,
        interpret=INTERP))
    ref = _oracle(planes[:, :e], idx, n_var)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_blocked_reduce_structured_combine_path():
    """Uniform density triggers the scatter-free stride combine."""
    rng = np.random.default_rng(2)
    n_var, deg = 8192, 8
    idx = np.repeat(np.arange(n_var), deg)
    e = len(idx)
    b = rk.build_blocked_index(idx, n_var, block_edges=1024,
                               n_edges_padded=e)
    assert b is not None and b.visited is None and b.k >= 1
    planes = rng.normal(0, 1, (3, e)).astype(np.float32)
    got = np.asarray(rk.blocked_reduce(
        jnp.asarray(planes), jnp.asarray(idx.astype(np.int32)), b, n_var,
        interpret=INTERP))
    ref = _oracle(planes, idx, n_var)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_blocked_gather_matches_take():
    rng = np.random.default_rng(3)
    n_var, deg = 3000, 7
    idx = np.repeat(np.arange(n_var), deg)
    e = len(idx)
    e_pad = -(-e // 1024) * 1024
    idx_pad = np.pad(idx, (0, e_pad - e)).astype(np.int32)
    b = rk.build_blocked_index(idx, n_var, block_edges=1024,
                               n_edges_padded=e_pad)
    src = jnp.asarray(rng.normal(0, 1, (9, n_var)).astype(np.float32))
    got = np.asarray(rk.blocked_gather(src, jnp.asarray(idx_pad), b, interpret=INTERP))
    ref = np.asarray(jnp.take(src, jnp.asarray(idx), axis=1))
    np.testing.assert_array_equal(got[:, :e], ref)


def test_update_beliefs_blocked_path_interpret(monkeypatch):
    """cfg.use_pallas='interpret' must reach the blocked reductions INSIDE
    update_beliefs (not only the sweep kernels): with the blocked-reduce
    threshold forced low, a graph carrying BlockedIndex structures must
    produce the same beliefs as the segment_sum path on a CPU backend."""
    import jax

    from gbp_poplar_tpu.config import GBPConfig
    from gbp_poplar_tpu.core import factor_graph, gbp
    from gbp_poplar_tpu.utils import balio

    monkeypatch.setattr(factor_graph, "BLOCKED_REDUCE_MIN_EDGES", 1)
    monkeypatch.setattr(factor_graph, "CAM_ONEHOT_MAX_BYTES", 0)
    prob = balio.synthetic_problem(n_keyframes=4, n_points=40, seed=1,
                                   pixel_noise=0.5)
    cfg = GBPConfig(use_pallas="interpret", edge_pad_multiple=64)
    graph = factor_graph.build_graph(prob, cfg)
    assert graph.lmk_blocked is not None and graph.cam_blocked is not None
    state = factor_graph.init_state(prob, cfg)
    state = gbp.initialise(state, graph, cfg)
    rng = np.random.default_rng(0)
    state = state._replace(
        msg_c_eta=jnp.asarray(
            rng.normal(size=state.msg_c_eta.shape).astype(np.float32)),
        msg_l_eta=jnp.asarray(
            rng.normal(size=state.msg_l_eta.shape).astype(np.float32)))
    got = gbp.update_beliefs(state, graph, interpret=True)
    plain = graph._replace(cam_blocked=None, lmk_blocked=None)
    want = gbp.update_beliefs(state, plain)
    np.testing.assert_allclose(np.asarray(got.cam_eta),
                               np.asarray(want.cam_eta), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.lmk_eta),
                               np.asarray(want.lmk_eta), rtol=0, atol=1e-5)


def test_sweep_blocked_gather_path_interpret(monkeypatch):
    """The unfused kernel path must use the blocked one-hot gather when the
    graph carries BlockedIndex structures but no fused windows (the
    window-less large-graph fallback, core/gbp.gbp_sweep) and match the
    pure-XLA oracle sweep."""
    from gbp_poplar_tpu.config import GBPConfig
    from gbp_poplar_tpu.core import factor_graph, gbp
    from gbp_poplar_tpu.utils import balio

    monkeypatch.setattr(factor_graph, "BLOCKED_REDUCE_MIN_EDGES", 1)
    monkeypatch.setattr(factor_graph, "CAM_ONEHOT_MAX_BYTES", 0)
    prob = balio.synthetic_problem(n_keyframes=4, n_points=40, seed=1,
                                   pixel_noise=0.5)
    cfg = GBPConfig(use_pallas="interpret", edge_pad_multiple=64,
                    pallas_fused=False)
    graph = factor_graph.build_graph(prob, cfg)
    assert graph.cam_blocked is not None and graph.lmk_blocked is not None
    state = gbp.initialise(factor_graph.init_state(prob, cfg), graph, cfg)
    got = gbp.gbp_sweep(state, graph, cfg)

    cfg_x = GBPConfig(use_pallas=False, edge_pad_multiple=64)
    plain = graph._replace(cam_blocked=None, lmk_blocked=None,
                           cam_win=None, lmk_win=None)
    want = gbp.gbp_sweep(state, plain, cfg_x)
    # different reduction orders (blocked MXU vs segment_sum) -> scale-
    # relative fp32 noise
    scale = np.abs(np.asarray(want.cam_eta)).max()
    np.testing.assert_allclose(np.asarray(got.cam_eta) / scale,
                               np.asarray(want.cam_eta) / scale,
                               rtol=0, atol=1e-4)
    mscale = np.abs(np.asarray(want.msg_c_eta)).max()
    np.testing.assert_allclose(np.asarray(got.msg_c_eta) / mscale,
                               np.asarray(want.msg_c_eta) / mscale,
                               rtol=0, atol=1e-4)


def test_build_stacked_windows_invariants():
    """Stacked per-shard windows: common static aux, per-shard bases
    covering every shard-local block span; whole-table fallback when grids
    fail; None when the table is too large."""
    rng = np.random.default_rng(3)
    n_shards, shard_len, be = 3, 512, 256
    # sorted-by-variable shards (grid windows)
    shard_idx = [np.sort(rng.integers(s * 300, s * 300 + 290, size=500))
                 for s in range(n_shards)]
    b = rk.build_stacked_windows(shard_idx, n_var=1000, block_edges=be,
                                 shard_len=shard_len)
    assert b is not None and b.k == 0
    nb = -(-shard_len // be)
    assert b.base.shape == (n_shards * nb,)
    n_cells = -(-1000 // 128) + 1
    assert b.visited.shape == (n_shards * n_cells,)
    base = np.asarray(b.base)
    for s in range(n_shards):
        for blk in range(nb):
            lo = base[s * nb + blk]
            ids = shard_idx[s][blk * be:(blk + 1) * be]
            if ids.size:
                assert ids.min() >= lo and ids.max() < lo + b.w

    # an empty shard is allowed (inert zero-base windows)
    b2 = rk.build_stacked_windows(
        [shard_idx[0], np.asarray([], np.int32), shard_idx[2]],
        n_var=1000, block_edges=be, shard_len=shard_len)
    assert b2 is not None and b2.base.shape == (n_shards * nb,)

    # decreasing block bases defeat the grid builder; a small table falls
    # back to whole-table windows for every shard
    alt = np.concatenate([rng.integers(700, 900, size=be),
                          rng.integers(0, 100, size=be)])
    b3 = rk.build_stacked_windows([alt] * n_shards, n_var=900,
                                  block_edges=be, shard_len=shard_len)
    assert b3 is not None and b3.k == -1 and b3.visited.shape == (n_shards,)

    # shuffled ids + large table -> no windows (unfused fallback)
    shuf_big = [rng.permutation(np.arange(5000))[:500]
                for _ in range(n_shards)]
    assert rk.build_stacked_windows(shuf_big, n_var=5000, block_edges=be,
                                    shard_len=shard_len) is None
