"""Blocked one-hot gather/reduce Pallas kernels for large graphs.

XLA's gather and scatter on TPU are latency-bound: ~20 ns per index against
an HBM-resident source, which at 1M edges costs more than the entire sweep
kernel (measured 14-25 ms per reduction at Ladybug scale). But bundle-
adjustment edge lists are (nearly) sorted by variable id — each contiguous
block of edges touches only a handful of variables. That turns both
indirections into dense MXU work:

  - **blocked reduce** (messages -> per-variable sums): for each edge block,
    build a [W, BE] one-hot of (local variable id == edge id) in-kernel and
    contract it with the message planes -> a [comp, W] partial per block;
    the tiny [n_blocks*W] partials are then scatter-added outside (thousands
    of indices, not millions).
  - **blocked gather** (beliefs -> per-edge): the transpose of the same
    contraction: [comp, W] belief slice x [W, BE] one-hot -> [comp, BE].

Every HBM access is sequential; the one-hots never exist in memory. W is
the maximum number of distinct variables any block touches (computed at
graph build; the kernels are only used when the edge order keeps W small).

This is the TPU-native generalisation of the reference's per-variable
message *slots* (ba/ba.cpp:104-139) — slots become columns of a block-local
one-hot, and Poplar's exchange+reduce becomes two MXU contractions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as plx
from jax.experimental.pallas import tpu as pltpu


class BlockedIndex(NamedTuple):
    """Static per-block indexing for one variable kind.

    Registered as a pytree with (w, block_edges, stride, k, sub_w) as
    STATIC aux data so a BlockedIndex can live inside jitted arguments
    (GBPGraph).
    """

    base: jax.Array       # [n_blocks] int32 — first variable id in block
                          # (always 128-aligned on the grid-cell path)
    visited: jax.Array | None  # [n_cells] bool — grid cells covered by at
                          # least one block's window (grid-cell combine and
                          # the fused kernel's cell-keyed accumulation);
                          # None on the stride path
    w: int                # distinct-variable capacity per block
    block_edges: int      # BE
    stride: int           # uniform base stride (structured combine), or 0
    k: int                # w // stride when structured; -1 marks
                          # whole-table windows; else 0
    # Sub-window capacity per 128-edge SUB-block (multiple of 8), for the
    # fused kernel's sub-blocked gather/reduce (cfg.pallas_subblock):
    # every 128 consecutive edges span <= sub_w - 8 distinct variables.
    # 0 = spans too wide, sub-blocking unavailable for this kind.
    sub_w: int = 0


jax.tree_util.register_pytree_node(
    BlockedIndex,
    lambda b: ((b.base, b.visited),
               (b.w, b.block_edges, b.stride, b.k, b.sub_w)),
    lambda aux, leaves: BlockedIndex(leaves[0], leaves[1], *aux),
)


def sub_window_capacity(idx: np.ndarray, n_edges_padded: int,
                        sub: int = 128, cap: int = 256) -> int:
    """Max-span-derived sub-window size: the smallest multiple of 8 such
    that every ``sub`` consecutive REAL edges span <= that - 8 variables
    (the kernel derives each sub-block's base by aligning its max id down
    to 8, so coverage needs span <= sub_w - 8). Span analysis pads with
    the last real id (the runtime zero-padding is handled by the kernel's
    max-derived base: inert id-0 edges either miss the window entirely or
    carry zero messages). Returns 0 when the spans exceed ``cap`` —
    sub-blocking then stays off for this kind."""
    e = len(idx)
    if e == 0:
        return 0
    n_sub = -(-n_edges_padded // sub)
    idx_p = np.full(n_sub * sub, idx[-1], np.int64)
    idx_p[:e] = idx.astype(np.int64)
    rows = idx_p.reshape(n_sub, sub)
    span = int((rows.max(axis=1) - rows.min(axis=1)).max())
    ws = -(-(span + 8) // 8) * 8
    return ws if ws <= cap else 0


def build_blocked_index(
    idx: np.ndarray, n_var: int, block_edges: int,
    n_edges_padded: int | None = None, max_span: int = 384,
    grid_only: bool = False,
) -> BlockedIndex | None:
    """Build per-block bases if every block spans <= max_span variables.

    ``idx`` is the REAL (unpadded) edge->variable array; the runtime arrays
    are zero-padded to ``n_edges_padded``, which is harmless: padding lanes
    match no one-hot column of their (high-base) block, so they contribute
    nothing to reductions and gather zeros. Span analysis here pads with the
    last real id instead so the final block's span stays local.

    Bases are rounded down to a multiple of 128 so the gather kernel's
    dynamic window read is lane-aligned.
    """
    e = len(idx)
    if e == 0:
        return None
    e_pad = n_edges_padded or e
    n_blocks = -(-e_pad // block_edges)
    idx_p = np.full(n_blocks * block_edges, idx[-1], np.int64)
    idx_p[:e] = idx.astype(np.int64)
    blocks = idx_p.reshape(n_blocks, block_edges)
    lo = blocks.min(axis=1)
    hi = blocks.max(axis=1)
    if int((hi - lo + 1).max()) > max_span:
        return None

    # Prefer a uniform-stride base grid: base_i = i*s. Then blocks i and
    # i+k have adjacent disjoint windows (w = k*s), so the k interleaved
    # groups each TILE the variable axis and the combine is k shifted adds
    # — no scatter. Needs s with i*s <= lo_i and hi_i < i*s + w for all i.
    if n_blocks > 1 and not grid_only:
        s_max = int((lo[1:] // np.arange(1, n_blocks)).min())
        s = s_max // 128 * 128
        if s > 0:
            need = int((hi - np.arange(n_blocks) * s).max()) + 1
            k = -(-need // s)
            if k <= 4:      # bounded window overlap
                w = k * s
                base = (np.arange(n_blocks) * s).astype(np.int32)
                return BlockedIndex(
                    base=jnp.asarray(base), visited=None, w=w,
                    block_edges=block_edges, stride=s, k=k)

    # grid-cell combine (see blocked_reduce): bases are 128-aligned, so the
    # per-block partial windows land on a 128-lane grid and combine with a
    # tiny block-axis segment-sum + w/128 static shifted adds — no big sort
    base = (lo // 128 * 128).astype(np.int32)       # lane-aligned
    span = int((hi - base + 1).max())
    # Smallest 128-multiple covering the span (the grid combine only needs
    # w % 128 == 0, not a power of two): at the BAL-Venice density the lmk
    # span is 308 -> w 384 where pow2 rounding paid 512 — 25% of the
    # kernel's W-dependent one-hot/MXU/DMA work for nothing (round 5).
    w = max(-(-span // 128) * 128, 128)
    n_cells = -(-n_var // 128) + 1
    visited = np.zeros((n_cells,), bool)
    visited[np.minimum(base // 128, n_cells - 1)] = True
    return BlockedIndex(
        base=jnp.asarray(base),
        visited=jnp.asarray(visited),
        w=w,
        block_edges=block_edges,
        stride=0,
        k=0,
    )


def _onehot(idx_row: jax.Array, v0: jax.Array, w: int) -> jax.Array:
    """[W, BE] float one-hot of (v0 + row == edge's variable id)."""
    be = idx_row.shape[-1]
    local = jax.lax.broadcasted_iota(jnp.int32, (w, be), 0) + v0
    return jnp.where(local == idx_row, 1.0, 0.0).astype(jnp.float32)


def _reduce_kernel(w: int, base_ref, idx_ref, planes_ref, out_ref):
    i = plx.program_id(0)
    onehot = _onehot(idx_ref[...], base_ref[i], w)          # [W, BE]
    out_ref[...] = jax.lax.dot_general(
        planes_ref[...], onehot,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # exact fp32 one-hot sums
    )[None]                                                  # [1, comp, W]


def blocked_reduce(
    planes: jax.Array, idx: jax.Array, bidx: BlockedIndex, n_var: int,
    interpret: bool = False,
) -> jax.Array:
    """Sum `planes` [comp, E] per variable -> [comp, n_var].

    ``interpret`` runs the kernel through the Pallas interpreter (CPU CI
    parity tests; never set on TPU)."""
    comp, e = planes.shape
    be = bidx.block_edges
    n_blocks = -(-e // be)
    pad = n_blocks * be - e
    if pad:
        # zero messages are inert; padding idx 0 matches no high-base column
        planes = jnp.pad(planes, [(0, 0), (0, pad)])
        idx = jnp.pad(idx, (0, pad))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            plx.BlockSpec((1, be), lambda i, *_: (0, i),
                          memory_space=pltpu.VMEM),
            plx.BlockSpec((comp, be), lambda i, *_: (0, i),
                          memory_space=pltpu.VMEM),
        ],
        out_specs=plx.BlockSpec((1, comp, bidx.w), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM),
    )
    partials = plx.pallas_call(
        functools.partial(_reduce_kernel, bidx.w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, comp, bidx.w),
                                       jnp.float32),
        interpret=interpret,
    )(bidx.base, idx[None], planes)

    return combine_partials(partials, bidx, n_var).astype(planes.dtype)


def combine_partials(
    partials: jax.Array, bidx: BlockedIndex, n_var: int
) -> jax.Array:
    """Merge per-block window partials [n_blocks, comp, W] -> [comp, n_var].

    Used by blocked_reduce and by the fused sweep kernel's reduction
    epilogue (ops/sweep_kernel.py)."""
    n_blocks, comp, _ = partials.shape
    if bidx.stride > 0:
        # structured combine: group r (blocks r, r+k, ...) has adjacent,
        # disjoint windows starting at r*stride — concat and shift-add,
        # no scatter
        s, kk, w = bidx.stride, bidx.k, bidx.w
        total = max(r * s + len(range(r, n_blocks, kk)) * w
                    for r in range(kk))
        out = jnp.zeros((comp, total), jnp.float32)
        for r in range(kk):
            grp = partials[r::kk]                          # [g, comp, w]
            g = grp.shape[0]
            tiled = jnp.moveaxis(grp, 0, 1).reshape(comp, g * w)
            out = out.at[:, r * s:r * s + g * w].add(tiled)
        return out[:, :n_var]

    if bidx.k == -1:
        # whole-table windows (small problems): every block's window covers
        # the full variable axis — a plain sum over blocks
        return jnp.sum(partials, axis=0)[:, :n_var]

    # grid-cell overlap-add combine. Bases are 128-aligned, so window i
    # occupies cells [base_i/128, base_i/128 + m) of a 128-lane grid.
    # Summing partials per STARTING cell is a segment-sum over n_blocks
    # tiny ids (hundreds — XLA's sort there is negligible, unlike the
    # n_blocks*w-id scatter this replaces, which cost more than the whole
    # sweep kernel at 1M edges), and the m cell columns then merge with m
    # static shifted adds — scatter-free and layout-friendly.
    m = bidx.w // 128
    n_cells = -(-n_var // 128) + 1
    cell = bidx.base // 128                                # [n_blocks]
    p = jax.ops.segment_sum(partials, cell, num_segments=n_cells)
    chunks = p.reshape(n_cells, comp, m, 128)
    out = jnp.zeros((n_cells + m, comp, 128), jnp.float32)
    for j in range(m):
        out = out.at[j:j + n_cells].add(chunks[:, :, j])
    res = jnp.moveaxis(out, 0, 1).reshape(comp, (n_cells + m) * 128)
    return res[:, :n_var]


def combine_grid(grid: jax.Array, bidx: BlockedIndex,
                 n_var: int) -> jax.Array:
    """Merge the fused kernel's cell-keyed window accumulations
    [n_cells, comp, W] -> [comp, n_var] with W/128 static shifted adds
    (cell c's window starts at variable c*128)."""
    nc, comp, w = grid.shape
    g = jnp.where(bidx.visited[:, None, None], grid, 0.0)
    if bidx.k == -1:                         # whole-table window
        return g[0, :, :n_var]
    m = w // 128
    gm = jnp.moveaxis(g, 0, 1)               # [comp, nc, w]
    acc = jnp.zeros((comp, (nc + m) * 128), jnp.float32)
    for j in range(m):
        chunk = gm[:, :, j * 128:(j + 1) * 128].reshape(comp, nc * 128)
        acc = acc.at[:, j * 128:j * 128 + nc * 128].add(chunk)
    return acc[:, :n_var]


def combine_grid_var(grid: jax.Array, bidx: BlockedIndex,
                     rows: int) -> jax.Array:
    """Merge VAR-MAJOR cell-keyed window accumulations [n_cells, W, 128]
    (the fused kernel's ``var_major`` epilogue) into a [rows, 128] belief
    TABLE sum — the layout the next sweep's window DMA reads directly.

    Same overlap-add as ``combine_grid``, but because the variable axis is
    MAJOR every reshape here merges leading dims, which XLA lowers to
    bitcasts — the lane-axis relayout copies that dominate the plane-major
    combine at small problem sizes disappear (~10 dispatched ops/sweep).
    """
    nc, w, lanes = grid.shape

    def fit(x):
        # the belief-table row count is rounded up to a 1024-multiple
        # (core/gbp._win_table_rows) and may exceed the grid's natural
        # (nc + m) * 128 extent on small problems — pad with zero rows
        if x.shape[0] < rows:
            return jnp.pad(x, [(0, rows - x.shape[0]), (0, 0)])
        return x[:rows]

    g = jnp.where(bidx.visited[:, None, None], grid, 0.0)
    if bidx.k == -1:                         # whole-table window
        return fit(g[0])
    m = w // 128
    acc = jnp.zeros(((nc + m) * 128, lanes), jnp.float32)
    for j in range(m):
        chunk = g[:, j * 128:(j + 1) * 128, :].reshape(nc * 128, lanes)
        acc = acc.at[j * 128:j * 128 + nc * 128].add(chunk)
    return fit(acc)


def combine_grid_any(grid: jax.Array, bidx: BlockedIndex, n_var: int,
                     comp: int) -> jax.Array:
    """Merge fused-kernel cell partials into [comp, n_var] planes, for
    either emit layout: plane-major [nc, comp, W] (combine_grid) or the
    sub-blocked reduce's var-major [nc, W, lanes] (combine_grid_var +
    transpose — the lanes hold comp values zero-padded to 32/16)."""
    if grid.shape[1] == bidx.w:      # var-major (plane-major has comp here)
        return combine_grid_var(grid, bidx, n_var).T[:comp]
    return combine_grid(grid, bidx, n_var)


def build_fused_window(
    idx: np.ndarray, n_var: int, block_edges: int,
    n_edges_padded: int | None = None,
    max_span: int = 1024, max_whole_table: int = 1024,
) -> BlockedIndex | None:
    """Per-block variable windows for the fused sweep kernel's in-kernel
    gather/reduce (one BlockedIndex keyed to the kernel's edge-block size).

    Prefers local windows (edge order groups variables); falls back to
    whole-table windows for small variable counts (every base 0, window
    covering the padded table; marked with k = -1 so combine_partials sums
    over blocks); returns None when neither applies (the sweep then uses
    the unfused XLA gather + blocked/segment reduction)."""
    e_pad = n_edges_padded or len(idx)
    sub_w = sub_window_capacity(idx, e_pad)
    b = build_blocked_index(idx, n_var, block_edges,
                            n_edges_padded=n_edges_padded, max_span=max_span,
                            grid_only=True)
    if b is not None:
        # the fused kernel accumulates same-cell blocks in its OUTPUT refs,
        # which requires every base value to occupy one contiguous run of
        # grid steps — guaranteed by nondecreasing bases
        if bool(np.all(np.diff(np.asarray(b.base)) >= 0)):
            return b._replace(sub_w=min(sub_w, b.w))
    if n_var <= max_whole_table:
        n_blocks = -(-e_pad // block_edges)
        w = max(-(-n_var // 128) * 128, 128)   # 128-multiple table
        return BlockedIndex(
            base=jnp.zeros((n_blocks,), jnp.int32),
            visited=jnp.ones((1,), bool),
            w=w, block_edges=block_edges, stride=0, k=-1,
            sub_w=min(sub_w, w))
    return None


def build_stacked_windows(
    shard_idx: list, n_var: int, block_edges: int, shard_len: int,
    max_span: int = 1024, max_whole_table: int = 1024,
) -> BlockedIndex | None:
    """Per-shard fused-sweep windows, stacked for ``shard_map``.

    The reference runs the *same* codelets at any chip count
    (ba/ba.cpp:614-649); the TPU equivalent is the fused sweep kernel
    running unchanged inside every shard. ``shard_idx[s]`` holds shard
    s's REAL local edge->variable ids (inert runtime padding excluded);
    every shard's runtime edge extent is ``shard_len`` and its variable
    axis ``n_var`` (global for replicated kinds, the block size for the
    map-partitioned landmark axis).

    Returns ONE BlockedIndex whose ``base``/``visited`` arrays are the
    per-shard arrays concatenated along the leading axis with COMMON
    static aux (w, block size, kind) — sharding both arrays over the mesh
    with ``P('edges')`` hands each shard exactly its local window
    structure, so the in-kernel gather/reduce runs per shard exactly as
    it does single-chip. None when any shard lacks a grid window and the
    variable table is too large for whole-table windows (the sweep then
    falls back to the unfused gather + segment-sum path).
    """
    nb = -(-shard_len // block_edges)
    n_cells = -(-n_var // 128) + 1
    parts = []
    grid_ok = True
    for ix in shard_idx:
        ix = np.asarray(ix)
        if ix.size == 0:
            parts.append(None)       # inert shard: zero-base windows below
            continue
        b = build_fused_window(ix, n_var, block_edges,
                               n_edges_padded=shard_len, max_span=max_span,
                               max_whole_table=0)   # grid windows or bust
        if b is None or b.k != 0 or b.base.shape[0] != nb:
            grid_ok = False
            break
        parts.append(b)
    if grid_ok:
        w = max((p.w for p in parts if p is not None), default=128)
        # common static sub-window: the max over shards, 0 if any shard's
        # spans disqualify it (inert shards don't constrain)
        subs = [p.sub_w for p in parts if p is not None]
        sub_w = 0 if (subs and 0 in subs) else max(subs, default=0)
        bases, visits = [], []
        for p in parts:
            if p is None:
                v = np.zeros((n_cells,), bool)
                v[0] = True
                bases.append(np.zeros((nb,), np.int32))
                visits.append(v)
            else:
                bases.append(np.asarray(p.base))
                visits.append(np.asarray(p.visited))
        return BlockedIndex(
            base=jnp.asarray(np.concatenate(bases)),
            visited=jnp.asarray(np.concatenate(visits)),
            w=int(w), block_edges=block_edges, stride=0, k=0,
            sub_w=min(sub_w, int(w)))
    if n_var <= max_whole_table:
        n = len(shard_idx)
        w = max(-(-n_var // 128) * 128, 128)   # 128-multiple table
        subs = [sub_window_capacity(np.asarray(ix), shard_len)
                for ix in shard_idx if np.asarray(ix).size]
        sub_w = 0 if (subs and 0 in subs) else max(subs, default=0)
        return BlockedIndex(
            base=jnp.zeros((n * nb,), jnp.int32),
            visited=jnp.ones((n,), bool),
            w=w, block_edges=block_edges, stride=0, k=-1,
            sub_w=min(sub_w, w))
    return None


def _gather_kernel(w: int, comp: int, base_ref, idx_ref, src_ref, out_ref):
    i = plx.program_id(0)
    v0 = base_ref[i]

    def inner(window, sem):
        # DMA the [W, 128] window of the (variable-major, lane-padded)
        # source; dynamic DMA offsets are only supported on the major axis
        # and DMA shapes need 128-aligned lanes, hence transpose + pad
        dma = pltpu.make_async_copy(
            src_ref.at[plx.ds(v0, w), :], window, sem)
        dma.start()
        dma.wait()
        onehot = _onehot(idx_ref[...], v0, w)               # [W, BE]
        out_ref[...] = jax.lax.dot_general(
            window[...], onehot,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:comp].astype(out_ref.dtype)                       # [comp, BE]

    plx.run_scoped(
        inner,
        window=pltpu.VMEM((w, 128), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def blocked_gather(
    src: jax.Array, idx: jax.Array, bidx: BlockedIndex,
    interpret: bool = False,
) -> jax.Array:
    """Gather `src` [comp, V] columns by idx [E] -> [comp, E]."""
    comp, n_var = src.shape
    e = idx.shape[0]
    be = bidx.block_edges
    n_blocks = -(-e // be)
    pad = n_blocks * be - e
    if pad:
        idx = jnp.pad(idx, (0, pad))

    # variable-major source (dynamic DMA offsets need the major axis),
    # lane-padded to 128 (DMA shape alignment); window reads need
    # v0 + W <= padded V
    v_pad = (-n_var) % 128 + bidx.w
    src_pad = jnp.pad(src.astype(jnp.float32).T,
                      [(0, v_pad), (0, 128 - comp)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            plx.BlockSpec((1, be), lambda i, *_: (0, i),
                          memory_space=pltpu.VMEM),
            plx.BlockSpec(memory_space=plx.ANY),   # source stays off-VMEM
        ],
        out_specs=plx.BlockSpec((comp, be), lambda i, *_: (0, i),
                                memory_space=pltpu.VMEM),
    )
    out = plx.pallas_call(
        functools.partial(_gather_kernel, bidx.w, comp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((comp, n_blocks * be), src.dtype),
        interpret=interpret,
    )(bidx.base, idx[None], src_pad)
    return out[:, :e] if pad else out
