"""Pallas TPU kernel: the fused per-edge GBP sweep body.

One kernel invocation per block of edges runs the ENTIRE per-edge pipeline —
damping state machine, reprojection Jacobians + Huber relinearisation, both
message marginalisations (3x3 adjugate inverse + 6x6 Cholesky solves),
damping blend and activity masking — reading every input plane from HBM
exactly once and writing every output plane exactly once. The pure-XLA path
(core/gbp.edge_math) computes the same function but XLA splits it into
several fusions with HBM round-trips for the intermediates; the kernel
keeps all ~300 intermediate rows in VMEM/registers.

This is the TPU analogue of the reference's on-tile codelet bodies
(ba/gbp_codelets.cpp): same math, one fused pass, batched across lanes.

The kernel body literally calls ``core.gbp.edge_math`` — there is a single
source of truth for the sweep math; this module only does the blocking,
padding, and dtype plumbing (everything is kept 2-D for Mosaic, and the
robust flag crosses the boundary as uint8 because TPU refs dislike 1-bit
bools).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as plx
from jax.experimental.pallas import tpu as pltpu

from ..config import GBPConfig

# (n_planes, dtype-kind) of each EDGE_MATH_OUTPUTS entry; dtype-kind "f"
# follows the input float dtype
_OUT_LAYOUT = (
    (6, "f"), (3, "f"), (21, "f"), (18, "f"), (6, "f"),   # factor potentials
    (6, "f"), (21, "f"), (3, "f"), (6, "f"),              # messages
    (1, "f"), (1, "i"),                                   # damping, count
    (9, "f"), (9, "f"), (1, "u"),                         # mu, lin_mu, robust
)


def _kernel(cfg: GBPConfig, sub: int, native: tuple, has_intr: bool,
            k_ref, *refs):
    from ..core.gbp import EDGE_MATH_INPUTS, edge_math

    n_in = len(EDGE_MATH_INPUTS)
    # Brick the block in VMEM when sub > 1: (comp, BE) -> (comp*sub,
    # BE/sub) so each logical row fills all `sub` sublanes. With sub == 1
    # the wrapper already bricked the HBM arrays (cheaper at small E, where
    # the whole-array reshape is cheap and the per-block relayout is not).
    def unbrick(x):
        if sub > 1:
            comp, be = x.shape
            x = x.reshape(comp * sub, be // sub)
        return x

    vals = []
    for j, r in enumerate(refs[:n_in]):
        x = r[...]
        if native and j < 2:
            # belief blocks arrive in the GATHER-NATIVE edge-major layout
            # [BE, comp_pad] (XLA's gather emits edge-major; consuming it
            # directly saves two [*, E] relayout copies per sweep in HBM);
            # transpose to planes in VMEM and drop the lane padding
            x = jnp.transpose(x)[:native[j]]
        vals.append(unbrick(x))
    # the optional Snavely intrinsics ride as a trailing plane input so the
    # in-place aliasing of the 14 state operands keeps its indices
    intr = unbrick(refs[n_in][...]) if has_intr else None
    outs = edge_math(*vals, k_ref, cfg, intr=intr)
    for r, o in zip(refs[n_in + int(has_intr):], outs):
        if sub > 1:
            o = o.reshape(r.shape[0], -1)
        r[...] = o.astype(r.dtype)


def sweep_edge_math_pallas(inputs: tuple, k: jax.Array, cfg: GBPConfig,
                           interpret: bool = False,
                           intr: jax.Array | None = None):
    """Run core.gbp.edge_math as one blocked Pallas kernel over the edges.

    ``inputs`` is the tuple named by core.gbp.EDGE_MATH_INPUTS (plane
    arrays, edge axis trailing); ``k`` the [3,3] intrinsics. Returns the
    EDGE_MATH_OUTPUTS tuple with the original edge extent (per-edge scalar
    rows shaped (1, E), matching edge_math's convention). ``interpret``
    runs the kernel through the Pallas interpreter (CPU CI parity).
    """
    e = inputs[-1].shape[-1]
    sub = 8
    block = max(cfg.pallas_block_edges, sub * 128)
    e_pad = _round_up(e, block)
    pad = e_pad - e
    # Two bricking strategies (a brick row (8, N/8) fills all VPU sublanes;
    # a flat (1, N) row uses 1 of 8):
    #   - small E: pre-brick whole arrays in HBM (one cheap reshape each;
    #     Mosaic's per-block VMEM relayout is comparatively expensive)
    #   - large E: brick per block inside the kernel (the HBM-side reshape
    #     of ~270 planes costs more than the entire kernel at 1M edges)
    hbm_brick = e_pad <= cfg.pallas_hbm_brick_max_edges
    kernel_sub = 1 if hbm_brick else sub
    be = block // sub if hbm_brick else block
    # gather-native belief blocks: (n_planes, lane_pad) per belief input
    # when the caller passes [E, lane_pad] edge-major arrays (large-E path)
    native = ()
    if not hbm_brick and inputs[0].ndim == 2 and inputs[0].shape[0] == e:
        native = (27, 9)

    def prep(x):
        if x.ndim == 1:
            x = x[None]                      # everything 2-D for Mosaic
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.uint8)
        if pad:
            x = jnp.pad(x, [(0, 0), (0, pad)])
        if hbm_brick:
            x = x.reshape(x.shape[0] * sub, e_pad // sub)
        return x

    def prep_native(x):
        # [E, lane_pad] edge-major: pad the EDGE axis (rows)
        return jnp.pad(x, [(0, pad), (0, 0)]) if pad else x

    prepped = [prep_native(x) if native and j < 2 else prep(x)
               for j, x in enumerate(inputs)]
    if intr is not None:
        prepped.append(prep(intr))
    f = prepped[0].dtype
    dt = {"f": f, "i": jnp.int32, "u": jnp.uint8}
    oshape = ((lambda n: (n * sub, e_pad // sub)) if hbm_brick
              else (lambda n: (n, e_pad)))
    out_shapes = [jax.ShapeDtypeStruct(oshape(n), dt[kind])
                  for (n, kind) in _OUT_LAYOUT]

    def spec(shape):
        return plx.BlockSpec((shape[0], be), lambda i: (0, i),
                             memory_space=pltpu.VMEM)

    def spec_native(shape):
        return plx.BlockSpec((be, shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    in_specs = [plx.BlockSpec(memory_space=pltpu.SMEM)]         # intrinsics
    for j, x in enumerate(prepped):
        in_specs.append(spec_native(x.shape) if native and j < 2
                        else spec(x.shape))

    n_planes_in = sum(x.shape[0] for x in prepped)
    n_planes_out = sum(s.shape[0] for s in out_shapes)
    cost = plx.CostEstimate(
        flops=3000 * e_pad,
        bytes_accessed=(n_planes_in + n_planes_out) * e_pad * 4,
        transcendentals=12 * e_pad,   # sqrt/sin/cos in Rodrigues + Cholesky
    )

    outs = plx.pallas_call(
        functools.partial(_kernel, cfg, kernel_sub, native, intr is not None),
        grid=(e_pad // (sub * be) if hbm_brick else e_pad // be,),
        in_specs=in_specs,
        out_specs=[spec(s.shape) for s in out_shapes],
        out_shape=out_shapes,
        cost_estimate=cost,
        interpret=interpret,
        # The 14 state outputs overwrite their input buffers in place
        # (same shape/dtype, block i reads/writes block i): without this
        # XLA inserts a copy per carried array per sweep to write the
        # custom-call results back into the while-loop carry buffers
        # (~6 MB + 13 op dispatches per sweep at TUM scale). Input index
        # counts ALL call operands; the state arrays start after
        # (k, bc, bl, meas, meas_var).
        input_output_aliases={5 + i: i for i in range(14)},
    )(k, *prepped)

    outs = list(outs)
    if hbm_brick:
        outs = [o.reshape(o.shape[0] // sub, e_pad) for o in outs]
    if pad:
        outs = [o[:, :e] for o in outs]
    outs[-1] = outs[-1].astype(jnp.bool_)   # robust back to bool
    return tuple(outs)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _slot_parity(base: jax.Array) -> jax.Array:
    """Per-block double-buffer slot for the window prefetch: cumulative
    count of base changes mod 2 (slot 0 for block 0; flips on every
    change). Computed with jnp so it works on per-shard base slices
    inside shard_map."""
    changes = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        (base[1:] != base[:-1]).astype(jnp.int32)])
    return jnp.cumsum(changes).astype(jnp.int32) % 2


# ---------------------------------------------------------------------------
# Fully-fused sweep: in-kernel windowed one-hot gather prologue + reduction
# epilogue. Per edge block the kernel DMAs the [W, 128] windows of the
# var-major belief tables, builds the block one-hots in registers, gathers
# the adjacent beliefs with two MXU contractions, runs edge_math, and
# contracts the freshly computed messages back into per-block window
# partials — the whole sweep touches HBM once per array. Replaces: two XLA
# gathers + their relayout copies + the standalone blocked-reduce kernels
# (measured 8+ ms of the 14 ms sweep at 1.09M edges; the windowed one-hot
# gather microbenches at ~0.3 ms).
# ---------------------------------------------------------------------------

def _dot3(v, oh, dims, oh_first=False, single_pass=False):
    """Exact f32 contraction against a ONE-HOT operand via 3 bf16 limbs.

    ``Precision.HIGHEST`` decomposes BOTH f32 operands into 3 bf16 terms
    (6 significant passes) — but a one-hot matrix is exact in bf16, so
    splitting only the value operand (v = hi + mid + lo, 8 mantissa bits
    per term = f32's 24) gives the same result in 3 single-pass dots.
    Measured: the HIGHEST gather/reduce passes were >50% of the fused
    kernel at 1M edges (6.75 -> 3.21 ms/sweep with naive bf16); this
    recovers half of that with no accuracy loss (one-hot gathers stay
    value-exact; reduction partials differ from HIGHEST only at the f32
    ulp of the lo term). When v's free axis fits 3x into one 128-row MXU
    tile (every non-var-major hot call site) the limbs are further
    STACKED along it so the 3 dots collapse to one dot of the same tile
    cost — bit-identical output, ~3x fewer MXU passes.

    ``single_pass`` is for the Pallas interpreter (CPU CI), whose dots are
    native f32 — the limb split would only triple the interpreter's cost.
    Gather outputs are bit-identical either way (one value x 1.0 per
    column); reduction partials differ only in summation order. The limb
    decomposition itself is unit-tested directly (tests/test_sweep_kernel
    .test_dot3_limb_exactness) so hardware-only rounds aren't the only
    coverage.
    """
    if single_pass:
        ops = (oh, v) if oh_first else (v, oh)
        # HIGHEST so an interpret-mode run ON a TPU backend stays exact
        # (the interpreter lowers to plain dots; default precision there
        # would be one bf16 pass). No-op on CPU.
        return jax.lax.dot_general(*ops, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    r = v - hi
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r - mid
    if not oh_first:
        # The free axis of v is tiny at every hot call site (gather window
        # cols <= 32, message rows 27/9) while the MXU pads it to a full
        # 128-row tile — so stacking the three limbs along it (<= 96/81/27
        # rows) turns 3 dots into ONE dot of identical tile cost: a 3x cut
        # on the contraction passes. Bit-exact vs the 3-pass loop: the
        # stacked rows are independent MXU output rows (same per-limb dots)
        # and the final adds keep the hi+mid+lo order.
        # d[:m] row slicing below assumes NO batch dims and exactly one
        # contracting dim; anything else falls through to the 3-pass loop
        simple = (v.ndim == 2 and len(dims[0][0]) == 1
                  and not dims[1][0] and not dims[1][1])
        m = v.shape[1 - dims[0][0][0]] if simple else 0
        if simple and 3 * m <= 128:
            stacked = jnp.concatenate([hi, mid, lo],
                                      axis=1 - dims[0][0][0])
            d = jax.lax.dot_general(stacked, oh, dims,
                                    preferred_element_type=jnp.float32)
            return (d[:m] + d[m:2 * m]) + d[2 * m:]
    acc = None
    for part in (hi, mid, lo):
        ops = (oh, part) if oh_first else (part, oh)
        d = jax.lax.dot_general(*ops, dims,
                                preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc


def _fused_kernel(cfg: GBPConfig, sub: int, wc: int, wl: int, var_major: bool,
                  interp: bool, has_intr: bool, premu: bool, packed: bool,
                  subw: tuple, prefetch: bool,
                  cam_base_ref, lmk_base_ref, cam_slot_ref, lmk_slot_ref,
                  k_ref, cam_idx_ref, lmk_idx_ref, cam_tbl_ref, lmk_tbl_ref,
                  *refs):
    from ..core.gbp import EDGE_MATH_INPUTS, edge_math

    dot3 = functools.partial(_dot3, single_pass=interp)
    n_in = len(EDGE_MATH_INPUTS) - 2            # bc/bl come from the tables
    i = plx.program_id(0)
    nb = cam_base_ref.shape[0]
    c0 = cam_base_ref[i]
    l0 = lmk_base_ref[i]
    sub_mode = subw[0] > 0
    # in sub mode the idx refs are bricked [NSUB, 128]; edges of sub-block
    # j are row j (a ref row loads with a clean layout — broadcasting a
    # lane-offset VALUE slice is a Mosaic wall, see round-3 notes)
    be = (cam_idx_ref.shape[0] * cam_idx_ref.shape[1] if sub_mode
          else cam_idx_ref.shape[-1])

    # window-DMA reuse: scratch persists across grid steps and the belief
    # tables are constant within a sweep, so a block whose window base
    # matches the previous block's reuses the already-resident window
    # instead of re-fetching it. Consecutive blocks share bases by
    # construction (landmark-sorted edge order): ladybug re-fetches the
    # cam window 14x instead of 1067x (~130 KB each), fr1xyz 1x vs 13x.
    prev = jnp.maximum(i - 1, 0)
    first_c = (i == 0) | (cam_base_ref[i] != cam_base_ref[prev])
    first_l = (i == 0) | (lmk_base_ref[i] != lmk_base_ref[prev])
    scr = refs[len(refs) - 6:]
    cwin, lwin, sem_c, sem_c1, sem_l, sem_l1 = scr
    refs = refs[:len(refs) - 6]

    def window(first, base_ref, slot_ref, tbl_ref, win, sem0, sem1, w):
        """Resident-window management for one variable kind.

        Without ``prefetch``: synchronous fetch on base change (the
        round-3 scheme). With it: DOUBLE-BUFFERED — each base change was
        DMA-started one grid step EARLIER into the alternate half of the
        scratch (slot parity precomputed host-side as cumulative changes
        mod 2), so the fetch latency hides behind the previous block's
        compute instead of stalling the gather. At 5 obs/landmark the
        landmark base changes EVERY block — 4854 synchronous ~200 KB
        fetches per sweep at the Venice shape. Returns the traced row
        offset of the live window inside the scratch."""
        if not prefetch:
            @plx.when(first)
            def _():
                dma = pltpu.make_async_copy(
                    tbl_ref.at[plx.ds(base_ref[i], w), :], win, sem0)
                dma.start()
                dma.wait()
            return 0

        slot = slot_ref[i]

        def copy(tgt_off, sem, base_val):
            return pltpu.make_async_copy(
                tbl_ref.at[plx.ds(base_val, w), :],
                win.at[plx.ds(tgt_off, w), :], sem)

        @plx.when(i == 0)
        def _():                         # first block: synchronous, slot 0
            dma = copy(0, sem0, base_ref[i])
            dma.start()
            dma.wait()

        @plx.when((i > 0) & first)
        def _():                         # prefetched at i-1: just wait
            @plx.when(slot == 0)
            def _():
                copy(0, sem0, base_ref[i]).wait()

            @plx.when(slot == 1)
            def _():
                copy(w, sem1, base_ref[i]).wait()

        nxt = jnp.minimum(i + 1, nb - 1)
        base_nxt = base_ref[nxt]

        @plx.when(base_nxt != base_ref[i])   # false at the last block
        def _():                         # start next block's fetch now
            @plx.when(slot == 1)
            def _():
                copy(0, sem0, base_nxt).start()

            @plx.when(slot == 0)
            def _():
                copy(w, sem1, base_nxt).start()

        return slot * w

    def inner():
        coff = window(first_c, cam_base_ref, cam_slot_ref, cam_tbl_ref,
                      cwin, sem_c, sem_c1, wc)
        loff = window(first_l, lmk_base_ref, lmk_slot_ref, lmk_tbl_ref,
                      lwin, sem_l, sem_l1, wl)

        # gather: [W, width] window x [W, BE] one-hot -> [width, BE]
        # (exact: each output column is a single product value * 1.0; _dot3
        # keeps the value f32-exact at half of HIGHEST's MXU passes). The
        # tables may be narrow (32/16 lanes, plane-form hot loop) or
        # 128-wide (table-carried mode) — cap the contraction at 32 lanes.
        # With premu the tables carry pre-solved belief means + a validity
        # flag (cam cols 27..33, lmk 9..12 — see core.gbp._make_tables);
        # widening the contraction is free (the stacked-limb dot still
        # fits one 128-row MXU tile: 3*34 <= 128) and edge_math then skips
        # its per-edge mean solves.
        ncc = 34 if premu else 32
        ncl = 13 if premu else 32

        def sub_oh(idx_ref, base0, ws, w, j):
            # per-SUB-block one-hot ([ws, 128]) with a MAX-derived base:
            # inert id-0 padding edges then either miss the window (their
            # messages are zero anyway) or, in all-padding sub-blocks,
            # harmlessly match a valid row. Coverage: 128-edge REAL spans
            # are <= ws - 8 by construction (BlockedIndex.sub_w).
            idx_j = idx_ref[j:j + 1, :]                     # [1, 128]
            m = jnp.max(idx_j)
            off = jnp.clip((m // 8) * 8 - (ws - 8) - base0, 0, w - ws)
            oh = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (ws, 128), 0)
                + (base0 + off) == idx_j,
                1.0, 0.0).astype(jnp.float32)
            return oh, off

        if sub_mode:
            nsub = be // 128
            wsc, wsl = subw

            def sub_gather(idx_ref, base0, ws, w, win, woff, ncols):
                outs = []
                for j in range(nsub):
                    oh, off = sub_oh(idx_ref, base0, ws, w, j)
                    wj = win[plx.ds(woff + off, ws), :]     # [ws, 128]
                    outs.append(dot3(wj[:, :ncols], oh,
                                     (((0,), (0,)), ((), ()))))
                return jnp.concatenate(outs, axis=1)        # [ncols, be]

            gc = sub_gather(cam_idx_ref, c0, wsc, wc, cwin, coff, ncc)
            gl = sub_gather(lmk_idx_ref, l0, wsl, wl, lwin, loff, ncl)
        else:
            oh_c = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (wc, be), 0) + c0
                == cam_idx_ref[...], 1.0, 0.0).astype(jnp.float32)
            oh_l = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (wl, be), 0) + l0
                == lmk_idx_ref[...], 1.0, 0.0).astype(jnp.float32)
            cw_all = (cwin[plx.ds(coff, wc), :] if prefetch
                      else cwin[...])
            lw_all = (lwin[plx.ds(loff, wl), :] if prefetch
                      else lwin[...])
            cw = cw_all if cwin.shape[-1] <= ncc else cw_all[:, :ncc]
            lw = lw_all if lwin.shape[-1] <= ncl else lw_all[:, :ncl]
            gc = dot3(cw, oh_c, (((0,), (0,)), ((), ())))
            gl = dot3(lw, oh_l, (((0,), (0,)), ((), ())))
        bc, bl = gc[:27], gl[:9]

        def brick(x):
            comp, n = x.shape
            return x.reshape(comp * sub, n // sub)

        pm = None
        if premu:
            # mu_c[6] | mu_l[3] | valid[1] (both endpoints valid)
            pm = brick(jnp.concatenate(
                [gc[27:33], gl[9:12], gc[33:34] * gl[12:13]]))

        if packed:
            # packed edge-state carry (core.gbp.EDGE_PACK_FIELDS): ONE
            # wide f32 operand + the i32 counter + the u8 robust flag —
            # same plane views, ~12 per-step pipeline copies instead of
            # ~223 (~3.7 ns each, probe-measured)
            const_ref, pk_ref, dc_ref, rb_ref, act_ref = refs[:5]
            cpk = const_ref[...]
            spk = pk_ref[...]
            vals = [brick(bc), brick(bl),
                    brick(cpk[0:2]), brick(cpk[2:3]),        # meas, var
                    brick(spk[0:6]), brick(spk[6:9]),        # f_eta_c/l
                    brick(spk[9:30]), brick(spk[30:48]),     # f_lam_cc/cl
                    brick(spk[48:54]),                       # f_lam_ll
                    brick(spk[54:60]), brick(spk[60:81]),    # msg_c eta/lam
                    brick(spk[81:84]), brick(spk[84:90]),    # msg_l eta/lam
                    brick(spk[90:91]),                       # damping
                    brick(dc_ref[...]),                      # damping_count
                    brick(spk[91:100]), brick(spk[100:109]),  # mu, lin_mu
                    brick(rb_ref[...]), brick(act_ref[...])]
            intr = brick(cpk[3:6]) if has_intr else None
            outs = edge_math(*vals, k_ref, cfg, intr=intr, premu=pm)
            opk_ref, odc_ref, orb_ref = refs[5:8]
            flat = [o.reshape(-1, be) for o in outs]
            # EDGE_MATH_OUTPUTS rows 0..9 (f_*, msg_*, damping) are the
            # first 91 packed rows, in order; then mu, lin_mu
            opk_ref[...] = jnp.concatenate(
                flat[:10] + flat[11:13]).astype(opk_ref.dtype)
            odc_ref[...] = flat[10].astype(odc_ref.dtype)
            orb_ref[...] = flat[13].astype(orb_ref.dtype)
            cam_part_ref, lmk_part_ref = refs[8:10]
        else:
            vals = [brick(bc), brick(bl)]
            for r in refs[:n_in]:
                vals.append(brick(r[...]))
            # optional Snavely intrinsics: trailing input so the
            # state-operand aliasing indices are model-independent
            intr = brick(refs[n_in][...]) if has_intr else None
            o0 = n_in + int(has_intr)
            outs = edge_math(*vals, k_ref, cfg, intr=intr, premu=pm)
            flat = []
            for r, o in zip(refs[o0:o0 + len(outs)], outs):
                o2 = o.reshape(r.shape[0], -1)
                r[...] = o2.astype(r.dtype)
                flat.append(o2)
            cam_part_ref, lmk_part_ref = refs[o0 + len(outs):]
        # reduction epilogue: messages (already in registers) -> per-CELL
        # window accumulations via the same one-hots. Output blocks are
        # keyed by grid cell (base/128); consecutive grid steps that share
        # a cell revisit the same output block, so the partial accumulates
        # in VMEM and is written to HBM once per cell.
        msg_cam = jnp.concatenate([flat[5], flat[6]])          # [27, BE]
        msg_lmk = jnp.concatenate([flat[7], flat[8]])          # [9, BE]

        @plx.when(first_c)
        def _():
            cam_part_ref[...] = jnp.zeros_like(cam_part_ref)

        @plx.when(first_l)
        def _():
            lmk_part_ref[...] = jnp.zeros_like(lmk_part_ref)

        if sub_mode:
            # sub-blocked reduce: per 128-edge sub-block, contract the
            # message slice against the SAME small one-hot (oh-first, so
            # the partial lands VAR-MAJOR [ws, comp]) and accumulate into
            # the cell-keyed output at a dynamic SUBLANE offset (the one
            # mechanism round 3 left untried; probe-verified on v5e).
            # The big [W, BE] one-hots are never built.
            def sub_reduce(msg, idx_ref, base0, ws, w, part_ref):
                comp = msg.shape[0]
                lanes = part_ref.shape[-1]
                for j in range(nsub):
                    oh, off = sub_oh(idx_ref, base0, ws, w, j)
                    mj = msg[:, j * 128:(j + 1) * 128]
                    d = dot3(mj, oh, (((1,), (1,)), ((), ())),
                             oh_first=True)                  # [ws, comp]
                    pad = jnp.zeros((ws, lanes - comp), jnp.float32)
                    part_ref[0, plx.ds(off, ws), :] += jnp.concatenate(
                        [d, pad], axis=1)

            sub_reduce(msg_cam, cam_idx_ref, c0, wsc, wc, cam_part_ref)
            sub_reduce(msg_lmk, lmk_idx_ref, l0, wsl, wl, lmk_part_ref)
        elif var_major:
            # var-major partials [W, 128]: the XLA-side combine then only
            # merges MAJOR dims (bitcasts, no relayout copies) and the new
            # belief TABLE comes out directly — the hot loop never
            # materialises plane-form beliefs. Messages are zero-padded to
            # the 128-lane width; the MXU tile count is identical (27 and
            # 128 both round up to one 128-row tile).
            mc_pad = jnp.concatenate(
                [msg_cam, jnp.zeros((128 - msg_cam.shape[0], be),
                                    jnp.float32)])
            ml_pad = jnp.concatenate(
                [msg_lmk, jnp.zeros((128 - msg_lmk.shape[0], be),
                                    jnp.float32)])
            cam_part_ref[...] += dot3(
                mc_pad, oh_c, (((1,), (1,)), ((), ())), oh_first=True)[None]
            lmk_part_ref[...] += dot3(
                ml_pad, oh_l, (((1,), (1,)), ((), ())), oh_first=True)[None]
        else:
            cam_part_ref[...] += dot3(
                msg_cam, oh_c, (((1,), (1,)), ((), ())))[None]
            lmk_part_ref[...] += dot3(
                msg_lmk, oh_l, (((1,), (1,)), ((), ())))[None]

    inner()


def sweep_fused_pallas(
    inputs: tuple, cam_tbl: jax.Array, lmk_tbl: jax.Array,
    cam_idx: jax.Array, lmk_idx: jax.Array,
    cam_win, lmk_win, k: jax.Array, cfg: GBPConfig,
    interpret: bool = False, var_major: bool = False,
    intr: jax.Array | None = None, premu: bool = False,
):
    """Fused sweep. ``inputs`` = EDGE_MATH_INPUTS WITHOUT bc/bl; the belief
    tables are var-major lane-padded ([rows, 128], cols 0..26 / 0..8 used;
    with ``premu`` the per-variable means + validity ride cols 27..33 /
    9..12 and are gathered per edge for free — core.gbp._make_tables).
    Returns (EDGE_MATH_OUTPUTS tuple, cam_grid [NC_c, 27, Wc],
    lmk_grid [NC_l, 9, Wl]) — cell-keyed window accumulations; merge with
    reduce_kernel.combine_grid. With ``var_major`` the grids come back
    transposed and lane-padded ([NC, W, 128]) for the table-carried hot
    loop (reduce_kernel.combine_grid_var) — combine reshapes then merge
    only major dims, which XLA lowers to bitcasts instead of relayout
    copies.
    """
    e = inputs[-1].shape[-1]
    sub = 8
    be = max(cfg.pallas_block_edges, sub * 128)
    assert cam_win.block_edges == be and lmk_win.block_edges == be
    e_pad = _round_up(e, be)
    pad = e_pad - e
    nb = e_pad // be
    subw = ((cam_win.sub_w, lmk_win.sub_w)
            if (cfg.pallas_subblock and not var_major
                and cam_win.sub_w > 0 and lmk_win.sub_w > 0)
            else (0, 0))

    def prep(x):
        if x.ndim == 1:
            x = x[None]
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.uint8)
        if pad:
            x = jnp.pad(x, [(0, 0), (0, pad)])
        return x

    prepped = [prep(x) for x in inputs]
    if intr is not None:
        prepped.append(prep(intr))
    ci = prep(cam_idx)
    li = prep(lmk_idx)
    if subw[0]:
        # sub-blocked mode reads idx per 128-edge SUB-block as ref ROWS
        ci = ci.reshape(e_pad // 128, 128)
        li = li.reshape(e_pad // 128, 128)
    f = prepped[0].dtype
    dt = {"f": f, "i": jnp.int32, "u": jnp.uint8}
    nc_c = cam_win.visited.shape[0]
    nc_l = lmk_win.visited.shape[0]
    out_shapes = [jax.ShapeDtypeStruct((n, e_pad), dt[kind])
                  for (n, kind) in _OUT_LAYOUT]
    if subw[0]:
        # var-major cell partials, lanes = pow2 >= comp (27 -> 32, 9 -> 16)
        out_shapes += [
            jax.ShapeDtypeStruct((nc_c, cam_win.w, 32), jnp.float32),
            jax.ShapeDtypeStruct((nc_l, lmk_win.w, 16), jnp.float32),
        ]
    elif var_major:
        out_shapes += [
            jax.ShapeDtypeStruct((nc_c, cam_win.w, 128), jnp.float32),
            jax.ShapeDtypeStruct((nc_l, lmk_win.w, 128), jnp.float32),
        ]
    else:
        out_shapes += [
            jax.ShapeDtypeStruct((nc_c, 27, cam_win.w), jnp.float32),
            jax.ShapeDtypeStruct((nc_l, 9, lmk_win.w), jnp.float32),
        ]

    def spec(shape):
        return plx.BlockSpec((shape[0], be), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM)

    def idx_spec(x):
        if subw[0]:
            return plx.BlockSpec((be // 128, 128), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM)
        return spec(x.shape)

    prefetch = bool(cfg.pallas_window_prefetch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=([plx.BlockSpec(memory_space=pltpu.SMEM),    # intrinsics
                   idx_spec(ci), idx_spec(li),
                   plx.BlockSpec(memory_space=plx.ANY),     # cam table
                   plx.BlockSpec(memory_space=plx.ANY)]     # lmk table
                  + [spec(x.shape) for x in prepped]),
        out_specs=([spec(s.shape) for s in out_shapes[:-2]]
                   + [plx.BlockSpec((1,) + out_shapes[-2].shape[1:],
                                    lambda i, cb, lb, *_: (cb[i] // 128,
                                                           0, 0),
                                    memory_space=pltpu.VMEM),
                      plx.BlockSpec((1,) + out_shapes[-1].shape[1:],
                                    lambda i, cb, lb, *_: (lb[i] // 128,
                                                           0, 0),
                                    memory_space=pltpu.VMEM)]),
        # window buffers as SCRATCH (persists across grid steps) so blocks
        # sharing a window base skip the re-fetch; doubled for the
        # prefetch double-buffer (see _fused_kernel.window)
        scratch_shapes=[
            pltpu.VMEM(((1 + prefetch) * cam_win.w, cam_tbl.shape[-1]),
                       jnp.float32),
            pltpu.VMEM(((1 + prefetch) * lmk_win.w, lmk_tbl.shape[-1]),
                       jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    n_planes = sum(x.shape[0] for x in prepped) + sum(
        s.shape[-2] if len(s.shape) == 3 else s.shape[0] for s in out_shapes)
    cost = plx.CostEstimate(
        flops=3000 * e_pad + 2 * e_pad * 32 * (cam_win.w + lmk_win.w),
        bytes_accessed=n_planes * e_pad * 4,
        transcendentals=12 * e_pad,
    )

    outs = plx.pallas_call(
        functools.partial(_fused_kernel, cfg, sub, cam_win.w, lmk_win.w,
                          var_major, bool(interpret), intr is not None,
                          bool(premu), False, subw, prefetch),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        cost_estimate=cost,
        interpret=interpret,
        # In-place update of the 14 per-edge state arrays (see
        # sweep_edge_math_pallas): kills the per-sweep result->carry
        # copies in the solver's scan. Operand indices include the four
        # scalar-prefetch arrays and (k, ci, li, cam_tbl, lmk_tbl).
        input_output_aliases={11 + i: i for i in range(14)},
    )(cam_win.base, lmk_win.base,
      _slot_parity(cam_win.base), _slot_parity(lmk_win.base),
      k, ci, li, cam_tbl, lmk_tbl, *prepped)

    outs = list(outs)
    cam_part, lmk_part = outs[-2], outs[-1]
    outs = outs[:-2]
    if pad:
        outs = [o[:, :e] for o in outs]
    outs[-1] = outs[-1].astype(jnp.bool_)
    return tuple(outs), cam_part, lmk_part


def sweep_fused_packed(
    pk: jax.Array, dc: jax.Array, rb: jax.Array, active: jax.Array,
    const_pack: jax.Array, cam_tbl: jax.Array, lmk_tbl: jax.Array,
    cam_idx: jax.Array, lmk_idx: jax.Array,
    cam_win, lmk_win, k: jax.Array, cfg: GBPConfig,
    interpret: bool = False, has_intr: bool = False,
):
    """Fused sweep on the PACKED edge-state carry: ``pk`` [109, E] f32
    (core.gbp.EDGE_PACK_FIELDS rows), ``dc`` [E] i32 damping counter,
    ``rb`` [E] bool robust flag, ``active`` [E] (graph constant),
    ``const_pack`` = meas|meas_var(|intr) [3 or 6, E]. Identical math to
    :func:`sweep_fused_pallas` (same kernel body, premu on) with ~12
    pipelined operand copies per grid step instead of ~223.
    Returns (pk', dc', rb', cam_grid, lmk_grid)."""
    e = pk.shape[-1]
    sub = 8
    be = max(cfg.pallas_block_edges, sub * 128)
    assert cam_win.block_edges == be and lmk_win.block_edges == be
    e_pad = _round_up(e, be)
    pad = e_pad - e
    nb = e_pad // be

    def prep(x):
        if x.ndim == 1:
            x = x[None]
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.uint8)
        if pad:
            x = jnp.pad(x, [(0, 0), (0, pad)])
        return x

    subw = ((cam_win.sub_w, lmk_win.sub_w)
            if (cfg.pallas_subblock
                and cam_win.sub_w > 0 and lmk_win.sub_w > 0)
            else (0, 0))
    pk_p, dc_p, rb_p, act_p, const_p = (prep(pk), prep(dc), prep(rb),
                                        prep(active), prep(const_pack))
    ci = prep(cam_idx)
    li = prep(lmk_idx)
    if subw[0]:
        ci = ci.reshape(e_pad // 128, 128)
        li = li.reshape(e_pad // 128, 128)
    nc_c = cam_win.visited.shape[0]
    nc_l = lmk_win.visited.shape[0]
    out_shapes = [
        jax.ShapeDtypeStruct((pk_p.shape[0], e_pad), pk_p.dtype),
        jax.ShapeDtypeStruct((1, e_pad), jnp.int32),
        jax.ShapeDtypeStruct((1, e_pad), jnp.uint8),
    ]
    if subw[0]:
        out_shapes += [
            jax.ShapeDtypeStruct((nc_c, cam_win.w, 32), jnp.float32),
            jax.ShapeDtypeStruct((nc_l, lmk_win.w, 16), jnp.float32),
        ]
    else:
        out_shapes += [
            jax.ShapeDtypeStruct((nc_c, 27, cam_win.w), jnp.float32),
            jax.ShapeDtypeStruct((nc_l, 9, lmk_win.w), jnp.float32),
        ]

    def spec(shape):
        return plx.BlockSpec((shape[0], be), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM)

    def idx_spec(x):
        if subw[0]:
            return plx.BlockSpec((be // 128, 128), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM)
        return spec(x.shape)

    prefetch = bool(cfg.pallas_window_prefetch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=[plx.BlockSpec(memory_space=pltpu.SMEM),     # intrinsics
                  idx_spec(ci), idx_spec(li),
                  plx.BlockSpec(memory_space=plx.ANY),      # cam table
                  plx.BlockSpec(memory_space=plx.ANY),      # lmk table
                  spec(const_p.shape), spec(pk_p.shape),
                  spec(dc_p.shape), spec(rb_p.shape), spec(act_p.shape)],
        out_specs=([spec(s.shape) for s in out_shapes[:3]]
                   + [plx.BlockSpec((1,) + out_shapes[3].shape[1:],
                                    lambda i, cb, lb, *_: (cb[i] // 128,
                                                           0, 0),
                                    memory_space=pltpu.VMEM),
                      plx.BlockSpec((1,) + out_shapes[4].shape[1:],
                                    lambda i, cb, lb, *_: (lb[i] // 128,
                                                           0, 0),
                                    memory_space=pltpu.VMEM)]),
        scratch_shapes=[
            pltpu.VMEM(((1 + prefetch) * cam_win.w, cam_tbl.shape[-1]),
                       jnp.float32),
            pltpu.VMEM(((1 + prefetch) * lmk_win.w, lmk_tbl.shape[-1]),
                       jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    cost = plx.CostEstimate(
        flops=3000 * e_pad + 2 * e_pad * 32 * (cam_win.w + lmk_win.w),
        bytes_accessed=2 * (pk_p.shape[0] + 6) * e_pad * 4,
        transcendentals=12 * e_pad,
    )

    outs = plx.pallas_call(
        functools.partial(_fused_kernel, cfg, sub, cam_win.w, lmk_win.w,
                          False, bool(interpret), bool(has_intr),
                          True, True, subw, prefetch),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        cost_estimate=cost,
        interpret=interpret,
        # in-place update of the packed carry: operands are (4 prefetch,
        # k, ci, li, cam_tbl, lmk_tbl, const, pk, dc, rb, act)
        input_output_aliases={10: 0, 11: 1, 12: 2},
    )(cam_win.base, lmk_win.base,
      _slot_parity(cam_win.base), _slot_parity(lmk_win.base),
      k, ci, li, cam_tbl, lmk_tbl, const_p, pk_p, dc_p, rb_p, act_p)

    pk_o, dc_o, rb_o, cam_part, lmk_part = outs
    if pad:
        pk_o, dc_o, rb_o = (x[:, :e] for x in (pk_o, dc_o, rb_o))
    return (pk_o, dc_o[0], rb_o[0].astype(jnp.bool_),
            cam_part, lmk_part)


def uses_native_gather(e: int, cfg: GBPConfig) -> bool:
    """True when the kernel takes beliefs in gather-native [E, comp_pad]
    layout (the large-E in-kernel-brick path). The caller then gathers from
    a VAR-MAJOR table so XLA's gather output feeds the kernel with no
    relayout copy. MEASURED SLOWER on v5e (the per-block [BE, 32] VMEM
    transpose costs more than the two [*, E] HBM relayout copies it saves:
    16.6 vs 13.9 ms/sweep at 1.09M edges) — kept behind a flag for other
    hardware generations."""
    if not cfg.pallas_native_gather:
        return False
    block = max(cfg.pallas_block_edges, 8 * 128)
    return _round_up(e, block) > cfg.pallas_hbm_brick_max_edges
