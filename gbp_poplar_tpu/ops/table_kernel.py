"""Pallas kernel: fused premu belief-table build for the landmark kind.

The fused sweep kernel gathers beliefs from a var-major lane-padded table
([rows, 128]; core/gbp._make_tables). At L ~ 1M landmarks the XLA build of
that table is ~3 ms/sweep of glue — a chain of mean-solve fusion,
sanitize select, [13, L] -> [L, 13] transpose relayout, and a [rows, 128]
zero-pad whose 509 MB write runs at only ~330 GB/s (profiled at the
Venice shape, round 5). This kernel does the whole chain in one pass per
1024-row block: load the belief planes, solve the 3x3 means (the same
``planes`` row algebra ``core.gbp._variable_means`` uses), zero
non-finite means with a validity flag, transpose in VMEM, and write the
[1024, 128] table block once — HBM touched exactly read-9-planes +
write-table.

The 128-lane table width itself is immovable (window-DMA lane alignment,
see _make_tables' docstring); what this kernel removes is every
intermediate materialisation before that write. A partial-lane store
(``out_ref[:, :16] = x``) with input_output_aliases does compile and
preserves untouched lanes (probed on v5e, round 5) — but the aliased
block still round-trips through VMEM in full, so it saves no HBM
bandwidth and is not used here.

Camera tables stay on the XLA path: C is thousands at most, the whole cam
chain is microseconds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as plx
from jax.experimental.pallas import tpu as pltpu

from . import planes as pl

_BLOCK_ROWS = 1024


def _kernel(width: int, eta_ref, lam_ref, tbl_ref, mu_ref):
    # brick the plane rows so all 8 sublanes work: [1, R] -> [8, R/8]
    r = tbl_ref.shape[0]

    def rows(ref, n):
        return [ref[i:i + 1, :].reshape(8, r // 8) for i in range(n)]

    eta = rows(eta_ref, 3)
    lam_rows = [lam_ref[i:i + 1, :].reshape(8, r // 8) for i in range(6)]
    m = [[None] * 3 for _ in range(3)]
    for s, (i, j) in enumerate(pl.SYM3_IDX):
        m[i][j] = m[j][i] = lam_rows[s]
    inv = pl.inv_sym3(m)
    mu = pl.matvec(inv, eta)
    # premu sanitation rule — EXACTLY core/gbp._sanitize_means: a mean
    # with any non-finite component is zeroed whole and flagged invalid
    # (finiteness only; no posdef test — an indefinite-but-invertible
    # belief stays valid there, so it must here too)
    okf = jnp.isfinite(mu[0])
    for c in mu[1:]:
        okf = okf & jnp.isfinite(c)
    mu = [jnp.where(okf, c, 0.0) for c in mu]
    valid = okf.astype(eta[0].dtype)

    def flat(x):
        return x.reshape(1, r)

    cols = jnp.concatenate(
        [flat(x) for x in (eta + lam_rows + mu + [valid])])   # [13, R]
    pad = jnp.zeros((r, width - cols.shape[0]), cols.dtype)
    tbl_ref[...] = jnp.concatenate([jnp.transpose(cols), pad], axis=1)
    mu_ref[...] = jnp.concatenate([flat(x) for x in mu + [valid]])


def build_lmk_table(eta: jax.Array, lam: jax.Array, rows: int,
                    width: int = 128, interpret: bool = False):
    """(table [rows, 128], mu_planes [4, rows]) from lmk beliefs.

    ``eta`` [3, L], ``lam`` [6, L]; ``rows`` must be a multiple of 1024
    (core/gbp._win_table_rows rounds up). Table cols 0..2 = eta, 3..8 =
    packed Lambda, 9..11 = sanitized mean, 12 = validity; identical
    content to the XLA `_make_tables` path (same `planes` expressions) up
    to compiler FMA contraction — callers that pin bit-exact
    XLA-vs-kernel parity must use one build path for both sides.
    ``mu_planes`` rows 0..2 = the sanitized means, row 3 = validity
    (plane-form reuse by the accel accumulator without re-slicing the
    table)."""
    assert rows % _BLOCK_ROWS == 0, rows
    l = eta.shape[-1]
    padw = [(0, 0), (0, rows - l)]
    eta_p = jnp.pad(eta, padw)
    lam_p = jnp.pad(lam, padw)
    nb = rows // _BLOCK_ROWS

    tbl, mu = plx.pallas_call(
        functools.partial(_kernel, width),
        grid=(nb,),
        in_specs=[
            plx.BlockSpec((3, _BLOCK_ROWS), lambda i: (0, i),
                          memory_space=pltpu.VMEM),
            plx.BlockSpec((6, _BLOCK_ROWS), lambda i: (0, i),
                          memory_space=pltpu.VMEM),
        ],
        out_specs=[
            plx.BlockSpec((_BLOCK_ROWS, width), lambda i: (i, 0),
                          memory_space=pltpu.VMEM),
            plx.BlockSpec((4, _BLOCK_ROWS), lambda i: (0, i),
                          memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, width), eta.dtype),
            jax.ShapeDtypeStruct((4, rows), eta.dtype),
        ],
        cost_estimate=plx.CostEstimate(
            flops=60 * rows,
            bytes_accessed=(13 + width) * rows * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(eta_p, lam_p)
    return tbl, mu
