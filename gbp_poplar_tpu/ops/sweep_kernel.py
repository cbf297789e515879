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


def _kernel(cfg: GBPConfig, sub: int, k_ref, *refs):
    from ..core.gbp import EDGE_MATH_INPUTS, edge_math

    n_in = len(EDGE_MATH_INPUTS)
    # Brick the block in VMEM when sub > 1: (comp, BE) -> (comp*sub,
    # BE/sub) so each logical row fills all `sub` sublanes. With sub == 1
    # the wrapper already bricked the HBM arrays (cheaper at small E, where
    # the whole-array reshape is cheap and the per-block relayout is not).
    vals = []
    for r in refs[:n_in]:
        x = r[...]
        if sub > 1:
            comp, be = x.shape
            x = x.reshape(comp * sub, be // sub)
        vals.append(x)
    outs = edge_math(*vals, k_ref, cfg)
    for r, o in zip(refs[n_in:], outs):
        if sub > 1:
            o = o.reshape(r.shape[0], -1)
        r[...] = o.astype(r.dtype)


def sweep_edge_math_pallas(inputs: tuple, k: jax.Array, cfg: GBPConfig,
                           interpret: bool = False):
    """Run core.gbp.edge_math as one blocked Pallas kernel over the edges.

    ``inputs`` is the tuple named by core.gbp.EDGE_MATH_INPUTS (plane
    arrays, edge axis trailing); ``k`` the [3,3] intrinsics. Returns the
    EDGE_MATH_OUTPUTS tuple with the original edge extent (per-edge scalar
    rows shaped (1, E), matching edge_math's convention). ``interpret``
    runs the kernel through the Pallas interpreter (CPU CI parity).
    """
    e = inputs[0].shape[-1]
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

    prepped = [prep(x) for x in inputs]
    f = prepped[0].dtype
    dt = {"f": f, "i": jnp.int32, "u": jnp.uint8}
    oshape = ((lambda n: (n * sub, e_pad // sub)) if hbm_brick
              else (lambda n: (n, e_pad)))
    out_shapes = [jax.ShapeDtypeStruct(oshape(n), dt[kind])
                  for (n, kind) in _OUT_LAYOUT]

    def spec(shape):
        return plx.BlockSpec((shape[0], be), lambda i: (0, i),
                             memory_space=pltpu.VMEM)

    n_planes_in = sum(x.shape[0] for x in prepped)
    n_planes_out = sum(s.shape[0] for s in out_shapes)
    cost = plx.CostEstimate(
        flops=3000 * e_pad,
        bytes_accessed=(n_planes_in + n_planes_out) * e_pad * 4,
        transcendentals=12 * e_pad,   # sqrt/sin/cos in Rodrigues + Cholesky
    )

    outs = plx.pallas_call(
        functools.partial(_kernel, cfg, kernel_sub),
        grid=(e_pad // (sub * be) if hbm_brick else e_pad // be,),
        in_specs=([plx.BlockSpec(memory_space=pltpu.SMEM)]      # intrinsics
                  + [spec(x.shape) for x in prepped]),
        out_specs=[spec(s.shape) for s in out_shapes],
        out_shape=out_shapes,
        cost_estimate=cost,
        interpret=interpret,
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
