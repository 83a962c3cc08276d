"""Fused Pallas TPU kernels for contiguous-run totals.

The hot loop's per-mixing-group infected counts are contiguous-run totals
(see ops/runsums.py for the math: one cumsum + a boundary-masked cummax and
a reverse cummin per boundary structure).  Lowered through XLA those are
five reduce-window passes over HBM (~0.7-1.3 ms each at N=3.5M, measured —
docs/PERF.md); this module fuses them into two bandwidth-bound Pallas
passes using the classic two-level scan decomposition:

  kernel A  per-block flat cumsum -> tiny per-block summaries
            (block sum, masked max of start prefixes, masked min of end
            values)
  XLA       exclusive combine over the (n_blocks,) summaries
            (cumsum / cummax / reverse cummin — trivial size)
  kernel B  recompute the block-local scans, splice in the cross-block
            carries, emit the per-element run totals

Blocks are independent in both kernels, so Mosaic pipelines the DMA freely;
there is no sequential grid dependency.  All within-block scans are manual
log-step shifted-select reductions on (R, 128) tiles (lane scan + row-total
scan + broadcast), which is also how XLA lowers them — but here the five
scan quantities share one data pass instead of five.

Reference semantics being accelerated: per-building / per-room infected
counts (building.rs:202-204, :278-280, :494-522 via simulator.rs:307-308).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_NEG = -(2**30)  # < any prefix value; survives adding a block offset < 2**22
_POS = 2**30


def _lane_scan(x, op, identity):
    """Inclusive scan along axis=1 (the 128 lanes) of a (R, 128) block."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < LANES:
        sh = pltpu.roll(x, d, 1)  # sh[r, c] = x[r, c-d] (circular)
        x = op(x, jnp.where(col >= d, sh, identity))
        d *= 2
    return x


def _row_scan(x, op, identity):
    """Inclusive scan along axis=0 of a (R, 1) column."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = 1
    while d < x.shape[0]:
        sh = pltpu.roll(x, d, 0)
        x = op(x, jnp.where(row >= d, sh, identity))
        d *= 2
    return x


def _flat_scan(x, op, identity):
    """Inclusive scan of a (R, 128) block in row-major (flattened) order."""
    lane = _lane_scan(x, op, identity)
    row_tot = lane[:, LANES - 1 : LANES]
    rp = _row_scan(row_tot, op, identity)
    rp = pltpu.roll(rp, 1, 0)  # exclusive: carry from rows strictly above
    row = jax.lax.broadcasted_iota(jnp.int32, rp.shape, 0)
    rp = jnp.where(row >= 1, rp, identity)
    return op(lane, rp)


def _lane_rev_scan(x, op, identity):
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < LANES:
        sh = pltpu.roll(x, LANES - d, 1)  # sh[r, c] = x[r, c+d] (circular)
        x = op(x, jnp.where(col < LANES - d, sh, identity))
        d *= 2
    return x


def _row_rev_scan(x, op, identity):
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    rows = x.shape[0]
    d = 1
    while d < rows:
        sh = pltpu.roll(x, rows - d, 0)
        x = op(x, jnp.where(row < rows - d, sh, identity))
        d *= 2
    return x


def _flat_rev_scan(x, op, identity):
    """Reverse (suffix) scan of a (R, 128) block in flattened order."""
    lane = _lane_rev_scan(x, op, identity)
    row_tot = lane[:, 0:1]
    rp = _row_rev_scan(row_tot, op, identity)
    rp = pltpu.roll(rp, x.shape[0] - 1, 0)  # exclusive: carry from rows below
    row = jax.lax.broadcasted_iota(jnp.int32, rp.shape, 0)
    rp = jnp.where(row < x.shape[0] - 1, rp, identity)
    return op(lane, rp)


def _summary_kernel(n_sets, v_ref, *refs):
    # Per-block summary tables are (8, 128) VMEM tile blocks — O(1) VMEM
    # per grid step regardless of n_blocks, unlike full (n_blocks, 1)
    # windows whose lane-padded staging grew with the grid and broke
    # compilation beyond ~16M elements.
    mask_refs = refs[:2 * n_sets]
    out_refs = refs[2 * n_sets:]
    v = v_ref[:].astype(jnp.int32)
    cs = _flat_scan(v, jnp.add, jnp.int32(0))
    cse = cs - v
    # Only the (0, 0) corner of each (8, 128) tile carries the value —
    # Mosaic lacks vector<1x1> -> vector<8x128> broadcast, and corner writes
    # avoid it; the XLA side reads [::8, 0].
    out_refs[0][0:1, 0:1] = cs[cs.shape[0] - 1 :, LANES - 1 :]
    for k in range(n_sets):
        start = mask_refs[2 * k][:] != 0
        end = mask_refs[2 * k + 1][:] != 0
        out_refs[1 + 2 * k][0:1, 0:1] = jnp.max(
            jnp.where(start, cse, _NEG)
        ).reshape(1, 1)
        out_refs[2 + 2 * k][0:1, 0:1] = jnp.min(
            jnp.where(end, cs, _POS)
        ).reshape(1, 1)


def _apply_kernel(n_sets, v_ref, s_ref, *refs):
    mask_refs = refs[:2 * n_sets]
    carry_refs = refs[2 * n_sets : 4 * n_sets]
    out_refs = refs[4 * n_sets:]
    v = v_ref[:].astype(jnp.int32)
    cs = _flat_scan(v, jnp.add, jnp.int32(0))
    cse = cs - v
    s = s_ref[0, 0]
    for k in range(n_sets):
        start = mask_refs[2 * k][:] != 0
        end = mask_refs[2 * k + 1][:] != 0
        c = carry_refs[2 * k][0, 0]
        d = carry_refs[2 * k + 1][0, 0]
        sp = _flat_scan(jnp.where(start, cse, _NEG), jnp.maximum, jnp.int32(_NEG))
        sp = jnp.maximum(sp + s, c)
        ep = _flat_rev_scan(jnp.where(end, cs, _POS), jnp.minimum, jnp.int32(_POS))
        ep = jnp.minimum(ep + s, d)
        out_refs[k][:] = ep - sp


def _pad_to(x, n_padded, fill):
    n = x.shape[0]
    if n == n_padded:
        return x
    return jnp.concatenate(
        [x, jnp.full((n_padded - n,), fill, x.dtype)]
    )


@functools.partial(
    jax.jit, static_argnames=("n_sets", "tile_rows", "interpret")
)
def _run_totals_fused(v, masks, *, n_sets, tile_rows, interpret):
    n = v.shape[0]
    block = tile_rows * LANES
    n_blocks = pl.cdiv(n, block)
    n_padded = n_blocks * block

    # Padding elements form their own zero-valued runs (start=end=1), so
    # they never leak into real totals; pad outputs are sliced off.
    v2 = _pad_to(v.astype(jnp.int8), n_padded, 0).reshape(-1, LANES)
    m2 = [
        _pad_to(m.astype(jnp.int8), n_padded, 1).reshape(-1, LANES)
        for m in masks
    ]

    row_block = pl.BlockSpec(
        (tile_rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    # Per-block scalar tables are (8*n_blocks, 128) arrays traversed one
    # (8, 128) tile per grid step (scalar broadcast across the tile): O(1)
    # VMEM per step.  Full (n_blocks, 1) windows (SMEM or VMEM) scale with
    # the grid and stopped compiling beyond ~16M elements; Mosaic rejects
    # blocks narrower than one (8, 128) tile.
    cell = pl.BlockSpec(
        (8, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    cell_shape = jax.ShapeDtypeStruct((n_blocks * 8, LANES), jnp.int32)

    summaries = pl.pallas_call(
        functools.partial(_summary_kernel, n_sets),
        grid=(n_blocks,),
        in_specs=[row_block] * (1 + 2 * n_sets),
        out_specs=[cell] * (1 + 2 * n_sets),
        out_shape=[cell_shape] * (1 + 2 * n_sets),
        interpret=interpret,
    )(v2, *m2)
    sums = summaries[0][::8, 0]

    # Cross-block combine — (n_blocks,)-sized, trivial for XLA.
    s_excl = (jnp.cumsum(sums) - sums).astype(jnp.int32)
    idx = jnp.arange(n_blocks)

    def rows(x):  # (n_blocks,) -> (8*n_blocks, LANES) for the cell spec
        return jnp.broadcast_to(
            x[:, None, None], (n_blocks, 8, LANES)
        ).reshape(n_blocks * 8, LANES)

    carries = []
    for k in range(n_sets):
        m_start = summaries[1 + 2 * k][::8, 0] + s_excl
        m_end = summaries[2 + 2 * k][::8, 0] + s_excl
        c = jax.lax.cummax(m_start)
        c = jnp.where(idx >= 1, jnp.roll(c, 1), _NEG)
        d = jax.lax.cummin(m_end, reverse=True)
        d = jnp.where(idx < n_blocks - 1, jnp.roll(d, -1), _POS)
        carries += [rows(c), rows(d)]

    outs = pl.pallas_call(
        functools.partial(_apply_kernel, n_sets),
        grid=(n_blocks,),
        in_specs=[row_block, cell]
        + [row_block] * (2 * n_sets)
        + [cell] * (2 * n_sets),
        out_specs=[row_block] * n_sets,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * tile_rows, LANES), jnp.int32)
        ]
        * n_sets,
        interpret=interpret,
    )(v2, rows(s_excl), *m2, *carries)
    return tuple(o.reshape(-1)[:n] for o in outs)


def _cumsum_apply_kernel(v_ref, base_ref, o_ref):
    # No cross-step carry: the exclusive block prefix arrives as a cell
    # input, so the grid pipelines instead of serialising on SMEM.
    v = v_ref[:].astype(jnp.int32)
    cs = _flat_scan(v, jnp.add, jnp.int32(0))
    o_ref[:] = cs + base_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def _cumsum_pallas2(v, *, tile_rows, interpret):
    """Two-phase inclusive cumsum: XLA per-block sums -> tiny cross-block
    cumsum -> pipelined Pallas apply.  Bitwise-identical to the serial
    one-pass form; ~4x faster at 63M (the serial SMEM carry costs ~11us
    per grid step — docs/PERF.md)."""
    n = v.shape[0]
    block = tile_rows * LANES
    n_blocks = pl.cdiv(n, block)
    v2 = _pad_to(v.astype(jnp.int8), n_blocks * block, 0).reshape(-1, LANES)
    sums = v2.reshape(n_blocks, -1).astype(jnp.int32).sum(axis=1)
    s_excl = (jnp.cumsum(sums) - sums).astype(jnp.int32)
    base = jnp.broadcast_to(
        s_excl[:, None, None], (n_blocks, 8, LANES)
    ).reshape(n_blocks * 8, LANES)
    out = pl.pallas_call(
        _cumsum_apply_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (tile_rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * tile_rows, LANES), jnp.int32),
        interpret=interpret,
    )(v2, base)
    return out.reshape(-1)[:n]


def _cumsum_kernel(v_ref, o_ref, carry_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry_ref[0] = 0

    v = v_ref[:].astype(jnp.int32)
    cs = _flat_scan(v, jnp.add, jnp.int32(0))
    o_ref[:] = cs + carry_ref[0]
    carry_ref[0] = carry_ref[0] + cs[cs.shape[0] - 1, LANES - 1]


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def _cumsum_pallas(v, *, tile_rows, interpret):
    n = v.shape[0]
    block = tile_rows * LANES
    n_blocks = pl.cdiv(n, block)
    v2 = _pad_to(v.astype(jnp.int8), n_blocks * block, 0).reshape(-1, LANES)
    out = pl.pallas_call(
        _cumsum_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (tile_rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * tile_rows, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(v2)
    return out.reshape(-1)[:n]


def cumsum_pallas(v, *, tile_rows=1024, interpret=None):
    """Inclusive int32 cumsum of an (N,) int-like lane in one Pallas pass.

    The TPU grid executes sequentially, so the running total rides an SMEM
    scratch cell across blocks.  Replaces XLA's reduce-window lowering
    (~0.7 ms at N=3.5M) for the per-OA stats and vaccination tie-break
    cumsums.  ``interpret=None`` auto-selects the interpreter off-TPU.
    Values must fit int8 (the hot-loop callers pass 0/1 masks).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _cumsum_pallas(v, tile_rows=tile_rows, interpret=interpret)


def range_totals_pallas(v, lo, hi, **kw):
    """Totals of [lo, hi) ranges via one Pallas cumsum + two small gathers.
    Matches :func:`ops.runsums.range_totals`."""
    cs = cumsum_pallas(v, **kw)
    upper = jnp.where(hi > 0, jnp.take(cs, jnp.maximum(hi - 1, 0)), 0)
    lower = jnp.where(lo > 0, jnp.take(cs, jnp.maximum(lo - 1, 0)), 0)
    return upper - lower


def run_totals_fused(v, sets, *, tile_rows=1024, interpret=None):
    """Per-element contiguous-run totals for one or more static boundary
    structures sharing the same values lane.

    ``v``: (N,) int-like values (>= 0).  ``sets``: sequence of
    ``(start_mask, end_mask)`` bool (N,) pairs.  Returns a tuple of (N,)
    int32 run-total lanes, one per set.  Semantics match
    :func:`ops.runsums.run_totals`.  ``interpret=None`` auto-selects the
    Pallas interpreter off-TPU (the CPU test platform).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    masks = []
    for start, end in sets:
        masks += [start, end]
    return _run_totals_fused(
        v, tuple(masks), n_sets=len(sets), tile_rows=tile_rows,
        interpret=interpret,
    )
