"""Static-permutation replay over a Benes network (TPU Pallas).

The hot loop moves packed int8 payload lanes between citizen order and
work/rider order with packed u32 permutation sorts (~2.8 ms at 3.46M,
~50 ms/pass at 63M — docs/PERF.md).  But those permutations are STATIC
(World.wpos / work_perm / rpos), so every comparison the sort performs is
decided at world-build time.  This module replays the permutation as a
fixed swap network instead:

* host side (once per world): route the permutation through a Benes
  network — ``native/esucd_native.cc::esucd_benes_route`` (the classic
  Waksman looping algorithm, ~3 s at 2^22) — producing one control bit
  per element per stage; ``2*k-1`` stages for ``n = 2^k`` (pad the
  permutation with an identity tail).  Control bits pack 8 stages per
  byte: ~25 MB at Y&H scale.
* device side (per use): one Pallas pass holding the whole payload in
  VMEM as i32, applying each stage as two static ``pltpu.roll``s and two
  selects.  Stage j swaps XOR-partners at distance ``d_j``; distances
  < 128 roll the lane axis, >= 128 roll the sublane axis.

Every stage is an involution, so replaying the stages in REVERSE order
applies the inverse permutation with the same control bits — one routed
table serves both directions of the citizen<->work order move.

Reference semantics being accelerated: the work/bus-order moves of
simulator.rs:262-405, realised here as static permutations (SURVEY §7).
"""

from __future__ import annotations

import ctypes
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def benes_distances(k: int) -> tuple[int, ...]:
    """XOR distances of the 2k-1 stages, outermost first."""
    return tuple(
        [1 << (k - 1 - j) for j in range(k)]
        + [1 << (j + 1) for j in range(k - 1)]
    )


def route_permutation(src: np.ndarray) -> tuple[np.ndarray, int]:
    """Route gather permutation ``src`` (out[o] = in[src[o]], bijection on
    [0, n_real)) through a Benes network, padding to the next power of two
    with an identity tail.  Returns ``(ctrl_packed, k)`` where ctrl_packed
    is ``(ceil((2k-1)/8), 2**k)`` uint8 with stage j in bit ``j % 8`` of
    group ``j // 8``.
    """
    from ..data.osm.native import load_library

    n_real = int(src.shape[0])
    # minimum 2^10 so the padded lane fills one (8, 128) Mosaic tile
    k = max(10, int(np.ceil(np.log2(max(n_real, 2)))))
    n2 = 1 << k
    full = np.arange(n2, dtype=np.int32)
    full[:n_real] = np.asarray(src, np.int32)
    lib = load_library()
    lib.esucd_benes_route.restype = ctypes.c_int
    lib.esucd_benes_route.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    n_stages = 2 * k - 1
    # the native router writes bit-packed groups directly (8 stages/byte),
    # so no unpacked (2k-1, n) transient is ever allocated (~3.4 GB at
    # 2^26 unpacked vs ~430 MB packed)
    groups = (n_stages + 7) // 8
    packed = np.zeros((groups, n2), np.uint8)
    rc = lib.esucd_benes_route(
        full.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        k,
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError("not a bijection")
    return packed, k


_CHUNK_ROWS = 1024  # i32 working chunk = 0.5 MB; stage temps must stay
                    # under the 16 MB scoped-VMEM stack limit (2048 rows
                    # measured 17 MB scoped at 2^22)


def _kernel(k, reverse, rows, x_in_ref, ctrl_ref, o_ref, x_ref):
    # Grid = one step per stage; the payload lives in a persistent VMEM
    # scratch (TPU grids run sequentially, scratch survives steps).  A
    # fully-unrolled single-call version spilled ~112 MB of vector
    # registers at 2^22; full-array per-stage temps blew the 16 MB scoped
    # stack — so each stage updates the scratch in row CHUNKS.  Stages
    # whose XOR distance spans chunks need no rolls at all: partner chunks
    # pair element-for-element at the same relative position.
    b = pl.program_id(0)
    ds = benes_distances(k)
    order = (
        list(reversed(range(len(ds)))) if reverse else list(range(len(ds)))
    )
    R = min(_CHUNK_ROWS, rows)
    n_chunks = rows // R

    @pl.when(b == 0)
    def _():
        for ci in range(n_chunks):
            sl = pl.ds(ci * R, R)
            x_ref[sl, :] = x_in_ref[sl, :].astype(jnp.int32)

    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    for step, j in enumerate(order):
        @pl.when(b == step)
        def _(j=j):
            d = ds[j]
            dr = d // LANES
            if dr < R:
                # within-chunk: lane rolls (d < 128) or row rolls (dr < R;
                # chunk bases are multiples of R so row^dr stays inside)
                for ci in range(n_chunks):
                    sl = pl.ds(ci * R, R)
                    x = x_ref[sl, :]
                    c = (ctrl_ref[0, sl, :].astype(jnp.int32) >> (j % 8)) & 1
                    if d < LANES:
                        lo = pltpu.roll(x, LANES - d, 1)  # partner col+d
                        hi = pltpu.roll(x, d, 1)          # partner col-d
                        part = jnp.where((col & d) == 0, lo, hi)
                    else:
                        lo = pltpu.roll(x, R - dr, 0)
                        hi = pltpu.roll(x, dr, 0)
                        part = jnp.where((row & dr) == 0, lo, hi)
                    x_ref[sl, :] = jnp.where(c != 0, part, x)
            else:
                # cross-chunk: chunk ci pairs with ci ^ (dr // R), same
                # relative position — two reads, two selects, two writes
                cd = dr // R
                for ci in range(n_chunks):
                    if ci & cd:
                        continue
                    sa = pl.ds(ci * R, R)
                    sb = pl.ds((ci ^ cd) * R, R)
                    xa = x_ref[sa, :]
                    xb = x_ref[sb, :]
                    ca = (ctrl_ref[0, sa, :].astype(jnp.int32) >> (j % 8)) & 1
                    cb = (ctrl_ref[0, sb, :].astype(jnp.int32) >> (j % 8)) & 1
                    x_ref[sa, :] = jnp.where(ca != 0, xb, xa)
                    x_ref[sb, :] = jnp.where(cb != 0, xa, xb)

    @pl.when(b == len(order) - 1)
    def _():
        for ci in range(n_chunks):
            sl = pl.ds(ci * R, R)
            o_ref[sl, :] = x_ref[sl, :].astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("k", "reverse", "n_out", "interpret")
)
def _benes_permute(payload, ctrl_groups, *, k, reverse, n_out, interpret):
    n2 = 1 << k
    rows = n2 // LANES
    n_stages = 2 * k - 1
    p = payload.astype(jnp.int8)
    if p.shape[0] != n2:
        p = jnp.concatenate(
            [p, jnp.zeros((n2 - p.shape[0],), jnp.int8)]
        )
    ctrl = jnp.stack([g.reshape(rows, LANES) for g in ctrl_groups])

    def stage_group(b):  # control group holding stage order[b]'s bit
        j = (n_stages - 1 - b) if reverse else b
        return j // 8

    whole = pl.BlockSpec(
        (rows, LANES), lambda b: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, k, reverse, rows),
        grid=(n_stages,),
        in_specs=[
            whole,
            pl.BlockSpec(
                (1, rows, LANES),
                lambda b: (stage_group(b), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=whole,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int8),
        scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.int32)],
        # the payload scratch alone is 16 MiB at 2^22 — past the default
        # 16 MiB scoped-VMEM budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p.reshape(rows, LANES), ctrl)
    return out.reshape(-1)[:n_out]


def benes_permute(payload, ctrl_packed, k: int, *, reverse=False,
                  n_out=None, interpret=None):
    """Apply the routed permutation to an int8-like ``payload`` lane.

    ``out[o] = payload[src[o]]`` for the ``src`` given to
    :func:`route_permutation` (``reverse=True`` applies src's inverse).
    ``payload`` may be shorter than ``2**k``; the identity tail keeps pad
    elements out of the real range.  ``interpret=None`` auto-selects the
    Pallas interpreter off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if n_out is None:
        n_out = payload.shape[0]
    groups = tuple(jnp.asarray(g) for g in ctrl_packed)
    return _benes_permute(
        payload, groups, k=k, reverse=bool(reverse), n_out=int(n_out),
        interpret=bool(interpret),
    )
