"""Fused citizen-phase Pallas kernel: the every-step elementwise soup in one pass.

Replaces the XLA lowering of fast-path stages 1-4 (engine/fastpath.py):
disease-timer advance (disease.rs:47-71), schedule movement for both the
citizen-order state and its work-order twin (citizen.rs:168-216), the
post-advance SEIRV census (simulator.rs:178), household infection pressure
as a shift-window sum over the static household layout (building.rs:202-204),
the per-citizen exposure chance (disease.rs:131-154), the home-exposure
Bernoulli draw (citizen.rs:221-248), and the packed int8 operands for the
work-side / bus-side ``lax.cond`` branches.

Lowered separately these are ~25 HBM passes plus a threefry uniform per
step; fused they are one read of ~18 lanes and one write of ~10.

Layout: lanes are viewed as (rows, 128) blocks of R rows.  The household
window needs each block's neighbours (households span at most
``max_household_size`` <= 24 elements, i.e. at most one row), so every lane
feeding the window is also read through 32-row halo blocks above and below
(clamped at the edges; the window's pos/size gates never select across a
real household boundary, so clamped garbage is never chosen).

The home draw uses counter-hash uniforms (ops/hashrng.py) so the kernel,
the XLA fallback and the interpreter produce identical streams.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TIMER_DTYPE
from .hashrng import hash_uniform

LANES = 128
HALO = 32  # rows; >= ceil(max_household_size / 1) elements of flat halo


class CitizenStatics(NamedTuple):
    """Static world lanes for the kernel, BIT-PACKED to cut its DMA
    roofline (the statics are over half the kernel's HBM traffic): 11 s8
    lanes become 5.  Padded to whole rows and reshaped (rows, 128); build
    once per chunk via make_citizen_statics.

    Layouts (work hours 0-24 and household fields < 32 fit 5 bits; the
    fused-kernel gate requires max_household_size <= 24):

    * ``a`` (halo): work_start | uses_transport<<5 | work_neq_home<<6
    * ``b`` (halo): work_end | (hh_pos & 7)<<5
    * ``c`` (halo): (hh_pos >> 3) | hh_size<<2
    * ``d`` (center): ws_work_start | mask_compliant<<5 | same_oa<<6
    * ``e`` (center): ws_work_end | ws_uses_transport<<5
    """

    a: jnp.ndarray  # int8
    b: jnp.ndarray  # int8
    c: jnp.ndarray  # int8
    d: jnp.ndarray  # int8
    e: jnp.ndarray  # int8


def _pad_rows(x, rows, fill=0):
    n = x.shape[0]
    need = rows * LANES - n
    if need:
        x = jnp.concatenate([x, jnp.full((need,), fill, x.dtype)])
    return x.reshape(rows, LANES)


def make_citizen_statics(world) -> CitizenStatics:
    """jnp ops only; call once per chunk (outside the scan) so the pads and
    bit-packs are loop-invariant."""
    n = world.n_citizens
    rows = pl.cdiv(n, LANES)
    p = functools.partial(_pad_rows, rows=rows)
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    ws = i32(world.work_start)
    we = i32(world.work_end)
    uses = i32(world.uses_transport)
    wneq = (world.work_building != world.home_building).astype(jnp.int32)
    pos = i32(world.hh_pos)
    size = i32(world.hh_size)
    compliant = i32(world.mask_compliant)
    same_oa = (world.work_oa == world.home_oa).astype(jnp.int32)
    ws_ws = i32(world.ws_work_start)
    ws_we = i32(world.ws_work_end)
    ws_uses = i32(world.ws_uses_transport)
    return CitizenStatics(
        a=p((ws | (uses << 5) | (wneq << 6)).astype(jnp.int8)),
        b=p((we | ((pos & 7) << 5)).astype(jnp.int8)),
        c=p(((pos >> 3) | (size << 2)).astype(jnp.int8)),
        d=p((ws_ws | (compliant << 5) | (same_oa << 6)).astype(jnp.int8)),
        e=p((ws_we | (ws_uses << 5)).astype(jnp.int8)),
    )


def _movement(h24, move, ws, we, uses, at_work8, on_bus8):
    """State lanes ride as int32 0/1 inside the kernel: Mosaic cannot
    truncate i8 vectors to i1 and cannot relayout i1 masks between the i8
    (32,128) and i32 (8,128) tilings, so every lane is lifted to int32 and
    every mask derives from int32 compares (one uniform tiling)."""
    one = jnp.int32(1)
    zero = jnp.int32(0)
    arm_bus_out = (h24 == ws - 1) & uses
    arm_to_work = h24 == ws
    arm_bus_home = (h24 == we - 1) & uses
    arm_to_home = h24 == we
    on_bus1 = jnp.where(
        move, jnp.where(arm_bus_out | arm_bus_home, one, zero), on_bus8
    )
    at_work1 = jnp.where(
        move,
        jnp.where(arm_to_work, one, jnp.where(arm_to_home, zero, at_work8)),
        at_work8,
    )
    return at_work1, on_bus1, arm_bus_out


# halo-extended lanes, in kernel argument order.  The five schedule bools
# (at_work, on_bus, bus_to_work, at_work_ws, on_bus_ws) ride PACKED in one
# s8 "sched" lane (bits 0-4, engine/state.py::pack_sched): 4 fewer 63M
# lanes in and out of the kernel per step, and no bool<->s8 boundary
# conversions (docs/PERF.md xplane decomposition).
_EXT_LANES = (
    "status", "timer", "sched",
    "a", "b", "c",   # packed statics (CitizenStatics docstring)
)
# center-only lanes
_CTR_LANES = ("d", "e")

# sched bit assignments (must match engine/state.py)
SCHED_AT_WORK = 1
SCHED_ON_BUS = 2
SCHED_BUS_TO_WORK = 4
SCHED_AT_WORK_WS = 8
SCHED_ON_BUS_WS = 16


def _kernel(K, ref_mask_sem, u8_trunc, n_real, block_rows, blocks_per_rep,
            refs):
    (ints, f32s), rep_refs, ext_c, ext_t, ext_b, ctr, outs = refs
    b = pl.program_id(0)
    h24 = ints[0, 0]
    seed = ints[3, 0].astype(jnp.uint32)
    if blocks_per_rep is None:
        move = ints[1, 0] != 0
        mask_status = ints[2, 0]
        e_time = ints[4, 0]
        i_time = ints[5, 0]
        p0 = f32s[0, 0]
        mask_scale = f32s[1, 0]  # 1 - mask_effectiveness
    else:
        # Ensemble mode (engine/packed.py): replicas are contiguous,
        # block-aligned spans, so the per-replica parameter set is one
        # scalar SMEM row selected by this block's replica id.  Halo rows
        # read from an adjacent replica are advanced with the WRONG
        # replica's (move, e_time, i_time) — harmless: halo lanes only
        # feed the household window, whose pos/size gates never select
        # across a household (hence replica) boundary.
        rep_i, rep_f = rep_refs
        rep = b // blocks_per_rep
        move = rep_i[rep, 0] != 0
        mask_status = rep_i[rep, 1]
        e_time = rep_i[rep, 2]
        i_time = rep_i[rep, 3]
        p0 = rep_f[rep, 0]
        mask_scale = rep_f[rep, 1]  # 1 - mask_effectiveness, per replica

    # ---- halo-extended frame -------------------------------------------
    def ext(i):
        return jnp.concatenate([ext_t[i][:], ext_c[i][:], ext_b[i][:]], axis=0)

    status = ext(0).astype(jnp.int32)
    timer = ext(1)
    sched = ext(2).astype(jnp.int32)
    at_work8 = sched & 1
    on_bus8 = (sched >> 1) & 1
    # bit-packed statics (CitizenStatics docstring); decode in i32 — the
    # shifts/ands are VPU-free next to the saved DMA lanes
    pa = ext(3).astype(jnp.int32)
    pb = ext(4).astype(jnp.int32)
    pc = ext(5).astype(jnp.int32)
    ws = pa & 31
    uses = ((pa >> 5) & 1) != 0
    wneq = ((pa >> 6) & 1) != 0
    we = pb & 31
    pos = ((pb >> 5) & 7) | ((pc & 3) << 3)
    size = (pc >> 2) & 31

    # 1. disease timers (disease.rs:47-71)
    is_e = status == 1
    is_i = status == 2
    e_to_i = is_e & (timer >= e_time)
    i_to_r = is_i & (timer >= i_time)
    status1 = jnp.where(e_to_i, jnp.int32(2), status)
    status1 = jnp.where(i_to_r, jnp.int32(3), status1)
    timer1 = jnp.where(e_to_i | i_to_r, 0, jnp.where(is_e | is_i, timer + 1, timer))

    # 2. movement (citizen.rs:168-216), frozen under lockdown
    at_work1_8, on_bus1_8, arm_bus_out = _movement(
        h24, move, ws, we, uses, at_work8, on_bus8
    )
    at_work1 = at_work1_8 != 0
    on_bus1 = on_bus1_8 != 0

    # 4a. household pressure: infected positioned at home contribute
    inf_active = (status1 == 2) & ~on_bus1
    contrib = jnp.where(inf_active & (~at_work1 | ~wneq), 1, 0)

    rows_ext = contrib.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, contrib.shape, 1)
    acc = contrib
    for d in range(1, K):
        # flat shift by +d: neighbour at household position pos+d
        a = pltpu.roll(contrib, LANES - d, 1)
        fwd = jnp.where(col < LANES - d, a, pltpu.roll(a, rows_ext - 1, 0))
        # flat shift by -d
        c = pltpu.roll(contrib, d, 1)
        bwd = jnp.where(col >= d, c, pltpu.roll(c, 1, 0))
        acc = acc + jnp.where(pos + d < size, fwd, 0)
        acc = acc + jnp.where(pos - d >= 0, bwd, 0)

    # ---- center frame ---------------------------------------------------
    ctr_slice = lambda x: x[HALO : HALO + block_rows]
    status1_c = ctr_slice(status1)
    timer1_c = ctr_slice(timer1)
    at_work1_c = ctr_slice(at_work1)
    on_bus1_c = ctr_slice(on_bus1)
    at_work1_c8 = ctr_slice(at_work1_8)
    on_bus1_c8 = ctr_slice(on_bus1_8)
    inf_c = ctr_slice(inf_active)
    wneq_c = ctr_slice(wneq)
    n_h = ctr_slice(acc)
    arm_bus_out_c = ctr_slice(arm_bus_out)
    sched_c = ctr_slice(sched)
    btw8 = (sched_c >> 2) & 1
    at_work_ws8 = (sched_c >> 3) & 1
    on_bus_ws8 = (sched_c >> 4) & 1
    pd = ctr[0][:].astype(jnp.int32)
    pe = ctr[1][:].astype(jnp.int32)
    ws_ws = pd & 31
    compliant = ((pd >> 5) & 1) != 0
    same_oa = ((pd >> 6) & 1) != 0
    ws_we = pe & 31
    ws_uses = ((pe >> 5) & 1) != 0

    btw1_8 = jnp.where(
        move, jnp.where(arm_bus_out_c, jnp.int32(1), jnp.int32(0)), btw8
    )
    at_work_ws1_8, on_bus_ws1_8, _ = _movement(
        h24, move, ws_ws, ws_we, ws_uses, at_work_ws8, on_bus_ws8
    )

    # 5. exposure chance (disease.rs:131-154; reference mask inversion per
    #    SimConfig.reference_mask_semantics)
    if ref_mask_sem:
        active = (mask_status == 2) & ~compliant
    else:
        active = compliant & (
            (mask_status == 2) | ((mask_status == 1) & on_bus1_c)
        )
    p_cit = p0 * jnp.where(active, mask_scale, jnp.float32(1.0))

    nh_eff = (n_h & 0xFF) if u8_trunc else n_h
    # 1-(1-p)^n via exp/log (Mosaic lacks expm1/log1p).  p ~ 5.5e-4, so
    # log(1-p) in f32 is accurate enough for the distributional contract;
    # p == 1 gives log(0) = -inf -> q = 1 for n >= 1 (the deterministic
    # test regime) and NaN for n == 0, which never hits (u < NaN is false),
    # matching the XLA formulation's expm1(NaN) behaviour.
    q_home = 1.0 - jnp.exp(
        nh_eff.astype(jnp.float32) * jnp.log(1.0 - p_cit)
    )
    q_home = jnp.where(~at_work1_c | same_oa, q_home, 0.0)

    # 6. home draw via counter-hash uniforms, keyed on the GLOBAL citizen id
    #    (flat position + the caller's gid0 offset, ints[6]) — a shard of a
    #    partitioned world (parallel/fastmesh.py) passes its global offset
    #    so sharded and single-device streams are bitwise-identical;
    #    single-device callers pass 0.
    gid0 = ints[6, 0]
    row = jax.lax.broadcasted_iota(jnp.int32, q_home.shape, 0)
    colc = jax.lax.broadcasted_iota(jnp.int32, q_home.shape, 1)
    flat = (b * block_rows + row) * LANES + colc
    u = hash_uniform(seed, (flat + gid0).astype(jnp.uint32))
    susceptible = status1_c == 0
    hit_home = susceptible & (u < q_home)

    # 7. packed cond operand: ONE s8 gates lane feeds both the work and bus
    # conds (bits 0-2 work side, 1/3/4 bus side; susceptible is shared) —
    # one 63M-lane write+read per step instead of two
    contrib_work = inf_c & at_work1_c & wneq_c
    gates = (
        contrib_work.astype(jnp.int32)
        | (susceptible.astype(jnp.int32) << 1)
        | (hit_home.astype(jnp.int32) << 2)
        | (on_bus1_c.astype(jnp.int32) << 3)
        | ((status1_c == 2).astype(jnp.int32) << 4)
    )

    # 3/8. per-block census + gate partials (valid elements only — the final
    # ragged block reads garbage rows past the array edge).  The census is
    # PRE-exposure (simulator.rs:178): it reads status1_c before the home
    # hits are folded in below.
    valid = flat < n_real
    for s in range(5):
        outs[4][b, s] = jnp.sum((valid & (status1_c == s)).astype(jnp.int32))
    outs[4][b, 5] = jnp.sum((valid & contrib_work).astype(jnp.int32))
    # bus gate counts riders who are INFECTED: hours with riders but no
    # infectious rider are exposure no-ops and the cond skips them
    outs[4][b, 6] = jnp.sum(
        (valid & on_bus1_c & (status1_c == 2)).astype(jnp.int32)
    )
    outs[4][b, 7] = jnp.sum((valid & hit_home).astype(jnp.int32))

    # Home hits are applied HERE (citizen.rs:221-248 end state) so the apply
    # stage outside never touches the full lanes for them; work/bus hits —
    # the gated, typically tiny remainder — are set outside (densely, or as
    # K-bounded scatters under SimConfig.use_sparse_apply).  The dense
    # outside re-apply of hit_home (via fwd_packed bit 2) is idempotent, so
    # both apply modes stay bitwise-identical.
    outs[0][:] = jnp.where(hit_home, jnp.int32(1), status1_c).astype(jnp.int8)
    outs[1][:] = jnp.where(hit_home, 0, timer1_c)  # int32 end to end: s16 2D
    # lanes hit a pathological tiled-slice path on this backend (~1.9ms/step
    # measured), and an s16 STATE lane forced two 63M convert passes per
    # step at the 1D boundary (~1.0 ms/step) — so the timer lane is
    # stored TIMER_DTYPE=int32 everywhere (config.py)
    outs[2][:] = (
        at_work1_c8 | (on_bus1_c8 << 1) | (btw1_8 << 2)
        | (at_work_ws1_8 << 3) | (on_bus_ws1_8 << 4)
    ).astype(jnp.int8)
    outs[3][:] = gates.astype(jnp.int8)


def _kernel_entry(K, ref_mask_sem, u8_trunc, n_real, block_rows,
                  blocks_per_rep, *refs):
    n_ext = len(_EXT_LANES)
    n_ctr = len(_CTR_LANES)
    i = 0
    ints = refs[i]; i += 1
    f32s = refs[i]; i += 1
    if blocks_per_rep is not None:
        rep_refs = (refs[i], refs[i + 1]); i += 2
    else:
        rep_refs = None
    ext_c = refs[i : i + n_ext]; i += n_ext
    ext_t = refs[i : i + n_ext]; i += n_ext
    ext_b = refs[i : i + n_ext]; i += n_ext
    ctr = refs[i : i + n_ctr]; i += n_ctr
    outs = refs[i:]
    _kernel(
        K, ref_mask_sem, u8_trunc, n_real, block_rows, blocks_per_rep,
        ((ints, f32s), rep_refs, ext_c, ext_t, ext_b, ctr, outs),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "K", "ref_mask_sem", "u8_trunc", "block_rows", "interpret",
        "n_citizens", "blocks_per_rep",
    ),
)
def citizen_phase(
    statics: CitizenStatics,
    status, timer, sched,
    int_scalars, f32_scalars,
    *, K, ref_mask_sem, u8_trunc, block_rows=512, interpret=False,
    n_citizens=None, rep_ints=None, rep_f32s=None, blocks_per_rep=None,
):
    """Run the fused citizen phase.  Dynamic lanes are (N,) arrays —
    ``sched`` carries the five schedule bools packed s8 (bits 0-4:
    at_work, on_bus, bus_to_work, at_work_ws, on_bus_ws; see
    engine/state.py::pack_sched); scalar vectors are int32 (8,) [h24,
    move, mask_status, seed, exposed_time, infected_time, gid0, 0] and f32
    (2,) [exposure_chance, 1-mask_eff].  ``gid0`` offsets the home-draw
    hash index (global citizen id of lane 0 — nonzero only for shards of a
    partitioned world, parallel/fastmesh.py).

    Returns (status1, timer1, sched1, gates, partials) with lanes (N,) and
    partials (n_blocks, 8) int32:
    [S, E, I, R, V, n_contrib_work, n_infected_on_bus, n_home_hits] per
    block.  ``gates`` packs the work AND bus cond operands into one s8
    lane: contrib_work | susceptible<<1 | hit_home<<2 | on_bus<<3 |
    infected<<4.  The census entries are PRE-exposure (simulator.rs:178);
    the status/timer outputs have this step's home hits already applied
    (hit_home itself is bit 2 of gates).

    status/timer/sched may arrive ALREADY tiled (rows, 128) (the packed-2D
    scan carry, engine/state.py::to_2d_carry) — then they are consumed
    without per-step pad/reshape passes and returned (rows, 128) too;
    ``n_citizens`` must give the true population for the flat outputs.

    Ensemble mode (engine/packed.py): pass ``rep_ints`` (R, 4) int32
    [move, mask_status, exposed_time, infected_time], ``rep_f32s`` (R, 2)
    f32 [exposure_chance, 1-mask_effectiveness] and static
    ``blocks_per_rep``.  Replicas must be
    contiguous equal spans of exactly ``blocks_per_rep * block_rows * 128``
    lanes (pack_replicas pads each replica to the boundary); the kernel
    then reads this block's parameter row from SMEM and int_scalars
    positions 1/2/4/5 and f32_scalars[0] are ignored.
    """
    two_d = getattr(status, "ndim", 1) == 2
    if two_d:
        if n_citizens is None:
            raise ValueError("n_citizens required for 2D-tiled inputs")
        n = n_citizens
        rows = status.shape[0]
    else:
        n = status.shape[0]
        rows = pl.cdiv(n, LANES)
    n_blocks = pl.cdiv(rows, block_rows)
    halo_units = pl.cdiv(rows, HALO)
    units_per_block = block_rows // HALO

    pr = functools.partial(_pad_rows, rows=rows)
    if two_d:
        dyn = (
            status,
            jnp.asarray(timer, jnp.int32),
            jnp.asarray(sched, jnp.int8),
        )
    else:
        dyn = (
            pr(status, fill=5),  # pad status 5: outside every census/mask
            pr(jnp.asarray(timer, jnp.int32)),
            pr(jnp.asarray(sched, jnp.int8)),
        )
    ext_arrays = [
        dyn[0], dyn[1], dyn[2],
        statics.a, statics.b, statics.c,
    ]
    ctr_arrays = [statics.d, statics.e]

    main = pl.BlockSpec(
        (block_rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    halo_top = pl.BlockSpec(
        (HALO, LANES),
        lambda b: (jnp.maximum(b * units_per_block - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    halo_bot = pl.BlockSpec(
        (HALO, LANES),
        lambda b: (
            jnp.minimum(b * units_per_block + units_per_block, halo_units - 1),
            0,
        ),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec((8, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    smem_f = pl.BlockSpec((2, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    part = pl.BlockSpec(
        (n_blocks, 8), lambda b: (0, 0), memory_space=pltpu.SMEM
    )

    lane_shape = (rows, LANES)
    out_shapes = [
        jax.ShapeDtypeStruct(lane_shape, jnp.int8),    # status (home applied)
        jax.ShapeDtypeStruct(lane_shape, jnp.int32),   # timer (home applied)
        jax.ShapeDtypeStruct(lane_shape, jnp.int8),    # sched (packed)
        jax.ShapeDtypeStruct(lane_shape, jnp.int8),    # gates (work+bus)
        jax.ShapeDtypeStruct((n_blocks, 8), jnp.int32),
    ]
    out_specs = [main] * 4 + [part]

    rep_args: tuple = ()
    rep_specs: list = []
    if blocks_per_rep is not None:
        if rep_ints is None or rep_f32s is None:
            raise ValueError("blocks_per_rep requires rep_ints and rep_f32s")
        R_ = rep_ints.shape[0]
        assert n_blocks == R_ * blocks_per_rep, (
            f"grid {n_blocks} != {R_} replicas x {blocks_per_rep} blocks"
        )
        rep_args = (
            jnp.asarray(rep_ints, jnp.int32),
            jnp.asarray(rep_f32s, jnp.float32),
        )
        if rep_f32s.shape[1] != 2:
            raise ValueError(
                "rep_f32s must be (R, 2): [exposure_chance, 1-mask_eff]"
            )
        rep_specs = [
            pl.BlockSpec((R_, 4), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((R_, 2), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ]

    kern = functools.partial(
        _kernel_entry, K, ref_mask_sem, u8_trunc, n, block_rows,
        blocks_per_rep,
    )
    extra = {}
    if not interpret:
        # blocks are independent (halos are input-only overlaps): a
        # parallel grid lets Mosaic pipeline steps instead of serialising
        extra["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        )
    res = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[smem, smem_f] + rep_specs
        + [main] * len(_EXT_LANES)
        + [halo_top] * len(_EXT_LANES)
        + [halo_bot] * len(_EXT_LANES)
        + [main] * len(_CTR_LANES),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        **extra,
    )(
        int_scalars.reshape(8, 1), f32_scalars.reshape(2, 1), *rep_args,
        *ext_arrays, *ext_arrays, *ext_arrays, *ctr_arrays,
    )
    if two_d:
        # status/timer/sched stay tiled for the 2D carry; the per-citizen
        # cond/apply operand flattens to the true population.
        return (
            res[0], res[1].astype(TIMER_DTYPE), res[2],
            res[3].reshape(-1)[:n],
            res[4],
        )
    lanes = [r.reshape(-1)[:n] for r in res[:4]]
    lanes[1] = lanes[1].astype(TIMER_DTYPE)
    return tuple(lanes) + (res[4],)
