"""Pallas TPU kernels for the registration hot path.

``nearest_neighbors_pallas``: streaming 1-NN correspondence search. The jnp
baseline materializes a [Bq, Nt] distance block per query tile; for
scan-to-map registration against large maps (Nt ~ 10^5-10^6, the ikd-tree
regime of the reference's FAST-LIO front end) that block stops fitting in
VMEM and XLA spills it to HBM. Here the target streams through VMEM tiles
(Pallas pipelines the HBM->VMEM copies across the inner grid dimension) and
only the running (min-distance, argmin) per query stays resident in the
revisited output block.

Layout: TPU tiling wants lane dims aligned to 128 and sublane slices to 4,
so clouds are processed transposed and zero-padded to 4 coordinate rows.
Distances are computed coordinate-wise on the VPU in exact f32 — a K=3
contraction is bandwidth-bound, so the MXU buys nothing, and its default
bf16 passes would randomize argmins at meter scales.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 256    # query tile
TT = 4096   # default target tile per grid step (see pick_target_tile)


def pick_target_tile(nt: int) -> int | None:
    """Largest target tile that divides ``nt``, or None if unsupported.

    Bigger tiles amortize the per-grid-step reduction overhead: measured on
    v5e at 1024x8192, TT=1024 runs ~130 us/pass while TT=4096/8192 run
    ~31-35 us (scripts/profile_nn_tiles.py). Above 8192 the d2 tile
    (TQ x TT f32) starts crowding VMEM.
    """
    for tt in (8192, 4096, 2048, 1024):
        if nt % tt == 0:
            return tt
    return None


def _nn_kernel(q_ref, t_ref, d_ref, idx_ref, *, tq: int, tt: int):
    """Grid (query_tiles, target_tiles); output blocks revisit over dim 1.

    q_ref [4, tq]; t_ref [4, tt]; d_ref [1, tq] f32; idx_ref [1, tq] i32.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        d_ref[0, :] = jnp.full((tq,), jnp.inf, jnp.float32)
        idx_ref[0, :] = jnp.zeros((tq,), jnp.int32)

    q = q_ref[:]
    t = t_ref[:]
    # exact f32 distances on the VPU: K=3 contractions are bandwidth-bound,
    # the MXU buys nothing and its default bf16 passes randomize argmins at
    # meter scales. (q - t)^2 per coordinate is also better-conditioned than
    # the expanded |q|^2 - 2qt + |t|^2 form.
    d2 = jnp.zeros((tq, tt), jnp.float32)
    for c in range(3):
        qc = q[c].reshape(tq, 1)
        tc = t[c].reshape(1, tt)
        diff = qc - tc
        d2 = d2 + diff * diff
    tile_best = jnp.min(d2, axis=1)
    tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + j * tt

    prev_d = d_ref[0, :]
    take = tile_best < prev_d
    d_ref[0, :] = jnp.where(take, jnp.maximum(tile_best, 0.0), prev_d)
    idx_ref[0, :] = jnp.where(take, tile_arg, idx_ref[0, :])


def _nn_select_kernel(q_ref, t_ref, d_ref, sel_ref, *, tq: int, tt: int):
    """1-NN with fused payload selection.

    Grid (query_tiles, target_tiles); outputs revisit over dim 1.
    q_ref [4, tq] (xyz + pad); t_ref [P, tt] — rows 0-2 are target xyz (used
    for the distance), remaining rows arbitrary per-point payload (mask,
    normals, ...). d_ref [1, tq] f32; sel_ref [P, tq] = payload columns of
    each query's running-best match.

    Selection is a one-hot contraction on the MXU: ``one_hot @ payload^T``
    with HIGHEST precision is exact (the one-hot side is exactly 0/1 in
    bf16, so each output is a sum with a single nonzero f32-decomposed
    product). This replaces the post-kernel ``target[idx]`` +
    ``mask[idx]`` HBM gathers, which cost ~17 us per ICP iteration at
    1024x8192 — row gathers from a [Nt, 3] array walk 3->128 lane-padded
    rows.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        d_ref[0, :] = jnp.full((tq,), jnp.inf, jnp.float32)
        sel_ref[:, :] = jnp.zeros_like(sel_ref)

    q = q_ref[:]
    t = t_ref[:]
    d2 = jnp.zeros((tq, tt), jnp.float32)
    for c in range(3):
        qc = q[c].reshape(tq, 1)
        tc = t[c].reshape(1, tt)
        diff = qc - tc
        d2 = d2 + diff * diff
    tile_best = jnp.min(d2, axis=1)
    tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
    one_hot = (
        jax.lax.broadcasted_iota(jnp.int32, (tq, tt), 1)
        == tile_arg[:, None]
    ).astype(jnp.float32)
    # [P, tt] x [tq, tt] -> [P, tq], contracting the target axis
    sel_tile = jax.lax.dot_general(
        t,
        one_hot,
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    prev_d = d_ref[0, :]
    take = tile_best < prev_d
    d_ref[0, :] = jnp.where(take, jnp.maximum(tile_best, 0.0), prev_d)
    sel_ref[:, :] = jnp.where(take[None, :], sel_tile, sel_ref[:, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_select_pallas(
    query: jax.Array, payload: jax.Array, interpret: bool = False
):
    """1-NN of query [Nq, 3] in the cloud held in payload rows 0-2, returning
    each query's best squared distance and the matched point's full payload
    column.

    payload [P, Nt]: rows 0-2 = target xyz, rows 3.. = per-point extras
    (validity mask, normals, ...). P must be a multiple of 4.
    Returns (sq_dist [Nq], selected [P, Nq]).
    """
    nq, nt = query.shape[0], payload.shape[1]
    P = payload.shape[0]
    tt = pick_target_tile(nt)
    assert nq % TQ == 0 and tt is not None and P % 4 == 0, (nq, nt, P)
    qH = jnp.concatenate(
        [query.T, jnp.zeros((1, nq), query.dtype)], axis=0
    )                                                               # [4, Nq]

    d, sel = pl.pallas_call(
        functools.partial(_nn_select_kernel, tq=TQ, tt=tt),
        grid=(nq // TQ, nt // tt),
        in_specs=[
            pl.BlockSpec((4, TQ), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TQ), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, TQ), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, nq), jnp.float32),
            jax.ShapeDtypeStruct((P, nq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qH, payload)
    return d[0], sel


def _nn_select_batched_kernel(
    active_ref, q_ref, t_ref, d_ref, sel_ref, *, tq: int, tt: int
):
    """Batched fused NN+select with per-lane predication.

    Grid (B, query_tiles, target_tiles). ``active_ref`` (SMEM, scalar
    prefetch) holds one int32 per lane; lanes with 0 skip the tile body
    entirely (outputs stay at their init), which is what makes a batched
    ICP with per-lane early exit cost ~only the still-running lanes —
    a plain vmap of the solo kernel pays full compute for frozen lanes.
    """
    b = pl.program_id(0)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        d_ref[0, 0, :] = jnp.full((tq,), jnp.inf, jnp.float32)
        sel_ref[0] = jnp.zeros_like(sel_ref[0])

    @pl.when(active_ref[b] != 0)
    def _():
        q = q_ref[0]
        t = t_ref[0]
        d2 = jnp.zeros((tq, tt), jnp.float32)
        for c in range(3):
            qc = q[c].reshape(tq, 1)
            tc = t[c].reshape(1, tt)
            diff = qc - tc
            d2 = d2 + diff * diff
        tile_best = jnp.min(d2, axis=1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
        one_hot = (
            jax.lax.broadcasted_iota(jnp.int32, (tq, tt), 1)
            == tile_arg[:, None]
        ).astype(jnp.float32)
        sel_tile = jax.lax.dot_general(
            t,
            one_hot,
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                               # [P, tq]
        prev_d = d_ref[0, 0, :]
        take = tile_best < prev_d
        d_ref[0, 0, :] = jnp.where(take, jnp.maximum(tile_best, 0.0), prev_d)
        sel_ref[0] = jnp.where(take[None, :], sel_tile, sel_ref[0])


def _nn_select_batched_mineq_kernel(
    active_ref, q_ref, t_ref, d_ref, sel_ref, *, tq: int, tt: int
):
    """:func:`_nn_select_batched_kernel` with the cheaper r5 selection.

    Selection = EQUALITY one-hot against the tile min (no argmin pass, no
    iota compare), count-normalized so exact-d2 ties average their rows:
    identical coordinates for pad-column ties, same-distance points
    otherwise (validity averages to 1 iff all tied rows are valid — a
    valid/pad tie cannot occur inside the correspondence gate). Measured
    r5 on v5e at 32x1024x8192: 2.10 -> 1.58 ms/pass (1.33x) with
    bit-exact outputs (scripts/profile_icp_kernel_variants.py); +3.3%
    end-to-end on the interleaved in-chunk A/B (1570 vs 1520 frames/s,
    scripts/profile_select_mineq_ab.py — the chunk's ICP share includes
    while-loop glue the kernel win doesn't touch).
    """
    b = pl.program_id(0)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        d_ref[0, 0, :] = jnp.full((tq,), jnp.inf, jnp.float32)
        sel_ref[0] = jnp.zeros_like(sel_ref[0])

    @pl.when(active_ref[b] != 0)
    def _():
        q = q_ref[0]
        t = t_ref[0]
        d2 = jnp.zeros((tq, tt), jnp.float32)
        for c in range(3):
            qc = q[c].reshape(tq, 1)
            tc = t[c].reshape(1, tt)
            diff = qc - tc
            d2 = d2 + diff * diff
        tile_best = jnp.min(d2, axis=1)
        one_hot = (d2 == tile_best[:, None]).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(one_hot, axis=1), 1.0)
        sel_tile = jax.lax.dot_general(
            t,
            one_hot,
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) / cnt[None, :]                                # [P, tq]
        prev_d = d_ref[0, 0, :]
        take = tile_best < prev_d
        d_ref[0, 0, :] = jnp.where(take, jnp.maximum(tile_best, 0.0), prev_d)
        sel_ref[0] = jnp.where(take[None, :], sel_tile, sel_ref[0])


@functools.partial(jax.jit, static_argnames=("variant", "interpret"))
def nn_select_batched_pallas(
    query: jax.Array,
    payload: jax.Array,
    active: jax.Array,
    variant: str = "mineq",
    interpret: bool = False,
):
    """Per-lane-predicated batched 1-NN + payload selection.

    query [B, Nq, 3]; payload [B, P, Nt] (rows 0-2 per lane = target xyz);
    active [B] (int32/bool) — inactive lanes skip all compute and return
    (inf distances, zero payload). Returns (sq_dist [B, Nq], sel [B, P, Nq]).
    ``variant``: "mineq" (default — equality-one-hot selection, no
    argmin/iota; r5 kernel A/B 1.33x bit-exact, in-chunk +3.3%:
    scripts/profile_select_mineq_ab.py) or "argmin" (the r4 baseline).
    """
    Bn, nq = query.shape[0], query.shape[1]
    P, nt = payload.shape[1], payload.shape[2]
    tt = pick_target_tile(nt)
    assert nq % TQ == 0 and tt is not None and P % 4 == 0, (nq, nt, P)
    qH = jnp.concatenate(
        [
            jnp.swapaxes(query, -1, -2),
            jnp.zeros((Bn, 1, nq), query.dtype),
        ],
        axis=1,
    )                                                           # [B, 4, Nq]
    kern = {"argmin": _nn_select_batched_kernel,
            "mineq": _nn_select_batched_mineq_kernel}[variant]

    d, sel = pl.pallas_call(
        functools.partial(kern, tq=TQ, tt=tt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bn, nq // TQ, nt // tt),
            in_specs=[
                pl.BlockSpec((1, 4, TQ), lambda b, i, j, a: (b, 0, i)),
                pl.BlockSpec((1, P, tt), lambda b, i, j, a: (b, 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, TQ), lambda b, i, j, a: (b, 0, i)),
                pl.BlockSpec((1, P, TQ), lambda b, i, j, a: (b, 0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Bn, 1, nq), jnp.float32),
            jax.ShapeDtypeStruct((Bn, P, nq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(active.astype(jnp.int32), qH, payload)
    return d[:, 0], sel


def _nn_index_batched_kernel(
    active_ref, q_ref, t_ref, d_ref, idx_ref, *, tq: int, tt: int
):
    """Batched predicated 1-NN returning the ARGMIN INDEX, no payload select.

    The in-kernel payload selection (iota one-hot + dot_general +
    running-select scratch) costs more than the NN itself: measured
    2.12 ms/pass with select vs 0.97 ms index-only at 32 x 1024 x 8192
    (scripts/profile_icp_kernel_variants.py, v5e 2026-08-20). Callers
    gather the payload rows with ONE `take_along_axis` afterwards —
    identical selection semantics (same argmin), exact payload values
    (a gather, like the one-hot HIGHEST dot, reproduces rows exactly).
    """
    b = pl.program_id(0)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        d_ref[0, 0, :] = jnp.full((tq,), jnp.inf, jnp.float32)
        idx_ref[0, 0, :] = jnp.zeros((tq,), jnp.int32)

    @pl.when(active_ref[b] != 0)
    def _():
        q = q_ref[0]
        t = t_ref[0]
        d2 = jnp.zeros((tq, tt), jnp.float32)
        for c in range(3):
            diff = q[c].reshape(tq, 1) - t[c].reshape(1, tt)
            d2 = d2 + diff * diff
        tile_best = jnp.min(d2, axis=1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
        prev_d = d_ref[0, 0, :]
        take = tile_best < prev_d
        d_ref[0, 0, :] = jnp.where(take, jnp.maximum(tile_best, 0.0), prev_d)
        idx_ref[0, 0, :] = jnp.where(take, tile_arg + j * tt, idx_ref[0, 0, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_index_batched_pallas(
    query: jax.Array,
    payload: jax.Array,
    active: jax.Array,
    interpret: bool = False,
):
    """Per-lane-predicated batched 1-NN, index form (see the kernel note).

    query [B, Nq, 3]; payload [B, P, Nt] (only rows 0-2 are read here —
    the caller gathers whatever payload rows it needs by the returned
    index); active [B]. Returns (sq_dist [B, Nq], index [B, Nq] int32);
    inactive lanes return (inf, 0).
    """
    Bn, nq = query.shape[0], query.shape[1]
    nt = payload.shape[2]
    tt = pick_target_tile(nt)
    assert nq % TQ == 0 and tt is not None, (nq, nt)
    qH = jnp.concatenate(
        [
            jnp.swapaxes(query, -1, -2),
            jnp.zeros((Bn, 1, nq), query.dtype),
        ],
        axis=1,
    )                                                           # [B, 4, Nq]

    d, idx = pl.pallas_call(
        functools.partial(_nn_index_batched_kernel, tq=TQ, tt=tt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bn, nq // TQ, nt // tt),
            in_specs=[
                pl.BlockSpec((1, 4, TQ), lambda b, i, j, a: (b, 0, i)),
                pl.BlockSpec((1, 4, tt), lambda b, i, j, a: (b, 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, TQ), lambda b, i, j, a: (b, 0, i)),
                pl.BlockSpec((1, 1, TQ), lambda b, i, j, a: (b, 0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Bn, 1, nq), jnp.float32),
            jax.ShapeDtypeStruct((Bn, 1, nq), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(active.astype(jnp.int32), qH[:, :4], payload[:, :4])
    return d[:, 0], idx[:, 0]


def _nn_select_batched_mxu_kernel(
    active_ref, q_ref, t_ref, d_ref, sel_ref, *, tq: int, tt: int
):
    """Batched fused NN+select, cross term on the MXU.

    Same contract as :func:`_nn_select_batched_kernel`, different distance
    evaluation: d2 = |q|^2 - 2 q.t + |t|^2 with the q.t term as ONE
    [4, tq] x [4, tt] HIGHEST-precision MXU contraction (q row 3 is zero,
    t row 3 is the mask — their product contributes nothing), cutting the
    VPU work per (query, target) pair from 9 ops (3 x sub/mul/add) to 3
    (scale + 2 adds). The expanded form loses exactness to cancellation —
    absolute d2 error ~ eps * |coords|^2, centimeter-scale at recentred
    submap coordinates — so it is for SELECTION ordering only: callers
    recentre the clouds first and recompute the selected pair's distance
    exactly outside (see registration._matches_batched). The returned d
    is the approximate running best; do not gate on it.
    """
    b = pl.program_id(0)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        d_ref[0, 0, :] = jnp.full((tq,), jnp.inf, jnp.float32)
        sel_ref[0] = jnp.zeros_like(sel_ref[0])

    @pl.when(active_ref[b] != 0)
    def _():
        q = q_ref[0]                                    # [4, tq]
        t = t_ref[0]                                    # [P, tt]
        t4 = t[0:4]
        # cross[tq, tt] = sum_c q[c] * t[c] on the MXU (exact-f32 6-pass)
        cross = jax.lax.dot_general(
            q,
            t4,
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        qq = q[0] * q[0] + q[1] * q[1] + q[2] * q[2]    # [tq]
        tt_sq = t[0] * t[0] + t[1] * t[1] + t[2] * t[2]  # [tt]
        d2 = (qq.reshape(tq, 1) - 2.0 * cross) + tt_sq.reshape(1, tt)
        tile_best = jnp.min(d2, axis=1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
        one_hot = (
            jax.lax.broadcasted_iota(jnp.int32, (tq, tt), 1)
            == tile_arg[:, None]
        ).astype(jnp.float32)
        sel_tile = jax.lax.dot_general(
            t,
            one_hot,
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                               # [P, tq]
        prev_d = d_ref[0, 0, :]
        take = tile_best < prev_d
        d_ref[0, 0, :] = jnp.where(take, jnp.maximum(tile_best, 0.0), prev_d)
        sel_ref[0] = jnp.where(take[None, :], sel_tile, sel_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_select_batched_mxu_pallas(
    query: jax.Array,
    payload: jax.Array,
    active: jax.Array,
    interpret: bool = False,
):
    """MXU-form variant of :func:`nn_select_batched_pallas`.

    Same shapes/contract, but distances use the expanded |q|^2-2qt+|t|^2
    form with the cross term on the MXU — SELECTION-ORDERING quality only
    (absolute d2 error ~ eps * |coords|^2; recentre first and recompute
    the winner's distance exactly outside). Returns (approx sq_dist
    [B, Nq], sel [B, P, Nq]).
    """
    Bn, nq = query.shape[0], query.shape[1]
    P, nt = payload.shape[1], payload.shape[2]
    tt = pick_target_tile(nt)
    assert nq % TQ == 0 and tt is not None and P % 4 == 0, (nq, nt, P)
    qH = jnp.concatenate(
        [
            jnp.swapaxes(query, -1, -2),
            jnp.zeros((Bn, 1, nq), query.dtype),
        ],
        axis=1,
    )                                                           # [B, 4, Nq]

    d, sel = pl.pallas_call(
        functools.partial(_nn_select_batched_mxu_kernel, tq=TQ, tt=tt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bn, nq // TQ, nt // tt),
            in_specs=[
                pl.BlockSpec((1, 4, TQ), lambda b, i, j, a: (b, 0, i)),
                pl.BlockSpec((1, P, tt), lambda b, i, j, a: (b, 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, TQ), lambda b, i, j, a: (b, 0, i)),
                pl.BlockSpec((1, P, TQ), lambda b, i, j, a: (b, 0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Bn, 1, nq), jnp.float32),
            jax.ShapeDtypeStruct((Bn, P, nq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(active.astype(jnp.int32), qH, payload)
    return d[:, 0], sel


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbors_pallas(
    query: jax.Array, target: jax.Array, interpret: bool = False
):
    """1-NN of each query point [Nq, 3] in target [Nt, 3].

    Requires Nq % 256 == 0 and Nt divisible by a supported target tile
    (pick_target_tile; the fixed-capacity cloud convention guarantees
    power-of-two capacities). Returns (sq_dist [Nq], index [Nq]).
    """
    nq, nt = query.shape[0], target.shape[0]
    tt = pick_target_tile(nt)
    assert nq % TQ == 0 and tt is not None, (nq, nt)
    tH = jnp.concatenate(
        [target.T, jnp.zeros((1, nt), target.dtype)], axis=0
    )                                                               # [4, Nt]
    qH = jnp.concatenate(
        [query.T, jnp.zeros((1, nq), query.dtype)], axis=0
    )                                                               # [4, Nq]

    d, idx = pl.pallas_call(
        functools.partial(_nn_kernel, tq=TQ, tt=tt),
        grid=(nq // TQ, nt // tt),
        in_specs=[
            pl.BlockSpec((4, TQ), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TQ), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, nq), jnp.float32),
            jax.ShapeDtypeStruct((1, nq), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qH, tH)
    return d[0], idx[0]


# ---------------------------------------------------------------------------
# Fused ICP iteration: NN + weighted Kabsch moments in ONE pass
# ---------------------------------------------------------------------------

# moments vector layout (slots of the [B, 128] output)
M_W = 0          # sum w                      (w = correspondence accepted)
M_S = 1          # 1:4   sum w * s            (s = pose-transformed source)
M_D = 4          # 4:7   sum w * d            (d = matched target point)
M_CROSS = 7      # 7:16  sum w * s_a * d_b    (row-major 3x3)
M_WD2 = 16       # sum w * d2                 (fitness numerator)
M_NSRC = 17      # count of valid source points (inlier_frac denominator)
M_SLOTS = 18


def _icp_moments_kernel(
    active_ref, q_ref, t_ref, p_ref, m_ref, d_s, sel_s,
    *, tq: int, tt: int, maxd2: float,
):
    """Grid (B, query_tiles, target_tiles), j fastest.

    q_ref [1, 4, tq]: source LOCAL xyz rows + validity row.
    t_ref [1, 4, tt]: target xyz rows + validity row (PAD_VALUE outside).
    p_ref [1, 8, 128]: lane pose in row 0 (R row-major in 0:9, t in 9:12;
                      rows 1-7 are sublane padding — TPU lowering needs the
                      trailing block dims divisible by (8, 128)).
    m_ref [1, 8, 128]: accumulated moments in row 0 (layout above),
                      revisited over (i, j) — reset at the first tile,
                      accumulated at each query tile's LAST target tile.
    d_s [1, tq], sel_s [4, tq]: running best (d2, matched payload) scratch,
    reset per query tile.

    Fuses the whole ICP iteration body: per-lane pose transform, streaming
    1-NN with payload selection, correspondence gating, and the weighted
    Kabsch moment reductions — so one iteration leaves the kernel as 18
    scalars per lane instead of a [B, 4, N] selection plus a dozen glue
    ops (the measured 59 ms ICP share of a replay chunk was dominated by
    exactly that glue + materialization).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when((i == 0) & (j == 0))
    def _():
        m_ref[0] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(j == 0)
    def _():
        d_s[0, :] = jnp.full((tq,), jnp.inf, jnp.float32)
        sel_s[:, :] = jnp.zeros_like(sel_s)

    @pl.when(active_ref[b] != 0)
    def _():
        q = q_ref[0]                                   # [4, tq] local
        p = p_ref[0, 0]                                # [128]
        # per-lane rigid transform on the VPU (exact f32 direct form)
        sx = p[0] * q[0] + p[1] * q[1] + p[2] * q[2] + p[9]
        sy = p[3] * q[0] + p[4] * q[1] + p[5] * q[2] + p[10]
        sz = p[6] * q[0] + p[7] * q[1] + p[8] * q[2] + p[11]

        t = t_ref[0]                                   # [4, tt]
        d2 = jnp.zeros((tq, tt), jnp.float32)
        for c, qc in enumerate((sx, sy, sz)):
            diff = qc.reshape(tq, 1) - t[c].reshape(1, tt)
            d2 = d2 + diff * diff
        tile_best = jnp.min(d2, axis=1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
        one_hot = (
            jax.lax.broadcasted_iota(jnp.int32, (tq, tt), 1)
            == tile_arg[:, None]
        ).astype(jnp.float32)
        sel_tile = jax.lax.dot_general(
            t,
            one_hot,
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                               # [4, tq]
        prev_d = d_s[0, :]
        take = tile_best < prev_d
        d_s[0, :] = jnp.where(take, jnp.maximum(tile_best, 0.0), prev_d)
        sel_s[:, :] = jnp.where(take[None, :], sel_tile, sel_s[:, :])

        @pl.when(j == nj - 1)
        def _():
            d2b = d_s[0, :]
            smask = q[3] > 0.5
            good = smask & (sel_s[3, :] > 0.5) & (d2b < maxd2)
            w = good.astype(jnp.float32)
            dx, dy, dz = sel_s[0, :], sel_s[1, :], sel_s[2, :]
            vals = [
                jnp.sum(w),
                jnp.sum(w * sx), jnp.sum(w * sy), jnp.sum(w * sz),
                jnp.sum(w * dx), jnp.sum(w * dy), jnp.sum(w * dz),
                jnp.sum(w * sx * dx), jnp.sum(w * sx * dy), jnp.sum(w * sx * dz),
                jnp.sum(w * sy * dx), jnp.sum(w * sy * dy), jnp.sum(w * sy * dz),
                jnp.sum(w * sz * dx), jnp.sum(w * sz * dy), jnp.sum(w * sz * dz),
                jnp.sum(jnp.where(good, d2b, 0.0)),
                jnp.sum(smask.astype(jnp.float32)),
            ]
            vec = jnp.concatenate(
                [v.reshape(1) for v in vals]
                + [jnp.zeros((128 - M_SLOTS,), jnp.float32)]
            )
            m_ref[0, 0, :] = m_ref[0, 0, :] + vec


def _icp_moments_mineq_kernel(
    active_ref, q_ref, t_ref, p_ref, m_ref, d_s, sel_s,
    *, tq: int, tt: int, maxd2: float,
):
    """Same contract as :func:`_icp_moments_kernel`, cheaper selection.

    The baseline pays min + argmin + iota-compare + one-hot convert per
    tile to select the winner's payload. Here selection is a pure
    EQUALITY one-hot against the tile min — no argmin pass, no iota —
    with a count reduction so exact-d2 ties average their (identical or
    equidistant) rows instead of double-counting; pad-column ties zero
    out through the validity row. Measured r5 on v5e at 32x1024x8192:
    2.10 -> 1.58 ms/pass with BIT-EXACT moments vs the baseline kernel
    (scripts/profile_icp_kernel_variants.py); the select-kernel twin of
    this selection won +3.3% end-to-end in the interleaved in-chunk A/B
    (scripts/profile_select_mineq_ab.py).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when((i == 0) & (j == 0))
    def _():
        m_ref[0] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(j == 0)
    def _():
        d_s[0, :] = jnp.full((tq,), jnp.inf, jnp.float32)
        sel_s[:, :] = jnp.zeros_like(sel_s)

    @pl.when(active_ref[b] != 0)
    def _():
        q = q_ref[0]                                   # [4, tq] local
        p = p_ref[0, 0]                                # [128]
        sx = p[0] * q[0] + p[1] * q[1] + p[2] * q[2] + p[9]
        sy = p[3] * q[0] + p[4] * q[1] + p[5] * q[2] + p[10]
        sz = p[6] * q[0] + p[7] * q[1] + p[8] * q[2] + p[11]

        t = t_ref[0]                                   # [4, tt]
        d2 = jnp.zeros((tq, tt), jnp.float32)
        for c, qc in enumerate((sx, sy, sz)):
            diff = qc.reshape(tq, 1) - t[c].reshape(1, tt)
            d2 = d2 + diff * diff
        tile_best = jnp.min(d2, axis=1)
        one_hot = (d2 == tile_best[:, None]).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(one_hot, axis=1), 1.0)
        sel_tile = jax.lax.dot_general(
            t,
            one_hot,
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) / cnt[None, :]                                # [4, tq]
        prev_d = d_s[0, :]
        take = tile_best < prev_d
        d_s[0, :] = jnp.where(take, jnp.maximum(tile_best, 0.0), prev_d)
        sel_s[:, :] = jnp.where(take[None, :], sel_tile, sel_s[:, :])

        @pl.when(j == nj - 1)
        def _():
            d2b = d_s[0, :]
            smask = q[3] > 0.5
            good = smask & (sel_s[3, :] > 0.5) & (d2b < maxd2)
            w = good.astype(jnp.float32)
            dx, dy, dz = sel_s[0, :], sel_s[1, :], sel_s[2, :]
            vals = [
                jnp.sum(w),
                jnp.sum(w * sx), jnp.sum(w * sy), jnp.sum(w * sz),
                jnp.sum(w * dx), jnp.sum(w * dy), jnp.sum(w * dz),
                jnp.sum(w * sx * dx), jnp.sum(w * sx * dy), jnp.sum(w * sx * dz),
                jnp.sum(w * sy * dx), jnp.sum(w * sy * dy), jnp.sum(w * sy * dz),
                jnp.sum(w * sz * dx), jnp.sum(w * sz * dy), jnp.sum(w * sz * dz),
                jnp.sum(jnp.where(good, d2b, 0.0)),
                jnp.sum(smask.astype(jnp.float32)),
            ]
            vec = jnp.concatenate(
                [v.reshape(1) for v in vals]
                + [jnp.zeros((128 - M_SLOTS,), jnp.float32)]
            )
            m_ref[0, 0, :] = m_ref[0, 0, :] + vec


@functools.partial(
    jax.jit, static_argnames=("max_corr_dist", "variant", "interpret")
)
def icp_moments_batched_pallas(
    src4: jax.Array,        # [B, 4, Nq] local xyz rows + validity row
    payload: jax.Array,     # [B, 4, Nt] target xyz rows + validity row
    pose_rows: jax.Array,   # [B, 128] R row-major 0:9, t 9:12
    active: jax.Array,      # [B]
    max_corr_dist: float,
    variant: str = "mineq",
    interpret: bool = False,
) -> jax.Array:
    """One fused ICP iteration pass. Returns [B, 128] moment vectors
    (layout: module constants M_*). Inactive lanes return zeros.

    ``variant``: ``"mineq"`` (default — equality-one-hot selection, no
    argmin/iota passes; r5 A/B: 1.33x the baseline kernel with bit-exact
    moments, +3.3% end-to-end) or ``"argmin"`` (the r4 baseline,
    kept as the A/B reference)."""
    Bn, _, nq = src4.shape
    nt = payload.shape[2]
    tt = pick_target_tile(nt)
    assert nq % TQ == 0 and tt is not None, (nq, nt)
    pose8 = jnp.zeros((Bn, 8, 128), jnp.float32).at[:, 0, :].set(pose_rows)
    kern = {"argmin": _icp_moments_kernel,
            "mineq": _icp_moments_mineq_kernel}[variant]

    m = pl.pallas_call(
        functools.partial(
            kern, tq=TQ, tt=tt,
            maxd2=float(max_corr_dist) ** 2,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bn, nq // TQ, nt // tt),
            in_specs=[
                pl.BlockSpec((1, 4, TQ), lambda b, i, j, a: (b, 0, i)),
                pl.BlockSpec((1, 4, tt), lambda b, i, j, a: (b, 0, j)),
                pl.BlockSpec((1, 8, 128), lambda b, i, j, a: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, 128), lambda b, i, j, a: (b, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((1, TQ), jnp.float32),
                pltpu.VMEM((4, TQ), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Bn, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(active.astype(jnp.int32), src4, payload, pose8)
    return m[:, 0, :]


def icp_moments_reference(src4, payload, pose_rows, active, max_corr_dist):
    """jnp reference of :func:`icp_moments_batched_pallas` (CPU fallback +
    equivalence oracle). Same shapes and moment layout."""
    R = pose_rows[:, 0:9].reshape(-1, 3, 3)
    t = pose_rows[:, 9:12]
    src = jnp.swapaxes(src4[:, 0:3, :], -1, -2)        # [B, Nq, 3]
    smask = src4[:, 3, :] > 0.5
    moved = jnp.einsum("bij,bnj->bni", R, src) + t[:, None, :]
    tgt = jnp.swapaxes(payload[:, 0:3, :], -1, -2)     # [B, Nt, 3]
    diff = moved[:, :, None, :] - tgt[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)                 # [B, Nq, Nt]
    idx = jnp.argmin(d2, axis=-1)
    best = jnp.take_along_axis(d2, idx[..., None], axis=-1)[..., 0]
    dsel = jnp.take_along_axis(tgt, idx[..., None], axis=1)
    vsel = jnp.take_along_axis(payload[:, 3, :], idx, axis=1)
    good = smask & (vsel > 0.5) & (best < max_corr_dist**2)
    good = good & active[:, None]
    w = good.astype(jnp.float32)
    m = jnp.zeros((src4.shape[0], 128), jnp.float32)
    m = m.at[:, M_W].set(jnp.sum(w, -1))
    m = m.at[:, M_S : M_S + 3].set(jnp.einsum("bn,bnc->bc", w, moved))
    m = m.at[:, M_D : M_D + 3].set(jnp.einsum("bn,bnc->bc", w, dsel))
    m = m.at[:, M_CROSS : M_CROSS + 9].set(
        jnp.einsum("kn,knx,kny->kxy", w, moved, dsel).reshape(-1, 9)
    )
    m = m.at[:, M_WD2].set(jnp.sum(jnp.where(good, best, 0.0), -1))
    m = m.at[:, M_NSRC].set(
        jnp.sum((smask & active[:, None]).astype(jnp.float32), -1)
    )
    return m


# ---------------------------------------------------------------------------
# Fused RANSAC hypothesis scoring (inlier counts, no [B, H, N] transients)
# ---------------------------------------------------------------------------


def _ransac_counts_kernel(q_ref, m_ref, h_ref, out_ref, *, hb, thr2):
    """Grid (B, H // hb). Per step: ``hb`` hypotheses' inlier counts over
    the whole correspondence set of one lane.

    q_ref [1, 4, N]: source xyz rows + combined-validity row (``good``).
    m_ref [1, 4, N]: matched-target xyz rows (+ padding row).
    h_ref [1, hb, 128]: hypothesis pose rows (R row-major 0:9, t 9:12).
    out_ref [1, hb, 128]: counts in lane 0 of each row.

    The XLA scoring slab materializes [B, hyp_chunk, N] transforms and
    residuals in HBM (measured HBM-bound at ~6.3 us/hypothesis,
    scripts/profile_ransac_roofline.py); here each hypothesis is a
    register-resident vector pass over the lane's [4, N] tiles — the
    same structure as the ICP moments kernel's pose transform.
    """
    q = q_ref[0]                                    # [4, N]
    mt = m_ref[0]                                   # [4, N]
    valid = q[3] > 0.5
    counts = []
    for h in range(hb):
        p = h_ref[0, h]
        mx = p[0] * q[0] + p[1] * q[1] + p[2] * q[2] + p[9]
        my = p[3] * q[0] + p[4] * q[1] + p[5] * q[2] + p[10]
        mz = p[6] * q[0] + p[7] * q[1] + p[8] * q[2] + p[11]
        dx = mx - mt[0]
        dy = my - mt[1]
        dz = mz - mt[2]
        res2 = dx * dx + dy * dy + dz * dz
        counts.append(
            jnp.sum(jnp.where(valid & (res2 < thr2), 1.0, 0.0))
        )
    vec = jnp.stack(counts)                          # [hb]
    lane0 = (
        jax.lax.broadcasted_iota(jnp.int32, (hb, 128), 1) == 0
    ).astype(jnp.float32)
    out_ref[0] = vec[:, None] * lane0


@functools.partial(jax.jit, static_argnames=("thr2", "interpret"))
def ransac_counts_batched_pallas(
    src4: jax.Array,       # [B, 4, N] source xyz rows + good row
    matched4: jax.Array,   # [B, 4, N] matched xyz rows (+ padding row)
    hyp_rows: jax.Array,   # [B, H, 128] pose rows (R 0:9, t 9:12)
    thr2: float,
    interpret: bool = False,
) -> jax.Array:
    """Inlier counts [B, H] (int32) for every hypothesis."""
    Bn, _, n = src4.shape
    H = hyp_rows.shape[1]
    hb = 8
    assert H % hb == 0 and n % 128 == 0, (H, n)
    out = pl.pallas_call(
        functools.partial(_ransac_counts_kernel, hb=hb, thr2=float(thr2)),
        grid=(Bn, H // hb),
        in_specs=[
            pl.BlockSpec((1, 4, n), lambda b, h: (b, 0, 0)),
            pl.BlockSpec((1, 4, n), lambda b, h: (b, 0, 0)),
            pl.BlockSpec((1, hb, 128), lambda b, h: (b, h, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, 128), lambda b, h: (b, h, 0)),
        out_shape=jax.ShapeDtypeStruct((Bn, H, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(src4, matched4, hyp_rows)
    return out[:, :, 0].astype(jnp.int32)


# ---------------------------------------------------------------------------
# Fused separable max-binning (Scan Context image construction)
# ---------------------------------------------------------------------------

# Multi-pass quantized max: per pass each point's value is quantized to
# MB_K levels of its bin's current refinement window and encoded as the
# exact power of two 2^(MB_KBITS * level). The per-bin reduction is then a
# SUM, which separates over the (ring, sector) key into one MXU matmul per
# point block: (ring_onehot * v) @ sector_onehot. Because every encoded
# value is a power of two spaced MB_KBITS apart and a bin rarely exceeds
# 2^MB_KBITS points, the top occupied level is read back exactly as
# floor(log2(sum) / MB_KBITS); the window then refines by 1/MB_K per pass.
# Four passes over a 64 m span land within ~10 mm of the true maximum —
# far below any descriptor-distance relevance.
#
# Status: NOT wired into scan_context — measured SLOWER than the
# dense-compare binning (ops.pointcloud.scatter_max_image) at Scan
# Context shapes even after restructuring (scripts/profile_maxbin.py,
# real v5e): 8.1-9.0 ms vs 5.8-6.5 ms per 16 vmapped frames at 64k pts /
# 20x60 bins. A first version ran the (pass, block) loops as a 512-step
# sequential grid and lost on the ~12 us/grid-step floor (6.1 vs
# 4.4 ms); this version is one grid step per frame — passes unrolled,
# blocks via fori_loop, whole frame resident in VMEM (~2 MB << 16 MB),
# the per-point window-base gather as 2 MXU passes (exact bf16 hi/lo
# split of the base image) instead of 6 (precision=HIGHEST) — and still
# loses: at R*S=1200 the dense compare's big fused VPU ops are within
# ~2x of speed of light and the MXU one-hot contractions (T x R' and
# T x S' one-hot builds + [R',T]x[T,S'] matmuls, 4 passes) cost more
# than they save. Kept because the cost model scales with (R + S +
# passes) instead of R*S: at LiDAR-Iris bin counts (80x360 = 28800
# bins, 24x more VPU work for the dense form) this becomes the right
# tool; it needs MB_RPAD/MB_SPAD widening + sector tiling first.
MB_T = 8192      # points per block (large: per-grid-step overhead dominates
                 # small blocks — same lesson as pick_target_tile above)
MB_K = 9         # levels per pass
MB_KBITS = 13    # exponent spacing: 8*13+13 = 117 < 126 stays in f32 range;
                 # the level readout floor((log2(sum)+1e-3)/13) is exact
                 # while log2(count/level) + 1e-3 < 13 (conservatively:
                 # < 2^12 points per level); beyond that it carries and
                 # overshoots ~one slot/pass (graceful)
MB_PASSES = 4    # final slot = span / 9^4 (~10 mm at span 64)
MB_RPAD = 32     # rings padded to sublane multiple (num_rings <= 32)
MB_SPAD = 128    # sectors padded to lane width (num_sectors <= 128)


def _max_image_kernel(pts_ref, out_ref, *, span: float, nb: int):
    """One grid step per frame. pts_ref [nb, 4, MB_T] blocks of (value,
    ring, sector, valid) rows; out_ref [MB_RPAD, MB_SPAD]."""
    base = jnp.zeros((MB_RPAD, MB_SPAD), jnp.float32)
    occ = jnp.zeros((MB_RPAD, MB_SPAD), jnp.float32)

    for p in range(MB_PASSES):  # unrolled: base/occ carried as values
        w = jnp.float32(span / MB_K ** (p + 1))
        # the per-point window-base gather contracts base against the
        # one-hots on the MXU; each output sums exactly ONE nonzero term,
        # so all it needs is the VALUE to survive the bf16 operand cast.
        # Split base into hi (bf16-representable: cast is lossless) + lo
        # (|lo| < 2^-8 |base|, its own bf16 rounding error < ~2e-4 at
        # span 64 — far below the final slot): 2 MXU passes, not 6.
        hi = jax.lax.convert_element_type(
            jax.lax.convert_element_type(base, jnp.bfloat16), jnp.float32
        )
        lo = base - hi

        def body(j, s_acc, hi=hi, lo=lo, w=w):
            blk = pts_ref[j]                            # [4, MB_T]
            val = blk[0:1, :]                           # [1, T]
            rg = blk[1:2, :]
            sc = blk[2:3, :]
            vd = blk[3:4, :]

            ring1 = (
                jax.lax.broadcasted_iota(jnp.int32, (MB_RPAD, MB_T), 0)
                == rg.astype(jnp.int32)
            ).astype(jnp.float32)                       # [R', T]
            sec1 = (
                jax.lax.broadcasted_iota(jnp.int32, (MB_T, MB_SPAD), 1)
                == sc.astype(jnp.int32).reshape(MB_T, 1)
            ).astype(jnp.float32)                       # [T, S']

            m1 = jax.lax.dot_general(
                hi, sec1, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                lo, sec1, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )                                           # [R', T]
            b_pt = jnp.sum(ring1 * m1, axis=0, keepdims=True)  # [1, T]

            q = jnp.clip(jnp.floor((val - b_pt) / w), 0.0, float(MB_K - 1))
            v = jnp.exp2(jnp.float32(MB_KBITS) * q)     # exact powers of 2
            a = ring1 * jnp.where(vd > 0.5, v, 0.0)     # [R', T]

            # powers of two and 0/1 one-hots are exact in bf16: 1 MXU pass
            s_blk = jax.lax.dot_general(
                a, sec1, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )                                           # [R', S']
            return s_acc + s_blk

        sm = jax.lax.fori_loop(
            0, nb, body, jnp.zeros((MB_RPAD, MB_SPAD), jnp.float32)
        )
        hit = sm > 0.0
        if p == 0:
            occ = hit.astype(jnp.float32)
        lvl = jnp.where(
            hit,
            jnp.floor(
                (jnp.log2(jnp.maximum(sm, 1e-30)) + 1e-3)
                / jnp.float32(MB_KBITS)
            ),
            0.0,
        )
        base = base + lvl * w

    out_ref[:, :] = jnp.where(occ > 0.5, base, 0.0)


@functools.partial(
    jax.jit, static_argnames=("num_rings", "num_sectors", "span", "interpret")
)
def max_image_pallas(
    values: jax.Array,
    ring: jax.Array,
    sector: jax.Array,
    valid: jax.Array,
    num_rings: int,
    num_sectors: int,
    span: float = 64.0,
    interpret: bool = False,
) -> jax.Array:
    """Bin-wise max image [num_rings, num_sectors] from per-point values.

    Quantized to span / MB_K^MB_PASSES (~10 mm at span 64) BELOW the true
    maximum; empty bins (and bins whose points are all negative) read 0,
    matching ops.pointcloud.scatter_max_image(init=0.0). Values above
    ``span`` clamp to the top slot. Requires n % MB_T == 0,
    num_rings <= MB_RPAD, num_sectors <= MB_SPAD.
    """
    n = values.shape[0]
    assert n % MB_T == 0 and num_rings <= MB_RPAD and num_sectors <= MB_SPAD
    nb = n // MB_T
    pts = jnp.stack(
        [
            values.astype(jnp.float32),
            ring.astype(jnp.float32),
            sector.astype(jnp.float32),
            valid.astype(jnp.float32),
        ],
        axis=0,
    ).reshape(4, nb, MB_T).transpose(1, 0, 2)           # [nb, 4, MB_T]
    img = pl.pallas_call(
        functools.partial(_max_image_kernel, span=span, nb=nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((MB_RPAD, MB_SPAD), jnp.float32),
        interpret=interpret,
    )(pts)
    return img[:num_rings, :num_sectors]
