"""Pallas TPU kernels for the registration hot path.

``nearest_neighbors_pallas``: streaming 1-NN correspondence search. The jnp
baseline materializes a [Bq, Nt] distance block per query tile; for
scan-to-map registration against large maps (Nt ~ 10^5-10^6, the ikd-tree
regime of the reference's FAST-LIO front end) that block stops fitting in
VMEM and XLA spills it to HBM. This kernel keeps the target in HBM and
streams it through a double-buffered VMEM tile; only the running
(min-distance, argmin) per query stays resident, so HBM traffic is one pass
over the target per query tile.

Layout note: TPU tiling wants the last dim aligned to 128 lanes, so point
clouds are processed **transposed** — coordinates as [3, N] — and the
[TQ, TT] distance tile comes from a [3, TQ]^T x [3, TT] contraction on the
MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 256    # query tile
TT = 512    # target tile per VMEM step
N_BUF = 2   # double buffering


def _nn_kernel(q_ref, t_hbm, tsq_hbm, d_ref, idx_ref, t_buf, tsq_buf, sems):
    """One query tile vs the whole target, streamed HBM -> VMEM.

    q_ref [3, TQ] VMEM; t_hbm [3, Nt] HBM; tsq_hbm [1, Nt] HBM (|t|^2);
    outputs d_ref [1, TQ], idx_ref [1, TQ]; scratch: t_buf [N_BUF, 3, TT],
    tsq_buf [N_BUF, 1, TT], sems [N_BUF, 2].
    """
    q = q_ref[:]                                   # [3, TQ]
    q_sq = jnp.sum(q * q, axis=0)                  # [TQ]
    n_tiles = t_hbm.shape[1] // TT

    def tile_dma(slot, tile):
        return (
            pltpu.make_async_copy(
                t_hbm.at[:, pl.ds(tile * TT, TT)], t_buf.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                tsq_hbm.at[:, pl.ds(tile * TT, TT)], tsq_buf.at[slot], sems.at[slot, 1]
            ),
        )

    for dma in tile_dma(0, 0):
        dma.start()

    def body(i, carry):
        best_d, best_i = carry
        slot = jax.lax.rem(i, N_BUF)
        next_slot = jax.lax.rem(i + 1, N_BUF)

        @pl.when(i + 1 < n_tiles)
        def _():
            for dma in tile_dma(next_slot, i + 1):
                dma.start()

        for dma in tile_dma(slot, i):
            dma.wait()

        t = t_buf[slot]                            # [3, TT]
        t_sq = tsq_buf[slot][0]                    # [TT]
        cross = jax.lax.dot_general(
            q, t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # [TQ, TT]
        d2 = q_sq[:, None] - 2.0 * cross + t_sq[None, :]
        tile_best = jnp.min(d2, axis=1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + i * TT
        take = tile_best < best_d
        return (
            jnp.where(take, tile_best, best_d),
            jnp.where(take, tile_arg, best_i),
        )

    init = (jnp.full((TQ,), jnp.inf, jnp.float32), jnp.zeros((TQ,), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
    d_ref[0, :] = jnp.maximum(best_d, 0.0)
    idx_ref[0, :] = best_i


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbors_pallas(
    query: jax.Array, target: jax.Array, interpret: bool = False
):
    """1-NN of each query point [Nq, 3] in target [Nt, 3].

    Requires Nq % 256 == 0 and Nt % 512 == 0 (the fixed-capacity cloud
    convention guarantees power-of-two capacities). Returns
    (sq_dist [Nq], index [Nq]).
    """
    nq, nt = query.shape[0], target.shape[0]
    assert nq % TQ == 0 and nt % TT == 0, (nq, nt)
    qT = query.T                                   # [3, Nq]
    tT = target.T                                  # [3, Nt]
    t_sq = jnp.sum(target * target, axis=-1)[None, :]  # [1, Nt]

    d, idx = pl.pallas_call(
        _nn_kernel,
        grid=(nq // TQ,),
        in_specs=[
            pl.BlockSpec((3, TQ), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, TQ), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, nq), jnp.float32),
            jax.ShapeDtypeStruct((1, nq), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_BUF, 3, TT), jnp.float32),
            pltpu.VMEM((N_BUF, 1, TT), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF, 2)),
        ],
        interpret=interpret,
    )(qT, tT, t_sq)
    return d[0], idx[0]
