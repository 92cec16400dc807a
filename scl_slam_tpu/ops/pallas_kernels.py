"""Pallas TPU kernels for the registration hot path.

``nearest_neighbors_pallas``: streaming 1-NN correspondence search. The jnp
baseline materializes a [Bq, Nt] distance block per query tile; for
scan-to-map registration against large maps (Nt ~ 10^5-10^6, the ikd-tree
regime of the reference's FAST-LIO front end) that block stops fitting in
VMEM and XLA spills it to HBM. This kernel keeps the target in HBM and
streams it through a double-buffered VMEM tile; only the running
(min-distance, argmin) per query stays resident, so HBM traffic is one pass
over the target per query tile.

Layout: TPU tiling wants lane dim aligned to 128 and sublane slices aligned
to 4, so clouds are processed transposed and homogenized to **4 rows**:
t' = [x, y, z, |t|^2], q' = [x, y, z, -0.5]. Then

    q' . t' = q.t - 0.5 |t|^2   =>   d^2 = |q|^2 - 2 (q' . t')

which folds the |t|^2 correction into the same MXU contraction — one fused
[4, N] stream, no second DMA.
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


def _nn_kernel(q_ref, t_hbm, d_ref, idx_ref, t_buf, sems):
    """One query tile vs the whole target, streamed HBM -> VMEM.

    q_ref [4, TQ] VMEM (rows x,y,z,-0.5); t_hbm [4, Nt] HBM (rows
    x,y,z,|t|^2); outputs d_ref [1, TQ] f32, idx_ref [1, TQ] i32;
    scratch t_buf [N_BUF, 4, TT], sems [N_BUF].
    """
    q = q_ref[:]                                   # [4, TQ]
    # |q|^2 = sum of squares of xyz rows = sum over all 4 rows minus (-0.5)^2
    q_sq = jnp.sum(q * q, axis=0) - 0.25           # [TQ]
    n_tiles = t_hbm.shape[1] // TT

    def tile_dma(slot, tile):
        return pltpu.make_async_copy(
            t_hbm.at[:, pl.ds(tile * TT, TT)], t_buf.at[slot], sems.at[slot]
        )

    tile_dma(0, 0).start()

    def body(i, carry):
        best_d, best_i = carry
        slot = jax.lax.rem(i, N_BUF)
        next_slot = jax.lax.rem(i + 1, N_BUF)

        @pl.when(i + 1 < n_tiles)
        def _():
            tile_dma(next_slot, i + 1).start()

        tile_dma(slot, i).wait()

        t = t_buf[slot]                            # [4, TT]
        cross = jax.lax.dot_general(
            q, t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # [TQ, TT]
        d2 = q_sq[:, None] - 2.0 * cross
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
    t_sq = jnp.sum(target * target, axis=-1)
    tH = jnp.concatenate([target.T, t_sq[None, :]], axis=0)         # [4, Nt]
    qH = jnp.concatenate(
        [query.T, jnp.full((1, nq), -0.5, query.dtype)], axis=0
    )                                                               # [4, Nq]

    d, idx = pl.pallas_call(
        _nn_kernel,
        grid=(nq // TQ,),
        in_specs=[
            pl.BlockSpec((4, TQ), lambda i: (0, i), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((N_BUF, 4, TT), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
        interpret=interpret,
    )(qH, tH)
    return d[0], idx[0]
