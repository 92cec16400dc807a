"""Locate the fused ICP pass's gap to VPU SoL (docs/roofline.md: 11-23%).

Variants at the live shapes (B=32 lanes, 1024 x 8192, tt=8192), each timed
as a chain-subtracted marginal:

1. baseline  — ops/pallas_kernels.py::icp_moments_batched_pallas as shipped
               (min + argmin + iota-compare one-hot + payload dot_general)
2. packed    — selection via ONE packed (quantized-d2 | column) int min:
               no argmin pass, no iota compare; the one-hot is an exact
               equality on the packed value (ties impossible — the column
               bits differ). d2 loses its low 13 mantissa bits (<= 2^-10
               relative), which only matters to near-exact ties and shifts
               fitness by < 0.1%.
3. nn_only   — batched NN (d2 + argmin out, no payload select, no moments):
               the floor of the NN machinery itself.

The spread says which machinery costs what; docs/roofline.md cites the run.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/scl_slam_jax_cache_prof"
    )
    from scl_slam_tpu.ops import pallas_kernels as pk

    B, NQ, NT = 32, 1024, 8192
    TQ, TT = pk.TQ, pk.pick_target_tile(NT)
    rng = np.random.RandomState(0)
    src = rng.randn(B, NQ, 3).astype(np.float32) * 10
    tgt = rng.randn(B, NT, 3).astype(np.float32) * 10
    src4 = jnp.asarray(np.concatenate(
        [src.transpose(0, 2, 1), np.ones((B, 1, NQ), np.float32)], 1))
    pay = jnp.asarray(np.concatenate(
        [tgt.transpose(0, 2, 1), np.ones((B, 1, NT), np.float32)], 1))
    active = jnp.ones((B,), bool)
    print(f"backend: {jax.default_backend()}  B={B} {NQ}x{NT} "
          f"TQ={TQ} TT={TT}", flush=True)

    # ---- variant kernels -------------------------------------------------

    def _packed_kernel(active_ref, q_ref, t_ref, p_ref, m_ref, ps_s,
                       *, tq, tt, maxd2):
        b = pl.program_id(0); i = pl.program_id(1); j = pl.program_id(2)
        nj = pl.num_programs(2)

        @pl.when((i == 0) & (j == 0))
        def _():
            m_ref[0] = jnp.zeros((8, 128), jnp.float32)

        @pl.when(j == 0)
        def _():
            ps_s[0, :] = jnp.full((tq,), jnp.iinfo(jnp.int32).max, jnp.int32)

        @pl.when(active_ref[b] != 0)
        def _():
            q = q_ref[0]
            p = p_ref[0, 0]
            sx = p[0] * q[0] + p[1] * q[1] + p[2] * q[2] + p[9]
            sy = p[3] * q[0] + p[4] * q[1] + p[5] * q[2] + p[10]
            sz = p[6] * q[0] + p[7] * q[1] + p[8] * q[2] + p[11]
            t = t_ref[0]
            d2 = jnp.zeros((tq, tt), jnp.float32)
            for c, qc in enumerate((sx, sy, sz)):
                diff = qc.reshape(tq, 1) - t[c].reshape(1, tt)
                d2 = d2 + diff * diff
            col = jax.lax.broadcasted_iota(jnp.int32, (tq, tt), 1)
            bits = jax.lax.bitcast_convert_type(d2, jnp.int32)  # d2>=0: monotone
            packed = (bits & jnp.int32(~0x1FFF)) | (col + j * tt)
            pmin = jnp.min(packed, axis=1)
            prev = ps_s[0, :]
            ps_s[0, :] = jnp.minimum(pmin, prev)

            @pl.when(j == nj - 1)
            def _():
                best = ps_s[0, :]
                # selection: exact equality on the packed value. tt == nt
                # here (one target tile), so sel covers the whole target.
                one_hot = (packed == best[:, None]).astype(jnp.float32)
                sel = jax.lax.dot_general(
                    t, one_hot, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                d2b = jax.lax.bitcast_convert_type(
                    (best & jnp.int32(~0x1FFF)).reshape(1, tq),
                    jnp.float32).reshape(tq)
                smask = q[3] > 0.5
                good = smask & (sel[3, :] > 0.5) & (d2b < maxd2)
                w = good.astype(jnp.float32)
                dx, dy, dz = sel[0, :], sel[1, :], sel[2, :]
                vals = [
                    jnp.sum(w),
                    jnp.sum(w * sx), jnp.sum(w * sy), jnp.sum(w * sz),
                    jnp.sum(w * dx), jnp.sum(w * dy), jnp.sum(w * dz),
                    jnp.sum(w * sx * dx), jnp.sum(w * sx * dy),
                    jnp.sum(w * sx * dz), jnp.sum(w * sy * dx),
                    jnp.sum(w * sy * dy), jnp.sum(w * sy * dz),
                    jnp.sum(w * sz * dx), jnp.sum(w * sz * dy),
                    jnp.sum(w * sz * dz),
                    jnp.sum(jnp.where(good, d2b, 0.0)),
                    jnp.sum(smask.astype(jnp.float32)),
                ]
                vec = jnp.concatenate(
                    [v.reshape(1) for v in vals]
                    + [jnp.zeros((128 - 18,), jnp.float32)])
                m_ref[0, 0, :] = m_ref[0, 0, :] + vec

    def packed_call(src4, pay, pose8, active):
        return pl.pallas_call(
            functools.partial(_packed_kernel, tq=TQ, tt=TT, maxd2=100.0),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, NQ // TQ, NT // TT),
                in_specs=[
                    pl.BlockSpec((1, 4, TQ), lambda b, i, j, a: (b, 0, i)),
                    pl.BlockSpec((1, 4, TT), lambda b, i, j, a: (b, 0, j)),
                    pl.BlockSpec((1, 8, 128), lambda b, i, j, a: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, 8, 128), lambda b, i, j, a: (b, 0, 0)),
                scratch_shapes=[pltpu.VMEM((1, TQ), jnp.int32)],
            ),
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )(active.astype(jnp.int32), src4, pay, pose8)

    def _nn_only_kernel(active_ref, q_ref, t_ref, p_ref, d_ref, idx_ref,
                        *, tq, tt):
        b = pl.program_id(0); j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            d_ref[0, 0, :] = jnp.full((tq,), jnp.inf, jnp.float32)
            idx_ref[0, 0, :] = jnp.zeros((tq,), jnp.int32)

        @pl.when(active_ref[b] != 0)
        def _():
            q = q_ref[0]
            p = p_ref[0, 0]
            sx = p[0] * q[0] + p[1] * q[1] + p[2] * q[2] + p[9]
            sy = p[3] * q[0] + p[4] * q[1] + p[5] * q[2] + p[10]
            sz = p[6] * q[0] + p[7] * q[1] + p[8] * q[2] + p[11]
            t = t_ref[0]
            d2 = jnp.zeros((tq, tt), jnp.float32)
            for c, qc in enumerate((sx, sy, sz)):
                diff = qc.reshape(tq, 1) - t[c].reshape(1, tt)
                d2 = d2 + diff * diff
            tile_best = jnp.min(d2, axis=1)
            tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
            prev = d_ref[0, 0, :]
            take = tile_best < prev
            d_ref[0, 0, :] = jnp.where(take, tile_best, prev)
            idx_ref[0, 0, :] = jnp.where(
                take, tile_arg + j * tt, idx_ref[0, 0, :])

    def nn_only_call(src4, pay, pose8, active):
        return pl.pallas_call(
            functools.partial(_nn_only_kernel, tq=TQ, tt=TT),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, NQ // TQ, NT // TT),
                in_specs=[
                    pl.BlockSpec((1, 4, TQ), lambda b, i, j, a: (b, 0, i)),
                    pl.BlockSpec((1, 4, TT), lambda b, i, j, a: (b, 0, j)),
                    pl.BlockSpec((1, 8, 128), lambda b, i, j, a: (b, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, TQ), lambda b, i, j, a: (b, 0, i)),
                    pl.BlockSpec((1, 1, TQ), lambda b, i, j, a: (b, 0, i)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, 1, NQ), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, NQ), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )(active.astype(jnp.int32), src4, pay, pose8)

    def _mineq_kernel(active_ref, q_ref, t_ref, p_ref, m_ref,
                      *, tq, tt, maxd2):
        """r5 variant: EXACT selection with NO argmin and NO iota.

        One min reduction per tile; the one-hot is (d2 == best) with a
        count row appended to the payload dot so exact-d2 ties (rare for
        real pairs, universal for pad columns) are resolved by AVERAGING
        the tied rows — identical coordinates for pad ties, same-distance
        points otherwise. Assumes tt == nt (single target tile, true at
        the live 8192 shape)."""
        b = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when((i == 0))
        def _():
            m_ref[0] = jnp.zeros((8, 128), jnp.float32)

        @pl.when(active_ref[b] != 0)
        def _():
            q = q_ref[0]
            p = p_ref[0, 0]
            sx = p[0] * q[0] + p[1] * q[1] + p[2] * q[2] + p[9]
            sy = p[3] * q[0] + p[4] * q[1] + p[5] * q[2] + p[10]
            sz = p[6] * q[0] + p[7] * q[1] + p[8] * q[2] + p[11]
            t = t_ref[0]                                    # [8, tt] padded
            d2 = jnp.zeros((tq, tt), jnp.float32)
            for c, qc in enumerate((sx, sy, sz)):
                diff = qc.reshape(tq, 1) - t[c].reshape(1, tt)
                d2 = d2 + diff * diff
            best = jnp.min(d2, axis=1)
            one_hot = (d2 == best[:, None]).astype(jnp.float32)
            selc = jax.lax.dot_general(
                t, one_hot, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)         # [8, tq]
            cnt = jnp.maximum(selc[4, :], 1.0)              # ones row
            smask = q[3] > 0.5
            good = smask & (selc[3, :] / cnt > 0.5) & (best < maxd2)
            w = good.astype(jnp.float32)
            dx, dy, dz = selc[0, :] / cnt, selc[1, :] / cnt, selc[2, :] / cnt
            d2b = jnp.maximum(best, 0.0)
            vals = [
                jnp.sum(w),
                jnp.sum(w * sx), jnp.sum(w * sy), jnp.sum(w * sz),
                jnp.sum(w * dx), jnp.sum(w * dy), jnp.sum(w * dz),
                jnp.sum(w * sx * dx), jnp.sum(w * sx * dy),
                jnp.sum(w * sx * dz), jnp.sum(w * sy * dx),
                jnp.sum(w * sy * dy), jnp.sum(w * sy * dz),
                jnp.sum(w * sz * dx), jnp.sum(w * sz * dy),
                jnp.sum(w * sz * dz),
                jnp.sum(jnp.where(good, d2b, 0.0)),
                jnp.sum(smask.astype(jnp.float32)),
            ]
            vec = jnp.concatenate(
                [v.reshape(1) for v in vals]
                + [jnp.zeros((128 - 18,), jnp.float32)])
            m_ref[0, 0, :] = m_ref[0, 0, :] + vec

    # payload with a ones row (slot 4) for the tie count; rows padded to 8
    pay8 = jnp.concatenate(
        [pay, jnp.ones((B, 1, NT), jnp.float32),
         jnp.zeros((B, 3, NT), jnp.float32)], axis=1)

    def mineq_call_of(tq):
        def call(src4_, pay_, pose8_, active_):
            return pl.pallas_call(
                functools.partial(_mineq_kernel, tq=tq, tt=NT, maxd2=100.0),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(B, NQ // tq),
                    in_specs=[
                        pl.BlockSpec((1, 4, tq), lambda b, i, a: (b, 0, i)),
                        pl.BlockSpec((1, 8, NT), lambda b, i, a: (b, 0, 0)),
                        pl.BlockSpec((1, 8, 128), lambda b, i, a: (b, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec(
                        (1, 8, 128), lambda b, i, a: (b, 0, 0)),
                ),
                out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )(active_.astype(jnp.int32), src4_, pay8, pose8_)
        return call

    mineq_call = mineq_call_of(TQ)
    mineq256_call = mineq_call_of(256)   # 2x query tile: amortize t loads

    # ---- correctness spot-check vs baseline ------------------------------
    pose8 = jnp.zeros((B, 8, 128), jnp.float32)
    pose8 = pose8.at[:, 0, 0].set(1.0).at[:, 0, 4].set(1.0).at[:, 0, 8].set(1.0)
    base = pk.icp_moments_batched_pallas(
        src4, pay, pose8[:, 0, :], active, 10.0)
    packed = packed_call(src4, pay, pose8, active)[:, 0, :]
    rel = np.abs(np.asarray(packed[:, :18]) - np.asarray(base[:, :18]))
    den = np.maximum(np.abs(np.asarray(base[:, :18])), 1.0)
    print(f"packed vs baseline moments: max rel diff "
          f"{np.max(rel / den):.2e}", flush=True)
    for nm, call in (("mineq", mineq_call), ("mineq256", mineq256_call)):
        mq = call(src4, pay, pose8, active)[:, 0, :]
        rel = np.abs(np.asarray(mq[:, :18]) - np.asarray(base[:, :18]))
        print(f"{nm} vs baseline moments: max rel diff "
              f"{np.max(rel / den):.2e}", flush=True)

    # ---- timing ----------------------------------------------------------
    def chain(call, L):
        @jax.jit
        def run():
            def one(c, _):
                p8 = pose8.at[:, 0, 0].add(c * 1e-9)
                out = call(src4, pay, p8, active)
                first = (out[0] if isinstance(out, (list, tuple))
                         else out)
                lead = first.astype(jnp.float32).ravel()[0]
                return c + lead * 1e-12, lead
            cf, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=L)
            return cf
        return run

    def marginal(call, lens=(4, 16), reps=8):
        ts = {}
        for L in lens:
            fn = chain(call, L)
            out = fn(); jax.block_until_ready(out)
            _ = np.asarray(out)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            _ = np.asarray(out)
            ts[L] = (time.perf_counter() - t0) / reps
        return (ts[lens[1]] - ts[lens[0]]) / (lens[1] - lens[0])

    base_call = lambda s, p, p8, a: pk.icp_moments_batched_pallas(
        s, p, p8[:, 0, :], a, 10.0)
    for name, call in (("baseline ", base_call),
                       ("packed   ", packed_call),
                       ("nn_only  ", nn_only_call),
                       ("mineq    ", mineq_call),
                       ("mineq256 ", mineq256_call)):
        t = marginal(call)
        print(f"{name}: {t*1e3:7.3f} ms/pass "
              f"({t / (B*NQ*NT) * 1e12:5.2f} ps/pair)", flush=True)


if __name__ == "__main__":
    main()
