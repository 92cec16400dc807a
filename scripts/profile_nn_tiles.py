"""Sweep Pallas NN kernel tile sizes at ICP shapes (1024 x 8192) on TPU.

Parameterized copy of ops/pallas_kernels.py::_nn_kernel so tile candidates
can be compared before changing the shipped kernel. Timing model: two scan
lengths (5, 20) per variant separate program-dispatch cost from marginal
per-pass cost (the tunneled runtime adds ~2.5 ms per dispatch).
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

    from scl_slam_tpu.ops import registration as reg

    def make_nn(tq, tt):
        def kernel(q_ref, t_ref, d_ref, idx_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                d_ref[0, :] = jnp.full((tq,), jnp.inf, jnp.float32)
                idx_ref[0, :] = jnp.zeros((tq,), jnp.int32)

            q = q_ref[:]
            t = t_ref[:]
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

        @jax.jit
        def nn(query, target):
            nq, nt = query.shape[0], target.shape[0]
            tH = jnp.concatenate(
                [target.T, jnp.zeros((1, nt), target.dtype)], axis=0
            )
            qH = jnp.concatenate(
                [query.T, jnp.zeros((1, nq), query.dtype)], axis=0
            )
            d, idx = pl.pallas_call(
                kernel,
                grid=(nq // tq, nt // tt),
                in_specs=[
                    pl.BlockSpec((4, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((4, tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((1, nq), jnp.float32),
                    jax.ShapeDtypeStruct((1, nq), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                ),
            )(qH, tH)
            return d[0], idx[0]

        return nn

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-50, 50, (1024, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(-50, 50, (8192, 3)).astype(np.float32))

    def chain(nn_fn, n_passes):
        @jax.jit
        def run(q0):
            def one(qc, _):
                d2, idx = nn_fn(qc, t)
                qc = qc + 1e-9 * d2[:, None]
                return qc, idx[0]
            qf, idxs = jax.lax.scan(one, q0, None, length=n_passes)
            return qf[0, 0], idxs
        return run

    def marginal(nn_fn):
        t5, t20 = None, None
        for n_passes in (5, 20):
            fn = chain(nn_fn, n_passes)
            out = fn(q)
            jax.block_until_ready(out)
            _ = np.asarray(out[0])
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(q)
            _ = np.asarray(out[0])
            dt = (time.perf_counter() - t0) / 10
            if n_passes == 5:
                t5 = dt
            else:
                t20 = dt
        c = (t20 - t5) / 15
        disp = t5 - 5 * c
        return c, disp

    # correctness reference
    d_ref, i_ref = reg.nearest_neighbors(q, t)
    for tq, tt in ((256, 1024), (256, 2048), (512, 2048), (256, 4096),
                   (512, 4096), (1024, 2048), (256, 8192)):
        nn = make_nn(tq, tt)
        d, i = nn(q, t)
        ok = bool(jnp.all(i == i_ref)) and bool(
            jnp.allclose(d, d_ref, atol=1e-3)
        )
        c, disp = marginal(nn)
        print(f"TQ={tq:5d} TT={tt:5d}: {c * 1e6:8.2f} us/pass  "
              f"(dispatch {disp * 1e3:5.2f} ms)  correct={ok}")

    c, disp = marginal(lambda a, b: reg.nearest_neighbors(a, b))
    print(f"jnp reference      : {c * 1e6:8.2f} us/pass  (dispatch {disp * 1e3:5.2f} ms)")


if __name__ == "__main__":
    main()
