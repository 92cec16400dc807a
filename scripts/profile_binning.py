"""TPU timing of Scan-Context binning variants at bench shapes (64k pts).

Variants of the dense-compare segment-max in ops/pointcloud.py::
scatter_max_image (20x60 bins): dtype narrowing (i16 indices / bf16 values),
block-size sweep, and a one-hot-free two-level form. Host-copy-terminated
timing per CLAUDE.md, dispatch separated via two scan lengths.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    n = 65536
    nb = 1200
    flat = jnp.asarray(rng.randint(0, nb, n).astype(np.int32))
    vals = jnp.asarray(rng.uniform(-2, 4, n).astype(np.float32))

    def dense(block, idx_dtype, val_dtype):
        fi = flat.astype(idx_dtype)
        fv = vals.astype(val_dtype)
        init = jnp.asarray(-1e4, val_dtype)

        def run_once(f, v):
            bins = jnp.arange(nb, dtype=idx_dtype)[:, None]

            def one_block(carry, inp):
                bi, bv = inp
                hit = bins == bi[None, :]
                m = jnp.max(jnp.where(hit, bv[None, :], init), axis=1)
                return jnp.maximum(carry, m), None

            img0 = jnp.full((nb,), init, dtype=val_dtype)
            img, _ = jax.lax.scan(
                one_block, img0, (f.reshape(-1, block), v.reshape(-1, block))
            )
            return img

        return fi, fv, run_once

    def scatter():
        def run_once(f, v):
            img = jnp.full((nb + 1,), -1e4, jnp.float32)
            return img.at[f].max(v)[:-1]
        return flat, vals, run_once

    def chained(maker, n_steps):
        fi, fv, run_once = maker

        @jax.jit
        def run(x):
            def one(c, _):
                img = run_once(fi, fv + jnp.asarray(c, fv.dtype))
                return c + img[0].astype(jnp.float32) * 1e-9, img[0]
            cf, outs = jax.lax.scan(one, x, None, length=n_steps)
            return cf, outs
        return run

    def marginal(maker):
        ts = {}
        for n_steps in (4, 16):
            fn = chained(maker, n_steps)
            out = fn(jnp.float32(0.0))
            jax.block_until_ready(out)
            _ = np.asarray(out[0])
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(jnp.float32(0.0))
            _ = np.asarray(out[0])
            ts[n_steps] = (time.perf_counter() - t0) / 10
        return (ts[16] - ts[4]) / 12

    cases = {
        "dense f32/i32 b2048 (current)": dense(2048, jnp.int32, jnp.float32),
        "dense f32/i32 b4096": dense(4096, jnp.int32, jnp.float32),
        "dense f32/i32 b8192": dense(8192, jnp.int32, jnp.float32),
        "dense bf16/i16 b2048": dense(2048, jnp.int16, jnp.bfloat16),
        "dense bf16/i16 b8192": dense(8192, jnp.int16, jnp.bfloat16),
        "scatter .at[].max": scatter(),
    }
    for name, maker in cases.items():
        c = marginal(maker)
        print(f"{name:>30}: {c * 1e6:9.2f} us/image")


if __name__ == "__main__":
    main()
