"""TPU timing of nearest_neighbors block sizes at ICP shapes (1024 x 8192).

Each variant runs 20 back-to-back NN passes inside one jitted scan (matching
an ICP inner loop's sequential structure). Host-copy-terminated timing per
CLAUDE.md.
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

    from scl_slam_tpu.ops import registration as reg

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-50, 50, (1024, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(-50, 50, (8192, 3)).astype(np.float32))

    def make(block):
        @jax.jit
        def run(q0):
            def one(qc, _):
                d2, idx = reg.nearest_neighbors(qc, t, block=block)
                # feed the result back so iterations can't be parallelized,
                # like a real ICP loop
                qc = qc + 1e-9 * d2[:, None]
                return qc, idx[0]
            qf, idxs = jax.lax.scan(one, q0, None, length=20)
            return qf[0, 0], idxs
        return run

    from scl_slam_tpu.ops import pallas_kernels as pk

    def make_pallas():
        @jax.jit
        def run(q0):
            def one(qc, _):
                d2, idx = pk.nearest_neighbors_pallas(qc, t)
                qc = qc + 1e-9 * d2[:, None]
                return qc, idx[0]
            qf, idxs = jax.lax.scan(one, q0, None, length=20)
            return qf[0, 0], idxs
        return run

    variants = {f"jnp block={b}": make(b) for b in (256, 1024)}
    variants["pallas"] = make_pallas()

    # scaling probes: vary target size to split fixed latency from compute
    def make_sized(nt):
        tt = t[:nt]

        @jax.jit
        def run(q0):
            def one(qc, _):
                d2, idx = reg.nearest_neighbors(qc, tt)
                qc = qc + 1e-9 * d2[:, None]
                return qc, idx[0]
            qf, idxs = jax.lax.scan(one, q0, None, length=20)
            return qf[0, 0], idxs
        return run

    for nt in (1024, 2048, 4096):
        variants[f"jnp nt={nt}"] = make_sized(nt)

    # and a 5-pass version at full size: is cost per pass constant?
    def make_short():
        @jax.jit
        def run(q0):
            def one(qc, _):
                d2, idx = reg.nearest_neighbors(qc, t)
                qc = qc + 1e-9 * d2[:, None]
                return qc, idx[0]
            qf, idxs = jax.lax.scan(one, q0, None, length=5)
            return qf[0, 0], idxs
        return run

    variants["jnp 5-pass (/5)"] = ("short", make_short())
    for name, fn in variants.items():
        passes = 20
        if isinstance(fn, tuple):
            fn, passes = fn[1], 5
        out = fn(q)
        jax.block_until_ready(out)
        _ = np.asarray(out[0])
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(q)
        _ = np.asarray(out[0])
        dt = (time.perf_counter() - t0) / 10 / passes
        print(f"{name:>16}: {dt * 1e6:8.2f} us/NN-pass")


if __name__ == "__main__":
    main()
