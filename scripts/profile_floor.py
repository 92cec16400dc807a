"""Measure the tunneled runtime's per-program dispatch floor.

Times (pipelined) a trivial jitted program, a small VPU program, and chained
compositions, to separate fixed per-dispatch cost from device compute. If the
floor is ~ms, macro-batch sizing (B) is the lever for everything.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

x = jnp.ones((8, 128), jnp.float32)
y = jnp.ones((1024, 1024), jnp.float32)


@jax.jit
def tiny(a):
    return a + 1.0


@jax.jit
def mm(b):
    return b @ b


def pipelined(fn, arg, chain, reps=3):
    out = fn(arg)
    jax.block_until_ready(out)
    _ = np.asarray(out).ravel()[:1]
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = arg
        for _ in range(chain):
            o = fn(o)
        _ = np.asarray(o).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


for chain in (1, 10, 50):
    t = pipelined(tiny, x, chain)
    print(f"tiny [8,128] +1, chain {chain:3d}: {t*1e3:8.3f} ms/call")
for chain in (1, 10, 50):
    t = pipelined(mm, y, chain)
    print(f"mm [1024^2],   chain {chain:3d}: {t*1e3:8.3f} ms/call")
