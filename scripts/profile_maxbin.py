"""Within-process A/B: dense-compare scatter_max_image vs Pallas separable
max-binning, vmapped over 16 frames at bench shapes (64k pts, 20x60)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from scl_slam_tpu.ops import pallas_kernels as pk
from scl_slam_tpu.ops.pointcloud import scatter_max_image

B, N, R, S = 16, 65536, 20, 60
rng = np.random.RandomState(0)
ring = jnp.asarray(rng.randint(0, R, (B, N)).astype(np.int32))
sector = jnp.asarray(rng.randint(0, S, (B, N)).astype(np.int32))
z = jnp.asarray(rng.uniform(-2, 40, (B, N)).astype(np.float32))
valid = jnp.asarray(rng.rand(B, N) > 0.1)

dense = jax.jit(jax.vmap(
    lambda a, b, c, d: scatter_max_image(a, b, c, d, R, S, init=0.0)
))
pallas = jax.jit(jax.vmap(
    lambda a, b, c, d: pk.max_image_pallas(a, b, c, d, R, S)
))

o1 = dense(z, ring, sector, valid); jax.block_until_ready(o1)
_ = np.asarray(o1)[:1, :1, :1]
o2 = pallas(z, ring, sector, valid); jax.block_until_ready(o2)
_ = np.asarray(o2)[:1, :1, :1]
print("agreement max err:", float(jnp.abs(o1 - o2).max()))

def pipelined(fn, chain=10):
    t0 = time.perf_counter()
    o = None
    for _ in range(chain):
        o = fn(z, ring, sector, valid)
    _ = np.asarray(o).ravel()[:1]
    return (time.perf_counter() - t0) / chain


for trial in range(3):
    td = pipelined(dense)
    tp = pipelined(pallas)
    print(f"trial {trial}: dense {td*1e3:7.2f} ms   pallas {tp*1e3:7.2f} ms "
          f"(16 frames, pipelined x10)")
