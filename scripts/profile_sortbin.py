"""Within-process A/B: dense-compare scatter_max_image vs sort-based exact
max-binning, vmapped over 16 frames at bench shapes (64k pts, 20x60).

Sort-based scheme: pack flat bin key (11 bits) and value quantized to 21
bits into one int32, jnp.sort ascending along points, then read each bin's
max as the element just before the next key's first position (searchsorted).
Arithmetic is O(n log^2 n) compare-exchange vs the dense form's O(n * nb)
VPU ops — the open question on TPU is the cost of the sort's lane-crossing
permutes.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from scl_slam_tpu.ops.pointcloud import scatter_max_image

B, N, R, S = 16, 65536, 20, 60
NB = R * S
VBITS = 21
rng = np.random.RandomState(0)
ring = jnp.asarray(rng.randint(0, R, (B, N)).astype(np.int32))
sector = jnp.asarray(rng.randint(0, S, (B, N)).astype(np.int32))
z = jnp.asarray(rng.uniform(-2, 40, (B, N)).astype(np.float32))
valid = jnp.asarray(rng.rand(B, N) > 0.1)
LO, SPAN = -4.0, 64.0


def sort_max_image(values, rg, sc, vd):
    key = jnp.where(vd, rg * S + sc, NB).astype(jnp.int32)
    q = jnp.clip(
        jnp.floor((values - LO) * ((1 << VBITS) / SPAN)), 0, (1 << VBITS) - 1
    ).astype(jnp.int32)
    packed = jnp.where(vd, (key << VBITS) | q, jnp.iinfo(jnp.int32).max)
    srt = jnp.sort(packed)
    # first position of each key k = searchsorted(srt >> VBITS, k); the max
    # of bin k sits just before the first position of key k+1
    keys_sorted = srt >> VBITS
    first = jnp.searchsorted(keys_sorted, jnp.arange(NB + 1, dtype=jnp.int32))
    last = first[1:] - 1
    hit = first[1:] > first[:-1]
    vq = (srt & ((1 << VBITS) - 1)).astype(jnp.float32)
    vals = vq[last] * (SPAN / (1 << VBITS)) + LO
    img = jnp.where(hit, vals, 0.0)
    return img.reshape(R, S)


dense = jax.jit(jax.vmap(
    lambda a, b, c, d: scatter_max_image(a, b, c, d, R, S, init=0.0)
))
sortb = jax.jit(jax.vmap(sort_max_image))

o1 = dense(z, ring, sector, valid); jax.block_until_ready(o1)
_ = np.asarray(o1)[:1, :1, :1]
o2 = sortb(z, ring, sector, valid); jax.block_until_ready(o2)
_ = np.asarray(o2)[:1, :1, :1]
print("agreement max err:", float(jnp.abs(o1 - o2).max()))
print("occupancy agree:", bool(((o1 > 0) == (o2 > 0)).all()))


def pipelined(fn, chain=10):
    t0 = time.perf_counter()
    o = None
    for _ in range(chain):
        o = fn(z, ring, sector, valid)
    _ = np.asarray(o).ravel()[:1]
    return (time.perf_counter() - t0) / chain


for trial in range(3):
    td = pipelined(dense)
    ts = pipelined(sortb)
    print(f"trial {trial}: dense {td*1e3:7.2f} ms   sort {ts*1e3:7.2f} ms "
          f"(16 frames, pipelined x10)")
