"""Within-process A/B of icp_batched coarse_factor 1 vs 4 at bench shapes.

Interleaved reps cancel the tunnel's large run-to-run throughput swings.
Also reports converged flags and fitness agreement between the variants.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from scl_slam_tpu.geometry import se3
from scl_slam_tpu.ops import registration as reg
from scl_slam_tpu.ops.pointcloud import Cloud

B, NQ, NT = 16, 1024, 8192
rng = np.random.RandomState(0)

# structured target: ring-world surface; source = subset + rigid offset
tgt = np.stack([
    rng.uniform(-40, 40, (B, NT)),
    rng.uniform(-40, 40, (B, NT)),
    np.sin(rng.uniform(-np.pi, np.pi, (B, NT)) * 3) * 2,
], -1).astype(np.float32)
src = tgt[:, :NQ].copy()
# per-lane perturbation: ~1 m translation + ~5 deg yaw
for b in range(B):
    a = 0.09 * (b % 5 - 2)
    R = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
                  [0, 0, 1]], np.float32)
    src[b] = src[b] @ R.T + np.array([0.5 + 0.1 * b, -0.3, 0.05], np.float32)

source = Cloud(jnp.asarray(src), jnp.ones((B, NQ), bool))
target = Cloud(jnp.asarray(tgt), jnp.ones((B, NT), bool))
init = se3.identity((B,), dtype=jnp.float32)
active = jnp.ones((B,), bool)


def make(cf):
    def run(s_xyz):
        return reg.icp_batched(
            Cloud(s_xyz, source.mask), target, init, active,
            max_iters=20, max_corr_dist=10.0, tol=1e-4, coarse_factor=cf,
        )
    return jax.jit(run)


f1, f4 = make(1), make(4)
r1 = f1(source.xyz); jax.block_until_ready(r1); _ = np.asarray(r1.fitness)
r4 = f4(source.xyz); jax.block_until_ready(r4); _ = np.asarray(r4.fitness)

print("fitness cf=1:", np.asarray(r1.fitness)[:4])
print("fitness cf=4:", np.asarray(r4.fitness)[:4])
print("converged cf=1:", int(np.asarray(r1.converged).sum()),
      " cf=4:", int(np.asarray(r4.converged).sum()))

reps = 10
t1 = t4 = 0.0
for _ in range(reps):
    t0 = time.perf_counter()
    out = f1(source.xyz)
    _ = np.asarray(out.fitness)[:1]
    t1 += time.perf_counter() - t0
    t0 = time.perf_counter()
    out = f4(source.xyz)
    _ = np.asarray(out.fitness)[:1]
    t4 += time.perf_counter() - t0
print(f"cf=1: {t1/reps*1e3:7.2f} ms   cf=4: {t4/reps*1e3:7.2f} ms "
      f"(interleaved, host-synced)")
