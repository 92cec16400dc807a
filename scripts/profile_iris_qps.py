"""LiDAR-Iris retrieval throughput (first-class-family serving number).

``lidar_iris.query_batch`` over a full DB — the Iris analog of
profile_retrieval_qps.py (Scan Context). Per query: masked row-key top-k,
then num_candidates full 2-D log-polar FFT template matches + masked
Hamming ±2 under match mode 2 (reference per-query cost center:
``include/descriptor.h:933-1023``, which runs this loop on the CPU per
candidate at sensor rate).

Timing discipline (CLAUDE.md): chained device calls with a loop-varying
operand wrapped so XLA can't hoist the hot work, final host copy.

    timeout 900 python scripts/profile_iris_qps.py [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/scl_slam_jax_cache_prof")

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--db", type=int, default=4096)
ap.add_argument("--batch", type=int, default=64)
ap.add_argument("--chain", type=int, default=16)
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from scl_slam_tpu.descriptors import lidar_iris as li

CFG = li.LidarIrisConfig()
K = args.db
R, C = CFG.rows, CFG.cols

rng = np.random.RandomState(0)
imgs = rng.randint(0, 256, (K, R, C)).astype(np.float32)
keys = rng.uniform(0, 10, (K, R)).astype(np.float32)
db = li.make_db(K, CFG)
db = db._replace(
    descriptors=jnp.asarray(imgs),
    keys=jnp.asarray(keys),
    robot=jnp.zeros((K,), jnp.int32),
    index=jnp.arange(K, dtype=jnp.int32),
    count=jnp.array(K, jnp.int32),
)

B = args.batch
sel = rng.randint(0, K - CFG.exclude_recent - 1, B)
q_imgs = jnp.asarray(imgs[sel])
q_keys = jnp.asarray(keys[sel])
q_robots = jnp.zeros((B,), jnp.int32)
q_indices = jnp.full((B,), K - 1, jnp.int32)


@jax.jit
def run(q):
    return li.query_batch(db, q, q_keys, q_robots, q_indices, CFG, mode="intra")


print(f"backend={jax.default_backend()} DB={K} B={B} "
      f"candidates={CFG.num_candidates} mode={CFG.match_mode}", flush=True)
t0 = time.perf_counter()
m = run(q_imgs)
jax.block_until_ready(m)
_ = np.asarray(m.index)[:1]
print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
correct = int(np.sum(np.asarray(m.index) == sel))
print(f"self-match correctness: {correct}/{B}")

best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    q = q_imgs
    o = None
    for _ in range(args.chain):
        o = run(q)
        # thread the dependency through the query input NON-decomposably
        # (CLAUDE.md microbench trap: an additive constant lets XLA hoist
        # the invariant part out and time a rank-1 correction)
        q = q_imgs + 0.0 * o.distance[0]
    _ = np.asarray(o.index).ravel()[:1]
    best = min(best, (time.perf_counter() - t0) / args.chain)
print(f"{B} queries/batch: {best * 1e3:.2f} ms/batch "
      f"-> {B / best:,.0f} queries/s")
