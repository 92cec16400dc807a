"""Loop-closure retrieval throughput (BASELINE metric: queries/s).

scan_context.query_batch over a full 4096-entry DB, timed as chained
device calls with a final host copy; per-dispatch floor amortized over a
deep chain (CLAUDE.md dispatch-floor note). Correctness: each query must
retrieve its own DB row (self-match) outside the recency exclusion.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from scl_slam_tpu.descriptors import scan_context as sc

CFG = sc.ScanContextConfig()
K = 4096
R, S = CFG.num_rings, CFG.num_sectors

rng = np.random.RandomState(0)
imgs = rng.rand(K, R, S).astype(np.float32) * 8.0
keys = imgs.mean(axis=2)
db = sc.make_db(K, CFG)
db = db._replace(
    descriptors=jnp.asarray(imgs),
    keys=jnp.asarray(keys),
    robot=jnp.zeros((K,), jnp.int32),
    index=jnp.arange(K, dtype=jnp.int32),
    count=jnp.array(K, jnp.int32),
)

B = 256
sel = rng.randint(0, K - CFG.exclude_recent - 1, B)
q_imgs = jnp.asarray(imgs[sel])
q_keys = jnp.asarray(keys[sel])
q_robots = jnp.zeros((B,), jnp.int32)
# query indices at the DB end so self-matches sit outside the exclusion
q_indices = jnp.full((B,), K - 1, jnp.int32)


@jax.jit
def run(q):
    return sc.query_batch(db, q, q_keys, q_robots, q_indices, CFG, mode="intra")


m = run(q_imgs)
jax.block_until_ready(m)
correct = int(np.sum(np.asarray(m.index) == sel))
print(f"self-match correctness: {correct}/{B}")

CHAIN = 50
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    q = q_imgs
    o = None
    for _ in range(CHAIN):
        o = run(q)
        # thread the dependency through the query input so calls can't
        # overlap-elide, while keeping identical retrieval work
        q = q_imgs + 0.0 * o.distance[0]
    _ = np.asarray(o.index).ravel()[:1]
    best = min(best, (time.perf_counter() - t0) / CHAIN)
print(f"{B} queries/batch, {K}-entry DB: {best*1e3:.2f} ms/batch "
      f"-> {B/best:,.0f} queries/s")
