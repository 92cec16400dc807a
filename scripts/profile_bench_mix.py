"""Bench-workload replica with ICP-branch accounting.

Replicates bench.py's 12x16-frame replay and reports, per batch, whether the
whole-batch ICP cond fired (any attempt) and the per-batch wall time, to
show what fraction of end-to-end time is the verification branch.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from scl_slam_tpu.config import (
    KeyframeConfig, LoopConfig, OptimizerConfig, ScanContextParams, SlamConfig,
)
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.runtime.mapper import _ingest_and_detect_batch
from scl_slam_tpu.runtime.state import make_state

cfg = SlamConfig(
    keyframe=KeyframeConfig(
        max_keyframes=4096, points_per_keyframe=4096, raw_points_capacity=65536,
    ),
    loop=LoopConfig(near_keyframes=25, submap_capacity=8192, icp_iterations=20),
    optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=6, cg_iters=48),
    scan_context=ScanContextParams(),
)
state = make_state(cfg)
rng = np.random.RandomState(0)


def scan(k):
    n = 65536
    theta = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(2, 75, n)
    z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n) - 1.0
    return np.stack([r * np.cos(theta), r * np.sin(theta), z], -1).astype(
        np.float32
    )


B = 16
xs = jnp.asarray(np.stack([scan(k) for k in range(B)]))
masks = jnp.ones((B, 65536), bool)
pose_R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
pose_t = jnp.stack([jnp.array([1.0 * k, 0.0, 0.0]) for k in range(B)])
stamps = jnp.zeros(B)


def batch_step(st):
    return _ingest_and_detect_batch(
        st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg
    )


out = batch_step(state)
jax.block_until_ready(out)
_ = np.asarray(out[3])
state = out[0]

n_rep = 12
times, taken = [], []
for i in range(n_rep):
    t0 = time.perf_counter()
    out = batch_step(state)
    state = out[0]
    fits = np.asarray(out[3])       # host copy forces completion per batch
    times.append(time.perf_counter() - t0)
    taken.append(bool(np.isfinite(fits).any()))

for i, (t, tk) in enumerate(zip(times, taken)):
    print(f"batch {i:2d}: {t*1e3:8.2f} ms  icp_branch={'Y' if tk else 'n'}")
tot = sum(times)
print(f"total {tot*1e3:.1f} ms -> {n_rep*B/tot:.1f} frames/s "
      f"(note: per-batch host sync adds latency vs bench.py pipeline)")
print(f"icp branches taken: {sum(taken)}/{n_rep}")
