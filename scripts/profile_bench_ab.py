"""Within-process pipelined A/B of the bench workload: coarse 1 vs 4.

bench.py-style timing (12 pipelined batches, one trailing host copy) for
each coarse_factor, interleaved A/B/A/B to cancel tunnel drift.
"""
import dataclasses
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


def make_cfg(cf):
    return SlamConfig(
        keyframe=KeyframeConfig(
            max_keyframes=4096, points_per_keyframe=4096,
            raw_points_capacity=65536,
        ),
        loop=LoopConfig(near_keyframes=25, submap_capacity=8192,
                        icp_iterations=20, icp_coarse_factor=cf),
        optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=6, cg_iters=48),
        scan_context=ScanContextParams(),
    )


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
n_rep = 12


def run_once(cfg, state):
    """Warm state to post-warmup point, then timed pipelined reps."""
    def step(st):
        return _ingest_and_detect_batch(
            st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg
        )
    out = step(state)
    jax.block_until_ready(out)
    _ = np.asarray(out[3])
    st = out[0]
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = step(st)
        st = out[0]
    _ = np.asarray(out[3])
    return time.perf_counter() - t0


cfg1, cfg4 = make_cfg(1), make_cfg(4)
res = {1: [], 4: []}
for trial in range(3):
    for cf, cfg in ((1, cfg1), (4, cfg4)):
        dt = run_once(cfg, make_state(cfg))
        res[cf].append(n_rep * B / dt)
        print(f"trial {trial} cf={cf}: {n_rep*B/dt:8.1f} frames/s")

for cf in (1, 4):
    print(f"cf={cf}: median {np.median(res[cf]):.1f} frames/s  {res[cf]}")
