"""ICP share of the scanned replay chunk: sweep icp_iterations 1/20/50.

Also the CLAUDE.md work-scaling sanity check for the 1693 frames/s bench
claim: chunk time must grow with ICP iterations.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from scl_slam_tpu.config import (
    KeyframeConfig, LoopConfig, OptimizerConfig, ScanContextParams, SlamConfig,
)
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.runtime.mapper import _replay_batches
from scl_slam_tpu.runtime.state import make_state

rng = np.random.RandomState(0)
N = 65536
B, R = 32, 6


def scan(k):
    theta = rng.uniform(-np.pi, np.pi, N)
    r = rng.uniform(2, 75, N)
    z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, N) - 1.0
    return np.stack([r * np.cos(theta), r * np.sin(theta), z], -1).astype(
        np.float32
    )


xs = jnp.asarray(np.stack([scan(k) for k in range(R * B)]).reshape(R, B, N, 3))
masks = jnp.ones((R, B, N), bool)
pose_R = jnp.broadcast_to(jnp.eye(3), (R, B, 3, 3))
pose_t = jnp.asarray(
    np.stack(
        [[1.0 * (i * B + k), 0.0, 0.0] for i in range(R) for k in range(B)]
    ).reshape(R, B, 3),
    jnp.float32,
)
stamps = jnp.zeros((R, B))


def time_iters(iters):
    cfg = SlamConfig(
        keyframe=KeyframeConfig(
            max_keyframes=4096, points_per_keyframe=4096,
            raw_points_capacity=65536,
        ),
        loop=LoopConfig(
            near_keyframes=25, submap_capacity=8192, icp_iterations=iters
        ),
        optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=6, cg_iters=48),
        scan_context=ScanContextParams(),
    )
    st = make_state(cfg)
    out = _replay_batches(
        st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg
    )
    jax.block_until_ready(out)
    _ = np.asarray(out[3]).ravel()[:1]
    best = 1e9
    for _ in range(3):
        st = make_state(cfg)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        out = _replay_batches(
            st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg
        )
        _ = np.asarray(out[3]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"icp_iters {iters:3d}: {best*1e3:8.1f} ms/chunk "
          f"({R*B/best:7.1f} frames/s)")
    return best


t1 = time_iters(1)
t20 = time_iters(20)
t50 = time_iters(50)
print(f"per-iteration cost ~ {(t50-t1)/49*1e3:.2f} ms/chunk-iter "
      f"(ICP share at 20 iters ~ {(t20-t1)/t20*100:.0f}%)")
