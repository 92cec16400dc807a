"""Attribute the scanned chunk's non-ICP time: compile config variants.

- full (icp_iters=20)          : everything
- icp_iters=1                  : everything minus ~all ICP iterations
- near_keyframes=2, icp 1      : shrink the submap gather W 51 -> 5
- intra_enabled=False          : NOT a prep-only probe — the flag is
                                 honored host-side (Mapper methods), not
                                 inside _batch_body, so this variant times
                                 the full pipeline (measured: identical to
                                 "full", confirming the flag placement)

Measured (v5e, 2026-08-18): full 132.9 / icp1 74.1 / near2 73.9 /
intra-off 133.2 ms per 192-frame chunk -> ICP iterations ~59 ms (~44%),
submap gather width ~FREE inside the fused chunk (the 5-12 ms standalone
gather numbers were dispatch floor), prep+ingest+retrieval ~74 ms.

Fresh state per rep; 3 reps per variant, best-of; host copy ends timing.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def cfg_of(iters=20, intra=True, near=25):
    return SlamConfig(
        keyframe=KeyframeConfig(
            max_keyframes=4096, points_per_keyframe=4096,
            raw_points_capacity=65536,
        ),
        loop=LoopConfig(
            near_keyframes=near, submap_capacity=8192, icp_iterations=iters,
            intra_enabled=intra,
        ),
        optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=6, cg_iters=48),
        scan_context=ScanContextParams(),
    )


def timed(name, cfg, reps=3):
    st = make_state(cfg)
    out = _replay_batches(
        st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg
    )
    jax.block_until_ready(out)
    _ = np.asarray(out[3]).ravel()[:1]
    best = 1e9
    for _ in range(reps):
        st = make_state(cfg)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        out = _replay_batches(
            st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg
        )
        _ = np.asarray(out[3]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1e3:8.1f} ms/chunk")
    return best


t_full = timed("full (icp 20)", cfg_of())
t_icp1 = timed("icp_iters=1", cfg_of(iters=1))
t_near = timed("icp 1, near=2 (gather W 51->5)", cfg_of(iters=1, near=2))
t_off = timed("intra off (host-side flag: = full)", cfg_of(intra=False))
print(f"\nICP iterations:           {(t_full-t_icp1)*1e3:7.1f} ms")
print(f"gather width (W=51-5):    {(t_icp1-t_near)*1e3:7.1f} ms")
print(f"prep+ingest+retrieval+1it:{t_icp1*1e3:7.1f} ms")
