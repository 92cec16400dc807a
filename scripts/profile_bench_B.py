"""Macro-batch size scaling of the bench workload on the real chip.

Same total frames (192) processed as 12x16, 6x32, 3x64 — fewer/bigger
dispatches amortize the tunneled runtime's per-dispatch floor
(scripts/profile_floor.py: ~1-3 ms/call even deep-pipelined) and let the
whole-batch ICP cond amortize across more lanes.
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
rng = np.random.RandomState(0)
N = 65536
TOTAL = 192


def scan(k):
    theta = rng.uniform(-np.pi, np.pi, N)
    r = rng.uniform(2, 75, N)
    z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, N) - 1.0
    return np.stack([r * np.cos(theta), r * np.sin(theta), z], -1).astype(
        np.float32
    )


scans = np.stack([scan(k) for k in range(TOTAL)])


def run(B):
    state = make_state(cfg)
    xs_all = jnp.asarray(scans)
    masks = jnp.ones((B, N), bool)
    stamps = jnp.zeros(B)
    pose_R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))

    def batch_step(state, xs, pose_t):
        return _ingest_and_detect_batch(
            state, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps,
            cfg,
        )

    step = jax.jit(batch_step)
    nb = TOTAL // B
    batches = [xs_all[i * B : (i + 1) * B] for i in range(nb)]
    ts = [
        jnp.asarray(
            np.stack([[1.0 * (i * B + k), 0.0, 0.0] for k in range(B)]),
            jnp.float32,
        )
        for i in range(nb)
    ]
    # warm up / compile on the first batch shape
    out = step(state, batches[0], ts[0])
    jax.block_until_ready(out)
    _ = np.asarray(out[3]).ravel()[:1]

    best = 1e9
    for _ in range(3):
        state = make_state(cfg)
        t0 = time.perf_counter()
        for i in range(nb):
            out = step(state, batches[i], ts[i])
            state = out[0]
        _ = np.asarray(out[3]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"B={B:3d}: {TOTAL/best:8.1f} frames/s  ({best*1e3/nb:.1f} ms/batch)")


for B in (16, 32, 64):
    run(B)
