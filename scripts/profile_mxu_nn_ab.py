"""Within-process pipelined A/B: MXU-form NN selection (registration.MXU_NN)
vs the exact per-coordinate kernel, inside the batched ICP iterations.

bench.py-style replay-batch timing, interleaved A/B/A/B to cancel the
tunneled chip's run-to-run drift. The cut constants are read at trace
time; distinct loop_noise_scale values force separate jit entries.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from scl_slam_tpu.config import (
    KeyframeConfig, LoopConfig, OptimizerConfig, ScanContextParams, SlamConfig,
)
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.ops import registration as reg
from scl_slam_tpu.runtime.mapper import _replay_batches
from scl_slam_tpu.runtime.state import make_state


def make_cfg(tag):
    return SlamConfig(
        keyframe=KeyframeConfig(
            max_keyframes=4096, points_per_keyframe=4096,
            raw_points_capacity=65536,
        ),
        loop=LoopConfig(near_keyframes=25, submap_capacity=8192,
                        icp_iterations=20),
        optimizer=OptimizerConfig(
            edge_capacity=2048, gn_iters=6, cg_iters=48,
            loop_noise_scale=1.0 + 1e-9 * tag,   # distinct jit entry per variant
        ),
        scan_context=ScanContextParams(),
    )


rng = np.random.RandomState(0)


def scan(k):
    n = 65536
    theta = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(2, 75, n)
    z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n) - 1.0
    return np.stack([r * np.cos(theta), r * np.sin(theta), z], -1).astype(np.float32)


B, R = 32, 6
xs = jnp.asarray(np.stack([scan(k) for k in range(R * B)]).reshape(R, B, 65536, 3))
masks = jnp.ones((R, B, 65536), bool)
pose_R = jnp.broadcast_to(jnp.eye(3), (R, B, 3, 3))
pose_t = jnp.asarray(
    np.stack([[1.0 * (i * B + k), 0.0, 0.0] for i in range(R) for k in range(B)]
             ).reshape(R, B, 3), jnp.float32)
stamps = jnp.zeros((R, B))

CUTS = {"mxu": True, "exact": False}
variants = {}
for tag, (name, flag) in enumerate(CUTS.items(), start=1):
    cfg = make_cfg(tag)
    reg.MXU_NN = flag
    st = make_state(cfg)
    out = _replay_batches(st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg)
    jax.block_until_ready(out)
    _ = np.asarray(out[3])
    variants[name] = cfg

results = {k: [] for k in CUTS}
for rep in range(3):
    for name, flag in CUTS.items():
        reg.MXU_NN = flag  # safety only (trace-time flag, cached per cfg)
        cfg = variants[name]
        st = make_state(cfg)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        out = _replay_batches(st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg)
        _ = np.asarray(out[3])
        dt = time.perf_counter() - t0
        results[name].append(R * B / dt)
for name, v in results.items():
    print(f"{name}: {[round(x,1) for x in v]} -> best {max(v):.1f} frames/s")
