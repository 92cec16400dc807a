"""Attribute the ICP 58 ms: NN volume vs iteration count vs glue.

Config-knob variants (each a separate jit entry), icp base = 20 iters:
- base20            : icp_iterations=20, submap 8192, src 1024
- iters6            : iteration-count scaling probe
- submap4096        : NN target volume halved
- src512            : NN query volume halved
All include full prep; subtract the known icp_iters=1 floor (~67 ms) to
compare ICP shares. Fresh state per rep; 3 reps; host copy ends timing.
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


def make_cfg(tag, iters=20, submap=8192, src=1024):
    return SlamConfig(
        keyframe=KeyframeConfig(
            max_keyframes=4096, points_per_keyframe=4096,
            raw_points_capacity=65536,
        ),
        loop=LoopConfig(near_keyframes=25, submap_capacity=submap,
                        icp_iterations=iters, icp_source_points=src),
        optimizer=OptimizerConfig(
            edge_capacity=2048, gn_iters=6, cg_iters=48,
            loop_noise_scale=1.0 + 1e-9 * tag,
        ),
        scan_context=ScanContextParams(),
    )


xs = jnp.asarray(np.stack([scan(k) for k in range(R * B)]).reshape(R, B, N, 3))
masks = jnp.ones((R, B, N), bool)
pose_R = jnp.broadcast_to(jnp.eye(3), (R, B, 3, 3))
pose_t = jnp.asarray(
    np.stack([[1.0 * (i * B + k), 0.0, 0.0] for i in range(R) for k in range(B)]
             ).reshape(R, B, 3), jnp.float32)
stamps = jnp.zeros((R, B))

VARIANTS = {
    "base20": make_cfg(1),
    "iters6": make_cfg(2, iters=6),
    "submap4096": make_cfg(3, submap=4096),
    "src512": make_cfg(4, src=512),
}

for name, cfg in VARIANTS.items():
    st = make_state(cfg)
    out = _replay_batches(st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg)
    jax.block_until_ready(out)
    _ = np.asarray(out[3])
    print(f"compiled {name}", flush=True)

results = {k: [] for k in VARIANTS}
for rep in range(3):
    for name, cfg in VARIANTS.items():
        st = make_state(cfg)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        out = _replay_batches(st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg)
        _ = np.asarray(out[3])
        results[name].append((time.perf_counter() - t0) * 1e3)
for name, v in results.items():
    print(f"{name:12s} {min(v):7.1f} ms/chunk  {[round(x,1) for x in v]}")
