"""Within-process A/B: all-device replay chunks vs host-descriptor
(C++ input-pipeline binning) replay chunks — bench.py workload, 3 reps of a
192-frame fresh-DB chunk each. Host binning runs inside the timed region;
dispatches are async so rep i's binning overlaps rep i-1's device work.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from scl_slam_tpu.config import (
    KeyframeConfig, LoopConfig, OptimizerConfig, ScanContextParams, SlamConfig,
)
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.runtime.mapper import _replay_batches, _replay_batches_wire
from scl_slam_tpu.runtime.state import make_state
from scl_slam_tpu.io import native_loader

cfg = SlamConfig(
    keyframe=KeyframeConfig(
        max_keyframes=4096, points_per_keyframe=4096, raw_points_capacity=65536,
    ),
    loop=LoopConfig(near_keyframes=25, submap_capacity=8192, icp_iterations=20),
    optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=6, cg_iters=48),
    scan_context=ScanContextParams(),
)
assert native_loader.load_library() is not None
p = cfg.scan_context
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


xs_np = np.stack([scan(k) for k in range(R * B)])
xs = jnp.asarray(xs_np.reshape(R, B, N, 3))
masks = jnp.ones((R, B, N), bool)
pose_R = jnp.broadcast_to(jnp.eye(3), (R, B, 3, 3))
pose_t = jnp.asarray(
    np.stack(
        [[1.0 * (i * B + k), 0.0, 0.0] for i in range(R) for k in range(B)]
    ).reshape(R, B, 3),
    jnp.float32,
)
stamps = jnp.zeros((R, B))
robot = jnp.array(0)


def step_dev(st):
    return _replay_batches(
        st, robot, se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg
    )


def step_host(st):
    w = native_loader.sc_images_batch(
        xs_np, None, p.num_rings, p.num_sectors, p.max_radius,
        p.lidar_height, n_threads=4,
    )
    return _replay_batches_wire(
        st, robot, se3.Pose(pose_R, pose_t), xs, masks,
        jnp.asarray(w.reshape(R, B, -1)), stamps, cfg,
    )


def timed(name, fn, reps=3):
    out = fn(make_state(cfg))
    jax.block_until_ready(out)
    _ = np.asarray(out[3]).ravel()[:1]
    states = [make_state(cfg) for _ in range(reps)]
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    outs = [fn(states[i]) for i in range(reps)]
    _ = [np.asarray(o[3]).ravel()[:1] for o in outs]
    dt = time.perf_counter() - t0
    print(f"{name:14s}: {reps*R*B/dt:8.1f} frames/s ({dt/reps*1e3:.1f} ms/chunk)")


for _ in range(2):
    timed("device-binning", step_dev)
    timed("host-binning", step_host)
