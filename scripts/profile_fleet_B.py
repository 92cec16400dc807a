#!/usr/bin/env python
"""Fleet-step lane-count sweep: B=16/32/64 at the same 64-frame workload.

The headline replay's macro-batch sweep found B=32 the sweet spot
(scripts/profile_bench_B.py: 1013/1204/976 frames/s at 16/32/64). The
fleet step shares the batched-lane structure (vmapped prep, one
predicated ICP + one batched RANSAC per batch), so the same trade —
more lanes amortizing per-kernel overheads vs bigger tiles thrashing —
applies. Interleaved within one process; own compile-cache dir.

    timeout 1500 python scripts/profile_fleet_B.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/scl_slam_jax_cache_prof")

import jax.numpy as jnp
import numpy as np

from scl_slam_tpu.config import (
    KeyframeConfig,
    LoopConfig,
    OptimizerConfig,
    SlamConfig,
)
from scl_slam_tpu.runtime.fleet import _fleet_step
from scl_slam_tpu.runtime.state import make_state

CFG = SlamConfig(
    number_of_robots=2,
    keyframe=KeyframeConfig(
        max_keyframes=2048, points_per_keyframe=4096, raw_points_capacity=65536
    ),
    loop=LoopConfig(near_keyframes=25, submap_capacity=8192, icp_iterations=20),
    optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=4, cg_iters=32),
)
TOTAL = 64


def stage(B):
    rng = np.random.RandomState(1)
    n = 65536
    n_steps = TOTAL // B

    def scan(k):
        theta = rng.uniform(-np.pi, np.pi, n)
        r = rng.uniform(2, 75, n)
        z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n) - 1.0
        return np.stack([r * np.cos(theta), r * np.sin(theta), z], -1)

    robots = jnp.asarray([k % 2 for k in range(B)], jnp.int32)
    xs = jnp.asarray(np.stack([scan(k) for k in range(B)]).astype(np.float32))
    pose_ts = [
        jnp.asarray(
            np.stack([[2.0 * (s * B + k), 4.0 * (k % 2), 0.0] for k in range(B)]),
            jnp.float32,
        )
        for s in range(n_steps)
    ]
    masks = jnp.ones((B, n), bool)
    pose_R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    stamps = jnp.zeros((B,), jnp.float32)
    return robots, pose_R, pose_ts, xs, masks, stamps, n_steps


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    staged = {B: stage(B) for B in (16, 32, 64)}
    # compile all variants first
    for B, (robots, pose_R, pose_ts, xs, masks, stamps, n_steps) in staged.items():
        st = make_state(CFG)
        t0 = time.perf_counter()
        st, _, outs = _fleet_step(
            st, key, robots, pose_R, pose_ts[0], xs, masks, stamps, CFG
        )
        _ = np.asarray(outs[0])
        print(f"compile B={B}: {time.perf_counter() - t0:.1f}s", flush=True)

    best = {B: 1e9 for B in staged}
    for _ in range(6):
        for B, (robots, pose_R, pose_ts, xs, masks, stamps, n_steps) in staged.items():
            st = make_state(CFG)
            jax.block_until_ready(st)
            t0 = time.perf_counter()
            k = key
            outs = None
            for s in range(n_steps):
                st, k, outs = _fleet_step(
                    st, k, robots, pose_R, pose_ts[s], xs, masks, stamps, CFG
                )
            _ = np.asarray(outs[0])
            best[B] = min(best[B], time.perf_counter() - t0)
    for B, dt in best.items():
        print(
            f"B={B:3d}: {dt * 1e3:7.1f} ms / {TOTAL} frames "
            f"({TOTAL / dt:7.1f} frames/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
