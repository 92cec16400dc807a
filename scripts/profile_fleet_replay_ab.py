#!/usr/bin/env python
"""Interleaved A/B: fleet serving via per-step dispatch vs scanned replay.

Same total workload as bench.py::bench_fleet (2 robots, B=16 mixed batches,
4 batches of 65k-pt scans, full intra+inter verification): A = 4 sequential
`_fleet_step` dispatches (the interactive serving path — pays the tunneled
runtime's ~1-3 ms dispatch floor per batch); B = ONE `_fleet_replay`
program scanning the 4 batches (the offline/throughput path — pays it
once). Own compile-cache dir (can run beside the CPU suite).

    timeout 1200 python scripts/profile_fleet_replay_ab.py
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
from scl_slam_tpu.runtime.fleet import _fleet_replay, _fleet_step
from scl_slam_tpu.runtime.state import make_state

CFG = SlamConfig(
    number_of_robots=2,
    keyframe=KeyframeConfig(
        max_keyframes=2048, points_per_keyframe=4096, raw_points_capacity=65536
    ),
    loop=LoopConfig(near_keyframes=25, submap_capacity=8192, icp_iterations=20),
    optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=4, cg_iters=32),
)


def stage(B, n_steps):
    rng = np.random.RandomState(1)
    n = 65536

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
    return robots, pose_R, pose_ts, xs, masks, stamps


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    B, R = 16, 4
    robots, pose_R, pose_ts, xs, masks, stamps = stage(B, R)
    key = jax.random.PRNGKey(0)

    # scanned-replay stacked inputs: [R, B, ...]
    rep = lambda a: jnp.broadcast_to(a, (R,) + a.shape)
    r_robots = rep(robots)
    r_poseR = rep(pose_R)
    r_poset = jnp.stack(pose_ts)
    r_xs, r_masks, r_stamps = rep(xs), rep(masks), rep(stamps)

    # compile both
    st = make_state(CFG)
    t0 = time.perf_counter()
    st, k2, outs = _fleet_step(
        st, key, robots, pose_R, pose_ts[0], xs, masks, stamps, CFG
    )
    _ = np.asarray(outs[0])
    print(f"compile step: {time.perf_counter() - t0:.1f}s", flush=True)
    st = make_state(CFG)
    t0 = time.perf_counter()
    st, k2, outs = _fleet_replay(
        st, key, r_robots, r_poseR, r_poset, r_xs, r_masks, r_stamps, CFG
    )
    _ = np.asarray(outs[0])
    print(f"compile replay: {time.perf_counter() - t0:.1f}s", flush=True)

    best = {"step": 1e9, "replay": 1e9}
    for rep_i in range(6):
        st = make_state(CFG)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        k = key
        outs = None
        for s in range(R):
            st, k, outs = _fleet_step(
                st, k, robots, pose_R, pose_ts[s], xs, masks, stamps, CFG
            )
        _ = np.asarray(outs[0])
        best["step"] = min(best["step"], time.perf_counter() - t0)

        st = make_state(CFG)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        st, _, outs = _fleet_replay(
            st, key, r_robots, r_poseR, r_poset, r_xs, r_masks, r_stamps, CFG
        )
        _ = np.asarray(outs[0])
        best["replay"] = min(best["replay"], time.perf_counter() - t0)
    total = B * R
    for name, dt in best.items():
        print(
            f"{name:6s}: {dt * 1e3:7.1f} ms / {total} frames "
            f"({total / dt:7.1f} frames/s)",
            flush=True,
        )
    print(f"replay vs step: {best['step'] / best['replay']:.2f}x")


if __name__ == "__main__":
    main()
