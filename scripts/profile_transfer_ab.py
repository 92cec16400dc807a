#!/usr/bin/env python
"""Interleaved A/B: f32 vs int16 scan transfer on the long-session workload.

Two Mappers (one per mode) process the same chunks alternately within one
process (the tunneled chip drifts +-40% across processes, so only
interleaved comparisons are trustworthy). Per chunk and mode, staging
(host quantization + np packing) and the replay call (transfer + device
compute + drain) are timed separately.

    timeout 1500 python scripts/profile_transfer_ab.py
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
    KeyframeConfig, LoopConfig, OptimizerConfig, ScanContextParams, SlamConfig,
)
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.runtime import Mapper


def make_cfg():
    return SlamConfig(
        keyframe=KeyframeConfig(
            max_keyframes=4096, points_per_keyframe=4096,
            raw_points_capacity=65536,
        ),
        loop=LoopConfig(near_keyframes=25, submap_capacity=8192,
                        icp_iterations=20),
        optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=6, cg_iters=48),
        scan_context=ScanContextParams(),
    )


def main():
    B, R = 32, 6
    chunk = B * R
    n_chunks = 5
    rng = np.random.RandomState(0)

    def scan(k):
        n = 65536
        theta = rng.uniform(-np.pi, np.pi, n)
        r = rng.uniform(2, 75, n)
        z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n) - 1.0
        return np.stack(
            [r * np.cos(theta), r * np.sin(theta), z], -1
        ).astype(np.float32)

    modes = ("f32", "int16")
    mappers = {m: Mapper(make_cfg()) for m in modes}
    t_replay = {m: [] for m in modes}
    print(f"backend: {jax.default_backend()}", flush=True)
    for c in range(n_chunks):
        base = c * chunk
        poses = [
            se3.Pose(jnp.eye(3), jnp.array([1.0 * (base + k), 0.0, 0.0]))
            for k in range(chunk)
        ]
        scans = [scan(base + k) for k in range(chunk)]
        stamps = [0.1 * (base + k) for k in range(chunk)]
        for mode in modes:
            m = mappers[mode]
            t0 = time.perf_counter()
            out = m.replay(poses, scans, stamps, apply_gate=False,
                           batch=B, chunk_batches=R, transfer=mode)
            chi = m.optimize()
            _ = np.asarray(chi)[:1]
            dt = time.perf_counter() - t0
            if c > 0:
                t_replay[mode].append(dt)
            print(f"chunk {c} {mode:5s}: {chunk/dt:7.1f} frames/s "
                  f"({dt*1e3:6.0f} ms)"
                  + ("  [compile]" if c == 0 else ""), flush=True)

    for mode in modes:
        med = np.median(t_replay[mode])
        print(f"{mode}: median {chunk/med:.1f} frames/s over "
              f"{len(t_replay[mode])} warm chunks "
              f"({[round(chunk/t) for t in t_replay[mode]]})")


if __name__ == "__main__":
    main()
