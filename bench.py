"""Benchmark: end-to-end loop-closure serving throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: **keyframe pipeline frames/s** — full per-keyframe work
(descriptor build + DB insert + retrieval + shifted-distance verification +
submap ICP + queue/optimize bookkeeping) on synthetic KITTI-scale inputs,
processed as scanned chunks of 6x32 keyframes per device program (the
Mapper.replay dataset-replay mode, directly comparable to the reference's
rosbag-replay workload).

Baseline: the reference (thisparticle/scl_slam) targets real-time operation on
a 4-core onboard CPU at sensor rate (10 Hz frames; see BASELINE.md — the repo
publishes no numbers, so sensor-rate real-time = 10 frames/s is the reference
operating point; `vs_baseline` = ours / 10).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from scl_slam_tpu.config import (
        KeyframeConfig,
        LoopConfig,
        OptimizerConfig,
        ScanContextParams,
        SlamConfig,
    )
    from scl_slam_tpu.geometry import se3
    from scl_slam_tpu.runtime.mapper import _replay_batches
    from scl_slam_tpu.runtime.state import make_state

    cfg = SlamConfig(
        keyframe=KeyframeConfig(
            max_keyframes=4096,  # KITTI-00-scale DB capacity
            points_per_keyframe=4096,
            raw_points_capacity=65536,  # KITTI scans are ~120k pts; 64k after crop
        ),
        loop=LoopConfig(near_keyframes=25, submap_capacity=8192, icp_iterations=20),
        optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=6, cg_iters=48),
        scan_context=ScanContextParams(),
    )

    state = make_state(cfg)
    rng = np.random.RandomState(0)

    # synthetic KITTI-scale scans: 64k points, structured
    def scan(k):
        n = 65536
        theta = rng.uniform(-np.pi, np.pi, n)
        r = rng.uniform(2, 75, n)
        z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n) - 1.0
        return np.stack(
            [r * np.cos(theta), r * np.sin(theta), z], -1
        ).astype(np.float32)

    # B=32 macro-batches, R=6 of them scanned inside ONE device program
    # per dispatch (Mapper.replay's _replay_batches): B=32 measured the
    # lane-count sweet spot (scripts/profile_bench_B.py: 16/32/64 ->
    # 1013/1204/976 frames/s) and the scan amortizes the tunneled
    # runtime's ~1-3 ms per-dispatch floor (scripts/profile_floor.py)
    # over 192 frames.
    B, R = 32, 6
    xs = jnp.asarray(
        np.stack([scan(k) for k in range(R * B)]).reshape(R, B, 65536, 3)
    )
    masks = jnp.ones((R, B, 65536), bool)
    pose_R = jnp.broadcast_to(jnp.eye(3), (R, B, 3, 3))
    pose_t = jnp.asarray(
        np.stack(
            [[1.0 * (i * B + k), 0.0, 0.0] for i in range(R) for k in range(B)]
        ).reshape(R, B, 3),
        jnp.float32,
    )
    stamps = jnp.zeros((R, B))

    def chunk_step(state):
        return _replay_batches(
            state, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg
        )

    # warm up (compile) on a throwaway state
    out = chunk_step(state)
    jax.block_until_ready(out)
    _ = np.asarray(out[3])  # host copy: forces true completion on the relay

    # timed: replay 192 frames into an empty DB, 3 times (fresh state each,
    # pre-made outside the timed region). Within each chunk the later scan
    # steps retrieve+verify against the earlier frames, so the ICP branch
    # contributes (~same loop mix as the per-sequence replay workload).
    # End with a host copy of a small output — block_until_ready alone has
    # been observed to return before the full program finishes on the
    # tunneled runtime, which silently inflates throughput (see CLAUDE.md)
    n_rep = 3
    states = [make_state(cfg) for _ in range(n_rep)]
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    outs = [chunk_step(states[i]) for i in range(n_rep)]
    _ = [np.asarray(o[3]) for o in outs]
    dt = time.perf_counter() - t0
    fps = n_rep * R * B / dt

    baseline_fps = 10.0  # reference operating point: sensor-rate on 4-core CPU
    print(
        json.dumps(
            {
                "metric": "keyframe_pipeline_frames_per_s",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
