"""Per-stage TPU profiling of the keyframe pipeline (bench.py breakdown).

Times jitted macro-batched variants that each run a subset of the per-
keyframe work, so stage costs can be separated by subtraction. All timings
end with a host copy (np.asarray) per CLAUDE.md's tunneled-runtime rule.

Usage: timeout 590 python scripts/profile_ingest.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, state, n_rep=8):
    out = fn(state)
    import jax

    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[-1])
    st = out[0] if isinstance(out, tuple) else state
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(st)
        st = out[0] if isinstance(out, tuple) else st
    _ = np.asarray(jax.tree_util.tree_leaves(out)[-1])
    return (time.perf_counter() - t0) / n_rep


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
    from scl_slam_tpu.descriptors import registry
    from scl_slam_tpu.geometry import se3
    from scl_slam_tpu.ops import pointcloud as pc
    from scl_slam_tpu.runtime.mapper import _ingest_and_detect_batch
    from scl_slam_tpu.runtime.state import make_state

    def make_cfg(icp_iters=20):
        return SlamConfig(
            keyframe=KeyframeConfig(
                max_keyframes=4096,
                points_per_keyframe=4096,
                raw_points_capacity=65536,
            ),
            loop=LoopConfig(
                near_keyframes=25, submap_capacity=8192, icp_iterations=icp_iters
            ),
            optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=6, cg_iters=48),
            scan_context=ScanContextParams(),
        )

    cfg = make_cfg()
    rng = np.random.RandomState(0)

    def scan(k):
        n = 65536
        theta = rng.uniform(-np.pi, np.pi, n)
        r = rng.uniform(2, 75, n)
        z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n) - 1.0
        return np.stack(
            [r * np.cos(theta), r * np.sin(theta), z], -1
        ).astype(np.float32)

    B = 16
    xs = jnp.asarray(np.stack([scan(k) for k in range(B)]))
    masks = jnp.ones((B, 65536), bool)
    pose_R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    pose_t = jnp.stack([jnp.array([1.0 * k, 0.0, 0.0]) for k in range(B)])
    stamps = jnp.zeros(B)

    state = make_state(cfg)

    # --- isolated stage programs (scan over B like the real batch step) ---
    fam = registry.get_family(cfg)

    @jax.jit
    def downsample_only(_state):
        def one(c, inp):
            x, m = inp
            small = pc.voxel_downsample_hash(
                pc.Cloud(x, m),
                cfg.keyframe.descript_leaf_size,
                cfg.keyframe.points_per_keyframe,
            )
            return c, small.xyz[0, 0]

        _, outs = jax.lax.scan(downsample_scan := one, 0, (xs, masks))
        return (_state, outs)

    @jax.jit
    def descriptor_only(_state):
        def one(c, inp):
            x, m = inp
            d = fam.make(pc.Cloud(x, m))
            return c, d.image[0, 0]

        _, outs = jax.lax.scan(one, 0, (xs, masks))
        return (_state, outs)

    @jax.jit
    def both_only(_state):
        def one(c, inp):
            x, m = inp
            cloud = pc.Cloud(x, m)
            small = pc.voxel_downsample_hash(
                cloud,
                cfg.keyframe.descript_leaf_size,
                cfg.keyframe.points_per_keyframe,
            )
            d = fam.make(cloud)
            return c, d.image[0, 0] + small.xyz[0, 0]

        _, outs = jax.lax.scan(one, 0, (xs, masks))
        return (_state, outs)

    def full(cfg):
        @jax.jit
        def step(st):
            return _ingest_and_detect_batch(
                st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg
            )

        return step

    results = {}
    results["downsample_only"] = timed(downsample_only, state)
    results["descriptor_only"] = timed(descriptor_only, state)
    results["downsample+descriptor"] = timed(both_only, state)
    for iters in (1, 20):
        c = make_cfg(icp_iters=iters)
        st = make_state(c)
        results[f"full_icp{iters}"] = timed(full(c), st)

    for k, v in results.items():
        print(f"{k:>24}: {v * 1000 / B:7.3f} ms/frame  ({v * 1000:7.2f} ms/batch)")


if __name__ == "__main__":
    main()
