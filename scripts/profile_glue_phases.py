"""Finish the replay-chunk attribution: retrieval + verify-cond glue.

icp_iters=1 base (=67 ms; binning 29, downsample 7 attributed by
profile_prep_phases.py). Variants patch the descriptor family at trace
time (distinct jit entries via loop_noise_scale tags):

- base         : everything real
- no_retrieval : family.query returns a constant no-match -> removes the
                 ring-key topk + all-shift cosine AND the whole verify
                 cond branch + submap gather + enqueue writes
- no_insert    : family.insert is identity -> removes the DB descriptor
                 writes (image + keys scatter)
"""
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
from scl_slam_tpu.descriptors import base as dbase, registry
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


def make_cfg(tag):
    return SlamConfig(
        keyframe=KeyframeConfig(
            max_keyframes=4096, points_per_keyframe=4096,
            raw_points_capacity=65536,
        ),
        loop=LoopConfig(near_keyframes=25, submap_capacity=8192,
                        icp_iterations=1),
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

orig_get_family = registry.get_family


def patch_none():
    registry.get_family = orig_get_family


def patch_no_retrieval():
    def get(cfg):
        fam = orig_get_family(cfg)
        import dataclasses
        return dataclasses.replace(
            fam, query=lambda db, d, r, i, mode: dbase.no_match()
        )
    registry.get_family = get


def patch_no_insert():
    def get(cfg):
        fam = orig_get_family(cfg)
        import dataclasses
        return dataclasses.replace(fam, insert=lambda db, d, pos: db)
    registry.get_family = get


VARIANTS = {
    "base": patch_none,
    "no_retrieval": patch_no_retrieval,
    "no_insert": patch_no_insert,
}

compiled = {}
for tag, (name, patch) in enumerate(VARIANTS.items(), start=1):
    cfg = make_cfg(tag)
    patch()
    st = make_state(cfg)
    out = _replay_batches(
        st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg
    )
    jax.block_until_ready(out)
    _ = np.asarray(out[3])
    compiled[name] = (cfg, patch)
    print(f"compiled {name}", flush=True)

results = {k: [] for k in VARIANTS}
for rep in range(3):
    for name, (cfg, patch) in compiled.items():
        patch()
        st = make_state(cfg)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        out = _replay_batches(
            st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg
        )
        _ = np.asarray(out[3])
        results[name].append((time.perf_counter() - t0) * 1e3)
patch_none()
for name, v in results.items():
    print(f"{name:14s} {min(v):7.1f} ms/chunk  {[round(x,1) for x in v]}")
