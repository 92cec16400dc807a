"""Attribute the non-ICP 72 ms of a replay chunk (icp_iters=1 base).

Monkeypatch-at-trace-time ablations, one jit entry per variant via a
distinct loop_noise_scale tag (same trick as profile_icp_cuts_ab.py):

- base          : icp_iters=1, everything real
- no_desc       : descriptor images built from a 4096-pt stride slice of
                  the raw scan instead of all 64k points (bins the same
                  shapes; isolates the dense max-binning's point volume)
- zero_desc     : descriptor build replaced by zeros (removes binning
                  AND the ring-key/cosine retrieval's data dependence on
                  it stays — shapes identical)
- no_retrieval  : family query replaced by a constant no-match result
- no_downsample : storage downsample replaced by a prefix slice

Fresh state per rep; 3 reps per variant, best-of; host copy ends timing.
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
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.ops import pointcloud as pc
from scl_slam_tpu.descriptors import registry, scan_context as sc
from scl_slam_tpu.runtime import mapper as mp
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

orig_prepare = mp._prepare_frame
orig_query = None


def patch_none():
    mp._prepare_frame = orig_prepare


def patch_no_desc():
    def prep(xyz, mask, cfg):
        small = mp._prepare_cloud(pc.Cloud(xyz, mask), cfg)
        fam = registry.get_family(cfg)
        d = fam.make(pc.Cloud(xyz[::16], mask[::16]))
        return small, d
    mp._prepare_frame = prep


def patch_zero_desc():
    def prep(xyz, mask, cfg):
        small = mp._prepare_cloud(pc.Cloud(xyz, mask), cfg)
        fam = registry.get_family(cfg)
        d = fam.make(pc.Cloud(xyz, mask))
        d = jax.tree.map(lambda a: jnp.zeros_like(a), d)
        return small, d
    mp._prepare_frame = prep


def patch_no_downsample():
    def prep(xyz, mask, cfg):
        P = cfg.keyframe.points_per_keyframe
        small = pc.Cloud(xyz[:P], mask[:P])
        fam = registry.get_family(cfg)
        return small, fam.make(pc.Cloud(xyz, mask))
    mp._prepare_frame = prep


VARIANTS = {
    "base": patch_none,
    "no_desc(4k pts)": patch_no_desc,
    "zero_desc": patch_zero_desc,
    "no_downsample": patch_no_downsample,
}

compiled = {}
for tag, (name, patch) in enumerate(VARIANTS.items(), start=1):
    cfg = make_cfg(tag)
    patch()
    st = make_state(cfg)
    out = mp._replay_batches(
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
        out = mp._replay_batches(
            st, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg
        )
        _ = np.asarray(out[3])
        results[name].append((time.perf_counter() - t0) * 1e3)
patch_none()
for name, v in results.items():
    print(f"{name:18s} {min(v):7.1f} ms/chunk  {[round(x,1) for x in v]}")
