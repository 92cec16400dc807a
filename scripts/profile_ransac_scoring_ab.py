"""Interleaved A/B: fused Pallas RANSAC scoring vs the XLA slab (r5).

registration.RANSAC_FUSED_SCORING routes hypothesis scoring through
pallas_kernels.ransac_counts_batched_pallas (register-resident vector
passes) instead of the lax.map [B, Hc, N] HBM slab the roofline measured
at ~6.3 us/hypothesis (docs/roofline.md). Two checks:

1. EQUIVALENCE of full ransac_align_batched results (success, ratio,
   pose) between the two paths at the fleet shapes on chip.
2. Interleaved fleet-step A/B (bench.py::bench_fleet workload — mixed
   2-robot batches where every frame cross-matches, the all-verify worst
   case the r4 fleet gap was attributed to).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/scl_slam_jax_cache_prof")

from scl_slam_tpu.config import (
    KeyframeConfig, LoopConfig, OptimizerConfig, SlamConfig,
)
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.ops import registration as reg
from scl_slam_tpu.ops.pointcloud import Cloud
from scl_slam_tpu.runtime.fleet import _fleet_step
from scl_slam_tpu.runtime.state import make_state

rng = np.random.RandomState(0)

# ---- 1: result equivalence at fleet shapes -----------------------------
B, N, M = 16, 1024, 8192
base = rng.uniform(-40, 40, (B, M, 3)).astype(np.float32)
source = Cloud(jnp.asarray(base[:, :N] + rng.normal(0, 0.05, (B, N, 3))
                           .astype(np.float32)), jnp.ones((B, N), bool))
target = Cloud(jnp.asarray(base), jnp.ones((B, M), bool))
active = jnp.asarray([True] * 14 + [False] * 2)
key = jax.random.PRNGKey(3)

res = {}
for flag in (False, True):
    reg.RANSAC_FUSED_SCORING = flag
    r = jax.jit(
        lambda f=flag: reg.ransac_align_batched(
            source, target, key, active, num_hypotheses=256,
            inlier_thresh=0.25, min_inlier_ratio=0.45,
        )
    )()
    res[flag] = jax.tree_util.tree_map(np.asarray, r)
a, b = res[False], res[True]
assert np.array_equal(a.success, b.success), (a.success, b.success)
np.testing.assert_allclose(a.inlier_ratio, b.inlier_ratio, atol=1e-6)
np.testing.assert_allclose(a.pose.t, b.pose.t, atol=1e-4)
print(f"equivalence ok: success equal ({int(a.success.sum())}/16 lanes), "
      f"ratio max|diff| {np.max(np.abs(a.inlier_ratio - b.inlier_ratio)):.1e}",
      flush=True)

# ---- 2: interleaved fleet-step A/B -------------------------------------
n_pts = 65536


def make_cfg(tag):
    return SlamConfig(
        number_of_robots=2,
        keyframe=KeyframeConfig(
            max_keyframes=2048, points_per_keyframe=4096,
            raw_points_capacity=n_pts,
        ),
        loop=LoopConfig(
            near_keyframes=25, submap_capacity=8192, icp_iterations=20,
        ),
        optimizer=OptimizerConfig(
            edge_capacity=2048, gn_iters=4, cg_iters=32,
            loop_noise_scale=1.0 + 1e-9 * tag,  # distinct jit entry per variant
        ),
    )


def scan(k):
    theta = rng.uniform(-np.pi, np.pi, n_pts)
    r = rng.uniform(2, 75, n_pts)
    z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n_pts) - 1.0
    return np.stack([r * np.cos(theta), r * np.sin(theta), z], -1).astype(
        np.float32)


Bf, n_steps = 16, 4
robots = jnp.asarray([k % 2 for k in range(Bf)], jnp.int32)
xs = jnp.asarray(np.stack([scan(k) for k in range(Bf)]))
pose_ts = [
    jnp.asarray(np.stack(
        [[2.0 * (s * Bf + k), 4.0 * (k % 2), 0.0] for k in range(Bf)]
    ), jnp.float32)
    for s in range(n_steps)
]
masks = jnp.ones((Bf, n_pts), bool)
pose_R = jnp.broadcast_to(jnp.eye(3), (Bf, 3, 3))
stamps = jnp.zeros((Bf,), jnp.float32)
key0 = jax.random.PRNGKey(0)

CUTS = {"xla-slab": False, "fused-pallas": True}
variants = {}
for tag, (name, flag) in enumerate(CUTS.items(), start=1):
    cfg = make_cfg(tag)
    reg.RANSAC_FUSED_SCORING = flag
    st = make_state(cfg)
    out = _fleet_step(st, key0, robots, pose_R, pose_ts[0], xs, masks,
                      stamps, cfg)
    jax.block_until_ready(out[0].counts)
    _ = np.asarray(out[2][0])
    variants[name] = cfg
    print(f"compiled {name}", flush=True)

results = {k: [] for k in CUTS}
for rep in range(4):
    for name, flag in CUTS.items():
        reg.RANSAC_FUSED_SCORING = flag
        cfg = variants[name]
        st = make_state(cfg)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        k = key0
        outs = None
        for s in range(n_steps):
            st, k, outs = _fleet_step(st, k, robots, pose_R, pose_ts[s],
                                      xs, masks, stamps, cfg)
        _ = np.asarray(outs[0])
        dt = time.perf_counter() - t0
        results[name].append(Bf * n_steps / dt)
for name, v in results.items():
    print(f"{name}: {[round(x, 1) for x in v]} -> best {max(v):.1f} frames/s")
