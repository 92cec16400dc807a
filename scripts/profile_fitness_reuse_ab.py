"""Within-process interleaved A/B: icp_reuse_final_fitness on vs off.

bench.py's headline workload (_replay_batches, 6x32-frame scanned chunks)
with the only difference being whether verification fitness comes from the
final ICP iteration's statistics (reuse, saves one full NN pass per
verification) or a separate exact pass at the converged pose.

    timeout 1500 python scripts/profile_fitness_reuse_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/scl_slam_jax_cache_prof")

import jax.numpy as jnp

from scl_slam_tpu.config import (
    KeyframeConfig, LoopConfig, OptimizerConfig, ScanContextParams, SlamConfig,
)
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.runtime.mapper import _replay_batches
from scl_slam_tpu.runtime.state import make_state


def make_cfg(reuse):
    return SlamConfig(
        keyframe=KeyframeConfig(
            max_keyframes=4096, points_per_keyframe=4096,
            raw_points_capacity=65536,
        ),
        loop=LoopConfig(near_keyframes=25, submap_capacity=8192,
                        icp_iterations=20, icp_reuse_final_fitness=reuse),
        optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=6, cg_iters=48),
        scan_context=ScanContextParams(),
    )


rng = np.random.RandomState(0)


def scan(k):
    n = 65536
    theta = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(2, 75, n)
    z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n) - 1.0
    return np.stack([r * np.cos(theta), r * np.sin(theta), z], -1).astype(
        np.float32
    )


B, R = 32, 6
xs = jnp.asarray(np.stack([scan(k) for k in range(R * B)]).reshape(R, B, 65536, 3))
masks = jnp.ones((R, B, 65536), bool)
pose_R = jnp.broadcast_to(jnp.eye(3), (R, B, 3, 3))
pose_t = jnp.asarray(
    np.stack([[1.0 * (i * B + k), 0.0, 0.0] for i in range(R) for k in range(B)]
             ).reshape(R, B, 3), jnp.float32)
stamps = jnp.zeros((R, B))


def run_once(cfg):
    def chunk(state):
        return _replay_batches(
            state, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks,
            stamps, cfg,
        )
    out = chunk(make_state(cfg))
    jax.block_until_ready(out)
    _ = np.asarray(out[3])
    n_rep = 3
    states = [make_state(cfg) for _ in range(n_rep)]
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    outs = [chunk(states[i]) for i in range(n_rep)]
    fits = [np.asarray(o[3]) for o in outs]
    dt = time.perf_counter() - t0
    return n_rep * R * B / dt, fits[0]


cfgs = {"reuse": make_cfg(True), "exact": make_cfg(False)}
res = {k: [] for k in cfgs}
fit_by = {}
for trial in range(3):
    for name, cfg in cfgs.items():
        fps, fits = run_once(cfg)
        res[name].append(fps)
        fit_by[name] = fits
        print(f"trial {trial} {name}: {fps:8.1f} frames/s", flush=True)

for name in cfgs:
    print(f"{name}: median {np.median(res[name]):.1f} frames/s  "
          f"{[round(x) for x in res[name]]}")
a, b = fit_by["reuse"], fit_by["exact"]
both = np.isfinite(a) & np.isfinite(b)
GATE = 0.3
if both.any():
    print(f"fitness agreement on {both.sum()} verified frames: "
          f"max |reuse-exact| = {np.abs(a[both]-b[both]).max():.2e}")
    # the reuse contract: value changes are only allowed FAR ABOVE the
    # accept gate (stall/hopeless-frozen lanes); gate decisions must agree
    near = both & ((a < 3 * GATE) | (b < 3 * GATE))
    if near.any():
        print(f"near-gate frames ({near.sum()}): max |diff| = "
              f"{np.abs(a[near]-b[near]).max():.2e}")
    dis = both & ((a < GATE) != (b < GATE))
    print(f"gate-decision disagreements: {dis.sum()}"
          + (f"  (reuse={a[dis][:5]}, exact={b[dis][:5]})" if dis.any() else ""))
