#!/usr/bin/env python
"""Interleaved A/B: fleet phase-1 ingest as per-frame scan vs block scatter.

A = the pre-round-4 `_fleet_body` phase 1 (lax.scan carrying the whole
state through B `_ingest_prepared` steps); B = `_ingest_prepared_fleet_block`
(one batched scatter per state array). Both jitted standalone with the
vmapped prep included, interleaved within one process (the tunneled chip
drifts ±40% across processes). Own compile-cache dir so it can run while
the CPU suite holds the main cache.

    timeout 900 python scripts/profile_fleet_ingest_ab.py
"""
import os
import sys
import time
import functools

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
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.runtime.fleet import _ingest_prepared_fleet_block
from scl_slam_tpu.runtime.mapper import _ingest_prepared, _prepare_frame
from scl_slam_tpu.runtime.state import make_state

CFG = SlamConfig(
    number_of_robots=2,
    keyframe=KeyframeConfig(
        max_keyframes=2048, points_per_keyframe=4096, raw_points_capacity=65536
    ),
    loop=LoopConfig(near_keyframes=25, submap_capacity=8192, icp_iterations=20),
    optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=4, cg_iters=32),
)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def ingest_scan(state, robots, pose_R, pose_t, xyz, mask, stamps, cfg):
    K = cfg.keyframe.max_keyframes
    smalls, descs = jax.vmap(lambda x, m: _prepare_frame(x, m, cfg))(xyz, mask)

    def ing(st, inp):
        r, pR, pt, small, desc, s = inp
        st, _ = _ingest_prepared(st, r, se3.Pose(pR, pt), small, desc, s, cfg)
        pos = st.counts[r] - 1
        slot = r * K + pos
        return st, (slot, st.desc_db.index[slot], st.counts[r])

    state, (slots, q_idxs, counts_hist) = jax.lax.scan(
        ing, state, (robots, pose_R, pose_t, smalls, descs, stamps)
    )
    return state, slots


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def ingest_block(state, robots, pose_R, pose_t, xyz, mask, stamps, cfg):
    smalls, descs = jax.vmap(lambda x, m: _prepare_frame(x, m, cfg))(xyz, mask)
    state, slots, _idxs, _ch = _ingest_prepared_fleet_block(
        state, robots, se3.Pose(pose_R, pose_t), smalls, descs, stamps, cfg
    )
    return state, slots


def stage(B):
    rng = np.random.RandomState(1)
    n = 65536
    xs = []
    for k in range(B):
        theta = rng.uniform(-np.pi, np.pi, n)
        r = rng.uniform(2, 75, n)
        z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n) - 1.0
        xs.append(np.stack([r * np.cos(theta), r * np.sin(theta), z], -1))
    robots = jnp.asarray([k % 2 for k in range(B)], jnp.int32)
    xyz = jnp.asarray(np.stack(xs).astype(np.float32))
    mask = jnp.ones((B, n), bool)
    pose_R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    pose_t = jnp.asarray(
        np.stack([[2.0 * k, 4.0 * (k % 2), 0.0] for k in range(B)]), jnp.float32
    )
    stamps = jnp.zeros((B,), jnp.float32)
    return robots, pose_R, pose_t, xyz, mask, stamps


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    B, n_steps = 16, 4
    args = stage(B)

    fns = {"scan": ingest_scan, "block": ingest_block}
    # compile both
    for name, fn in fns.items():
        st = make_state(CFG)
        t0 = time.perf_counter()
        st, slots = fn(st, *args, CFG)
        _ = np.asarray(slots)
        print(f"compile {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    best = {k: 1e9 for k in fns}
    for rep in range(6):
        for name, fn in fns.items():
            st = make_state(CFG)
            jax.block_until_ready(st)
            t0 = time.perf_counter()
            slots = None
            for _ in range(n_steps):
                st, slots = fn(st, *args, CFG)
            _ = np.asarray(slots)  # host copy ends the timing chain
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
    for name, dt in best.items():
        print(
            f"{name:6s}: {dt * 1e3:7.1f} ms / {n_steps} steps of B={B} "
            f"({B * n_steps / dt:7.1f} frames/s ingest-only)",
            flush=True,
        )
    print(f"speedup block vs scan: {best['scan'] / best['block']:.2f}x")


if __name__ == "__main__":
    main()
