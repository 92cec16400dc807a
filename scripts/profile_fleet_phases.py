#!/usr/bin/env python
"""Attribute fleet-step time: intra-ICP vs inter-RANSAC vs the rest.

Mirrors bench.py::bench_fleet exactly, then re-times with knob variants
(interleaved within one process — the tunneled chip drifts ±40% across
processes). Uses its OWN compile-cache dir so it can run while the CPU
test suite holds the main cache.

    timeout 1500 python scripts/profile_fleet_phases.py
"""
import os
import sys
import time
import dataclasses

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


def make_cfg(**loop_kw):
    loop = dict(near_keyframes=25, submap_capacity=8192, icp_iterations=20)
    loop.update(loop_kw)
    return SlamConfig(
        number_of_robots=2,
        keyframe=KeyframeConfig(
            max_keyframes=2048,
            points_per_keyframe=4096,
            raw_points_capacity=65536,
        ),
        loop=LoopConfig(**loop),
        optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=4, cg_iters=32),
    )


def stage(B, n_steps):
    rng = np.random.RandomState(1)

    def scan(k):
        n = 65536
        theta = rng.uniform(-np.pi, np.pi, n)
        r = rng.uniform(2, 75, n)
        z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n) - 1.0
        return np.stack(
            [r * np.cos(theta), r * np.sin(theta), z], -1
        ).astype(np.float32)

    eye = jnp.eye(3)
    robots = jnp.asarray([k % 2 for k in range(B)], jnp.int32)
    xs = jnp.asarray(np.stack([scan(k) for k in range(B)]))
    pose_ts = [
        jnp.asarray(
            np.stack([[2.0 * (s * B + k), 4.0 * (k % 2), 0.0] for k in range(B)]),
            jnp.float32,
        )
        for s in range(n_steps)
    ]
    masks = jnp.ones((B, 65536), bool)
    pose_R = jnp.broadcast_to(eye, (B, 3, 3))
    stamps = jnp.zeros((B,), jnp.float32)
    return robots, pose_R, pose_ts, xs, masks, stamps


def run_variant(name, cfg, B=16, n_steps=4, reps=3):
    robots, pose_R, pose_ts, xs, masks, stamps = stage(B, n_steps)
    key = jax.random.PRNGKey(0)
    state = make_state(cfg)
    t0 = time.perf_counter()
    out = _fleet_step(state, key, robots, pose_R, pose_ts[0], xs, masks, stamps, cfg)
    jax.block_until_ready(out[0].counts)
    _ = np.asarray(out[2][0])
    compile_s = time.perf_counter() - t0

    best = 1e9
    n_loops = 0
    for _ in range(reps):
        state = make_state(cfg)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        k = key
        outs = None
        for s in range(n_steps):
            state, k, outs = _fleet_step(
                state, k, robots, pose_R, pose_ts[s % len(pose_ts)],
                xs, masks, stamps, cfg,
            )
        _ = np.asarray(outs[0])
        dt = time.perf_counter() - t0
        if dt < best:
            best = dt
        o = [np.asarray(x) for x in outs]
        n_loops = int(o[0].sum()) + int(o[3].sum())
    fps = B * n_steps / best
    print(
        f"{name:28s} B={B} steps={n_steps}: {best*1e3:8.1f} ms "
        f"({fps:7.1f} frames/s)  loops={n_loops}  [compile {compile_s:.0f}s]",
        flush=True,
    )
    return best


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    base = make_cfg()
    t_full = run_variant("full (inter on, icp20)", base)
    no_inter = dataclasses.replace(
        base, loop=dataclasses.replace(base.loop, inter_enabled=False)
    )
    t_noint = run_variant("inter disabled", no_inter)
    no_both = dataclasses.replace(
        base,
        loop=dataclasses.replace(
            base.loop, inter_enabled=False, intra_enabled=False
        ),
    )
    t_nb = run_variant("intra+inter disabled", no_both)
    print(
        f"\nattribution (of {t_full*1e3:.0f} ms): "
        f"inter-RANSAC ~{(t_full - t_noint)*1e3:.0f} ms, "
        f"intra-ICP ~{(t_noint - t_nb)*1e3:.0f} ms, "
        f"prep+ingest ~{t_nb*1e3:.0f} ms"
    )


if __name__ == "__main__":
    main()
