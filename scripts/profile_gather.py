"""Micro-profile of the phase-2 submap gather pieces on the real chip.

phase2a (submap gathers only) measured 12.4 ms/16-lane batch while moving
only ~tens of MB — find which piece is pathological.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from scl_slam_tpu.config import (
    KeyframeConfig, LoopConfig, OptimizerConfig, ScanContextParams, SlamConfig,
)
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.runtime import mapper as M
from scl_slam_tpu.runtime.state import make_state

cfg = SlamConfig(
    keyframe=KeyframeConfig(
        max_keyframes=4096, points_per_keyframe=4096, raw_points_capacity=65536,
    ),
    loop=LoopConfig(near_keyframes=25, submap_capacity=8192, icp_iterations=20),
    optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=6, cg_iters=48),
    scan_context=ScanContextParams(),
)
state = make_state(cfg)
B = 16
robot = jnp.array(0)
slots = jnp.arange(B, dtype=jnp.int32) * 7
match_slots = jnp.arange(B, dtype=jnp.int32) * 3
yaws = jnp.zeros(B)
counts = jnp.full((B,), 200, jnp.int32)


def timed(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    _ = np.asarray(leaf).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    _ = np.asarray(leaf).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:36s} {dt*1e3:8.2f} ms")
    return out


near = cfg.loop.near_keyframes
W = 2 * near + 1
per = cfg.loop.submap_capacity // W
K = cfg.keyframe.max_keyframes


# (a) row gather only: [B, W] slot rows, 480-f32 prefix each
def g_rows(st, ms):
    def one(center):
        offs = jnp.arange(-near, near + 1)
        sl = jnp.clip(center + offs, 0, K - 1)
        return st.kf_xyz[sl, : per * 3], st.kf_mask[sl, :per]
    return jax.vmap(one)(ms)

xyzr, maskr = timed("a: row gathers only", jax.jit(g_rows), state, match_slots)


# (b) + reshape to points + per-keyframe SE3 transform
def g_tf(st, ms):
    def one(center):
        offs = jnp.arange(-near, near + 1)
        sl = jnp.clip(center + offs, 0, K - 1)
        xyz = st.kf_xyz[sl, : per * 3].reshape(-1, per, 3)
        poses = se3.Pose(st.opt_R[sl], st.opt_t[sl])
        return se3.transform_points(poses, xyz)
    return jax.vmap(one)(ms)

timed("b: gather + transform", jax.jit(g_tf), state, match_slots)


# (c) full _gather_submap vmapped
def g_full(st, ms, ct):
    return jax.vmap(
        lambda s, c: M._gather_submap(st, s, robot, cfg, count=c)
    )(ms, ct)

timed("c: full _gather_submap", jax.jit(g_full), state, match_slots, counts)


# (d) full _intra_verify_inputs vmapped
def g_inputs(st, sl, ms, yw, ct):
    return jax.vmap(
        lambda a, b, c, d: M._intra_verify_inputs(st, a, b, c, robot, cfg, count=d)
    )(sl, ms, yw, ct)

timed("d: full _intra_verify_inputs", jax.jit(g_inputs),
      state, slots, match_slots, yaws, counts)
