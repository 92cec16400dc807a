"""Per-phase timing of the macro-batch keyframe step on the real chip.

Phases of runtime/mapper._ingest_and_detect_batch (bench.py workload, B=16):
  0. vmapped frame prep (downsample + descriptor build)
  1. scan ingest + retrieval
  2. batched multi-lane ICP verification
  3. scan enqueue

Each phase is timed as its own jitted program on identical inputs; the sum
will exceed the fused step (intermediate materialization) but the RATIOS show
where the fused time goes. Ends timing with a host copy (CLAUDE.md timing
gotcha).
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
from scl_slam_tpu.ops import pointcloud as pc
from scl_slam_tpu.descriptors import registry

cfg = SlamConfig(
    keyframe=KeyframeConfig(
        max_keyframes=4096, points_per_keyframe=4096, raw_points_capacity=65536,
    ),
    loop=LoopConfig(near_keyframes=25, submap_capacity=8192, icp_iterations=20),
    optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=6, cg_iters=48),
    scan_context=ScanContextParams(),
)

state = make_state(cfg)
rng = np.random.RandomState(0)
B = 16
n = 65536
theta = rng.uniform(-np.pi, np.pi, (B, n))
r = rng.uniform(2, 75, (B, n))
z = np.sin(theta * 3) * 2 + rng.normal(0, 0.4, (B, n)) - 1.0
xs = jnp.asarray(
    np.stack([r * np.cos(theta), r * np.sin(theta), z], -1), jnp.float32
)
masks = jnp.ones((B, n), bool)
pose_R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
pose_t = jnp.stack([jnp.array([1.0 * k, 0.0, 0.0]) for k in range(B)])
stamps = jnp.zeros(B)
robot = jnp.array(0)


def timed(name, fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    # host copy of one small leaf to force real completion
    leaf = jax.tree_util.tree_leaves(out)[-1]
    _ = np.asarray(leaf).ravel()[:1]
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    _ = np.asarray(leaf).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return out


# full fused step
fused = jax.jit(M._ingest_and_detect_batch, static_argnames=("cfg",))
timed("FULL fused batch step", lambda: fused(
    state, robot, se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg))

# phase 0: vmapped prep
prep = jax.jit(
    lambda x, m: jax.vmap(lambda a, b: M._prepare_frame(a, b, cfg))(x, m)
)
smalls, descs = timed("phase0 vmap prep", prep, xs, masks)

# phase 1: block ingest + batched retrieval (current vectorized path)
def p1(st, smalls, descs):
    st, slots, q_idxs = M._ingest_prepared_block(
        st, robot, se3.Pose(pose_R, pose_t), smalls, descs, stamps, cfg)
    fam = registry.get_family(cfg)

    def retrieve(desc, q_idx, slot):
        match = fam.query(st.desc_db, desc, robot, q_idx, mode="intra")
        attempt = match.found & (st.loop_target[slot] < 0)
        return match.index, match.yaw, attempt, jnp.where(
            attempt, match.db_pos, slot)

    m_idxs, yaws, attempts, match_slots = jax.vmap(retrieve)(
        descs, q_idxs, slots)
    return st, (slots, q_idxs, m_idxs, yaws, attempts, match_slots)

p1j = jax.jit(p1)
st1, retr = timed("phase1 block ingest+retrieve", p1j, state, smalls, descs)

# phase 1 split: block ingest only
def p1a(st, smalls, descs):
    st, slots, q_idxs = M._ingest_prepared_block(
        st, robot, se3.Pose(pose_R, pose_t), smalls, descs, stamps, cfg)
    return st, slots
timed("phase1a block ingest only", jax.jit(p1a), state, smalls, descs)

# phase 2: gather + batched ICP on all-active lanes
slots, q_idxs, m_idxs, yaws, attempts, match_slots = retr
counts_hist = st1.counts[robot] - B + 1 + jnp.arange(B, dtype=jnp.int32)

def p2(st, slots, match_slots, yaws, counts_hist):
    cur, tgt, inits = jax.vmap(
        lambda sl, ms, yw, ct: M._intra_verify_inputs(
            st, sl, ms, yw, robot, cfg, count=ct)
    )(slots, match_slots, yaws, counts_hist)
    from scl_slam_tpu.ops import registration as reg
    src_world = pc.transform(cur, inits.R, inits.t)
    res = reg.icp_batched(
        src_world, tgt, se3.identity((B,), dtype=st.opt_t.dtype),
        jnp.ones((B,), bool),
        max_iters=cfg.loop.icp_iterations,
        max_corr_dist=cfg.loop.icp_max_corr_dist, tol=cfg.loop.icp_tol,
        coarse_factor=cfg.loop.icp_coarse_factor)
    return res.fitness

timed("phase2 gather+ICP (all active)", jax.jit(p2),
      st1, slots, match_slots, yaws, counts_hist)

# gather only
def p2g(st, slots, match_slots, yaws, counts_hist):
    cur, tgt, inits = jax.vmap(
        lambda sl, ms, yw, ct: M._intra_verify_inputs(
            st, sl, ms, yw, robot, cfg, count=ct)
    )(slots, match_slots, yaws, counts_hist)
    return tgt.xyz
timed("phase2a submap gathers only", jax.jit(p2g),
      st1, slots, match_slots, yaws, counts_hist)
