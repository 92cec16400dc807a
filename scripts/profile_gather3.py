"""Localize the ~5 ms of the 16-lane submap gather: time cumulative pieces.

Each stage returns a small reduction (sum) so XLA cannot dead-code the work
but output materialization stays constant across stages.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from scl_slam_tpu.config import (
    KeyframeConfig, LoopConfig, OptimizerConfig, ScanContextParams, SlamConfig,
)
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
rng = np.random.RandomState(0)
state = state._replace(
    kf_xyz=jnp.asarray(rng.randn(*state.kf_xyz.shape).astype(np.float32)),
    kf_mask=jnp.ones_like(state.kf_mask),
)
B = 16
match_slots = jnp.arange(B, dtype=jnp.int32) * 3
counts = jnp.full((B,), 200, jnp.int32)
K = cfg.keyframe.max_keyframes
near = cfg.loop.near_keyframes
W = 2 * near + 1
per = max(1, cfg.loop.submap_capacity // W)
total = state.kf_xyz.shape[0]


def onehots(st, ms, ct):
    def one(center, count):
        offs = jnp.arange(-near, near + 1)
        slots = jnp.clip(center + offs, 0, jnp.maximum(count - 1, 0))
        return (slots[:, None] == jnp.arange(total)[None, :]).astype(
            st.kf_xyz.dtype
        )
    return jax.vmap(one)(ms, ct)                        # [B, W, total]


def s1(st, ms, ct):
    oh = onehots(st, ms, ct)
    return jnp.sum(oh)


def s2(st, ms, ct):
    oh = onehots(st, ms, ct)
    prod = jnp.einsum("bwk,kp->bwp", oh, st.kf_xyz[:, : per * 3])
    return jnp.sum(prod)


def s3(st, ms, ct):
    oh = onehots(st, ms, ct)
    m = jnp.einsum("bwk,kp->bwp", oh, st.kf_mask[:, :per].astype(oh.dtype))
    return jnp.sum(m)


def s4(st, ms, ct):
    oh = onehots(st, ms, ct)
    R9 = jnp.einsum("bwk,kp->bwp", oh, st.opt_R.reshape(total, 9))
    t3 = jnp.einsum("bwk,kp->bwp", oh, st.opt_t)
    return jnp.sum(R9) + jnp.sum(t3)


def s5(st, ms, ct):  # everything, reduced
    oh = onehots(st, ms, ct)
    prod = jnp.einsum("bwk,kp->bwp", oh, st.kf_xyz[:, : per * 3])
    m = jnp.einsum("bwk,kp->bwp", oh, st.kf_mask[:, :per].astype(oh.dtype))
    R9 = jnp.einsum("bwk,kp->bwp", oh, st.opt_R.reshape(total, 9))
    t3 = jnp.einsum("bwk,kp->bwp", oh, st.opt_t)
    return jnp.sum(prod) + jnp.sum(m) + jnp.sum(R9) + jnp.sum(t3)


def timed(name, fn, reps=10):
    f = jax.jit(fn)
    out = f(state, match_slots, counts)
    jax.block_until_ready(out)
    _ = np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(state, match_slots, counts)
    _ = np.asarray(out).ravel()[:1]
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")


for trial in range(2):
    timed("s1 onehot build only", s1)
    timed("s2 + xyz prefix matmul", s2)
    timed("s3 onehot + mask matmul", s3)
    timed("s4 onehot + R/t matmuls", s4)
    timed("s5 all matmuls", s5)
