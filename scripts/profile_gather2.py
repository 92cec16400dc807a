"""A/B of _gather_submap row-selection variants on the real chip.

Current form matmuls the one-hot against three STRIDE-3 column slices of
kf_xyz [K, P*3] (plus mask/R/t). Hypothesis: XLA fuses the strided slice
into the matmul RHS and the MXU feed degenerates. Variant: ONE matmul
against the contiguous [:, :per*3] prefix, then de-interleave the small
[W, per*3] product host of lanes (816 x 480 — trivial VPU work).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from scl_slam_tpu.config import (
    KeyframeConfig, LoopConfig, OptimizerConfig, ScanContextParams, SlamConfig,
)
from scl_slam_tpu.runtime import mapper as M
from scl_slam_tpu.runtime.state import make_state
from scl_slam_tpu.ops import pointcloud as pc

cfg = SlamConfig(
    keyframe=KeyframeConfig(
        max_keyframes=4096, points_per_keyframe=4096, raw_points_capacity=65536,
    ),
    loop=LoopConfig(near_keyframes=25, submap_capacity=8192, icp_iterations=20),
    optimizer=OptimizerConfig(edge_capacity=2048, gn_iters=6, cg_iters=48),
    scan_context=ScanContextParams(),
)
state = make_state(cfg)
# fill kf arrays with junk so the gather reads real data
rng = np.random.RandomState(0)
state = state._replace(
    kf_xyz=jnp.asarray(rng.randn(*state.kf_xyz.shape).astype(np.float32)),
    kf_mask=jnp.ones_like(state.kf_mask),
)
B = 16
robot = jnp.array(0)
match_slots = jnp.arange(B, dtype=jnp.int32) * 3
counts = jnp.full((B,), 200, jnp.int32)

K = cfg.keyframe.max_keyframes
near = cfg.loop.near_keyframes
W = 2 * near + 1
per = max(1, cfg.loop.submap_capacity // W)


def gather_contig(st, center_slot, count):
    lo = 0
    offs = jnp.arange(-near, near + 1)
    slots = jnp.clip(center_slot + offs, lo, lo + jnp.maximum(count - 1, 0))
    total = st.kf_xyz.shape[0]
    onehot = (slots[:, None] == jnp.arange(total)[None, :]).astype(
        st.kf_xyz.dtype
    )
    prod = onehot @ st.kf_xyz[:, : per * 3]              # [W, per*3] contiguous
    xs = prod[:, 0::3]
    ys = prod[:, 1::3]
    zs = prod[:, 2::3]
    mask = (onehot @ st.kf_mask[:, :per].astype(onehot.dtype)) > 0.5
    R9 = (onehot @ st.opt_R.reshape(total, 9)).reshape(W, 3, 3)
    t3 = onehot @ st.opt_t

    def row(i):
        return (
            R9[:, i, 0, None] * xs
            + R9[:, i, 1, None] * ys
            + R9[:, i, 2, None] * zs
            + t3[:, i, None]
        )

    flat = jnp.stack([row(0), row(1), row(2)], axis=-1).reshape(-1, 3)
    flat_mask = mask.reshape(-1)
    pad = cfg.loop.submap_capacity - flat.shape[0]
    if pad > 0:
        flat = jnp.concatenate(
            [flat, jnp.full((pad, 3), pc.PAD_VALUE, flat.dtype)]
        )
        flat_mask = jnp.concatenate([flat_mask, jnp.zeros(pad, bool)])
    return pc.Cloud(
        jnp.where(flat_mask[:, None], flat, pc.PAD_VALUE), flat_mask
    )


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


cur = jax.jit(lambda st, ms, ct: jax.vmap(
    lambda s, c: M._gather_submap(st, s, robot, cfg, count=c)
)(ms, ct))
new = jax.jit(lambda st, ms, ct: jax.vmap(
    lambda s, c: gather_contig(st, s, c)
)(ms, ct))

o1 = cur(state, match_slots, counts)
o2 = new(state, match_slots, counts)
print("agree:", bool(jnp.all(o1.xyz == o2.xyz)), bool(jnp.all(o1.mask == o2.mask)))

for trial in range(3):
    t1 = timed("current (stride-3 slices x3)", cur, state, match_slots, counts)
    t2 = timed("contiguous matmul + small dei", new, state, match_slots, counts)
