"""In-chunk interleaved A/B: mineq vs argmin NN selection (r5).

registration.SELECT_VARIANT switches the selection algorithm inside the
batched NN kernels (pallas_kernels._nn_select_batched_mineq_kernel):
equality-one-hot + count normalization instead of argmin + iota-compare.
The standalone kernel A/B measured 2.10 -> 1.58 ms/pass with bit-exact
outputs (scripts/profile_icp_kernel_variants.py); per the measurement
discipline the default only flips on an END-TO-END win inside the bench
replay chunk (same harness as profile_nn_index_ab.py, which caught the
index+gather variant LOSING in-chunk after a 2.2x kernel win).

First asserts equivalence of _matches_batched outputs on submap-scale
data, then interleaves the two variants' compiled chunk programs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/scl_slam_jax_cache_prof")

from scl_slam_tpu.config import (
    KeyframeConfig, LoopConfig, OptimizerConfig, ScanContextParams, SlamConfig,
)
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.ops import registration as reg
from scl_slam_tpu.runtime.mapper import _replay_batches
from scl_slam_tpu.runtime.state import make_state

rng = np.random.RandomState(0)

# ---- equivalence on submap-scale clouds --------------------------------
Bq, NQ, NT = 8, 1024, 8192
src = jnp.asarray(rng.randn(Bq, NQ, 3).astype(np.float32) * 20 + 100.0)
smask = jnp.ones((Bq, NQ), bool)
tgt = rng.randn(Bq, NT, 3).astype(np.float32) * 20 + 100.0
payload = jnp.asarray(np.concatenate(
    [tgt.transpose(0, 2, 1), np.ones((Bq, 1, NT), np.float32)], 1))
lanes = jnp.asarray([True] * 6 + [False] * 2)
pose = se3.identity((Bq,), dtype=jnp.float32)

outs = {}
for var in ("argmin", "mineq"):
    reg.SELECT_VARIANT = var
    moved, d2, matched, good = jax.jit(
        lambda v=var: reg._matches_batched(src, smask, payload, pose,
                                           lanes, 10.0)
    )()
    outs[var] = (np.asarray(d2), np.asarray(matched), np.asarray(good))
d_a, m_a, g_a = outs["argmin"]
d_b, m_b, g_b = outs["mineq"]
act = np.asarray(lanes)
assert np.array_equal(g_a, g_b), "good mask differs"
assert np.array_equal(d_a[act], d_b[act]), "active-lane d2 differs"
assert np.array_equal(m_a[g_a], m_b[g_b]), "matched rows differ"
print("equivalence ok: d2 and matched rows bit-equal on active/good pairs",
      flush=True)

# ---- interleaved in-chunk A/B ------------------------------------------


def make_cfg(tag):
    return SlamConfig(
        keyframe=KeyframeConfig(
            max_keyframes=4096, points_per_keyframe=4096,
            raw_points_capacity=65536,
        ),
        loop=LoopConfig(near_keyframes=25, submap_capacity=8192,
                        icp_iterations=20),
        optimizer=OptimizerConfig(
            edge_capacity=2048, gn_iters=6, cg_iters=48,
            loop_noise_scale=1.0 + 1e-9 * tag,  # distinct jit entry per variant
        ),
        scan_context=ScanContextParams(),
    )


def scan(k):
    n = 65536
    theta = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(2, 75, n)
    z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n) - 1.0
    return np.stack([r * np.cos(theta), r * np.sin(theta), z], -1).astype(
        np.float32)


B, R = 32, 6
xs = jnp.asarray(np.stack([scan(k) for k in range(R * B)]).reshape(
    R, B, 65536, 3))
masks = jnp.ones((R, B, 65536), bool)
pose_R = jnp.broadcast_to(jnp.eye(3), (R, B, 3, 3))
pose_t = jnp.asarray(np.stack(
    [[1.0 * (i * B + k), 0.0, 0.0] for i in range(R) for k in range(B)]
).reshape(R, B, 3), jnp.float32)
stamps = jnp.zeros((R, B))

CUTS = {"argmin(one-hot)": "argmin", "mineq": "mineq"}
variants = {}
for tag, (name, var) in enumerate(CUTS.items(), start=1):
    cfg = make_cfg(tag)
    reg.SELECT_VARIANT = var
    st = make_state(cfg)
    out = _replay_batches(st, jnp.array(0), se3.Pose(pose_R, pose_t),
                          xs, masks, stamps, cfg)
    jax.block_until_ready(out)
    _ = np.asarray(out[3])
    variants[name] = cfg
    print(f"compiled {name}", flush=True)

results = {k: [] for k in CUTS}
for rep in range(4):
    for name, var in CUTS.items():
        reg.SELECT_VARIANT = var  # safety only (trace-time, cached per cfg)
        cfg = variants[name]
        st = make_state(cfg)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        out = _replay_batches(st, jnp.array(0), se3.Pose(pose_R, pose_t),
                              xs, masks, stamps, cfg)
        _ = np.asarray(out[3])
        dt = time.perf_counter() - t0
        results[name].append(R * B / dt)
for name, v in results.items():
    print(f"{name}: {[round(x, 1) for x in v]} -> best {max(v):.1f} frames/s")
