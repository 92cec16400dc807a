"""Per-iteration ICP update-norm traces: converging vs spurious lanes.

Runs the perturbation workload (lanes that SHOULD converge) and a
mismatched-target workload (spurious lanes) through a scan-based ICP that
records delta per iteration, to pick stall-exit thresholds from data.
"""
import numpy as np
import jax
import jax.numpy as jnp

from scl_slam_tpu.geometry import se3
from scl_slam_tpu.ops import registration as reg
from scl_slam_tpu.ops.pointcloud import Cloud

B, NQ, NT = 16, 1024, 8192
rng = np.random.RandomState(0)

tgt = np.stack([
    rng.uniform(-40, 40, (B, NT)),
    rng.uniform(-40, 40, (B, NT)),
    np.sin(rng.uniform(-np.pi, np.pi, (B, NT)) * 3) * 2,
], -1).astype(np.float32)
src = tgt[:, :NQ].copy()
for b in range(B):
    a = 0.09 * (b % 5 - 2)
    R = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
                  [0, 0, 1]], np.float32)
    src[b] = src[b] @ R.T + np.array([0.5 + 0.1 * b, -0.3, 0.05], np.float32)

# spurious: target from a DIFFERENT surface realization
tgt_bad = np.stack([
    rng.uniform(-40, 40, (B, NT)),
    rng.uniform(-40, 40, (B, NT)),
    np.sin(rng.uniform(-np.pi, np.pi, (B, NT)) * 5 + 1.3) * 2,
], -1).astype(np.float32)


def trace(src_xyz, tgt_xyz, iters=20, coarse=False):
    f = 4 if coarse else 1
    s = jnp.asarray(src_xyz)[:, ::f]
    t = jnp.asarray(tgt_xyz)[:, ::f]
    smask = jnp.ones(s.shape[:2], bool)
    payload = jnp.concatenate(
        [jnp.swapaxes(t, -1, -2), jnp.ones((B, 1, t.shape[1]), jnp.float32)],
        axis=1,
    )

    def body(carry, _):
        R, tr = carry
        pose = se3.Pose(R, tr)
        moved, _d2, matched, good = reg._matches_batched(
            s, smask, payload, pose, jnp.ones((B,), bool), 10.0
        )
        w = good.astype(jnp.float32)
        update = reg.kabsch(moved, matched, w)
        new_pose = se3.compose(update, pose)
        nd = jnp.linalg.norm(update.t, axis=-1) + jnp.linalg.norm(
            update.R - jnp.eye(3), axis=(-2, -1)
        )
        return (new_pose.R, new_pose.t), nd

    init = se3.identity((B,), dtype=jnp.float32)
    (_, _), deltas = jax.lax.scan(body, (init.R, init.t), None, length=iters)
    return np.asarray(deltas)  # [iters, B]


for name, t in (("genuine", tgt), ("spurious", tgt_bad)):
    d = trace(src, t)
    print(f"== {name} (full res) ==")
    for b in range(0, B, 3):
        tr = " ".join(f"{x:.4f}" for x in d[:, b])
        print(f" lane {b:2d}: {tr}")
