"""Per-part TPU timing of one ICP iteration: NN vs Kabsch vs compose/log.

Each part runs in a 20-step dependency-chained scan; marginal cost per step
is separated from program dispatch via two scan lengths (5 vs 20), as in
profile_nn_tiles.py.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from scl_slam_tpu.geometry import se3
    from scl_slam_tpu.ops import registration as reg

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-50, 50, (1024, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(-50, 50, (8192, 3)).astype(np.float32))
    w = jnp.ones(1024, jnp.float32)

    def chain(body, n):
        @jax.jit
        def run(q0):
            def one(qc, _):
                out = body(qc)
                return qc + 1e-9 * out, out[0]
            qf, outs = jax.lax.scan(one, q0, None, length=n)
            return qf[0, 0], outs
        return run

    def marginal(body):
        ts = {}
        for n in (5, 20):
            fn = chain(body, n)
            out = fn(q)
            jax.block_until_ready(out)
            _ = np.asarray(out[0])
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(q)
            _ = np.asarray(out[0])
            ts[n] = (time.perf_counter() - t0) / 10
        return (ts[20] - ts[5]) / 15

    def nn_part(qc):
        d2, idx = reg.nearest_neighbors(qc, t)
        return d2[:, None] * jnp.ones((1, 3), jnp.float32)

    def kabsch_part(qc):
        pose = reg.kabsch(qc, q + 0.01, w)
        return pose.t[None, :] * jnp.ones((1024, 1), jnp.float32)

    def log_part(qc):
        pose = se3.Pose(jnp.eye(3) + 1e-8 * qc[0, 0], qc[0])
        d = jnp.linalg.norm(se3.log(se3.Pose(pose.R, pose.t)))
        return d * jnp.ones((1024, 3), jnp.float32)

    def full_iter(qc):
        d2, idx = reg.nearest_neighbors(qc, t)
        matched = t[idx]
        good = d2 < 100.0
        update = reg.kabsch(qc, matched, good.astype(jnp.float32))
        delta = jnp.linalg.norm(se3.log(update))
        return se3.transform_points(update, qc) + delta

    for name, body in (
        ("nn", nn_part),
        ("kabsch", kabsch_part),
        ("se3.log", log_part),
        ("full icp iter", full_iter),
    ):
        print(f"{name:>14}: {marginal(body) * 1e6:8.2f} us/step")


if __name__ == "__main__":
    main()
