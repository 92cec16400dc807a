"""Shared problem builder for the scaling/solve profiling scripts.

NO side effects at import (profile_scaling_mesh.py forces CPU + a virtual
mesh at module level, which silently re-platformed profile_solve_tpu.py's
chip run when it imported helpers from there — measured 'backend: cpu').
"""
from __future__ import annotations

import numpy as np

GN_ITERS, CG_ITERS = 4, 32


def ring_graph(n_poses: int, edge_cap: int, n_loops: int, seed: int = 0):
    """Noisy ring odometry + random loop closures (the drain's shape)."""
    import jax
    import jax.numpy as jnp

    from scl_slam_tpu.geometry import se3, so3
    from scl_slam_tpu.graph import factors as F

    rng = np.random.RandomState(seed)
    ang = np.linspace(0, 2 * np.pi, n_poses, endpoint=False)
    gt_R = so3.from_euler(
        jnp.asarray(np.stack([np.zeros(n_poses)] * 2 + [ang + np.pi / 2], -1),
                    jnp.float32))
    gt_t = jnp.asarray(
        np.stack([40 * np.cos(ang), 40 * np.sin(ang), np.zeros(n_poses)], -1),
        jnp.float32)
    gt = se3.Pose(gt_R, gt_t)
    g = F.make_graph(edge_cap, 4)
    g = F.add_prior(g, 0, se3.index(gt, 0), [1e3] * 6)
    sq = [10.0] * 3 + [20.0] * 3
    for k in range(n_poses - 1):
        z = se3.between(se3.index(gt, k), se3.index(gt, k + 1))
        zn = se3.compose(z, se3.exp(jnp.asarray(
            rng.randn(6) * np.array([0.002] * 3 + [0.02] * 3), jnp.float32)))
        g = F.add_between(g, k, k + 1, zn, sq)
    for _ in range(n_loops):
        i = int(rng.randint(0, n_poses - 1))
        j = int((i + n_poses // 2) % n_poses)
        z = se3.between(se3.index(gt, i), se3.index(gt, j))
        g = F.add_between(g, min(i, j), max(i, j), z, sq)
    noisy = [se3.index(gt, 0)]
    for k in range(n_poses - 1):
        zn = se3.index(g.z, k)
        noisy.append(se3.compose(noisy[-1], zn))
    init = se3.Pose(jnp.stack([p.R for p in noisy]),
                    jnp.stack([p.t for p in noisy]))
    return g, init
