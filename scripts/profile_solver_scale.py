"""Pose-graph solver convergence at 10^5 poses on TPU.

Synthetic city-scale problem: a noisy 131072-pose odometry chain (drift)
closed by long-range loop factors every `loop_every` frames (ground truth: a
loop of circumference matching the trajectory). Compares block-Jacobi-only
PCG against the two-level and 3-level BPX preconditioners at equal GN/CG
budgets: chi2 after each GN iteration + wall time.
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

    from scl_slam_tpu.geometry import se3, so3
    from scl_slam_tpu.graph import factors as F
    from scl_slam_tpu.graph.solver import solve

    N = 1 << 17          # 131072 poses
    loop_every = 512     # loop closure to pose k - loop_every (revisit lane)
    rng = np.random.RandomState(0)

    # ground truth: circular trajectory, radius chosen so the loop closes
    theta = np.linspace(0, 2 * np.pi, N, endpoint=False)
    radius = 2000.0
    gt_t = np.stack(
        [radius * np.cos(theta), radius * np.sin(theta), np.zeros(N)], -1
    ).astype(np.float32)
    yaw = theta + np.pi / 2
    cy, sy = np.cos(yaw), np.sin(yaw)
    gt_R = np.zeros((N, 3, 3), np.float32)
    gt_R[:, 0, 0] = cy; gt_R[:, 0, 1] = -sy
    gt_R[:, 1, 0] = sy; gt_R[:, 1, 1] = cy
    gt_R[:, 2, 2] = 1.0

    gt = se3.Pose(jnp.asarray(gt_R), jnp.asarray(gt_t))

    # odometry measurements: true between + noise (the drift source)
    def between_np(Ra, ta, Rb, tb):
        Rab = Ra.transpose(0, 2, 1) @ Rb
        tab = np.einsum("nij,nj->ni", Ra.transpose(0, 2, 1), tb - ta)
        return Rab, tab

    Rab, tab = between_np(gt_R[:-1], gt_t[:-1], gt_R[1:], gt_t[1:])
    tab = tab + rng.normal(0, 0.02, tab.shape).astype(np.float32)

    # loop measurements: exact true between for pairs (k, k-loop_every)
    li = np.arange(loop_every, N, loop_every)
    lj = li - loop_every
    Rl, tl = between_np(gt_R[lj], gt_t[lj], gt_R[li], gt_t[li])

    E = (N - 1) + len(li)
    Ecap = 1 << 18
    g = F.make_graph(Ecap, prior_capacity=8)
    odom_si = [1.0 / 0.05] * 6
    loop_si = [1.0 / 0.1] * 6

    # vectorized graph fill (F.add_between per edge would be slow in python)
    i_idx = np.zeros(Ecap, np.int32)
    j_idx = np.zeros(Ecap, np.int32)
    z_R = np.tile(np.eye(3, dtype=np.float32), (Ecap, 1, 1))
    z_t = np.zeros((Ecap, 3), np.float32)
    si = np.zeros((Ecap, 6), np.float32)
    i_idx[:E] = np.concatenate([np.arange(N - 1), lj])
    j_idx[:E] = np.concatenate([np.arange(1, N), li])
    z_R[:E] = np.concatenate([Rab, Rl])
    z_t[:E] = np.concatenate([tab, tl])
    si[:E] = np.concatenate(
        [np.tile(odom_si, (N - 1, 1)), np.tile(loop_si, (len(li), 1))]
    )
    g = g._replace(
        i=jnp.asarray(i_idx),
        j=jnp.asarray(j_idx),
        z=se3.Pose(jnp.asarray(z_R), jnp.asarray(z_t)),
        sqrt_info=jnp.asarray(si),
        num_edges=jnp.asarray(E, jnp.int32),
    )
    g = F.add_prior(g, 0, se3.Pose(gt.R[0], gt.t[0]), [1.0 / 0.01] * 6)

    # initial estimate: integrate noisy odometry (drifts visibly)
    init_R = [gt_R[0]]
    init_t = [gt_t[0]]
    for k in range(N - 1):
        init_R.append(init_R[-1] @ Rab[k])
        init_t.append(init_t[-1] + init_R[-2] @ tab[k])
    init = se3.Pose(
        jnp.asarray(np.stack(init_R)), jnp.asarray(np.stack(init_t))
    )
    drift = float(np.linalg.norm(np.stack(init_t) - gt_t, axis=1).max())
    print(f"N={N} E={E} loops={len(li)} max drift of init: {drift:.1f} m")

    for name, stride, levels in (
        ("block-jacobi", 0, 1),
        ("two-level s64", 64, 1),
        ("bpx s16 L3", 16, 3),
    ):
        t0 = time.perf_counter()
        res = solve(
            g, init, gn_iters=4, cg_iters=64, damping=1e-8,
            coarse_stride=stride, coarse_levels=levels,
        )
        jax.block_until_ready(res)
        err = np.asarray(res.poses.t) - gt_t
        ate = float(np.sqrt((np.linalg.norm(err, axis=1) ** 2).mean()))
        dt = time.perf_counter() - t0
        chis = " ".join(f"{c:.3g}" for c in np.asarray(res.chi2_history))
        print(f"{name:>14}: chi2 {chis}  ATE {ate:.3f} m  ({dt:.1f}s incl compile)")


if __name__ == "__main__":
    main()
