import jax
import jax.numpy as jnp
import numpy as np

from scl_slam_tpu.geometry import se3, so3
from scl_slam_tpu.graph import factors as F
from scl_slam_tpu.graph import solver


def circle_trajectory(n, radius=10.0):
    """Ground-truth poses around a circle, heading tangent."""
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    poses = []
    for a in angles:
        t = jnp.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        yaw = a + np.pi / 2
        R = so3.from_euler(jnp.array([0.0, 0.0, yaw]))
        poses.append(se3.Pose(R, t))
    return se3.stack(poses)


TIGHT_PRIOR = [1.0 / 1e-3] * 6  # tests anchor pose 0 (the reference's default
# prior is nearly gauge-free: trans variance 1e8, distributedMapping.h:517 —
# fine for mapping, but absolute-error assertions need a fixed gauge)


def noisy_odometry_graph(gt, key, sigma_rot=0.01, sigma_trans=0.05, cap=128):
    """Chain graph with noisy relative measurements + prior on pose 0."""
    n = gt.t.shape[0]
    g = F.make_graph(cap)
    g = F.add_prior(g, 0, se3.index(gt, 0), TIGHT_PRIOR)
    sqrt_info = [1.0 / sigma_rot] * 3 + [1.0 / sigma_trans] * 3
    keys = jax.random.split(key, n)
    for k in range(n - 1):
        z = se3.between(se3.index(gt, k), se3.index(gt, k + 1))
        noise = se3.exp(
            jax.random.normal(keys[k], (6,))
            * jnp.array([sigma_rot] * 3 + [sigma_trans] * 3)
        )
        g = F.add_between(g, k, k + 1, se3.compose(z, noise), sqrt_info)
    return g


def integrate_odometry(g, n, start):
    """Dead-reckoned initial guess from the chain measurements."""
    poses = [start]
    for k in range(n - 1):
        poses.append(se3.compose(poses[-1], se3.index(g.z, k)))
    return se3.stack(poses)


def pad_poses(poses, cap):
    n = poses.t.shape[0]
    R = jnp.concatenate(
        [poses.R, jnp.broadcast_to(jnp.eye(3), (cap - n, 3, 3))], axis=0
    )
    t = jnp.concatenate([poses.t, jnp.zeros((cap - n, 3))], axis=0)
    return se3.Pose(R, t)


class TestFactorGraph:
    def test_chi2_zero_at_ground_truth(self):
        gt = circle_trajectory(16)
        g = F.make_graph(64)
        g = F.add_prior(g, 0, se3.index(gt, 0), F.PRIOR_SQRT_INFO)
        for k in range(15):
            z = se3.between(se3.index(gt, k), se3.index(gt, k + 1))
            g = F.add_between(g, k, k + 1, z, F.ODOM_SQRT_INFO)
        c = float(F.chi2(g, pad_poses(gt, 64)))
        assert c < 1.0  # only f32 noise

    def test_residual_direction(self):
        # perturbing pose j away from the measurement raises chi2
        gt = circle_trajectory(4)
        g = F.make_graph(8)
        z = se3.between(se3.index(gt, 0), se3.index(gt, 1))
        g = F.add_between(g, 0, 1, z, F.ODOM_SQRT_INFO)
        poses = pad_poses(gt, 8)
        c0 = float(F.chi2(g, poses))
        bumped = se3.Pose(poses.R, poses.t.at[1].add(jnp.array([0.5, 0, 0])))
        assert float(F.chi2(g, bumped)) > c0 + 1.0


class TestSolver:
    def test_chain_converges_to_gt(self):
        n, cap = 24, 64
        gt = circle_trajectory(n)
        g = noisy_odometry_graph(gt, jax.random.PRNGKey(0), cap=cap)
        init = pad_poses(integrate_odometry(g, n, se3.index(gt, 0)), cap)
        res = solver.solve(g, init, gn_iters=8, cg_iters=64)
        # chain graph: optimum = dead-reckoning (measurements exactly
        # satisfiable); solver must keep chi2 ~ 0 and not blow up
        chis = np.asarray(res.chi2_history)
        assert chis[-1] < max(1e-3, chis[0] * 1e-3 + 1e-3)

    def test_loop_closure_corrects_drift(self):
        n, cap = 32, 64
        gt = circle_trajectory(n)
        key = jax.random.PRNGKey(1)
        g = noisy_odometry_graph(gt, key, sigma_rot=0.02, sigma_trans=0.10, cap=cap)
        init = pad_poses(integrate_odometry(g, n, se3.index(gt, 0)), cap)
        drift_before = float(
            jnp.linalg.norm(init.t[n - 1] - gt.t[n - 1])
        )
        # add exact loop closures back to the start and mid
        tight = [1.0 / 0.001] * 6
        for (a, b) in [(n - 1, 0), (n - 1, n // 2), (n // 2, 0)]:
            z = se3.between(se3.index(gt, a), se3.index(gt, b))
            g = F.add_between(g, a, b, z, tight)
        res = solver.solve(g, init, gn_iters=10, cg_iters=64)
        err = np.asarray(
            jnp.linalg.norm(res.poses.t[:n] - gt.t, axis=-1)
        )
        assert err.max() < drift_before  # strictly better than dead reckoning
        # loop-closed trajectory should be globally consistent to ~odometry noise
        assert err.mean() < 0.5

    def test_coarse_grid_preconditioner_beats_block_jacobi(self):
        """Long chain + one loop closure: block-Jacobi PCG needs O(N)
        iterations to carry the correction across the chain; the two-level
        (coarse supernode) preconditioner must reach a lower chi2 with HALF
        the CG budget (measured 2x on 1024/4096-pose loops)."""
        n, cap = 256, 288
        gt = circle_trajectory(n, radius=30.0)
        g = noisy_odometry_graph(
            gt, jax.random.PRNGKey(5), sigma_rot=0.005, sigma_trans=0.03,
            cap=cap,
        )
        z = se3.between(se3.index(gt, n - 1), se3.index(gt, 0))
        g = F.add_between(g, n - 1, 0, z, [1.0 / 0.01] * 6)
        init = pad_poses(integrate_odometry(g, n, se3.index(gt, 0)), cap)
        plain = solver.solve(g, init, gn_iters=4, cg_iters=32,
                             coarse_stride=0)
        two_level = solver.solve(g, init, gn_iters=4, cg_iters=16,
                                 coarse_stride=16)
        c_plain = float(np.asarray(plain.chi2_history)[-1])
        c_two = float(np.asarray(two_level.chi2_history)[-1])
        assert np.isfinite(c_two)
        assert c_two < c_plain, (c_two, c_plain)

    def test_multilevel_preconditioner_matches_two_level(self):
        """BPX hierarchy (coarse_levels=2): same long-chain loop problem as
        above, but the dense coarse factor covers only stride² supernodes.
        Must beat block-Jacobi at the same reduced CG budget (the property
        that makes 10^5-pose sessions tractable, where a stride-16 two-level
        dense factor would be 6k x 6 dims)."""
        n, cap = 256, 288
        gt = circle_trajectory(n, radius=30.0)
        g = noisy_odometry_graph(
            gt, jax.random.PRNGKey(5), sigma_rot=0.005, sigma_trans=0.03,
            cap=cap,
        )
        z = se3.between(se3.index(gt, n - 1), se3.index(gt, 0))
        g = F.add_between(g, n - 1, 0, z, [1.0 / 0.01] * 6)
        init = pad_poses(integrate_odometry(g, n, se3.index(gt, 0)), cap)
        plain = solver.solve(g, init, gn_iters=4, cg_iters=32,
                             coarse_stride=0)
        multi = solver.solve(g, init, gn_iters=4, cg_iters=16,
                             coarse_stride=8, coarse_levels=2)
        c_plain = float(np.asarray(plain.chi2_history)[-1])
        c_multi = float(np.asarray(multi.chi2_history)[-1])
        assert np.isfinite(c_multi)
        assert c_multi < c_plain, (c_multi, c_plain)
        # dense coarse factor is 8x smaller than the stride-8 two-level one:
        # cap/8² = 5 supernodes vs cap/8 = 36

    def test_monotone_chi2(self):
        n, cap = 16, 32
        gt = circle_trajectory(n)
        g = noisy_odometry_graph(gt, jax.random.PRNGKey(2), cap=cap)
        z = se3.between(se3.index(gt, n - 1), se3.index(gt, 0))
        g = F.add_between(g, n - 1, 0, z, [1.0 / 0.01] * 6)
        init = pad_poses(integrate_odometry(g, n, se3.index(gt, 0)), cap)
        res = solver.solve(g, init, gn_iters=8, cg_iters=64)
        chis = np.asarray(res.chi2_history)
        # overall decrease (GN may oscillate slightly between iters)
        assert chis[-1] < chis[0]
        assert np.all(np.isfinite(chis))

    def test_empty_graph_is_noop(self):
        cap = 16
        g = F.make_graph(cap)
        poses = pad_poses(circle_trajectory(4), cap)
        res = solver.solve(g, poses, gn_iters=3, cg_iters=8)
        np.testing.assert_allclose(
            np.asarray(res.poses.t), np.asarray(poses.t), atol=1e-5
        )

    def test_huber_rejects_outlier_loop(self):
        n, cap = 24, 64
        gt = circle_trajectory(n)
        g = noisy_odometry_graph(
            gt, jax.random.PRNGKey(3), sigma_rot=0.005, sigma_trans=0.02, cap=cap
        )
        # one wildly wrong loop factor
        bad = se3.Pose(
            so3.from_euler(jnp.array([0.0, 0.0, 2.0])), jnp.array([15.0, -8.0, 3.0])
        )
        g = F.add_between(g, 20, 2, bad, [1.0 / 0.05] * 6)
        init = pad_poses(integrate_odometry(g, n, se3.index(gt, 0)), cap)
        res_plain = solver.solve(g, init, gn_iters=10, cg_iters=64)
        res_huber = solver.solve(g, init, gn_iters=10, cg_iters=64, huber_delta=1.0)
        err_plain = float(jnp.linalg.norm(res_plain.poses.t[:n] - gt.t, axis=-1).mean())
        err_huber = float(jnp.linalg.norm(res_huber.poses.t[:n] - gt.t, axis=-1).mean())
        assert err_huber < err_plain

    def test_jit_stability_across_counts(self):
        # same capacity, different counts -> no recompile needed, results sane
        cap = 32
        gt = circle_trajectory(8)
        for n in (4, 8):
            g = noisy_odometry_graph(se3.index(gt, slice(0, n)), jax.random.PRNGKey(4), cap=cap)
            init = pad_poses(
                integrate_odometry(g, n, se3.index(gt, 0)), cap
            )
            res = solver.solve(g, init, gn_iters=3, cg_iters=16)
            assert np.isfinite(float(res.chi2_history[-1]))


class TestLowOccupancyAutoHierarchy:
    """Regression: the auto multilevel preconditioner (coarse_stride = -1)
    must stay finite on fixed-capacity pose arrays at LOW occupancy — the
    live-drain shape (default capacity 8192, a few dozen active poses in
    two robot blocks). The equilibrated Galerkin coarse matrix is nearly
    rank-deficient there and f32 assembly noise drove its smallest
    eigenvalue to -2e-3: the 1e-6-shifted Cholesky returned NaN and the
    fleet drain produced NaN trajectories (found via run_multi --fleet)."""

    def test_sparse_occupancy_two_blocks(self):
        cap = 8192
        block = 4096  # robot 1's poses start here (block-per-robot layout)
        n0, n1 = 48, 33
        gt0 = circle_trajectory(n0, radius=70.0)
        gt1 = circle_trajectory(n1, radius=70.0)

        g = F.make_graph(edge_capacity=8192, prior_capacity=8)
        g = F.add_prior(g, 0, se3.index(gt0, 0), [10.0] * 3 + [1e2] * 3)
        g = F.add_prior(g, block, se3.index(gt1, 0), [10.0] * 3 + [1e-4] * 3)
        for i in range(n0 - 1):
            z = se3.between(se3.index(gt0, i), se3.index(gt0, i + 1))
            g = F.add_between(g, i, i + 1, z, [200.0] * 3 + [1e3] * 3)
        for i in range(n1 - 1):
            z = se3.between(se3.index(gt1, i), se3.index(gt1, i + 1))
            g = F.add_between(
                g, block + i, block + i + 1, z, [200.0] * 3 + [1e3] * 3
            )
        # one inter-block loop factor (the fleet inter-loop shape)
        z = se3.between(se3.index(gt0, 0), se3.index(gt1, 32 % n1))
        g = F.add_between(g, 0, block + 32 % n1, z, [1.4] * 6)

        init = se3.identity((cap,))
        init = se3.Pose(
            init.R.at[:n0].set(gt0.R).at[block : block + n1].set(gt1.R),
            init.t.at[:n0].set(gt0.t).at[block : block + n1].set(gt1.t),
        )
        res = solver.solve(
            g, init, gn_iters=4, cg_iters=32, coarse_stride=-1
        )
        chis = np.asarray(res.chi2_history)
        assert np.isfinite(chis).all(), chis
        assert np.isfinite(np.asarray(res.poses.t)).all()
        assert np.isfinite(np.asarray(res.poses.R)).all()
        # and the hierarchy variants that reproduced the NaN directly
        for cs, lv in ((256, 1), (16, 2)):
            r2 = solver.solve(
                g, init, gn_iters=2, cg_iters=16,
                coarse_stride=cs, coarse_levels=lv,
            )
            assert np.isfinite(np.asarray(r2.chi2_history)).all(), (cs, lv)
            assert np.isfinite(np.asarray(r2.poses.t)).all(), (cs, lv)
