"""Multi-device tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from scl_slam_tpu.geometry import se3, so3
from scl_slam_tpu.graph import factors as F
from scl_slam_tpu.graph import solver
from scl_slam_tpu.parallel import sharded

from test_graph import (
    TIGHT_PRIOR,
    circle_trajectory,
    integrate_odometry,
    noisy_odometry_graph,
    pad_poses,
)


@pytest.fixture()
def mesh(mesh8):
    return mesh8


class TestShardedTopk:
    def test_matches_dense(self, mesh):
        key = jax.random.PRNGKey(0)
        n, d, k = 512, 20, 8
        db = jax.random.normal(key, (n, d))
        q = jax.random.normal(jax.random.fold_in(key, 1), (d,))
        mask = jnp.arange(n) < 400
        d2s, poss = sharded.sharded_topk(mesh, "shard", db, q, mask, k)
        # dense reference
        dd = jnp.sum((db - q) ** 2, axis=-1)
        dd = jnp.where(mask, dd, jnp.inf)
        ref_d2, ref_pos = jax.lax.top_k(-dd, k)
        np.testing.assert_allclose(np.asarray(d2s), np.asarray(-ref_d2), rtol=1e-5)
        np.testing.assert_array_equal(np.sort(np.asarray(poss)), np.sort(np.asarray(ref_pos)))


class TestShardedSolve:
    def test_matches_single_device(self, mesh):
        n, cap = 24, 64
        gt = circle_trajectory(n)
        g = noisy_odometry_graph(gt, jax.random.PRNGKey(0), cap=cap)
        z = se3.between(se3.index(gt, n - 1), se3.index(gt, 0))
        g = F.add_between(g, n - 1, 0, z, [1.0 / 0.01] * 6)
        init = pad_poses(integrate_odometry(g, n, se3.index(gt, 0)), cap)

        res_single = solver.solve(g, init, gn_iters=6, cg_iters=48)
        poses_sh, chis = sharded.sharded_solve(
            mesh, "shard", g, init, gn_iters=6, cg_iters=48
        )
        # same optimum (both should reach the same chi2 and nearby poses)
        chi_single = float(res_single.chi2_history[-1])
        chi_shard = float(chis[-1])
        assert abs(chi_shard - chi_single) < 0.05 * max(chi_single, 1.0)
        np.testing.assert_allclose(
            np.asarray(poses_sh.t[:n]),
            np.asarray(res_single.poses.t[:n]),
            atol=0.05,
        )

    def test_loop_correction_under_sharding(self, mesh):
        n, cap = 32, 64
        gt = circle_trajectory(n)
        g = noisy_odometry_graph(
            gt, jax.random.PRNGKey(1), sigma_rot=0.02, sigma_trans=0.1, cap=cap
        )
        for (a, b) in [(n - 1, 0), (n // 2, 0)]:
            z = se3.between(se3.index(gt, a), se3.index(gt, b))
            g = F.add_between(g, a, b, z, [1.0 / 0.001] * 6)
        init = pad_poses(integrate_odometry(g, n, se3.index(gt, 0)), cap)
        poses_sh, chis = sharded.sharded_solve(
            mesh, "shard", g, init, gn_iters=8, cg_iters=64
        )
        err = np.asarray(jnp.linalg.norm(poses_sh.t[:n] - gt.t, axis=-1))
        assert err.mean() < 0.5
        assert np.all(np.isfinite(np.asarray(chis)))
