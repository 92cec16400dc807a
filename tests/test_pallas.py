"""Pallas kernel tests (interpreter mode — CI runs on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from scl_slam_tpu.ops.pallas_kernels import nearest_neighbors_pallas
from scl_slam_tpu.ops.registration import nearest_neighbors


class TestNNPallas:
    @staticmethod
    def _assert_equivalent(q, t, d_p, i_p, d_r, i_r):
        # the kernel (exact per-coordinate form) and the baseline (expanded
        # form) may break f32 near-ties differently: indices must agree
        # wherever distances are not tied, and chosen points must be equally
        # near everywhere
        d_true_p = np.sum(
            (np.asarray(q) - np.asarray(t)[np.asarray(i_p)]) ** 2, axis=1
        )
        d_true_r = np.sum(
            (np.asarray(q) - np.asarray(t)[np.asarray(i_r)]) ** 2, axis=1
        )
        np.testing.assert_allclose(d_true_p, d_true_r, atol=1e-3)
        agree = np.mean(np.asarray(i_p) == np.asarray(i_r))
        assert agree > 0.99, f"index agreement {agree}"
        np.testing.assert_allclose(np.asarray(d_p), d_true_p, atol=1e-3)

    def test_matches_baseline(self):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.uniform(-50, 50, (256, 3)), jnp.float32)
        t = jnp.asarray(rng.uniform(-50, 50, (2048, 3)), jnp.float32)
        d_p, i_p = nearest_neighbors_pallas(q, t, interpret=True)
        d_r, i_r = nearest_neighbors(q, t)
        self._assert_equivalent(q, t, d_p, i_p, d_r, i_r)

    def test_multiple_query_tiles(self):
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.uniform(-10, 10, (512, 3)), jnp.float32)
        t = jnp.asarray(rng.uniform(-10, 10, (1024, 3)), jnp.float32)
        d_p, i_p = nearest_neighbors_pallas(q, t, interpret=True)
        d_r, i_r = nearest_neighbors(q, t)
        self._assert_equivalent(q, t, d_p, i_p, d_r, i_r)

    def test_exact_hits(self):
        rng = np.random.RandomState(2)
        t = jnp.asarray(rng.uniform(-50, 50, (1024, 3)), jnp.float32)
        q = t[jnp.arange(0, 256)]  # queries are exact target points
        d_p, i_p = nearest_neighbors_pallas(q, t, interpret=True)
        np.testing.assert_array_equal(np.asarray(i_p), np.arange(256))
        assert float(jnp.max(d_p)) == 0.0
