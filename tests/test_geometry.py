import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scl_slam_tpu.geometry import se3, so3


def random_rotations(key, n):
    w = jax.random.normal(key, (n, 3)) * 1.5
    return so3.exp(w)


def random_poses(key, n):
    k1, k2 = jax.random.split(key)
    return se3.Pose(random_rotations(k1, n), jax.random.normal(k2, (n, 3)) * 10)


class TestSO3:
    def test_exp_identity(self):
        R = so3.exp(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (64, 3))
        # keep angles inside the principal domain (log returns the wrapped
        # axis-angle for |w| > pi, which is correct but not elementwise-equal)
        w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) * jnp.linspace(
            1e-5, 3.0, 64
        )[:, None]
        w2 = so3.log(so3.exp(w))
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)

    def test_exp_log_exp_consistency(self):
        # for any w, exp(log(exp(w))) must equal exp(w) as a rotation
        key = jax.random.PRNGKey(10)
        w = jax.random.normal(key, (64, 3)) * 2.5
        R = so3.exp(w)
        R2 = so3.exp(so3.log(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-3)

    def test_log_near_pi(self):
        axis = jnp.array([1.0, 0.0, 0.0])
        for theta in [np.pi - 1e-4, np.pi - 1e-2]:
            w = axis * theta
            w2 = so3.log(so3.exp(w))
            np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-3)

    def test_exp_is_rotation(self):
        key = jax.random.PRNGKey(1)
        R = random_rotations(key, 32)
        RtR = jnp.einsum("nij,nik->njk", R, R)
        np.testing.assert_allclose(
            np.asarray(RtR), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)

    def test_euler_roundtrip(self):
        rpy = jnp.array([[0.1, -0.3, 2.0], [0.0, 0.0, 0.0], [-1.2, 0.4, -3.0]])
        rpy2 = so3.to_euler(so3.from_euler(rpy))
        np.testing.assert_allclose(np.asarray(rpy2), np.asarray(rpy), atol=1e-5)

    def test_quat_matrix_roundtrip(self):
        key = jax.random.PRNGKey(2)
        R = random_rotations(key, 64)
        R2 = so3.quat_to_matrix(so3.matrix_to_quat(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_left_jacobian_inverse(self):
        key = jax.random.PRNGKey(3)
        w = jax.random.normal(key, (16, 3))
        J = so3.left_jacobian(w)
        Jinv = so3.left_jacobian_inv(w)
        np.testing.assert_allclose(
            np.asarray(J @ Jinv), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5
        )


class TestSE3:
    def test_compose_inverse(self):
        key = jax.random.PRNGKey(4)
        p = random_poses(key, 32)
        ident = se3.compose(p, se3.inverse(p))
        np.testing.assert_allclose(
            np.asarray(ident.R), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(ident.t), 0.0, atol=1e-4)

    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(5)
        xi = jax.random.normal(key, (64, 6))
        # keep rotation part inside the principal domain (|w| < pi)
        w = xi[:, :3]
        w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) * jnp.linspace(
            1e-4, 3.0, 64
        )[:, None]
        xi = jnp.concatenate([w, xi[:, 3:]], axis=-1)
        xi2 = se3.log(se3.exp(xi))
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-4)

    def test_between(self):
        key = jax.random.PRNGKey(6)
        a = random_poses(jax.random.fold_in(key, 0), 8)
        b = random_poses(jax.random.fold_in(key, 1), 8)
        ab = se3.between(a, b)
        b2 = se3.compose(a, ab)
        np.testing.assert_allclose(np.asarray(b2.R), np.asarray(b.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(b2.t), np.asarray(b.t), atol=1e-4)

    def test_transform_points_matches_matrix(self):
        key = jax.random.PRNGKey(7)
        p = random_poses(key, 1)
        pts = jax.random.normal(jax.random.fold_in(key, 2), (1, 100, 3))
        out = se3.transform_points(p, pts)
        T = np.asarray(se3.to_matrix(p))[0]
        expected = (np.asarray(pts)[0] @ T[:3, :3].T) + T[:3, 3]
        np.testing.assert_allclose(np.asarray(out)[0], expected, atol=1e-5)

    def test_xyzrpy_roundtrip(self):
        x = jnp.array([[1.0, -2.0, 3.0, 0.2, -0.4, 1.5]])
        x2 = se3.to_xyzrpy(se3.from_xyzrpy(x))
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)

    def test_retract_local_inverse(self):
        key = jax.random.PRNGKey(8)
        p = random_poses(key, 16)
        xi = jax.random.normal(jax.random.fold_in(key, 1), (16, 6)) * 0.1
        q = se3.retract(p, xi)
        xi2 = se3.local(p, q)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)

    def test_jit_and_grad(self):
        # everything must be jittable and differentiable
        def loss(xi):
            p = se3.exp(xi)
            return jnp.sum(se3.log(p) ** 2)

        g = jax.jit(jax.grad(loss))(jnp.array([0.1, 0.2, -0.3, 1.0, 2.0, 3.0]))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_log_of_drifted_rotation(self):
        # regression: ~60 chained f32 composes contract R (|RR^T - I| ~ 1e-4),
        # making the trace report a phantom angle with a ~zero antisymmetric
        # part; log() must not explode (observed 2.6e7-scale outputs)
        R = jnp.eye(3) * jnp.array([0.99994, 0.99995, 1.0])[None, :]
        w = so3.log(R)
        assert float(jnp.abs(w).max()) < 1e-2
        # and jacobians through it stay bounded
        J = jax.jacfwd(so3.log)(R)
        assert float(jnp.abs(J).max()) < 1e3

    def test_chained_compose_log_stable(self):
        # compose a small rotation 200 times; log of consecutive betweens
        # must stay near the true increment
        inc = so3.exp(jnp.array([0.0, 0.0, 0.03]))
        R = jnp.eye(3)
        for _ in range(200):
            R = R @ inc
        # re-derive the last increment
        prev = R @ inc.T
        w = so3.log(so3.orthonormalize(prev).T @ R)
        np.testing.assert_allclose(np.asarray(w), [0, 0, 0.03], atol=1e-3)

    @pytest.mark.parametrize(
        "xi",
        [
            [0.0] * 6,                       # identity (arccos'(1) singularity)
            [3.14, 0, 0, 1.0, 2.0, 3.0],     # near pi
            [1e-9] * 6,                      # tiny
            [1e-4, 0, 0, 0.1, 0, 0],         # small-angle branch boundary
        ],
    )
    def test_grad_finite_at_singular_points(self, xi):
        # regression: f32 guard thresholds below eps made log∘exp produce NaN
        # gradients at identity; the GN solver differentiates through here
        g = jax.grad(lambda x: jnp.sum(se3.log(se3.exp(x)) ** 2))(jnp.array(xi))
        assert np.all(np.isfinite(np.asarray(g)))
