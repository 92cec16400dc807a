"""Pallas kernel tests (interpreter mode — CI runs on CPU)."""
import functools

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


class TestNNSelectPallas:
    """Fused NN + payload selection (nn_select_pallas)."""

    @staticmethod
    def _payload(t, mask, normals=None):
        rows = [
            jnp.where(mask[:, None], t, 1e6).T,
            mask[None].astype(jnp.float32),
        ]
        if normals is not None:
            rows += [normals.T, jnp.zeros((1, t.shape[0]), jnp.float32)]
        return jnp.concatenate(rows, axis=0)

    def test_selects_argmin_payload(self):
        from scl_slam_tpu.ops.pallas_kernels import nn_select_pallas

        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.uniform(-50, 50, (256, 3)), jnp.float32)
        t = jnp.asarray(rng.uniform(-50, 50, (2048, 3)), jnp.float32)
        mask = jnp.ones(2048, bool)
        d_s, sel = nn_select_pallas(q, self._payload(t, mask), interpret=True)
        d_r, i_r = nearest_neighbors(q, t)
        np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r), atol=1e-3)
        # selected coordinates must be EXACTLY a target point (one-hot
        # contraction is exact), and as near as the baseline's match
        sel_xyz = np.asarray(sel[:3].T)
        d_true = np.sum((np.asarray(q) - sel_xyz) ** 2, axis=1)
        np.testing.assert_allclose(d_true, np.asarray(d_r), atol=1e-3)
        match = np.abs(
            sel_xyz[:, None, :] - np.asarray(t)[None, :, :]
        ).sum(-1).min(1)
        np.testing.assert_array_equal(match, 0.0)
        np.testing.assert_array_equal(np.asarray(sel[3]), 1.0)

    def test_mask_and_normals_rows(self):
        from scl_slam_tpu.ops.pallas_kernels import nn_select_pallas

        rng = np.random.RandomState(4)
        q = jnp.asarray(rng.uniform(-10, 10, (256, 3)), jnp.float32)
        t = jnp.asarray(rng.uniform(-10, 10, (1024, 3)), jnp.float32)
        mask = jnp.asarray(rng.rand(1024) > 0.3)
        normals = jnp.asarray(rng.normal(size=(1024, 3)), jnp.float32)
        d_s, sel = nn_select_pallas(
            q, self._payload(t, mask, normals), interpret=True
        )
        # valid matches carry their own normal row, exactly
        tgt = np.where(np.asarray(mask)[:, None], np.asarray(t), 1e6)
        d2 = ((np.asarray(q)[:, None] - tgt[None]) ** 2).sum(-1)
        idx = d2.argmin(1)
        got_mask = np.asarray(sel[3]) > 0.5
        np.testing.assert_array_equal(got_mask, np.asarray(mask)[idx])
        np.testing.assert_allclose(
            np.asarray(sel[4:7].T)[got_mask],
            np.asarray(normals)[idx][got_mask],
            rtol=0,
            atol=0,
        )

    def test_icp_uses_select_and_converges(self):
        from scl_slam_tpu.ops import pointcloud as pc
        from scl_slam_tpu.ops import registration as reg
        from scl_slam_tpu.geometry import se3

        rng = np.random.RandomState(5)
        pts = rng.uniform(-20, 20, (1024, 3)).astype(np.float32)
        tgt = pc.Cloud(jnp.asarray(pts), jnp.ones(1024, bool))
        ang = 0.1
        R = np.array(
            [
                [np.cos(ang), -np.sin(ang), 0],
                [np.sin(ang), np.cos(ang), 0],
                [0, 0, 1],
            ],
            np.float32,
        )
        src_pts = (pts - np.array([0.5, -0.3, 0.2], np.float32)) @ R
        src = pc.Cloud(jnp.asarray(src_pts), jnp.ones(1024, bool))
        res = reg.icp(src, tgt, max_iters=30, max_corr_dist=5.0)
        assert float(res.fitness) < 1e-3
        assert bool(res.converged)

    def test_batched_predicated_kernel(self):
        from scl_slam_tpu.ops.pallas_kernels import (
            nn_select_pallas,
            nn_select_batched_pallas,
        )

        rng = np.random.RandomState(6)
        B = 3
        q = jnp.asarray(rng.uniform(-30, 30, (B, 256, 3)), jnp.float32)
        t = jnp.asarray(rng.uniform(-30, 30, (B, 1024, 3)), jnp.float32)
        mask = jnp.ones((B, 1024), bool)
        payload = jnp.concatenate(
            [jnp.swapaxes(t, -1, -2), mask[:, None].astype(jnp.float32)],
            axis=1,
        )
        active = jnp.array([1, 0, 1], jnp.int32)
        d, sel = nn_select_batched_pallas(q, payload, active, interpret=True)
        for b in range(B):
            if int(active[b]):
                db, sb = nn_select_pallas(q[b], payload[b], interpret=True)
                np.testing.assert_allclose(
                    np.asarray(d[b]), np.asarray(db), atol=1e-3
                )
                np.testing.assert_array_equal(np.asarray(sel[b]), np.asarray(sb))
            else:
                # inactive lane: untouched init values
                assert np.all(np.isinf(np.asarray(d[b])))
                np.testing.assert_array_equal(np.asarray(sel[b]), 0.0)
        # the r5 mineq selection variant: identical outputs, fewer passes
        d2_, sel2 = nn_select_batched_pallas(
            q, payload, active, variant="argmin", interpret=True
        )
        np.testing.assert_array_equal(np.asarray(d), np.asarray(d2_))
        np.testing.assert_array_equal(np.asarray(sel), np.asarray(sel2))


class TestMaxImagePallas:
    """Separable multi-pass max-binning kernel (not wired into Scan Context
    — slower at 20x60 bins, see pallas_kernels.py status note — but kept
    correct for high-bin-count descriptors)."""

    def test_matches_scatter_max_within_slot(self):
        import numpy as np

        from scl_slam_tpu.ops import pallas_kernels as pk
        from scl_slam_tpu.ops.pointcloud import scatter_max_image

        rng = np.random.RandomState(0)
        n, R, S = pk.MB_T * 2, 20, 60
        ring = jnp.asarray(rng.randint(0, R, n).astype(np.int32))
        sector = jnp.asarray(rng.randint(0, S, n).astype(np.int32))
        z = jnp.asarray(rng.uniform(-2, 40, n).astype(np.float32))
        valid = jnp.asarray(rng.rand(n) > 0.1)
        ref = scatter_max_image(z, ring, sector, valid, R, S, init=0.0)
        img = pk.max_image_pallas(
            z, ring, sector, valid, R, S, span=64.0, interpret=True
        )
        err = np.asarray(ref - img)
        slot = 64.0 / pk.MB_K**pk.MB_PASSES
        assert (np.asarray(img) <= np.asarray(ref) + 1e-5).all()
        assert err.max() < slot + 1e-5

    def test_degenerate_single_bin(self):
        import numpy as np

        from scl_slam_tpu.ops import pallas_kernels as pk

        n = pk.MB_T
        z = jnp.full((n,), 7.321, jnp.float32)
        zero = jnp.zeros((n,), jnp.int32)
        # ~2^MB_KBITS equal-level points in one bin carry the sum readout
        # up a level (documented graceful overshoot) — stay well below
        valid = jnp.arange(n) < 4096
        img = np.asarray(pk.max_image_pallas(
            z, zero, zero, valid, 20, 60, interpret=True
        ))
        assert abs(img[0, 0] - 7.321) < 64.0 / pk.MB_K**pk.MB_PASSES + 1e-5
        assert np.abs(img).sum() == img[0, 0]


class TestICPMomentsFused:
    """Fused NN+Kabsch-moments kernel (one Pallas pass per ICP iteration)."""

    def _inputs(self, B=3, Nq=256, Nt=1024, seed=0):
        rng = np.random.RandomState(seed)
        src = rng.uniform(-20, 20, (B, Nq, 3)).astype(np.float32)
        smask = rng.rand(B, Nq) > 0.1
        tgt = rng.uniform(-20, 20, (B, Nt, 3)).astype(np.float32)
        tmask = rng.rand(B, Nt) > 0.1
        payload = np.concatenate(
            [
                np.where(tmask[:, :, None], tgt, 1e6).transpose(0, 2, 1),
                tmask[:, None, :].astype(np.float32),
            ],
            axis=1,
        )
        src4 = np.concatenate(
            [src.transpose(0, 2, 1), smask[:, None, :].astype(np.float32)],
            axis=1,
        )
        pose_rows = np.zeros((B, 128), np.float32)
        for b in range(B):
            a = 0.2 * b
            R = np.array(
                [
                    [np.cos(a), -np.sin(a), 0],
                    [np.sin(a), np.cos(a), 0],
                    [0, 0, 1],
                ]
            )
            pose_rows[b, 0:9] = R.reshape(-1)
            pose_rows[b, 9:12] = [1.0 * b, -2.0, 0.5]
        return src4, payload, pose_rows

    def test_kernel_matches_reference(self):
        from scl_slam_tpu.ops import pallas_kernels as pk

        src4, payload, pose_rows = self._inputs()
        active = jnp.asarray([1, 1, 0], jnp.int32)
        m_ref = pk.icp_moments_reference(
            jnp.asarray(src4), jnp.asarray(payload),
            jnp.asarray(pose_rows), active.astype(bool), 5.0,
        )
        m_pal = pk.icp_moments_batched_pallas(
            jnp.asarray(src4), jnp.asarray(payload),
            jnp.asarray(pose_rows), active, 5.0, interpret=True,
        )
        a, b = np.asarray(m_ref)[:, :18], np.asarray(m_pal)[:, :18]
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1.0)
        assert rel.max() < 1e-5
        assert np.abs(np.asarray(m_pal)[2]).max() == 0.0  # inactive lane

    def test_mineq_variant_matches_argmin(self):
        """The r5 equality-one-hot selection (no argmin/iota passes) must
        reproduce the baseline kernel's moments exactly (selection ties
        only occur between identical pad rows, which average to
        themselves)."""
        from scl_slam_tpu.ops import pallas_kernels as pk

        src4, payload, pose_rows = self._inputs()
        active = jnp.asarray([1, 1, 0], jnp.int32)
        m_arg = pk.icp_moments_batched_pallas(
            jnp.asarray(src4), jnp.asarray(payload),
            jnp.asarray(pose_rows), active, 5.0,
            variant="argmin", interpret=True,
        )
        m_meq = pk.icp_moments_batched_pallas(
            jnp.asarray(src4), jnp.asarray(payload),
            jnp.asarray(pose_rows), active, 5.0,
            variant="mineq", interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(m_arg), np.asarray(m_meq))

    def test_fused_stage_matches_selection_stage(self, monkeypatch):
        """The fused moments-based ICP stage converges to the same pose and
        fitness as the selection-based stage (bit-identical semantics up to
        reduction order)."""
        import functools

        from scl_slam_tpu.geometry import se3
        from scl_slam_tpu.ops import pallas_kernels as pk
        from scl_slam_tpu.ops import pointcloud as pc
        from scl_slam_tpu.ops import registration as reg

        # CPU runs the kernel in interpret mode through the reference
        # implementation (bitwise-equivalent math)
        monkeypatch.setattr(
            pk,
            "icp_moments_batched_pallas",
            lambda s4, p4, pr, a, mcd, variant="mineq", interpret=False: (
                pk.icp_moments_reference(s4, p4, pr, a.astype(bool), mcd)
            ),
        )

        rng = np.random.RandomState(3)
        B, Nq, Nt = 2, 256, 1024
        # structured scene so ICP has a real optimum
        base = rng.uniform(-15, 15, (Nt, 3)).astype(np.float32)
        base[:, 2] = 0.3 * np.sin(base[:, 0]) + 0.2 * base[:, 1]
        tgt = np.stack([base, base + [0.5, 0, 0]])
        src = tgt[:, :Nq].copy()
        # true offset to recover
        yaw = 0.05
        Rz = np.array(
            [
                [np.cos(yaw), -np.sin(yaw), 0],
                [np.sin(yaw), np.cos(yaw), 0],
                [0, 0, 1],
            ],
            np.float32,
        )
        src = src @ Rz.T + np.asarray([0.3, -0.2, 0.1], np.float32)
        source = pc.Cloud(jnp.asarray(src), jnp.ones((B, Nq), bool))
        target = pc.Cloud(jnp.asarray(tgt), jnp.ones((B, Nt), bool))
        init = se3.identity((B,))
        active = jnp.ones((B,), bool)

        # force the fused path despite the CPU backend (and despite the
        # flag's perf-neutral default-OFF)
        monkeypatch.setattr(reg, "FUSED_ICP", True)
        monkeypatch.setattr(
            reg.jax, "default_backend", lambda: "tpu", raising=False
        )
        res_fused = reg.icp_batched(
            source, target, init, active, max_iters=20,
            max_corr_dist=5.0, tol=1e-5,
        )
        monkeypatch.undo()  # restore backend for the baseline
        monkeypatch.setattr(
            pk,
            "icp_moments_batched_pallas",
            lambda s4, p4, pr, a, mcd, variant="mineq", interpret=False: (
                pk.icp_moments_reference(s4, p4, pr, a.astype(bool), mcd)
            ),
        )
        res_sel = reg.icp_batched(
            source, target, init, active, max_iters=20,
            max_corr_dist=5.0, tol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(res_fused.pose.t), np.asarray(res_sel.pose.t),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(res_fused.pose.R), np.asarray(res_sel.pose.R),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(res_fused.fitness), np.asarray(res_sel.fitness),
            rtol=0.05, atol=1e-4,
        )
        # both recover the injected offset
        assert np.abs(np.asarray(res_fused.fitness)).max() < 0.05


class TestMXUSelectKernel:
    """MXU-form NN selection: same winners as the exact kernel on
    recentred coordinates (up to genuine near-ties), exact d2 after the
    caller's recompute."""

    def test_selection_matches_exact_on_recentred_coords(self):
        from scl_slam_tpu.ops import pallas_kernels as pk

        rng = np.random.RandomState(0)
        B, Nq, Nt = 2, 256, 1024
        q = rng.uniform(-40, 40, (B, Nq, 3)).astype(np.float32)
        tgt = rng.uniform(-40, 40, (B, Nt, 3)).astype(np.float32)
        tmask = rng.rand(B, Nt) > 0.1
        payload = np.concatenate(
            [
                np.where(tmask[:, :, None], tgt, 1e6).transpose(0, 2, 1),
                tmask[:, None, :].astype(np.float32),
            ],
            axis=1,
        )
        active = jnp.asarray([1, 1], jnp.int32)
        d_mxu, sel_mxu = pk.nn_select_batched_mxu_pallas(
            jnp.asarray(q), jnp.asarray(payload), active, interpret=True
        )
        d_ex, sel_ex = pk.nn_select_batched_pallas(
            jnp.asarray(q), jnp.asarray(payload), active, interpret=True
        )
        m_mxu = np.swapaxes(np.asarray(sel_mxu)[:, :3], -1, -2)
        m_ex = np.swapaxes(np.asarray(sel_ex)[:, :3], -1, -2)
        # exact-recompute distances of each kernel's winner
        d2_mxu = np.sum((q - m_mxu) ** 2, axis=-1)
        d2_ex = np.sum((q - m_ex) ** 2, axis=-1)
        # winners may differ only on near-ties: the MXU winner's true
        # distance can exceed the exact winner's by at most the expanded
        # form's absolute error at these coordinate scales
        assert np.all(d2_mxu <= d2_ex + 5e-3), (d2_mxu - d2_ex).max()
        # and the vast majority of winners are identical
        same = np.mean(np.all(m_mxu == m_ex, axis=-1))
        assert same > 0.99, same

    def test_inactive_lane_returns_zero_sel(self):
        from scl_slam_tpu.ops import pallas_kernels as pk

        rng = np.random.RandomState(1)
        q = rng.uniform(-10, 10, (2, 256, 3)).astype(np.float32)
        payload = np.concatenate(
            [
                rng.uniform(-10, 10, (2, 3, 1024)).astype(np.float32),
                np.ones((2, 1, 1024), np.float32),
            ],
            axis=1,
        )
        active = jnp.asarray([1, 0], jnp.int32)
        _, sel = pk.nn_select_batched_mxu_pallas(
            jnp.asarray(q), jnp.asarray(payload), active, interpret=True
        )
        assert float(jnp.abs(sel[1]).max()) == 0.0


class TestNNIndexBatched:
    """Index-form batched NN (r4): argmin out of the kernel, payload
    gathered by the caller — must match the select kernel exactly."""

    def test_matches_select_kernel(self):
        from scl_slam_tpu.ops.pallas_kernels import (
            nn_index_batched_pallas,
            nn_select_batched_pallas,
        )

        rng = np.random.RandomState(9)
        B = 3
        q = jnp.asarray(rng.uniform(-30, 30, (B, 256, 3)), jnp.float32)
        t = jnp.asarray(rng.uniform(-30, 30, (B, 2048, 3)), jnp.float32)
        mask = jnp.ones((B, 2048), bool)
        payload = jnp.concatenate(
            [jnp.swapaxes(t, -1, -2), mask[:, None].astype(jnp.float32)],
            axis=1,
        )
        active = jnp.array([1, 0, 1], jnp.int32)
        d_s, sel = nn_select_batched_pallas(q, payload, active, interpret=True)
        d_i, idx = nn_index_batched_pallas(q, payload, active, interpret=True)
        gathered = jnp.take_along_axis(payload, idx[:, None, :], axis=2)
        for b in range(B):
            if int(active[b]):
                np.testing.assert_array_equal(
                    np.asarray(d_s[b]), np.asarray(d_i[b])
                )
                np.testing.assert_array_equal(
                    np.asarray(sel[b]), np.asarray(gathered[b])
                )
            else:
                assert np.all(np.isinf(np.asarray(d_i[b])))
                assert np.all(np.asarray(idx[b]) == 0)

    def test_multi_target_tile_indices_are_global(self):
        from scl_slam_tpu.ops.pallas_kernels import nn_index_batched_pallas

        rng = np.random.RandomState(10)
        # 2048 targets = 2 tiles of pick_target_tile(2048)=1024? -> global
        # index correctness across tile boundaries is the point
        q = jnp.asarray(rng.uniform(-5, 5, (2, 256, 3)), jnp.float32)
        t = jnp.asarray(rng.uniform(-5, 5, (2, 2048, 3)), jnp.float32)
        payload = jnp.concatenate(
            [jnp.swapaxes(t, -1, -2), jnp.ones((2, 1, 2048), jnp.float32)],
            axis=1,
        )
        active = jnp.ones((2,), jnp.int32)
        d, idx = nn_index_batched_pallas(q, payload, active, interpret=True)
        # brute force oracle
        d2 = jnp.sum(
            (q[:, :, None, :] - t[:, None, :, :]) ** 2, axis=-1
        )
        np.testing.assert_array_equal(
            np.asarray(jnp.argmin(d2, axis=-1)), np.asarray(idx)
        )


class TestRansacCountsKernel:
    """Fused RANSAC hypothesis scoring (r5): counts must match the
    materialized-slab reference exactly (same f32 residual form)."""

    def test_counts_match_reference(self):
        from scl_slam_tpu.ops import pallas_kernels as pk

        rng = np.random.RandomState(11)
        B, H, N = 3, 16, 256
        src = rng.normal(size=(B, N, 3)).astype(np.float32) * 10
        good = rng.rand(B, N) > 0.2
        mt = (src + rng.normal(size=(B, N, 3)) * 0.3).astype(np.float32)
        R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, H, 3, 3))
        t = rng.normal(size=(B, H, 3)).astype(np.float32) * 0.2
        thr2 = 0.25
        src4 = jnp.concatenate(
            [jnp.swapaxes(jnp.asarray(src), -1, -2),
             jnp.asarray(good)[:, None, :].astype(jnp.float32)], axis=1)
        mt4 = jnp.concatenate(
            [jnp.swapaxes(jnp.asarray(mt), -1, -2),
             jnp.zeros((B, 1, N), jnp.float32)], axis=1)
        rows = (
            jnp.zeros((B, H, 128), jnp.float32)
            .at[:, :, 0:9].set(jnp.asarray(R.reshape(B, H, 9)))
            .at[:, :, 9:12].set(jnp.asarray(t))
        )
        counts = pk.ransac_counts_batched_pallas(
            src4, mt4, rows, thr2, interpret=True
        )
        moved = np.einsum("bhij,bnj->bhni", R, src) + t[:, :, None, :]
        res2 = np.sum((moved - mt[:, None]) ** 2, -1)
        want = np.sum((res2 < thr2) & good[:, None, :], -1)
        np.testing.assert_array_equal(np.asarray(counts), want)

    def test_ransac_align_batched_paths_agree(self, monkeypatch):
        """Full ransac_align_batched: fused-scoring and slab paths give
        the same accept decisions and ratios (CPU: fused path exercised
        via a monkeypatched backend + interpret kernel)."""
        from scl_slam_tpu.ops import pallas_kernels as pk
        from scl_slam_tpu.ops import registration as reg
        from scl_slam_tpu.ops.pointcloud import Cloud

        rng = np.random.RandomState(12)
        B, N, M = 4, 256, 1024
        base = rng.uniform(-30, 30, (B, M, 3)).astype(np.float32)
        source = Cloud(
            jnp.asarray(base[:, :N] + rng.normal(0, 0.05, (B, N, 3))
                        .astype(np.float32)),
            jnp.ones((B, N), bool),
        )
        target = Cloud(jnp.asarray(base), jnp.ones((B, M), bool))
        active = jnp.asarray([True, True, True, False])
        key = jax.random.PRNGKey(5)

        def run():
            return reg.ransac_align_batched(
                source, target, key, active, num_hypotheses=32,
                inlier_thresh=0.25, min_inlier_ratio=0.45,
            )

        monkeypatch.setattr(reg, "RANSAC_FUSED_SCORING", False)
        a = run()
        monkeypatch.setattr(reg, "RANSAC_FUSED_SCORING", True)
        monkeypatch.setattr(
            reg.jax, "default_backend", lambda: "tpu", raising=False
        )
        # every Pallas call on the faked-TPU backend must run interpreted
        monkeypatch.setattr(
            pk, "ransac_counts_batched_pallas",
            functools.partial(pk.ransac_counts_batched_pallas,
                              interpret=True),
        )
        monkeypatch.setattr(
            pk, "nn_select_batched_pallas",
            functools.partial(pk.nn_select_batched_pallas, interpret=True),
        )
        b = run()
        np.testing.assert_array_equal(np.asarray(a.success),
                                      np.asarray(b.success))
        np.testing.assert_allclose(np.asarray(a.inlier_ratio),
                                   np.asarray(b.inlier_ratio), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.pose.t),
                                   np.asarray(b.pose.t), atol=1e-4)
