"""Feasibility: does a higher-precision MATVEC rescue f32 PCG at 32k poses?

docs/solver_scaling.md's wall: an N-pose chain's smooth modes have relative
eigenvalues ~(pi/2N)^2 — 2.3e-9 at 32k, below f32 matvec noise (~6e-8), so
f32 CG cannot see them (a 4 m kink survives 512 additive-PCG iterations)
and the coarse-first start's correction erodes. Hypothesis: the loss is
CANCELLATION inside H.p and the CG dot products, not representation — so
evaluating ONLY the matvec + dots in f64 (storage, preconditioner, and
coarse solve all still f32) should recover the correction. 2.3e-9 >> f64
noise (1e-16), and a two-float (df32) emulation reaches ~1e-14, so an
f64-matvec success here validates the df32-on-TPU route (TPU has no f64).

Arms on the 32k straight-chain + mid-kink problem (tests/test_solver_scale
.py geometry), 2 GN steps, auto coarse (stride 16, 2 levels), cg=64:
  f32        — everything f32 (the documented failure)
  f32+mv64   — f32 storage/precond/coarse; Hx and CG dots in f64
  f64        — everything f64 (upper bound)
Metrics: kink gap |y[n/2]-y[n/2-1]| (target < 1e-2), anchor errors, chi2.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 AVAILABLE; arms cast explicitly
jax.config.update("jax_compilation_cache_dir", "/tmp/scl_slam_jax_cache_prof2")

import jax.numpy as jnp
import numpy as np

from scl_slam_tpu.geometry import se3
from scl_slam_tpu.graph import factors as F
from scl_slam_tpu.graph import solver as S

N = 32768
CG = 64
GN = 2
STRIDE, LEVELS = 16, 2


def straight_chain(n, dtype):
    gt_t = jnp.stack(
        [jnp.arange(n, dtype=dtype), jnp.zeros(n, dtype), jnp.zeros(n, dtype)],
        axis=-1)
    gt = se3.Pose(jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3)), gt_t)
    g = F.make_graph(n + 8, 4)
    g = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype in (jnp.float32, jnp.float64)
        else a, g)
    g = F.add_prior(g, 0, se3.index(gt, 0), [1e3] * 6)
    z = se3.Pose(
        jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n - 1, 3, 3)),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], dtype), (n - 1, 3)))
    g = F.add_between_block(g, jnp.arange(n - 1), jnp.arange(1, n), z,
                            [1e2] * 6)
    for (a, b) in [(0, n - 1), (0, n // 2), (n // 4, 3 * n // 4)]:
        zl = se3.between(se3.index(gt, a), se3.index(gt, b))
        g = F.add_between(g, a, b, zl, [1e2] * 6)
    return g, gt


def gn_solve(g, init, dtype, mv64):
    """2 GN steps with the solver's own linearize/precond/coarse pieces,

    CG in the script so the matvec/dot precision is swappable."""
    n_poses = init.t.shape[0]
    eye6 = jnp.eye(6, dtype=dtype)
    poses = init

    for _ in range(GN):
        r_e, JiT, JjT, w_e, r_p, JpT, w_p = S._linearize(g, poses, 1e9)
        Hi = jnp.einsum("abe,ea,ace->ebc", JiT, w_e, JiT)
        Hj = jnp.einsum("abe,ea,ace->ebc", JjT, w_e, JjT)
        Hp = jnp.einsum("abp,pa,acp->pbc", JpT, w_p, JpT)
        H_diag = jnp.zeros((n_poses, 6, 6), dtype)
        H_diag = (H_diag.at[g.i].add(Hi).at[g.j].add(Hj)
                  .at[g.prior_idx].add(Hp))
        mag = jnp.maximum(jax.vmap(jnp.diag)(H_diag).max(-1), 1.0)
        damp = (1e-6 * mag + 1e-6)[:, None, None] * eye6
        D = H_diag + damp
        b = jnp.zeros((n_poses, 6), dtype)
        b = b.at[g.i].add(-jnp.einsum("abe,ea->eb", JiT, w_e * r_e))
        b = b.at[g.j].add(-jnp.einsum("abe,ea->eb", JjT, w_e * r_e))
        b = b.at[g.prior_idx].add(-jnp.einsum("abp,pa->pb", JpT, w_p * r_p))
        L = jnp.linalg.cholesky(D)

        # mid-level jacobi + dense coarsest, straight from the solver
        Hij = None  # (solver's mid-level uses only diagonals; skip Hij)
        jacobi = []
        for lvl in range(1, LEVELS):
            stride_l = STRIDE ** lvl
            C = (n_poses + stride_l - 1) // stride_l
            cidx = jnp.arange(n_poses) // stride_l
            Dl = jnp.zeros((C, 6, 6), dtype).at[cidx].add(D)
            sl = jax.lax.rsqrt(
                jnp.maximum(jnp.diagonal(Dl, axis1=1, axis2=2), 1e-20))
            Ll = jnp.linalg.cholesky(
                Dl * sl[:, :, None] * sl[:, None, :] + 1e-5 * eye6)
            jacobi.append((cidx, sl, Ll))
        coarse_apply = S.make_dense_coarse(
            poses, JiT, JjT, JpT, w_e, w_p, g.i, g.j, g.prior_idx,
            n_poses, STRIDE ** LEVELS)

        def precond(v):
            z = jax.scipy.linalg.cho_solve((L, True), v[..., None])[..., 0]
            for cidx_l, sl, Ll in jacobi:
                vc = jnp.zeros((Ll.shape[0], 6), v.dtype).at[cidx_l].add(v)
                zc = (jax.scipy.linalg.cho_solve(
                    (Ll, True), (sl * vc)[..., None])[..., 0] * sl)
                z = z + zc[cidx_l]
            return z + coarse_apply(v)

        if mv64:
            g64 = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float64)
                if a.dtype == jnp.float32 else a, g)
            JiT64, JjT64, JpT64 = (x.astype(jnp.float64)
                                   for x in (JiT, JjT, JpT))
            w_e64, w_p64 = w_e.astype(jnp.float64), w_p.astype(jnp.float64)
            damp64 = damp.astype(jnp.float64)

            def Hx(v):  # f32 in, f64 compute, f32 out
                y = S._apply_H(v.astype(jnp.float64), g64, JiT64, JjT64,
                               w_e64, JpT64, w_p64, damp64)
                return y.astype(jnp.float32)

            def dot(a, c):
                return jnp.sum(a.astype(jnp.float64) * c.astype(jnp.float64))
        else:
            def Hx(v):
                return S._apply_H(v, g, JiT, JjT, w_e, JpT, w_p, damp)

            def dot(a, c):
                return jnp.sum(a * c)

        x = precond(b) * 0.0
        x = coarse_apply(b)                      # coarse-first start
        r = b - Hx(x)
        z = precond(r)
        p = z
        rz = dot(r, z)
        for _ in range(globals().get("_CG_OVERRIDE", CG)):
            Ap = Hx(p)
            alpha = (rz / jnp.maximum(dot(p, Ap), 1e-30)).astype(dtype)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = dot(r, z)
            beta = (rz_new / jnp.maximum(rz, 1e-30)).astype(dtype)
            p = z + beta * p
            rz = rz_new
        poses = se3.Pose(
            jax.vmap(lambda Rm, wv: Rm @ se3.to_matrix(
                se3.exp(wv))[:3, :3])(poses.R, x[:, :3])
            if False else poses.R,               # translation-only problem
            poses.t + x[:, 3:],
        )
    chi = float(F.chi2(g, poses))
    return poses, chi


def report(name, poses, chi):
    y = np.asarray(poses.t[:N, 1])
    kink = abs(y[N // 2] - y[N // 2 - 1])
    anchors = {k: abs(float(y[k])) for k in (0, N // 2, N - 1)}
    print(f"{name}: kink gap {kink:9.2e}  chi2 {chi:10.3e}  "
          f"anchors {[f'{v:.1e}' for v in anchors.values()]}  "
          f"max|y| {np.max(np.abs(y)):.2e}", flush=True)


def main():
    # production solve arm (the real code path, auto coarse)
    g, gt = straight_chain(N, jnp.float32)
    init = se3.Pose(gt.R, gt.t.at[N // 2:, 1].add(4.0))
    res = S.solve(g, init, gn_iters=GN, cg_iters=CG, coarse_stride=-1)
    report("prod f32 ", res.poses, float(res.chi2_history[-1]))

    for name, dtype, mv64, cg in (("f32 cg0  ", jnp.float32, False, 0),
                                  ("f64 cg0  ", jnp.float64, False, 0),
                                  ("f32      ", jnp.float32, False, CG),
                                  ("f32+mv64 ", jnp.float32, True, CG),
                                  ("f64      ", jnp.float64, False, CG)):
        global _CG_OVERRIDE
        _CG_OVERRIDE = cg
        g, gt = straight_chain(N, dtype)
        init = se3.Pose(gt.R, gt.t.at[N // 2:, 1].add(4.0))
        poses, chi = gn_solve(g, init, dtype, mv64)
        report(name, poses, chi)


if __name__ == "__main__":
    main()
