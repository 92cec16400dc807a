"""Geometric verification: Kabsch/SVD alignment, batched ICP, RANSAC.

TPU-native replacements for the PCL registration stack the reference uses for
loop verification:

- intra-robot: ``pcl::IterativeClosestPoint`` (maxCorr 100, 50 iters,
  reference ``include/distributedMapping.h:1108-1126``);
- inter-robot: ``CorrespondenceEstimation`` + ``CorrespondenceRejectorSampleConsensus``
  (RANSAC) + ``TransformationEstimationSVD``
  (reference ``include/distributedMapping.h:1210-1243``).

All routines are fixed-shape, jittable, vmappable: correspondence search is a
tiled brute-force nearest-neighbor (distance-matrix blocks are matmul-shaped
and tile onto the MXU), the rigid solve is closed-form Kabsch via 3x3 SVD,
ICP iterations run under ``lax.while_loop`` with an update-norm stopping
tolerance (callers are sequential, so early exit saves whole NN passes).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from .pointcloud import PAD_VALUE, Cloud


class ICPResult(NamedTuple):
    pose: se3.Pose          # transform mapping source into target frame
    fitness: jax.Array      # mean squared distance over inlier correspondences
    inlier_frac: jax.Array  # fraction of valid source points with a match
    converged: jax.Array    # bool: update fell below tolerance


def kabsch(
    src: jax.Array, dst: jax.Array, weights: jax.Array
) -> se3.Pose:
    """Weighted rigid alignment: argmin_T sum_i w_i |T(src_i) - dst_i|^2.

    Closed-form via SVD of the weighted cross-covariance (the
    ``TransformationEstimationSVD`` equivalent). Shapes: src/dst [..., N, 3],
    weights [..., N]. Batched over leading dims.

    A scaled-Newton polar decomposition was tried here and measured SLOWER
    than jnp.linalg.svd on TPU (99 vs 33 us per ICP iteration): six 3x3
    inverse steps form a long serial chain of tiny VPU ops, while XLA's
    small-matrix SVD is one fused kernel. Keep SVD.
    """
    w = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-9)
    mu_s = jnp.sum(src * w[..., None], axis=-2)
    mu_d = jnp.sum(dst * w[..., None], axis=-2)
    cs = src - mu_s[..., None, :]
    cd = dst - mu_d[..., None, :]
    H = jnp.einsum("...ni,...n,...nj->...ij", cs, w, cd)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    D = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )
    R = jnp.einsum("...ji,...j,...kj->...ik", Vt, D, U)  # V diag(D) U^T
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s)
    return se3.Pose(R, t)


def rigid_from_triangles(src: jax.Array, dst: jax.Array) -> se3.Pose:
    """Closed-form rigid transform from 3-point correspondences.

    Builds an orthonormal frame on each triangle (edge, in-plane normal
    component, plane normal) and maps one onto the other: R = F_dst F_src^T,
    t from centroid alignment. Exact for congruent triples; for noisy ones
    it is the standard RANSAC minimal-sample estimator — hypotheses don't
    need least-squares optimality (scoring + the inlier refine do). Unlike
    :func:`kabsch` it involves NO SVD: thousands of per-hypothesis 3x3
    SVDs are the dominant cost of batched RANSAC on TPU (XLA lowers small
    batched SVD poorly), while this is a handful of VPU ops.

    src/dst: [..., 3, 3] (three points x xyz). Degenerate (collinear /
    duplicated) triples produce finite but non-orthonormal (down to zero)
    frames — callers MUST gate them out with :func:`triangles_ok`: a
    zero-rotation "hypothesis" maps every point to one target and racks
    up inliers precisely on the collapsed many-to-one NN correspondences
    of a FALSE match (measured: a 37 m-wrong loop accepted at ratio 0.52
    because 535/1024 sources matched one submap boundary point).
    """
    eps = 1e-12

    def frame(p):
        u = p[..., 1, :] - p[..., 0, :]
        v = p[..., 2, :] - p[..., 0, :]
        e1 = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + eps)
        w = jnp.cross(e1, v)
        e3 = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + eps)
        e2 = jnp.cross(e3, e1)
        return jnp.stack([e1, e2, e3], axis=-1)            # columns

    Fs = frame(src)
    Fd = frame(dst)
    R = Fd @ jnp.swapaxes(Fs, -1, -2)
    cs = jnp.mean(src, axis=-2)
    cd = jnp.mean(dst, axis=-2)
    t = cd - jnp.einsum("...ij,...j->...i", R, cs)
    return se3.Pose(R, t)


def triangles_ok(p: jax.Array, min_sin: float = 1e-2) -> jax.Array:
    """Validity of 3-point minimal samples: non-collinear, distinct.

    p [..., 3, 3]. True where the triangle's sine of the opening angle
    exceeds ``min_sin`` (|u x v| > min_sin |u||v|, with |u|,|v| > 0).
    Standard RANSAC sample rejection: a degenerate triple does not
    determine a rigid transform, and scoring it anyway lets collapse
    artifacts win (see :func:`rigid_from_triangles`).
    """
    u = p[..., 1, :] - p[..., 0, :]
    v = p[..., 2, :] - p[..., 0, :]
    nu = jnp.linalg.norm(u, axis=-1)
    nv = jnp.linalg.norm(v, axis=-1)
    area = jnp.linalg.norm(jnp.cross(u, v), axis=-1)
    return (nu > 1e-6) & (nv > 1e-6) & (area > min_sin * nu * nv)


def nearest_neighbors(
    query: jax.Array, target: jax.Array, block: int = 256
) -> tuple[jax.Array, jax.Array]:
    """Brute-force 1-NN of each query point in target.

    query [Nq, 3], target [Nt, 3] (invalid points at PAD_VALUE sort last
    naturally). Returns (sq_dist [Nq], index [Nq]).

    On TPU with tile-divisible shapes this dispatches to the Pallas
    streaming kernel (ops/pallas_kernels.py), which keeps the running
    (min, argmin) in VMEM instead of materializing the [Nq, Nt] distance
    matrix in HBM — ~4x faster at ICP shapes (124 -> 31 us at 1024x8192,
    scripts/profile_nn_tiles.py). Other backends/shapes use the tiled
    matmul-form fallback below.
    """
    from . import pallas_kernels as pk

    nq = query.shape[0]
    if (
        jax.default_backend() != "cpu"
        and nq % pk.TQ == 0
        and pk.pick_target_tile(target.shape[0]) is not None
    ):
        return pk.nearest_neighbors_pallas(query, target)
    t_sq = jnp.sum(target * target, axis=-1)

    def one_block(q):
        # expanded matmul form on the MXU. The package-wide
        # precision=highest (6 bf16 passes) keeps it f32-exact — bf16
        # single-pass randomized argmins at meter scales — and at ICP
        # scale ([4096, 8192] per iteration) the MXU form is ~10x faster
        # than exact VPU per-coordinate differences.
        d2 = jnp.maximum(
            jnp.sum(q * q, axis=-1, keepdims=True)
            - 2.0 * (q @ target.T)
            + t_sq[None, :],
            0.0,
        )
        idx = jnp.argmin(d2, axis=-1)
        return jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0], idx

    # pad to a whole number of blocks: the blocked map needs block | nq
    # (a 1000-point query crashed the reshape before this; fuzz r3)
    rem = (-nq) % block if nq > block else 0
    q = (
        jnp.concatenate(
            [query, jnp.full((rem, 3), PAD_VALUE, query.dtype)]
        )
        if rem
        else query
    )
    nb = max(1, q.shape[0] // block)
    d2, idx = jax.lax.map(one_block, q.reshape(nb, -1, 3))
    return d2.reshape(-1)[:nq], idx.reshape(-1)[:nq]


def nearest_select(
    query: jax.Array, payload: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """1-NN with fused per-match payload selection.

    payload [P, Nt]: rows 0-2 are the target cloud (invalid points already
    at PAD_VALUE), rows 3.. arbitrary per-point extras (validity mask,
    normals, ...). Returns (sq_dist [Nq], selected payload [P, Nq]).

    On TPU this runs as one Pallas pass that keeps the running best match's
    payload in VMEM (ops/pallas_kernels.py::nn_select_pallas) — the
    ``target[idx]`` / ``mask[idx]`` HBM row gathers it replaces cost ~17 us
    per ICP iteration at 1024x8192 (rows of a [Nt, 3] array are 3->128
    lane-padded). Other backends/shapes fall back to argmin + gather.
    """
    from . import pallas_kernels as pk

    nq, nt = query.shape[0], payload.shape[1]
    if (
        jax.default_backend() != "cpu"
        and nq % pk.TQ == 0
        and pk.pick_target_tile(nt) is not None
        and payload.shape[0] % 4 == 0
    ):
        return pk.nn_select_pallas(query, payload)
    d2, idx = nearest_neighbors(query, payload[:3].T)
    return d2, payload[:, idx]


# Stall exit: an ICP lane whose update norm stops shrinking (no 10%
# improvement for STALL_PATIENCE consecutive iterations) is oscillating
# around its attractor and will not reach tol — iterating further changes
# the final fitness by noise only. Spurious loop candidates (descriptor
# false positives on self-similar scenes) are exactly these lanes, and on
# TPU each while_loop iteration carries a ~0.3 ms floor of small-kernel
# launches (Kabsch/compose glue) regardless of NN size, so freezing them
# early is a large verification-path saving.
#
# The exit is only armed once the update is already SMALL IN ABSOLUTE
# TERMS (delta < STALL_ABS_FACTOR * tol): ICP converging linearly at rate
# rho >= STALL_RATIO (common near partial-overlap attractors, sliding
# along surfaces) would otherwise be frozen with remaining motion
# ~ delta * rho / (1 - rho) unresolved — unbounded as rho -> 1. Arming at
# 100*tol (1e-2 m/rad at the default tol) bounds the abandoned motion to
# ~0.1 m at rho = 0.9, well under the loop-factor noise floor (fitness
# gate 0.3 => sigma ~0.55 m), while still cutting the converged tail.
STALL_RATIO = 0.9
STALL_PATIENCE = 3
STALL_ABS_FACTOR = 100.0

# trace-time switch for the fused-moments batched ICP path. Default OFF:
# the within-process A/B measured it perf-NEUTRAL on the replay workload
# (938 vs 957 frames/s — inside the scanned chunk XLA already fuses the
# per-iteration glue the kernel removes; the standalone profiles that
# motivated it were measuring dispatch floor). Kept because it halves the
# iteration's HBM traffic ([B,4,N] selection never materializes), which
# matters at larger-than-bench shapes; see scripts/profile_icp_fused_ab.py.
FUSED_ICP = False

# trace-time switch for the MXU-form NN selection inside batched ICP
# iterations (see _matches_batched / pallas_kernels._nn_select_batched_
# mxu_kernel). Selection ordering only — the winner's distance is always
# recomputed exactly, and the final fitness pass always uses the exact
# kernel. Default OFF: the on-chip interleaved A/B measured it ~23%
# SLOWER end-to-end (1106 vs 1431 frames/s, scripts/profile_mxu_nn_ab.py)
# — the cm-scale selection noise flips near-tie winners between
# iterations, so lanes stop reaching `delta < tol` and burn extra
# iterations to the stall exit, outweighing the ~3x VPU op reduction
# (and a K=3 HIGHEST-precision contraction is a poor MXU fit anyway).
MXU_NN = False
# index-form batched NN (argmin index out of the kernel + one XLA payload
# gather) instead of the in-kernel one-hot payload selection. The kernel
# alone is 2.2x faster (0.97 vs 2.12 ms/pass at 32x1024x8192,
# scripts/profile_icp_kernel_variants.py). Default OFF until the in-chunk
# interleaved A/B (scripts/profile_nn_index_ab.py) confirms the end-to-end
# win — the XLA payload gather it adds outside the kernel is unmeasured
# in-chunk, and the headline must not ride on an unproven path.
NN_INDEX = False
# selection algorithm inside the batched NN kernels: "mineq" (r5) drops
# the argmin + iota-compare passes — selection is an equality one-hot
# against the tile min, count-normalized for exact-d2 ties (bit-exact on
# the kernel A/B, 2.10 -> 1.58 ms/pass at 32x1024x8192,
# scripts/profile_icp_kernel_variants.py). Default after the in-chunk
# interleaved A/B confirmed the end-to-end win: +3.3%, 1570 vs 1520
# frames/s, every rep ordered (scripts/profile_select_mineq_ab.py;
# docs/roofline.md).
SELECT_VARIANT = "mineq"
# fused Pallas RANSAC hypothesis scoring (r5): counts computed as
# register-resident vector passes instead of the XLA [B, Hc, N] HBM
# slab, which the standalone roofline measured HBM-bound at ~6.3
# us/hypothesis (docs/roofline.md RANSAC section). Default OFF: the
# interleaved fleet-step A/B measured it 6% SLOWER end-to-end (1251 vs
# 1333 frames/s, every rep ordered, results exactly equal —
# scripts/profile_ransac_scoring_ab.py). Inside the big fused fleet
# program XLA pipelines the slab's HBM traffic behind other phases,
# while the kernel's (B, H/8) grid of short [4, N]-vector steps pays
# per-step overhead the standalone marginal hid — the same
# kernel-wins/chunk-loses shape as the r4 NN index+gather rejection.
# Kept for shapes where the slab genuinely thrashes (H*N >> VMEM-scale,
# e.g. reference-style H=1000-2000 at larger N).
RANSAC_FUSED_SCORING = False

# Hopeless-lane exit: a lane whose updates have stalled AND whose current
# mean-square correspondence distance is still HOPELESS_MARGIN x the
# caller's accept gate (``gate_fitness``) is frozen: flipping the gate
# decision would need the RMS correspondence distance to halve, but at
# stall the per-iteration motion has collapsed to a fraction of an
# already-small step. This recovers the round-1 early-exit throughput on
# descriptor false positives (which stall far above the gate) while true
# loops anywhere near the gate keep iterating to tol — the bounded-error
# form of the stall exit ADVICE r1 asked for. gate_fitness=inf disables.
HOPELESS_MARGIN = 4.0

# The coarse stage of coarse-to-fine ICP only needs to land inside the
# fine stage's convergence basin (a fraction of max_corr_dist), not at the
# final tol: running the 1/f-resolution loop down to icp_tol (~0.1 mm)
# burns NN passes the full-resolution polish repeats anyway. 30x of a
# 1e-4 tol is 3 mm / 3 mrad — far inside any basin the coarse stage can
# certify at its own correspondence resolution.
COARSE_TOL_FACTOR = 30.0


def _icp_stage(
    src, smask, payload, init, max_iters, max_corr_dist, tol,
    gate_fitness=jnp.inf,
):
    """One ICP while_loop over fixed correspondence resolution.

    lax.while_loop, not scan: callers run ICP sequentially (one verify per
    frame under the batch scan / fleet scan), so stopping at convergence
    saves real NN passes — the per-iteration cost (~53 us at 1024x8192)
    dominates the verification path and typical yaw-initialized loops
    converge well before the max_iters budget. Returns
    (pose, delta, converged, last_ms, last_ngood) — the last two are the
    fitness statistics of the final iteration (at the pose one sub-``tol``
    update before the returned one; see ``_icp_stage_batched``).
    """

    def cond(carry):
        i, _pose, _delta, _stall, done, _ms, _ng = carry
        return (i < max_iters) & ~done

    def body(carry):
        i, pose, prev_delta, stall, _, _ms, _ng = carry
        moved = se3.transform_points(pose, src)
        d2, sel = nearest_select(moved, payload)
        matched = sel[:3].T
        good = smask & (sel[3] > 0.5) & (d2 < max_corr_dist * max_corr_dist)
        w = good.astype(src.dtype)
        update = kabsch(moved, matched, w)
        new_pose = se3.compose(update, pose)
        # cheap update magnitude: |t| + |R - I|_F (= 2*sqrt(2)*sin(theta/2),
        # ~sqrt(2)*theta for small angles) — same convergence semantics as
        # |se3.log| at tol scales, without log's trig/series evaluation
        # (~12 us/iteration on TPU)
        delta = jnp.linalg.norm(update.t) + jnp.linalg.norm(
            update.R - jnp.eye(3, dtype=src.dtype)
        )
        n_good = jnp.sum(w)
        ms = jnp.where(
            n_good > 0,
            jnp.sum(jnp.where(good, d2, 0.0)) / jnp.maximum(n_good, 1.0),
            jnp.inf,
        )
        stall = jnp.where(delta < STALL_RATIO * prev_delta, 0, stall + 1)
        stalled = stall >= STALL_PATIENCE
        stall_armed = delta < STALL_ABS_FACTOR * tol
        hopeless = stalled & (ms > HOPELESS_MARGIN * gate_fitness)
        done = (delta < tol) | (stall_armed & stalled) | hopeless
        return (i + 1, new_pose, delta, stall, done, ms, n_good)

    _, pose, delta, _stall, _done, last_ms, last_ng = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.array(0),
            init,
            jnp.array(jnp.inf, src.dtype),
            jnp.array(0),
            jnp.array(False),
            jnp.array(jnp.inf, src.dtype),
            jnp.array(0.0, src.dtype),
        ),
    )
    return pose, delta, delta < tol, last_ms, last_ng


def icp(
    source: Cloud,
    target: Cloud,
    init: se3.Pose | None = None,
    max_iters: int = 30,
    max_corr_dist: float = 10.0,
    tol: float = 1e-6,
    coarse_factor: int = 1,
    gate_fitness: float = jnp.inf,
    target_stride: int = 1,
    reuse_final_fitness: bool = False,
) -> ICPResult:
    """Point-to-point ICP with early exit at the update-norm tolerance.

    Semantics follow the reference's intra-loop verification
    (``include/distributedMapping.h:1108-1126``): fitness = mean squared
    correspondence distance over matches within ``max_corr_dist`` (PCL
    ``getFitnessScore`` analog), compared against
    ``historyKeyframeFitnessScore`` by the caller.

    ``coarse_factor`` > 1 enables a coarse-to-fine schedule: a first
    while_loop iterates on every ``coarse_factor``-th source/target point
    (1/f^2 of the NN pairs per iteration — the NN pass is the whole cost
    of verification), then the full-resolution loop polishes from the
    coarse pose, typically in a couple of iterations. Both clouds are
    scramble/hash-ordered at rest (see ops.pointcloud downsamplers), so a
    strided slice is a spatially uniform subsample. Fitness is always
    computed at full resolution.

    ``gate_fitness``: the caller's fitness accept threshold (mean squared
    correspondence distance). When finite, enables the hopeless-lane exit
    (see HOPELESS_MARGIN); never changes the result of a run that ends
    anywhere near the gate.

    ``target_stride``: mid-resolution stage between the coarse stage and
    the full-resolution loop — full source against every s-th target
    point, to the loose coarse tolerance. The full-resolution loop still
    runs to ``tol`` from that warm start (a few polish iterations instead
    of the whole descent), and fitness stays full-resolution. 1 disables.
    """
    if init is None:
        init = se3.identity(dtype=source.xyz.dtype)
    tgt = jnp.where(target.mask[:, None], target.xyz, PAD_VALUE)
    src = source.xyz
    smask = source.mask
    # target payload for the fused NN+select pass: xyz rows + validity row
    payload = jnp.concatenate(
        [tgt.T, target.mask[None].astype(src.dtype)], axis=0
    )                                                               # [4, Nt]

    f = coarse_factor
    if f > 1 and src.shape[0] % f == 0 and payload.shape[1] % f == 0:
        init, _, _, _, _ = _icp_stage(
            src[::f], smask[::f], payload[:, ::f], init,
            max_iters, max_corr_dist, COARSE_TOL_FACTOR * tol,
            gate_fitness,
        )
    s = target_stride
    if s > 1 and payload.shape[1] % s == 0:
        init, _, _, _, _ = _icp_stage(
            src, smask, payload[:, ::s], init,
            max_iters, max_corr_dist, COARSE_TOL_FACTOR * tol,
            gate_fitness,
        )
    pose, delta, converged, last_ms, last_ng = _icp_stage(
        src, smask, payload, init, max_iters, max_corr_dist, tol,
        gate_fitness,
    )

    if reuse_final_fitness:
        # fitness from the final full-resolution iteration (bounded
        # O(tol) value change; see icp_batched's inline note)
        n_good = last_ng
        fitness = jnp.where(n_good > 0, last_ms, jnp.inf)
    else:
        # final fitness with converged pose
        moved = se3.transform_points(pose, src)
        d2, sel = nearest_select(moved, payload)
        good = (
            smask & (sel[3] > 0.5) & (d2 < max_corr_dist * max_corr_dist)
        )
        n_good = jnp.sum(good)
        fitness = jnp.where(
            n_good > 0,
            jnp.sum(jnp.where(good, d2, 0.0)) / jnp.maximum(n_good, 1),
            jnp.inf,  # no correspondences: never passes the gate
        )
    inlier_frac = n_good / jnp.maximum(jnp.sum(smask), 1)
    return ICPResult(pose, fitness, inlier_frac, converged)


def _matches_batched(src, smask, payload, pose, lanes, max_corr_dist,
                     exact=False):
    """Batched NN pass for the given active-lane mask; frozen lanes skip
    all tile compute in the predicated kernel (d2=inf, sel=0 for them).

    When ``MXU_NN`` is enabled (default OFF — the A/B measured it ~23%
    slower end-to-end, see ROADMAP §7) the TPU path is the MXU-form
    kernel (cross term as one HIGHEST-precision matmul, ~3x fewer VPU ops
    per pair): SELECTION runs on centimeter-accurate recentred distances,
    then the winner's distance is recomputed exactly in per-coordinate
    f32 — so the d2/good this returns are exact GIVEN the selection, and
    only near-tie neighbor choices (both genuinely near) can differ from
    the exact kernel. The default path is the exact per-coordinate kernel.
    ``exact=True`` forces the exact per-coordinate kernel — used for the
    final fitness pass, whose value feeds the accept gate and the loop
    factor noise model.
    """
    from . import pallas_kernels as pk

    nq, nt = src.shape[1], payload.shape[2]
    predicated = (
        jax.default_backend() != "cpu"
        and nq % pk.TQ == 0
        and pk.pick_target_tile(nt) is not None
    )
    moved = se3.transform_points(pose, src)                 # [B, N, 3]
    if predicated and not exact and MXU_NN:
        # recentre at the per-lane valid-target centroid: the expanded-form
        # absolute error is eps * |coords|^2, so selection quality needs
        # coordinates at submap scale, not map scale
        tmask = payload[:, 3] > 0.5                          # [B, Nt]
        msum = jnp.maximum(jnp.sum(tmask, axis=-1), 1)
        center = (
            jnp.sum(jnp.where(tmask[:, None, :], payload[:, 0:3], 0.0), -1)
            / msum[:, None]
        )                                                    # [B, 3]
        payload_c = payload.at[:, 0:3, :].add(-center[:, :, None])
        _, sel = pk.nn_select_batched_mxu_pallas(
            moved - center[:, None, :], payload_c, lanes
        )
        sel = sel.at[:, 0:3, :].add(center[:, :, None])
        matched = jnp.swapaxes(sel[:, :3], -1, -2)           # [B, N, 3]
        # exact distance of the selected pair (per-coordinate f32)
        d2 = jnp.sum(jnp.square(moved - matched), axis=-1)
        d2 = jnp.where(lanes[:, None], d2, jnp.inf)
    else:
        if predicated and NN_INDEX:
            # index-form kernel + ONE take_along_axis payload gather:
            # measured 2.12 -> 0.97 ms/pass at 32x1024x8192 for the kernel
            # itself (scripts/profile_icp_kernel_variants.py) — the
            # in-kernel one-hot payload selection cost more than the NN.
            # Selection semantics identical (same argmin); gathered rows
            # are exact.
            d2, idx = pk.nn_index_batched_pallas(moved, payload, lanes)
            sel = jnp.take_along_axis(
                payload, idx[:, None, :], axis=2
            )                                                # [B, P, N]
            # inactive lanes: idx=0 gathers arbitrary rows — restore the
            # select-kernel contract (zero payload) so validity is False
            sel = jnp.where(lanes[:, None, None], sel, 0.0)
        elif predicated:
            d2, sel = pk.nn_select_batched_pallas(
                moved, payload, lanes, variant=SELECT_VARIANT
            )
        else:
            d2, sel = jax.vmap(nearest_select)(moved, payload)
        matched = jnp.swapaxes(sel[:, :3], -1, -2)           # [B, N, 3]
    good = (
        smask
        & (sel[:, 3] > 0.5)
        & (d2 < max_corr_dist * max_corr_dist)
    )
    return moved, d2, matched, good


def _icp_stage_batched(
    src, smask, payload, R0, t0, done0, max_iters, max_corr_dist, tol,
    gate_fitness=jnp.inf,
):
    """Batched-lane ICP while_loop at one correspondence resolution.

    Returns (R, t, delta, done, last_ms, last_ngood): last_ms/last_ngood
    are each lane's mean-squared correspondence distance and inlier count
    from its LAST active iteration — i.e. fitness statistics at the pose
    one sub-``tol`` update before the returned one, which callers at the
    full resolution can reuse to skip the separate final fitness pass
    (a whole NN pass per verification; see ``icp_batched``). Lane
    semantics as in :func:`icp_batched`.
    """
    B = src.shape[0]
    dtype = src.dtype
    eye = jnp.eye(3, dtype=dtype)

    def cond(carry):
        i, _R, _t, _delta, _stall, done, _ms, _ng = carry
        return (i < max_iters) & jnp.any(~done)

    def body(carry):
        i, R, t, delta, stall, done, last_ms, last_ng = carry
        pose = se3.Pose(R, t)
        moved, d2, matched, good = _matches_batched(
            src, smask, payload, pose, ~done, max_corr_dist
        )
        w = good.astype(dtype)
        update = kabsch(moved, matched, w)
        new_pose = se3.compose(update, pose)
        ndelta = jnp.linalg.norm(update.t, axis=-1) + jnp.linalg.norm(
            update.R - eye, axis=(-2, -1)
        )
        n_good = jnp.sum(w, axis=-1)
        ms = jnp.where(
            n_good > 0,
            jnp.sum(jnp.where(good, d2, 0.0), axis=-1)
            / jnp.maximum(n_good, 1.0),
            jnp.inf,
        )
        keep = done[:, None, None]
        R = jnp.where(keep, R, new_pose.R)
        t = jnp.where(done[:, None], t, new_pose.t)
        last_ms = jnp.where(done, last_ms, ms)
        last_ng = jnp.where(done, last_ng, n_good)
        stall = jnp.where(
            done, stall, jnp.where(ndelta < STALL_RATIO * delta, 0, stall + 1)
        )
        delta = jnp.where(done, delta, ndelta)
        stalled = stall >= STALL_PATIENCE
        stall_armed = delta < STALL_ABS_FACTOR * tol
        hopeless = stalled & (ms > HOPELESS_MARGIN * gate_fitness)
        done = done | (delta < tol) | (stall_armed & stalled) | hopeless
        return (i + 1, R, t, delta, stall, done, last_ms, last_ng)

    _, R, t, delta, _stall, done, last_ms, last_ng = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.array(0), R0, t0, jnp.full((B,), jnp.inf, dtype),
            jnp.zeros((B,), jnp.int32), done0,
            jnp.full((B,), jnp.inf, dtype), jnp.zeros((B,), dtype),
        ),
    )
    return R, t, delta, done, last_ms, last_ng


# ---------------------------------------------------------------------------
# fused-moments batched ICP (TPU fast path)
# ---------------------------------------------------------------------------


def _kabsch_from_moments(m, dtype):
    """Rigid update from the fused kernel's moment vectors [B, 128].

    Same math as :func:`kabsch` on (moved, matched, w): the weighted
    cross-covariance is reconstructed from uncentered moments (the caller
    recenters the problem near the origin so the subtraction is
    well-conditioned). Lanes with no correspondences return identity."""
    from . import pallas_kernels as pk

    sw_raw = m[:, pk.M_W]
    sw = jnp.maximum(sw_raw, 1e-9)[:, None]
    mu_s = m[:, pk.M_S : pk.M_S + 3] / sw
    mu_d = m[:, pk.M_D : pk.M_D + 3] / sw
    cross = m[:, pk.M_CROSS : pk.M_CROSS + 9].reshape(-1, 3, 3) / sw[
        :, :, None
    ]
    H = cross - mu_s[:, :, None] * mu_d[:, None, :]
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = jnp.einsum("bji,bj,bkj->bik", Vt, D, U)
    t = mu_d - jnp.einsum("bij,bj->bi", R, mu_s)
    none = (sw_raw < 0.5)[:, None]
    eye = jnp.eye(3, dtype=dtype)
    R = jnp.where(none[..., None], eye, R)
    t = jnp.where(none, jnp.zeros_like(t), t)
    return se3.Pose(R, t)


def _icp_stage_batched_fused(
    src4, payload4, R0, t0, done0, max_iters, max_corr_dist, tol,
    gate_fitness=jnp.inf,
):
    """Batched-lane ICP at one resolution via the fused moments kernel.

    ONE Pallas pass per iteration (per-lane transform + streaming NN +
    correspondence gate + Kabsch moment reductions), leaving only [B,3,3]
    glue outside — replaces the [B,4,N] selection materialization + ~dozen
    elementwise/reduction ops of :func:`_icp_stage_batched`.
    src4 [B,4,Nq] LOCAL source rows+mask; payload4 [B,4,Nt].
    """
    from . import pallas_kernels as pk

    B = src4.shape[0]
    dtype = src4.dtype
    eye = jnp.eye(3, dtype=dtype)

    def moments(R, t, act):
        pose_rows = (
            jnp.zeros((B, 128), jnp.float32)
            .at[:, 0:9].set(R.reshape(B, 9))
            .at[:, 9:12].set(t)
        )
        return pk.icp_moments_batched_pallas(
            src4, payload4, pose_rows, act, max_corr_dist,
            variant=SELECT_VARIANT,
        )

    def cond(carry):
        i, _R, _t, _delta, _stall, done = carry
        return (i < max_iters) & jnp.any(~done)

    def body(carry):
        i, R, t, delta, stall, done = carry
        m = moments(R, t, ~done)
        update = _kabsch_from_moments(m, dtype)
        new_pose = se3.compose(update, se3.Pose(R, t))
        ndelta = jnp.linalg.norm(update.t, axis=-1) + jnp.linalg.norm(
            update.R - eye, axis=(-2, -1)
        )
        n_good = m[:, pk.M_W]
        ms = jnp.where(
            n_good > 0,
            m[:, pk.M_WD2] / jnp.maximum(n_good, 1.0),
            jnp.inf,
        )
        keep = done[:, None, None]
        R = jnp.where(keep, R, new_pose.R)
        t = jnp.where(done[:, None], t, new_pose.t)
        stall = jnp.where(
            done, stall, jnp.where(ndelta < STALL_RATIO * delta, 0, stall + 1)
        )
        delta = jnp.where(done, delta, ndelta)
        stalled = stall >= STALL_PATIENCE
        stall_armed = delta < STALL_ABS_FACTOR * tol
        hopeless = stalled & (ms > HOPELESS_MARGIN * gate_fitness)
        done = done | (delta < tol) | (stall_armed & stalled) | hopeless
        return (i + 1, R, t, delta, stall, done)

    _, R, t, delta, _stall, done = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.array(0), R0, t0, jnp.full((B,), jnp.inf, dtype),
            jnp.zeros((B,), jnp.int32), done0,
        ),
    )
    return R, t, delta, done


def icp_batched(
    source: Cloud,
    target: Cloud,
    init: se3.Pose,
    active: jax.Array,
    max_iters: int = 30,
    max_corr_dist: float = 10.0,
    tol: float = 1e-6,
    coarse_factor: int = 1,
    gate_fitness: float = jnp.inf,
    target_stride: int = 1,
    reuse_final_fitness: bool = False,
) -> ICPResult:
    """B independent point-to-point ICPs in one device program.

    Lane semantics are EXACTLY those of B solo :func:`icp` runs with early
    exit: each lane freezes once its own update norm drops below ``tol``
    (frozen lanes' NN passes are wasted VPU lanes, not semantic drift), and
    the loop ends when every active lane is done. This is the macro-batch
    verification path — B solo ICPs cost B x ~90 us per iteration in serial
    dispatch-bound tiny ops; batched lanes share each iteration's kernels.

    On TPU with tile-divisible shapes every iteration runs as ONE fused
    Pallas pass (transform + streaming NN + gating + Kabsch moments,
    ``pallas_kernels.icp_moments_batched_pallas``); the problem is
    recentred at the per-lane target centroid first so the uncentered
    moment subtraction stays well-conditioned at map-scale coordinates.
    Other backends/shapes use the selection-based stage.

    source/target: Clouds with leading batch dim ([B, N, 3] / [B, N]).
    init: batched Pose. active [B] bool: lanes to run (inactive lanes
    return fitness=inf, identity-ish results; callers gate on ``active``).
    ``coarse_factor``: see :func:`icp` — a coarse strided-subsample stage
    (1/f^2 NN pairs per iteration) before the full-resolution polish;
    fitness always comes from full resolution. ``gate_fitness``: see
    :func:`icp` (enables the hopeless-lane exit when finite).
    ``target_stride``: see :func:`icp` — mid-resolution stage (full
    source x strided target) warm-starting the full-resolution loop.
    Ignored on the fused-kernel path (its tile constraints pick shapes).
    ``reuse_final_fitness``: report fitness from the final full-resolution
    iteration's statistics instead of a separate NN pass at the returned
    pose — a bounded O(``tol``) value change that saves one whole Nq x Nt
    pass per verification (see the inline note; ignored on the fused and
    MXU_NN paths, which keep their exact final pass).
    """
    from . import pallas_kernels as pk

    dtype = source.xyz.dtype
    tgt = jnp.where(target.mask[..., None], target.xyz, PAD_VALUE)
    payload = jnp.concatenate(
        [
            jnp.swapaxes(tgt, -1, -2),
            target.mask[:, None, :].astype(dtype),
        ],
        axis=1,
    )                                                           # [B, 4, M]
    src = source.xyz
    smask = source.mask
    nq, nt = src.shape[1], payload.shape[2]
    f = coarse_factor
    coarse_ok = f > 1 and nq % f == 0 and nt % f == 0

    fused = (
        FUSED_ICP
        and jax.default_backend() != "cpu"
        and nq % pk.TQ == 0
        and pk.pick_target_tile(nt) is not None
        and (
            not coarse_ok
            or (
                (nq // f) % pk.TQ == 0
                and pk.pick_target_tile(nt // f) is not None
            )
        )
    )

    done0 = ~active
    if fused:
        # recentre at the per-lane valid-target centroid: moment-form
        # Kabsch subtracts uncentered sums, which loses precision when
        # |coords| >> cloud spread (map frames sit 10^2-10^3 m out)
        msum = jnp.maximum(jnp.sum(target.mask, axis=-1), 1)
        center = (
            jnp.sum(jnp.where(target.mask[..., None], target.xyz, 0.0), axis=1)
            / msum[:, None]
        )                                                       # [B, 3]
        payload_c = payload.at[:, 0:3, :].add(-center[:, :, None])
        src4 = jnp.concatenate(
            [jnp.swapaxes(src, -1, -2), smask[:, None, :].astype(dtype)],
            axis=1,
        )                                                       # [B, 4, Nq]
        R0, t0 = init.R, init.t - center
        if coarse_ok:
            R0, t0, _, _ = _icp_stage_batched_fused(
                src4[:, :, ::f], payload_c[:, :, ::f],
                R0, t0, done0, max_iters, max_corr_dist,
                COARSE_TOL_FACTOR * tol, gate_fitness,
            )
        R, t, delta, done = _icp_stage_batched_fused(
            src4, payload_c, R0, t0, done0, max_iters, max_corr_dist, tol,
            gate_fitness,
        )
        pose = se3.Pose(R, t + center)

        # final fitness/inlier stats from one more fused pass
        pose_rows = (
            jnp.zeros((src.shape[0], 128), jnp.float32)
            .at[:, 0:9].set(R.reshape(-1, 9))
            .at[:, 9:12].set(t)
        )
        m = pk.icp_moments_batched_pallas(
            src4, payload_c, pose_rows, active, max_corr_dist,
            variant=SELECT_VARIANT,
        )
        n_good = m[:, pk.M_W]
        fitness = jnp.where(
            (n_good > 0) & active,
            m[:, pk.M_WD2] / jnp.maximum(n_good, 1.0),
            jnp.inf,
        )
        inlier_frac = n_good / jnp.maximum(m[:, pk.M_NSRC], 1.0)
        return ICPResult(pose, fitness, inlier_frac, (delta < tol) & active)

    R0, t0 = init.R, init.t
    if coarse_ok:
        R0, t0, _, _, _, _ = _icp_stage_batched(
            src[:, ::f], smask[:, ::f], payload[:, :, ::f],
            R0, t0, done0, max_iters, max_corr_dist,
            COARSE_TOL_FACTOR * tol, gate_fitness,
        )
    s = target_stride
    if s > 1 and nt % s == 0:
        # mid-resolution stage: full source against every s-th target
        # point, to the loose tolerance — the full-resolution loop below
        # then converges in a few polish iterations instead of carrying
        # the whole descent at Nq x Nt NN cost per iteration
        R0, t0, _, _, _, _ = _icp_stage_batched(
            src, smask, payload[:, :, ::s],
            R0, t0, done0, max_iters, max_corr_dist,
            COARSE_TOL_FACTOR * tol, gate_fitness,
        )
    R, t, delta, done, last_ms, last_ng = _icp_stage_batched(
        src, smask, payload, R0, t0, done0, max_iters, max_corr_dist, tol,
        gate_fitness,
    )
    pose = se3.Pose(R, t)

    if reuse_final_fitness and not MXU_NN:
        # fitness from the final full-resolution iteration's statistics:
        # the same exact per-coordinate kernel at the pose one update
        # before the returned one, saving a whole Nq x Nt NN pass per
        # verification. Value-change bounds per exit: tol-converged lanes
        # O(tol x point scale); stall-exit lanes bounded by the arming
        # threshold (the last update < STALL_ABS_FACTOR * tol ~ 1 cm of
        # pose motion — a few percent of the gate at worst on a lane
        # oscillating exactly at it); hopeless-exit lanes sit far above
        # the gate by construction. Measured on the bench workload:
        # zero gate-decision changes (scripts/profile_fitness_reuse_ab).
        # Under MXU_NN the iteration statistics inherit selection noise,
        # so the exact recomputation below stays mandatory.
        n_good = last_ng
        fitness = jnp.where((n_good > 0) & active, last_ms, jnp.inf)
    else:
        _moved, d2, _matched, good = _matches_batched(
            src, smask, payload, pose, active, max_corr_dist, exact=True
        )
        n_good = jnp.sum(good, axis=-1)
        fitness = jnp.where(
            (n_good > 0) & active,
            jnp.sum(jnp.where(good, d2, 0.0), axis=-1)
            / jnp.maximum(n_good, 1),
            jnp.inf,
        )
    inlier_frac = n_good / jnp.maximum(jnp.sum(smask, axis=-1), 1)
    return ICPResult(pose, fitness, inlier_frac, (delta < tol) & active)


def icp_point_to_plane(
    source: Cloud,
    target: Cloud,
    target_normals: jax.Array,
    init: se3.Pose | None = None,
    max_iters: int = 20,
    max_corr_dist: float = 2.0,
    damping: float = 1e-6,
    tol: float = 1e-4,
) -> ICPResult:
    """Point-to-plane ICP: minimize sum over correspondences of

    (n_k . (T(s_k) - t_k))^2 via Gauss-Newton on se(3). The standard
    odometry workhorse (the iterated-EKF point-to-plane update of the
    reference's FAST-LIO front end, ``launch/single_ugv.launch:33-39``,
    reduces to the same normal-equation structure). Converges much faster
    than point-to-point on structured scenes.

    ``target_normals``: [Nt, 3] unit normals for target points.
    """
    if init is None:
        init = se3.identity(dtype=source.xyz.dtype)
    tgt = jnp.where(target.mask[:, None], target.xyz, PAD_VALUE)
    src = source.xyz
    smask = source.mask
    # fused NN+select payload: xyz, validity, normals, zero pad -> P=8
    payload = jnp.concatenate(
        [
            tgt.T,
            target.mask[None].astype(src.dtype),
            target_normals.T,
            jnp.zeros((1, tgt.shape[0]), src.dtype),
        ],
        axis=0,
    )                                                               # [8, Nt]

    # while_loop early exit (same rationale as icp: odometry runs one
    # scan-to-map alignment per frame, sequentially)
    def cond(carry):
        i, _pose, delta = carry
        return (i < max_iters) & (delta >= tol)

    def body(carry):
        i, pose, _ = carry
        moved = se3.transform_points(pose, src)          # [N, 3]
        d2, sel = nearest_select(moved, payload)
        n = sel[4:7].T                                   # [N, 3]
        p_t = sel[:3].T
        good = smask & (sel[3] > 0.5) & (d2 < max_corr_dist * max_corr_dist)
        w = good.astype(src.dtype)
        r = jnp.sum(n * (moved - p_t), axis=-1)          # [N] signed residual
        # jacobian of r wrt left-multiplied twist [omega, v]:
        #   dr/dv = n ; dr/domega = (moved x n)
        J = jnp.concatenate([jnp.cross(moved, n), n], axis=-1)  # [N, 6]
        H = jnp.einsum("na,n,nb->ab", J, w, J)
        H = H + damping * jnp.eye(6, dtype=src.dtype)
        b = -jnp.einsum("na,n->a", J, w * r)
        xi = jnp.linalg.solve(H, b)
        # left-multiplicative update: pose <- exp(xi) * pose
        new_pose = se3.compose(se3.exp(xi), pose)
        return (i + 1, new_pose, jnp.linalg.norm(xi))

    _, pose, delta = jax.lax.while_loop(
        cond, body, (jnp.array(0), init, jnp.array(jnp.inf, src.dtype))
    )
    moved = se3.transform_points(pose, src)
    d2, sel = nearest_select(moved, payload)
    good = smask & (sel[3] > 0.5) & (d2 < max_corr_dist * max_corr_dist)
    n_good = jnp.sum(good)
    r = jnp.sum(sel[4:7].T * (moved - sel[:3].T), axis=-1)
    fitness = jnp.where(
        n_good > 0,
        jnp.sum(jnp.where(good, r * r, 0.0)) / jnp.maximum(n_good, 1),
        jnp.inf,
    )
    inlier_frac = n_good / jnp.maximum(jnp.sum(smask), 1)
    return ICPResult(pose, fitness, inlier_frac, delta < tol)


class RansacResult(NamedTuple):
    pose: se3.Pose
    inlier_ratio: jax.Array
    num_inliers: jax.Array
    success: jax.Array


def ransac_align(
    source: Cloud,
    target: Cloud,
    key: jax.Array,
    num_hypotheses: int = 256,
    sample_size: int = 3,
    inlier_thresh: float = 0.25,
    min_inlier_ratio: float = 0.45,
    refine: bool = True,
) -> RansacResult:
    """RANSAC rigid alignment over nearest-neighbor correspondences.

    The inter-robot geometric-verification equivalent (reference
    ``include/distributedMapping.h:1210-1243``): estimate correspondences by
    1-NN, then — instead of PCL's sequential 1000-2000 RANSAC iterations —
    evaluate ``num_hypotheses`` minimal-sample Kabsch fits **as one batch**
    (the hypothesis axis is the TPU batch axis), score all by inlier count,
    pick the best, and optionally refine with one weighted Kabsch over
    inliers. Accept iff inlier ratio >= ``min_inlier_ratio``
    (`inlierTreshold` semantics, reference ``include/distributedMapping.h:187,1238-1243``).
    """
    tgt = jnp.where(target.mask[:, None], target.xyz, PAD_VALUE)
    d2, idx = nearest_neighbors(source.xyz, tgt)
    corr_valid = source.mask & target.mask[idx]
    matched = tgt[idx]  # [N, 3]
    n = source.capacity

    # sample minimal sets from valid correspondences (gumbel top-k trick over
    # masked uniform scores -> approximately uniform valid samples)
    g = jax.random.gumbel(key, (num_hypotheses, n))
    g = jnp.where(corr_valid[None, :], g, -jnp.inf)
    _, samples = jax.lax.top_k(g, sample_size)  # [H, sample_size]

    src_s = source.xyz[samples]      # [H, s, 3]
    dst_s = matched[samples]         # [H, s, 3]
    if sample_size == 3:
        # closed-form minimal-sample estimator — H tiny SVDs dominate the
        # RANSAC cost on TPU (see rigid_from_triangles)
        hyp = rigid_from_triangles(src_s, dst_s)
        # degenerate-sample rejection: BOTH triangles must determine a
        # rigid map. Crucial for the dst side — on a false match the NN
        # correspondences collapse many-to-one, so sampled dst triples
        # are often coincident and the resulting zero-rank "transform"
        # would score the whole collapse cluster as inliers.
        hyp_ok = triangles_ok(src_s) & triangles_ok(dst_s)
    else:
        ones = jnp.ones(samples.shape, dtype=source.xyz.dtype)
        hyp = kabsch(src_s, dst_s, ones)  # batched over H
        hyp_ok = jnp.ones(samples.shape[0], bool)

    # score every hypothesis: residuals for all correspondences
    moved = jnp.einsum("hij,nj->hni", hyp.R, source.xyz) + hyp.t[:, None, :]
    res2 = jnp.sum((moved - matched[None]) ** 2, axis=-1)  # [H, N]
    inl = (res2 < inlier_thresh * inlier_thresh) & corr_valid[None, :]
    counts = jnp.where(hyp_ok, jnp.sum(inl, axis=-1), -1)
    best = jnp.argmax(counts)
    any_valid = counts[best] >= 0
    eye3 = jnp.eye(3, dtype=source.xyz.dtype)
    best_pose = se3.Pose(
        jnp.where(any_valid, hyp.R[best], eye3),
        jnp.where(any_valid, hyp.t[best], jnp.zeros(3, source.xyz.dtype)),
    )
    best_inl = inl[best] & any_valid

    if refine:
        w = best_inl.astype(source.xyz.dtype)
        refined = kabsch(source.xyz, matched, jnp.maximum(w, 1e-12))
        # recount inliers after refinement
        moved_r = se3.transform_points(refined, source.xyz)
        res2_r = jnp.sum((moved_r - matched) ** 2, axis=-1)
        inl_r = (res2_r < inlier_thresh * inlier_thresh) & corr_valid
        # no valid hypothesis -> skip the refine adoption: with an empty
        # best_inl the uniform-1e-12-weight kabsch is an arbitrary
        # least-squares fit over ALL matches (including collapsed ones)
        # and >=0 would always adopt it; keep the identity pose + empty
        # inlier set so the lane reports ratio 0 / accepted False
        use_refined = any_valid & (jnp.sum(inl_r) >= jnp.sum(best_inl))
        best_pose = se3.Pose(
            jnp.where(use_refined, refined.R, best_pose.R),
            jnp.where(use_refined, refined.t, best_pose.t),
        )
        best_inl = jnp.where(use_refined, inl_r, best_inl)

    num_inliers = jnp.sum(best_inl)
    n_corr = jnp.maximum(jnp.sum(corr_valid), 1)
    ratio = num_inliers / n_corr
    return RansacResult(best_pose, ratio, num_inliers, ratio >= min_inlier_ratio)


def ransac_align_batched(
    source: Cloud,
    target: Cloud,
    key: jax.Array,
    active: jax.Array,
    num_hypotheses: int = 256,
    sample_size: int = 3,
    inlier_thresh: float = 0.25,
    min_inlier_ratio: float = 0.45,
    refine: bool = True,
    hyp_chunk: int = 64,
) -> RansacResult:
    """B independent :func:`ransac_align` runs in one device program.

    The batched-lane counterpart for macro-batched inter-robot
    verification (reference ``include/distributedMapping.h:1210-1243``,
    one RPC at a time; here B verifications share every kernel): the 1-NN
    correspondence pass runs through the predicated batched kernel
    (:func:`_matches_batched`), so lanes with ``active=False`` skip all
    tile compute; hypotheses come from the closed-form triangle estimator
    with degenerate-sample rejection (:func:`rigid_from_triangles` /
    :func:`triangles_ok`) and are scored in ``hyp_chunk``-sized slabs
    (bounding the [B, chunk, N] transient).

    Lane semantics match B solo runs up to RNG (lanes draw disjoint
    slices of one uniform field from ``key``). Inactive lanes return
    identity poses with ``success=False``.

    source/target: Clouds with leading batch dim ([B, N, 3] / [B, M, 3]).
    Returns a RansacResult with [B]-leading leaves.
    """
    B, n = source.xyz.shape[0], source.xyz.shape[1]
    dtype = source.xyz.dtype
    tgt = jnp.where(target.mask[..., None], target.xyz, PAD_VALUE)
    payload = jnp.concatenate(
        [jnp.swapaxes(tgt, -1, -2), target.mask[:, None, :].astype(dtype)],
        axis=1,
    )                                                           # [B, 4, M]
    # big-but-finite gate: RANSAC correspondences are ungated (PCL
    # CorrespondenceEstimation semantics); validity comes from the masks
    _, d2, matched, good = _matches_batched(
        source.xyz, source.mask, payload,
        se3.identity((B,), dtype=dtype), active, 1e6, exact=True,
    )                                       # matched [B, N, 3], good [B, N]

    # per-lane minimal samples via inverse-CDF over valid correspondences:
    # B*H*s uniforms + a searchsorted, NOT a [B, H, N] gumbel field (16M+
    # transcendentals at fleet shapes). Within-triple duplicate draws are
    # possible (probability ~s^2/n_good); triangles_ok marks those
    # hypotheses invalid below.
    H = num_hypotheses
    cnt = jnp.cumsum(good.astype(jnp.int32), axis=-1)          # [B, N]
    n_good_pts = cnt[:, -1]
    u = jax.random.uniform(key, (B, H, sample_size), dtype=dtype)
    u = u * jnp.maximum(n_good_pts, 1)[:, None, None]
    samples = jax.vmap(
        lambda c, uu: jnp.searchsorted(c, uu.ravel(), side="right").reshape(
            uu.shape
        )
    )(cnt.astype(dtype), u)
    samples = jnp.minimum(samples, n - 1)          # n_good=0 lanes clamp
    src_s = jax.vmap(lambda x, s: x[s])(source.xyz, samples)   # [B, H, s, 3]
    dst_s = jax.vmap(lambda x, s: x[s])(matched, samples)
    if sample_size == 3:
        # closed-form triangle alignment: B*H tiny SVDs are the dominant
        # batched-RANSAC cost on TPU (see rigid_from_triangles)
        hyp = rigid_from_triangles(src_s, dst_s)               # [B, H] poses
        # degenerate-sample rejection (see ransac_align's inline note):
        # with-replacement draws AND collapsed false-match NN structure
        # both produce coincident triples
        hyp_ok = triangles_ok(src_s) & triangles_ok(dst_s)     # [B, H]
    else:
        hyp = kabsch(src_s, dst_s, jnp.ones(samples.shape, dtype))
        hyp_ok = jnp.ones(samples.shape[:2], bool)

    thr2 = inlier_thresh * inlier_thresh
    fused_scoring = (
        RANSAC_FUSED_SCORING
        and jax.default_backend() != "cpu"
        and H % 8 == 0
        and n % 128 == 0
    )
    if fused_scoring:
        # fused Pallas scoring: each hypothesis is a register-resident
        # vector pass; the XLA slab path below materializes [B, Hc, N]
        # transforms/residuals in HBM and measured HBM-bound at
        # ~6.3 us/hypothesis (scripts/profile_ransac_roofline.py)
        from . import pallas_kernels as pk

        src4 = jnp.concatenate(
            [jnp.swapaxes(source.xyz, -1, -2),
             good[:, None, :].astype(dtype)], axis=1)           # [B, 4, N]
        mt4 = jnp.concatenate(
            [jnp.swapaxes(matched, -1, -2),
             jnp.zeros((B, 1, n), dtype)], axis=1)
        hyp_rows = (
            jnp.zeros((B, H, 128), jnp.float32)
            .at[:, :, 0:9].set(hyp.R.reshape(B, H, 9))
            .at[:, :, 9:12].set(hyp.t)
        )
        counts = pk.ransac_counts_batched_pallas(src4, mt4, hyp_rows, thr2)
    else:
        # score hypotheses in chunks: counts only (the winner's inlier
        # set is recomputed below), so the [B, Hc, N] transient stays
        # bounded. When hyp_chunk doesn't divide H, fall back to H's
        # largest divisor <= hyp_chunk — the bound must hold for ANY
        # num_hypotheses (e.g. a reference-style ransac_max_iter=1000)
        Hc = hyp_chunk if H % hyp_chunk == 0 else max(
            d for d in range(1, min(hyp_chunk, H) + 1) if H % d == 0
        )
        sx, sy, sz = (source.xyz[..., i] for i in range(3))    # [B, N] each

        def chunk_counts(Rt):
            Rc, tc = Rt                            # [B, Hc, 3, 3], [B, Hc, 3]
            # direct per-coordinate form (exact f32, no K=3 MXU padding or
            # 6-pass precision=highest cost — see CLAUDE.md precision note)
            res2 = 0.0
            for i in range(3):
                mi = (
                    Rc[..., i, 0][:, :, None] * sx[:, None, :]
                    + Rc[..., i, 1][:, :, None] * sy[:, None, :]
                    + Rc[..., i, 2][:, :, None] * sz[:, None, :]
                    + tc[..., i][:, :, None]
                )
                res2 = res2 + jnp.square(mi - matched[..., i][:, None, :])
            return jnp.sum(
                (res2 < thr2) & good[:, None, :], axis=-1
            ).astype(jnp.int32)                    # [B, Hc]

        nchunks = H // Hc
        counts = jax.lax.map(
            chunk_counts,
            (
                jnp.moveaxis(hyp.R.reshape(B, nchunks, Hc, 3, 3), 1, 0),
                jnp.moveaxis(hyp.t.reshape(B, nchunks, Hc, 3), 1, 0),
            ),
        )                                          # [nchunks, B, Hc]
        counts = jnp.moveaxis(counts, 0, 1).reshape(B, H)
    counts = jnp.where(hyp_ok, counts, -1)
    best = jnp.argmax(counts, axis=-1)             # [B]
    bidx = jnp.arange(B)
    any_valid = counts[bidx, best] >= 0            # [B]
    eye3 = jnp.eye(3, dtype=dtype)
    best_pose = se3.Pose(
        jnp.where(any_valid[:, None, None], hyp.R[bidx, best], eye3),
        jnp.where(
            any_valid[:, None], hyp.t[bidx, best], jnp.zeros((B, 3), dtype)
        ),
    )

    def inliers_of(pose):
        moved = se3.transform_points(pose, source.xyz)
        res2 = jnp.sum((moved - matched) ** 2, axis=-1)
        return (res2 < thr2) & good

    # a lane with NO valid hypothesis contributes no best-hypothesis
    # inliers (solo-path parity) and is excluded from refine adoption
    # below: it keeps the identity pose and an empty inlier set
    best_inl = inliers_of(best_pose) & any_valid[:, None]

    if refine:
        w = best_inl.astype(dtype)
        refined = kabsch(source.xyz, matched, jnp.maximum(w, 1e-12))
        inl_r = inliers_of(refined)
        # gate with any_valid: on a failed lane the uniform-1e-12-weight
        # kabsch fits ALL matches (collapsed ones included) and >=0 would
        # always adopt that arbitrary pose (advisor r3)
        use_r = any_valid & (jnp.sum(inl_r, -1) >= jnp.sum(best_inl, -1))
        best_pose = se3.Pose(
            jnp.where(use_r[:, None, None], refined.R, best_pose.R),
            jnp.where(use_r[:, None], refined.t, best_pose.t),
        )
        best_inl = jnp.where(use_r[:, None], inl_r, best_inl)

    num_inliers = jnp.sum(best_inl, -1)
    n_corr = jnp.maximum(jnp.sum(good, -1), 1)
    ratio = jnp.where(active, num_inliers / n_corr, 0.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3))
    pose = se3.Pose(
        jnp.where(active[:, None, None], best_pose.R, eye),
        jnp.where(active[:, None], best_pose.t, jnp.zeros((B, 3), dtype)),
    )
    return RansacResult(
        pose, ratio, num_inliers, active & (ratio >= min_inlier_ratio)
    )
