"""Feasibility: spatial-block culling for the ICP correspondence kernel.

Question: if the gathered 8192-point submap is Morton-sorted once per
verification and split into fixed blocks, what fraction of
(query-tile, target-block) pairs can be PROVABLY skipped (exact-NN-within-
max_corr_dist semantics) using centroid+radius bounds?

  bound[i]  = max over valid queries q in tile i of
                min over blocks k of (|q - c_k| + r_k)     (NN upper bound)
  keep[i,k] = (min over q in tile i of |q - c_k|) - r_k <= min(bound[i], maxd)

Any block with keep=False cannot contain the true NN of any query in the
tile (or only NNs beyond max_corr_dist, which the ICP gate discards).

Run on CPU with the realistic simulator at the live pipeline's shapes
(1024-source x 8192-submap from +-25 keyframes at ~2 m spacing).
"""
from __future__ import annotations

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from scl_slam_tpu.io.lidar_sim import LidarSim, UrbanScene  # noqa: E402


def morton3(pts: np.ndarray, cell: float = 1.0) -> np.ndarray:
    q = np.clip((pts - pts.min(0)) / cell, 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return (
        spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    )


def main():
    scene = UrbanScene(seed=7, blocks=2, block_size=40.0)
    sim = LidarSim(scene, n_azimuth=1800)
    poses = list(scene.circuit(step=2.0))  # ~2 m keyframe spacing
    rng = np.random.RandomState(0)

    # stored keyframe clouds: 4096-pt scramble-ordered subsamples (proxy
    # for the hash-ordered storage downsample)
    n_kf = min(len(poses), 60)
    clouds = []
    for i in range(n_kf):
        s = sim.scan_at(poses[i], seed=i)
        sel = rng.permutation(s.shape[0])[:4096]
        clouds.append(s[sel])

    center = n_kf // 2
    near = 25
    per = 8192 // (2 * near + 1)  # 160
    sub = []
    for o in range(-near, near + 1):
        j = int(np.clip(center + o, 0, n_kf - 1))
        T = poses[j]
        pts = clouds[j][:per]
        sub.append(pts @ T[:3, :3].T + T[:3, 3])
    target = np.concatenate(sub)  # [~8160, 3] world frame
    pad = 8192 - target.shape[0]
    target = np.concatenate([target, np.full((pad, 3), 1e6)])
    tvalid = np.ones(8192, bool)
    tvalid[8192 - pad:] = False

    # query: the revisit keyframe's 1024-pt cloud at its (true) pose
    Tq = poses[center]
    query = clouds[center][:1024] @ Tq[:3, :3].T + Tq[:3, 3]

    maxd = 10.0  # cfg.loop.icp_max_corr_dist default
    order = np.argsort(morton3(np.where(tvalid[:, None], target, 1e6)))
    tsorted = target[order]

    # brute-force truth for sanity
    d2_true = ((query[:, None, :] - target[None]) ** 2).sum(-1)
    nn_true = d2_true.min(1)

    for TQ in (256,):
        for TB in (256, 512, 1024):
            nb = 8192 // TB
            blocks = tsorted.reshape(nb, TB, 3)
            cent = np.array(
                [b[(np.abs(b) < 1e5).all(-1)].mean(0) if (np.abs(b) < 1e5).all(-1).any() else [1e6] * 3 for b in blocks]
            )
            rad = np.array(
                [
                    np.linalg.norm(b[(np.abs(b) < 1e5).all(-1)] - c, axis=1).max()
                    if (np.abs(b) < 1e5).all(-1).any()
                    else 0.0
                    for b, c in zip(blocks, cent)
                ]
            )
            nq_tiles = 1024 // TQ
            kept = 0
            exact_ok = True
            for i in range(nq_tiles):
                qt = query[i * TQ : (i + 1) * TQ]
                dc = np.linalg.norm(
                    qt[:, None, :] - cent[None], axis=-1
                )  # [TQ, nb]
                bound = np.max(np.min(dc + rad[None], axis=1))
                bound = min(bound, maxd)
                lower = dc.min(0) - rad
                keep = lower <= bound
                kept += keep.sum()
                # exactness check: culled NN-within-maxd must match truth
                cand = blocks[keep].reshape(-1, 3)
                d2c = ((qt[:, None, :] - cand[None]) ** 2).sum(-1).min(1)
                truth = nn_true[i * TQ : (i + 1) * TQ]
                bad = (truth < maxd**2) & ~np.isclose(d2c, truth)
                if bad.any():
                    exact_ok = False
            frac = kept / (nq_tiles * nb)
            print(
                f"TQ={TQ} TB={TB}: kept {frac:.2%} of pairs "
                f"(exact within maxd: {exact_ok}) "
                f"mean_rad={rad[rad > 0].mean():.1f}m"
            )


if __name__ == "__main__":
    main()


def oracle(query, target, tvalid, maxd=10.0):
    """Upper bound for ANY tile-skipping scheme: fraction of
    (qtile, tblock) pairs whose exact set-set distance exceeds the bound
    needed for exact-NN-within-maxd semantics, at several granularities,
    with BOTH sides Morton-sorted."""
    qs = query[np.argsort(morton3(query))]
    ts = target[np.argsort(morton3(np.where(tvalid[:, None], target, 1e6)))]
    d2 = ((qs[:, None, :] - ts[None]) ** 2).sum(-1)  # [Nq, Nt]
    nn = np.sqrt(d2.min(1))
    for TQ in (256, 64, 32):
        for TB in (512, 128, 64):
            nqt, nbt = len(qs) // TQ, len(ts) // TB
            blockmin = np.sqrt(
                d2.reshape(nqt, TQ, nbt, TB).min((1, 3))
            )  # [nqt, nbt] exact set-set distance
            # per qtile: bound = max over q of its NN dist (capped at maxd)
            bound = np.minimum(
                nn.reshape(nqt, TQ).max(1), maxd
            )
            keep = blockmin <= bound[:, None]
            print(
                f"  oracle TQ={TQ} TB={TB}: kept {keep.mean():.2%}"
            )
