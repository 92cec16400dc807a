"""TPU timing of voxel-downsample variants at bench shapes (64k -> 4096).

Each variant runs inside a 16-step lax.scan (matching the macro-batch), so
per-frame numbers are comparable to profile_ingest.py. Host-copy-terminated
timing per CLAUDE.md.
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

    from scl_slam_tpu.ops import pointcloud as pc

    rng = np.random.RandomState(0)

    def scan(k):
        n = 65536
        theta = rng.uniform(-np.pi, np.pi, n)
        r = rng.uniform(2, 75, n)
        z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n) - 1.0
        return np.stack(
            [r * np.cos(theta), r * np.sin(theta), z], -1
        ).astype(np.float32)

    B = 16
    xs = jnp.asarray(np.stack([scan(k) for k in range(B)]))
    masks = jnp.ones((B, 65536), bool)
    leaf, cap = 0.2, 4096

    def scanned(fn):
        @jax.jit
        def run(_):
            def one(c, inp):
                x, m = inp
                out = fn(pc.Cloud(x, m))
                return c, (out.xyz[0, 0], out.mask.sum())
            _, outs = jax.lax.scan(one, 0, (xs, masks))
            return outs
        return run

    variants = {
        "hash_f4_s32k (current)": scanned(
            lambda c: pc.voxel_downsample_hash(c, leaf, cap)
        ),
        "hash_f2_s32k": scanned(
            lambda c: pc.voxel_downsample_hash(c, leaf, cap, predecimate_factor=2)
        ),
        "hash_f2_s16k": scanned(
            lambda c: pc.voxel_downsample_hash(
                c, leaf, cap, hash_slots=1 << 14, predecimate_factor=2
            )
        ),
        "hash_f1_s8k": scanned(
            lambda c: pc.voxel_downsample_hash(
                c, leaf, cap, hash_slots=1 << 13, predecimate_factor=1
            )
        ),
    }

    # no-dedup baseline: stride-slice to cap, order by spatial hash (keeps the
    # prefix-uniformity property), no scatter at all
    def stride_hash_order(c):
        stride = c.capacity // cap
        xyz = c.xyz[::stride][:cap]
        mask = c.mask[::stride][:cap]
        inv = 1.0 / leaf
        vox = jnp.floor(xyz * inv).astype(jnp.int32)
        h = (
            vox[:, 0] * 73856093 ^ vox[:, 1] * 19349663 ^ vox[:, 2] * 83492791
        ).astype(jnp.uint32) >> 1
        order = jnp.argsort(jnp.where(mask, h.astype(jnp.int32), 2**31 - 1))
        return pc.Cloud(xyz[order], mask[order])

    variants["stride_hashorder"] = scanned(stride_hash_order)
    # the shipped fast-fast path (ops/pointcloud.py::stride_permute_downsample)
    variants["stride_permute (shipped)"] = scanned(
        lambda c: pc.stride_permute_downsample(c, cap)
    )

    for name, fn in variants.items():
        out = fn(0)
        jax.block_until_ready(out)
        _ = np.asarray(out[1])
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(0)
        counts = np.asarray(out[1])
        dt = (time.perf_counter() - t0) / 10
        print(
            f"{name:>24}: {dt * 1000 / B:6.3f} ms/frame   "
            f"kept {counts.mean():.0f}/{cap}"
        )


if __name__ == "__main__":
    main()
