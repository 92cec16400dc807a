"""TPU timing of Scan-Context make() components at bench shapes (64k pts).

Separates polar_bins (sqrt/arctan2 transcendentals) from scatter_max_image
and the full make(). Dispatch-separated marginal timing per CLAUDE.md.
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

    from scl_slam_tpu.descriptors import scan_context as sc
    from scl_slam_tpu.ops import pointcloud as pc

    rng = np.random.RandomState(0)
    n = 65536
    theta = rng.uniform(-np.pi, np.pi, n)
    r = rng.uniform(2, 75, n)
    z = np.sin(theta * 3) * 2 + rng.normal(0, 0.4, n) - 1.0
    pts = np.stack([r * np.cos(theta), r * np.sin(theta), z], -1).astype(np.float32)
    xyz = jnp.asarray(pts)
    mask = jnp.ones(n, bool)
    cfg = sc.ScanContextConfig()

    def bins_only(x):
        ring, sector, valid = pc.polar_bins(
            x, mask, cfg.num_rings, cfg.num_sectors, cfg.max_radius
        )
        return ring * 60 + sector + valid

    def scatter_only(x):
        ring = jnp.clip(jnp.abs(x[:, 0]).astype(jnp.int32) % 20, 0, 19)
        sector = jnp.clip(jnp.abs(x[:, 1]).astype(jnp.int32) % 60, 0, 59)
        img = pc.scatter_max_image(
            x[:, 2], ring, sector, mask, 20, 60, init=0.0
        )
        return img.sum() + x[0, 0] * 0

    def make_full(x):
        d = sc.make(pc.Cloud(x, mask), cfg)
        return d.image[0, 0] + d.ring_key[0]

    def chained(body, n_steps):
        @jax.jit
        def run(x0):
            def one(c, _):
                out = body(xyz + c)
                s = jnp.sum(out).astype(jnp.float32) if out.ndim else out.astype(jnp.float32)
                return c + s * 1e-12, s
            cf, outs = jax.lax.scan(one, x0, None, length=n_steps)
            return cf, outs
        return run

    def marginal(body):
        ts = {}
        for n_steps in (4, 16):
            fn = chained(body, n_steps)
            out = fn(jnp.float32(0.0))
            jax.block_until_ready(out)
            _ = np.asarray(out[0])
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(jnp.float32(0.0))
            _ = np.asarray(out[0])
            ts[n_steps] = (time.perf_counter() - t0) / 10
        return (ts[16] - ts[4]) / 12

    for name, body in (
        ("polar_bins only", bins_only),
        ("scatter_max only", scatter_only),
        ("full sc.make", make_full),
    ):
        print(f"{name:>18}: {marginal(body) * 1e6:9.2f} us")


if __name__ == "__main__":
    main()
