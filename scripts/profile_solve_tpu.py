"""Single-chip (v5e) wall-clock of the drain's sharded_solve at drain shapes.

Anchors the 2-host scaling extrapolation in docs/solver_scaling.md: the
virtual-CPU mesh measures framework/rendezvous overhead, not network time,
so the honest 2-host estimate is t1/2 + t_allreduce(analytic) against this
measured single-chip t1. Chain-of-solves timing with host-copy termination.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/scl_slam_jax_cache_prof")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from scl_slam_tpu.parallel import sharded
from _scaling_common import GN_ITERS, CG_ITERS, ring_graph


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    for n_poses, cap, loops in ((1024, 4096, 64), (4096, 8192, 128)):
        g, init = ring_graph(n_poses, cap, loops)
        mesh = Mesh(np.array(jax.devices()[:1]), ("shard",))
        fn = jax.jit(lambda gg, ii: sharded.sharded_solve(
            mesh, "shard", gg, ii, gn_iters=GN_ITERS, cg_iters=CG_ITERS))

        def run():
            poses, chis = fn(g, init)
            return float(np.asarray(chis)[-1])

        run()
        ts = []
        for _ in range(10):
            t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
        t1 = float(np.median(ts))
        print(f"sharded_solve 1-chip v5e (N={n_poses}, cap={cap}, "
              f"gn={GN_ITERS}, cg={CG_ITERS}): {t1*1e3:7.2f} ms "
              f"(min {min(ts)*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
