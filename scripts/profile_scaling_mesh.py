"""Scaling-efficiency evidence for the sharded solve + retrieval (VERDICT r3 #6).

Measures `parallel.sharded.sharded_solve` and `sharded_topk` wall-clock vs
virtual mesh size (1/2/4/8 CPU devices) on fixed (strong-scaling) and
per-device-proportional (weak-scaling) problems, and tabulates the analytic
collective volume per solve so a 2-host efficiency can be extrapolated with
stated assumptions (no multi-host hardware exists in this environment).

HONESTY CAVEATS (also stated in docs/solver_scaling.md):
- This box has 4 physical cores; 8 virtual devices oversubscribe 2:1, so
  measured d=8 efficiency is a LOWER bound on what distinct chips would do.
- Virtual-mesh collectives are memcpy-speed: they measure the FRAMEWORK
  overhead of shard_map+psum scheduling, not network time. Network time is
  extrapolated analytically from the collective volume instead.
- Timing ends with a host copy of a small output (tunnel/dispatch gotcha
  convention, CLAUDE.md) and reports the median of repeats after warmup.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/scl_slam_jax_cache_prof")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from scl_slam_tpu.parallel import sharded
from _scaling_common import GN_ITERS, CG_ITERS, ring_graph


def time_solve(n_dev: int, g, init, repeats: int = 5) -> float:
    """Median EXECUTION time: jit once (tracing a sharded solve costs
    100s of ms and would otherwise dominate every call)."""
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("shard",))
    fn = jax.jit(lambda gg, ii: sharded.sharded_solve(
        mesh, "shard", gg, ii, gn_iters=GN_ITERS, cg_iters=CG_ITERS))
    def run():
        poses, chis = fn(g, init)
        return float(np.asarray(chis)[-1])  # host copy ends the timing
    run()  # compile + warmup
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def time_topk(n_dev: int, n_rows: int, dim: int, k: int = 10,
              repeats: int = 20) -> float:
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("shard",))
    rng = np.random.RandomState(1)
    db = jnp.asarray(rng.randn(n_rows, dim), jnp.float32)
    q = jnp.asarray(rng.randn(dim), jnp.float32)
    mask = jnp.ones((n_rows,), bool)
    fn = jax.jit(lambda dd, qq, mm: sharded.sharded_topk(
        mesh, "shard", dd, qq, mm, k))
    def run():
        d2, pos = fn(db, q, mask)
        return int(np.asarray(pos)[0])
    run()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    print(f"devices: {jax.device_count()} virtual CPU "
          f"(4 physical cores — d=8 oversubscribes 2:1)")

    # ---- strong scaling: fixed problem, more devices --------------------
    N, CAP, LOOPS = 1024, 4096, 64
    g, init = ring_graph(N, CAP, LOOPS)
    print(f"\nsharded_solve STRONG scaling "
          f"(N={N} poses, edge_cap={CAP}, gn={GN_ITERS}, cg={CG_ITERS}):")
    t1 = None
    for d in (1, 2, 4, 8):
        t = time_solve(d, g, init)
        t1 = t1 or t
        print(f"  d={d}: {t*1e3:8.1f} ms  speedup {t1/t:5.2f}x  "
              f"efficiency {t1/(t*d)*100:5.1f}%")

    # ---- weak scaling: edges (and poses) proportional to devices --------
    print("\nsharded_solve WEAK scaling (256 poses + 1024 edge-cap per device):")
    t1 = None
    for d in (1, 2, 4, 8):
        g_w, init_w = ring_graph(256 * d, 1024 * d, 16 * d)
        t = time_solve(d, g_w, init_w)
        t1 = t1 or t
        print(f"  d={d}: N={256*d:5d} cap={1024*d:5d}  {t*1e3:8.1f} ms  "
              f"efficiency {t1/t*100:5.1f}%")

    # ---- retrieval: row-sharded top-k ------------------------------------
    for rows in (8192, 65536):
        print(f"\nsharded_topk strong scaling (rows={rows}, dim=1056, k=10):")
        t1 = None
        for d in (1, 2, 4, 8):
            t = time_topk(d, rows, 1056)
            t1 = t1 or t
            print(f"  d={d}: {t*1e3:8.2f} ms  speedup {t1/t:5.2f}x  "
                  f"efficiency {t1/(t*d)*100:5.1f}%")

    # ---- analytic collective volume per solve ----------------------------
    # per CG step: one psum of the [N,6] f32 Hx product; per GN iter:
    # H_diag [N,6,6] + b [N,6] + chi2 scalar psums + (auto coarse: one
    # [Nc*6, Nc*6] dense psum); N=1024 -> auto coarse stride 16 -> Nc=64.
    N6 = N * 6 * 4
    per_gn = N * 36 * 4 + N6 + 4 + (64 * 6) ** 2 * 4
    per_solve = GN_ITERS * (per_gn + CG_ITERS * N6)
    print(f"\nanalytic collective volume per solve (N={N}): "
          f"{per_solve/1e6:.1f} MB in {GN_ITERS*(CG_ITERS+3)+GN_ITERS} psums")
    for bw_gbps, lat_us, tag in ((12.5, 50, "100 Gb/s DCN"),
                                 (45.0, 1, "v5e ICI (1 hop)")):
        n_coll = GN_ITERS * (CG_ITERS + 4)
        t_net = per_solve / (bw_gbps * 1e9) * 2 + n_coll * lat_us * 1e-6
        print(f"  2-host all-reduce estimate over {tag}: "
              f"{t_net*1e3:6.2f} ms per solve")


if __name__ == "__main__":
    main()
