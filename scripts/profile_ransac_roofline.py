#!/usr/bin/env python
"""RANSAC verification roofline: the fleet's inter-verify kernel vs SoL.

VERDICT r4 weak #3/#8: the solo-vs-fleet throughput gap is the every-batch
RANSAC verification (`_detect_verify_inter_block` ->
`registration.ransac_align_batched`), which never got the speed-of-light
accounting ICP did. This measures the batched RANSAC at the EXACT fleet
bench shapes (B=16 lanes, N=1024 source pts [icp_source_points], M=8192
submap pts, H=256 hypotheses) and decomposes it:

- full kernel (NN correspondences + inverse-CDF sampling + triangle
  hypotheses + slab scoring + refine);
- NN-only (`_matches_batched` — the same predicated kernel class as ICP's
  pass, already roofline'd at 11-23% of VPU SoL);
- H-scaling (H=32 vs 256 isolates the hypothesis-scoring slab marginal).

Analytic work at these shapes:
  NN:      B*N*M       = 134 M pairs  x ~8 f32 ops  = 1.07 GFLOP (VPU)
  scoring: B*H*(N+..)  = 4.2 M transforms x ~15 ops = 0.06 GFLOP (VPU)
  refine:  2 weighted Kabsch over B*N + recount     = negligible
so NN should dominate ~16:1; if the measured full/NN ratio is far above
that, the sampling/refine glue is the cost, not the math.

Timing discipline (CLAUDE.md): chained calls, the loop-varying source
wrapped in sin() (non-decomposable), final host copy; chain length 16+
so the marginal clears the 1-3 ms dispatch jitter.

    timeout 1500 python scripts/profile_ransac_roofline.py [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/scl_slam_jax_cache_prof")

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--B", type=int, default=16)
ap.add_argument("--N", type=int, default=1024)
ap.add_argument("--M", type=int, default=8192)
ap.add_argument("--chain", type=int, default=24)
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from scl_slam_tpu.geometry import se3
from scl_slam_tpu.ops import registration as reg
from scl_slam_tpu.ops.pointcloud import PAD_VALUE, Cloud

B, N, M = args.B, args.N, args.M
rng = np.random.RandomState(0)
# overlapping structured clouds so RANSAC does representative work
base_pts = rng.uniform(-40, 40, (B, M, 3)).astype(np.float32)
src0 = jnp.asarray(base_pts[:, :N] + rng.normal(0, 0.05, (B, N, 3)))
tgt = Cloud(jnp.asarray(base_pts), jnp.ones((B, M), bool))
smask = jnp.ones((B, N), bool)
active = jnp.ones((B,), bool)
key = jax.random.PRNGKey(0)


def timed(label, fn, probe):
    """Chain-subtracted marginal with the chain INSIDE one program.

    Python-level chaining of separate dispatches pays the tunneled
    runtime's ~1-3 ms per-program floor per link even when pipelined
    (CLAUDE.md) — a first cut of this script measured exactly that
    (4.6 ms/call for a ~1 ms kernel). lax.scan keeps all links in one
    program; the sin() wrap keeps the varying operand non-decomposable.
    """
    def chain(L):
        @jax.jit
        def run():
            def one(c, _):
                s = src0 + 0.01 * jnp.sin(c)
                out = fn(s)
                lead = probe(out).astype(jnp.float32).ravel()[0]
                return c + lead * 1e-12, lead
            cf, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=L)
            return cf
        return run

    lens, reps = (4, 16), 6
    ts = {}
    for L in lens:
        f = chain(L)
        out = f()
        jax.block_until_ready(out)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f()
        _ = np.asarray(out)
        ts[L] = (time.perf_counter() - t0) / reps
    best = (ts[lens[1]] - ts[lens[0]]) / (lens[1] - lens[0])
    print(f"{label:34s} {best * 1e3:8.3f} ms/call (marginal)", flush=True)
    return best


def full(H):
    def fn(src):
        res = reg.ransac_align_batched(
            Cloud(src, smask), tgt, key, active,
            num_hypotheses=H, inlier_thresh=0.25, min_inlier_ratio=0.45,
        )
        return res
    return fn


def nn_only(src):
    payload = jnp.concatenate(
        [jnp.swapaxes(jnp.where(tgt.mask[..., None], tgt.xyz, PAD_VALUE),
                      -1, -2),
         tgt.mask[:, None, :].astype(src.dtype)], axis=1)
    _, d2, matched, good = reg._matches_batched(
        src, smask, payload, se3.identity((B,), dtype=src.dtype),
        active, 1e6, exact=True,
    )
    return d2


print(f"backend={jax.default_backend()} B={B} N={N} M={M}", flush=True)
t_nn = timed("NN correspondences only", nn_only, lambda o: o)
t32 = timed("full RANSAC H=32", full(32), lambda o: o.inlier_ratio)
t256 = timed("full RANSAC H=256 (fleet shape)", full(256), lambda o: o.inlier_ratio)

pairs = B * N * M
nn_flop_fma = pairs * 8
score_marginal = (t256 - t32) / (256 - 32)  # per-hypothesis slab cost
overhead = t256 - t_nn
vpu_fma = 12.3e12
vpu_plain = 6.1e12
print(f"\nNN pass: {pairs / 1e6:.0f} M pairs -> "
      f"{nn_flop_fma / t_nn / 1e12:.2f} TFLOP/s eff "
      f"= {nn_flop_fma / t_nn / vpu_fma * 100:.0f}% / "
      f"{nn_flop_fma / t_nn / vpu_plain * 100:.0f}% of VPU SoL (FMA/plain)")
print(f"scoring marginal: {score_marginal * 1e6:.1f} us/hypothesis "
      f"({B * N * 15 / jnp.maximum(score_marginal, 1e-12) / 1e12:.2f} TFLOP/s eff)")
print(f"sample+score+refine on top of NN: {overhead * 1e3:.3f} ms "
      f"({overhead / t256 * 100:.0f}% of full)")
print(f"full H=256 per verified frame (B={B}): {t256 / B * 1e3:.3f} ms/frame")
