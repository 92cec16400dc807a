"""Per-phase roofline measurements on the v5e chip (VERDICT r3 #2).

Measures the marginal device time of each hot kernel at bench shapes via
chain-length subtraction (two scan lengths; the difference removes
dispatch/warmup, CLAUDE.md convention), then prints measured vs analytic
speed-of-light on the binding resource. docs/roofline.md tabulates a run.

v5e peak assumptions (derivations in docs/roofline.md):
- MXU bf16: 197e12 FLOP/s (public spec)
- MXU f32 'highest' (6-pass): 197e12/6 ~ 33e12
- VPU f32 FMA: 4 ALUs x (8x128) lanes x ~1.5 GHz x 2 ~ 12.3e12 FLOP/s;
  compare/select ops (no FMA credit): ~6.1e12 op/s
- HBM: 819e9 B/s
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MXU_BF16 = 197e12
MXU_F32 = 197e12 / 6
VPU_FMA = 12.3e12
VPU_OPS = 6.1e12
HBM = 819e9


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/scl_slam_jax_cache_prof"
    )
    from scl_slam_tpu.ops import pallas_kernels as pk
    from scl_slam_tpu.ops import pointcloud as pc

    rng = np.random.RandomState(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    def marginal(make_chain, lens=(4, 16), reps=8):
        """Marginal seconds per chained step (dispatch-cancelled)."""
        ts = {}
        for L in lens:
            fn = make_chain(L)
            out = fn()
            jax.block_until_ready(out)
            _ = np.asarray(out).ravel()[:1]
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            _ = np.asarray(out).ravel()[:1]
            ts[L] = (time.perf_counter() - t0) / reps
        return (ts[lens[1]] - ts[lens[0]]) / (lens[1] - lens[0])

    # ------------------------------------------------------------------
    # 1) fused ICP pass (transform + streaming NN + gate + Kabsch moments)
    #    at the live verification shapes: B=32 lanes, Nq=1024, Nt=8192
    #    (and the coarse stage's 256 x 2048)
    # ------------------------------------------------------------------
    for B, NQ, NT, tag in ((32, 1024, 8192, "full-res"),
                           (32, 256, 2048, "coarse")):
        src = rng.randn(B, NQ, 3).astype(np.float32) * 10
        tgt = rng.randn(B, NT, 3).astype(np.float32) * 10
        src4 = jnp.asarray(
            np.concatenate([src.transpose(0, 2, 1),
                            np.ones((B, 1, NQ), np.float32)], 1))
        pay = jnp.asarray(
            np.concatenate([tgt.transpose(0, 2, 1),
                            np.ones((B, 1, NT), np.float32)], 1))
        active = jnp.ones((B,), bool)

        def make_chain(L, src4=src4, pay=pay, active=active, B=B):
            @jax.jit
            def run():
                def one(c, _):
                    pose_rows = (
                        jnp.zeros((B, 128), jnp.float32)
                        .at[:, 0].set(1.0 + c * 1e-9)
                        .at[:, 4].set(1.0).at[:, 8].set(1.0)
                    )
                    m = pk.icp_moments_batched_pallas(
                        src4, pay, pose_rows, active, 10.0)
                    return c + m[0, 0] * 1e-12, m[0, 0]
                cf, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=L)
                return cf
            return run

        t = marginal(make_chain)
        pairs = B * NQ * NT
        flops = pairs * 11  # 3 sub + 3 mul + 3 add (d2) + min/argmin selects
        sol_fma = flops / VPU_FMA     # if the d2 mul+add pairs fuse as FMA
        sol_ops = flops / VPU_OPS     # compare/select mix: no FMA credit
        print(f"icp fused pass {tag} (B={B}, {NQ}x{NT}): "
              f"{t*1e3:7.3f} ms  pairs {pairs/1e6:.0f}M  "
              f"VPU-SoL {sol_fma*1e3:6.3f}-{sol_ops*1e3:6.3f} ms  "
              f"-> {sol_fma/t*100:4.1f}-{sol_ops/t*100:4.1f}% of peak",
              flush=True)

    # ------------------------------------------------------------------
    # 2) Scan-Context max-height binning: dense-compare segment-max,
    #    65536 points -> 20x60 bins (the shipped variant, block 2048)
    # ------------------------------------------------------------------
    n, nb, block = 65536, 1200, 2048
    flat = jnp.asarray(rng.randint(0, nb, n).astype(np.int32))
    vals = jnp.asarray(rng.uniform(-2, 4, n).astype(np.float32))

    def make_chain_bin(L):
        @jax.jit
        def run():
            def one(c, _):
                bins = jnp.arange(nb, dtype=jnp.int32)[:, None]
                def blk(carry, inp):
                    bi, bv = inp
                    hit = bins == bi[None, :]
                    m = jnp.max(jnp.where(hit, bv[None, :] + c * 1e-9, -1e4),
                                axis=1)
                    return jnp.maximum(carry, m), None
                img0 = jnp.full((nb,), -1e4, jnp.float32)
                img, _ = jax.lax.scan(
                    blk, img0, (flat.reshape(-1, block),
                                vals.reshape(-1, block)))
                return c + img[0] * 1e-9, img[0]
            cf, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=L)
            return cf
        return run

    t = marginal(make_chain_bin, lens=(64, 256))
    ops = n * nb * 3  # compare + select + max per (point, bin)
    sol = ops / VPU_OPS
    print(f"SC binning dense-compare (65536 -> 20x60): {t*1e6:8.1f} us  "
          f"ops {ops/1e6:.0f}M  VPU-SoL {sol*1e6:6.1f} us  "
          f"-> {sol/t*100:5.1f}% of peak", flush=True)

    # ------------------------------------------------------------------
    # 3) storage downsample (stride permute, 64k -> 4096) per frame
    # ------------------------------------------------------------------
    cloud = pc.Cloud(jnp.asarray(rng.randn(65536, 3).astype(np.float32)),
                     jnp.ones((65536,), bool))

    def make_chain_ds(L):
        @jax.jit
        def run():
            def one(c, _):
                out = pc.stride_permute_downsample(
                    pc.Cloud(cloud.xyz + c * 1e-9, cloud.mask), 4096)
                return c + out.xyz[0, 0] * 1e-9, out.xyz[0, 0]
            cf, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=L)
            return cf
        return run

    t = marginal(make_chain_ds, lens=(64, 256))
    bytes_moved = 65536 * 16 + 4096 * 16  # read all (xyz+mask), write out
    sol = bytes_moved / HBM
    print(f"storage downsample stride (64k -> 4096): {t*1e6:8.1f} us  "
          f"bytes {bytes_moved/1e6:.1f}MB  HBM-SoL {sol*1e6:6.1f} us  "
          f"-> {sol/t*100:5.1f}% of peak", flush=True)

    # ------------------------------------------------------------------
    # 4) SC retrieval einsum: ring-key gate then 60-shift cosine against
    #    the full 4096-keyframe DB (the retrieval benchmark's inner op,
    #    here as pure MXU work: [4096, 1200] x [1200, 60])
    # ------------------------------------------------------------------
    db = jnp.asarray(rng.randn(4096, 1200).astype(np.float32))
    qshift = jnp.asarray(rng.randn(1200, 60).astype(np.float32))

    def make_chain_rt(L):
        @jax.jit
        def run():
            def one(c, _):
                # sin() makes the varying operand non-decomposable: with
                # qshift + c the compiler hoists the loop-invariant
                # db@qshift and only computes the rank-1 db@(c*ones)
                # correction per step (measured: 'above peak' throughput)
                s = db @ jnp.sin(qshift + c)
                return c + s[0, 0] * 1e-9, s[0, 0]
            cf, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=L)
            return cf
        return run

    t = marginal(make_chain_rt, lens=(64, 256))
    flops = 4096 * 1200 * 60 * 2
    sol = flops / MXU_F32
    print(f"retrieval all-shift einsum (4096x1200 @ 1200x60): "
          f"{t*1e6:8.1f} us  {flops/1e9:.2f} GFLOP  "
          f"f32-MXU-SoL {sol*1e6:6.1f} us  -> {sol/t*100:5.1f}% of peak",
          flush=True)


if __name__ == "__main__":
    main()
