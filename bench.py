"""Benchmarks: the three BASELINE.md north-star metrics on one TPU chip.

Prints ONE JSON line PER METRIC
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "platform": ...}
in CHEAPEST-COMPILE-FIRST order, each line flushed the moment its metric
completes (a killed run keeps everything already printed):

1. ``retrieval_queries_per_s`` — two-stage loop-closure retrieval
   (ring-key top-k + all-shift cosine verification) in 256-query batches
   over a full 4096-keyframe DB. Compiles in seconds even cold; this is
   the guaranteed-to-land metric. Baseline: the reference queries once
   per keyframe at sensor rate = 10 queries/s.
2. ``fleet_frames_per_s`` — multi-robot serving via FleetMapper: mixed
   2-robot keyframe batches through the fused ingest+detect+inter-verify
   step. Baseline: 2 robots x sensor rate = 20 frames/s.
3. ``keyframe_pipeline_frames_per_s`` — the headline: full per-keyframe
   work (descriptor build + DB insert + retrieval + shifted-distance
   verification + submap ICP + queue bookkeeping) on synthetic KITTI-scale
   inputs as scanned 6x32-keyframe chunks (Mapper.replay — the rosbag
   replay analog). Printed LAST so single-line consumers keep getting it.
   Baseline: sensor-rate real time on the reference's 4-core onboard
   CPU = 10 frames/s.

Capture robustness (round-3 postmortem: BENCH_r03 was rc=1 on a transient
axon-backend failure, and two cold judge runs timed out with ZERO output):

- A watchdog thread enforces a self-imposed deadline (default 545 s,
  env ``SCL_SLAM_BENCH_BUDGET_S``) and hard-exits 0 — partial metrics
  beat a timeout kill's rc=124 with the output discarded mid-pipe.
- Transient ``Unable to initialize backend 'axon'`` re-execs the process
  (fresh backend state — in-process retries can hit memoized failures)
  with backoff, up to 4 times within the budget, then falls back to CPU
  with an honest ``"platform": "cpu"`` field on every metric.
- ``jax.devices()`` and the first op can also HANG for minutes (axon
  tunnel warmup: a cold process's first host readback measured 195-400+ s)
  or outright forever. A second watchdog handles that: if NO metric has
  printed by ``deadline - SCL_SLAM_BENCH_CPU_RESERVE_S`` (default 170 s),
  a CPU-forced CHILD process with shrunken workloads is spawned to
  guarantee output, while this process keeps driving the TPU with the
  full remaining budget — a late tunnel wake-up still yields real chip
  numbers, printed after (and superseding) the child's lines; the child
  is killed the moment TPU metrics land. CPU-mode sizes are chosen so
  retrieval lands in seconds; every CPU record carries
  ``"platform": "cpu"`` + ``"note": "cpu fallback, reduced sizes"`` so
  nobody mistakes them for chip numbers.
- Each metric runs in its own try/except: one failure doesn't kill the
  rest. Device buffers are freed between metrics (shared-chip HBM).
- The process ends with ``os._exit(0)``: finalizing thousands of device
  arrays through normal teardown takes minutes on this rig and has eaten
  the driver's timeout budget after all metrics already printed.

Timing discipline (CLAUDE.md): every timed region ends with a host copy of
a small output — ``block_until_ready`` alone has been observed to return
early on the tunneled runtime — and sub-5 ms programs are chained to
amortize the ~1-3 ms per-dispatch floor.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import threading
import time

import numpy as np

_T0 = time.time()
_METRICS_PRINTED = [0]  # list: mutated from main, read from watchdog threads


def _log(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _deadline() -> float:
    """Absolute deadline, preserved across re-execs via env."""
    if "SCL_SLAM_BENCH_DEADLINE" in os.environ:
        return float(os.environ["SCL_SLAM_BENCH_DEADLINE"])
    budget = float(os.environ.get("SCL_SLAM_BENCH_BUDGET_S", "545"))
    dl = _T0 + budget
    os.environ["SCL_SLAM_BENCH_DEADLINE"] = repr(dl)
    return dl


def _start_watchdog(deadline: float) -> None:
    def run():
        while True:
            rem = deadline - time.time()
            if rem <= 0:
                break
            time.sleep(min(rem, 5.0))
        _log("deadline reached — exiting 0 with whatever already printed")
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    threading.Thread(target=run, daemon=True).start()


_FALLBACK_CHILD = [None]  # subprocess.Popen of the CPU fallback, if spawned
_FALLBACK_OUT = [None]    # path of the child's captured-stdout file


def _kill_fallback_child() -> None:
    child = _FALLBACK_CHILD[0]
    if child is not None:
        try:
            child.terminate()
        except Exception:
            pass
        _FALLBACK_CHILD[0] = None
        _cleanup_fallback_out()


def _cleanup_fallback_out() -> None:
    path = _FALLBACK_OUT[0]
    if path is not None:
        _FALLBACK_OUT[0] = None
        try:
            os.unlink(path)
        except OSError:
            pass


def _emit_fallback_lines() -> None:
    """Re-emit the child's COMPLETE metric lines from its capture file.

    The child writes to its own file (not the shared stdout fd): a child
    terminated mid-write can only tear its last line, and the JSON-parse
    filter here drops any torn tail, so last-line consumers never see a
    partial record (advisor r4)."""
    path = _FALLBACK_OUT[0]
    if path is None:
        return
    try:
        with open(path) as f:
            data = f.read()
    except OSError:
        return
    for line in data.split("\n")[:-1]:  # only newline-terminated lines
        line = line.strip()
        if not line:
            continue
        try:
            json.loads(line)
        except ValueError:
            continue
        print(line, flush=True)
        _METRICS_PRINTED[0] += 1
    _cleanup_fallback_out()


def _start_cpu_fallback_watchdog(deadline: float) -> None:
    """If NO metric lands by deadline-reserve, SPAWN a CPU-forced child.

    This is the hang path: the first axon op can block for minutes
    (tunnel warmup — measured 195-400+ s cold) or forever, unkillable from
    Python. The child (SCL_SLAM_BENCH_FORCE_CPU=1, shrunken workloads,
    inherited stdout) guarantees some metrics land, while THIS process
    keeps driving the TPU with the full remaining budget — if the tunnel
    wakes up late, the TPU metrics still print (and, being later lines,
    win for last-line consumers; the child is killed once the TPU path
    completes so a stale CPU line can never print after the TPU headline).
    """
    if os.environ.get("SCL_SLAM_BENCH_FORCE_CPU"):
        return  # already the fallback — the deadline watchdog rules here
    reserve = float(os.environ.get("SCL_SLAM_BENCH_CPU_RESERVE_S", "170"))
    t_fb = deadline - reserve

    def run():
        while time.time() < t_fb:
            if _METRICS_PRINTED[0]:
                return  # TPU path is producing — never abandon it
            time.sleep(2.0)
        if _METRICS_PRINTED[0]:
            return
        _log(f"no metric by fallback point (reserve {reserve:.0f}s) — "
             "spawning CPU-forced child; TPU attempt continues here")
        import subprocess

        env = dict(os.environ)
        env["SCL_SLAM_BENCH_FORCE_CPU"] = "1"
        # child gets its own absolute deadline, 20 s inside the parent's,
        # so its lines can't trail the parent's late TPU metrics
        env["SCL_SLAM_BENCH_DEADLINE"] = repr(deadline - 20.0)
        sys.stdout.flush()
        sys.stderr.flush()
        # child stdout goes to its own file, re-emitted (complete lines
        # only) iff the TPU path produced nothing — sharing this process's
        # stdout risked a torn line when the child is killed mid-write
        import tempfile

        fd, path = tempfile.mkstemp(prefix="scl_slam_bench_cpu_", suffix=".out")
        _FALLBACK_OUT[0] = path
        _FALLBACK_CHILD[0] = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env, stdout=fd
        )
        os.close(fd)

    threading.Thread(target=run, daemon=True).start()


def _init_backend(deadline: float):
    """Return (jax, jnp) with a live backend; retry transient axon failures.

    Retries re-exec the interpreter: the axon registration shim and jax's
    backend lookup can memoize a failed init, so an in-process retry may
    see the stale failure forever. Re-exec costs ~10 s of imports but
    guarantees fresh state. After 4 attempts (or with <90 s left) falls
    back to CPU so SOMETHING honest is emitted.
    """
    attempt = int(os.environ.get("SCL_SLAM_BENCH_ATTEMPT", "0"))
    import jax

    if os.environ.get("SCL_SLAM_BENCH_FORCE_CPU"):
        # must happen before any backend touch; env JAX_PLATFORMS is too
        # late (the axon shim bakes it into jax.config at interp start)
        jax.config.update("jax_platforms", "cpu")
        _log("CPU forced (fallback mode, reduced workload sizes)")

    try:
        devs = jax.devices()
        _log(f"backend up: {devs} (attempt {attempt})")
    except RuntimeError as e:
        _log(f"backend init failed (attempt {attempt}): {e}")
        remaining = deadline - time.time()
        if attempt < 4 and remaining > 90:
            delay = min(10.0 * (attempt + 1), max(remaining - 75.0, 5.0))
            _log(f"re-exec retry in {delay:.0f}s ({remaining:.0f}s left)")
            time.sleep(delay)
            os.environ["SCL_SLAM_BENCH_ATTEMPT"] = str(attempt + 1)
            _kill_fallback_child()  # the re-exec'd image would spawn a 2nd
            sys.stdout.flush()
            sys.stderr.flush()
            os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])
        if _FALLBACK_CHILD[0] is not None:
            # a CPU child is already doing exactly this job — running the
            # in-process CPU fallback too would double every metric line
            _log("backend dead; CPU child already running — waiting on it")
            try:
                _FALLBACK_CHILD[0].wait(
                    timeout=max(0.0, deadline - time.time())
                )
            except Exception:
                _FALLBACK_CHILD[0].terminate()
            _emit_fallback_lines()
            sys.stdout.flush()
            os._exit(0)
        _log("falling back to CPU (metrics will carry platform=cpu)")
        jax.config.update("jax_platforms", "cpu")
        jax.devices()

    import jax.numpy as jnp

    # absorb tunnel warmup (first transfer of a process can take minutes)
    # outside every timed region
    t0 = time.time()
    x = jnp.ones((8, 128), jnp.float32)
    _ = np.asarray(x @ x.T)[0, 0]
    _log(f"warmup op done in {time.time() - t0:.1f}s on {jax.default_backend()}")
    return jax, jnp


def bench_retrieval(jax, jnp, small=False):
    from scl_slam_tpu.descriptors import scan_context as sc

    CFG = sc.ScanContextConfig()
    K = 512 if small else 4096
    R, S = CFG.num_rings, CFG.num_sectors
    rng = np.random.RandomState(0)
    imgs = rng.rand(K, R, S).astype(np.float32) * 8.0
    keys = imgs.mean(axis=2)
    db = sc.make_db(K, CFG)
    db = db._replace(
        descriptors=jnp.asarray(imgs),
        keys=jnp.asarray(keys),
        robot=jnp.zeros((K,), jnp.int32),
        index=jnp.arange(K, dtype=jnp.int32),
        count=jnp.array(K, jnp.int32),
    )
    B = 32 if small else 256
    sel = rng.randint(0, K - CFG.exclude_recent - 1, B)
    q_imgs = jnp.asarray(imgs[sel])
    q_keys = jnp.asarray(keys[sel])
    q_robots = jnp.zeros((B,), jnp.int32)
    q_indices = jnp.full((B,), K - 1, jnp.int32)

    @jax.jit
    def run(q):
        return sc.query_batch(
            db, q, q_keys, q_robots, q_indices, CFG, mode="intra"
        )

    m = run(q_imgs)
    jax.block_until_ready(m)
    correct = int(np.sum(np.asarray(m.index) == sel))
    assert correct == B, f"retrieval correctness {correct}/{B}"

    CHAIN = 10 if small else 50
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        q = q_imgs
        o = None
        for _ in range(CHAIN):
            o = run(q)
            q = q_imgs + 0.0 * o.distance[0]   # serialize without extra work
        _ = np.asarray(o.index).ravel()[:1]    # host copy ends the timing
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    qps = B / best
    return {
        "metric": "retrieval_queries_per_s",
        "value": round(qps, 0),
        "unit": "queries/s",
        "vs_baseline": round(qps / 10.0, 1),
    }


def bench_fleet(jax, jnp, small=False):
    from scl_slam_tpu.config import (
        KeyframeConfig,
        LoopConfig,
        OptimizerConfig,
        SlamConfig,
    )
    from scl_slam_tpu.runtime.fleet import _fleet_step
    from scl_slam_tpu.runtime.state import make_state

    n_pts = 8192 if small else 65536
    cfg = SlamConfig(
        number_of_robots=2,
        keyframe=KeyframeConfig(
            max_keyframes=256 if small else 2048,
            points_per_keyframe=1024 if small else 4096,
            raw_points_capacity=n_pts,
        ),
        loop=LoopConfig(
            near_keyframes=25,
            submap_capacity=2048 if small else 8192,
            icp_iterations=5 if small else 20,
        ),
        optimizer=OptimizerConfig(
            edge_capacity=256 if small else 2048,
            gn_iters=2 if small else 4,
            cg_iters=16 if small else 32,
        ),
    )
    rng = np.random.RandomState(1)

    def scan(k):
        n = n_pts
        theta = rng.uniform(-np.pi, np.pi, n)
        r = rng.uniform(2, 75, n)
        z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n) - 1.0
        return np.stack(
            [r * np.cos(theta), r * np.sin(theta), z], -1
        ).astype(np.float32)

    # mixed 2-robot keyframe batches, pre-staged on device (input transfer
    # is measured by neither this nor the headline bench — same discipline:
    # the serving step is the system under test). One staged scan batch is
    # reused across steps with shifted poses — the DB keeps growing, so
    # each step still does fresh retrieval work.
    B, n_steps = (8, 2) if small else (16, 4)
    total = B * n_steps
    eye = jnp.eye(3)
    robots = jnp.asarray([k % 2 for k in range(B)], jnp.int32)
    xs = jnp.asarray(np.stack([scan(k) for k in range(B)]))
    pose_ts = [
        jnp.asarray(
            np.stack(
                [
                    [2.0 * (s * B + k), 4.0 * (k % 2), 0.0]
                    for k in range(B)
                ]
            ),
            jnp.float32,
        )
        for s in range(n_steps)
    ]
    masks = jnp.ones((B, n_pts), bool)
    pose_R = jnp.broadcast_to(eye, (B, 3, 3))
    stamps = jnp.zeros((B,), jnp.float32)
    key = jax.random.PRNGKey(0)

    # compile + warm on a throwaway state (donated arg: fresh state per run)
    state = make_state(cfg)
    out = _fleet_step(
        state, key, robots, pose_R, pose_ts[0], xs, masks, stamps, cfg
    )
    jax.block_until_ready(out[0].counts)
    _ = np.asarray(out[2][0])

    state = make_state(cfg)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    k = key
    outs = None
    for s in range(n_steps):
        state, k, outs = _fleet_step(
            state, k, robots, pose_R, pose_ts[s], xs, masks, stamps, cfg
        )
    _ = np.asarray(outs[0])                       # host copy ends the timing
    dt = time.perf_counter() - t0
    fps = total / dt
    return {
        "metric": "fleet_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 2),
    }


def bench_pipeline(jax, jnp, small=False):
    from scl_slam_tpu.config import (
        KeyframeConfig,
        LoopConfig,
        OptimizerConfig,
        ScanContextParams,
        SlamConfig,
    )
    from scl_slam_tpu.geometry import se3
    from scl_slam_tpu.runtime.mapper import _replay_batches
    from scl_slam_tpu.runtime.state import make_state

    n_pts = 8192 if small else 65536
    cfg = SlamConfig(
        keyframe=KeyframeConfig(
            max_keyframes=256 if small else 4096,  # KITTI-00-scale DB capacity
            points_per_keyframe=1024 if small else 4096,
            raw_points_capacity=n_pts,
        ),
        loop=LoopConfig(
            near_keyframes=25,
            submap_capacity=2048 if small else 8192,
            icp_iterations=5 if small else 20,
        ),
        optimizer=OptimizerConfig(
            edge_capacity=256 if small else 2048,
            gn_iters=2 if small else 6,
            cg_iters=16 if small else 48,
        ),
        scan_context=ScanContextParams(),
    )
    state = make_state(cfg)
    rng = np.random.RandomState(0)

    def scan(k):
        n = n_pts
        theta = rng.uniform(-np.pi, np.pi, n)
        r = rng.uniform(2, 75, n)
        z = np.sin(theta * 3 + k * 0.1) * 2 + rng.normal(0, 0.4, n) - 1.0
        return np.stack(
            [r * np.cos(theta), r * np.sin(theta), z], -1
        ).astype(np.float32)

    # B=32 macro-batches, R=6 scanned inside ONE device program per
    # dispatch (B=32 = measured lane sweet spot; the scan amortizes the
    # ~1-3 ms dispatch floor over 192 frames)
    B, R = (8, 2) if small else (32, 6)
    xs = jnp.asarray(
        np.stack([scan(k) for k in range(R * B)]).reshape(R, B, n_pts, 3)
    )
    masks = jnp.ones((R, B, n_pts), bool)
    pose_R = jnp.broadcast_to(jnp.eye(3), (R, B, 3, 3))
    pose_t = jnp.asarray(
        np.stack(
            [[1.0 * (i * B + k), 0.0, 0.0] for i in range(R) for k in range(B)]
        ).reshape(R, B, 3),
        jnp.float32,
    )
    stamps = jnp.zeros((R, B))

    def chunk_step(state):
        return _replay_batches(
            state, jnp.array(0), se3.Pose(pose_R, pose_t), xs, masks, stamps, cfg
        )

    out = chunk_step(state)
    jax.block_until_ready(out)
    _ = np.asarray(out[3])

    n_rep = 1 if small else 3
    states = [make_state(cfg) for _ in range(n_rep)]
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    outs = [chunk_step(states[i]) for i in range(n_rep)]
    _ = [np.asarray(o[3]) for o in outs]
    dt = time.perf_counter() - t0
    fps = n_rep * R * B / dt
    return {
        "metric": "keyframe_pipeline_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 2),
    }


def main():
    deadline = _deadline()
    _start_watchdog(deadline)
    _start_cpu_fallback_watchdog(deadline)
    jax, jnp = _init_backend(deadline)
    platform = jax.default_backend()   # "axon" = the tunneled TPU chip
    small = platform == "cpu"

    # cheapest compile surface first: retrieval lands in seconds even from
    # a cold cache; the heavy scanned-replay headline goes last (and is
    # also PRINTED last: single-line consumers take the final line).
    # TRADEOFF, on purpose: rounds 1-2 measured the pipeline FIRST for
    # fresh-HBM conditions (other benches' residents can skew the shared
    # chip); capture robustness won — partial output beats a purer
    # headline that never prints. gc between metrics frees the Python-
    # referenced buffers; measured effect of the reorder is inside the
    # chip's drift band (1815 last-ordered vs 1708 first-ordered r2).
    for name, fn in (
        ("retrieval", bench_retrieval),
        ("fleet", bench_fleet),
        ("pipeline", bench_pipeline),
    ):
        try:
            _log(f"{name}: start ({deadline - time.time():.0f}s left)")
            rec = fn(jax, jnp, small=small)
            rec["platform"] = platform
            if small:
                rec["note"] = "cpu fallback, reduced sizes"
            # a real metric is about to print: kill any CPU fallback child
            # BEFORE printing so none of its lines can trail this one
            # (last-line consumers must get the real platform's numbers)
            _kill_fallback_child()
            print(json.dumps(rec), flush=True)
            _METRICS_PRINTED[0] += 1
            _log(f"{name}: done")
        except Exception as e:  # one metric failing must not kill the rest
            _log(f"{name}: FAILED: {type(e).__name__}: {e}")
        # free this metric's device residents before the next one runs on
        # the shared chip
        gc.collect()

    child = _FALLBACK_CHILD[0]
    if child is not None:
        if _METRICS_PRINTED[0]:
            # (normally already killed at the first metric print; this
            # covers the spawn-vs-print race window)
            _kill_fallback_child()
        else:
            try:  # nothing from the TPU: the child's output is all we have
                child.wait(timeout=max(0.0, deadline - time.time()))
            except Exception:
                child.terminate()
            _emit_fallback_lines()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # skip minutes of device-array finalization


if __name__ == "__main__":
    main()
