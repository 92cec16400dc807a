"""Centralized multi-robot serving: every robot in ONE device-resident state.

The decentralized :class:`~scl_slam_tpu.runtime.mapper.Mapper` + bus path
mirrors the reference's N-node architecture (reference
``src/distributedMapping.cpp`` runs one node per robot; each node re-ingests
every peer's descriptors and keyframe clouds move only inside geometric-
verification RPCs, ``include/distributedMapping.h:556-648, 1189-1268``).
That replication is the right shape for N onboard computers — and pure
overhead when one TPU serves the whole fleet:

- N copies of the descriptor DB / pose chains (one per node) collapse to
  the single :class:`MapperState`, which already block-partitions its
  fixed-capacity arrays by robot.
- Descriptor broadcast/ingest dispatches disappear: a keyframe ingested for
  robot r IS visible to every query immediately.
- Inter-robot geometric verification needs no RPC and no cloud payload:
  every robot's keyframe clouds are resident, so verification is an
  in-state submap RANSAC under ``lax.cond`` — same cost profile as the
  intra-robot path (``_detect_intra``).
- The pose-graph solve was always joint (slots are global); one drain
  optimizes the whole fleet.

One jitted program (``_fleet_step``) processes a batch of keyframes from
any mix of robots: vmapped prep, scanned ingest, then BATCHED-LANE intra
ICP and inter RANSAC (one predicated kernel per phase instead of per-frame
``lax.cond`` branches — see ``_fleet_step``). Distinct batch sizes compile
separate variants; callers see at most ``number_of_robots`` variants since
a step drains at most one staged keyframe per robot.

This is a beyond-parity serving mode (PARITY.md); the decentralized path
remains the reference-parity architecture and the two share every stage
function.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..descriptors import base, registry
from ..geometry import se3, so3
from ..graph import factors as F
from ..ops import pointcloud as pc
from ..ops import registration as reg
from .state import LoopQueue
from .mapper import (
    Mapper,
    _enqueue_intra_block,
    _gather_submap,
    _intra_verify_inputs,
    _prepare_frame,
    _scatter_rows_capped,
    _yaw_seed_pose,
    encode_kf,
)


def _ingest_prepared_fleet_block(
    state, robots, poses, smalls, descriptors, stamps, cfg
):
    """Mixed-robot vectorized B-frame ingestion: ONE scatter per state array.

    The fleet analog of ``mapper._ingest_prepared_block`` — that one relies
    on a single robot's frames landing in contiguous slots; a fleet batch
    interleaves robots, so every block ``dynamic_update_slice`` becomes a
    batched row scatter (``.at[slots].set``), which XLA lowers to one
    program per array instead of B sequential scatter steps inside a scan
    (the scan carried the WHOLE state through B iterations — profiled as
    the dominant fleet-step cost once intra/inter verification was
    batched, scripts/profile_fleet_phases.py).

    Slot math: frame b of robot r lands at block position
    ``counts[r] + rank_b`` where ``rank_b`` counts earlier batch-mates of
    the same robot, so per-robot slots stay consecutive and the previous
    same-robot frame (batch-mate or stored) is always at ``slot - 1``.
    The only inherently sequential piece — chaining optimized-pose
    estimates per robot with per-step orthonormalization — stays a
    ``lax.scan`` over B tiny composes with an [n_robots] carry.

    Semantics are identical to B sequential ``_ingest_prepared`` calls
    (same protocol indices, same between/prior factors in the same row
    order, same no-op-when-full overflow behavior).

    Returns ``(state, slots [B], indices [B], counts_hist [B])`` where
    ``counts_hist[b]`` is robot ``robots[b]``'s keyframe count just after
    frame b's sequential insert (the submap-gather clip the detection
    phases need).
    """
    K = cfg.keyframe.max_keyframes
    NR = cfg.number_of_robots
    B = stamps.shape[0]
    ar = jnp.arange(B, dtype=jnp.int32)

    same = robots[:, None] == robots[None, :]
    earlier = same & (ar[None, :] < ar[:, None])
    rank = jnp.sum(earlier.astype(jnp.int32), axis=1)
    pos = state.counts[robots] + rank
    slots = robots * K + pos
    first = pos == 0  # robot's first-ever keyframe

    # protocol keyframe indices: continue each robot's chain from its
    # pre-batch end (batch-mates extend it by construction: idx = base+rank)
    pre_end = robots * K + jnp.maximum(state.counts[robots] - 1, 0)
    idx_base = jnp.where(
        state.counts[robots] > 0, state.desc_db.index[pre_end] + 1, 0
    )
    idxs = idx_base + rank

    # odometry increment: previous same-robot pose is a batch-mate when
    # rank > 0 (its odometry pose is in `poses`, not yet in state), else
    # the stored chain end
    j_prev = jnp.max(jnp.where(earlier, ar[None, :], -1), axis=1)
    in_batch = j_prev >= 0
    jp = jnp.maximum(j_prev, 0)
    prev_slots = jnp.maximum(slots - 1, robots * K)
    prev_R = jnp.where(
        in_batch[:, None, None], poses.R[jp], state.odom_R[prev_slots]
    )
    prev_t = jnp.where(in_batch[:, None], poses.t[jp], state.odom_t[prev_slots])
    incs = se3.between(se3.Pose(prev_R, prev_t), poses)

    # optimized-pose chaining: per-robot sequential (tiny [NR] carry)
    rr = jnp.arange(NR, dtype=jnp.int32)
    chain_ends = rr * K + jnp.maximum(state.counts[:NR] - 1, 0)
    cR0, ct0 = state.opt_R[chain_ends], state.opt_t[chain_ends]

    def chain(carry, inp):
        cR, ct = carry
        r, iR, it_, pR, pt, f = inp
        comp = se3.compose(se3.Pose(cR[r], ct[r]), se3.Pose(iR, it_))
        nR = so3.orthonormalize(jnp.where(f, pR, comp.R))
        nt = jnp.where(f, pt, comp.t)
        return (cR.at[r].set(nR), ct.at[r].set(nt)), (nR, nt)

    (_, _), (opt_R, opt_t) = jax.lax.scan(
        chain, (cR0, ct0), (robots, incs.R, incs.t, poses.R, poses.t, first)
    )

    # factor graph: between factor slot-1 -> slot for non-first frames
    # (batch row order preserved), prior for each robot's first frame.
    # Dropped rows (first frames in the between stream, capacity overflow)
    # route to a scratch row — the sequential no-op-when-full semantics.
    g = state.graph
    odom_si = jnp.asarray(
        [1.0 / s for s in cfg.optimizer.odometry_sigmas], jnp.float32
    )
    prior_si = jnp.asarray(
        [1.0 / s for s in cfg.optimizer.prior_sigmas], jnp.float32
    )
    keep = ~first
    keep_i = keep.astype(jnp.int32)
    E = g.edge_capacity
    e_pos = g.num_edges + jnp.cumsum(keep_i) - keep_i
    e_ok = keep & (e_pos < E)
    e_w = jnp.where(e_ok, e_pos, E)

    P = g.prior_capacity
    f_i = first.astype(jnp.int32)
    p_pos = g.num_priors + jnp.cumsum(f_i) - f_i
    p_ok = first & (p_pos < P)
    p_w = jnp.where(p_ok, p_pos, P)

    scatter_rows = _scatter_rows_capped

    g = g._replace(
        i=scatter_rows(g.i, slots - 1, e_w, E),
        j=scatter_rows(g.j, slots, e_w, E),
        z=se3.Pose(
            scatter_rows(g.z.R, incs.R, e_w, E),
            scatter_rows(g.z.t, incs.t, e_w, E),
        ),
        sqrt_info=scatter_rows(
            g.sqrt_info, jnp.broadcast_to(odom_si, (B, 6)), e_w, E
        ),
        num_edges=g.num_edges + jnp.sum(e_ok.astype(jnp.int32)),
        prior_idx=scatter_rows(g.prior_idx, slots, p_w, P),
        prior_z=se3.Pose(
            scatter_rows(g.prior_z.R, poses.R, p_w, P),
            scatter_rows(g.prior_z.t, poses.t, p_w, P),
        ),
        prior_sqrt_info=scatter_rows(
            g.prior_sqrt_info, jnp.broadcast_to(prior_si, (B, 6)), p_w, P
        ),
        num_priors=g.num_priors + jnp.sum(p_ok.astype(jnp.int32)),
    )

    # descriptor DB: one batched row scatter
    fam = registry.get_family(cfg)
    full, key = jax.vmap(fam.parts)(descriptors)
    desc_db = base.db_insert_rows(state.desc_db, full, key, robots, idxs, slots)

    state = state._replace(
        kf_xyz=state.kf_xyz.at[slots].set(
            smalls.xyz.reshape(B, -1).astype(state.kf_xyz.dtype)
        ),
        kf_mask=state.kf_mask.at[slots].set(smalls.mask),
        odom_R=state.odom_R.at[slots].set(poses.R.astype(state.odom_R.dtype)),
        odom_t=state.odom_t.at[slots].set(poses.t.astype(state.odom_t.dtype)),
        opt_R=state.opt_R.at[slots].set(opt_R.astype(state.opt_R.dtype)),
        opt_t=state.opt_t.at[slots].set(opt_t.astype(state.opt_t.dtype)),
        stamps=state.stamps.at[slots].set(stamps.astype(state.stamps.dtype)),
        counts=state.counts.at[robots].add(1),
        desc_db=desc_db,
        graph=g,
    )
    return state, slots, idxs, pos + 1


def _detect_verify_inter_block(state, key, robots, slots, q_idxs, descs, cfg):
    """Batched-lane inter-robot loop closure without RPCs, for a fleet batch.

    Fuses the reference's client/server pair (``performInterLoopClosure``
    ``distributedMapping.h:1272-1338`` + ``geometricVerificationService``
    ``:1189-1268``) across a whole mixed-robot batch: one vmapped
    inter-mode retrieval for every frame (cross-robot candidates only),
    then ONE lane-batched RANSAC aligning each frame's resident cloud
    against the submap around its matched peer keyframe — both sides live
    in the same MapperState, so no cloud payload moves
    (:func:`~scl_slam_tpu.ops.registration.ransac_align_batched`,
    predicated NN — frames without candidates skip all tile compute) —
    under a whole-batch ``lax.cond``, then a vectorized queue append
    (exclusive cumsum over accepted lanes, the ``_enqueue_intra_block``
    pattern). Each verified factor is queued once (one shared graph; the
    reference queues it in both nodes' graphs); the factor is
    z = T_pre^-1 ∘ (alignment ∘ T_cur), identical to the RPC path
    (``mapper._verify_ransac``) with the current pose estimate read
    directly from state.

    Returns ``(state, oks [B], peer_robot [B], peer_index [B], ratio [B])``.
    """
    B = slots.shape[0]
    fam = registry.get_family(cfg)

    def q(desc, r, qi, slot):
        match = fam.query(state.desc_db, desc, r, qi, mode="inter")
        already = state.loop_target[slot] >= 0
        attempt = match.found & ~already
        pre_slot = jnp.where(attempt, match.db_pos, slot)
        return match.robot, match.index, pre_slot, attempt

    m_robs, m_idxs, pre_slots, attempts = jax.vmap(q)(
        descs, robots, q_idxs, slots
    )

    # verification source budget: the hash-ordered storage layout makes a
    # prefix slice a uniform spatial subsample (same argument as
    # icp_source_points, which this reuses), and the RANSAC accept gate is
    # an inlier RATIO — invariant under uniform subsampling. The NN pass
    # over the full keyframe cloud was the dominant fleet-step cost
    # (scripts/profile_fleet_phases.py).
    #
    # The heavy verification INPUTS (keyframe-cloud slice + world
    # transform + one-hot MXU submap gathers over the big state arrays)
    # build INSIDE the cond's verify branch: a batch with no inter
    # candidates — the common serving case — skips them entirely
    # (measured ~13 ms of a 47 ms 4x16-frame step spent gathering
    # submaps nobody verified, scripts/profile_fleet_phases.py).
    cur_poses = se3.Pose(state.opt_R[slots], state.opt_t[slots])

    def verify(_):
        P = cfg.keyframe.points_per_keyframe
        n_src = min(cfg.loop.icp_source_points, P)
        clouds = pc.Cloud(
            state.kf_xyz[slots, : n_src * 3].reshape(B, n_src, 3),
            state.kf_mask[slots, :n_src],
        )
        worlds = pc.transform(clouds, cur_poses.R, cur_poses.t)
        submaps = jax.vmap(
            lambda ps, mr: _gather_submap(state, ps, mr, cfg)
        )(pre_slots, m_robs)
        res = reg.ransac_align_batched(
            worlds,
            submaps,
            key,
            attempts,
            num_hypotheses=cfg.loop.ransac_max_iter,
            inlier_thresh=cfg.loop.ransac_outlier_threshold,
            min_inlier_ratio=cfg.loop.ransac_inlier_ratio,
        )
        return res.success, res.pose.R, res.pose.t, res.inlier_ratio

    def skip(_):
        dt = state.opt_t.dtype
        return (
            jnp.zeros((B,), bool),
            jnp.broadcast_to(jnp.eye(3, dtype=dt), (B, 3, 3)),
            jnp.zeros((B, 3), dt),
            jnp.zeros((B,), dt),
        )

    success, a_R, a_t, ratio = jax.lax.cond(
        jnp.any(attempts), verify, skip, operand=None
    )
    oks = attempts & success

    # factor z = T_pre^-1 ∘ (alignment ∘ T_cur), as in the RPC path
    corrected = se3.compose(se3.Pose(a_R, a_t), cur_poses)
    pre_poses = se3.Pose(state.opt_R[pre_slots], state.opt_t[pre_slots])
    z = se3.between(pre_poses, corrected)
    noise = jnp.maximum(1.0 - ratio, 1e-3)

    # vectorized queue append (exclusive cumsum; scratch-row drop past
    # capacity — the _enqueue_intra_block pattern)
    lq = state.loop_queue
    Q = lq.i.shape[0]
    ok_i = oks.astype(jnp.int32)
    qpos = lq.count + jnp.cumsum(ok_i) - ok_i
    qoks = oks & (qpos < Q)
    pos_w = jnp.where(qoks, qpos, Q)

    def scatter_rows(arr, rows):
        return _scatter_rows_capped(arr, rows, pos_w, Q)

    new_q = LoopQueue(
        i=scatter_rows(lq.i, encode_kf(m_robs, m_idxs)),
        j=scatter_rows(lq.j, encode_kf(robots, q_idxs)),
        z_R=scatter_rows(lq.z_R, z.R),
        z_t=scatter_rows(lq.z_t, z.t),
        noise=scatter_rows(lq.noise, noise),
        count=lq.count + jnp.sum(qoks.astype(jnp.int32)),
    )
    state = state._replace(
        loop_queue=new_q,
        loop_target=state.loop_target.at[slots].set(
            jnp.where(qoks, pre_slots, state.loop_target[slots])
        ),
        loop_closed=state.loop_closed | jnp.any(qoks),
    )
    return state, oks, m_robs, m_idxs, ratio


def _fleet_body(state, key, robots, pose_R, pose_t, xyz, mask, stamps, cfg):
    """Process a batch of keyframes (any mix of robots) in ONE program.

    Batched-lane form (the ``_batch_body_prepared`` structure generalized
    to mixed-robot batches):

    0. ``vmap`` the DB-independent frame prep (storage downsample +
       descriptor build) over the whole batch.
    1. ``lax.scan`` the (tiny, inherently sequential) per-frame ingest.
    2. Intra loops: ONE vmapped retrieval + ONE lane-batched ICP
       (predicated kernels — frames without candidates skip tile compute)
       + vectorized queue append.
    3. Inter loops: ONE vmapped inter retrieval + ONE lane-batched RANSAC
       (:func:`_detect_verify_inter_block`).

    Semantics vs the per-frame sequential scan this replaced: identical
    per-robot (intra retrieval's one-sided index exclusion makes
    post-insert batch retrieval equal to sequential retrieval — see
    ``_batch_body_prepared``), relaxed ACROSS robots within one batch:
    inter retrieval sees every batch-mate (sequential saw only earlier
    ones) and queue rows group intra-before-inter instead of
    interleaving by frame. Both only ADD loop-closure opportunities or
    permute queue order within one step; serving batches have no
    intrinsic cross-robot order. Measured: 374 -> ~1000+ frames/s on the
    bench fleet workload (B=16 lanes of ICP/RANSAC share every kernel
    instead of running serially under per-frame conds).

    Returns the updated state, advanced RNG key, and per-frame event
    arrays ``(ok_intra, intra_index, fitness, ok_inter, peer, peer_index,
    inlier_ratio)``.
    """
    B = stamps.shape[0]
    smalls, descs = jax.vmap(lambda x, m: _prepare_frame(x, m, cfg))(
        xyz, mask
    )

    # phase 1: vectorized mixed-robot block ingest (one scatter per state
    # array; replaces a lax.scan that carried the whole state through B
    # per-frame _ingest_prepared steps). counts_hist[b] = frame b's
    # own-robot keyframe count at its sequential detection time.
    state, slots, q_idxs, counts_hist = _ingest_prepared_fleet_block(
        state, robots, se3.Pose(pose_R, pose_t), smalls, descs, stamps, cfg
    )

    # phase 2: intra loops, batched lanes
    if cfg.loop.intra_enabled:
        fam = registry.get_family(cfg)

        def retrieve(desc, r, q_idx, slot):
            match = fam.query(state.desc_db, desc, r, q_idx, mode="intra")
            already = state.loop_target[slot] >= 0
            attempt = match.found & ~already
            match_slot = jnp.where(attempt, match.db_pos, slot)
            return match.index, match.yaw, attempt, match_slot

        m_idxs, yaws, attempts, match_slots = jax.vmap(retrieve)(
            descs, robots, q_idxs, slots
        )

        # yaw-initialized start poses (small-array math, needed by both
        # branches) stay outside the cond; the heavy gathers (keyframe
        # cloud slice + one-hot MXU submap gather) build inside the verify
        # branch so candidate-free batches skip them (same rationale as
        # _detect_verify_inter_block).
        cur_pose = se3.Pose(state.opt_R[slots], state.opt_t[slots])
        init_poses = _yaw_seed_pose(cur_pose, yaws)

        def verify(_):
            cur, tgt, _inits = jax.vmap(
                lambda sl, ms, yw, r, ct: _intra_verify_inputs(
                    state, sl, ms, yw, r, cfg, count=ct
                )
            )(slots, match_slots, yaws, robots, counts_hist)
            src_world = pc.transform(cur, init_poses.R, init_poses.t)
            res = reg.icp_batched(
                src_world,
                tgt,
                se3.identity((B,), dtype=state.opt_t.dtype),
                attempts,
                max_iters=cfg.loop.icp_iterations,
                max_corr_dist=cfg.loop.icp_max_corr_dist,
                tol=cfg.loop.icp_tol,
                coarse_factor=cfg.loop.icp_coarse_factor,
                gate_fitness=cfg.loop.history_fitness_score,
                target_stride=cfg.loop.icp_target_stride,
                reuse_final_fitness=cfg.loop.icp_reuse_final_fitness,
            )
            corrected = se3.compose(res.pose, init_poses)
            return res.fitness, corrected.R, corrected.t

        def skip(_):
            return (
                jnp.full((B,), jnp.inf, state.opt_t.dtype),
                init_poses.R,
                init_poses.t,
            )

        fits, corr_R, corr_t = jax.lax.cond(
            jnp.any(attempts), verify, skip, operand=None
        )
        state, ok_i = _enqueue_intra_block(
            state, robots, slots, match_slots, q_idxs, m_idxs, fits,
            attempts, corr_R, corr_t, cfg,
        )
    else:
        m_idxs = jnp.zeros((B,), jnp.int32)
        fits = jnp.full((B,), jnp.inf, state.opt_t.dtype)
        ok_i = jnp.zeros((B,), bool)

    # phase 3: inter loops, batched lanes (reads post-intra loop_target so
    # a frame whose intra loop was accepted is deduped, as sequentially)
    if cfg.loop.inter_enabled and cfg.number_of_robots > 1:
        key, sub = jax.random.split(key)
        state, ok_x, peers, p_idxs, ratios = _detect_verify_inter_block(
            state, sub, robots, slots, q_idxs, descs, cfg
        )
    else:
        ok_x = jnp.zeros((B,), bool)
        peers = jnp.zeros((B,), jnp.int32)
        p_idxs = jnp.zeros((B,), jnp.int32)
        ratios = jnp.zeros((B,), state.opt_t.dtype)

    return state, key, (ok_i, m_idxs, fits, ok_x, peers, p_idxs, ratios)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _fleet_step(state, key, robots, pose_R, pose_t, xyz, mask, stamps, cfg):
    """Jitted single-fleet-batch entry point (see :func:`_fleet_body`)."""
    return _fleet_body(
        state, key, robots, pose_R, pose_t, xyz, mask, stamps, cfg
    )


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _fleet_replay(state, key, robots, pose_R, pose_t, xyz, mask, stamps, cfg):
    """R fleet batches in ONE device program: ``lax.scan`` over the fleet

    batch step (leaves [R, B, ...]). The multi-robot analog of
    ``mapper._replay_batches`` — identical results to R sequential
    :func:`_fleet_step` calls, paying the ~1-3 ms tunneled-runtime
    dispatch floor once per R batches instead of once per batch.
    """
    def step(carry, inp):
        st, k = carry
        r, pR, pt, x, m, s = inp
        st, k, outs = _fleet_body(st, k, r, pR, pt, x, m, s, cfg)
        return (st, k), outs

    (state, key), outs = jax.lax.scan(
        step, (state, key), (robots, pose_R, pose_t, xyz, mask, stamps)
    )
    return state, key, jax.tree_util.tree_map(
        lambda o: o.reshape((-1,) + o.shape[2:]), outs
    )


class FleetMapper(Mapper):
    """Serve N robots' SLAM sessions from one shared device-resident state.

    Host surface: feed odometry frames per robot with
    :meth:`add_robot_frame` (keyframe-gated per robot), then :meth:`step`
    drains all staged keyframes in one device program. Everything inherited
    from :class:`Mapper` that reads the full state (``trajectory``,
    ``global_map``, ``save_trajectories``, ``loop_constraints``,
    ``export_artifacts``, eviction) works unchanged — the state layout is
    identical; only the feeding path differs.
    """

    def __init__(self, cfg: SlamConfig):
        super().__init__(cfg)
        self._fleet_last_pose: dict[int, se3.Pose] = {}
        self._fleet_staged: list[tuple] = []
        self._staged_per_robot: dict[int, int] = {}
        self._fleet_key = jax.random.PRNGKey(cfg.robot_id + 101)

    # -- feeding --
    def _gate(self, robot: int, pose: se3.Pose) -> bool:
        """Per-robot host-side keyframe gate (1 m / 0.2 rad — reference
        ``saveFrame`` semantics). Host numpy, not jnp: the jnp form costs
        two device round trips PER RAW FRAME (~80 ms each on the tunneled
        chip — measured 8.7 frames/s fleet throughput from this alone);
        same rationale as ``Mapper.should_add_keyframe``."""
        last = self._fleet_last_pose.get(robot)
        if last is None:
            return True
        R0, t0 = np.asarray(last.R), np.asarray(last.t)
        R1, t1 = np.asarray(pose.R), np.asarray(pose.t)
        dist = float(np.linalg.norm(t1 - t0))
        cos_ang = (np.trace(R0.T @ R1) - 1.0) * 0.5
        ang = float(np.arccos(np.clip(cos_ang, -1.0, 1.0)))
        return (
            dist >= self.cfg.keyframe.distance_threshold
            or ang >= self.cfg.keyframe.angle_threshold
        )

    def add_robot_frame(
        self, robot: int, pose: se3.Pose, xyz: np.ndarray, stamp: float = 0.0
    ) -> bool:
        """Gate + stage one robot's odometry frame. Returns True when it
        became a keyframe (processed at the next :meth:`step`)."""
        if not (0 <= robot < self.cfg.number_of_robots):
            raise ValueError(f"robot {robot} out of range")
        if not self._gate(robot, pose):
            return False
        self._fleet_last_pose[robot] = pose
        cloud = pc.from_points(xyz, self.cfg.keyframe.raw_points_capacity)
        self._fleet_staged.append((robot, pose, cloud, float(stamp)))
        self._staged_per_robot[robot] = self._staged_per_robot.get(robot, 0) + 1
        return True

    def _ensure_robot_capacity(self, robot: int, n_new: int) -> None:
        """Evict (compact) until ``n_new`` more keyframes fit ``robot``'s
        block — Mapper._ensure_capacity's guards, per robot: an impossible
        request and a no-progress compaction raise instead of spinning."""
        K = self.cfg.keyframe.max_keyframes
        if n_new > K:
            raise ValueError(
                f"batch stages {n_new} keyframes for robot {robot}, "
                f"exceeding capacity {K}"
            )
        while int(self.state.counts[robot]) + n_new > K:
            before = int(self.state.counts[robot])
            self._compact(robot)
            if int(self.state.counts[robot]) >= before:
                raise RuntimeError(
                    "eviction could not free capacity for the fleet batch"
                )

    # -- processing --
    def step(self) -> list[dict]:
        """Process every staged keyframe in one device program.

        Returns one event dict per processed keyframe with any intra/inter
        loop closures found for it.
        """
        if not self._fleet_staged:
            return []
        # per-robot capacity: compact (loop-anchor-preserving eviction)
        # before the batch lands, exactly like Mapper.add_frame
        for r, n_staged in self._staged_per_robot.items():
            self._ensure_robot_capacity(r, n_staged)
        staged, self._fleet_staged = self._fleet_staged, []
        self._staged_per_robot = {}
        robots = jnp.asarray([s[0] for s in staged], jnp.int32)
        pose_R = jnp.stack([s[1].R for s in staged])
        pose_t = jnp.stack([s[1].t for s in staged])
        xyz = jnp.stack([s[2].xyz for s in staged])
        mask = jnp.stack([s[2].mask for s in staged])
        stamps = jnp.asarray([s[3] for s in staged], jnp.float32)

        self.state, self._fleet_key, outs = _fleet_step(
            self.state,
            self._fleet_key,
            robots,
            pose_R,
            pose_t,
            xyz,
            mask,
            stamps,
            self.cfg,
        )
        ok_i, idx_i, fit, ok_x, peer, p_idx, ratio = (np.asarray(o) for o in outs)
        events = []
        for b, (r, _, _, _) in enumerate(staged):
            ev: dict = {"robot": r}
            if ok_i[b]:
                ev["loop"] = {
                    "matched_index": int(idx_i[b]),
                    "fitness": float(fit[b]),
                }
            if ok_x[b]:
                ev["inter_loop"] = {
                    "robot": int(peer[b]),
                    "matched_index": int(p_idx[b]),
                    "inlier_ratio": float(ratio[b]),
                }
            events.append(ev)
        return events

    def replay(
        self,
        frames,
        apply_gate: bool = True,
        batch: int = 16,
        chunk_batches: int = 8,
    ) -> dict:
        """Whole-dataset multi-robot replay in as few device programs as

        possible — the fleet analog of :meth:`Mapper.replay`. ``frames``
        is the arrival-ordered stream: an iterable of
        ``(robot, pose, scan, stamp)`` tuples. Keyframe-gated per robot
        host-side (same gate as :meth:`add_robot_frame`); accepted
        keyframes run ``batch * chunk_batches`` at a time through ONE
        scanned device program per chunk (:func:`_fleet_replay`); the
        remainder goes through the staged :meth:`step` path. Returns
        ``{"accepted": [...], "events": [...], "keyframes": {robot: n}}``
        with one event dict per accepted keyframe (same shape as
        :meth:`step`'s entries).
        """
        frames = list(frames)
        accepted, sel = [], []
        for rec in frames:
            robot, pose, scan, stamp = (
                rec if len(rec) == 4 else (*rec, 0.0)
            )
            take = (not apply_gate) or self._gate(robot, pose)
            accepted.append(take)
            if take:
                self._fleet_last_pose[robot] = pose
                sel.append((robot, pose, scan, float(stamp)))

        B, R = batch, chunk_batches
        chunk = B * R
        cap = self.cfg.keyframe.raw_points_capacity
        events: list[dict] = []
        pos = 0
        while len(sel) - pos >= chunk:
            part = sel[pos : pos + chunk]
            # per-robot capacity + queue headroom, as in step()/Mapper.replay
            per_robot: dict[int, int] = {}
            for r, *_ in part:
                per_robot[r] = per_robot.get(r, 0) + 1
            for r, n_new in per_robot.items():
                self._ensure_robot_capacity(r, n_new)
            self._ensure_queue_headroom(chunk)

            xyz_np = np.full((chunk, cap, 3), pc.PAD_VALUE, np.float32)
            mask_np = np.zeros((chunk, cap), bool)
            for j, (_, _, scan, _) in enumerate(part):
                s = pc.fit_capacity(np.asarray(scan, np.float32), cap)
                m = s.shape[0]
                xyz_np[j, :m] = s
                mask_np[j, :m] = True
            robots = jnp.asarray(
                [r for r, *_ in part], jnp.int32
            ).reshape(R, B)
            pose_R = jnp.stack([p.R for _, p, _, _ in part]).reshape(
                R, B, 3, 3
            )
            pose_t = jnp.stack([p.t for _, p, _, _ in part]).reshape(R, B, 3)
            stamps = jnp.asarray(
                [s for *_, s in part], jnp.float32
            ).reshape(R, B)
            self.state, self._fleet_key, outs = _fleet_replay(
                self.state,
                self._fleet_key,
                robots,
                pose_R,
                pose_t,
                jnp.asarray(xyz_np).reshape(R, B, cap, 3),
                jnp.asarray(mask_np).reshape(R, B, cap),
                stamps,
                self.cfg,
            )
            ok_i, idx_i, fit, ok_x, peer, p_idx, ratio = (
                np.asarray(o) for o in outs
            )
            for b, (r, *_rest) in enumerate(part):
                ev: dict = {"robot": r}
                if ok_i[b]:
                    ev["loop"] = {
                        "matched_index": int(idx_i[b]),
                        "fitness": float(fit[b]),
                    }
                if ok_x[b]:
                    ev["inter_loop"] = {
                        "robot": int(peer[b]),
                        "matched_index": int(p_idx[b]),
                        "inlier_ratio": float(ratio[b]),
                    }
                events.append(ev)
            pos += chunk
        # remainder through the staged step path (already gated)
        for r, pose, scan, stamp in sel[pos:]:
            cloud = pc.from_points(scan, cap)
            self._fleet_staged.append((r, pose, cloud, stamp))
            self._staged_per_robot[r] = self._staged_per_robot.get(r, 0) + 1
        if self._fleet_staged:
            events.extend(self.step())
        return {
            "accepted": accepted,
            "events": events,
            "keyframes": {
                r: int(self.state.counts[r])
                for r in range(self.cfg.number_of_robots)
            },
        }

    def spin(self, now: float | None = None) -> dict:
        """Throttled joint optimization (the loop-thread trigger of
        ``Mapper.spin_once`` without the per-robot detection calls — the
        fleet path detects inside :meth:`step`)."""
        import time as _time

        now = _time.monotonic() if now is None else now
        info: dict = {}
        due = (now - self._last_opt_time) >= (
            self.cfg.optimizer.mapping_process_interval
        )
        if bool(self.state.loop_closed) and due:
            info["chi2"] = self.optimize()
            self._last_opt_time = now
        return info
