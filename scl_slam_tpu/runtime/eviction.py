"""City-scale map management: keyframe eviction + block compaction.

The reference has no eviction story at all — its keyframe/descriptor stores
grow without bound (``keyFrameArray``/DB vectors, reference
``include/distributedMapping.h:57-96``), so long sessions eventually exhaust
memory. Here every robot's state lives in a fixed-capacity block of
``max_keyframes`` slots; when a block fills, this module evicts redundant
keyframes and compacts the block so the session can run indefinitely.

Policy (``plan_keep``): keep the block's first frame (gauge/prior anchor),
the ``evict_keep_recent`` most recent frames (active submap + recency
exclusion window), and every frame anchoring a loop factor (graph loop
edges, accepted ``loop_target`` pairs, queued loops, priors). The remaining
middle frames are temporally decimated: every ``evict_stride``-th survives.
This is the standard fixed-lag/keyframe-culling compromise: loop structure
(what makes the graph observable) is never discarded; pure odometry chain
frames are, with their between-factors *recomposed* across the gap — exact
composition of the stored odometry increments, with variance scaled by the
gap length.

Runs on the HOST in numpy: eviction fires once per ~``max_keyframes/2``
keyframes, so an O(K) host pass is fully amortized — and keeps every jitted
device program shape-stable (no recompiles, no device-side index surgery).

Protocol safety: keyframe *indices* (the wire-visible per-robot numbering,
``descriptor.h:1297-1301`` local2Global analog) are never renumbered — only
block *positions* change. Peers' in-order ingestion, inter-robot
verification requests, and the (robot, index)-encoded loop queue are
untouched by a compaction on either side.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import SlamConfig
from .state import MapperState


def _between_np(Ra, ta, Rb, tb):
    """T_a^-1 ∘ T_b in numpy: (R, t)."""
    R = Ra.T @ Rb
    t = Ra.T @ (tb - ta)
    return R, t


def plan_keep(state: MapperState, cfg: SlamConfig, robot: int) -> np.ndarray:
    """Boolean keep-mask over the robot's resident block positions."""
    K = cfg.keyframe.max_keyframes
    lo = robot * K
    n = int(state.counts[robot])
    keep = np.zeros(n, bool)
    keep[0] = True
    keep_recent = min(cfg.keyframe.evict_keep_recent, n)
    keep[n - keep_recent:] = True

    # loop anchors from the factor graph: any non-chain edge touching the block
    g = state.graph
    ne = int(g.num_edges)
    gi = np.asarray(g.i[:ne])
    gj = np.asarray(g.j[:ne])
    chain = (gj == gi + 1) & (gi // K == gj // K)
    for ends in (gi[~chain], gj[~chain]):
        inb = ends[(ends >= lo) & (ends < lo + n)] - lo
        keep[inb] = True
    # priors
    npri = int(g.num_priors)
    pidx = np.asarray(g.prior_idx[:npri])
    inb = pidx[(pidx >= lo) & (pidx < lo + n)] - lo
    keep[inb] = True
    # accepted loops not yet drained (loop_target pairs)
    lt = np.asarray(state.loop_target[lo : lo + n])
    keep[lt >= 0] = True
    partners = np.asarray(state.loop_target)
    partners = partners[(partners >= lo) & (partners < lo + n)] - lo
    keep[partners] = True
    # queued loops ((robot, index) encoded — match by index)
    from .mapper import IDX_BASE

    q = state.loop_queue
    qn = int(q.count)
    indices = np.asarray(state.desc_db.index[lo : lo + n])
    for enc in np.concatenate([np.asarray(q.i[:qn]), np.asarray(q.j[:qn])]):
        if enc // IDX_BASE == robot:
            hit = np.nonzero(indices == enc % IDX_BASE)[0]
            keep[hit] = True

    # decimate the rest
    evictable = np.nonzero(~keep)[0]
    keep[evictable[:: cfg.keyframe.evict_stride]] = True

    if keep.all():
        # pathological: everything anchored/recent. Force room by dropping
        # the oldest quarter of non-recent frames (minus position 0); their
        # loop edges are dropped with them — the graph stays consistent,
        # just less constrained. Without this the session would deadlock.
        candidates = np.arange(1, max(n - keep_recent, 2))
        keep[candidates[: max(len(candidates) // 4, 1)]] = False
    return keep


def compact_robot(
    state: MapperState, cfg: SlamConfig, robot: int
) -> tuple[MapperState, list[dict]]:
    """Evict + compact one robot's block. Returns (new_state, evicted_records).

    Evicted records carry (index, stamp, pose[4,4]) with the pose frozen at
    its current optimized estimate — standard fixed-lag semantics; callers
    archive them for full-trajectory export.
    """
    K = cfg.keyframe.max_keyframes
    S = state.kf_xyz.shape[0]
    lo = robot * K
    n = int(state.counts[robot])
    keep = plan_keep(state, cfg, robot)
    kept_pos = np.nonzero(keep)[0]
    dropped_pos = np.nonzero(~keep)[0]
    m = len(kept_pos)

    # old global slot -> new global slot (-1 = evicted)
    slotmap = np.arange(S, dtype=np.int64)
    slotmap[lo : lo + n] = -1
    slotmap[lo + kept_pos] = lo + np.arange(m)

    opt_R = np.asarray(state.opt_R[lo : lo + n])
    opt_t = np.asarray(state.opt_t[lo : lo + n])
    odom_R = np.asarray(state.odom_R[lo : lo + n])
    odom_t = np.asarray(state.odom_t[lo : lo + n])
    stamps = np.asarray(state.stamps[lo : lo + n])
    indices = np.asarray(state.desc_db.index[lo : lo + n])

    evicted = []
    for p in dropped_pos:
        T = np.eye(4)
        T[:3, :3] = opt_R[p]
        T[:3, 3] = opt_t[p]
        evicted.append({"index": int(indices[p]), "stamp": float(stamps[p]), "pose": T})

    def compact_rows(arr, fill):
        a = np.asarray(arr)
        block = a[lo : lo + n]
        new_block = np.empty_like(a[lo : lo + K])
        new_block[:m] = block[kept_pos]
        new_block[m:] = fill
        out = a.copy()
        out[lo : lo + K] = new_block
        return out

    eye = np.eye(3, dtype=np.float32)
    new_kf_xyz = compact_rows(state.kf_xyz, 1e6)
    new_kf_mask = compact_rows(state.kf_mask, False)
    new_odom_R = compact_rows(state.odom_R, eye)
    new_odom_t = compact_rows(state.odom_t, 0.0)
    new_opt_R = compact_rows(state.opt_R, eye)
    new_opt_t = compact_rows(state.opt_t, 0.0)
    new_stamps = compact_rows(state.stamps, 0.0)

    db = state.desc_db
    new_desc = compact_rows(db.descriptors, 0)
    new_keys = compact_rows(db.keys, 0)
    new_robot = compact_rows(db.robot, -1)
    new_index = compact_rows(db.index, -1)

    # loop_target: compact positions, remap partner values
    lt = np.asarray(state.loop_target)
    lt_vals = np.where(lt >= 0, slotmap[np.clip(lt, 0, S - 1)], -1).astype(np.int32)
    new_lt = compact_rows(lt_vals, -1)

    # ---- factor graph rebuild ----
    g = state.graph
    ne = int(g.num_edges)
    gi = np.asarray(g.i[:ne])
    gj = np.asarray(g.j[:ne])
    gzR = np.asarray(g.z.R[:ne])
    gzt = np.asarray(g.z.t[:ne])
    gsq = np.asarray(g.sqrt_info[:ne])

    in_block_i = (gi >= lo) & (gi < lo + n)
    in_block_j = (gj >= lo) & (gj < lo + n)
    chain = (gj == gi + 1) & (gi // K == gj // K) & in_block_i & in_block_j
    mi = slotmap[np.clip(gi, 0, S - 1)]
    mj = slotmap[np.clip(gj, 0, S - 1)]
    keep_edge = ~chain & (mi >= 0) & (mj >= 0)

    ei = list(mi[keep_edge])
    ej = list(mj[keep_edge])
    ezR = list(gzR[keep_edge])
    ezt = list(gzt[keep_edge])
    esq = list(gsq[keep_edge])

    # recomposed odometry chain over kept positions (exact composition of the
    # stored odometry increments; variance grows linearly with the gap)
    odom_sigma = np.asarray(cfg.optimizer.odometry_sigmas, np.float64)
    for a, b in zip(kept_pos[:-1], kept_pos[1:]):
        R, t = _between_np(odom_R[a], odom_t[a], odom_R[b], odom_t[b])
        gap = float(b - a)
        ei.append(lo + int(np.nonzero(kept_pos == a)[0][0]))
        ej.append(lo + int(np.nonzero(kept_pos == b)[0][0]))
        ezR.append(R.astype(np.float32))
        ezt.append(t.astype(np.float32))
        esq.append((1.0 / (odom_sigma * np.sqrt(gap))).astype(np.float32))

    E = g.edge_capacity
    if len(ei) > E:
        raise RuntimeError(
            f"compacted graph needs {len(ei)} edges > capacity {E}"
        )
    ni = np.zeros(E, np.int32)
    nj = np.zeros(E, np.int32)
    nzR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
    nzt = np.zeros((E, 3), np.float32)
    nsq = np.zeros((E, 6), np.float32)
    ncount = len(ei)
    if ncount:
        ni[:ncount] = ei
        nj[:ncount] = ej
        nzR[:ncount] = np.stack(ezR)
        nzt[:ncount] = np.stack(ezt)
        nsq[:ncount] = np.stack(esq)

    npri = int(g.num_priors)
    pidx = np.asarray(g.prior_idx[:npri])
    pmap = slotmap[np.clip(pidx, 0, S - 1)]
    pkeep = pmap >= 0
    P = g.prior_capacity
    npidx = np.zeros(P, np.int32)
    npzR = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    npzt = np.zeros((P, 3), np.float32)
    npsq = np.zeros((P, 6), np.float32)
    pc = int(pkeep.sum())
    npidx[:pc] = pmap[pkeep]
    npzR[:pc] = np.asarray(g.prior_z.R[:npri])[pkeep]
    npzt[:pc] = np.asarray(g.prior_z.t[:npri])[pkeep]
    npsq[:pc] = np.asarray(g.prior_sqrt_info[:npri])[pkeep]

    from ..geometry import se3
    from ..graph.factors import FactorGraph

    new_graph = FactorGraph(
        i=jnp.asarray(ni),
        j=jnp.asarray(nj),
        z=se3.Pose(jnp.asarray(nzR), jnp.asarray(nzt)),
        sqrt_info=jnp.asarray(nsq),
        num_edges=jnp.asarray(ncount, jnp.int32),
        prior_idx=jnp.asarray(npidx),
        prior_z=se3.Pose(jnp.asarray(npzR), jnp.asarray(npzt)),
        prior_sqrt_info=jnp.asarray(npsq),
        num_priors=jnp.asarray(pc, jnp.int32),
    )

    new_counts = np.asarray(state.counts).copy()
    new_counts[robot] = m

    new_state = state._replace(
        kf_xyz=jnp.asarray(new_kf_xyz),
        kf_mask=jnp.asarray(new_kf_mask),
        odom_R=jnp.asarray(new_odom_R),
        odom_t=jnp.asarray(new_odom_t),
        opt_R=jnp.asarray(new_opt_R),
        opt_t=jnp.asarray(new_opt_t),
        stamps=jnp.asarray(new_stamps),
        counts=jnp.asarray(new_counts),
        desc_db=db._replace(
            descriptors=jnp.asarray(new_desc),
            keys=jnp.asarray(new_keys),
            robot=jnp.asarray(new_robot),
            index=jnp.asarray(new_index),
            count=jnp.asarray(int((new_index >= 0).sum()), jnp.int32),
        ),
        graph=new_graph,
        loop_target=jnp.asarray(new_lt),
    )
    return new_state, evicted
