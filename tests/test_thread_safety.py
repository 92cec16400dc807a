"""Mapper state-mutation thread safety (the TcpBus bus-thread envelope).

With a socket transport, peer descriptors are ingested on the bus's
connection-handler thread while the main thread runs add_frame/spin_once/
optimize. Before the r4 state lock, both did unlocked read-modify-writes
of ``mapper.state`` and one update could be silently lost. This hammers
exactly that interleaving in-process.
"""
import dataclasses
import threading

import jax.numpy as jnp
import numpy as np

from scl_slam_tpu.config import KeyframeConfig, SlamConfig
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.io import kitti as kio
from scl_slam_tpu.runtime import Mapper


def _cfg(robot):
    return dataclasses.replace(
        SlamConfig(),
        number_of_robots=2,
        robot_id=robot,
        robot_name=chr(ord("a") + robot),
        keyframe=KeyframeConfig(
            distance_threshold=0.0, angle_threshold=0.0,
            raw_points_capacity=8192, points_per_keyframe=2048,
            max_keyframes=64,
        ),
    )


def test_concurrent_peer_ingest_no_lost_updates():
    m0, m1 = Mapper(_cfg(0)), Mapper(_cfg(1))
    world = kio.SyntheticWorld(seed=2, extent=80.0, pts_per_cluster=300)
    gt = kio.loop_trajectory(n_frames=16, radius=12.0)

    def pose_of(k):
        T = gt[k]
        return se3.Pose(
            jnp.asarray(T[:3, :3], jnp.float32),
            jnp.asarray(T[:3, 3], jnp.float32),
        )

    wires = []
    for k in range(16):
        w = m1.add_frame(
            pose_of(k), world.scan_at(gt[k], max_points=8192, seed=100 + k),
            stamp=0.1 * k,
        )
        if w is not None:
            wires.append((k, np.asarray(w)))
    assert len(wires) == 16

    errs = []

    def pusher():
        try:
            for i, (k, w) in enumerate(wires):
                pre = pose_of(wires[i - 1][0]) if i > 0 else pose_of(k)
                assert m0.ingest_peer_descriptor(
                    1, i, pre, pose_of(k), w, stamp=0.1 * k
                ), i
        except Exception as e:  # surface thread failures in the main test
            errs.append(e)

    th = threading.Thread(target=pusher)
    th.start()
    for k in range(16):
        m0.add_frame(
            pose_of(k), world.scan_at(gt[k], max_points=8192, seed=k),
            stamp=0.1 * k,
        )
    th.join()
    assert not errs, errs
    counts = np.asarray(m0.state.counts)[:2]
    # pre-lock, this nondeterministically read (16, <16) or (<16, 16)
    assert counts[0] == 16 and counts[1] == 16, counts
