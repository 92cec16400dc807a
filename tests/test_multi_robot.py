"""Two-robot collaborative mapping over the in-process bus.

The analog of the reference's 2-way KITTI bag split
(``launch/test_distributed_loop.launch:41-44``): both robots survey
overlapping arcs of the same world, exchange descriptors, verify
cross-robot loops over the RPC, and jointly optimize.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scl_slam_tpu.config import (
    KeyframeConfig,
    LoopConfig,
    OptimizerConfig,
    ScanContextParams,
    SlamConfig,
)
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.io import kitti, trajectory as tio
from scl_slam_tpu.runtime import Mapper
from scl_slam_tpu.runtime.transport import LocalBus


def robot_cfg(rid):
    return SlamConfig(
        number_of_robots=2,
        robot_id=rid,
        robot_name=chr(ord("a") + rid),
        keyframe=KeyframeConfig(
            max_keyframes=64,
            points_per_keyframe=2048,
            raw_points_capacity=4096,
            distance_threshold=2.0,
            descript_leaf_size=0.3,
        ),
        loop=LoopConfig(
            near_keyframes=4,
            submap_capacity=8192,
            icp_iterations=20,
            history_fitness_score=8.0,
            ransac_inlier_ratio=0.3,
            ransac_outlier_threshold=1.0,
        ),
        optimizer=OptimizerConfig(edge_capacity=512, gn_iters=6, cg_iters=48),
        scan_context=ScanContextParams(exclude_recent=10, num_candidates=6),
    )


@pytest.fixture(scope="module")
def two_robot_run():
    world = kitti.SyntheticWorld(
        seed=5, extent=100.0, n_clusters=70, pts_per_cluster=800
    )
    # both robots drive the same circle, robot b starts half a revolution in:
    # their arcs overlap everywhere -> plenty of inter-robot loop chances
    gt = kitti.loop_trajectory(n_frames=80, radius=35.0, revisit=False)
    split = [list(range(0, 48)), list(range(40, 80))]

    bus = LocalBus()
    mappers = [Mapper(robot_cfg(0)), Mapper(robot_cfg(1))]
    for m in mappers:
        m.attach_bus(bus)

    inter_loops = []
    # interleave the two robots frame by frame (bag replay analog)
    for step in range(max(len(s) for s in split)):
        for rid, frames in enumerate(split):
            if step >= len(frames):
                continue
            k = frames[step]
            scan = world.scan_at(gt[k], max_points=4096, seed=k)
            pose = se3.Pose(
                jnp.asarray(gt[k][:3, :3], jnp.float32),
                jnp.asarray(gt[k][:3, 3], jnp.float32),
            )
            wire = mappers[rid].add_frame(pose, scan, stamp=0.1 * k)
            if wire is not None:
                mappers[rid].broadcast_latest(wire)
                info = mappers[rid].spin_once()
                if info.get("inter_loop"):
                    inter_loops.append((rid, info["inter_loop"]))
    for m in mappers:
        m.optimize()
    return world, gt, split, mappers, inter_loops


class TestTwoRobots:
    def test_descriptors_exchanged(self, two_robot_run):
        _, _, split, mappers, _ = two_robot_run
        # each mapper's DB holds both robots' keyframes
        for m in mappers:
            assert int(m.state.counts[0]) > 10
            assert int(m.state.counts[1]) > 10

    def test_inter_loops_found(self, two_robot_run):
        _, _, _, _, inter_loops = two_robot_run
        assert len(inter_loops) >= 1

    def test_joint_trajectories_consistent(self, two_robot_run):
        world, gt, split, mappers, _ = two_robot_run
        # robot a's view of robot b's trajectory must match gt after the
        # joint solve (both fed gt odometry here, so ATE ~ small)
        m = mappers[0]
        est_b = m.trajectory(robot=1)
        stamps_b = m.keyframe_stamps(robot=1)
        gt_b = np.stack([gt[int(round(float(s) / 0.1))] for s in stamps_b])
        ate = tio.ate_rmse(est_b, gt_b)
        assert ate < 1.0

    def test_out_of_order_descriptor_dropped(self):
        m = Mapper(robot_cfg(0))
        wire = np.zeros(20 * 60, np.float32)
        ident = se3.identity()
        assert not m.ingest_peer_descriptor(1, 5, ident, ident, wire)
        assert m.ingest_peer_descriptor(1, 0, ident, ident, wire)
        assert int(m.state.counts[1]) == 1
