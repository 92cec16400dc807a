"""Every descriptor family must drive the full mapper pipeline."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scl_slam_tpu.config import (
    DescriptorType,
    KeyframeConfig,
    LidarIrisParams,
    LoopConfig,
    OptimizerConfig,
    ScanContextParams,
    SlamConfig,
)
from scl_slam_tpu.descriptors import registry
from scl_slam_tpu.geometry import se3
from scl_slam_tpu.runtime import Mapper

FAMILIES = ["scan_context", "lidar_iris", "m2dp", "grsd", "fpfh", "shot"]


def family_cfg(kind):
    return SlamConfig(
        descriptor_type=DescriptorType(kind),
        keyframe=KeyframeConfig(
            max_keyframes=16, points_per_keyframe=512, raw_points_capacity=1024
        ),
        loop=LoopConfig(near_keyframes=2, submap_capacity=1024, icp_iterations=4),
        optimizer=OptimizerConfig(edge_capacity=64, gn_iters=2, cg_iters=8),
        scan_context=ScanContextParams(exclude_recent=2),
        lidar_iris=LidarIrisParams(exclude_recent=2),
    )


@pytest.mark.parametrize("kind", FAMILIES)
class TestFamilyDispatch:
    def test_mapper_roundtrip(self, kind):
        cfg = family_cfg(kind)
        m = Mapper(cfg)
        rng = np.random.RandomState(hash(kind) % 2**31)
        wire = None
        for k in range(4):
            xyz = rng.uniform(-30, 30, (800, 3)).astype(np.float32)
            wire = m.add_frame(
                se3.Pose(jnp.eye(3), jnp.array([2.0 * k, 0.0, 0.0])), xyz, 0.1 * k
            )
        assert wire is not None
        fam = registry.get_family(cfg)
        assert len(wire) == fam.wire_dim
        m.spin_once()
        assert int(m.state.counts[0]) == 4

    def test_peer_ingest_wire_format(self, kind):
        cfg = family_cfg(kind)
        m = Mapper(cfg)
        fam = registry.get_family(cfg)
        wire = np.zeros(fam.wire_dim, np.float32)
        ident = se3.identity()
        assert m.ingest_peer_descriptor(0 if cfg.number_of_robots > 1 else 0, 0,
                                        ident, ident, wire)
        assert int(m.state.desc_db.count) == 1
