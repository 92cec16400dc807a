"""Macro-batched keyframe step must be semantically identical to the

sequential fused step (same state evolution, same detections)."""
import jax.numpy as jnp
import numpy as np

from scl_slam_tpu.geometry import se3
from scl_slam_tpu.runtime import mapper as M
from scl_slam_tpu.runtime.state import make_state

from test_checkpoint import tiny_cfg


def test_batch_equals_sequential():
    cfg = tiny_cfg()
    rng = np.random.RandomState(0)
    B = 6
    xyz = jnp.asarray(rng.uniform(-20, 20, (B, 512, 3)), jnp.float32)
    mask = jnp.ones((B, 512), bool)
    pose_R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    pose_t = jnp.stack([jnp.array([2.0 * k, 0.0, 0.0]) for k in range(B)])
    stamps = jnp.arange(B, dtype=jnp.float32) * 0.1

    # sequential fused path
    s1 = make_state(cfg)
    for k in range(B):
        s1, _, ok, match, fit = M._ingest_and_detect(
            s1, jnp.array(0), se3.Pose(pose_R[k], pose_t[k]),
            xyz[k], mask[k], stamps[k], cfg,
        )

    # batched path
    s2 = make_state(cfg)
    s2, oks, idxs, fits = M._ingest_and_detect_batch(
        s2, jnp.array(0), se3.Pose(pose_R, pose_t), xyz, mask, stamps, cfg
    )

    assert int(s2.counts[0]) == int(s1.counts[0]) == B
    np.testing.assert_allclose(np.asarray(s2.opt_t), np.asarray(s1.opt_t), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s2.desc_db.keys), np.asarray(s1.desc_db.keys), atol=1e-6
    )
    assert int(s2.graph.num_edges) == int(s1.graph.num_edges)
    assert int(s2.loop_queue.count) == int(s1.loop_queue.count)
