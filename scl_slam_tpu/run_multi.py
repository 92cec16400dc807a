"""Multi-robot pipeline CLI — the ``test_distributed_loop.launch`` analog.

Splits one sequence (synthetic or KITTI) into N per-robot index ranges —
exactly how the reference simulates multi-robot on one machine with
namespaced rosbag replays (``launch/test_distributed_loop.launch:34-58``) —
runs N mappers over the in-process bus, and reports joint ATE.

    python -m scl_slam_tpu.run_multi --robots 2 --frames 120
    python -m scl_slam_tpu.run_multi --robots 3 --dataset kitti --root ... --sequence 05
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="scl_slam_tpu multi-robot pipeline")
    p.add_argument("--robots", type=int, default=2)
    p.add_argument("--dataset", choices=["synthetic", "kitti"], default="synthetic")
    p.add_argument("--root")
    p.add_argument("--sequence", default="05")
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--config", help="YAML config path (robot identity "
                   "fields are overridden per robot)")
    p.add_argument("--overlap", type=int, default=10,
                   help="frames of overlap between adjacent robot segments")
    p.add_argument("--output", default="/tmp/scl_slam_tpu_multi")
    p.add_argument("--platform", choices=["tpu", "cpu"], default="tpu")
    p.add_argument("--fleet", action="store_true",
                   help="centralized serving: one shared device state for "
                   "all robots (runtime/fleet.py) instead of N decentralized "
                   "mappers over the bus")
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from .config import SlamConfig, load_config
    from .geometry import se3
    from .io import kitti as kio
    from .io import trajectory as tio
    from .runtime import Mapper
    from .runtime.transport import LocalBus

    R = args.robots

    def make_cfg(r: int) -> SlamConfig:
        """Per-robot config: YAML base (if given) with identity overrides."""
        import dataclasses

        base = load_config(args.config) if args.config else SlamConfig()
        return dataclasses.replace(
            base, number_of_robots=R, robot_id=r,
            robot_name=chr(ord("a") + r),
        )

    if args.dataset == "kitti":
        if not args.root:
            print("--root required", file=sys.stderr)
            return 2
        seq = kio.KittiSequence(args.root, args.sequence)
        n = min(len(seq), args.frames)
        get_scan = seq.scan
        get_pose = seq.gt_pose_velo
    else:
        world = kio.SyntheticWorld(seed=1)
        gt = kio.loop_trajectory(n_frames=args.frames, radius=70.0)
        n = args.frames
        get_scan = lambda k: world.scan_at(gt[k], max_points=16384, seed=k)
        get_pose = lambda k: gt[k]

    # index split with overlap (the reference's bag splits overlap in space)
    seg = n // R
    splits = [
        list(range(max(0, r * seg - args.overlap), min(n, (r + 1) * seg)))
        for r in range(R)
    ]

    if args.fleet:
        from .runtime import FleetMapper

        fleet = FleetMapper(make_cfg(0))
        t0 = time.perf_counter()
        inter_loops = intra_loops = 0
        for step in range(max(len(s) for s in splits)):
            for r in range(R):
                if step >= len(splits[r]):
                    continue
                k = splits[r][step]
                T = get_pose(k)
                pose = se3.Pose(
                    jnp.asarray(T[:3, :3], jnp.float32),
                    jnp.asarray(T[:3, 3], jnp.float32),
                )
                fleet.add_robot_frame(r, pose, get_scan(k), stamp=0.1 * k)
            for ev in fleet.step():
                intra_loops += "loop" in ev
                inter_loops += "inter_loop" in ev
            fleet.spin()
        fleet.optimize()
        wall = time.perf_counter() - t0
        mappers = [fleet]  # reporting below reads robot 0's (joint) view
    else:
        bus = LocalBus()
        mappers = []
        for r in range(R):
            m = Mapper(make_cfg(r))
            m.attach_bus(bus)
            mappers.append(m)

        t0 = time.perf_counter()
        inter_loops = intra_loops = 0
        for step in range(max(len(s) for s in splits)):
            for r in range(R):
                if step >= len(splits[r]):
                    continue
                k = splits[r][step]
                T = get_pose(k)
                pose = se3.Pose(
                    jnp.asarray(T[:3, :3], jnp.float32), jnp.asarray(T[:3, 3], jnp.float32)
                )
                wire = mappers[r].add_frame(pose, get_scan(k), stamp=0.1 * k)
                if wire is not None:
                    mappers[r].broadcast_latest(wire)
                    info = mappers[r].spin_once()
                    if info.get("loop"):
                        intra_loops += 1
                    if info.get("inter_loop"):
                        inter_loops += 1
        for m in mappers:
            m.optimize()
        wall = time.perf_counter() - t0

    mappers[0].save_trajectories(args.output)
    report = {
        "robots": R,
        "mode": "fleet" if args.fleet else "decentralized",
        "frames": n,
        "intra_loops": intra_loops,
        "inter_loops": inter_loops,
        "wall_s": round(wall, 2),
        "frames_per_s": round(n / wall, 2),
        "output": args.output,
    }
    # joint ATE from robot 0's view of everyone
    ates = {}
    for r in range(R):
        est = mappers[0].trajectory(robot=r)
        if len(est) == 0:
            continue
        stamps = mappers[0].keyframe_stamps(robot=r)
        gt_poses = np.stack(
            [np.asarray(get_pose(int(round(float(s) / 0.1)))) for s in stamps]
        )
        ates[chr(ord("a") + r)] = round(tio.ate_rmse(est, gt_poses), 4)
    report["ate_rmse_m"] = ates
    try:  # figure is auxiliary output — never fail the run over it
        from .io import viz

        trajs = {}
        gts = {}
        for r in range(R):
            est = mappers[0].trajectory(robot=r)
            if len(est) == 0:
                continue
            label = chr(ord("a") + r)
            trajs[label] = est
            stamps = mappers[0].keyframe_stamps(robot=r)
            gts[label] = np.stack(
                [np.asarray(get_pose(int(round(float(s) / 0.1))))
                 for s in stamps]
            )
        # ONE joint gauge alignment for display: the graph's first-pose
        # prior deliberately leaves yaw + translation free (reference
        # GTSAM prior semantics), so the joint estimate is correct only
        # up to an in-plane rigid gauge; align ALL robots with a single
        # transform (per-robot alignment would hide genuine inter-robot
        # misalignment) and move the loop chords/map with it.
        loops_viz = mappers[0].loop_constraints()
        map_pts = mappers[0].global_map(max_points=1 << 16)
        if trajs:
            est_all = np.concatenate(
                [trajs[k][:, :3, 3] for k in sorted(trajs)])
            gt_all = np.concatenate(
                [gts[k][:, :3, 3] for k in sorted(trajs)])
            s, Rw, tw = tio.umeyama_align(est_all, gt_all)

            def apply(T):
                out = T.copy()
                out[:, :3, 3] = (s * (Rw @ T[:, :3, 3].T)).T + tw
                out[:, :3, :3] = Rw @ T[:, :3, :3]
                return out

            trajs = {k: apply(v) for k, v in trajs.items()}
            for lc in loops_viz:
                lc["pi"] = s * (Rw @ np.asarray(lc["pi"])) + tw
                lc["pj"] = s * (Rw @ np.asarray(lc["pj"])) + tw
            if len(map_pts):
                map_pts = (s * (Rw @ np.asarray(map_pts).T)).T + tw
        report["figure"] = viz.save_fleet_figure(
            os.path.join(args.output, "trajectory.png"),
            trajs,
            gts=gts,
            loops=loops_viz,
            map_points=map_pts,
            title=f"scl_slam_tpu — {R} robots, {report['mode']}",
            subtitle=(f"{intra_loops} intra + {inter_loops} inter loops  ·  "
                      f"ATE " + ", ".join(f"{k}: {v}" for k, v in ates.items())),
        )
    except Exception as e:
        report["figure_error"] = str(e)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
