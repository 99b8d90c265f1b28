#!/usr/bin/env python
"""KITTI odometry stereo runner (BASELINE.md config 4).

The reference only ships a TUM driver, but its System supports stereo
(src/system.hpp:45); this driver provides the same contract for KITTI:
median/mean tracking time + TUM-format trajectory export + optional ATE
against KITTI poses.

Usage:
  python apps/run_kitti_stereo.py SEQUENCE_DIR [--config CFG.yaml]
      [--poses POSES.txt] [--max-frames N]
"""
import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence_dir")
    ap.add_argument("--config", default=None)
    ap.add_argument("--poses", default=None, help="KITTI ground-truth poses.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--pipelined", action="store_true",
                    help="device-resident dispatch-ahead tracking")
    ap.add_argument("--lag", type=int, default=16)
    ap.add_argument("--out-trajectory", default="CameraTrajectory.txt")
    ap.add_argument("--viewer-dir", default=None,
                    help="periodic in-run rendering (frame+map PNGs)")
    ap.add_argument("--viewer-every", type=int, default=30)
    args = ap.parse_args()

    # Env-gated multi-host runtime join (no-op single-process).
    from ydorbslam_tpu.parallel.multihost import (initialize_distributed,
                                                  process_info)

    if initialize_distributed():
        print(f"distributed: {process_info()}")

    from ydorbslam_tpu.config import CameraConfig, SlamConfig, load_config
    from ydorbslam_tpu.io import KittiStereoDataset, ate_rmse, kitti_intrinsics
    from ydorbslam_tpu.io.trajectory import read_tum_trajectory
    from ydorbslam_tpu.slam.system import SlamSystem, Sensor

    ds = KittiStereoDataset(args.sequence_dir)
    fx, fy, cx, cy, bf = kitti_intrinsics(
        os.path.join(args.sequence_dir, "calib.txt")
    )
    _, left0, _ = ds[0]
    h, w = left0.shape
    cfg = load_config(args.config) if args.config else SlamConfig()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(
            cfg.camera, fx=fx, fy=fy, cx=cx, cy=cy, bf=bf,
            k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,  # KITTI is rectified
            width=w, height=h, fps=10.0,
        ),
    )
    n = len(ds) if not args.max_frames else min(args.max_frames, len(ds))
    system = SlamSystem(cfg, Sensor.STEREO, enable_loop_closing=not args.no_loop)
    if args.pipelined:
        system.enable_pipelined(lag=args.lag)
        system.precompile()
    if args.viewer_dir:
        system.attach_viewer(args.viewer_dir, every=args.viewer_every)
    track = (
        system.track_stereo_pipelined if args.pipelined
        else system.track_stereo
    )
    times = []
    for i in range(n):
        t, left, right = ds[i]
        t0 = time.perf_counter()
        track(t, left, right)
        times.append(time.perf_counter() - t0)
        if i % 100 == 0:
            print(
                f"frame {i}/{n} state={system.tracking_state().name} "
                f"kfs={system.n_keyframes}"
            )
    system.shutdown()
    stimes = sorted(times[3:]) or times
    print(f"median tracking time: {stimes[len(stimes) // 2]:.4f}")
    print(f"mean tracking time: {sum(stimes) / len(stimes):.4f}")
    system.save_trajectory_tum(args.out_trajectory)

    from ydorbslam_tpu.slam.stats import format_stats

    print("--- run stats ---")
    print(format_stats(system.run_stats()))

    if args.poses:
        P = np.loadtxt(args.poses).reshape(-1, 3, 4)  # T_w_cam rows
        t_est, p_est, _ = read_tum_trajectory(args.out_trajectory)
        gt_pos = P[: len(ds), :, 3]
        k = min(len(p_est), len(gt_pos))
        if k >= 3:
            print(f"ATE RMSE: {ate_rmse(p_est[:k], gt_pos[:k]):.3f} m")


if __name__ == "__main__":
    main()
