"""Attribute the x6 exploration ATE with the warped generator's ANALYTIC
ground truth (VERDICT r4 weak #6 / next-round #6).

The warped_tum generator (tools/make_warped_tum.py) knows the exact
textured plane (n . X = d) and the exact camera poses, and the
estimator's gauge is pinned to it by construction (the first tracked
frame initializes at identity, so the estimator world IS camera-0's
frame — no trajectory alignment is needed, errors are directly
comparable in meters).  Three probes, each isolating one pipeline
stage:

 (a) map-point-to-plane RMS at every keyframe insertion
     -> isolates TRIANGULATION / depth-seeding error (every true
        landmark lies exactly on the plane);
 (b) keyframe pose error at insertion (the tracker's estimate that
     seeded the keyframe), after that frame's local BA, and at the end
     of the run (after all later BAs)
     -> isolates LOCAL BA: if BA moves keyframes toward ground truth
        the solver is fine and the error entered upstream;
 (c) per-frame RPE (1-frame relative pose error) through the run
     -> locates WHERE drift accrues: the covered early phase vs the
        void-adjacent excursion (the last ~third of the x6 sweep views
        up to ~40% texture-free void).

Synchronous mode (track_rgbd): every frame's estimate is read back
before the next frame, so probe (b)'s "at insertion" pose is exactly
the pose the keyframe was minted with.

Usage: python tools/attribute_x6.py SEQ_DIR [--out attribution.json]
(SEQ_DIR from `python tools/make_warped_tum.py SEQ_DIR 180 6.0`)
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from make_warped_tum import PLANE_D, PLANE_N  # noqa: E402


def read_gt(path):
    """timestamp -> T_cw (4x4) in the GENERATOR world frame."""
    from scipy.spatial.transform import Rotation

    out = {}
    for line in open(path):
        if line.startswith("#") or not line.strip():
            continue
        v = [float(x) for x in line.split()]
        ts, c, q = v[0], np.array(v[1:4]), v[4:8]
        Rwc = Rotation.from_quat(q).as_matrix()
        T = np.eye(4)
        T[:3, :3] = Rwc.T
        T[:3, 3] = -Rwc.T @ c
        out[round(ts, 6)] = T
    return out


def cam_center(T_cw):
    return -T_cw[:3, :3].T @ T_cw[:3, 3]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seq_dir")
    ap.add_argument("--out", default="attribution.json")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    from ydorbslam_tpu.config import load_config
    from ydorbslam_tpu.io import TumRgbdDataset
    from ydorbslam_tpu.slam.system import Sensor, SlamSystem

    cfg = load_config(os.path.join(args.seq_dir, "TUM1_warped.yaml"))
    ds = TumRgbdDataset(
        args.seq_dir, os.path.join(args.seq_dir, "assoc.txt"),
        cfg.depth.depth_map_factor, is_rgb=cfg.camera.is_rgb,
    )
    gt = read_gt(os.path.join(args.seq_dir, "groundtruth.txt"))
    n = len(ds) if not args.max_frames else min(args.max_frames, len(ds))

    system = SlamSystem(cfg, Sensor.RGBD, enable_loop_closing=False)

    # Gauge: estimator world = first camera frame.  Plane in that frame:
    ts0 = round(ds.assoc.timestamps[0], 6)
    T0 = gt[ts0]
    n_est = T0[:3, :3] @ PLANE_N
    d_est = PLANE_D + n_est @ T0[:3, 3]
    T0_inv = np.linalg.inv(T0)

    def gt_est(ts):
        """GT pose of frame ts in the estimator world frame (T_c w')."""
        return gt[round(ts, 6)] @ T0_inv

    est_poses = {}  # frame index -> (ts, T_cw est) for OK frames
    kf_events = []  # dicts per insertion
    prev_kf = 0
    for i in range(n):
        ts, gray, depth = ds[i]
        ok = system.track_rgbd(ts, gray, depth)
        if ok:
            est_poses[i] = (ts, np.asarray(system.tracker.T_cw))
        if system.n_keyframes > prev_kf:
            prev_kf = system.n_keyframes
            m = system.map
            kf_valid = np.asarray(m.kf_valid)
            fid = np.asarray(m.kf_frame_id)
            slot = int(np.argmax(np.where(kf_valid, fid, -1)))
            # (a) plane residual of every live map point
            pos = np.asarray(m.mp_pos)
            valid = np.asarray(m.mp_valid)
            res = np.abs(pos[valid] @ n_est - d_est)
            # (b) pose error: tracker estimate at insertion vs post-BA slot
            T_gt = gt_est(ts)
            c_gt = cam_center(T_gt)
            c_ins = cam_center(np.asarray(system.tracker.T_cw))
            c_ba = cam_center(np.asarray(m.kf_pose[slot]))
            kf_events.append(dict(
                frame=i, slot=slot,
                n_points=int(valid.sum()),
                plane_rms_m=float(np.sqrt(np.mean(res ** 2))),
                plane_p90_m=float(np.percentile(res, 90)),
                pose_err_at_insert_m=float(np.linalg.norm(c_ins - c_gt)),
                pose_err_after_ba_m=float(np.linalg.norm(c_ba - c_gt)),
            ))
    system.shutdown()

    # final keyframe pose error (after every later BA touched it)
    m = system.map
    for ev in kf_events:
        slot = ev["slot"]
        if not bool(np.asarray(m.kf_valid)[slot]):
            ev["pose_err_final_m"] = None  # culled
            continue
        i = ev["frame"]
        ts = ds.assoc.timestamps[i]
        c_gt = cam_center(gt_est(ts))
        c_fin = cam_center(np.asarray(m.kf_pose[slot]))
        ev["pose_err_final_m"] = float(np.linalg.norm(c_fin - c_gt))

    # (c) per-frame RPE: ||t|| of (gt_rel^-1 . est_rel) between
    # consecutive OK frames
    idxs = sorted(est_poses)
    rpe = []
    for a, b in zip(idxs, idxs[1:]):
        if b != a + 1:
            continue
        (tsa, Ta), (tsb, Tb) = est_poses[a], est_poses[b]
        rel_est = Tb @ np.linalg.inv(Ta)
        rel_gt = gt_est(tsb) @ np.linalg.inv(gt_est(tsa))
        err = np.linalg.inv(rel_gt) @ rel_est
        rpe.append((b, float(np.linalg.norm(err[:3, 3]))))
    # phase split: thirds of the sequence
    phases = {}
    for name, lo, hi in (
        ("first_third", 0, n // 3),
        ("mid_third", n // 3, 2 * n // 3),
        ("last_third", 2 * n // 3, n),
    ):
        vals = [e for f, e in rpe if lo <= f < hi]
        phases[name] = dict(
            n=len(vals),
            rpe_mean_mm=round(1e3 * float(np.mean(vals)), 3) if vals else None,
            rpe_p95_mm=round(1e3 * float(np.percentile(vals, 95)), 3)
            if vals else None,
        )

    # ATE over OK frames (direct, gauge-pinned — no alignment)
    ate = [
        float(np.linalg.norm(
            cam_center(T) - cam_center(gt_est(ts))))
        for ts, T in est_poses.values()
    ]
    report = dict(
        seq=args.seq_dir,
        frames=n,
        ok_frames=len(est_poses),
        ate_rmse_m=round(float(np.sqrt(np.mean(np.array(ate) ** 2))), 4),
        ate_max_m=round(float(np.max(ate)), 4),
        keyframes=kf_events,
        rpe_phases=phases,
        plane=dict(n=[round(float(x), 6) for x in n_est],
                   d=round(float(d_est), 6)),
    )
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
