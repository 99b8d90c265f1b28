"""Full-system stereo test: synthetic rectified stereo pair sequence.

Exercises the trackStereo path end-to-end (dual extraction, row-band
stereo matching with SAD refinement, depth-seeded mapping) — the
KITTI-mode configuration (BASELINE.md config 4).
"""
import numpy as np

from synthetic import SyntheticRgbdSequence, project_np, render_dots
from test_slam_system import centers, small_cfg

from ydorbslam_tpu.io import ate_rmse
from ydorbslam_tpu.slam.system import SlamSystem, Sensor


class SyntheticStereoSequence:
    """Left/right rectified pair renders of the RGB-D dot world."""

    def __init__(self, rng, n_frames=12, n_landmarks=500, baseline=0.1):
        self.inner = SyntheticRgbdSequence(rng, n_frames, n_landmarks)
        self.baseline = baseline

    def __len__(self):
        return len(self.inner)

    def frame(self, i):
        seq = self.inner
        T = seq.poses[i]
        uv_l, z = project_np(seq.K, T, seq.landmarks)
        # right camera: shifted +baseline along x in the camera frame
        T_r = T.copy()
        T_r[0, 3] -= self.baseline  # x_cam_right = x_cam_left - b
        uv_r, z_r = project_np(seq.K, T_r, seq.landmarks)
        left = render_dots(uv_l, z, seq.width, seq.height)
        right = render_dots(uv_r, z_r, seq.width, seq.height)
        return i / 30.0, left, right


def test_stereo_system_tracks(rng, tmp_path):
    seq = SyntheticStereoSequence(rng, n_frames=12, n_landmarks=500)
    cfg = small_cfg()  # bf = 50 -> baseline 0.1m at fx 500 (matches)
    sys = SlamSystem(cfg, Sensor.STEREO, enable_loop_closing=False)
    n_ok = 0
    for i in range(len(seq)):
        t, left, right = seq.frame(i)
        n_ok += bool(sys.track_stereo(t, left, right))
    assert n_ok >= len(seq) - 1, f"only {n_ok} frames tracked"
    assert sys.n_keyframes >= 2
    traj = str(tmp_path / "t.txt")
    sys.save_trajectory_tum(traj)
    from ydorbslam_tpu.io import read_tum_trajectory

    _, pos, _ = read_tum_trajectory(traj)
    gt = centers(seq.inner.poses)
    err = ate_rmse(pos, gt[-len(pos):])
    assert err < 0.08, f"stereo ATE {err}"


def test_stereo_pipelined(rng, tmp_path):
    seq = SyntheticStereoSequence(rng, n_frames=14, n_landmarks=500)
    sys = SlamSystem(small_cfg(), Sensor.STEREO, enable_loop_closing=False)
    sys.enable_pipelined(lag=3)
    for i in range(len(seq)):
        t, left, right = seq.frame(i)
        sys.track_stereo_pipelined(t, left, right)
    sys.shutdown()
    assert sys.n_keyframes >= 2
    lost = sum(r.lost for r in sys.records)
    assert lost <= 2
    traj = str(tmp_path / "t.txt")
    sys.save_trajectory_tum(traj)
    from ydorbslam_tpu.io import read_tum_trajectory

    _, pos, _ = read_tum_trajectory(traj)
    gt = centers(seq.inner.poses)
    err = ate_rmse(pos, gt[-len(pos):])
    assert err < 0.08, f"pipelined stereo ATE {err}"


# Full-pipeline run: minutes on CPU; deselect via -m "not slow".
import pytest  # noqa: E402

pytestmark = pytest.mark.slow
