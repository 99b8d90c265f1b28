"""Pipelined (device-resident) tracking must match the synchronous path."""
import numpy as np

from synthetic import SyntheticRgbdSequence
from test_slam_system import centers, small_cfg

from ydorbslam_tpu.io import ate_rmse
from ydorbslam_tpu.slam.system import SlamSystem, Sensor
from ydorbslam_tpu.slam.tracking import TrackingState


def run_pipelined(rng, n_frames=20):
    seq = SyntheticRgbdSequence(rng, n_frames=n_frames, n_landmarks=500)
    sys = SlamSystem(small_cfg(), Sensor.RGBD, enable_loop_closing=False)
    sys.enable_pipelined(lag=3)
    for i in range(len(seq)):
        t, g, d = seq.frame(i)
        sys.track_rgbd_pipelined(t, g, d)
    sys.shutdown()
    return sys, seq


def test_pipelined_accuracy(rng, tmp_path):
    sys, seq = run_pipelined(rng)
    assert sys.n_keyframes >= 2
    lost = [r.lost for r in sys.records]
    assert sum(lost) <= 1  # the init frame may predate the map
    traj = str(tmp_path / "t.txt")
    sys.save_trajectory_tum(traj)
    from ydorbslam_tpu.io import read_tum_trajectory

    _, pos, _ = read_tum_trajectory(traj)
    gt = centers(seq.poses)
    err = ate_rmse(pos, gt[-len(pos):])
    assert err < 0.05, f"pipelined ATE {err}"
    assert sys.tracking_state() == TrackingState.OK


def test_pipelined_recovers_from_blackout(rng):
    seq = SyntheticRgbdSequence(rng, n_frames=10, n_landmarks=500)
    sys = SlamSystem(small_cfg(), Sensor.RGBD, enable_loop_closing=False)
    sys.enable_pipelined(lag=2)
    for i in range(6):
        t, g, d = seq.frame(i)
        sys.track_rgbd_pipelined(t, g, d)
    blank = np.zeros((480, 640), np.float32)
    sys.track_rgbd_pipelined(0.5, blank, blank)
    for i in range(4):
        t, g, d = seq.frame(min(6 + i, 9))
        sys.track_rgbd_pipelined(t + 1.0, g, d)
    sys.shutdown()
    # Must have recovered to OK by the end.
    assert sys.tracking_state() == TrackingState.OK


# Full-pipeline run: minutes on CPU; deselect via -m "not slow".
import pytest  # noqa: E402

pytestmark = pytest.mark.slow
