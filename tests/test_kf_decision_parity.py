"""Keyframe-decision parity between the synchronous and device paths
(tracking.cpp:630-636, 740-796).

Round-2 residue: the pipelined path used a fixed ref_ratio of 0.75 and
lacked the young-map relaxations; the synchronous Tracker lacked the
post-relocalization 50-inlier gate.  Both now share one parameter
source (system.kf_decision_params) / one since-reloc mechanism.
"""
import numpy as np
import jax.numpy as jnp

from ydorbslam_tpu.slam.system import kf_decision_params


def test_kf_decision_params_reference_table():
    # tracking.cpp:749-760: minObs relaxes to 2 until >2 KFs; the
    # reference ratio drops to 0.4 below 2 KFs.
    assert kf_decision_params(0, 0.75) == (2, 0.4)
    assert kf_decision_params(1, 0.75) == (2, 0.4)
    assert kf_decision_params(2, 0.75) == (2, 0.75)
    assert kf_decision_params(3, 0.75) == (3, 0.75)
    assert kf_decision_params(80, 0.9) == (3, 0.9)


def test_device_ref_thresh_uses_young_map_ratio():
    """_refresh_trkset must bake the SAME ratio into the device-side
    threshold that _need_new_keyframe applies on the host."""
    from synthetic import SyntheticRgbdSequence
    from test_slam_system import small_cfg
    from ydorbslam_tpu.slam.system import SlamSystem, Sensor

    rng = np.random.default_rng(1)
    seq = SyntheticRgbdSequence(rng, n_frames=8, n_landmarks=400)
    s = SlamSystem(small_cfg(), Sensor.RGBD, enable_loop_closing=False)
    s.enable_pipelined(lag=2)
    for i in range(8):
        t, g, d = seq.frame(i)
        s.track_rgbd_pipelined(t, g, d)
    s.flush_pipeline()
    assert s.n_keyframes >= 2

    from ydorbslam_tpu.slam.system import _count_ref_tracked

    for forced_kfs in (1, 2, 5):
        real = s.n_keyframes
        s.n_keyframes = forced_kfs
        s._refresh_trkset()
        min_obs, ratio = kf_decision_params(
            forced_kfs, s.cfg.tracking.kf_ref_ratio
        )
        expect = float(_count_ref_tracked(s.map, s.ref_kf, min_obs)) * ratio
        got = float(np.asarray(s._trkset.ref_thresh))
        assert abs(got - expect) < 1e-4, (forced_kfs, got, expect)
        s.n_keyframes = real


def test_sync_tracker_post_reloc_counter():
    """frames_since_reloc resets on reloc success and advances per
    frame — the input to the 50-inlier local-map gate
    (tracking.cpp:630-636)."""
    from test_slam_system import small_cfg
    from ydorbslam_tpu.slam.tracking import Tracker, TrackingState

    tr = Tracker(small_cfg())
    assert tr.frames_since_reloc > 1000  # no reloc yet
    tr.state = TrackingState.LOST
    def _fake_reloc(tracker, ts, feats):
        tracker.new_T = tracker.T_cw  # the real hook sets the recovered pose
        return True
    tr.reloc_hook = _fake_reloc
    # LOST frame with a succeeding reloc hook: counter must reset.
    blank = np.zeros((480, 640), np.float32)
    tr.track_rgbd(0.0, blank, blank)
    assert tr.frames_since_reloc == 0


# Full-pipeline run: minutes on CPU; deselect via -m "not slow".
import pytest  # noqa: E402

pytestmark = pytest.mark.slow
