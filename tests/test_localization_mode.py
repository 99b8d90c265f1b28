"""Localization-only mode with visual-odometry fallback.

Reference behavior (src/system.cpp:80-93 + src/tracking.cpp:407-441):
activating localization mode pauses mapping (no new keyframes or map
points); tracking continues against the FROZEN map, and when too few
map points are visible, temporary visual-odometry points seeded from
depth keep the camera tracked until the map re-enters the frustum.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from synthetic import SyntheticRgbdSequence
from test_slam_system import small_cfg
from ydorbslam_tpu.slam.system import SlamSystem, Sensor
from ydorbslam_tpu.slam.tracking import TrackingState


def make_system():
    cfg = small_cfg()
    return SlamSystem(cfg, Sensor.RGBD, enable_loop_closing=False), cfg


def test_localization_mode_frozen_map_and_vo(rng):
    sys_, cfg = make_system()
    n = 15
    seq = SyntheticRgbdSequence(rng, n_frames=n, n_landmarks=500)

    # Phase 1: build the map over the whole trajectory.
    build_errs = []
    for i in range(n):
        t, g, d = seq.frame(i)
        if sys_.track_rgbd(t, g, d):
            T_est = np.asarray(sys_.tracker.T_cw)
            build_errs.append(
                np.linalg.norm(T_est[:3, 3] - seq.poses[i][:3, 3])
            )
    assert sys_.tracking_state() == TrackingState.OK
    n_kf = sys_.n_keyframes
    n_mp = int(jnp.sum(sys_.map.mp_valid))
    assert n_kf >= 2 and n_mp > 100

    # Phase 2: localization-only re-traverse — map must stay frozen.
    sys_.activate_localization_mode()
    ok_frames = 0
    errs = []
    for i in range(n):
        t, g, d = seq.frame(i)
        if sys_.track_rgbd(t + 100.0, g, d):
            ok_frames += 1
            T_est = np.asarray(sys_.tracker.T_cw)
            T_gt = seq.poses[i]
            errs.append(np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]))
    assert ok_frames >= n - 2, f"only {ok_frames}/{n} frames tracked in loc mode"
    assert sys_.n_keyframes == n_kf, "keyframes inserted in localization mode"
    assert int(jnp.sum(sys_.map.mp_valid)) == n_mp, (
        "map points created in localization mode"
    )
    # The frozen map carries whatever drift mapping accumulated; loc-mode
    # accuracy is judged RELATIVE to the build run on the same frames.
    assert float(np.median(errs)) < float(np.median(build_errs)) + 0.03, (
        f"loc-mode ATE {np.median(errs):.3f} m vs build "
        f"{np.median(build_errs):.3f} m"
    )
    # the full map is visible here, so this is map tracking, not VO
    assert not sys_.visual_odometry

    # Phase 3: the frozen map leaves the frustum (simulated by masking
    # out 97% of map points — the camera "walked out" of the mapped
    # area).  Tracking must SURVIVE on visual odometry instead of LOST.
    saved_valid = sys_.map.mp_valid
    keep = jnp.asarray(rng.random(sys_.map.M) < 0.03)
    sys_.map = sys_.map._replace(mp_valid=saved_valid & keep)
    vo_ok = 0
    for i in range(n - 10, n):
        t, g, d = seq.frame(i)
        if sys_.track_rgbd(t + 200.0, g, d):
            vo_ok += 1
    assert vo_ok >= 9, f"VO fallback only tracked {vo_ok}/10 frames"
    assert sys_.visual_odometry, "VO flag not raised with a scarce map"
    assert sys_.tracking_state() == TrackingState.OK
    assert sys_.n_keyframes == n_kf

    # Phase 4: map returns -> normal map tracking resumes.
    sys_.map = sys_.map._replace(mp_valid=saved_valid)
    for i in range(n - 4, n):
        t, g, d = seq.frame(i)
        sys_.track_rgbd(t + 300.0, g, d)
    assert not sys_.visual_odometry, "VO flag stuck after map returned"
    assert sys_.n_keyframes == n_kf

    # Phase 5: deactivate -> mapping resumes (keyframe insertion allowed
    # again; KF-decision gates may or may not fire immediately).
    sys_.deactivate_localization_mode()
    for i in range(n):
        t, g, d = seq.frame(i)
        sys_.track_rgbd(t + 400.0, g, d)
    assert sys_.n_keyframes >= n_kf


# Full-pipeline run: minutes on CPU; deselect via -m "not slow".
import pytest  # noqa: E402

pytestmark = pytest.mark.slow
