"""PnP RANSAC unit test + kidnapped-robot relocalization integration."""
import jax
import jax.numpy as jnp
import numpy as np

from synthetic import SyntheticRgbdSequence
from test_slam_system import small_cfg

from ydorbslam_tpu.geometry import CameraIntrinsics, se3_exp
from ydorbslam_tpu.optim.pnp import ransac_pnp
from ydorbslam_tpu.optim.residuals import project_point
from ydorbslam_tpu.slam.system import SlamSystem, Sensor
from ydorbslam_tpu.slam.tracking import TrackingState

CAM = CameraIntrinsics.create(500.0, 500.0, 320.0, 240.0, bf=50.0, width=640, height=480)


def test_pnp_ransac_with_outliers(rng):
    n = 200
    pts = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(2, 8, n)], -1
    ).astype(np.float32)
    T_true = np.asarray(se3_exp(jnp.asarray([0.2, -0.1, 0.3, 0.05, -0.02, 0.1])))
    uv = []
    for p in pts:
        _, uvr = project_point(CAM, jnp.asarray(T_true), jnp.asarray(p))
        uv.append(np.asarray(uvr)[:2])
    uv = np.stack(uv) + rng.normal(0, 0.5, (n, 2)).astype(np.float32)
    out_idx = rng.choice(n, 60, replace=False)
    uv[out_idx] += rng.uniform(30, 120, (60, 2)) * rng.choice([-1, 1], (60, 2))
    res = ransac_pnp(
        jax.random.PRNGKey(1), CAM,
        jnp.asarray(pts), jnp.asarray(uv.astype(np.float32)),
        jnp.ones(n), jnp.ones(n, bool),
        n_hypotheses=512, min_inliers=10,
    )
    assert bool(res.ok)
    assert int(res.n_inliers) >= 120
    inl = np.asarray(res.inliers)
    assert inl[out_idx].mean() < 0.05
    np.testing.assert_allclose(np.asarray(res.T_cw)[:3, 3], T_true[:3, 3], atol=0.05)


def test_kidnapped_relocalization(rng):
    seq = SyntheticRgbdSequence(rng, n_frames=10, n_landmarks=500)
    sys = SlamSystem(small_cfg(), Sensor.RGBD, enable_loop_closing=False)
    for i in range(6):
        t, g, d = seq.frame(i)
        assert sys.track_rgbd(t, g, d)
    # Kidnap: blackout frames -> LOST.
    blank = np.zeros((480, 640), np.float32)
    sys.track_rgbd(6 / 30.0, blank, blank)
    assert sys.tracking_state() == TrackingState.LOST
    # Show a previously mapped view again -> relocalize.
    t, g, d = seq.frame(2)
    ok = sys.track_rgbd(7 / 30.0, g, d)
    assert ok, "relocalization failed"
    assert sys.tracking_state() == TrackingState.OK
    # Pose must be near the frame-2 ground truth.
    T = np.asarray(sys.tracker.T_cw)
    c_est = -T[:3, :3].T @ T[:3, 3]
    T_gt = seq.poses[2]
    c_gt = -T_gt[:3, :3].T @ T_gt[:3, 3]
    assert np.linalg.norm(c_est - c_gt) < 0.05


# Full-pipeline run: minutes on CPU; deselect via -m "not slow".
import pytest  # noqa: E402

pytestmark = pytest.mark.slow
