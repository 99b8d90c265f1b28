"""Pose-only LM tests on synthetic correspondences with exact ground truth."""
import jax.numpy as jnp
import numpy as np

from ydorbslam_tpu.geometry import CameraIntrinsics, se3_exp
from ydorbslam_tpu.optim.pose import PoseObservations, optimize_pose
from ydorbslam_tpu.optim.residuals import project_point

CAM = CameraIntrinsics.create(500.0, 500.0, 320.0, 240.0, bf=50.0, width=640, height=480)


def make_problem(rng, n=256, noise=0.3, outlier_frac=0.0, stereo=True):
    pts = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(2, 8, n)], -1
    ).astype(np.float32)
    xi_true = np.array([0.1, -0.05, 0.2, 0.02, -0.03, 0.01], np.float32)
    T_true = np.asarray(se3_exp(jnp.asarray(xi_true)))
    obs = []
    for p in pts:
        _, uvr = project_point(CAM, jnp.asarray(T_true), jnp.asarray(p))
        obs.append(np.asarray(uvr))
    obs = np.stack(obs) + rng.normal(0, noise, (n, 3)).astype(np.float32)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    obs[out_idx, :2] += rng.uniform(20, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    has_stereo = np.full(n, stereo)
    return pts, obs, has_stereo, T_true, out_idx


def run(rng, **kw):
    pts, obs, has_stereo, T_true, out_idx = make_problem(rng, **kw)
    n = len(pts)
    po = PoseObservations(
        p_w=jnp.asarray(pts),
        obs_uvr=jnp.asarray(obs),
        inv_sigma2=jnp.ones(n),
        has_stereo=jnp.asarray(has_stereo),
        valid=jnp.ones(n, bool),
    )
    # Start from a perturbed pose.
    xi0 = np.array([0.05, 0.08, 0.1, 0.03, 0.02, -0.04], np.float32)
    T_init = np.asarray(se3_exp(jnp.asarray(xi0))) @ T_true
    T_est, inliers, n_in = optimize_pose(CAM, jnp.asarray(T_init), po)
    return np.asarray(T_est), np.asarray(inliers), int(n_in), T_true, out_idx


def test_recovers_pose_clean(rng):
    T_est, inliers, n_in, T_true, _ = run(rng, noise=0.1)
    assert n_in > 250
    err = np.abs(T_est - T_true)
    assert err[:3, 3].max() < 5e-3  # translation within 5mm
    assert err[:3, :3].max() < 2e-3


def test_rejects_outliers(rng):
    T_est, inliers, n_in, T_true, out_idx = run(rng, noise=0.3, outlier_frac=0.25)
    # All planted outliers classified out; pose still accurate.
    assert not inliers[out_idx].any()
    assert n_in > 150
    assert np.abs(T_est[:3, 3] - T_true[:3, 3]).max() < 2e-2


def test_mono_only(rng):
    T_est, inliers, n_in, T_true, _ = run(rng, noise=0.2, stereo=False)
    assert n_in > 230
    assert np.abs(T_est[:3, 3] - T_true[:3, 3]).max() < 2e-2


def test_invalid_rows_ignored(rng):
    pts, obs, has_stereo, T_true, _ = make_problem(rng, n=128, noise=0.1)
    # Fill half the capacity with garbage, masked out.
    pts2 = np.concatenate([pts, np.zeros_like(pts)])
    obs2 = np.concatenate([obs, np.full_like(obs, 1e6)])
    po = PoseObservations(
        p_w=jnp.asarray(pts2),
        obs_uvr=jnp.asarray(obs2),
        inv_sigma2=jnp.ones(256),
        has_stereo=jnp.asarray(np.concatenate([has_stereo, has_stereo])),
        valid=jnp.asarray(np.arange(256) < 128),
    )
    T_est, inliers, n_in = optimize_pose(CAM, jnp.asarray(T_true), po)
    assert not np.asarray(inliers)[128:].any()
    assert np.abs(np.asarray(T_est)[:3, 3] - T_true[:3, 3]).max() < 1e-2
