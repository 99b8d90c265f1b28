"""Schur-complement bundle adjustment tests on synthetic problems."""
import jax
import jax.numpy as jnp
import numpy as np

from ydorbslam_tpu.geometry import CameraIntrinsics, se3_exp
from ydorbslam_tpu.optim.residuals import project_point
from ydorbslam_tpu.optim.schur import BAProblem, bundle_adjust

CAM = CameraIntrinsics.create(500.0, 500.0, 320.0, 240.0, bf=50.0, width=640, height=480)


def make_ba_problem(rng, C=6, P=120, O=8, noise=0.2, perturb=0.02,
                    outlier_frac=0.0):
    # Ground-truth cameras along a small arc; points in front.
    T_true = []
    for i in range(C):
        xi = np.array([0.2 * i, 0.01 * i, 0.05 * i, 0.0, 0.03 * i, 0.0], np.float32)
        T_true.append(np.asarray(se3_exp(jnp.asarray(xi))))
    T_true = np.stack(T_true)
    pts = np.stack(
        [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P), rng.uniform(3, 9, P)], -1
    ).astype(np.float32)

    obs_cam = np.full((P, O), -1, np.int32)
    obs_uvr = np.zeros((P, O, 3), np.float32)
    obs_valid = np.zeros((P, O), bool)
    for p in range(P):
        cams = rng.choice(C, size=min(O, C), replace=False)
        for k, c in enumerate(cams):
            _, uvr = project_point(CAM, jnp.asarray(T_true[c]), jnp.asarray(pts[p]))
            uvr = np.asarray(uvr) + rng.normal(0, noise, 3)
            obs_cam[p, k] = c
            obs_uvr[p, k] = uvr
            obs_valid[p, k] = True
    n_out = int(outlier_frac * P)
    out_pts = rng.choice(P, n_out, replace=False)
    for p in out_pts:
        obs_uvr[p, 0, :2] += rng.uniform(30, 60, 2)

    # Perturb initial estimates (except camera 0 = gauge).
    T_init = T_true.copy()
    for i in range(1, C):
        xi = rng.normal(0, perturb, 6).astype(np.float32)
        T_init[i] = np.asarray(se3_exp(jnp.asarray(xi))) @ T_true[i]
    pts_init = pts + rng.normal(0, 5 * perturb, pts.shape).astype(np.float32)

    cam_fixed = np.zeros(C, bool)
    cam_fixed[0] = True
    prob = BAProblem(
        T_cw=jnp.asarray(T_init),
        cam_fixed=jnp.asarray(cam_fixed),
        cam_valid=jnp.ones(C, bool),
        p_w=jnp.asarray(pts_init),
        pt_valid=jnp.ones(P, bool),
        obs_cam=jnp.asarray(obs_cam),
        obs_uvr=jnp.asarray(obs_uvr),
        obs_inv_sigma2=jnp.ones((P, O)),
        obs_stereo=jnp.ones((P, O), bool),
        obs_valid=jnp.asarray(obs_valid),
    )
    return prob, T_true, pts, out_pts


def test_ba_converges(rng):
    prob, T_true, pts_true, _ = make_ba_problem(rng, noise=0.1)
    T, p, outlier = bundle_adjust(CAM, prob, iters1=5, iters2=10)
    T, p = np.asarray(T), np.asarray(p)
    # Camera 0 fixed -> absolute comparison is valid.
    assert np.abs(T[:, :3, 3] - T_true[:, :3, 3]).max() < 5e-3
    assert np.abs(T[:, :3, :3] - T_true[:, :3, :3]).max() < 2e-3
    med_pt_err = np.median(np.linalg.norm(p - pts_true, axis=-1))
    assert med_pt_err < 2e-2
    assert np.asarray(outlier).sum() < 5


def test_ba_flags_outliers(rng):
    prob, T_true, pts_true, out_pts = make_ba_problem(
        rng, noise=0.2, outlier_frac=0.15
    )
    T, p, outlier = bundle_adjust(CAM, prob, iters1=5, iters2=10)
    outlier = np.asarray(outlier)
    # The corrupted first-observation of each planted point is flagged.
    flagged = outlier[out_pts, 0]
    assert flagged.mean() > 0.9
    assert np.abs(np.asarray(T)[:, :3, 3] - T_true[:, :3, 3]).max() < 2e-2


def test_ba_respects_fixed_cameras(rng):
    prob, T_true, _, _ = make_ba_problem(rng, C=5)
    fixed = np.zeros(5, bool)
    fixed[:2] = True
    prob = prob._replace(cam_fixed=jnp.asarray(fixed))
    T, _, _ = bundle_adjust(CAM, prob, iters1=3, iters2=5)
    np.testing.assert_allclose(np.asarray(T)[:2], np.asarray(prob.T_cw)[:2])


def test_ba_global_mode(rng):
    # iters1=0: single-phase global BA (optimizer.cpp:353-357).
    prob, T_true, pts_true, _ = make_ba_problem(rng, noise=0.1)
    T, p, _ = bundle_adjust(CAM, prob, iters1=0, iters2=10)
    assert np.abs(np.asarray(T)[:, :3, 3] - T_true[:, :3, 3]).max() < 1e-2
