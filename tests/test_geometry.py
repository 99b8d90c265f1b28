"""Unit tests for SE3/Sim3/camera geometry (the L1 layer).

The reference has no unit tests at all (SURVEY.md §4); these pin down
the math that replaces g2o's SE3Quat/Sim3 and OpenCV's undistortPoints.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ydorbslam_tpu.geometry import (
    CameraIntrinsics,
    backproject,
    distort_normalized,
    inv_S,
    inv_T,
    make_S,
    make_T,
    project,
    project_stereo,
    quat_to_rot,
    rot_to_quat,
    se3_exp,
    se3_log,
    sim3_exp,
    sim3_log,
    sim3_to_se3,
    so3_exp,
    so3_log,
    transform_points,
    transform_points_S,
    undistort_points,
)


def random_twists(rng, n, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 6)) * scale, dtype=jnp.float32)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        phi = jnp.asarray(rng.normal(size=(64, 3)), dtype=jnp.float32)
        R = so3_exp(phi)
        # Valid rotations.
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
        phi2 = so3_log(R)
        np.testing.assert_allclose(so3_exp(phi2), R, atol=1e-5)

    def test_log_near_identity(self):
        phi = jnp.array([[1e-6, -2e-6, 3e-7]], dtype=jnp.float32)
        np.testing.assert_allclose(so3_log(so3_exp(phi)), phi, atol=1e-6)

    def test_log_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        phi = jnp.asarray((np.pi - 1e-4) * axis, dtype=jnp.float32)[None]
        R = so3_exp(phi)
        phi2 = so3_log(R)
        np.testing.assert_allclose(so3_exp(phi2), R, atol=2e-4)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = random_twists(rng, 64, scale=0.8)
        # Keep |phi| < pi so the twist is the canonical representative.
        norm = np.linalg.norm(np.asarray(xi[:, 3:]), axis=-1, keepdims=True)
        xi = xi.at[:, 3:].multiply(jnp.asarray(np.minimum(1.0, 2.8 / norm)))
        T = se3_exp(xi)
        np.testing.assert_allclose(se3_log(T), xi, atol=1e-4, rtol=1e-4)
        # For arbitrary rotations, exp(log(T)) must still reproduce T.
        xi_big = random_twists(rng, 64, scale=2.0)
        T_big = se3_exp(xi_big)
        np.testing.assert_allclose(se3_exp(se3_log(T_big)), T_big, atol=2e-4)

    def test_inverse(self, rng):
        xi = random_twists(rng, 8)
        T = se3_exp(xi)
        eye = T @ inv_T(T)
        np.testing.assert_allclose(eye, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)

    def test_transform_points(self, rng):
        T = se3_exp(random_twists(rng, 1))[0]
        pts = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
        out = transform_points(T, pts)
        expect = (np.asarray(T[:3, :3]) @ np.asarray(pts).T).T + np.asarray(T[:3, 3])
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_quat_roundtrip(self, rng):
        xi = random_twists(rng, 32)
        R = se3_exp(xi)[:, :3, :3]
        q = rot_to_quat(R)
        np.testing.assert_allclose(quat_to_rot(q), R, atol=1e-5)
        # unit norm, canonical sign
        np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
        assert np.all(np.asarray(q[:, 3]) >= 0)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        zeta = jnp.asarray(rng.normal(size=(32, 7)) * 0.8, dtype=jnp.float32)
        S = sim3_exp(zeta)
        np.testing.assert_allclose(sim3_log(S), zeta, atol=2e-3, rtol=2e-3)

    def test_zero_is_identity(self):
        S = sim3_exp(jnp.zeros((1, 7), dtype=jnp.float32))
        np.testing.assert_allclose(S[0], np.eye(4), atol=1e-6)

    def test_inverse_and_action(self, rng):
        s = jnp.asarray([1.7], dtype=jnp.float32)
        R = so3_exp(jnp.asarray(rng.normal(size=(1, 3)), dtype=jnp.float32))
        t = jnp.asarray(rng.normal(size=(1, 3)), dtype=jnp.float32)
        S = make_S(s, R, t)
        eye = S @ inv_S(S)
        np.testing.assert_allclose(eye[0], np.eye(4), atol=1e-5)
        pts = jnp.asarray(rng.normal(size=(1, 5, 3)), dtype=jnp.float32)
        out = transform_points_S(S, pts)
        expect = 1.7 * (np.asarray(pts[0]) @ np.asarray(R[0]).T) + np.asarray(t[0])
        np.testing.assert_allclose(out[0], expect, atol=1e-5)

    def test_sim3_to_se3(self, rng):
        s = jnp.asarray([2.0], dtype=jnp.float32)
        R = so3_exp(jnp.asarray(rng.normal(size=(1, 3)), dtype=jnp.float32))
        t = jnp.asarray([[2.0, 4.0, -6.0]], dtype=jnp.float32)
        T = sim3_to_se3(make_S(s, R, t))
        np.testing.assert_allclose(T[0, :3, 3], [1.0, 2.0, -3.0], atol=1e-5)
        np.testing.assert_allclose(T[0, :3, :3], R[0], atol=1e-5)


class TestCamera:
    def cam(self):
        return CameraIntrinsics.create(
            517.3, 516.5, 318.6, 255.3,
            k1=0.26, k2=-0.95, p1=-0.0054, p2=0.0026, k3=1.16,
            bf=40.0, width=640, height=480,
        )

    def test_project_backproject(self, rng):
        cam = self.cam()
        uv = jnp.asarray(rng.uniform(50, 400, size=(100, 2)), dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(0.5, 5.0, size=(100,)), dtype=jnp.float32)
        pts = backproject(cam, uv, depth)
        uv2 = project(cam, pts)
        np.testing.assert_allclose(uv2, uv, atol=1e-3)

    def test_undistort_inverts_distort(self, rng):
        cam = self.cam()
        # True (undistorted) pixels in the central region where TUM1-level
        # distortion is invertible.
        uv_true = jnp.asarray(rng.uniform(200, 440, size=(64, 2)), dtype=jnp.float32)
        xn = jnp.stack(
            [(uv_true[:, 0] - cam.cx) / cam.fx, (uv_true[:, 1] - cam.cy) / cam.fy],
            axis=-1,
        )
        xd = distort_normalized(cam, xn)
        uv_dist = jnp.stack(
            [xd[:, 0] * cam.fx + cam.cx, xd[:, 1] * cam.fy + cam.cy], axis=-1
        )
        uv_rec = undistort_points(cam, uv_dist, iters=20)
        np.testing.assert_allclose(uv_rec, uv_true, atol=0.05)

    def test_stereo_projection(self):
        cam = self.cam()
        pts = jnp.asarray([[0.0, 0.0, 2.0]], dtype=jnp.float32)
        uvr = project_stereo(cam, pts)
        assert abs(float(uvr[0, 2]) - (float(uvr[0, 0]) - 40.0 / 2.0)) < 1e-4

    def test_jit_compatible(self):
        cam = self.cam()
        f = jax.jit(lambda uv, d: project(cam, backproject(cam, uv, d)))
        uv = jnp.ones((8, 2)) * 300.0
        np.testing.assert_allclose(f(uv, jnp.ones(8)), uv, atol=1e-3)
