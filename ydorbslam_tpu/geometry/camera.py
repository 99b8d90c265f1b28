"""Pinhole camera model with radial-tangential distortion.

Replaces the reference's OpenCV camera machinery: ``cv::undistortPoints``
(src/frame.cpp:193-211), the static intrinsics shared by all frames
(src/frame.hpp:106-113), and the project/unproject helpers used
throughout tracking and mapping (src/frame.cpp:295-326, :473-484).

All ops are batched over points and shaped for the VPU: (N,2)/(N,3)
arrays in, (N,...) arrays out, no Python loops.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CameraIntrinsics(NamedTuple):
    """Static pinhole + distortion parameters (a pytree of scalars).

    ``bf`` is the stereo baseline times fx (reference ``Camera.bf``), used
    to convert depth to virtual right-image x: ``uR = uL - bf/z``
    (src/frame.cpp:212-222).
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array
    k2: jax.Array
    p1: jax.Array
    p2: jax.Array
    k3: jax.Array
    bf: jax.Array
    width: int
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0, bf=0.0,
               width=640, height=480) -> "CameraIntrinsics":
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return CameraIntrinsics(
            f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2), f(k3), f(bf),
            int(width), int(height),
        )

    @property
    def baseline(self):
        return self.bf / self.fx


def distort_normalized(cam: CameraIntrinsics, xn: jax.Array) -> jax.Array:
    """Apply radtan distortion to normalized coords (...,2) -> (...,2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xy2 = 2.0 * x * y
    xd = x * radial + cam.p1 * xy2 + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p2 * xy2 + cam.p1 * (r2 + 2.0 * y * y)
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: CameraIntrinsics, uv: jax.Array, iters: int = 8) -> jax.Array:
    """Undistort pixel coords by fixed-point iteration.

    Equivalent to ``cv::undistortPoints`` as used by the reference to
    undistort all keypoints after extraction (src/frame.cpp:193-211), but
    vectorized over all N keypoints at once with a fixed iteration count
    (static control flow for XLA; OpenCV uses 5 iterations internally).
    Returns pixel coordinates in the same (undistorted) K frame.
    """
    xn = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )

    def body(_, x):
        d = distort_normalized(cam, x) - x  # distortion delta at current estimate
        return xn - d

    x = jax.lax.fori_loop(0, iters, body, xn)
    return jnp.stack(
        [x[..., 0] * cam.fx + cam.cx, x[..., 1] * cam.fy + cam.cy], axis=-1
    )


def project(cam: CameraIntrinsics, pts_cam: jax.Array) -> jax.Array:
    """Project camera-frame 3D points (...,3) to pixels (...,2) (no distortion).

    The reference always matches/optimizes in undistorted pixel space, so
    projection is pure pinhole (e.g. src/frame.cpp:295-326,
    src/optimizer.cpp edge cam_project).
    """
    z = jnp.maximum(pts_cam[..., 2], 1e-6)
    return jnp.stack(
        [
            cam.fx * pts_cam[..., 0] / z + cam.cx,
            cam.fy * pts_cam[..., 1] / z + cam.cy,
        ],
        axis=-1,
    )


def project_stereo(cam: CameraIntrinsics, pts_cam: jax.Array) -> jax.Array:
    """Project to (uL, vL, uR): the stereo observation triple.

    ``uR = uL - bf/z`` — the reference's stereo edge measurement
    (g2o EdgeStereoSE3ProjectXYZ as built in src/optimizer.cpp:84-110).
    """
    uv = project(cam, pts_cam)
    z = jnp.maximum(pts_cam[..., 2], 1e-6)
    ur = uv[..., 0] - cam.bf / z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def backproject(cam: CameraIntrinsics, uv: jax.Array, depth: jax.Array) -> jax.Array:
    """Pixels (...,2) + depth (...) -> camera-frame 3D (...,3).

    Reference ``Frame::inverseProject`` (src/frame.cpp:473-484).
    """
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def in_image(cam: CameraIntrinsics, uv: jax.Array, border: float = 0.0) -> jax.Array:
    """Bounds mask for pixel coords (...,2) -> (...,) bool."""
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= border)
        & (u < cam.width - border)
        & (v >= border)
        & (v < cam.height - border)
    )
