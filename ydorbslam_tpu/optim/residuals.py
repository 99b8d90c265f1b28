"""Reprojection residuals and analytic Jacobians for SLAM optimization.

Replaces g2o's edge types as vmapped closed-form functions
(EdgeSE3ProjectXYZ[OnlyPose], EdgeStereoSE3ProjectXYZ[OnlyPose],
thirdParty/g2o/g2o/types/sba, used throughout src/optimizer.cpp).

Conventions:
  * Pose increments are left-multiplied twists: T <- exp(xi) @ T with
    xi = [rho, phi] (se3.py).  The Jacobian of the camera-frame point is
    then d(pc)/d rho = I, d(pc)/d phi = -[pc]x.
  * A stereo observation is (uL, vL, uR) with uR = uL - bf/z
    (src/optimizer.cpp stereo edges); mono observations are (uL, vL).
    Stereo rows are selected by ``has_stereo`` masks so both kinds live
    in one (N, 3) residual tensor with a weight of 0 on the third
    component for mono — keeping every array static-shaped.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.camera import CameraIntrinsics
from ..geometry.se3 import hat


def project_point(cam: CameraIntrinsics, T_cw: jax.Array, p_w: jax.Array):
    """World point -> (pc (3,), uvr (3,)) under one pose."""
    pc = T_cw[:3, :3] @ p_w + T_cw[:3, 3]
    z = jnp.maximum(pc[2], 1e-6)
    u = cam.fx * pc[0] / z + cam.cx
    v = cam.fy * pc[1] / z + cam.cy
    ur = u - cam.bf / z
    return pc, jnp.stack([u, v, ur])


def residual_and_jacobians(
    cam: CameraIntrinsics,
    T_cw: jax.Array,
    p_w: jax.Array,
    obs_uvr: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-observation residual + Jacobians.

    Returns (r (3,), J_pose (3,6), J_point (3,3), z).
    r = obs - predicted, in (uL, vL, uR).
    """
    pc, pred = project_point(cam, T_cw, p_w)
    r = obs_uvr - pred
    x, y = pc[0], pc[1]
    z = jnp.maximum(pc[2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    # d(uvr)/d(pc)
    du = jnp.stack([cam.fx * iz, jnp.zeros(()), -cam.fx * x * iz2])
    dv = jnp.stack([jnp.zeros(()), cam.fy * iz, -cam.fy * y * iz2])
    dur = du + jnp.stack([jnp.zeros(()), jnp.zeros(()), cam.bf * iz2])
    d_uvr_d_pc = jnp.stack([du, dv, dur])  # (3,3)
    # d(pc)/d(xi): [I | -hat(pc)] for left-multiplied increments.
    d_pc_d_xi = jnp.concatenate([jnp.eye(3, dtype=pc.dtype), -hat(pc)], axis=-1)
    # residual = obs - pred  =>  J = -d pred/d param.
    J_pose = -(d_uvr_d_pc @ d_pc_d_xi)  # (3,6)
    J_point = -(d_uvr_d_pc @ T_cw[:3, :3])  # (3,3)
    return r, J_pose, J_point, pc[2]


batched_residual_and_jacobians = jax.vmap(
    residual_and_jacobians, in_axes=(None, None, 0, 0)
)


def observation_weights(
    has_stereo: jax.Array, inv_sigma2: jax.Array
) -> jax.Array:
    """(N,3) per-component information weights: mono rows zero the uR row."""
    w = jnp.broadcast_to(inv_sigma2[:, None], (inv_sigma2.shape[0], 3))
    return jnp.where(
        jnp.stack(
            [jnp.ones_like(has_stereo), jnp.ones_like(has_stereo), has_stereo],
            axis=-1,
        ),
        w,
        0.0,
    )


def chi2_per_obs(r: jax.Array, w: jax.Array) -> jax.Array:
    """(N,) chi-squared = r^T Omega r (raw, no robust kernel — matching
    g2o edge->chi2() used for inlier classification)."""
    return jnp.sum(r * r * w, axis=-1)


def huber_scale(chi2: jax.Array, delta2: jax.Array) -> jax.Array:
    """IRLS weight implementing g2o's Huber kernel: 1 inside delta^2,
    delta/sqrt(chi2) outside."""
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / safe))


def huber_cost(chi2: jax.Array, delta2: jax.Array) -> jax.Array:
    """Robustified cost rho(chi2) (for LM accept/reject decisions)."""
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    d = jnp.sqrt(delta2)
    return jnp.where(chi2 <= delta2, chi2, 2.0 * d * s - delta2)
