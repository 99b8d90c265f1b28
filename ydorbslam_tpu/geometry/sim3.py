"""Sim(3) operations for loop closing and essential-graph optimization.

Replaces g2o's ``Sim3`` type (thirdParty/g2o/g2o/types/sim3/sim3.h used by
reference src/loopClosing.cpp and src/optimizer.cpp:502-801).  A Sim3
element is stored as a 8-vector-free explicit triple ``(s, R, t)`` packed
into a single (...,4,4) matrix ``S = [[s*R, t], [0, 1]]`` — the action on
points is ``p' = s R p + t``.  The tangent vector is 7-dim:
``zeta = [rho(3), phi(3), sigma(1)]`` with scale ``s = exp(sigma)``.

For stereo/RGB-D the reference fixes scale to 1 in the Sim3 solver
(src/sim3Solver.cpp:134-206 with bFixScale=true) but still optimizes the
essential graph over Sim3; we keep the full 7-dof algebra and let callers
mask sigma.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .se3 import _EPS, hat, make_T, so3_exp, so3_log


def make_S(s: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Pack scale/rotation/translation into a (...,4,4) similarity matrix."""
    return make_T(s[..., None, None] * R, t)


def split_S(S: jax.Array):
    """(...,4,4) -> (s, R, t) with det(R)=+1."""
    sR = S[..., :3, :3]
    s = jnp.cbrt(jnp.linalg.det(sR))
    R = sR / jnp.maximum(s[..., None, None], _EPS)
    return s, R, S[..., :3, 3]


def inv_S(S: jax.Array) -> jax.Array:
    """Inverse similarity: (s,R,t)^-1 = (1/s, R^T, -1/s R^T t)."""
    s, R, t = split_S(S)
    s_inv = 1.0 / jnp.maximum(s, _EPS)
    Rt = jnp.swapaxes(R, -1, -2)
    return make_S(s_inv, Rt, -s_inv[..., None] * (Rt @ t[..., None])[..., 0])


def transform_points_S(S: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply similarity to (...,N,3) points."""
    sR, t = S[..., :3, :3], S[..., :3, 3]
    return pts @ jnp.swapaxes(sR, -1, -2) + t[..., None, :]


def _sim3_W(phi: jax.Array, sigma: jax.Array) -> jax.Array:
    """The Sim(3) 'W' matrix: t = W rho for zeta=[rho,phi,sigma].

    Closed form from Strasdat's thesis (eq. for Sim(3) exponential):
      W = A I + B K + C K^2, K = hat(phi)
    with scale- and angle-dependent coefficients, Taylor-guarded.
    """
    dtype = phi.dtype
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    s = jnp.exp(sigma)
    sig_small = jnp.abs(sigma) < 1e-5
    th_small = theta2 < 1e-8

    # A = (s - 1)/sigma    (sigma->0: 1 + sigma/2)
    A = jnp.where(sig_small, 1.0 + sigma * 0.5 + sigma * sigma / 6.0,
                  (s - 1.0) / jnp.where(sig_small, 1.0, sigma))

    # Generic-angle terms:
    #   a = s sin(theta), b = s cos(theta), c = theta^2 + sigma^2
    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c = theta2 + sigma * sigma
    c_safe = jnp.maximum(c, _EPS)
    # B = (a sigma + (1-b) theta) / (theta c)
    # C = (s-1)/sigma - ((b-1) sigma + a theta) / c,  all divided by theta^2
    B_gen = (a * sigma + (1.0 - b) * theta) / (jnp.maximum(theta, _EPS) * c_safe)
    C_gen = (A - ((b - 1.0) * sigma + a * theta) / c_safe) / jnp.maximum(theta2, _EPS)

    # theta->0 limits (expand sin/cos):
    #   B -> sigma-dependent: ((s - 1 - sigma*s ... )); use series:
    #   B0 = (1/2) * ( (sigma-1)s + 1 ) * 2 / sigma^2  -> for sigma->0: 1/2
    sig2 = sigma * sigma
    B0 = jnp.where(
        sig_small,
        0.5 + sigma / 6.0,
        ((sigma - 1.0) * s + 1.0) / jnp.where(sig_small, 1.0, sig2),
    )
    C0 = jnp.where(
        sig_small,
        1.0 / 6.0 + sigma / 24.0,
        (s * (0.5 * sig2 - sigma + 1.0) - 1.0) / jnp.where(sig_small, 1.0, sig2 * sigma),
    )
    B = jnp.where(th_small, B0, B_gen)
    C = jnp.where(th_small, C0, C_gen)

    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), K.shape)
    return A[..., None, None] * eye + B[..., None, None] * K + C[..., None, None] * K2


def sim3_exp(zeta: jax.Array) -> jax.Array:
    """exp: (...,7) [rho, phi, sigma] -> (...,4,4) similarity."""
    rho, phi, sigma = zeta[..., :3], zeta[..., 3:6], zeta[..., 6]
    R = so3_exp(phi)
    s = jnp.exp(sigma)
    W = _sim3_W(phi, sigma)
    t = (W @ rho[..., None])[..., 0]
    return make_S(s, R, t)


def sim3_log(S: jax.Array) -> jax.Array:
    """log: (...,4,4) similarity -> (...,7) [rho, phi, sigma]."""
    s, R, t = split_S(S)
    sigma = jnp.log(jnp.maximum(s, _EPS))
    phi = so3_log(R)
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def se3_to_sim3(T: jax.Array) -> jax.Array:
    """An SE(3) matrix is already a Sim(3) with s=1 (same 4x4 packing)."""
    return T


def sim3_to_se3(S: jax.Array) -> jax.Array:
    """Drop the scale: (s,R,t) -> (R, t/s).

    This is the reference's essential-graph recovery step
    (src/optimizer.cpp:630-661): after pose-graph optimization each
    corrected Sim3 is converted back to SE3 by dividing translation by
    scale.
    """
    s, R, t = split_S(S)
    return make_T(R, t / jnp.maximum(s[..., None], _EPS))
