"""Pose-only bundle adjustment (motion-only LM on SE3).

Replaces ``Optimizer::optimizePose`` (src/optimizer.cpp:358-501, g2o
VertexSE3Expmap + OnlyPose edges): 4 episodes x 10 LM iterations; after
each episode observations are re-classified inlier/outlier by raw chi2
(5.991 mono / 7.815 stereo); each episode restarts from the INITIAL
pose with the refined inlier set (the reference resets the vertex
estimate per episode); the Huber kernel is dropped from episode index 3
onward (reference ``if(epi==2) setRobustKernel(0)`` takes effect the
following episode).

TPU formulation: all N observations live in fixed (N, 3) tensors with
validity masks; one LM iteration is residuals -> 6x6 normal equations
(two einsums) -> solve -> accept/reject, all inside a ``lax.fori_loop``;
episodes are an unrolled Python loop (static count).  There is no
dynamic edge removal: "setLevel(1)" becomes a weight mask.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.camera import CameraIntrinsics
from ..geometry.se3 import se3_exp
from .residuals import (
    batched_residual_and_jacobians,
    chi2_per_obs,
    huber_cost,
    huber_scale,
    observation_weights,
)

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class PoseObservations(NamedTuple):
    """Fixed-capacity observation set for one frame."""

    p_w: jax.Array  # (N,3) world landmark positions
    obs_uvr: jax.Array  # (N,3) (uL,vL,uR) with uR ignored when not has_stereo
    inv_sigma2: jax.Array  # (N,) octave information weight
    has_stereo: jax.Array  # (N,) bool
    valid: jax.Array  # (N,) bool


def _normal_equations(cam, T, obs: PoseObservations, active, use_huber, delta2):
    r, J, _, depth = batched_residual_and_jacobians(cam, T, obs.p_w, obs.obs_uvr)
    w = observation_weights(obs.has_stereo, obs.inv_sigma2)
    mask = (active & (depth > 1e-3)).astype(jnp.float32)[:, None]
    chi2 = chi2_per_obs(r, w)
    hub = jnp.where(use_huber, huber_scale(chi2, delta2), 1.0)
    wt = w * mask * hub[:, None]
    H = jnp.einsum("nci,nc,ncj->ij", J, wt, J)
    b = jnp.einsum("nci,nc,nc->i", J, wt, r)
    cost = jnp.sum(
        jnp.where(
            use_huber, huber_cost(chi2, delta2), chi2
        ) * mask[:, 0]
    )
    return H, b, cost


def _lm_refine(cam, T0, obs: PoseObservations, active, iters, use_huber, delta2):
    """LM loop with adaptive damping, fixed iteration count."""

    def body(_, state):
        T, lam, cost = state
        H, b, _ = _normal_equations(cam, T, obs, active, use_huber, delta2)
        # b = J^T W r with J = dr/dxi; Gauss-Newton: dx = -H^-1 b.
        damped = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
        dx = -jnp.linalg.solve(damped, b)
        T_new = se3_exp(dx) @ T
        _, _, cost_new = _normal_equations(cam, T_new, obs, active, use_huber, delta2)
        accept = cost_new < cost
        T = jnp.where(accept, T_new, T)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 4.0, 1e4))
        cost = jnp.where(accept, cost_new, cost)
        return T, lam, cost

    _, _, cost0 = _normal_equations(cam, T0, obs, active, use_huber, delta2)
    T, _, _ = jax.lax.fori_loop(0, iters, body, (T0, jnp.float32(1e-3), cost0))
    return T


@functools.partial(jax.jit, static_argnames=("episodes", "iters_per_episode"))
def optimize_pose(
    cam: CameraIntrinsics,
    T_cw_init: jax.Array,
    obs: PoseObservations,
    episodes: int = 4,
    iters_per_episode: int = 10,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """-> (T_cw (4,4), inlier mask (N,), n_inliers ()).

    Mirrors the reference's episode protocol exactly (see module
    docstring); the returned count is matches minus outliers
    (src/optimizer.cpp:499-501).
    """
    delta2 = jnp.where(obs.has_stereo, CHI2_STEREO, CHI2_MONO)
    inlier = obs.valid
    T = T_cw_init
    for epi in range(episodes):
        use_huber = jnp.asarray(epi < 3)
        T = _lm_refine(
            cam, T_cw_init, obs, inlier, iters_per_episode, use_huber, delta2
        )
        # Re-classify ALL valid observations by raw chi2 at the new pose.
        r, _, _, depth = batched_residual_and_jacobians(
            cam, T, obs.p_w, obs.obs_uvr
        )
        w = observation_weights(obs.has_stereo, obs.inv_sigma2)
        chi2 = chi2_per_obs(r, w)
        inlier = obs.valid & (chi2 <= delta2) & (depth > 1e-3)
    return T, inlier, jnp.sum(inlier)
