"""Sim3 refinement from two-way reprojection (optimizeSim3 replacement).

Replaces ``Optimizer::optimizeSim3`` (src/optimizer.cpp:662-801): one
VertexSim3Expmap with paired forward/inverse projection edges, 5 LM
iterations, outlier removal, more iterations, inlier count.  Here the
Jacobians come from jax.jacfwd of the closed-form residual (exact, no
hand-derived sim3 chain rule) and the two phases are fixed-iteration
loops over masked residuals.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry.camera import CameraIntrinsics
from ..geometry.sim3 import inv_S, sim3_exp

CHI2 = 9.999  # reference threshold for sim3 edges (optimizer.cpp:751 ~ 10)


def _residuals(cam: CameraIntrinsics, S12, p1_cam, p2_cam, obs1, obs2):
    """(N,4): [err1(2): p2 through S12 vs obs1, err2(2): p1 through S21]."""
    S21 = inv_S(S12)

    def project(p):
        z = jnp.maximum(p[..., 2], 1e-6)
        return jnp.stack(
            [cam.fx * p[..., 0] / z + cam.cx, cam.fy * p[..., 1] / z + cam.cy],
            axis=-1,
        )

    p2_in_1 = p2_cam @ S12[:3, :3].T + S12[:3, 3]
    p1_in_2 = p1_cam @ S21[:3, :3].T + S21[:3, 3]
    e1 = project(p2_in_1) - obs1
    e2 = project(p1_in_2) - obs2
    return jnp.concatenate([e1, e2], axis=-1)


@functools.partial(jax.jit, static_argnames=("iters1", "iters2", "fix_scale"))
def optimize_sim3(
    cam: CameraIntrinsics,
    S12_init: jax.Array,
    p1_cam: jax.Array,
    p2_cam: jax.Array,
    obs1: jax.Array,
    obs2: jax.Array,
    inv_sigma2_1: jax.Array,
    inv_sigma2_2: jax.Array,
    valid: jax.Array,
    iters1: int = 5,
    iters2: int = 10,
    fix_scale: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """-> (S12 refined, inlier mask, n_inliers).

    Protocol of optimizer.cpp:742-801: optimize, drop chi2 > ~10
    outliers, optimize again, count inliers.
    """

    def chi2_parts(S, active):
        r = _residuals(cam, S, p1_cam, p2_cam, obs1, obs2)
        c1 = jnp.sum(r[:, :2] ** 2, axis=-1) * inv_sigma2_1
        c2 = jnp.sum(r[:, 2:] ** 2, axis=-1) * inv_sigma2_2
        return c1, c2

    def gn(S0, active, iters):
        def body(i, state):
            S, lam = state

            def res_of_eps(eps):
                eps = jnp.where(fix_scale, eps.at[6].set(0.0), eps)
                return _residuals(
                    cam, sim3_exp(eps) @ S, p1_cam, p2_cam, obs1, obs2
                )

            r0 = res_of_eps(jnp.zeros(7))
            J = jax.jacfwd(res_of_eps)(jnp.zeros(7))  # (N,4,7)
            w = jnp.concatenate(
                [
                    jnp.broadcast_to(inv_sigma2_1[:, None], (r0.shape[0], 2)),
                    jnp.broadcast_to(inv_sigma2_2[:, None], (r0.shape[0], 2)),
                ],
                axis=-1,
            ) * active[:, None]
            H = jnp.einsum("nci,nc,ncj->ij", J, w, J)
            b = jnp.einsum("nci,nc,nc->i", J, w, r0)
            if fix_scale:
                H = H.at[6, 6].add(1e6)
            dx = -jnp.linalg.solve(H + lam * jnp.eye(7) + 1e-8 * jnp.eye(7), b)
            dx = jnp.where(fix_scale, dx.at[6].set(0.0), dx)
            S_new = sim3_exp(dx) @ S
            cost_old = jnp.sum(w * r0 * r0)
            r_new = _residuals(cam, S_new, p1_cam, p2_cam, obs1, obs2)
            cost_new = jnp.sum(w * r_new * r_new)
            accept = cost_new < cost_old
            return (
                jnp.where(accept, S_new, S),
                jnp.where(accept, lam * 0.5, lam * 10.0),
            )

        S, _ = jax.lax.fori_loop(0, iters, body, (S0, jnp.float32(1e-4)))
        return S

    active = valid.astype(jnp.float32)
    S = gn(S12_init, active, iters1)
    c1, c2 = chi2_parts(S, active)
    inlier = valid & (c1 <= CHI2) & (c2 <= CHI2)
    S = gn(S, inlier.astype(jnp.float32), iters2)
    c1, c2 = chi2_parts(S, inlier)
    inlier = valid & (c1 <= CHI2) & (c2 <= CHI2)
    return S, inlier, jnp.sum(inlier)
