"""Closed-form Sim3 estimation (Horn 1987) with vmapped RANSAC.

Replaces ``Sim3Solver`` (src/sim3Solver.cpp): the reference runs a
sequential RANSAC loop drawing 3-point minimal sets and solving Horn's
absolute-orientation problem via the max eigenvector of the 4x4
quaternion matrix (sim3Solver.cpp:134-206), with a two-way projection
inlier check (:207-224).  Here the WHOLE hypothesis budget is one
vmapped batch: B minimal sets -> B closed-form Sim3s -> B x N two-way
reprojection checks -> argmax inliers.  Same acceptance thresholds,
fixed shapes, one jitted program instead of 300 sequential iterations.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.camera import CameraIntrinsics
from ..geometry.sim3 import inv_S, make_S


def horn_sim3(
    p1: jax.Array, p2: jax.Array, fix_scale: bool = True
) -> jax.Array:
    """Closed-form similarity aligning point sets: p1 ~= S @ p2.

    p1, p2: (N, 3).  Returns (4,4) similarity S_12 (maps frame-2 points
    into frame 1).  Scale fixed to 1 for stereo/RGB-D
    (sim3Solver.cpp bFixScale, loopClosing.cpp:132).
    """
    c1 = p1.mean(axis=0)
    c2 = p2.mean(axis=0)
    q1 = p1 - c1
    q2 = p2 - c2
    # M = sum q1_i q2_i^T ; maximize trace(R M^T) via quaternion eigvec.
    M = q1.T @ q2  # (3,3)
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[:, -1]  # max eigenvalue eigenvector, (w,x,y,z)
    # The eigenvector encodes the 2->1 rotation conjugate; negate the
    # vector part to rotate frame-2 points INTO frame 1.
    w, x, y, z = q[0], -q[1], -q[2], -q[3]
    R = jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    if fix_scale:
        s = jnp.float32(1.0)
    else:
        # Horn's symmetric scale: sqrt(sum|q1|^2 / sum|q2|^2) after rotation.
        s = jnp.sqrt(
            jnp.sum(q1 * q1) / jnp.maximum(jnp.sum(q2 * q2), 1e-9)
        )
    t = c1 - s * (R @ c2)
    return make_S(s, R, t)


class Sim3RansacResult(NamedTuple):
    S_12: jax.Array  # (4,4) best similarity
    inliers: jax.Array  # (N,) bool
    n_inliers: jax.Array  # scalar int
    ok: jax.Array  # scalar bool


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "min_inliers", "fix_scale"))
def ransac_sim3(
    key: jax.Array,
    cam: CameraIntrinsics,
    p1_cam: jax.Array,  # (N,3) matched points in camera-1 frame
    p2_cam: jax.Array,  # (N,3) matched points in camera-2 frame
    sigma2_1: jax.Array,  # (N,) octave sigma^2 in frame 1
    sigma2_2: jax.Array,  # (N,)
    valid: jax.Array,  # (N,) bool
    n_hypotheses: int = 256,
    min_inliers: int = 20,
    fix_scale: bool = True,
) -> Sim3RansacResult:
    """Batched RANSAC over 3-point Horn hypotheses.

    Inlier check = two-way reprojection (sim3Solver.cpp:207-224): p2
    mapped through S12 must reproject near the frame-1 observation of
    p1 (9.210 * sigma^2 gate, the reference's th1/th2) and vice versa.
    """
    n = p1_cam.shape[0]
    n_valid = jnp.sum(valid)
    probs = jnp.where(valid, 1.0, 0.0)
    probs = probs / jnp.maximum(probs.sum(), 1e-6)
    picks = jax.random.choice(
        key, n, shape=(n_hypotheses, 3), replace=True, p=probs
    )

    def solve_one(pick):
        return horn_sim3(p1_cam[pick], p2_cam[pick], fix_scale=fix_scale)

    S_batch = jax.vmap(solve_one)(picks)  # (B,4,4)

    def project(p):
        z = jnp.maximum(p[..., 2], 1e-6)
        return jnp.stack(
            [cam.fx * p[..., 0] / z + cam.cx, cam.fy * p[..., 1] / z + cam.cy],
            axis=-1,
        )

    obs1 = project(p1_cam)  # (N,2)
    obs2 = project(p2_cam)

    def count_inliers(S12):
        S21 = inv_S(S12)
        p2_in_1 = p2_cam @ S12[:3, :3].T + S12[:3, 3]
        p1_in_2 = p1_cam @ S21[:3, :3].T + S21[:3, 3]
        e1 = jnp.sum((project(p2_in_1) - obs1) ** 2, axis=-1)
        e2 = jnp.sum((project(p1_in_2) - obs2) ** 2, axis=-1)
        ok = valid & (e1 < 9.210 * sigma2_1) & (e2 < 9.210 * sigma2_2)
        ok &= (p2_in_1[:, 2] > 0) & (p1_in_2[:, 2] > 0)
        return ok

    inl = jax.vmap(count_inliers)(S_batch)  # (B,N)
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    best_S = S_batch[best]
    best_inl = inl[best]
    n_best = counts[best]
    # Refine on all inliers of the best hypothesis (PnPsolver-style refine).
    w = best_inl.astype(jnp.float32)[:, None]
    mean_ok = n_best >= 3

    def refined():
        sel = jnp.where(best_inl[:, None], p1_cam, 0.0), jnp.where(
            best_inl[:, None], p2_cam, 0.0
        )
        # weighted Horn on inliers: re-center with masked means
        nw = jnp.maximum(n_best.astype(jnp.float32), 1.0)
        c1 = jnp.sum(sel[0], axis=0) / nw
        c2 = jnp.sum(sel[1], axis=0) / nw
        q1 = (p1_cam - c1) * w
        q2 = (p2_cam - c2) * w
        M = q1.T @ q2
        Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
        Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
        Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
        Nq = jnp.array(
            [
                [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
                [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
                [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
                [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
            ]
        )
        _, vecs = jnp.linalg.eigh(Nq)
        q = vecs[:, -1]
        wq, x, y, z = q[0], -q[1], -q[2], -q[3]
        R = jnp.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - wq * z), 2 * (x * z + wq * y)],
                [2 * (x * y + wq * z), 1 - 2 * (x * x + z * z), 2 * (y * z - wq * x)],
                [2 * (x * z - wq * y), 2 * (y * z + wq * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        if fix_scale:
            s = jnp.float32(1.0)
        else:
            s = jnp.sqrt(jnp.sum(q1 * q1) / jnp.maximum(jnp.sum(q2 * q2), 1e-9))
        t = c1 - s * (R @ c2)
        return make_S(s, R, t)

    S_fine = jnp.where(mean_ok, refined(), best_S)
    inl_fine = count_inliers(S_fine)
    n_fine = jnp.sum(inl_fine)
    use_fine = n_fine >= n_best
    S_out = jnp.where(use_fine, S_fine, best_S)
    inl_out = jnp.where(use_fine, inl_fine, best_inl)
    n_out = jnp.where(use_fine, n_fine, n_best)
    return Sim3RansacResult(
        S_12=S_out,
        inliers=inl_out,
        n_inliers=n_out,
        ok=(n_out >= min_inliers) & (n_valid >= 3),
    )
