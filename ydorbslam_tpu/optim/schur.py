"""Bundle adjustment via Levenberg-Marquardt with Schur complement.

Replaces g2o's sparse BA machinery — BlockSolver_6_3 with marginalized
point vertices + LinearSolverEigen + OptimizationAlgorithmLevenberg
(src/optimizer.cpp:7-357: bundleAdjust / localBundleAdjust /
globalBundleAdjust) — with an explicit, fully-batched implementation:

  * observations are grouped BY POINT into fixed (P, O) slots, which
    makes landmark marginalization a per-point 3x3 inverse (vmapped),
  * the reduced camera system S (6C x 6C) is assembled with one
    segment-sum over observation pairs and solved with dense Cholesky —
    for C <= a few hundred cameras this is MXU-friendly and exact,
  * the LM loop is a fixed-iteration ``fori``-style Python loop with
    accept/reject damping; "edge outlier demotion" is a weight mask.

Gauge fixing: boolean ``cam_fixed`` rows get identity blocks in S
(reference fixes KF0 and all observer-only KFs,
src/optimizer.cpp:27,170-190).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.camera import CameraIntrinsics
from ..geometry.se3 import se3_exp
from .residuals import (
    chi2_per_obs,
    huber_cost,
    huber_scale,
    residual_and_jacobians,
)

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
_SCHUR_CHUNK = 1024  # point-chunk size for reduced-system assembly


class BAProblem(NamedTuple):
    """Point-grouped BA problem with static capacities C cameras,
    P points, O observations per point."""

    T_cw: jax.Array  # (C,4,4)
    cam_fixed: jax.Array  # (C,) bool — gauge/observer cameras
    cam_valid: jax.Array  # (C,) bool
    p_w: jax.Array  # (P,3)
    pt_valid: jax.Array  # (P,) bool
    obs_cam: jax.Array  # (P,O) i32 camera index or -1
    obs_uvr: jax.Array  # (P,O,3)
    obs_inv_sigma2: jax.Array  # (P,O)
    obs_stereo: jax.Array  # (P,O) bool
    obs_valid: jax.Array  # (P,O) bool

    @property
    def C(self):
        return self.T_cw.shape[0]

    @property
    def P(self):
        return self.p_w.shape[0]

    @property
    def O(self):
        return self.obs_cam.shape[0:2][1]


def inv3x3(M: jax.Array) -> jax.Array:
    """Closed-form batched 3x3 inverse (adjugate / det).

    ``jnp.linalg.inv`` on batches of tiny matrices lowers to per-matrix
    LU on TPU and is catastrophically slow through this toolchain; the
    cofactor formula is pure elementwise VPU work.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def inv6x6_blocked(M: jax.Array) -> jax.Array:
    """Closed-form batched 6x6 inverse via 2x2 block elimination of 3x3
    blocks (each inverted with the cofactor formula) — no batched LU.

        M = [[A, B], [C, D]],  S = D - C A^-1 B
        M^-1 = [[A^-1 + A^-1 B S^-1 C A^-1, -A^-1 B S^-1],
                [-S^-1 C A^-1,               S^-1]]
    """
    A = M[..., :3, :3]
    B = M[..., :3, 3:]
    Cb = M[..., 3:, :3]
    D = M[..., 3:, 3:]
    Ainv = inv3x3(A)
    AinvB = Ainv @ B
    Sinv = inv3x3(D - Cb @ AinvB)
    CAinv = Cb @ Ainv
    top_left = Ainv + AinvB @ Sinv @ CAinv
    top_right = -AinvB @ Sinv
    bot_left = -Sinv @ CAinv
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, Sinv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _pcg_solve_blocks(S: jax.Array, b: jax.Array, iters: int = 128) -> jax.Array:
    """Solve S x = b for block-structured S (C,C,6,6), b (C,6) with
    BLOCK-Jacobi preconditioned conjugate gradients.

    Dense LU/Cholesky of the (6C, 6C) reduced system is latency-bound on
    TPU (sequential panel factorization); PCG is pure matmul work on the
    MXU.  The preconditioner must be the full 6x6 diagonal block —
    scalar Jacobi stagnates/diverges on real BA systems (pose blocks
    couple rotation and translation strongly).
    """
    C = S.shape[0]
    diag = S[jnp.arange(C), jnp.arange(C)]  # (C,6,6)
    Minv = inv6x6_blocked(diag + 1e-5 * jnp.eye(6))

    def matvec(x):
        return jnp.einsum("cdij,dj->ci", S, x)

    def precond(r):
        return jnp.einsum("cij,cj->ci", Minv, r)

    x0 = jnp.zeros_like(b)
    r0 = b - matvec(x0)
    z0 = precond(r0)

    def body(_, state):
        x, r, z, p, rz = state
        Ap = matvec(p)
        denom = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
        p = z + beta * p
        return x, r, z, p, rz_new

    x, _, _, _, _ = jax.lax.fori_loop(
        0, iters, body, (x0, r0, z0, z0, jnp.sum(r0 * z0))
    )
    return x


def _per_obs(cam, T_all, p_w, prob: BAProblem):
    """Vmapped residuals/Jacobians over the (P,O) observation grid."""
    camc = jnp.clip(prob.obs_cam, 0, prob.C - 1)
    T_obs = T_all[camc]  # (P,O,4,4)

    def one(T, p, obs):
        return residual_and_jacobians(cam, T, p, obs)

    r, Jc, Jp, z = jax.vmap(jax.vmap(one, in_axes=(0, None, 0)))(
        T_obs, p_w, prob.obs_uvr
    )
    return r, Jc, Jp, z


def _weights(prob: BAProblem, z, active):
    w3 = jnp.broadcast_to(
        prob.obs_inv_sigma2[..., None], prob.obs_inv_sigma2.shape + (3,)
    )
    stereo_row = jnp.stack(
        [jnp.ones_like(prob.obs_stereo)] * 2 + [prob.obs_stereo], axis=-1
    )
    w3 = jnp.where(stereo_row, w3, 0.0)
    mask = (
        active
        & prob.obs_valid
        & (prob.obs_cam >= 0)
        & prob.pt_valid[:, None]
        & (z > 1e-3)
    )
    return w3 * mask[..., None].astype(jnp.float32), mask


def ba_cost_and_chi2(cam, T_all, p_w, prob: BAProblem, active, use_huber):
    r, _, _, z = _per_obs(cam, T_all, p_w, prob)
    w3, mask = _weights(prob, z, active)
    chi2 = chi2_per_obs(r, w3)
    delta2 = jnp.where(prob.obs_stereo, CHI2_STEREO, CHI2_MONO)
    cost = jnp.sum(
        jnp.where(use_huber, huber_cost(chi2, delta2), chi2)
        * mask.astype(jnp.float32)
    )
    return cost, chi2, mask


def _lm_iteration(cam, T_all, p_w, prob: BAProblem, active, lam, use_huber):
    """One damped step: returns (T_new, p_new)."""
    C, P, O = prob.C, prob.P, prob.obs_cam.shape[1]
    r, Jc, Jp, z = _per_obs(cam, T_all, p_w, prob)
    w3, mask = _weights(prob, z, active)
    delta2 = jnp.where(prob.obs_stereo, CHI2_STEREO, CHI2_MONO)
    chi2 = chi2_per_obs(r, w3)
    hub = jnp.where(use_huber, huber_scale(chi2, delta2), 1.0)
    w = w3 * hub[..., None]  # (P,O,3)

    # Per-point Hessian blocks and gradients.
    Hpp = jnp.einsum("poci,poc,pocj->pij", Jp, w, Jp)  # (P,3,3)
    bp = jnp.einsum("poci,poc,poc->pi", Jp, w, r)  # (P,3)
    Hpp_d = Hpp + lam * jnp.eye(3) * jnp.maximum(
        jnp.trace(Hpp, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1e-6
    )
    Hpp_inv = inv3x3(Hpp_d)
    fixed_pt = ~prob.pt_valid
    Hpp_inv = jnp.where(fixed_pt[:, None, None], 0.0, Hpp_inv)

    # --- MXU one-hot assembly -----------------------------------------
    # TPU scatter (segment_sum) serializes badly; instead every
    # "accumulate into camera c" becomes a matmul against the one-hot
    # observation->camera incidence E (P,O,C).  This also eliminates the
    # reference-style (P,O,O) pair enumeration for the Schur term:
    #   U[p,c] = sum_o E[p,o,c] BHinv[p,o]   (6,3)
    #   V[p,c] = sum_o E[p,o,c] B[p,o]       (6,3)
    #   S_off  = sum_p U[p] V[p]^T           (C,C,6,6)  — one big matmul.
    camc = jnp.clip(prob.obs_cam, 0, C - 1)  # (P,O)
    E = (
        (camc[..., None] == jnp.arange(C)[None, None, :])
        & (prob.obs_cam >= 0)[..., None]
    ).astype(jnp.float32)  # (P,O,C)

    Hcc_blocks = jnp.einsum("poci,poc,pocj->poij", Jc, w, Jc)  # (P,O,6,6)
    Hcc = jnp.einsum("poc,poij->cij", E, Hcc_blocks)  # (C,6,6)
    bc = jnp.einsum(
        "poc,poi->ci", E, jnp.einsum("poci,poc,poc->poi", Jc, w, r)
    )  # (C,6)

    # Coupling B = Jc^T W Jp per obs: (P,O,6,3)
    B = jnp.einsum("poci,poc,pocj->poij", Jc, w, Jp)
    BHinv = jnp.einsum("poij,pjk->poik", B, Hpp_inv)  # (P,O,6,3)
    U = jnp.einsum("poc,poik->pcik", E, BHinv)  # (P,C,6,3)
    V = jnp.einsum("poc,pojk->pcjk", E, B)  # (P,C,6,3)
    Um = U.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
    Vm = V.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
    S_off = (Um @ Vm.T).reshape(C, 6, C, 6).transpose(0, 2, 1, 3)

    # Reduced rhs: bs = bc - sum_p U_p bp_p
    bs = bc - jnp.einsum("pcik,pk->ci", U, bp)  # (C,6)

    # Assemble dense S with damping on camera diagonal.
    Hcc_d = Hcc + lam * jnp.eye(6) * jnp.maximum(
        jnp.trace(Hcc, axis1=-2, axis2=-1)[:, None, None] / 6.0, 1e-6
    )
    S = -S_off
    S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc_d)
    # Gauge: fixed/invalid cameras get identity rows/cols and zero rhs.
    free = prob.cam_valid & ~prob.cam_fixed
    fmask = free.astype(jnp.float32)
    S = S * fmask[:, None, None, None] * fmask[None, :, None, None]
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        jnp.where(free, 0.0, 1.0)[:, None, None] * jnp.eye(6)
    )
    bs = bs * fmask[:, None]

    dxc = -_pcg_solve_blocks(S, bs)
    # Sanitize: a breakdown in f32 CG (division by a tiny curvature) must
    # not poison the state — the LM accept/reject can only veto steps
    # whose COST is comparable, not NaN.
    dxc = jnp.where(jnp.isfinite(dxc), dxc, 0.0)
    dxc_norm = jnp.linalg.norm(dxc, axis=-1, keepdims=True)
    dxc = jnp.where(dxc_norm < 1e3, dxc, 0.0)

    # Back-substitute points: dxp = -Hpp^-1 (bp + sum_o B_o^T dxc[cam_o])
    dxc_obs = dxc[camc]  # (P,O,6)
    corr = jnp.einsum("poij,poi->pj", B, dxc_obs)  # (P,3)
    dxp = -jnp.einsum("pij,pj->pi", Hpp_inv, bp + corr)
    # Trust-region guard: near-singular landmark Hessians (e.g. a single
    # far observation) can produce astronomical steps whose cost overflows
    # float32 into inf/NaN before the accept/reject test can veto them.
    dxp = jnp.where(jnp.isfinite(dxp), dxp, 0.0)
    dxp_norm = jnp.linalg.norm(dxp, axis=-1, keepdims=True)
    dxp = jnp.where(dxp_norm < 1e3, dxp, 0.0)

    T_new = jax.vmap(lambda d, T: se3_exp(d) @ T)(dxc, T_all)
    T_new = jnp.where(free[:, None, None], T_new, T_all)
    p_new = jnp.where(prob.pt_valid[:, None], p_w + dxp, p_w)
    return T_new, p_new


def lm_solve(
    cam: CameraIntrinsics,
    prob: BAProblem,
    iters: int,
    use_huber: bool,
    active: jax.Array,
    lam0: float = 1e-4,
):
    """Fixed-iteration LM with accept/reject damping."""

    use_huber = jnp.asarray(use_huber)

    def body(state, _):
        T, p, lam, cost = state
        T_new, p_new = _lm_iteration(cam, T, p, prob, active, lam, use_huber)
        cost_new, _, _ = ba_cost_and_chi2(cam, T_new, p_new, prob, active, use_huber)
        accept = cost_new < cost
        T = jnp.where(accept, T_new, T)
        p = jnp.where(accept, p_new, p)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 5.0, 1e6))
        cost = jnp.where(accept, cost_new, cost)
        return (T, p, lam, cost), cost

    cost0, _, _ = ba_cost_and_chi2(
        cam, prob.T_cw, prob.p_w, prob, active, use_huber
    )
    (T, p, _, cost), _ = jax.lax.scan(
        body, (prob.T_cw, prob.p_w, jnp.float32(lam0), cost0), None, length=iters
    )
    return T, p, cost


@functools.partial(jax.jit, static_argnames=("iters1", "iters2"))
def bundle_adjust(
    cam: CameraIntrinsics,
    prob: BAProblem,
    iters1: int = 5,
    iters2: int = 10,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """The reference local-BA protocol (src/optimizer.cpp:287-314):
    ``iters1`` robust iterations, demote chi2-outlier observations, then
    ``iters2`` non-robust iterations, final outlier classification.

    Returns (T_cw (C,4,4), p_w (P,3), obs_outlier (P,O) bool).
    Use iters1=0, iters2=n for the plain global BA (optimizer.cpp:7-137
    runs a single phase with Huber kept).
    """
    active0 = prob.obs_valid
    delta2 = jnp.where(prob.obs_stereo, CHI2_STEREO, CHI2_MONO)
    if iters1 > 0:
        # Two-phase local-BA protocol: robust, demote, non-robust.
        T, p, _ = lm_solve(cam, prob, iters1, True, active0)
        prob1 = prob._replace(T_cw=T, p_w=p)
        _, chi2, mask = ba_cost_and_chi2(
            cam, T, p, prob1, active0, jnp.asarray(False)
        )
        inlier = mask & (chi2 <= delta2)
        T, p, _ = lm_solve(cam, prob1, iters2, False, inlier)
    else:
        # Single robust phase: the reference global BA keeps Huber and
        # never demotes (optimizer.cpp:7-137).
        T, p, _ = lm_solve(cam, prob, iters2, True, active0)
    _, chi2, mask = ba_cost_and_chi2(
        cam, T, p, prob._replace(T_cw=T, p_w=p), active0, jnp.asarray(False)
    )
    outlier = mask & (chi2 > delta2)
    return T, p, outlier
