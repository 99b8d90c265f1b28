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
    Hpp_inv = jnp.linalg.inv(Hpp_d)
    fixed_pt = ~prob.pt_valid
    Hpp_inv = jnp.where(fixed_pt[:, None, None], 0.0, Hpp_inv)

    # Camera diagonal blocks + gradient (segment over obs).
    camc = jnp.clip(prob.obs_cam, 0, C - 1).reshape(-1)
    Hcc_blocks = jnp.einsum("poci,poc,pocj->poij", Jc, w, Jc).reshape(-1, 6, 6)
    bc_blocks = jnp.einsum("poci,poc,poc->poi", Jc, w, r).reshape(-1, 6)
    Hcc = jax.ops.segment_sum(Hcc_blocks, camc, num_segments=C)  # (C,6,6)
    bc = jax.ops.segment_sum(bc_blocks, camc, num_segments=C)  # (C,6)

    # Coupling B = Jc^T W Jp per obs: (P,O,6,3)
    B = jnp.einsum("poci,poc,pocj->poij", Jc, w, Jp)
    BHinv = jnp.einsum("poij,pjk->poik", B, Hpp_inv)  # (P,O,6,3)

    # Schur off-diagonal terms: sum over points of BHinv_o B_o'^T at
    # (cam_o, cam_o').  Chunked over points: the (chunk, O, O, 6, 6)
    # pair tensor is the peak intermediate, so large-P problems (global
    # BA over the whole map) scan over point chunks instead of
    # materializing (P, O, O, 36) at once.
    cam2d = camc.reshape(P, O)
    chunk = min(P, _SCHUR_CHUNK)
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    if pad:
        BHinv_c = jnp.pad(BHinv, ((0, pad), (0, 0), (0, 0), (0, 0)))
        B_c = jnp.pad(B, ((0, pad), (0, 0), (0, 0), (0, 0)))
        cam_c = jnp.pad(cam2d, ((0, pad), (0, 0)), constant_values=C)
    else:
        BHinv_c, B_c, cam_c = BHinv, B, cam2d

    def chunk_sum(args):
        bh, bb, cc = args
        pair = jnp.einsum("poik,pqjk->poqij", bh, bb)  # (chunk,O,O,6,6)
        ci = jnp.broadcast_to(cc[:, :, None], (chunk, O, O))
        cj = jnp.broadcast_to(cc[:, None, :], (chunk, O, O))
        seg = jnp.where((ci < C) & (cj < C), ci * C + cj, C * C)
        return jax.ops.segment_sum(
            pair.reshape(-1, 6, 6), seg.reshape(-1), num_segments=C * C + 1
        )[: C * C]

    chunks = (
        BHinv_c.reshape(n_chunks, chunk, O, 6, 3),
        B_c.reshape(n_chunks, chunk, O, 6, 3),
        cam_c.reshape(n_chunks, chunk, O),
    )
    S_off = jnp.sum(jax.lax.map(chunk_sum, chunks), axis=0).reshape(C, C, 6, 6)

    # Reduced rhs: bs = bc - sum_o BHinv_o bp
    bs_corr = jax.ops.segment_sum(
        jnp.einsum("poik,pk->poi", BHinv, bp).reshape(-1, 6), camc, num_segments=C
    )
    bs = bc - bs_corr  # (C,6)

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

    Sd = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    dxc = -jnp.linalg.solve(Sd + 1e-8 * jnp.eye(C * 6), bs.reshape(-1)).reshape(C, 6)

    # Back-substitute points: dxp = -Hpp^-1 (bp + sum_o B_o^T dxc[cam_o])
    dxc_obs = dxc[camc.reshape(P, O)]  # (P,O,6)
    corr = jnp.einsum("poij,poi->pj", B, dxc_obs)  # (P,3)
    dxp = -jnp.einsum("pij,pj->pi", Hpp_inv, bp + corr)

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
