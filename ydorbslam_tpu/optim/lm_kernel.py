"""Pallas TPU kernel for the bundle-adjustment observation pass.

One LM iteration's per-observation work (optim/schur._flat_system —
projection, Huber-weighted residuals, the 42 camera normal-equation
columns, the 18 camera-point coupling columns, the per-point 3x3
blocks/gradients, and the robustified cost) is ~250 small XLA fusions
per local BA on this toolchain, each paying fixed dispatch overhead and
an HBM round trip between fusion boundaries.  This kernel computes the
whole pass in ONE sweep over (O, TILE_P) tiles held in VMEM: inputs are
a stacked (32, O, P) attribute tensor, outputs the per-observation
column stack (60, O, P) plus the in-kernel O-reduced per-point stack
(16, P).  The incidence matmul (columns @ E) and everything downstream
(Schur coupling, Cholesky, updates) stay in XLA where they are already
MXU-shaped.

Replaces the FLOP-identical math of g2o's edge linearization loop
(/root/reference/thirdParty/g2o core + src/optimizer.cpp:138-352 usage);
the math itself is documented in optim/schur.py and optim/residuals.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHI2_MONO = 5.991
CHI2_STEREO = 7.815

# Input row layout of the stacked (NIN, O, P) attribute tensor.
NIN = 32
(
    I_R00, I_R01, I_R02, I_R10, I_R11, I_R12, I_R20, I_R21, I_R22,
    I_T0, I_T1, I_T2,
    I_X, I_Y, I_Z,
    I_OU, I_OV, I_OR,
    I_IS2, I_STEREO, I_OK, I_HUB,
    I_FX, I_FY, I_CX, I_CY, I_BF,
) = range(27)

NOUT_Q = 64  # 42 camM + 18 B, padded to a multiple of 8 sublanes
NOUT_P = 16  # 9 Hpp + 3 bp + 1 cost + pad


def _lm_obs_kernel(in_ref, outq_ref, outp_ref):
    g = in_ref  # (NIN, O, TILE_P) block

    def row(i):
        return g[i]

    R = [row(I_R00 + k) for k in range(9)]
    t0, t1, t2 = row(I_T0), row(I_T1), row(I_T2)
    X, Y, Z = row(I_X), row(I_Y), row(I_Z)
    fx, fy = row(I_FX), row(I_FY)
    cx, cy, bf = row(I_CX), row(I_CY), row(I_BF)

    x = R[0] * X + R[1] * Y + R[2] * Z + t0
    y = R[3] * X + R[4] * Y + R[5] * Z + t1
    zr = R[6] * X + R[7] * Y + R[8] * Z + t2
    z = jnp.maximum(zr, 1e-6)
    iz = 1.0 / z
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    ur = u - bf * iz
    ru = row(I_OU) - u
    rv = row(I_OV) - v
    rr = row(I_OR) - ur

    mask = row(I_OK) * (zr > 1e-3).astype(jnp.float32)
    wu0 = row(I_IS2) * mask
    stereo = row(I_STEREO)
    wr0 = wu0 * stereo
    chi2 = ru * ru * wu0 + rv * rv * wu0 + rr * rr * wr0
    delta2 = jnp.where(stereo > 0.5, CHI2_STEREO, CHI2_MONO)
    use_huber = row(I_HUB) > 0.5
    # huber_cost / huber_scale (optim/residuals.py:94-105) inlined.
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    d = jnp.sqrt(delta2)
    rho = jnp.where(chi2 <= delta2, chi2, 2.0 * d * s - delta2)
    cost_terms = jnp.where(use_huber, rho, chi2) * mask
    hub = jnp.where(
        use_huber & (chi2 > delta2),
        jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)),
        1.0,
    )
    wu = wu0 * hub
    wr = wr0 * hub

    iz2 = iz * iz
    a = fx * iz
    c3 = -fx * x * iz2
    dd = fy * iz
    e = -fy * y * iz2
    cr = c3 + bf * iz2
    zero = jnp.zeros_like(a)
    Ju = (-a, zero, -c3, -c3 * y, -(a * z - c3 * x), a * y)
    Jv = (zero, -dd, -e, -(-dd * z + e * y), e * x, -dd * x)
    Jr = (-a, zero, -cr, -cr * y, -(a * z - cr * x), a * y)
    Pu = tuple(-(a * R[j] + c3 * R[6 + j]) for j in range(3))
    Pv = tuple(-(dd * R[3 + j] + e * R[6 + j]) for j in range(3))
    Pr = tuple(-(a * R[j] + cr * R[6 + j]) for j in range(3))
    Jc = tuple(zip(Ju, Jv, Jr))
    Jp = tuple(zip(Pu, Pv, Pr))
    rrow = (ru, rv, rr)

    def rowsum(Ai, Bj):
        return wu * Ai[0] * Bj[0] + wu * Ai[1] * Bj[1] + wr * Ai[2] * Bj[2]

    # camM 42 rows then B 18 rows.
    k = 0
    for i in range(6):
        for j in range(6):
            outq_ref[k] = rowsum(Jc[i], Jc[j])
            k += 1
    for i in range(6):
        outq_ref[k] = rowsum(Jc[i], rrow)
        k += 1
    for i in range(6):
        for kk in range(3):
            outq_ref[k] = rowsum(Jc[i], Jp[kk])
            k += 1
    for pad in range(k, NOUT_Q):
        outq_ref[pad] = zero

    # Per-point stack: Hpp 9 + bp 3 + cost 1 (O-reduced in-kernel).
    k = 0
    for i in range(3):
        for j in range(3):
            outp_ref[k] = jnp.sum(rowsum(Jp[i], Jp[j]), axis=0)
            k += 1
    for i in range(3):
        outp_ref[k] = jnp.sum(rowsum(Jp[i], rrow), axis=0)
        k += 1
    outp_ref[k] = jnp.sum(cost_terms, axis=0)
    for pad in range(k + 1, NOUT_P):
        outp_ref[pad] = jnp.zeros_like(outp_ref[pad])


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


TILE_P = 512


@jax.jit
def lm_obs_pallas(inp: jax.Array):
    """(NIN, O, P) stacked attributes -> ((60, O, P) obs columns,
    (16, P) O-reduced per-point columns).  P must be a multiple of
    TILE_P=512 lanes; O a multiple of 8 sublanes."""
    _, O, P = inp.shape
    assert P % TILE_P == 0 and O % 8 == 0, (O, P)
    G = P // TILE_P
    outq, outp = pl.pallas_call(
        _lm_obs_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((NOUT_Q, O, P), jnp.float32),
            jax.ShapeDtypeStruct((NOUT_P, P), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(G,),
            in_specs=[
                pl.BlockSpec((NIN, O, TILE_P), lambda j: (0, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((NOUT_Q, O, TILE_P), lambda j: (0, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NOUT_P, TILE_P), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ),
        ),
        interpret=_use_interpret(),
    )(inp)
    return outq, outp
