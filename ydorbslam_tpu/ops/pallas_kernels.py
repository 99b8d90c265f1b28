"""Pallas TPU kernels for the hottest data-association ops.

The jnp formulations in ops/hamming.py let XLA fuse XOR+popcount+sum,
but the full (M, N) distance matrix still round-trips (M, N, 8) x 4
bytes of XOR intermediates through HBM before the lane reduction.  The
Pallas kernels here tile the computation through VMEM so each (128, 128)
distance tile is produced on-chip in one pass, and optionally fuse the
per-row minimum search into the same sweep (the matcher usually wants
argmin, not the full matrix).

All kernels have jnp reference implementations (ops/hamming.py,
slam/triangulate.py) used as golden values in tests and as the fallback
on CPU (``interpret=True`` covers the interpreter path).

TOOLCHAIN NOTE: kernels that take a precomputed (M, N) pair-mask input
or hold a full (N, 8) operand in VMEM with an in-kernel chunk loop
compile standalone but WEDGE this image's AOT Mosaic pipeline when
embedded inside a large fused jit (round-2 measurement; those kernels
were deleted in round 4 once superseded).  The surviving designs —
proj_best2_pallas / pair_best2_pallas (attribute-row gating, grid
revisiting) and the FAST kernel — all embed fine and are the
production paths.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128
TILE_N = 128


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------
# Fused FAST-9 corner score + 3x3 NMS + border mask.
#
# The XLA formulation (ops/fast.py) materializes a (16, H, W) circle
# stack plus ~10 same-sized temporaries per pyramid level — ~6 ms of
# pure HBM traffic per frame at 640x480x8 levels.  Here each row strip
# is processed entirely in VMEM: the 16 circle taps are unaligned
# slices of the strip, the two arc-min trees and the NMS run on
# registers, and only the final suppressed score ever touches HBM.
# ---------------------------------------------------------------------

_FAST_PAD = 4  # 3 px circle radius + 1 px NMS halo
_FAST_STRIP = 64  # output rows per grid step


def _fast_nms_kernel(
    img_ref, out_ref, strip, sem, *, W, row0_h, row1, col0, col1, H_out
):
    """One row strip -> (1, S, W) suppressed scores.

    The padded image stays in HBM (``pl.ANY``); each grid step DMAs its
    overlapping (S+8, W+8) strip into VMEM scratch — overlapping windows
    are not expressible as BlockSpecs, and staging them as a stacked XLA
    concatenate costs ~1 ms/level in kLoop fusions.

    ``row0_h``..``row1`` / ``col0``..``col1`` are the detection bounds
    in GLOBAL image coordinates (border exclusion)."""
    from .fast import FAST_OFFSETS

    S = out_ref.shape[1]
    i = pl.program_id(0)
    P = _FAST_PAD
    dma = pltpu.make_async_copy(
        img_ref.at[pl.ds(i * S, S + 2 * P), :], strip, sem
    )
    dma.start()
    dma.wait()
    a = strip[:]
    H2, W2 = S + 2, W + 2
    # Score over an (S+2, W+2) window (one-pixel halo for NMS); the
    # window origin inside the strip is (PAD-1, PAD-1) = (3, 3).
    c = a[3 : 3 + H2, 3 : 3 + W2]
    ds = []
    for (dx, dy) in FAST_OFFSETS:
        p = a[3 + dy : 3 + dy + H2, 3 + dx : 3 + dx + W2]
        ds.append(p - c)

    def arc9_min(x):
        m1 = [jnp.minimum(x[k], x[(k + 1) % 16]) for k in range(16)]
        m2 = [jnp.minimum(m1[k], m1[(k + 2) % 16]) for k in range(16)]
        m4 = [jnp.minimum(m2[k], m2[(k + 4) % 16]) for k in range(16)]
        m9 = [jnp.minimum(m4[k], x[(k + 8) % 16]) for k in range(16)]
        out = m9[0]
        for k in range(1, 16):
            out = jnp.maximum(out, m9[k])
        return out

    bright = arc9_min(ds)
    dark = arc9_min([-d for d in ds])
    sc = jnp.maximum(jnp.maximum(bright, dark), 0.0)  # (S+2, W+2)

    # 3x3 NMS on the halo'd score (peak keeps its score, else 0).
    center = sc[1 : 1 + S, 1 : 1 + W]
    neigh = center
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            neigh = jnp.maximum(neigh, sc[dy : dy + S, dx : dx + W])
    is_peak = center >= neigh

    rows = jax.lax.broadcasted_iota(jnp.int32, (S, W), 0) + i * S
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, W), 1)
    ok = (
        (rows >= row0_h)
        & (rows < row1)
        & (rows < H_out)
        & (cols >= col0)
        & (cols < col1)
    )
    out_ref[0] = jnp.where(is_peak & ok, center, 0.0)


@functools.partial(jax.jit, static_argnames=("border",))
def fast_score_nms_pallas(image: jax.Array, border: int = 16) -> jax.Array:
    """FAST-9 score map with fused NMS + border mask (TPU Pallas).

    Drop-in equivalent of ``nms_and_border(fast_score_map(img), border)``
    (ops/fast.py) — golden-tested against that pair.  Grid = overlapping
    row strips pre-stacked in XLA (a cheap (G, S+8, W+8) copy) so the
    kernel itself is pure VMEM vector work with static shapes.
    """
    H, W = image.shape
    S = _FAST_STRIP
    G = -(-H // S)
    Wp = -(-W // 128) * 128
    P = _FAST_PAD
    # Pad: edge-replicate (values outside are masked by the border test
    # anyway).  Total width must stay lane-aligned (128) because each
    # grid step DMAs a full-width strip: left pad P, right pad fills to
    # Wp + 128.
    padded = jnp.pad(
        image,
        ((P, G * S - H + P), (P, Wp + 128 - W - P)),
        mode="edge",
    )
    out = pl.pallas_call(
        functools.partial(
            _fast_nms_kernel,
            W=Wp,
            row0_h=border,
            row1=H - border,
            col0=border,
            col1=W - border,
            H_out=H,
        ),
        out_shape=jax.ShapeDtypeStruct((G, S, Wp), jnp.float32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, S, Wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((S + 2 * P, Wp + 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_use_interpret(),
    )(padded)
    return out.reshape(G * S, Wp)[:H, :W]


# ---------------------------------------------------------------------
# Projection-gated best/second search with IN-KERNEL gating.
#
# Feeding masked_best2_pallas a precomputed (M, N) pair mask moves the
# bottleneck from the distance matrix to the mask build: XLA
# materializes ~(M, N) x 4 B of window/octave comparison intermediates
# in HBM — measured as expensive as the distances it replaced.  This
# kernel instead receives O(M)+O(N) attribute vectors (packed as
# (·, 8) f32 rows so Mosaic sees aligned 2-D tiles) and evaluates the
# reference's gates — projection window (frame.cpp:337-361), octave
# range, stereo right-x coherence (orbMatcher.cpp:101-110), validity —
# on-chip per (TILE_M, TILE_N) tile.  TWO window radii are resolved
# from one XOR+popcount pass (the motion matcher's narrow/wide retry,
# tracking.cpp:450-460); single-radius callers pass the same radius
# twice.
# ---------------------------------------------------------------------

# a_attr lanes: [u, v, ur_pred, rad_narrow, rad_wide, oct_lo, oct_hi, valid]
A_U, A_V, A_UR, A_RN, A_RW, A_OLO, A_OHI, A_VALID = range(8)
# b_attr lanes: [u, v, right_u, octave, valid, inv_sf2, 0, 0]
# (lane 5 = 1/scale_factor^(2*octave) — the fuse chi2 weight; zero for
# callers that do not use the pair-"proj" chi2 gate)
B_U, B_V, B_UR, B_OCT, B_VALID, B_ISF2 = range(6)
# epipolar-mode a_attr lanes: [line_a, line_b, line_c, thr(=3.84*den2),
# octave, valid, 0, 0]; b_attr reuses [u, v, sigma2, octave, valid].
E_LA, E_LB, E_LC, E_THR, E_OCT, E_VALID = range(6)
B_SIG2 = B_UR  # lane 2 carries sigma^2(octave_b) in epipolar mode


def _proj_best2_kernel(
    a_desc_ref, a_attr_ref, b_desc_ref, b_attr_ref,
    bn_ref, sn_ref, in_ref, bw_ref, sw_ref, iw_ref,
    *, check_ur: bool,
):
    """Grid step (i, j): merge tile (i, j)'s gated best/second into the
    row-block outputs.  The j axis replaces an in-kernel chunk loop —
    Mosaic unrolls fori_loops over VMEM-resident operands, which blows
    the 16M scoped-vmem limit at N=1024; grid revisiting keeps exactly
    one (TILE_M, TILE_N) working set alive while the output blocks
    (indexed by i only) stay resident across the j sweep."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        big = jnp.full((TILE_M,), 10_000, jnp.int32)
        bn_ref[i, :] = big
        sn_ref[i, :] = big
        bw_ref[i, :] = big
        sw_ref[i, :] = big
        neg = jnp.full((TILE_M,), -1, jnp.int32)
        in_ref[i, :] = neg
        iw_ref[i, :] = neg

    # a-side: (TILE_M, 8) natural layout — column extracts are sublane
    # vectors, lane-broadcast free.  b-side arrives TRANSPOSED (8, N):
    # row extracts are lane vectors, sublane-broadcast free.  Extracting
    # b columns from an (N, 8) layout instead forces Mosaic through
    # per-word transpose buffers — measured as a ~50M scoped-vmem stack
    # allocation that OOMs the 16M limit.
    a = a_desc_ref[:]          # (TILE_M, 8) u32
    at = a_attr_ref[:]         # (TILE_M, 8) f32
    au = at[:, A_U][:, None]
    av = at[:, A_V][:, None]
    aur = at[:, A_UR][:, None]
    rn = at[:, A_RN][:, None]
    rw = at[:, A_RW][:, None]
    alo = at[:, A_OLO][:, None]
    ahi = at[:, A_OHI][:, None]
    aval = at[:, A_VALID][:, None] > 0.5
    bt = b_attr_ref[:]         # (8, TILE_N) f32
    bu = bt[B_U, :][None, :]
    bv = bt[B_V, :][None, :]
    bur = bt[B_UR, :][None, :]
    boct = bt[B_OCT, :][None, :]
    bval = bt[B_VALID, :][None, :] > 0.5

    du = jnp.abs(bu - au)
    dv = jnp.abs(bv - av)
    base = aval & bval & (boct >= alo) & (boct <= ahi)
    if check_ur:
        dur = jnp.abs(bur - aur)
        no_r = bur < 0  # (~has_r | cond) — Mosaic rejects bool where()
        win_n = (du <= rn) & (dv <= rn) & (no_r | (dur <= rn))
        win_w = (du <= rw) & (dv <= rw) & (no_r | (dur <= rw))
    else:
        win_n = (du <= rn) & (dv <= rn)
        win_w = (du <= rw) & (dv <= rw)

    # Word-wise accumulation: one (TM, TN) tile per descriptor word
    # instead of a (TM, TN, 8) intermediate — flat VMEM footprint.
    bd = b_desc_ref[:]         # (8, TILE_N) u32
    d0 = jnp.zeros((TILE_M, TILE_N), jnp.int32)
    for w in range(8):
        x = jnp.bitwise_xor(a[:, w][:, None], bd[w, :][None, :])
        d0 = d0 + jax.lax.population_count(x).astype(jnp.int32)

    def upd(d, best_ref, second_ref, idx_ref):
        # Mosaic index-reductions are float32-only; d <= 256 exact.
        df = d.astype(jnp.float32)
        arg_local = jnp.argmin(df, axis=1).astype(jnp.int32)
        tile_min = jnp.min(df, axis=1).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d2 = jnp.where(cols == arg_local[:, None], 10_000, d)
        tile_second = jnp.min(d2.astype(jnp.float32), axis=1).astype(jnp.int32)
        tile_arg = arg_local + j * TILE_N
        best = best_ref[i, :]
        second = second_ref[i, :]
        idx = idx_ref[i, :]
        best_ref[i, :] = jnp.minimum(best, tile_min)
        idx_ref[i, :] = jnp.where(tile_min < best, tile_arg, idx)
        loser = jnp.where(tile_min < best, best, tile_min)
        second_ref[i, :] = jnp.minimum(jnp.minimum(second, loser), tile_second)

    upd(jnp.where(base & win_n, d0, 10_000), bn_ref, sn_ref, in_ref)
    upd(jnp.where(base & win_w, d0, 10_000), bw_ref, sw_ref, iw_ref)


@functools.partial(jax.jit, static_argnames=("check_ur",))
def proj_best2_pallas(
    desc_a: jax.Array, attr_a: jax.Array,
    desc_b: jax.Array, attr_b: jax.Array,
    check_ur: bool = False,
):
    """Projection-window best/second search, gating computed on-chip.

    attr_a (M, 8) f32: [u, v, ur_pred, rad_narrow, rad_wide, oct_lo,
    oct_hi, valid]; attr_b (N, 8) f32: [u, v, right_u, octave, valid,
    0, 0, 0].  Returns ((idx_n, b1_n, b2_n), (idx_w, b1_w, b2_w)) —
    per-source best/second candidate index+distances under the narrow
    and wide radii.  idx = -1 when a row has no gated candidate.
    """
    M, N = desc_a.shape[0], desc_b.shape[0]
    assert M % TILE_M == 0 and N % TILE_N == 0, (M, N)
    G = M // TILE_M
    NC = N // TILE_N
    out = pl.pallas_call(
        functools.partial(_proj_best2_kernel, check_ur=check_ur),
        out_shape=tuple(
            jax.ShapeDtypeStruct((G, TILE_M), jnp.int32) for _ in range(6)
        ),
        grid_spec=pl.GridSpec(
            grid=(G, NC),
            in_specs=[
                pl.BlockSpec((TILE_M, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_M, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TILE_N), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TILE_N), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                # Whole-array blocks (always a legal tiling); each grid
                # step writes its own row i, revisited across j.
                pl.BlockSpec((G, TILE_M), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(6)
            ),
        ),
        interpret=_use_interpret(),
    )(desc_a, attr_a, desc_b.T, attr_b.T)
    bn, sn, i_n, bw, sw, iw = out
    return (
        (i_n.reshape(M), bn.reshape(M), sn.reshape(M)),
        (iw.reshape(M), bw.reshape(M), sw.reshape(M)),
    )


# ---------------------------------------------------------------------
# Batched pair-gated best/second search (mapping hot path).
#
# Local mapping's triangulation and fusion searches run the SAME
# (N, N) gated Hamming sweep against B ~= 10 covisible neighbors per
# keyframe (slam/triangulate.py; reference hot loops
# src/orbMatcher.cpp:463-565 and :682-745).  The XLA formulation
# materializes B (N, N, 8) XOR intermediates plus B (N, N) geometric
# masks in HBM — measured as the bulk of the ~40 ms mapping_prep cost.
# This kernel adds a leading pair axis to the proj_best2 design: grid
# (B, M/TILE_M, N/TILE_N), gates evaluated on-chip from O(M)+O(N)
# attribute rows, one (TILE_M, TILE_N) working set per step.  Two gate
# modes share the body:
#   * "proj": projection window + octave range (fusion searches,
#     orbMatcher.cpp:682-745) — single radius, no stereo column.
#   * "epi": point-to-epipolar-line distance num^2 < thr * sigma2(oct_b)
#     with |oct_a - oct_b| <= 1 (triangulation search,
#     orbMatcher.cpp:463-565 and its checkEpipolarDist :808-819).
# ---------------------------------------------------------------------


def _pair_best2_kernel(
    a_desc_ref, a_attr_ref, b_desc_ref, b_attr_ref,
    best_ref, second_ref, idx_ref, *, mode: str,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        big = jnp.full((TILE_M,), 10_000, jnp.int32)
        best_ref[b, i, :] = big
        second_ref[b, i, :] = big
        idx_ref[b, i, :] = jnp.full((TILE_M,), -1, jnp.int32)

    a = a_desc_ref[0]          # (TILE_M, 8) u32
    at = a_attr_ref[0]         # (TILE_M, 8) f32
    bd = b_desc_ref[0]         # (8, TILE_N) u32 (transposed)
    bt = b_attr_ref[0]         # (8, TILE_N) f32 (transposed)
    if mode == "proj":
        au = at[:, A_U][:, None]
        av = at[:, A_V][:, None]
        aur = at[:, A_UR][:, None]
        rad = at[:, A_RN][:, None]
        alo = at[:, A_OLO][:, None]
        ahi = at[:, A_OHI][:, None]
        aval = at[:, A_VALID][:, None] > 0.5
        bu = bt[B_U, :][None, :]
        bv = bt[B_V, :][None, :]
        bur = bt[B_UR, :][None, :]
        boct = bt[B_OCT, :][None, :]
        bval = bt[B_VALID, :][None, :] > 0.5
        bisf2 = bt[B_ISF2, :][None, :]
        # Reference fuse chi2 (orbMatcher.cpp:714-721): stereo keypoints
        # face (du^2+dv^2+dur^2)*inv_sf2 <= 7.81, mono (du^2+dv^2)
        # *inv_sf2 <= 5.99 — the gate that stops depth-inconsistent
        # candidates from merging distinct landmarks.
        du = bu - au
        dv = bv - av
        dur = bur - aur
        mono2 = du * du + dv * dv
        # Logical form, not a bool select — Mosaic cannot lower
        # where() between i1 vectors (trunci i8->i1).
        is_stereo = bur >= 0.0
        chi2_ok = (
            is_stereo & ((mono2 + dur * dur) * bisf2 <= 7.81)
        ) | (
            (~is_stereo) & (mono2 * bisf2 <= 5.99)
        )
        gate = (
            aval & bval
            & (boct >= alo) & (boct <= ahi)
            & (jnp.abs(du) <= rad) & (jnp.abs(dv) <= rad)
            & chi2_ok
        )
    else:  # "epi"
        la = at[:, E_LA][:, None]
        lb = at[:, E_LB][:, None]
        lc = at[:, E_LC][:, None]
        thr = at[:, E_THR][:, None]
        aoct = at[:, E_OCT][:, None]
        aval = at[:, E_VALID][:, None] > 0.5
        bu = bt[B_U, :][None, :]
        bv = bt[B_V, :][None, :]
        bs2 = bt[B_SIG2, :][None, :]
        boct = bt[B_OCT, :][None, :]
        bval = bt[B_VALID, :][None, :] > 0.5
        num = la * bu + lb * bv + lc
        gate = (
            aval & bval
            & (jnp.abs(boct - aoct) <= 1.0)
            & (num * num < thr * bs2)
        )

    d0 = jnp.zeros((TILE_M, TILE_N), jnp.int32)
    for w in range(8):
        x = jnp.bitwise_xor(a[:, w][:, None], bd[w, :][None, :])
        d0 = d0 + jax.lax.population_count(x).astype(jnp.int32)
    d = jnp.where(gate, d0, 10_000)

    # Mosaic index-reductions are float32-only; d <= 256 exact.
    df = d.astype(jnp.float32)
    arg_local = jnp.argmin(df, axis=1).astype(jnp.int32)
    tile_min = jnp.min(df, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.where(cols == arg_local[:, None], 10_000, d)
    tile_second = jnp.min(d2.astype(jnp.float32), axis=1).astype(jnp.int32)
    tile_arg = arg_local + j * TILE_N
    best = best_ref[b, i, :]
    second = second_ref[b, i, :]
    idx = idx_ref[b, i, :]
    best_ref[b, i, :] = jnp.minimum(best, tile_min)
    idx_ref[b, i, :] = jnp.where(tile_min < best, tile_arg, idx)
    loser = jnp.where(tile_min < best, best, tile_min)
    second_ref[b, i, :] = jnp.minimum(jnp.minimum(second, loser), tile_second)


@functools.partial(jax.jit, static_argnames=("mode",))
def pair_best2_pallas(
    desc_a: jax.Array, attr_a: jax.Array,
    desc_b: jax.Array, attr_b: jax.Array,
    mode: str = "proj",
):
    """Per-pair gated best/second search over B (a, b) descriptor sets.

    desc_a (B, M, 8) u32 + attr_a (B, M, 8) f32; desc_b (B, N, 8) u32 +
    attr_b (B, N, 8) f32 (lane layouts above).  Returns
    (idx (B, M), best (B, M), second (B, M)) int32 — per a-row best and
    second-best gated candidate in the SAME pair; idx = -1 when a row
    has no gated candidate (best/second = 10000 sentinels).
    """
    assert mode in ("proj", "epi"), mode
    B, M = desc_a.shape[0], desc_a.shape[1]
    N = desc_b.shape[1]
    assert M % TILE_M == 0 and N % TILE_N == 0, (M, N)
    G = M // TILE_M
    NC = N // TILE_N
    out = pl.pallas_call(
        functools.partial(_pair_best2_kernel, mode=mode),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, G, TILE_M), jnp.int32) for _ in range(3)
        ),
        grid_spec=pl.GridSpec(
            grid=(B, G, NC),
            in_specs=[
                pl.BlockSpec((1, TILE_M, 8), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_M, 8), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, TILE_N), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, TILE_N), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                # Whole-array blocks; each step writes row (b, i),
                # revisited across the j sweep.
                pl.BlockSpec((B, G, TILE_M), lambda b, i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(3)
            ),
        ),
        interpret=_use_interpret(),
    )(desc_a, attr_a, desc_b.transpose(0, 2, 1), attr_b.transpose(0, 2, 1))
    idx, best, second = out[2], out[0], out[1]
    return (
        idx.reshape(B, M), best.reshape(B, M), second.reshape(B, M),
    )
