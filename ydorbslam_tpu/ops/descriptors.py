"""Orientation + rotation-steered binary descriptors (rBRIEF).

Replaces the reference's intensity-centroid orientation
(src/orbExtractor.cpp:400-421) and 256-bit steered BRIEF
(src/orbExtractor.cpp:422-454 over the hard-coded 512-point pattern at
:56-313).

TPU-first design decisions:
  * Keypoint neighborhoods are gathered ONCE into fixed-size patches
    ((K, P, P) tensors); everything downstream is dense batched math on
    those patches — no per-keypoint pointer chasing.
  * The sampling pattern is NOT the OpenCV table: since this framework
    replaces the BoW vocabulary with dense Hamming retrieval, descriptors
    only need to be self-consistent, so we draw the classic BRIEF
    Gaussian test pattern (sigma = patch/5, Calonder et al. 2010) from a
    fixed seed.  Same 256 bits, same rotation-steering math, zero code
    copied.
  * Bit packing to uint32[8] lanes for VPU popcount matching
    (ops/hamming.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15  # orientation patch radius (reference patchSize 31)
BRIEF_HALF = 19  # descriptor patch half-size: |pattern| <= 13, rotated <= 13*sqrt2
BRIEF_P = 2 * BRIEF_HALF + 1  # 39
ORIENT_P = 2 * HALF_PATCH + 1  # 31
N_BITS = 256


@functools.lru_cache()
def brief_pattern() -> np.ndarray:
    """(256, 2, 2) int32 test-point pairs, Gaussian, deterministic.

    Points ~ N(0, (31/5)^2), clipped to [-13, 13]; fixed seed so the
    pattern is a compile-time constant everywhere.
    """
    rs = np.random.RandomState(0x0B1EF)
    pts = rs.normal(0.0, 31.0 / 5.0, size=(N_BITS, 2, 2))
    return np.clip(np.round(pts), -13, 13).astype(np.int32)


@functools.lru_cache()
def _orientation_mask() -> np.ndarray:
    """(31, 31) circular mask of radius 15 (reference umax circle)."""
    dy, dx = np.mgrid[-HALF_PATCH : HALF_PATCH + 1, -HALF_PATCH : HALF_PATCH + 1]
    return (dx * dx + dy * dy <= HALF_PATCH * HALF_PATCH).astype(np.float32)


def extract_patches(
    image: jax.Array, uv: jax.Array, half: int
) -> jax.Array:
    """Gather (K, 2*half+1, 2*half+1) patches centered at integer uv.

    ``image`` is pre-padded by the caller with at least ``half`` pixels;
    ``uv`` must already include the pad offset.  Implemented as a vmapped
    dynamic_slice — XLA lowers this to an efficient batched gather.
    """
    p = 2 * half + 1
    ui = jnp.round(uv[:, 0]).astype(jnp.int32)
    vi = jnp.round(uv[:, 1]).astype(jnp.int32)

    def one(u, v):
        return jax.lax.dynamic_slice(image, (v - half, u - half), (p, p))

    return jax.vmap(one)(ui, vi)


def orientation_from_patches(patches: jax.Array) -> jax.Array:
    """Intensity-centroid angle per patch: (K, 31, 31) -> (K,) radians.

    theta = atan2(m01, m10) with moments over the radius-15 disc
    (reference computeOrientation, src/orbExtractor.cpp:400-421).
    """
    mask = jnp.asarray(_orientation_mask())
    coords = jnp.arange(-HALF_PATCH, HALF_PATCH + 1, dtype=jnp.float32)
    masked = patches * mask[None]
    m10 = jnp.einsum("kyx,x->k", masked, coords)
    m01 = jnp.einsum("kyx,y->k", masked, coords)
    return jnp.arctan2(m01, m10)


def brief_from_patches(patches: jax.Array, angles: jax.Array) -> jax.Array:
    """Steered BRIEF: (K, 39, 39) blurred patches + (K,) angles -> (K, 8) uint32.

    Each of the 256 test pairs is rotated by the keypoint angle
    (nearest-neighbor sampling, like the reference's cvRound steering,
    src/orbExtractor.cpp:422-454), compared, and packed little-endian
    into 8 uint32 lanes.
    """
    pat = jnp.asarray(brief_pattern(), dtype=jnp.float32)  # (256,2,2) [x,y]
    cos, sin = jnp.cos(angles), jnp.sin(angles)  # (K,)
    px, py = pat[..., 0], pat[..., 1]  # (256,2)
    # Rotated integer sample offsets per keypoint: (K, 256, 2)
    rx = jnp.round(px[None] * cos[:, None, None] - py[None] * sin[:, None, None])
    ry = jnp.round(px[None] * sin[:, None, None] + py[None] * cos[:, None, None])
    idx = (
        (ry.astype(jnp.int32) + BRIEF_HALF) * BRIEF_P
        + rx.astype(jnp.int32)
        + BRIEF_HALF
    )  # (K,256,2)
    flat = patches.reshape(patches.shape[0], BRIEF_P * BRIEF_P)
    samples = jnp.take_along_axis(
        flat[:, None, :].repeat(2, axis=1),
        idx.transpose(0, 2, 1),
        axis=-1,
    )  # (K,2,256)
    bits = (samples[:, 0, :] < samples[:, 1, :]).astype(jnp.uint32)  # (K,256)
    lanes = bits.reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(lanes << shifts[None, None, :], axis=-1).astype(jnp.uint32)
