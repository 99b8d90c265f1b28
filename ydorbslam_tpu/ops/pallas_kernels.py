"""Pallas TPU kernels for the hottest data-association ops.

The jnp formulations in ops/hamming.py let XLA fuse XOR+popcount+sum,
but the full (M, N) distance matrix still round-trips (M, N, 8) x 4
bytes of XOR intermediates through HBM before the lane reduction.  The
Pallas kernels here tile the computation through VMEM so each (128, 128)
distance tile is produced on-chip in one pass, and optionally fuse the
per-row minimum search into the same sweep (the matcher usually wants
argmin, not the full matrix).

All kernels have jnp reference implementations (ops/hamming.py) used as
golden values in tests and as the fallback on CPU (``interpret=True``
covers the interpreter path).
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


def _dist_tile(a_ref, b_ref, out_ref):
    """(TILE_M,8) x (TILE_N,8) uint32 -> (TILE_M,TILE_N) int32 Hamming."""
    a = a_ref[:]  # (TM,8)
    b = b_ref[:]  # (TN,8)
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])  # (TM,TN,8) in VMEM
    out_ref[:] = jnp.sum(
        jax.lax.population_count(x), axis=-1, dtype=jnp.int32
    )


@functools.partial(jax.jit, static_argnames=())
def hamming_matrix_pallas(desc_a: jax.Array, desc_b: jax.Array) -> jax.Array:
    """(M,8) x (N,8) uint32 -> (M,N) int32 Hamming distances, tiled.

    Equivalent to ops.hamming.distance_matrix; tiles of the output are
    produced entirely in VMEM (the XOR intermediate never touches HBM).
    M and N must be multiples of 128 (the framework's fixed capacities
    are lane-aligned by construction, config.SlamConfig.n_keypoints).
    """
    M, N = desc_a.shape[0], desc_b.shape[0]
    assert M % TILE_M == 0 and N % TILE_N == 0, (M, N)
    grid = (M // TILE_M, N // TILE_N)
    return pl.pallas_call(
        _dist_tile,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (TILE_M, 8), lambda i, j: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (TILE_N, 8), lambda i, j: (j, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (TILE_M, TILE_N), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=_use_interpret(),
    )(desc_a, desc_b)


def _masked_best2_kernel(a_ref, b_ref, mask_ref, best_ref, second_ref, idx_ref):
    """One row-tile: stream over N in TILE_N chunks held in VMEM.

    a: (TILE_M, 8); b: (N, 8) resident in VMEM; mask: (TILE_M, N).
    Outputs are (1, TILE_M) row blocks (2-D for lane alignment).
    Running minima are fori_loop carries — registers, no HBM traffic.
    """
    a = a_ref[:]
    n = b_ref.shape[0]
    n_chunks = n // TILE_N

    def body(c, state):
        best, second, idx = state
        b = b_ref[pl.ds(c * TILE_N, TILE_N), :]
        x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
        d = jnp.sum(jax.lax.population_count(x), axis=-1, dtype=jnp.int32)
        m = mask_ref[:, pl.ds(c * TILE_N, TILE_N)]
        d = jnp.where(m, d, 10_000)
        # Mosaic index-reductions are float32-only; distances <= 256 are
        # exactly representable.
        df = d.astype(jnp.float32)
        arg_local = jnp.argmin(df, axis=1).astype(jnp.int32)
        tile_min = jnp.min(df, axis=1).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d2 = jnp.where(cols == arg_local[:, None], 10_000, d)
        tile_second = jnp.min(d2.astype(jnp.float32), axis=1).astype(jnp.int32)
        tile_arg = arg_local + c * TILE_N

        new_best = jnp.minimum(best, tile_min)
        new_idx = jnp.where(tile_min < best, tile_arg, idx)
        loser = jnp.where(tile_min < best, best, tile_min)
        new_second = jnp.minimum(jnp.minimum(second, loser), tile_second)
        return new_best, new_second, new_idx

    init = (
        jnp.full((TILE_M,), 10_000, jnp.int32),
        jnp.full((TILE_M,), 10_000, jnp.int32),
        jnp.full((TILE_M,), -1, jnp.int32),
    )
    best, second, idx = jax.lax.fori_loop(0, n_chunks, body, init)
    i = pl.program_id(0)
    best_ref[i, :] = best
    second_ref[i, :] = second
    idx_ref[i, :] = idx


@functools.partial(jax.jit, static_argnames=())
def masked_best2_pallas(
    desc_a: jax.Array, desc_b: jax.Array, pair_mask: jax.Array
):
    """Fused masked best/second-best search.

    -> (best_idx (M,), best (M,), second (M,)) — the core of every
    matcher ratio test (ops.hamming.best_and_second over a masked
    matrix), computed without materializing the (M, N) matrix in HBM.
    """
    M, N = desc_a.shape[0], desc_b.shape[0]
    assert M % TILE_M == 0 and N % TILE_N == 0, (M, N)
    G = M // TILE_M
    best, second, idx = pl.pallas_call(
        _masked_best2_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((G, TILE_M), jnp.int32),
            jax.ShapeDtypeStruct((G, TILE_M), jnp.int32),
            jax.ShapeDtypeStruct((G, TILE_M), jnp.int32),
        ),
        grid_spec=pl.GridSpec(
            grid=(G,),
            in_specs=[
                pl.BlockSpec((TILE_M, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_M, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                # whole-array blocks (shape == array shape is always a
                # legal tiling); the kernel writes its grid row.
                pl.BlockSpec((G, TILE_M), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, TILE_M), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, TILE_M), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        interpret=_use_interpret(),
    )(desc_a, desc_b, pair_mask)
    return idx.reshape(M), best.reshape(M), second.reshape(M)
