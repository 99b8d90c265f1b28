"""Pallas kernels vs their jnp reference implementations.

(The masked-matrix best2 kernels that used to live here were deleted in
round 4 once superseded by proj_best2_pallas / pair_best2_pallas —
see tests/test_proj_best2_kernel.py and tests/test_pallas_pair.py.)
"""
import jax.numpy as jnp
import numpy as np


def test_fast_score_nms_matches_reference(rng):
    from ydorbslam_tpu.ops.fast import fast_score_map, nms_and_border
    from ydorbslam_tpu.ops.pallas_kernels import fast_score_nms_pallas

    img = jnp.asarray(
        rng.uniform(0, 255, size=(137, 201)).astype(np.float32)
    )
    ref = nms_and_border(fast_score_map(img), 16)
    out = fast_score_nms_pallas(img, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
