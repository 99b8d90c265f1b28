"""Golden test: the Pallas BA observation pass (optim/lm_kernel.py)
against the XLA _flat_system body on a real synthetic BA problem."""
import numpy as np
import pytest

import jax.numpy as jnp

from test_ba import CAM, make_ba_problem

from ydorbslam_tpu.optim import schur


def _pad_problem(prob, P_pad, O_pad):
    """Pad points/obs to kernel-friendly capacities."""
    P, O = prob.obs_cam.shape

    def padP(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((P_pad - P,) + a.shape[1:], fill, a.dtype)], 0
        )

    def padO(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((a.shape[0], O_pad - O) + a.shape[2:], fill, a.dtype)],
            1,
        )

    return prob._replace(
        p_w=padP(prob.p_w),
        pt_valid=padP(prob.pt_valid, False),
        obs_cam=padO(padP(prob.obs_cam, -1), -1),
        obs_uvr=padO(padP(prob.obs_uvr)),
        obs_inv_sigma2=padO(padP(prob.obs_inv_sigma2)),
        obs_stereo=padO(padP(prob.obs_stereo, False), False),
        obs_valid=padO(padP(prob.obs_valid, False), False),
    )


@pytest.mark.parametrize("use_huber", [True, False])
def test_flat_system_kernel_matches_xla(rng, use_huber):
    prob, _, _, _ = make_ba_problem(rng, C=6, P=100, O=6, noise=0.5,
                                    perturb=0.05)
    prob = _pad_problem(prob, 512, 8)
    f = schur._flatten_obs(prob)
    af = schur._po_flat(prob.obs_valid)
    ref = schur._flat_system(
        CAM, prob.T_cw, prob.p_w, prob, f, af, jnp.asarray(use_huber)
    )
    got = schur._flat_system_kernel(
        CAM, prob.T_cw, prob.p_w, prob, f, af, jnp.asarray(use_huber)
    )
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.red), np.asarray(ref.red),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.Hpp), np.asarray(ref.Hpp),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.bp), np.asarray(ref.bp),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.Bq), np.asarray(ref.Bq),
                               rtol=2e-4, atol=2e-3)
