"""Multi-device tests on the virtual 8-CPU mesh: sharded BA and
sharded retrieval must agree with their single-device counterparts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from test_ba import CAM, make_ba_problem

from ydorbslam_tpu.parallel.ba_sharded import sharded_ba_step, sharded_pose_step
from ydorbslam_tpu.parallel.retrieval_sharded import sharded_topk_scores
from ydorbslam_tpu.optim.schur import _lm_iteration, ba_cost_and_chi2
from ydorbslam_tpu.slam.retrieval import add_keyframe, bow_histogram, empty_index, score_all


@pytest.fixture
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(devs[:8]), axis_names=("obs",))


def test_sharded_ba_matches_single_device(rng, mesh):
    prob, T_true, pts_true, _ = make_ba_problem(rng, C=6, P=128, O=8, noise=0.1)
    lam = 1e-4
    T_ref, p_ref = _lm_iteration(
        CAM, prob.T_cw, prob.p_w, prob, prob.obs_valid, jnp.float32(lam),
        jnp.asarray(True),
    )
    # huber on in _lm_iteration; the sharded step also applies huber.
    T_sh, p_sh = sharded_ba_step(mesh, CAM, prob, lam=lam)
    np.testing.assert_allclose(np.asarray(T_sh), np.asarray(T_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=2e-3)


def test_sharded_ba_converges(rng, mesh):
    prob, T_true, pts_true, _ = make_ba_problem(rng, C=6, P=128, O=8, noise=0.1)
    for _ in range(8):
        T, p = sharded_ba_step(mesh, CAM, prob, lam=1e-4)
        prob = prob._replace(T_cw=T, p_w=p)
    cost, _, _ = ba_cost_and_chi2(
        CAM, prob.T_cw, prob.p_w, prob, prob.obs_valid, jnp.asarray(False)
    )
    assert np.abs(np.asarray(T)[:, :3, 3] - T_true[:, :3, 3]).max() < 1e-2


def test_sharded_retrieval_matches_dense(rng, mesh):
    K = 16  # divisible by 8
    idx = empty_index(K)
    valid = jnp.ones(128, bool)
    descs = [rng.integers(0, 2**32, (128, 8), dtype=np.uint32) for _ in range(K)]
    for k in range(10):  # leave some slots empty
        idx = add_keyframe(idx, k, jnp.asarray(descs[k]), valid)
    q = bow_histogram(jnp.asarray(descs[3]), valid)
    _, dense_scores = score_all(idx, q)
    ids, scores = sharded_topk_scores(mesh, idx, q, k=4)
    ids, scores = np.asarray(ids), np.asarray(scores)
    dense = np.asarray(dense_scores)
    order = np.argsort(-dense)[:4]
    assert set(ids.tolist()) == set(order.tolist())
    assert int(ids[0]) == 3  # self-match is the top hit
    np.testing.assert_allclose(np.sort(scores), np.sort(dense[order]), atol=1e-5)


def test_sharded_pose_step_runs(rng, mesh):
    from ydorbslam_tpu.geometry import se3_exp
    from ydorbslam_tpu.optim.residuals import project_point

    n = 64
    pts = jnp.asarray(
        np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(2, 8, n)], -1
                 ).astype(np.float32))
    T_true = se3_exp(jnp.asarray([0.05, -0.02, 0.1, 0.01, -0.02, 0.005]))
    obs = jax.vmap(lambda p: project_point(CAM, T_true, p)[1])(pts)
    T = jnp.eye(4)
    for _ in range(5):
        T = sharded_pose_step(mesh, CAM, T, pts, obs, jnp.ones(n), jnp.ones(n, bool))
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_true), atol=1e-3)
