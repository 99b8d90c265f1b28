"""Unit tests for the loop-closing building blocks: retrieval, Horn
RANSAC, Sim3 refinement, essential-graph optimization."""
import jax
import jax.numpy as jnp
import numpy as np

from ydorbslam_tpu.geometry import CameraIntrinsics, make_S, se3_exp, so3_exp, split_S
from ydorbslam_tpu.optim.horn import horn_sim3, ransac_sim3
from ydorbslam_tpu.optim.pose_graph import (
    PoseGraphProblem,
    edge_measurement,
    optimize_pose_graph,
)
from ydorbslam_tpu.optim.sim3_opt import optimize_sim3
from ydorbslam_tpu.slam.retrieval import (
    add_keyframe,
    bow_histogram,
    detect_candidates,
    empty_index,
    score_all,
)

CAM = CameraIntrinsics.create(500.0, 500.0, 320.0, 240.0, bf=50.0, width=640, height=480)


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def perturb_desc(rng, desc, bits):
    """Flip `bits` random bits in each descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        for b in rng.choice(256, bits, replace=False):
            out[i, b // 32] ^= np.uint32(1 << (b % 32))
    return out


class TestRetrieval:
    def test_same_place_scores_high(self, rng):
        d0 = rand_desc(rng, 200)
        d_same = perturb_desc(rng, d0, 20)  # ~revisit: descriptors 20 bits off
        d_other = rand_desc(rng, 200)
        idx = empty_index(8)
        valid = jnp.ones(200, bool)
        idx = add_keyframe(idx, 0, jnp.asarray(d0), valid)
        idx = add_keyframe(idx, 1, jnp.asarray(d_other), valid)
        q = bow_histogram(jnp.asarray(d_same), valid)
        common, score = score_all(idx, q)
        assert float(score[0]) > float(score[1]) + 0.1
        assert float(common[0]) > float(common[1]) * 1.5

    def test_detect_candidates_gating(self, rng):
        K = 8
        idx = empty_index(K)
        valid = jnp.ones(150, bool)
        base = rand_desc(rng, 150)
        # kf0..kf2: a connected group (same place); kf5: same place as query
        for k in [0, 1, 2]:
            idx = add_keyframe(idx, k, jnp.asarray(perturb_desc(rng, base, 15)), valid)
        for k in [3, 4, 6]:
            idx = add_keyframe(idx, k, jnp.asarray(rand_desc(rng, 150)), valid)
        idx = add_keyframe(idx, 5, jnp.asarray(perturb_desc(rng, base, 15)), valid)
        q = bow_histogram(jnp.asarray(perturb_desc(rng, base, 10)), valid)
        connected = jnp.zeros(K, bool).at[jnp.asarray([0, 1, 2])].set(True)
        covis = jnp.zeros((K, K), jnp.int32)
        cands, scores = detect_candidates(
            idx, q, connected, covis, jnp.float32(0.0), max_out=4
        )
        cands = np.asarray(cands)
        assert 5 in cands  # the true revisit survives
        assert not any(c in (0, 1, 2) for c in cands if c >= 0)  # connected excluded


class TestHorn:
    def test_exact_alignment(self, rng):
        p2 = jnp.asarray(rng.uniform(-2, 2, (30, 3)).astype(np.float32))
        R = so3_exp(jnp.asarray([0.2, -0.1, 0.3]))
        t = jnp.asarray([0.5, -1.0, 2.0])
        S_true = make_S(jnp.asarray(1.0), R, t)
        p1 = p2 @ S_true[:3, :3].T + S_true[:3, 3]
        S_est = horn_sim3(p1, p2)
        np.testing.assert_allclose(np.asarray(S_est), np.asarray(S_true), atol=1e-4)

    def test_scale_recovery(self, rng):
        p2 = jnp.asarray(rng.uniform(-2, 2, (30, 3)).astype(np.float32))
        R = so3_exp(jnp.asarray([0.1, 0.2, -0.1]))
        S_true = make_S(jnp.asarray(1.6), R, jnp.asarray([0.3, 0.1, -0.2]))
        p1 = p2 @ S_true[:3, :3].T + S_true[:3, 3]  # [:3,:3] already s*R
        S_est = horn_sim3(p1, p2, fix_scale=False)
        s, _, _ = split_S(S_est)
        assert abs(float(s) - 1.6) < 1e-3

    def test_ransac_with_outliers(self, rng):
        n = 80
        # Points in front of both cameras (loop-closure geometry).
        p2 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)],
            -1,
        ).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray([0.05, 0.1, -0.02])))
        t = np.array([0.3, -0.1, 0.4], np.float32)
        p1 = p2 @ R.T + t + rng.normal(0, 0.005, (n, 3)).astype(np.float32)
        out_idx = rng.choice(n, 20, replace=False)
        p1[out_idx] += rng.uniform(1, 3, (20, 3)) * rng.choice([-1, 1], (20, 3))
        res = ransac_sim3(
            jax.random.PRNGKey(0), CAM,
            jnp.asarray(p1), jnp.asarray(p2),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
            n_hypotheses=256, min_inliers=20,
        )
        assert bool(res.ok)
        assert int(res.n_inliers) >= 50
        inl = np.asarray(res.inliers)
        assert not inl[out_idx].any() or inl[out_idx].mean() < 0.1
        S = np.asarray(res.S_12)
        np.testing.assert_allclose(S[:3, 3], t, atol=0.03)


class TestSim3Opt:
    def test_refines_noisy_init(self, rng):
        n = 60
        p2 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)],
            -1,
        ).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray([0.05, 0.08, -0.03])))
        t = np.array([0.2, -0.15, 0.3], np.float32)
        S_true = np.asarray(make_S(jnp.asarray(1.0), jnp.asarray(R), jnp.asarray(t)))
        p1 = (p2 @ R.T + t).astype(np.float32)

        def project(p):
            return np.stack(
                [500.0 * p[:, 0] / p[:, 2] + 320.0, 500.0 * p[:, 1] / p[:, 2] + 240.0],
                -1,
            )

        obs1 = project(p1) + rng.normal(0, 0.3, (n, 2))
        obs2 = project(p2) + rng.normal(0, 0.3, (n, 2))
        S_init = np.asarray(
            make_S(jnp.asarray(1.0), so3_exp(jnp.asarray([0.02, -0.01, 0.01])), jnp.asarray([0.05, 0.05, -0.05]))
        ) @ S_true
        S_ref, inlier, n_in = optimize_sim3(
            CAM, jnp.asarray(S_init.astype(np.float32)),
            jnp.asarray(p1), jnp.asarray(p2),
            jnp.asarray(obs1.astype(np.float32)), jnp.asarray(obs2.astype(np.float32)),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
        )
        assert int(n_in) > 50
        np.testing.assert_allclose(np.asarray(S_ref)[:3, 3], t, atol=0.02)


class TestPoseGraph:
    def test_loop_closure_distributes_drift(self, rng):
        # A chain of 10 keyframes with accumulated drift; a loop edge
        # between first and last carries the TRUE relative pose.
        V = 10
        T_true, T_drift = [np.eye(4)], [np.eye(4)]
        step = np.asarray(se3_exp(jnp.asarray([0.5, 0, 0.02, 0, 0.05, 0])))
        drift = np.asarray(se3_exp(jnp.asarray([0.01, 0.004, 0.01, 0.0, 0.006, 0.0])))
        for i in range(1, V):
            T_true.append(step @ T_true[-1])
            T_drift.append(drift @ step @ T_drift[-1])
        S = jnp.asarray(np.stack(T_drift).astype(np.float32))
        # chain edges measured from the DRIFTED odometry; loop edge exact.
        ei, ej, meas, w = [], [], [], []
        for i in range(V - 1):
            ei.append(i + 1)
            ej.append(i)
            meas.append(
                np.asarray(edge_measurement(jnp.asarray(T_drift[i + 1]), jnp.asarray(T_drift[i])))
            )
            w.append(1.0)
        ei.append(V - 1)
        ej.append(0)
        meas.append(
            np.asarray(edge_measurement(jnp.asarray(T_true[V - 1]), jnp.asarray(T_true[0])))
        )
        w.append(1.0)
        E = len(ei)
        prob = PoseGraphProblem(
            S_iw=S,
            fixed=jnp.zeros(V, bool).at[0].set(True),
            vertex_valid=jnp.ones(V, bool),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_meas=jnp.asarray(np.stack(meas).astype(np.float32)),
            edge_valid=jnp.ones(E, bool),
            edge_weight=jnp.asarray(w),
        )
        S_out = optimize_pose_graph(prob, iters=20, fix_scale=True)
        # End-pose error vs truth must shrink dramatically.
        err_before = np.linalg.norm(T_drift[-1][:3, 3] - T_true[-1][:3, 3])
        err_after = np.linalg.norm(
            np.asarray(S_out)[-1][:3, 3] - T_true[-1][:3, 3]
        )
        assert err_after < err_before * 0.3
        # Fixed vertex untouched.
        np.testing.assert_allclose(np.asarray(S_out)[0], T_drift[0], atol=1e-5)
