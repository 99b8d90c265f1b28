"""Golden tests for the batched pair-gated best2 kernel
(ops.pallas_kernels.pair_best2_pallas) against the dense XLA
formulation it replaces in the mapping hot path (slam/triangulate.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ydorbslam_tpu.ops.hamming import INVALID_DIST, masked_distance_matrix
from ydorbslam_tpu.ops.pallas_kernels import pair_best2_pallas

B, M, N = 3, 256, 128


def _rand_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, size=(n, 8), dtype=np.uint64).astype(np.uint32))


def _dense_best2(desc_a, desc_b, gate):
    d = masked_distance_matrix(
        desc_a, desc_b, jnp.ones(desc_a.shape[0], bool),
        jnp.ones(desc_b.shape[0], bool), gate,
    )
    vals, idxs = jax.lax.top_k(-d, 2)
    b1, b2 = -vals[:, 0], -vals[:, 1]
    idx = jnp.where(b1 < INVALID_DIST, idxs[:, 0], -1)
    return idx, b1, b2


def _check(idx_k, b1_k, b2_k, idx_d, b1_d, b2_d):
    b1_k = np.asarray(b1_k)
    b1_d = np.asarray(jnp.minimum(b1_d, 10_000))
    b2_d = np.asarray(jnp.minimum(b2_d, 10_000))
    np.testing.assert_array_equal(b1_k, b1_d)
    np.testing.assert_array_equal(np.asarray(b2_k), b2_d)
    # argmin ties can differ only between equal distances; require the
    # kernel's pick to achieve the same distance (checked above) and to
    # agree exactly where the best is unique.
    unique = b1_d < b2_d
    np.testing.assert_array_equal(
        np.asarray(idx_k)[unique], np.asarray(idx_d)[unique]
    )
    assert np.all((np.asarray(idx_k) >= 0) == (b1_d < 10_000))


def test_pair_best2_proj_matches_dense():
    rng = np.random.default_rng(0)
    desc_a = jnp.stack([_rand_desc(rng, M) for _ in range(B)])
    desc_b = jnp.stack([_rand_desc(rng, N) for _ in range(B)])
    au = jnp.asarray(rng.uniform(0, 640, (B, M)), jnp.float32)
    av = jnp.asarray(rng.uniform(0, 480, (B, M)), jnp.float32)
    rad = jnp.asarray(rng.uniform(30, 300, (B, M)), jnp.float32)
    alo = jnp.asarray(rng.integers(-1, 3, (B, M)), jnp.float32)
    ahi = alo + jnp.asarray(rng.integers(0, 3, (B, M)), jnp.float32)
    avalid = jnp.asarray(rng.random((B, M)) > 0.2)
    bu = jnp.asarray(rng.uniform(0, 640, (B, N)), jnp.float32)
    bv = jnp.asarray(rng.uniform(0, 480, (B, N)), jnp.float32)
    boct = jnp.asarray(rng.integers(0, 4, (B, N)), jnp.float32)
    bvalid = jnp.asarray(rng.random((B, N)) > 0.2)
    z = jnp.zeros((B, M), jnp.float32)
    zb = jnp.zeros((B, N), jnp.float32)
    attr_a = jnp.stack(
        [au, av, z, rad, rad, alo, ahi, avalid.astype(jnp.float32)], -1
    )
    attr_b = jnp.stack(
        [bu, bv, zb, boct, bvalid.astype(jnp.float32), zb, zb, zb], -1
    )
    idx, b1, b2 = pair_best2_pallas(desc_a, attr_a, desc_b, attr_b, mode="proj")
    for p in range(B):
        gate = (
            avalid[p][:, None] & bvalid[p][None, :]
            & (boct[p][None, :] >= alo[p][:, None])
            & (boct[p][None, :] <= ahi[p][:, None])
            & (jnp.abs(bu[p][None, :] - au[p][:, None]) <= rad[p][:, None])
            & (jnp.abs(bv[p][None, :] - av[p][:, None]) <= rad[p][:, None])
        )
        idx_d, b1_d, b2_d = _dense_best2(desc_a[p], desc_b[p], gate)
        _check(idx[p], b1[p], b2[p], idx_d, b1_d, b2_d)


def test_pair_best2_epi_matches_dense():
    rng = np.random.default_rng(1)
    desc_a = jnp.stack([_rand_desc(rng, M) for _ in range(B)])
    desc_b = jnp.stack([_rand_desc(rng, N) for _ in range(B)])
    la = jnp.asarray(rng.normal(0, 1, (B, M)), jnp.float32)
    lb = jnp.asarray(rng.normal(0, 1, (B, M)), jnp.float32)
    lc = jnp.asarray(rng.normal(0, 100, (B, M)), jnp.float32)
    den2 = la * la + lb * lb
    thr = 3.84 * jnp.maximum(den2, 1e-18)
    aoct = jnp.asarray(rng.integers(0, 4, (B, M)), jnp.float32)
    avalid = jnp.asarray(rng.random((B, M)) > 0.2)
    bu = jnp.asarray(rng.uniform(0, 640, (B, N)), jnp.float32)
    bv = jnp.asarray(rng.uniform(0, 480, (B, N)), jnp.float32)
    boct = jnp.asarray(rng.integers(0, 4, (B, N)), jnp.float32)
    bs2 = 1.44 ** boct * 1e4  # wide sigma2 so some pairs pass
    bvalid = jnp.asarray(rng.random((B, N)) > 0.2)
    z = jnp.zeros((B, M), jnp.float32)
    zb = jnp.zeros((B, N), jnp.float32)
    attr_a = jnp.stack(
        [la, lb, lc, thr, aoct, avalid.astype(jnp.float32), z, z], -1
    )
    attr_b = jnp.stack(
        [bu, bv, bs2, boct, bvalid.astype(jnp.float32), zb, zb, zb], -1
    )
    idx, b1, b2 = pair_best2_pallas(desc_a, attr_a, desc_b, attr_b, mode="epi")
    any_gated = 0
    for p in range(B):
        num = la[p][:, None] * bu[p][None, :] + lb[p][:, None] * bv[p][None, :] + lc[p][:, None]
        gate = (
            avalid[p][:, None] & bvalid[p][None, :]
            & (jnp.abs(boct[p][None, :] - aoct[p][:, None]) <= 1.0)
            & (num * num < thr[p][:, None] * bs2[p][None, :])
        )
        any_gated += int(jnp.sum(gate))
        idx_d, b1_d, b2_d = _dense_best2(desc_a[p], desc_b[p], gate)
        _check(idx[p], b1[p], b2[p], idx_d, b1_d, b2_d)
    assert any_gated > 100  # the test actually exercises passing gates


# ---------------------------------------------------------------------
# End-to-end parity: the Pallas mapping-search path (kernel, interpret
# mode on CPU) must produce EXACTLY the map updates of the dense path
# on a real map built by a short synthetic run.
# ---------------------------------------------------------------------


def _small_system(rng):
    from synthetic import SyntheticRgbdSequence

    from ydorbslam_tpu.config import (
        CameraConfig, CapacityConfig, DepthConfig, OrbConfig, SlamConfig,
        TrackingConfig,
    )
    from ydorbslam_tpu.slam.system import SlamSystem, Sensor

    cfg = SlamConfig(
        camera=CameraConfig(
            fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0,
            width=640, height=480, fps=30.0,
        ),
        orb=OrbConfig(n_features=256),
        depth=DepthConfig(th_depth=100.0),
        tracking=TrackingConfig(
            kf_close_tracked_max=10_000, kf_close_untracked_min=3,
            min_matches_local_map=20, min_init_depth_points=80,
        ),
        capacity=CapacityConfig(
            max_keypoints=256, max_keyframes=16, max_map_points=2048,
            max_obs_per_point=12, local_ba_window_kf=8, local_ba_fixed_kf=4,
            local_ba_max_points=1024, tracking_points=1024,
        ),
    )
    seq = SyntheticRgbdSequence(rng, n_frames=10, n_landmarks=400)
    sys_ = SlamSystem(cfg, Sensor.RGBD, enable_loop_closing=False)
    for i in range(len(seq)):
        t, g, d = seq.frame(i)
        sys_.track_rgbd(t, g, d)
    assert sys_.n_keyframes >= 2
    return sys_


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_mapping_searches_pallas_path_matches_dense(monkeypatch):
    from ydorbslam_tpu.slam import triangulate as tri

    rng = np.random.default_rng(7)
    sys_ = _small_system(rng)
    m = sys_.map
    kf = jnp.int32(sys_.ref_kf)
    w = m.covis[kf] * m.kf_valid.astype(jnp.int32)
    nvals, nids = jax.lax.top_k(w, 4)
    nok = nvals > 0
    assert int(jnp.sum(nok)) >= 1
    cam = sys_.cam
    sf, nl = sys_.cfg.orb.scale_factor, sys_.cfg.orb.n_levels

    m_dense = tri.triangulate_neighbors_batch(
        m, kf, nids, nok, jnp.int32(sys_.n_keyframes), cam, sf, nl
    )
    monkeypatch.setattr(tri, "_use_pallas_matchers", lambda: True)
    m_pallas = tri.triangulate_neighbors_batch(
        m, kf, nids, nok, jnp.int32(sys_.n_keyframes), cam, sf, nl
    )
    _trees_equal(m_dense, m_pallas)
    n_new = int(jnp.sum(m_pallas.mp_valid)) - int(jnp.sum(m.mp_valid))
    assert n_new >= 0

    monkeypatch.setattr(tri, "_use_pallas_matchers", lambda: False)
    f_dense = tri.fuse_neighbors_batch(m_dense, kf, nids, nok, cam, sf, nl)
    monkeypatch.setattr(tri, "_use_pallas_matchers", lambda: True)
    f_pallas = tri.fuse_neighbors_batch(m_dense, kf, nids, nok, cam, sf, nl)
    _trees_equal(f_dense, f_pallas)
