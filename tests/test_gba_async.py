"""Asynchronous (tracking-overlapped) global BA: merge semantics.

The reference runs global BA on a transient thread and, when it
finishes, propagates the result to keyframes/points created meanwhile
via the spanning tree (/root/reference/src/loopClosing.cpp:334,
377-445).  Here the BA runs as LM chunks interleaved with frame-batch
drains (loop_impl.tick) and `_merge_gba` is the post-BA propagation:

  * keyframes that existed at BA start take their optimized pose,
  * keyframes minted DURING the BA chain off their spanning-tree
    parent: T_child<-w = T_child<-parent_old @ T_parent_old^-1 @
    T_parent_new,
  * a slot culled + re-minted during the window (frame-id changed) is
    treated as new, never overwritten with the stale optimum,
  * BA points write back directly; all other live points follow their
    reference keyframe's correction (loopClosing.cpp:419-436).
"""
import jax.numpy as jnp
import numpy as np

from ydorbslam_tpu.slam.loop_impl import _merge_gba
from ydorbslam_tpu.slam.map_state import empty_map


def se3(x=0.0, y=0.0, z=0.0, yaw=0.0):
    T = np.eye(4, dtype=np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    T[0, 0], T[0, 1], T[1, 0], T[1, 1] = c, -s, s, c
    T[:3, 3] = [x, y, z]
    return T


def _base_map():
    K, N, M, O = 8, 4, 16, 4
    m = empty_map(K, N, M, O)
    # KFs 0,1,2 existed at BA start (chain 0<-1<-2); KF 3 was inserted
    # during the BA window with parent 2.
    kf_pose = np.stack(
        [se3(0), se3(0, 1), se3(0, 2), se3(0, 3)] + [np.eye(4, dtype=np.float32)] * (K - 4)
    )
    kf_valid = np.zeros(K, bool)
    kf_valid[:4] = True
    parent = np.full(K, -1, np.int32)
    parent[1], parent[2], parent[3] = 0, 1, 2
    fid = np.arange(K, dtype=np.int32)
    mp_pos = np.zeros((M, 3), np.float32)
    mp_pos[0] = [1.0, 0.0, 4.0]
    mp_pos[1] = [2.0, 0.0, 4.0]
    mp_valid = np.zeros(M, bool)
    mp_valid[:2] = True
    ref = np.full(M, -1, np.int32)
    ref[0], ref[1] = 0, 3  # pt1's reference KF is the mid-BA keyframe
    first = np.zeros(M, np.int32)
    first[1] = 5  # created during the BA window (>= kf_count_start)
    return m._replace(
        kf_pose=jnp.asarray(kf_pose), kf_valid=jnp.asarray(kf_valid),
        parent=jnp.asarray(parent), kf_frame_id=jnp.asarray(fid),
        mp_pos=jnp.asarray(mp_pos), mp_valid=jnp.asarray(mp_valid),
        mp_ref_kf=jnp.asarray(ref), mp_first_kf=jnp.asarray(first),
    )


def _gba_result(m, delta):
    """BA moved every start-time pose by a left delta."""
    K = m.K
    T_new = np.einsum("ij,kjl->kil", delta, np.asarray(m.kf_pose))
    valid0 = np.zeros(K, bool)
    valid0[:3] = True
    pts = np.array([0, -1], np.int32)
    p_new = np.array([[1.5, 0.0, 4.0], [0.0, 0.0, 0.0]], np.float32)
    return (
        jnp.asarray(T_new.astype(np.float32)), jnp.asarray(p_new),
        jnp.asarray(pts), jnp.asarray(valid0),
    )


def test_merge_applies_ba_and_chains_mid_ba_keyframes():
    m = _base_map()
    delta = se3(0.5, yaw=0.2)
    T_new, p_new, pts, valid0 = _gba_result(m, delta)
    T_old = np.asarray(m.kf_pose).copy()
    out = _merge_gba(m, T_new, p_new, pts, valid0, m.kf_frame_id, jnp.int32(3))
    pose = np.asarray(out.kf_pose)
    # In-BA keyframes take the optimized pose directly.
    for k in range(3):
        np.testing.assert_allclose(pose[k], np.asarray(T_new)[k], atol=1e-5)
    # The mid-BA keyframe chains off its parent's correction.
    expect3 = T_old[3] @ np.linalg.inv(T_old[2]) @ np.asarray(T_new)[2]
    np.testing.assert_allclose(pose[3], expect3, atol=1e-5)
    # BA point writes back directly.
    np.testing.assert_allclose(np.asarray(out.mp_pos)[0], [1.5, 0, 4], atol=1e-5)
    # Mid-BA point follows its reference keyframe's correction.
    p_cam = T_old[3, :3, :3] @ np.array([2.0, 0, 4]) + T_old[3, :3, 3]
    expect_p1 = np.linalg.inv(expect3)[:3, :3] @ p_cam + np.linalg.inv(expect3)[:3, 3]
    np.testing.assert_allclose(np.asarray(out.mp_pos)[1], expect_p1, atol=1e-5)


def test_merge_guards_reused_slots():
    """A keyframe slot culled + re-minted during the BA window must NOT
    take the stale optimized pose — it chains like a new keyframe."""
    m = _base_map()
    # Slot 1 was re-minted during the BA: frame id moved, parent now 0.
    fid_now = np.asarray(m.kf_frame_id).copy()
    fid_now[1] = 42
    m = m._replace(kf_frame_id=jnp.asarray(fid_now))
    delta = se3(0.5, yaw=0.2)
    T_new, p_new, pts, valid0 = _gba_result(m, delta)
    T_old = np.asarray(m.kf_pose).copy()
    fid0 = np.arange(m.K, dtype=np.int32)  # snapshot from BA start
    out = _merge_gba(
        m, T_new, p_new, pts, valid0, jnp.asarray(fid0), jnp.int32(3)
    )
    pose = np.asarray(out.kf_pose)
    np.testing.assert_allclose(pose[0], np.asarray(T_new)[0], atol=1e-5)
    # Re-minted slot 1 chains off parent 0 instead of taking T_new[1].
    expect1 = T_old[1] @ np.linalg.inv(T_old[0]) @ np.asarray(T_new)[0]
    np.testing.assert_allclose(pose[1], expect1, atol=1e-5)
    assert not np.allclose(pose[1], np.asarray(T_new)[1])


def test_in_flight_gba_merges_keyframes_inserted_meanwhile(rng):
    """Integration: close a real loop (arming the interleaved global
    BA), insert a NEW keyframe while the BA is in flight, tick the BA to
    completion, and assert the new keyframe was merged — its pose moved
    with its spanning-tree parent instead of being left in the
    pre-correction frame (loopClosing.cpp:377-445)."""
    import test_loop_closing as tlc

    cfg = tlc.make_cfg()
    from ydorbslam_tpu.slam.system import SlamSystem, Sensor

    sys = SlamSystem(cfg, Sensor.RGBD, enable_mapping=True,
                     enable_loop_closing=True)
    lms_a = np.stack(
        [rng.uniform(-3, 3, 200), rng.uniform(-2, 2, 200),
         rng.uniform(3, 7, 200)], -1)
    lms_b = lms_a + np.array([40.0, 0.0, 0.0])
    desc_a = rng.integers(0, 2**32, (200, 8), dtype=np.uint32)
    desc_b = rng.integers(0, 2**32, (200, 8), dtype=np.uint32)

    def pose(x):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [-x, 0.0, 0.0]
        return T

    def insert(lms, descs, T, lm2mp):
        feats = tlc.fake_features(rng, lms, descs, np.asarray(T))
        matched = -np.ones(tlc.N_KP, np.int32)
        if lm2mp is not None:
            matched[: len(lms)] = lm2mp
        slot = sys._alloc_kf_slot()
        sys._insert_keyframe(0.0, feats, jnp.asarray(T), jnp.asarray(matched))
        return slot, np.asarray(sys.map.kf_mp[slot])[: len(lms)]

    lm2mp_a = lm2mp_b = None
    for i in range(3):
        _, lm2mp_a = insert(lms_a, desc_a, pose(0.05 * i), lm2mp_a)
    for i in range(6):
        _, lm2mp_b = insert(lms_b, desc_b, pose(40.0 + 0.05 * i), lm2mp_b)

    from test_retrieval_recall import flip_bits

    revisit_true = pose(0.1)
    revisit_drifted = revisit_true.copy()
    revisit_drifted[:3, 3] -= np.array([0.3, 0.0, 0.0])
    for i in range(2):
        feats = tlc.fake_features(rng, lms_a, flip_bits(rng, desc_a, 0.08),
                                  revisit_true)
        sys._alloc_kf_slot()
        sys._insert_keyframe(0.0, feats, jnp.asarray(revisit_drifted),
                             -jnp.ones((tlc.N_KP,), np.int32))

    impl = sys.loop_closer._impl
    # Poll the pending detection WITHOUT flushing: correction + essential
    # graph run synchronously, the global BA is armed but NOT run.
    closed = impl._poll_pending()
    assert closed and sys.loop_closer.n_loops_closed >= 1
    assert impl._gba is not None, "global BA should be in flight"
    assert sys.stats.global_ba_runs == 1

    # Insert a keyframe WHILE the BA is in flight (continuing from the
    # corrected revisit pose).
    mid_T = np.asarray(sys.map.kf_pose[sys.ref_kf]) @ np.linalg.inv(pose(0.0)) @ pose(0.05)
    mid_slot, _ = insert(lms_a, flip_bits(rng, desc_a, 0.08),
                         mid_T.astype(np.float32), None)
    parent = int(np.asarray(sys.map.parent)[mid_slot])
    T_parent_before = np.asarray(sys.map.kf_pose[parent])
    T_mid_before = np.asarray(sys.map.kf_pose[mid_slot])
    rel_before = T_mid_before @ np.linalg.inv(T_parent_before)

    while impl._gba is not None:
        impl.tick()

    T_parent_after = np.asarray(sys.map.kf_pose[parent])
    T_mid_after = np.asarray(sys.map.kf_pose[mid_slot])
    rel_after = T_mid_after @ np.linalg.inv(T_parent_after)
    # The mid-BA keyframe followed its parent: the relative pose is
    # preserved through the merge.
    np.testing.assert_allclose(rel_after, rel_before, atol=1e-4)


import pytest  # noqa: E402

# The integration test drives the full loop pipeline: minutes on CPU.
test_in_flight_gba_merges_keyframes_inserted_meanwhile = pytest.mark.slow(
    test_in_flight_gba_merges_keyframes_inserted_meanwhile
)
