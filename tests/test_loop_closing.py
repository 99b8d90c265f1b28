"""Loop-closing integration: detection + Sim3 + correction on a
hand-built map with a drifted revisit.

Scenario: keyframes 0-2 observe place A, keyframes 3-8 observe place B
(disjoint landmarks), keyframes 9-10 revisit place A with an injected
0.3 m pose drift.  The closer must detect the revisit against the
place-A keyframes, estimate the drift as a Sim3, and correct the
revisit keyframe's pose.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from ydorbslam_tpu.config import CapacityConfig, CameraConfig, LoopConfig, OrbConfig, SlamConfig, TrackingConfig
from ydorbslam_tpu.ops.extractor import FrameFeatures
from ydorbslam_tpu.slam.system import SlamSystem, Sensor

N_KP = 256


def make_cfg():
    return SlamConfig(
        tracking=TrackingConfig(min_init_depth_points=100),
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0,
                            width=640, height=480),
        orb=OrbConfig(n_features=N_KP),
        loop=LoopConfig(min_kfs_between_loops=4, covisibility_consistency_th=1,
                        min_total_matches=30,
                        # hand-built map: keyframes never advance the
                        # system frame counter, so the temporal
                        # wrong-pair gate must be off
                        min_frame_gap=0),
        capacity=CapacityConfig(
            max_keypoints=N_KP, max_keyframes=16, max_map_points=4096,
            max_obs_per_point=12, local_ba_window_kf=8, local_ba_fixed_kf=4,
            local_ba_max_points=1024, tracking_points=1024,
        ),
    )


def project(K, T, pts):
    pc = pts @ T[:3, :3].T + T[:3, 3]
    z = pc[:, 2]
    return np.stack([500 * pc[:, 0] / z + 320, 500 * pc[:, 1] / z + 240], -1), z


def fake_features(rng, lms, descs, T_cw):
    """Build FrameFeatures observing `lms` (landmark array) from T_cw."""
    uv, z = project(None, T_cw, lms)
    ok = (z > 0.3) & (uv[:, 0] > 20) & (uv[:, 0] < 620) & (uv[:, 1] > 20) & (uv[:, 1] < 460)
    n = len(lms)
    pad = N_KP - n
    uvp = np.pad(uv, ((0, pad), (0, 0))).astype(np.float32)
    return FrameFeatures(
        uv=jnp.asarray(uvp),
        uv_raw=jnp.asarray(uvp),
        response=jnp.ones((N_KP,), jnp.float32),
        octave=jnp.zeros((N_KP,), jnp.int32),
        angle=jnp.zeros((N_KP,), jnp.float32),
        desc=jnp.asarray(np.pad(descs, ((0, pad), (0, 0)))),
        right_u=jnp.asarray(np.pad(uv[:, 0] - 50.0 / z, (0, pad)).astype(np.float32)),
        depth=jnp.asarray(np.pad(z, (0, pad), constant_values=-1).astype(np.float32)),
        valid=jnp.asarray(np.pad(ok, (0, pad))),
    )


def test_loop_detection_and_correction(rng):
    cfg = make_cfg()
    sys = SlamSystem(cfg, Sensor.RGBD, enable_mapping=True, enable_loop_closing=True)

    lms_a = np.stack(
        [rng.uniform(-3, 3, 200), rng.uniform(-2, 2, 200), rng.uniform(3, 7, 200)], -1
    )
    lms_b = lms_a + np.array([40.0, 0.0, 0.0])
    desc_a = rng.integers(0, 2**32, (200, 8), dtype=np.uint32)
    desc_b = rng.integers(0, 2**32, (200, 8), dtype=np.uint32)

    def pose(x, y=0.0, z=0.0):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [-x, -y, -z]  # T_cw: camera at (x,y,z) looking +z
        return T

    lm2mp_a = None
    lm2mp_b = None

    def insert(lms, descs, T, lm2mp):
        feats = fake_features(rng, lms, descs, np.asarray(T))
        matched = -np.ones(N_KP, np.int32)
        if lm2mp is not None:
            matched[: len(lms)] = lm2mp
        slot = sys._alloc_kf_slot()
        sys._insert_keyframe(0.0, feats, jnp.asarray(T), jnp.asarray(matched))
        row = np.asarray(sys.map.kf_mp[slot])[: len(lms)]
        return slot, row

    # Place A (3 keyframes, small lateral motion).
    for i in range(3):
        slot, lm2mp_a = insert(lms_a, desc_a, pose(0.05 * i), lm2mp_a)
    # Place B (6 keyframes).
    for i in range(6):
        slot, lm2mp_b = insert(lms_b, desc_b, pose(40.0 + 0.05 * i), lm2mp_b)
    assert sys.loop_closer.n_loops_closed == 0

    # Revisit place A with a drifted pose estimate (true pose = origin-ish,
    # estimated pose off by 0.3m in x): the KF's fresh points duplicate
    # place A's landmarks at shifted positions.
    drift = np.array([0.3, 0.0, 0.0])
    revisit_true = pose(0.1)
    revisit_drifted = revisit_true.copy()
    revisit_drifted[:3, 3] -= drift  # camera believed at x+0.3
    # Features are what the camera ACTUALLY sees (true pose), pose is drifted.
    feats_lms = lms_a.copy()
    # The revisit does NOT see byte-identical descriptors: viewpoint and
    # lighting change flips BRIEF bits (matching ORB pairs differ by
    # 20-60/256 bits).  Each revisit frame gets its OWN independent 8%
    # bit flips — identical copies would also give the two revisit
    # frames a mutual BoW score of 1.0, inflating the min-covisible-
    # score gate (loopClosing.cpp:51-59) past every real candidate.
    # (See docs/RETRIEVAL_RECALL.md for the recall study.)
    from test_retrieval_recall import flip_bits

    slots = []
    for i in range(2):
        feats = fake_features(rng, feats_lms, flip_bits(rng, desc_a, 0.08),
                              revisit_true)
        slot = sys._alloc_kf_slot()
        sys._insert_keyframe(0.0, feats, jnp.asarray(revisit_drifted),
                             -jnp.ones((N_KP,), jnp.int32))
        slots.append(slot)
    sys.loop_closer.flush()  # verify the async-dispatched detection
    assert sys.loop_closer.n_loops_closed >= 1, "loop not detected"
    # The revisit keyframe pose must be corrected toward the true pose.
    T_corr = np.asarray(sys.map.kf_pose[slots[-1]])
    err_before = np.linalg.norm(revisit_drifted[:3, 3] - revisit_true[:3, 3])
    err_after = np.linalg.norm(T_corr[:3, 3] - revisit_true[:3, 3])
    assert err_after < err_before * 0.5, (err_before, err_after)


# Full-pipeline run: minutes on CPU; deselect via -m "not slow".
import pytest  # noqa: E402

pytestmark = pytest.mark.slow
