"""Found/visible counters drive the 0.25 found-ratio cull in PIPELINED
mode (localMapping.cpp:90-108; increaseVisible tracking.cpp:570-604).

Round-2 gap: the counters were bumped only by the synchronous tracking
hook, so in the production pipelined path the ratio rule could never
fire.  The device step now accumulates per-tracking-set-row counters
(pipeline._track_core) which the host folds into the map before every
tracking-set refresh (system._refresh_trkset).

The decoy points injected here sit squarely in every frame's frustum
(visible grows) but render no pixels (never matched -> found stays at
its creation value of 1), and carry 4 fabricated observations so
neither obs-count cull rule can claim them — only the ratio rule can.
"""
import numpy as np
import jax.numpy as jnp

from synthetic import SyntheticRgbdSequence
from test_slam_system import small_cfg

from ydorbslam_tpu.slam.system import SlamSystem, Sensor

N_DECOY = 12


def _inject_decoys(sys_, rng):
    """Place decoy map points in front of the camera, bound to existing
    keyframes through PADDING keypoint columns (indices beyond the
    feature budget are never bound by real tracking, so cull-time
    binding clearance cannot damage real associations)."""
    m = sys_.map
    M = m.M
    mp_valid = np.asarray(m.mp_valid)
    free = np.flatnonzero(~mp_valid)[:N_DECOY]
    assert len(free) == N_DECOY
    kf_valid = np.flatnonzero(np.asarray(m.kf_valid))[:4]
    assert len(kf_valid) == 4
    N = m.kf_mp.shape[1]
    pad_cols = np.arange(N - N_DECOY, N)  # beyond the n_features budget

    # Tight central cluster: stays inside every frame's frustum and
    # scale band for the whole sequence.
    pos = np.stack([
        rng.uniform(-0.2, 0.2, N_DECOY),
        rng.uniform(-0.15, 0.15, N_DECOY),
        rng.uniform(2.8, 3.3, N_DECOY),
    ], -1).astype(np.float32)
    normal = pos / np.linalg.norm(pos, axis=-1, keepdims=True)
    desc = rng.integers(0, 2**32, (N_DECOY, 8), dtype=np.uint32)

    fr = jnp.asarray(free)
    m = m._replace(
        mp_valid=m.mp_valid.at[fr].set(True),
        mp_pos=m.mp_pos.at[fr].set(jnp.asarray(pos)),
        mp_desc=m.mp_desc.at[fr].set(jnp.asarray(desc)),
        mp_normal=m.mp_normal.at[fr].set(jnp.asarray(normal)),
        mp_max_dist=m.mp_max_dist.at[fr].set(50.0),
        mp_min_dist=m.mp_min_dist.at[fr].set(0.1),
        mp_found=m.mp_found.at[fr].set(1),
        mp_visible=m.mp_visible.at[fr].set(1),
        mp_first_kf=m.mp_first_kf.at[fr].set(jnp.int32(sys_.n_keyframes)),
        mp_ref_kf=m.mp_ref_kf.at[fr].set(jnp.int32(kf_valid[0])),
    )
    # 4 observations each (> both obs-rule thresholds) at padding kp
    # columns of 4 real keyframes, with matching kf_mp bindings so the
    # obs<->binding invariant holds for cull-time clearance.  The
    # padding columns get CONSISTENT projected uv (and the decoy's
    # descriptor) so local BA and refresh_points see coherent
    # observations and leave position/normal/band intact.
    okf = m.mp_obs_kf
    okp = m.mp_obs_kp
    kf_mp = m.kf_mp
    kf_uv = m.kf_uv
    kf_right_u = m.kf_right_u
    kf_depth = m.kf_depth
    kf_desc = m.kf_desc
    kf_octave = m.kf_octave
    pc = jnp.asarray(pad_cols)
    cam = sys_.cam
    for j, kf in enumerate(kf_valid):
        okf = okf.at[fr, j].set(jnp.int32(kf))
        okp = okp.at[fr, j].set(pc.astype(jnp.int32))
        kf_mp = kf_mp.at[kf, pc].set(fr.astype(jnp.int32))
        T = np.asarray(m.kf_pose[kf])
        p_c = pos @ T[:3, :3].T + T[:3, 3]
        u = cam.fx * p_c[:, 0] / p_c[:, 2] + cam.cx
        v = cam.fy * p_c[:, 1] / p_c[:, 2] + cam.cy
        kf_uv = kf_uv.at[kf, pc].set(jnp.asarray(np.stack([u, v], -1)))
        # STEREO observations: mono-only views from nearly identical
        # poses leave depth unobservable and local BA flings the decoy
        # down its ray; the virtual right-x pins it.
        kf_right_u = kf_right_u.at[kf, pc].set(
            jnp.asarray((u - cam.bf / p_c[:, 2]).astype(np.float32)))
        kf_depth = kf_depth.at[kf, pc].set(
            jnp.asarray(p_c[:, 2].astype(np.float32)))
        kf_desc = kf_desc.at[kf, pc].set(jnp.asarray(desc))
        kf_octave = kf_octave.at[kf, pc].set(3)  # band headroom
    sys_.map = m._replace(
        mp_obs_kf=okf, mp_obs_kp=okp, kf_mp=kf_mp, kf_uv=kf_uv,
        kf_right_u=kf_right_u, kf_depth=kf_depth,
        kf_desc=kf_desc, kf_octave=kf_octave,
    )
    return free


def test_pipelined_found_ratio_cull(rng):
    seq = SyntheticRgbdSequence(rng, n_frames=40, n_landmarks=600)
    sys_ = SlamSystem(small_cfg(), Sensor.RGBD, enable_loop_closing=False)
    sys_.enable_pipelined(lag=3)
    for i in range(20):
        t, g, d = seq.frame(i)
        sys_.track_rgbd_pipelined(t, g, d)
    sys_.flush_pipeline()
    assert sys_.n_keyframes >= 4

    decoys = _inject_decoys(sys_, np.random.default_rng(3))
    gen0 = np.asarray(sys_.map.mp_first_kf)[decoys].copy()
    sys_._refresh_trkset()  # pull decoys into the tracking set
    assert bool(np.isin(decoys, np.asarray(sys_._trkset.pts)).all()), (
        "decoys must enter the tracking set to accumulate visibility"
    )

    kfs_before = sys_.n_keyframes
    for i in range(20, 40):
        t, g, d = seq.frame(i)
        sys_.track_rgbd_pipelined(t, g, d)
    sys_.shutdown()
    assert sys_.n_keyframes > kfs_before, "scene must mint keyframes"

    # A decoy was culled iff its slot is now invalid OR was RECYCLED for
    # a newly-created point (creation overwrites mp_first_kf, so a
    # generation change proves the slot passed through the free list).
    valid = np.asarray(sys_.map.mp_valid)[decoys]
    gen1 = np.asarray(sys_.map.mp_first_kf)[decoys]
    culled = (~valid) | (gen1 != gen0)
    assert culled.all(), (
        f"found-ratio cull missed decoys: culled={culled} "
        f"gen0={gen0} gen1={gen1} valid={valid}"
    )
    # Sanity: the map itself survives (real points not collateral).
    assert int(np.asarray(sys_.map.mp_valid).sum()) > 100


# Full-pipeline run: minutes on CPU; deselect via -m "not slow".
import pytest  # noqa: E402

pytestmark = pytest.mark.slow
