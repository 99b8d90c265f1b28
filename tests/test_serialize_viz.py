"""Map checkpoint/restore + headless rendering + localization-only reuse."""
import numpy as np

from synthetic import SyntheticRgbdSequence
from test_slam_system import small_cfg

from ydorbslam_tpu.slam.serialize import load_map, save_map
from ydorbslam_tpu.slam.system import SlamSystem, Sensor
from ydorbslam_tpu.viz.headless import render_map_topdown, render_tracked_frame


def test_map_checkpoint_roundtrip(rng, tmp_path):
    seq = SyntheticRgbdSequence(rng, n_frames=6, n_landmarks=400)
    sys = SlamSystem(small_cfg(), Sensor.RGBD, enable_loop_closing=False)
    for i in range(len(seq)):
        t, g, d = seq.frame(i)
        sys.track_rgbd(t, g, d)
    path = str(tmp_path / "map.npz")
    save_map(sys.map, path)
    m2 = load_map(path)
    for f in sys.map._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(sys.map, f)), np.asarray(getattr(m2, f)), err_msg=f
        )

    # A fresh system can localize against the restored map.
    sys2 = SlamSystem(small_cfg(), Sensor.RGBD, enable_loop_closing=False)
    sys2.map = m2
    sys2.n_keyframes = int(np.asarray(m2.kf_valid).sum())
    from ydorbslam_tpu.slam.retrieval import add_keyframe

    for k in np.where(np.asarray(m2.kf_valid))[0]:
        sys2.retrieval = add_keyframe(
            sys2.retrieval, int(k), m2.kf_desc[int(k)], m2.kf_kp_valid[int(k)]
        )
    sys2.activate_localization_mode()
    t, g, d = seq.frame(3)
    feats = sys2.tracker._extract(g)
    from ydorbslam_tpu.ops.stereo import fill_depth_from_rgbd
    import jax.numpy as jnp

    feats = fill_depth_from_rgbd(feats, jnp.asarray(d), sys2.cam)
    ok = sys2._relocalize(sys2.tracker, t, feats)
    assert ok, "relocalization against restored map failed"
    T = np.asarray(sys2.tracker.T_cw)
    c = -T[:3, :3].T @ T[:3, 3]
    # Compare against the MAP's own pose for the same frame (the map
    # carries a small BA gauge offset vs raw ground truth; reloc must be
    # consistent with the map it localized against).
    fid = np.asarray(m2.kf_frame_id)
    kf_same = int(np.where(fid == 3)[0][0]) if (fid == 3).any() else None
    if kf_same is not None:
        Tm = np.asarray(m2.kf_pose[kf_same])
        cm = -Tm[:3, :3].T @ Tm[:3, 3]
        assert np.linalg.norm(c - cm) < 0.05
    else:
        gt = seq.poses[3]
        c_gt = -gt[:3, :3].T @ gt[:3, 3]
        assert np.linalg.norm(c - c_gt) < 0.3


def test_headless_renders(rng, tmp_path):
    seq = SyntheticRgbdSequence(rng, n_frames=5, n_landmarks=400)
    sys = SlamSystem(small_cfg(), Sensor.RGBD, enable_loop_closing=False)
    for i in range(len(seq)):
        t, g, d = seq.frame(i)
        sys.track_rgbd(t, g, d)
    out = str(tmp_path / "map.png")
    render_map_topdown(sys.map, out)
    from PIL import Image

    img = Image.open(out)
    assert img.size == (1024, 1024)
    # Frame render
    t, g, d = seq.frame(4)
    uv = np.asarray(sys.tracker.last_feats.uv)
    ok = np.asarray(sys.tracker.last_feats.valid)
    out2 = str(tmp_path / "frame.png")
    render_tracked_frame(g, uv[ok][:100], np.ones(min(100, ok.sum()), bool), out2,
                         "OK | inliers 123")
    assert Image.open(out2).size == (640, 480)
