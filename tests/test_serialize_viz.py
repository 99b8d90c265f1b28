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


def test_system_checkpoint_resume(rng, tmp_path):
    """Save mid-sequence, reload into a fresh process-equivalent system,
    finish the sequence: trajectory quality must match an uninterrupted
    run (VERDICT: system-level resume, not just map arrays)."""
    import jax.numpy as jnp

    from ydorbslam_tpu.io import ate_rmse, read_tum_trajectory
    from ydorbslam_tpu.slam.serialize import load_system, save_system

    n = 15
    seq = SyntheticRgbdSequence(rng, n_frames=n, n_landmarks=500)

    # Uninterrupted baseline.
    base = SlamSystem(small_cfg(), Sensor.RGBD, enable_loop_closing=False)
    for i in range(n):
        t, g, d = seq.frame(i)
        base.track_rgbd(t, g, d)
    p0 = str(tmp_path / "base.txt")
    base.save_trajectory_tum(p0)
    _, pos0, _ = read_tum_trajectory(p0)

    # Interrupted run: save at frame 8, reload, continue.
    s1 = SlamSystem(small_cfg(), Sensor.RGBD, enable_loop_closing=False)
    for i in range(8):
        t, g, d = seq.frame(i)
        s1.track_rgbd(t, g, d)
    ckpt = str(tmp_path / "ckpt.npz")
    save_system(s1, ckpt)
    nkf_saved = s1.n_keyframes
    del s1

    s2 = load_system(ckpt, small_cfg(), Sensor.RGBD,
                     enable_loop_closing=False)
    assert s2.n_keyframes == nkf_saved
    assert len(s2.records) == 8
    for i in range(8, n):
        t, g, d = seq.frame(i)
        ok = s2.track_rgbd(t, g, d)
        assert ok, f"resumed tracking lost at frame {i}"
    p1 = str(tmp_path / "resumed.txt")
    s2.save_trajectory_tum(p1)
    _, pos1, _ = read_tum_trajectory(p1)
    assert len(pos1) == len(pos0)
    gt = np.stack([-p[:3, :3].T @ p[:3, 3] for p in seq.poses])
    e0 = ate_rmse(pos0, gt)
    e1 = ate_rmse(pos1, gt)
    assert e1 < max(2.0 * e0, 0.03), (e0, e1)

    # A loaded checkpoint also serves localization-only replay.
    s3 = load_system(ckpt, small_cfg(), Sensor.RGBD,
                     enable_loop_closing=False)
    s3.activate_localization_mode()
    nkf = s3.n_keyframes
    n_mp = int(jnp.sum(s3.map.mp_valid))
    ok_frames = 0
    for i in range(8):
        t, g, d = seq.frame(i)
        if s3.track_rgbd(t + 100.0, g, d):
            ok_frames += 1
    assert ok_frames >= 6
    assert s3.n_keyframes == nkf
    assert int(jnp.sum(s3.map.mp_valid)) == n_mp


def test_periodic_viewer_and_run_stats(rng, tmp_path):
    """In-run periodic rendering (viewer.cpp:37-121 analog) + the
    metrics/observability counters: a short sequence with a viewer
    attached must write frame+map PNGs at the cadence and report
    consistent run stats."""
    seq = SyntheticRgbdSequence(rng, n_frames=8, n_landmarks=400)
    sys = SlamSystem(small_cfg(), Sensor.RGBD, enable_loop_closing=False)
    viewer = sys.attach_viewer(str(tmp_path / "viz"), every=3)
    for i in range(len(seq)):
        t, g, d = seq.frame(i)
        sys.track_rgbd(t, g, d)
    assert viewer.n_rendered >= 2  # frames 0, 3, 6
    pngs = sorted(p.name for p in (tmp_path / "viz").iterdir())
    assert any(p.startswith("frame_") for p in pngs)
    assert any(p.startswith("map_") for p in pngs)
    from PIL import Image

    Image.open(tmp_path / "viz" / [p for p in pngs if p.startswith("map_")][-1])

    d = sys.run_stats()
    assert d["frames_total"] == len(seq)
    assert d["keyframes_inserted"] >= 1
    assert d["keyframes_live"] <= d["keyframes_inserted"]
    assert d["map_points_live"] > 0
    assert 0.0 <= d["track_rate"] <= 1.0
    assert d["mean_inliers"] > 0
    from ydorbslam_tpu.slam.stats import format_stats

    s = format_stats(d)
    assert "track rate" in s and "loops" in s


# Full-pipeline run: minutes on CPU; deselect via -m "not slow".
import pytest  # noqa: E402

pytestmark = pytest.mark.slow
