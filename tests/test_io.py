"""Tests for config ingestion and the TUM trajectory output contract."""
import numpy as np

from ydorbslam_tpu.config import SlamConfig, load_config
from ydorbslam_tpu.io import (
    ate_rmse,
    associate_by_time,
    parse_association,
    read_tum_trajectory,
    write_tum_trajectory,
)

TUM1_YAML = """\
%YAML:1.0

# Camera Parameters.
Camera.fx: 517.306408
Camera.fy: 516.469215
Camera.cx: 318.643040
Camera.cy: 255.313989

LeftCamera.k1: 0.262383
LeftCamera.k2: -0.953104
LeftCamera.p1: -0.005358
LeftCamera.p2: 0.002628
LeftCamera.k3: 1.163314

Camera.width: 640
Camera.height: 480
Camera.fps: 30.0
Camera.bf: 40.0
Camera.RGB: 1
ThDepth: 40.0
DepthMapFactor: 5000.0

ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def test_load_config(tmp_path):
    p = tmp_path / "TUM1.yaml"
    p.write_text(TUM1_YAML)
    cfg = load_config(str(p))
    assert abs(cfg.camera.fx - 517.306408) < 1e-6
    assert abs(cfg.camera.k1 - 0.262383) < 1e-6
    assert cfg.camera.width == 640
    assert cfg.orb.n_features == 1000
    assert cfg.orb.n_levels == 8
    assert cfg.depth.depth_map_factor == 5000.0
    assert cfg.n_keypoints == 1024  # rounded up to lane multiple


def test_default_config_capacities():
    cfg = SlamConfig()
    assert cfg.capacity.max_keypoints % 128 == 0
    assert cfg.optim.chi2_mono == 5.991
    assert cfg.optim.chi2_stereo == 7.815
    assert cfg.matcher.th_high == 100 and cfg.matcher.th_low == 50


def test_association_parse(tmp_path):
    p = tmp_path / "assoc.txt"
    p.write_text(
        "# comment\n"
        "1305031102.175304 rgb/1305031102.175304.png 1305031102.160407 depth/1305031102.160407.png\n"
        "1305031102.211214 rgb/1305031102.211214.png 1305031102.194330 depth/1305031102.194330.png\n"
    )
    assoc = parse_association(str(p))
    assert len(assoc) == 2
    assert assoc.rgb_paths[0] == "rgb/1305031102.175304.png"
    assert assoc.depth_paths[1] == "depth/1305031102.194330.png"
    assert abs(assoc.timestamps[0] - 1305031102.175304) < 1e-6


def test_trajectory_roundtrip(tmp_path, rng):
    from ydorbslam_tpu.geometry import se3_exp
    import jax.numpy as jnp

    n = 10
    xi = jnp.asarray(rng.normal(size=(n, 6)) * 0.3, dtype=jnp.float32)
    poses = np.asarray(se3_exp(xi))
    ts = 1305031102.0 + np.arange(n) / 30.0
    path = str(tmp_path / "traj.txt")
    lost = [False] * n
    lost[3] = True
    write_tum_trajectory(path, ts, poses, lost)
    t2, pos, quat = read_tum_trajectory(path)
    assert len(t2) == n - 1
    # positions are camera centers -R^T t
    k = 0
    for i in range(n):
        if lost[i]:
            continue
        c = -poses[i][:3, :3].T @ poses[i][:3, 3]
        np.testing.assert_allclose(pos[k], c, atol=1e-6)
        k += 1
    # format: 8 columns, 6-decimal timestamps
    with open(path) as f:
        first = f.readline().split()
    assert len(first) == 8
    assert len(first[0].split(".")[1]) == 6


def test_ate_rmse_alignment(rng):
    gt = rng.normal(size=(50, 3))
    # A rigidly transformed copy must align to ~0 error.
    theta = 0.7
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    est = (R @ gt.T).T + np.array([1.0, -2.0, 3.0])
    assert ate_rmse(est, gt) < 1e-9
    # Adding noise produces approximately the noise magnitude.
    est2 = est + rng.normal(size=est.shape) * 0.01
    err = ate_rmse(est2, gt)
    assert 0.003 < err < 0.03


def test_associate_by_time():
    ta = np.array([0.0, 1.0, 2.0, 3.0])
    tb = np.array([0.005, 1.5, 2.001, 3.3])
    ia, ib = associate_by_time(ta, tb, max_dt=0.02)
    assert list(ia) == [0, 2]
    assert list(ib) == [0, 2]
