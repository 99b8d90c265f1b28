"""Chained per-op device timings for the pieces of rgbd_frame_step.

Each op is dispatched N times back-to-back with a data dependency chain
(the probe feeds a scalar of iteration i's output into iteration i+1's
input so XLA cannot overlap batches), one sync at the end — device
time, not tunnel RTT (see bench.py's chained() rationale).

NOTE: dev tool, deliberately coupled to SlamSystem internals (_dstate,
_trkset, ring layout) to probe exactly what the production step runs;
expect it to need updating when those internals change.

Run:  python tools/profile_step_ops.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def chained(fn, probe, n=20, warm=3):
    """fn(carry)->out, probe(out)->carry (tiny, device-resident)."""
    import jax

    carry = None
    for _ in range(warm):
        carry = probe(fn(carry))
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(n):
        carry = probe(fn(carry))
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from synthetic import SyntheticRgbdSequence
    from ydorbslam_tpu.config import (CameraConfig, DepthConfig, OrbConfig,
                                      SlamConfig, TrackingConfig,
                                      camera_intrinsics)
    from ydorbslam_tpu.ops.extractor import extract_orb
    from ydorbslam_tpu.ops.pyramid import build_pyramid

    cfg = SlamConfig(camera=CameraConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0,
        width=640, height=480))
    cam = camera_intrinsics(cfg)
    rng = np.random.default_rng(0)
    seq = SyntheticRgbdSequence(rng, n_frames=4, n_landmarks=1500,
                                trajectory="xyz")
    _, g, d = seq.frame(0)
    gj = jnp.asarray(g.astype(np.float32))

    ex = jax.jit(lambda im: extract_orb(
        im, cam, n_features=1000, capacity=1024, n_levels=8,
        scale_factor=1.2, th_high=20, th_low=7))
    print(f"extract_orb total:      "
          f"{chained(lambda c: ex(gj if c is None else gj + c), lambda f: f.response[0] * 0):7.3f} ms")

    pyr = jax.jit(lambda im: build_pyramid(im, 8, 1.2))
    print(f"  build_pyramid:        "
          f"{chained(lambda c: pyr(gj if c is None else gj + c), lambda p: p[-1][0, 0] * 0):7.3f} ms")

    from ydorbslam_tpu.ops.pallas_kernels import fast_score_nms_pallas
    p0 = pyr(gj)
    lvls = [jnp.asarray(np.asarray(l)) for l in p0]

    @jax.jit
    def fast_all(bias):
        s = jnp.float32(0)
        for l in lvls:
            sc = fast_score_nms_pallas(l + bias, 16)
            s = s + sc[20, 20]
        return s
    print(f"  FAST+NMS (8 lvls):    "
          f"{chained(lambda c: fast_all(jnp.float32(0) if c is None else c), lambda s: s * 0):7.3f} ms")

    from ydorbslam_tpu.slam.system import Sensor, SlamSystem
    DEPTH_FACTOR = 5000.0
    scfg = SlamConfig(
        tracking=TrackingConfig(min_init_depth_points=100),
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                            bf=50.0, width=640, height=480),
        orb=OrbConfig(n_features=1000),
        depth=DepthConfig(depth_map_factor=DEPTH_FACTOR),
    )
    system = SlamSystem(scfg, Sensor.RGBD, enable_loop_closing=False)
    system.enable_pipelined(lag=16)
    for i in range(12):
        t, gg, dd = seq.frame(i % 4)
        system.track_rgbd_pipelined(
            t, gg.astype(np.uint8), (dd * DEPTH_FACTOR).astype(np.uint16))
    system.flush_pipeline()

    st = system._dstate
    trk = system._trkset
    feats = jax.tree.map(lambda a: a[0], st.ring_feats)
    T = st.T_cw

    from ydorbslam_tpu.slam.matchers import (match_local_points,
                                             match_motion_model_two)

    mm = jax.jit(lambda Tc: match_motion_model_two(
        cam, feats, st.last, st.last_lms, st.last_lms_valid, Tc, Tc))

    def probe_any(o):
        l = jax.tree.leaves(o)[0]
        return T + jnp.float32(0) * l.reshape(-1)[0].astype(jnp.float32)

    print(f"match_motion_two:       "
          f"{chained(lambda c: mm(T if c is None else c), probe_any):7.3f} ms")

    ml = jax.jit(lambda Tc: match_local_points(
        cam, feats, Tc, trk.pos, trk.desc, trk.normal, trk.dmax,
        trk.dmin, trk.valid))
    print(f"match_local:            "
          f"{chained(lambda c: ml(T if c is None else c), probe_any):7.3f} ms")

    from ydorbslam_tpu.optim.pose import PoseObservations, optimize_pose
    n = scfg.n_keypoints  # pose observations = keypoint capacity
    pos = jnp.zeros((n, 3)).at[:, 2].set(2.0)
    obs = PoseObservations(
        p_w=pos + jax.random.normal(jax.random.PRNGKey(0), (n, 3)) * 0.3,
        obs_uvr=jnp.concatenate(
            [feats.uv[:n], jnp.zeros((n, 1))], axis=-1
        ),
        inv_sigma2=jnp.ones((n,)),
        has_stereo=jnp.zeros((n,), bool),
        valid=jnp.ones((n,), bool),
    )
    po = jax.jit(lambda Tc: optimize_pose(cam, Tc, obs)[0])
    print(f"optimize_pose (4x10):   "
          f"{chained(lambda c: po(T if c is None else c), lambda Tn: Tn):7.3f} ms")


if __name__ == "__main__":
    main()
