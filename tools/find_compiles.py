"""Log every XLA compile that happens AFTER precompile() during a
bench-like run — each is a latency spike to hunt down."""
import logging
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    import jax

    jax.config.update("jax_log_compiles", True)

    from synthetic import SyntheticRgbdSequence
    from ydorbslam_tpu.config import (
        CameraConfig, OrbConfig, SlamConfig, TrackingConfig,
    )
    from ydorbslam_tpu.slam.system import SlamSystem, Sensor

    cfg = SlamConfig(
        tracking=TrackingConfig(min_init_depth_points=100),
        camera=CameraConfig(
            fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0,
            width=640, height=480,
        ),
        orb=OrbConfig(n_features=1000),
    )
    rng = np.random.default_rng(0)
    n_frames = 40
    seq = SyntheticRgbdSequence(rng, n_frames=n_frames, n_landmarks=800)
    frames = [seq.frame(i) for i in range(n_frames)]
    system = SlamSystem(cfg, Sensor.RGBD, enable_loop_closing=False)
    system.enable_pipelined(lag=8)
    system.precompile()
    print("=" * 60)
    print("PRECOMPILE DONE — compiles below this line are spikes")
    print("=" * 60)
    for i, (t, g, d) in enumerate(frames):
        t0 = time.perf_counter()
        system.track_rgbd_pipelined(t, g, d)
        dt = (time.perf_counter() - t0) * 1000
        if dt > 20:
            print(f"frame {i}: {dt:.1f} ms")
    t0 = time.perf_counter()
    system.shutdown()
    print(f"flush: {(time.perf_counter()-t0)*1000:.1f} ms")


if __name__ == "__main__":
    logging.basicConfig(level=logging.WARNING)
    main()
