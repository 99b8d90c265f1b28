"""Multi-host scaffolding (SURVEY.md §2c P6): the production mesh path
must not assume one process.  Single-process here; the process-spanning
behavior is exercised by tools/multihost_smoke.py (2-process CPU run)
and documented in docs/MULTIHOST.md."""
import os

import jax
import numpy as np

from ydorbslam_tpu.parallel import multihost


def test_initialize_is_noop_single_process(monkeypatch):
    monkeypatch.delenv("YDORBSLAM_COORDINATOR", raising=False)
    monkeypatch.delenv("YDORBSLAM_AUTO_DISTRIBUTED", raising=False)
    assert multihost.initialize_distributed() is False
    # idempotent
    assert multihost.initialize_distributed() is False
    info = multihost.process_info()
    assert info["process_count"] == 1
    assert info["global_devices"] == len(jax.devices())


def test_distributed_env_contract(monkeypatch):
    monkeypatch.setenv("YDORBSLAM_COORDINATOR", "10.0.0.1:8476")
    monkeypatch.setenv("YDORBSLAM_NUM_PROCESSES", "4")
    monkeypatch.setenv("YDORBSLAM_PROCESS_ID", "2")
    spec = multihost.distributed_env()
    assert spec == dict(
        coordinator_address="10.0.0.1:8476", num_processes=4, process_id=2
    )
    monkeypatch.delenv("YDORBSLAM_COORDINATOR")
    assert multihost.distributed_env() is None


def test_device_mesh_process_major_and_divisor():
    # conftest forces an 8-device CPU world
    mesh = multihost.device_mesh("kf")
    assert mesh is not None and mesh.devices.size == len(jax.devices())
    # process-major ordering: ids sorted within the (single) process
    ids = [d.id for d in mesh.devices.ravel()]
    assert ids == sorted(ids)
    # divisor trimming: 12 keyframes on 8 devices -> largest divisor <= 8
    mesh = multihost.device_mesh("kf", length_divisor=12)
    assert mesh is not None and mesh.devices.size == 6
    # a prime axis that nothing divides -> no mesh (dense fallback)
    assert multihost.device_mesh("kf", length_divisor=7) is None or \
        multihost.device_mesh("kf", length_divisor=7).devices.size in (7, 1)


def test_production_paths_use_device_mesh(monkeypatch):
    """The loop closer's sharded-detect and global-BA mesh construction
    route through multihost.device_mesh — verified by BEHAVIOR (a spy on
    the helper sees both call sites fire), not by source text."""
    calls = []
    orig = multihost.device_mesh

    def spy(axis_name, length_divisor=None):
        calls.append(axis_name)
        return orig(axis_name, length_divisor=length_divisor)

    monkeypatch.setattr(multihost, "device_mesh", spy)

    from ydorbslam_tpu.config import (CameraConfig, CapacityConfig,
                                      OrbConfig, SlamConfig)
    from ydorbslam_tpu.slam.loop_impl import LoopCloserImpl
    from ydorbslam_tpu.slam.system import SlamSystem, Sensor

    cfg = SlamConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                            bf=50.0, width=640, height=480),
        orb=OrbConfig(n_features=128),
        capacity=CapacityConfig(
            max_keypoints=128, max_keyframes=8, max_map_points=512,
            max_obs_per_point=8, local_ba_window_kf=4, local_ba_fixed_kf=2,
            local_ba_max_points=256, tracking_points=256,
            global_ba_max_points=256,
        ),
    )
    sys_ = SlamSystem(cfg, Sensor.RGBD, enable_mapping=True,
                      enable_loop_closing=True)
    impl = LoopCloserImpl(sys_, sys_.loop_closer)
    # 1. sharded retrieval mesh for production detection
    assert "kf" in calls, calls
    # 2. point-sharded mesh for the interleaved global BA
    impl._start_global_ba(sys_.map, 0)
    assert "pts" in calls, calls
    # The armed BA runs to completion through the (spied) mesh path.
    while impl._gba is not None:
        impl.tick()
