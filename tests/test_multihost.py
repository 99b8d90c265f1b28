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


def test_production_paths_use_device_mesh():
    """The loop closer's sharded-detect and global-BA mesh construction
    route through multihost.device_mesh (no raw jax.devices() Mesh)."""
    import inspect

    from ydorbslam_tpu.slam import loop_impl

    src = inspect.getsource(loop_impl)
    assert src.count("device_mesh(") >= 2
