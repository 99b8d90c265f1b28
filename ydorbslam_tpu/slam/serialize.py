"""Map + system checkpoint/restore.

The reference has NO map persistence — only trajectory text export
(SURVEY.md §5 "Checkpoint / resume: none").  Because this framework's
map is already a flat pytree of arrays (slam/map_state.py), full
checkpointing is a single compressed npz — save mid-run, reload, and
CONTINUE: tracking resumes against the saved map (same tracker pose,
velocity, reference keyframe and trajectory records), or runs
localization-only against it.

Two levels:
  * ``save_map``/``load_map`` — just the MapState arrays,
  * ``save_system``/``load_system`` — map + retrieval index + tracker
    pose/velocity + system counters + trajectory records; the full
    resume state (everything except the device-resident pipelined ring,
    which restarts cold — its first post-resume frame re-seeds the
    motion model exactly like the first frame after relocalization).
"""
from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from .map_state import MapState

_FORMAT_VERSION = 2


def _map_arrays(m: MapState) -> dict:
    return {f"map.{f}": np.asarray(getattr(m, f)) for f in m._fields}


def save_map(m: MapState, path: str) -> None:
    """Write the full map state (+ capacities) to a compressed npz."""
    arrays = {f: np.asarray(getattr(m, f)) for f in m._fields}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(
            {
                "version": 1,
                "K": int(m.K),
                "N": int(m.N),
                "M": int(m.M),
                "O": int(m.O),
            }
        ).encode(),
        dtype=np.uint8,
    )
    np.savez_compressed(path, **arrays)


def load_map(path: str) -> MapState:
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    if meta["version"] not in (1, 2):
        raise ValueError(f"unsupported map format version {meta['version']}")
    prefix = "map." if meta["version"] >= 2 else ""
    return MapState(
        **{f: jnp.asarray(data[prefix + f]) for f in MapState._fields}
    )


def save_system(system, path: str) -> None:
    """Full checkpoint of a SlamSystem (map, retrieval, tracker,
    records).  ``system`` is slam.system.SlamSystem."""
    m = system.map
    arrays = _map_arrays(m)
    arrays["retr.hist"] = np.asarray(system.retrieval.hist)
    arrays["retr.presence"] = np.asarray(system.retrieval.presence)
    arrays["retr.valid"] = np.asarray(system.retrieval.valid)
    arrays["trk.T_cw"] = np.asarray(system.tracker.T_cw)
    arrays["trk.velocity"] = np.asarray(system.tracker.velocity)
    # Last-frame features + landmarks: the motion model's matching
    # source — without them the first resumed frame would have to
    # relocalize instead of tracking straight through.
    lf = system.tracker.last_feats
    if lf is not None:
        for f in lf._fields:
            arrays["trk.last." + f] = np.asarray(getattr(lf, f))
        arrays["trk.last_lms"] = np.asarray(system.tracker.last_lms)
        arrays["trk.last_lms_valid"] = np.asarray(system.tracker.last_lms_valid)
    recs = system.records
    arrays["rec.timestamp"] = np.asarray([r.timestamp for r in recs])
    arrays["rec.ref_kf"] = np.asarray([r.ref_kf for r in recs], np.int64)
    arrays["rec.T_c_ref"] = (
        np.stack([np.asarray(r.T_c_ref) for r in recs])
        if recs else np.zeros((0, 4, 4))
    )
    arrays["rec.lost"] = np.asarray([r.lost for r in recs], bool)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(
            {
                "version": _FORMAT_VERSION,
                "K": int(m.K), "N": int(m.N), "M": int(m.M), "O": int(m.O),
                "ref_kf": int(system.ref_kf),
                "n_keyframes": int(system.n_keyframes),
                "frame_id": int(system.frame_id),
                "frames_since_kf": int(system.frames_since_kf),
                "tracker_state": system.tracker.state.name,
                "localization_only": bool(system.localization_only),
            }
        ).encode(),
        dtype=np.uint8,
    )
    np.savez_compressed(path, **arrays)


def load_system(path: str, cfg, sensor=None, **system_kwargs):
    """Reconstruct a SlamSystem from a checkpoint.

    ``cfg`` must describe the same capacities the checkpoint was saved
    with (asserted).  Tracking continues from the saved pose; call
    ``activate_localization_mode()`` on the result for frozen-map
    relocalization/VO instead.
    """
    from .retrieval import RetrievalIndex
    from .system import Sensor, SlamSystem, SystemRecord
    from .tracking import TrackingState

    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    if meta["version"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta['version']}")
    if sensor is None:
        sensor = Sensor.RGBD
    system = SlamSystem(cfg, sensor, **system_kwargs)
    m = system.map
    assert (m.K, m.N, m.M, m.O) == (
        meta["K"], meta["N"], meta["M"], meta["O"],
    ), "checkpoint capacities do not match the provided config"
    system.map = MapState(
        **{f: jnp.asarray(data["map." + f]) for f in MapState._fields}
    )
    system.retrieval = RetrievalIndex(
        hist=jnp.asarray(data["retr.hist"]),
        presence=jnp.asarray(data["retr.presence"]),
        valid=jnp.asarray(data["retr.valid"]),
    )
    system.tracker.T_cw = jnp.asarray(data["trk.T_cw"])
    system.tracker.velocity = jnp.asarray(data["trk.velocity"])
    if "trk.last_lms" in data:
        from ..ops.extractor import FrameFeatures

        system.tracker.last_feats = FrameFeatures(
            **{
                f: jnp.asarray(data["trk.last." + f])
                for f in FrameFeatures._fields
            }
        )
        system.tracker.last_lms = jnp.asarray(data["trk.last_lms"])
        system.tracker.last_lms_valid = jnp.asarray(data["trk.last_lms_valid"])
    system.tracker.state = TrackingState[meta["tracker_state"]]
    system.ref_kf = meta["ref_kf"]
    system.n_keyframes = meta["n_keyframes"]
    system.frame_id = meta["frame_id"]
    system.frames_since_kf = meta["frames_since_kf"]
    system.localization_only = meta["localization_only"]
    n_rec = len(data["rec.timestamp"])
    system.records = [
        SystemRecord(
            timestamp=float(data["rec.timestamp"][i]),
            ref_kf=int(data["rec.ref_kf"][i]),
            T_c_ref=data["rec.T_c_ref"][i],
            lost=bool(data["rec.lost"][i]),
        )
        for i in range(n_rec)
    ]
    system._snap = None
    system._pending_snap = None
    return system
