"""Map checkpoint/restore.

The reference has NO map persistence — only trajectory text export
(SURVEY.md §5 "Checkpoint / resume: none").  Because this framework's
map is already a flat pytree of arrays (slam/map_state.py), full
checkpointing is a single compressed npz — save mid-run, reload, and
continue tracking or run localization-only against the saved map.
"""
from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from .map_state import MapState

_FORMAT_VERSION = 1


def save_map(m: MapState, path: str) -> None:
    """Write the full map state (+ capacities) to a compressed npz."""
    arrays = {f: np.asarray(getattr(m, f)) for f in m._fields}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(
            {
                "version": _FORMAT_VERSION,
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
    if meta["version"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported map format version {meta['version']}")
    return MapState(**{f: jnp.asarray(data[f]) for f in MapState._fields})
