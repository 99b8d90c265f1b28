"""Loop closing: detection, Sim3 estimation, correction, global BA.

Replaces the reference ``LoopClosing`` thread (src/loopClosing.cpp) and
``KeyFrameDatabase`` (src/keyFrameDatabase.cpp).  Detection uses the
dense descriptor-retrieval index of slam/retrieval.py (the DBoW3
replacement); geometric verification uses Horn's closed-form Sim3 with
vmapped RANSAC (optim/horn.py); correction propagates the Sim3 to the
covisible group, fuses duplicates, optimizes the essential graph
(optim/pose_graph.py) and runs global BA — synchronously, where the
reference spawns a transient thread (loopClosing.cpp:334).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class LoopCloser:
    """Consumes newly inserted keyframes; runs detection + correction.

    Gating mirrors the reference: >= 10 keyframes between loops
    (loopClosing.cpp:43), covisibility-consistency across 3 consecutive
    detections (:90), >= 20 Sim3 inliers (:171), >= 40 total matches
    after guided projection (:214).
    """

    def __init__(self, system):
        self.system = system
        self.last_loop_kf_count = 0
        self.consistent_groups = []  # [(set(kf ids), count)]
        self.n_loops_closed = 0
        self._impl = None
        # Optional host callback checked between global-BA LM chunks —
        # the reference's force-stop flag for the transient BA thread
        # (optimizer.cpp:17-19); None = run to completion.
        self.should_abort_ba = None

    def process(self, kf_id: int) -> bool:
        # Full implementation lands with slam/retrieval.py +
        # optim/{horn,pose_graph}.py; see LoopCloserImpl.
        if self._impl is None:
            try:
                from .loop_impl import LoopCloserImpl

                self._impl = LoopCloserImpl(self.system, self)
            except ImportError:
                return False
        return self._impl.process(kf_id)

    def tick(self) -> None:
        """Advance any in-flight global BA by one chunk (called once per
        drained frame batch — the tracking-overlap hook)."""
        if self._impl is not None:
            self._impl.tick()

    def flush(self) -> bool:
        """Verify any detection still pending at sequence end and run
        any in-flight global BA to completion."""
        if self._impl is None:
            return False
        return self._impl.flush()
