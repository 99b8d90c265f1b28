"""Temporal wrong-pair loop guard (LoopConfig.min_frame_gap).

Round-4 observed failure (docs/ACCURACY.md): tracking was lost for a
stretch, the post-reloc keyframe (frame 120) and a pre-loss keyframe
(frame 109) ended up covisibility-DISCONNECTED, and the loop pipeline
closed a catastrophic false "loop" between two poses 11 frames apart.
The reference's only protection is covisibility connectivity
(keyFrameDatabase.cpp:26-105) + consistency — both of which that pair
slipped past.  The guard rejects candidates within ``min_frame_gap``
source frames of the query at the database gate.
"""
import jax.numpy as jnp
import numpy as np

from ydorbslam_tpu.slam.loop_impl import _detect_on_device
from ydorbslam_tpu.slam.map_state import empty_map
from ydorbslam_tpu.slam.retrieval import add_keyframe, empty_index

K, N, M, O = 8, 64, 128, 6


def _scenario(rng):
    """Query kf1 (frame 120) vs candidate kf0 (frame 109): same place
    (near-identical descriptors), covisibility-disconnected — the
    lost-stretch false pair."""
    m = empty_map(K, N, M, O)
    desc = rng.integers(0, 2**32, size=(N, 8), dtype=np.uint32)
    noisy = desc.copy()
    noisy[:, 0] ^= np.uint32(1)  # one bit off: same place, new shot
    m = m._replace(
        kf_valid=m.kf_valid.at[0].set(True).at[1].set(True),
        kf_frame_id=m.kf_frame_id.at[0].set(109).at[1].set(120),
        kf_desc=m.kf_desc.at[0].set(jnp.asarray(desc))
        .at[1].set(jnp.asarray(noisy)),
        kf_kp_valid=m.kf_kp_valid.at[0].set(True).at[1].set(True),
        # NO covisibility between them (the lost stretch broke it).
    )
    idx = empty_index(K)
    idx = add_keyframe(idx, 0, jnp.asarray(desc), jnp.ones((N,), bool))
    return m, idx


def _detect(m, idx, min_frame_gap):
    C = 4
    ids, consistent, masks, counts = _detect_on_device(
        m, idx, 1,
        jnp.zeros((C, K), bool), -jnp.ones((C,), jnp.int32),
        C, 1, min_frame_gap=min_frame_gap,
    )
    return [int(i) for i in np.asarray(ids) if i >= 0]


def test_gate_off_reproduces_false_pair(rng):
    """Without the guard the false pair IS surfaced (red case): this is
    the scenario that produced the r4 wrong closure."""
    m, idx = _scenario(rng)
    assert 0 in _detect(m, idx, min_frame_gap=0)


def test_gate_rejects_lost_stretch_neighbor(rng):
    m, idx = _scenario(rng)
    assert _detect(m, idx, min_frame_gap=30) == []


def test_gate_passes_real_revisit(rng):
    """A genuine revisit (frame gap 300) is untouched by the guard."""
    m, idx = _scenario(rng)
    m = m._replace(kf_frame_id=m.kf_frame_id.at[1].set(409))
    assert 0 in _detect(m, idx, min_frame_gap=30)
