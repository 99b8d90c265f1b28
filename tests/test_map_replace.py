"""Unit tests for the loop-fusion map primitives: batched
``replace_points`` (MapPoint::beReplacedBy, src/mapPoint.cpp:128-157)
and ``recompute_covis_all`` (whole-graph updateConnections sweep,
src/loopClosing.cpp:311-317)."""
import jax.numpy as jnp
import numpy as np

from ydorbslam_tpu.slam.map_state import (
    empty_map,
    recompute_covis_all,
    replace_points,
)

K, N, M, O = 8, 16, 32, 6


def _bind(m, kf, kp, pt, octave=0):
    """Bind point pt to (kf, kp): kf_mp slot + obs entry + validity."""
    slots = np.asarray(m.mp_obs_kf[pt])
    free = int(np.argmax(slots < 0))
    return m._replace(
        kf_valid=m.kf_valid.at[kf].set(True),
        kf_kp_valid=m.kf_kp_valid.at[kf, kp].set(True),
        kf_mp=m.kf_mp.at[kf, kp].set(pt),
        mp_valid=m.mp_valid.at[pt].set(True),
        mp_obs_kf=m.mp_obs_kf.at[pt, free].set(kf),
        mp_obs_kp=m.mp_obs_kp.at[pt, free].set(kp),
        mp_obs_oct=m.mp_obs_oct.at[pt, free].set(octave),
    )


def _mk():
    m = empty_map(K, N, M, O)
    # Point 0 observed by kf0(kp0), kf1(kp1); point 1 by kf2(kp2),
    # kf3(kp3); point 2 by kf1(kp5) (shares kf1 with point 0).
    for kf, kp, pt in [(0, 0, 0), (1, 1, 0), (2, 2, 1), (3, 3, 1), (1, 5, 2)]:
        m = _bind(m, kf, kp, pt)
    m = m._replace(
        mp_pos=m.mp_pos.at[0].set(jnp.asarray([0.0, 0.0, 2.0]))
        .at[1].set(jnp.asarray([0.1, 0.0, 2.0]))
        .at[2].set(jnp.asarray([0.0, 0.2, 2.0])),
        mp_found=m.mp_found.at[0].set(5).at[1].set(3),
        mp_visible=m.mp_visible.at[0].set(7).at[1].set(4),
    )
    return m


class TestReplacePoints:
    def test_obs_transfer_and_invalidate(self):
        m = _mk()
        # Replace point 0 by point 1: kf0/kf1 slots rebind to 1.
        out = replace_points(
            m, jnp.asarray([0]), jnp.asarray([1]), jnp.asarray([True]),
            1.2, 8,
        )
        assert not bool(out.mp_valid[0])
        assert bool(out.mp_valid[1])
        assert int(out.kf_mp[0, 0]) == 1
        assert int(out.kf_mp[1, 1]) == 1
        # Point 1 now observed by kf0..kf3.
        obs = set(int(x) for x in np.asarray(out.mp_obs_kf[1]) if x >= 0)
        assert obs == {0, 1, 2, 3}
        # Old point's obs rows cleared.
        assert np.all(np.asarray(out.mp_obs_kf[0]) == -1)
        # Counters folded (5+3 found, 7+4 visible).
        assert int(out.mp_found[1]) == 8
        assert int(out.mp_visible[1]) == 11

    def test_conflicting_obs_erased(self):
        m = _mk()
        # Point 2 is observed by kf1 — replacing 0 by 2 must erase the
        # kf1 binding of point 0 (2 already there) but transfer kf0's.
        out = replace_points(
            m, jnp.asarray([0]), jnp.asarray([2]), jnp.asarray([True]),
            1.2, 8,
        )
        assert int(out.kf_mp[0, 0]) == 2  # transferred
        assert int(out.kf_mp[1, 1]) == -1  # erased (kf1 already sees 2)
        assert int(out.kf_mp[1, 5]) == 2  # original binding intact
        obs = set(int(x) for x in np.asarray(out.mp_obs_kf[2]) if x >= 0)
        assert obs == {0, 1}

    def test_duplicate_old_first_wins(self):
        m = _mk()
        out = replace_points(
            m,
            jnp.asarray([0, 0]),
            jnp.asarray([1, 2]),
            jnp.asarray([True, True]),
            1.2, 8,
        )
        # First row (0 -> 1) wins; the duplicate is dropped.
        assert int(out.kf_mp[0, 0]) == 1
        assert bool(out.mp_valid[2])

    def test_chain_dropped(self):
        m = _mk()
        # 0->1 and 1->2 in one batch: both rows are dropped (chain).
        out = replace_points(
            m,
            jnp.asarray([0, 1]),
            jnp.asarray([1, 2]),
            jnp.asarray([True, True]),
            1.2, 8,
        )
        assert bool(out.mp_valid[0]) and bool(out.mp_valid[1])
        assert int(out.kf_mp[0, 0]) == 0

    def test_cross_loop_covis_created(self):
        """The loop-closure mechanism end-to-end: replacing a
        current-side point with a loop-side point makes the survivor
        co-observed by both sides, and the covis rebuild exposes the
        new cross-loop link."""
        m = _mk()
        before = recompute_covis_all(m)
        assert int(before.covis[0, 2]) == 0  # kf0 and kf2 share nothing
        out = replace_points(
            m, jnp.asarray([0]), jnp.asarray([1]), jnp.asarray([True]),
            1.2, 8,
        )
        out = recompute_covis_all(out)
        # Point 1 observed by kf0..kf3 -> all pairs now share one point.
        for i in range(4):
            for j in range(4):
                if i != j:
                    assert int(out.covis[i, j]) == 1, (i, j)


class TestRecomputeCovisAll:
    def test_matches_pairwise_count(self):
        m = _mk()
        out = recompute_covis_all(m)
        c = np.asarray(out.covis)
        assert c[0, 1] == 1 and c[1, 0] == 1  # share point 0
        assert c[2, 3] == 1  # share point 1
        assert c[0, 2] == 0 and c[1, 2] == 0
        assert np.all(np.diag(c) == 0)

    def test_invalid_rows_zero(self):
        m = _mk()
        m = m._replace(kf_valid=m.kf_valid.at[0].set(False))
        out = recompute_covis_all(m)
        assert np.all(np.asarray(out.covis[0]) == 0)
        assert np.all(np.asarray(out.covis[:, 0]) == 0)
