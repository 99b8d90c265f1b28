"""LoopCloser implementation: detection -> Sim3 -> correction -> global BA.

The algorithmic mirror of src/loopClosing.cpp with the thread protocol
removed (SURVEY.md §2c P3/P7: the transient global-BA thread and
stop/release handshakes become a synchronous call after correction).

Pipeline per keyframe (gates identical to the reference):
  detect   — retrieval candidates (slam/retrieval.py) + covisibility
             consistency across 3 consecutive keyframes
             (loopClosing.cpp:34-114),
  verify   — dense descriptor match between the two keyframes' map
             points (>= 20), vmapped Horn RANSAC, Sim3 refinement
             (>= 20 inliers), guided projection against the loop
             group's points (>= 40 total) (loopClosing.cpp:115-228),
  correct  — propagate the corrected Sim3 to the covisible group and
             its points, fuse duplicates, optimize the essential graph,
             run global BA (loopClosing.cpp:229-337, 377-445).
"""
from __future__ import annotations

from typing import List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.se3 import inv_T
from ..geometry.sim3 import inv_S, sim3_to_se3
from ..optim.horn import ransac_sim3
from ..optim.pose_graph import PoseGraphProblem, optimize_pose_graph
from ..optim.schur import BAProblem, bundle_adjust
from ..optim.sim3_opt import optimize_sim3
from .map_state import MapState
from .matchers import match_dense, match_local_points
from .retrieval import add_keyframe as retr_add
from .retrieval import bow_histogram, detect_candidates, score_all
from .triangulate import _fuse_into_kf


import functools


@functools.partial(
    jax.jit,
    static_argnames=("max_out", "consistency_th", "n_banks", "bank_bits"),
)
def _detect_on_device(
    m: MapState, retrieval, kf_id, prev_masks, prev_counts,
    max_out: int, consistency_th: int,
    n_banks: int = 4, bank_bits: int = 12,
):
    """Fused loop-candidate detection + covisibility-consistency update.

    One program covers KeyFrameDatabase::detectLoopCandidates gating
    (query histogram, min covisible score, candidate filter) AND the
    consistency-group tracking of loopClosing.cpp:73-113: each
    candidate's covisibility group is intersected with the previous
    keyframe's groups on device; only the per-candidate "consistent
    enough" flags cross to the host.
    """
    q = bow_histogram(
        m.kf_desc[kf_id], m.kf_kp_valid[kf_id], n_banks, bank_bits
    )
    _, scores = score_all(retrieval, q)
    return _detect_body(
        m, retrieval, kf_id, prev_masks, prev_counts, q, scores,
        max_out, consistency_th,
    )


def make_sharded_detect(mesh, max_out, consistency_th, n_banks, bank_bits):
    """Production detection with KEYFRAME-SHARDED retrieval scoring.

    Same program as _detect_on_device except the score pass runs as a
    shard_map over the mesh (parallel.retrieval_sharded.score_all_sharded
    — bit-exact with score_all); every gate downstream is shared code.
    Built per mesh because Mesh objects cannot cross the jit boundary
    as arguments.
    """
    from ..parallel.retrieval_sharded import score_all_sharded

    @jax.jit
    def detect(m, retrieval, kf_id, prev_masks, prev_counts):
        q = bow_histogram(
            m.kf_desc[kf_id], m.kf_kp_valid[kf_id], n_banks, bank_bits
        )
        _, scores = score_all_sharded(mesh, retrieval, q)
        return _detect_body(
            m, retrieval, kf_id, prev_masks, prev_counts, q, scores,
            max_out, consistency_th,
        )

    return detect


def _detect_body(
    m, retrieval, kf_id, prev_masks, prev_counts, q, scores,
    max_out, consistency_th,
):
    connected = (m.covis[kf_id] > 0).at[kf_id].set(True)
    neigh = connected & (jnp.arange(m.K) != kf_id) & retrieval.valid
    min_score = jnp.min(jnp.where(neigh, scores, jnp.inf))
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 0.0)
    ids, _ = detect_candidates(
        retrieval, q, connected, m.covis, min_score, max_out=max_out
    )
    # Consistency groups: candidate group = candidate + its covisibles.
    idc = jnp.clip(ids, 0, m.K - 1)
    masks = (m.covis[idc] > 0) | jax.nn.one_hot(idc, m.K, dtype=bool)
    masks &= (ids >= 0)[:, None]
    inter = jnp.einsum("ck,gk->cg", masks, prev_masks)  # counts > 0 = hit
    best_prev = jnp.max(
        jnp.where(inter > 0, prev_counts[None, :] + 1, 0), axis=-1,
        initial=0,
    )
    consistent = (ids >= 0) & (best_prev >= consistency_th)
    return ids, consistent, masks, best_prev


class LoopCloserImpl:
    def __init__(self, system, closer):
        self.system = system
        self.closer = closer
        self.key = jax.random.PRNGKey(0)
        # Production sharded retrieval: when several devices are
        # visible, candidate scoring shards the keyframe axis over the
        # mesh (the scaled replacement of the reference's inverted
        # file, keyFrameDatabase.cpp:26-105).  Same gates either way.
        self._sharded_detect = None
        self.used_sharded_detect = False
        devs = jax.devices()
        K = system.cfg.capacity.max_keyframes
        if len(devs) > 1 and K % len(devs) == 0:
            from jax.sharding import Mesh

            cfg = system.cfg
            self._sharded_detect = make_sharded_detect(
                Mesh(np.array(devs), ("kf",)),
                cfg.capacity.loop_candidates,
                cfg.loop.covisibility_consistency_th,
                cfg.loop.retrieval_banks,
                cfg.loop.retrieval_bank_bits,
            )

    # ------------------------------------------------------------------
    def process(self, kf_id: int) -> bool:
        """Dispatch detection for this keyframe; VERIFY the previous
        keyframe's detection result (its device arrays are materialized
        by now, so the fetch is free).

        The reference's LoopClosing runs in a background thread
        (loopClosing.cpp:10-27) consuming a keyframe queue — it too
        verifies keyframes slightly after insertion.  Polling one
        keyframe late keeps the device pipeline free of sync points:
        a blocking fetch here would stall every queued tracking frame.
        """
        sys = self.system
        cfg = sys.cfg
        closer = self.closer
        closed = self._poll_pending()
        if sys.n_keyframes - closer.last_loop_kf_count >= cfg.loop.min_kfs_between_loops:
            self._dispatch_detect(kf_id)
        return closed

    def flush(self) -> bool:
        """Verify any still-pending detection (sequence end)."""
        return self._poll_pending()

    def _dispatch_detect(self, kf_id: int) -> None:
        """Candidate scoring + covisibility-consistency update, one
        device program, NO host fetch (loopClosing.cpp:34-114)."""
        sys = self.system
        m = sys.map
        C = sys.cfg.capacity.loop_candidates
        if not isinstance(self.closer.consistent_groups, tuple):
            self.closer.consistent_groups = (
                jnp.zeros((C, m.K), bool),
                -jnp.ones((C,), jnp.int32),
            )
        prev_masks, prev_counts = self.closer.consistent_groups
        if self._sharded_detect is not None:
            ids, consistent, masks, counts = self._sharded_detect(
                m, sys.retrieval, kf_id, prev_masks, prev_counts
            )
            self.used_sharded_detect = True
        else:
            ids, consistent, masks, counts = _detect_on_device(
                m, sys.retrieval, kf_id, prev_masks, prev_counts,
                C, sys.cfg.loop.covisibility_consistency_th,
                n_banks=sys.cfg.loop.retrieval_banks,
                bank_bits=sys.cfg.loop.retrieval_bank_bits,
            )
        self.closer.consistent_groups = (masks, counts.astype(jnp.int32))
        snap = sys._snapshot()
        self._pending = (
            kf_id, int(snap["kf_frame_id"][kf_id]), ids, consistent,
        )

    def _poll_pending(self) -> bool:
        pending = getattr(self, "_pending", None)
        if pending is None:
            return False
        self._pending = None
        kf_id, frame_id_at_dispatch, ids, consistent = pending
        sys = self.system
        closer = self.closer
        # Staleness guard: verification runs one keyframe late against a
        # map that kept evolving — if mapping culled the pending
        # keyframe (or culled + reused its slot for a different frame),
        # Sim3 verification would run against another keyframe's data.
        snap = sys._snapshot()
        if (not bool(snap["kf_valid"][kf_id])
                or int(snap["kf_frame_id"][kf_id]) != frame_id_at_dispatch):
            return False
        ids_np, cons_np = jax.device_get((ids, consistent))
        cands = [int(i) for i, c in zip(ids_np, cons_np) if i >= 0 and c]
        for cand in cands:
            hit = self._compute_sim3(kf_id, cand)
            if hit is not None:
                S_12, _ = hit
                self._correct(kf_id, cand, S_12)
                closer.last_loop_kf_count = sys.n_keyframes
                closer.n_loops_closed += 1
                closer.consistent_groups = []  # re-initialized lazily
                return True
        return False

    # ------------------------------------------------------------------
    def _compute_sim3(self, kf1: int, kf2: int):
        """Geometric verification (loopClosing.cpp:115-228).

        Returns (S_12 mapping kf2-camera points into kf1 camera, total
        matches) or None.
        """
        sys = self.system
        cfg = sys.cfg
        m = sys.map
        # 1. appearance match restricted to keypoints WITH map points
        has1 = m.kf_kp_valid[kf1] & (m.kf_mp[kf1] >= 0)
        has2 = m.kf_kp_valid[kf2] & (m.kf_mp[kf2] >= 0)
        assign, _ = match_dense(
            m.kf_desc[kf1], has1, m.kf_angle[kf1],
            m.kf_desc[kf2], has2, m.kf_angle[kf2],
            max_dist=cfg.matcher.th_low, ratio=cfg.matcher.ratio_reloc,
        )  # per kf2-keypoint -> kf1-keypoint
        n_matches = int(jnp.sum(assign >= 0))
        if n_matches < cfg.loop.min_bow_matches:
            return None
        # matched map-point pairs in each camera frame
        a = jnp.asarray(assign)
        kp2 = jnp.arange(m.N)
        kp1 = jnp.clip(a, 0, m.N - 1)
        ok = a >= 0
        mp1 = m.kf_mp[kf1, kp1]
        mp2 = m.kf_mp[kf2, kp2]
        ok &= (mp1 >= 0) & (mp2 >= 0)
        ok &= m.mp_valid[jnp.clip(mp1, 0, m.M - 1)]
        ok &= m.mp_valid[jnp.clip(mp2, 0, m.M - 1)]
        T1, T2 = m.kf_pose[kf1], m.kf_pose[kf2]
        p1 = m.mp_pos[jnp.clip(mp1, 0, m.M - 1)] @ T1[:3, :3].T + T1[:3, 3]
        p2 = m.mp_pos[jnp.clip(mp2, 0, m.M - 1)] @ T2[:3, :3].T + T2[:3, 3]
        sf2 = (cfg.orb.scale_factor ** jnp.arange(cfg.orb.n_levels)) ** 2
        s2_1 = sf2[m.kf_octave[kf1, kp1]]
        s2_2 = sf2[m.kf_octave[kf2, kp2]]
        # 2. Horn RANSAC (scale fixed: stereo/RGB-D, loopClosing.cpp:132)
        self.key, sub = jax.random.split(self.key)
        res = ransac_sim3(
            sub, sys.cam, p1, p2, s2_1, s2_2, ok,
            # batched equivalent of maxIterations=300 (loopClosing.cpp:132)
            n_hypotheses=cfg.loop.ransac_max_iters,
            min_inliers=cfg.loop.ransac_min_inliers,
        )
        if not bool(res.ok):
            return None
        # 3. Sim3 refinement on inlier observations (optimizeSim3)
        obs1 = m.kf_uv[kf1, kp1]
        obs2 = m.kf_uv[kf2, kp2]
        S_ref, inl, n_in = optimize_sim3(
            sys.cam, res.S_12, p1, p2, obs1, obs2,
            1.0 / s2_1, 1.0 / s2_2, res.inliers,
            iters1=cfg.optim.sim3_iters, iters2=10,
        )
        if int(n_in) < cfg.loop.min_sim3_inliers:
            return None
        # 4. guided projection against the loop group's map points
        # (searchByProjectionInSim, >= 40 total, loopClosing.cpp:196-227)
        total = self._count_guided_matches(kf1, kf2, S_ref)
        if total < cfg.loop.min_total_matches:
            return None
        return S_ref, total

    def _count_guided_matches(self, kf1: int, kf2: int, S_12) -> int:
        """Project the loop group's points into kf1 through the corrected
        pose and count descriptor hits."""
        sys = self.system
        m = sys.map
        covis_np = np.asarray(m.covis[kf2])
        group = [kf2] + [int(k) for k in np.argsort(-covis_np)[:10] if covis_np[k] > 0]
        ids = np.unique(
            np.concatenate([np.asarray(m.kf_mp[k]) for k in group])
        )
        ids = ids[ids >= 0][: sys.cfg.capacity.tracking_points]
        pad = sys.cfg.capacity.tracking_points - len(ids)
        idsp = np.pad(ids, (0, pad), constant_values=-1)
        idc = jnp.clip(jnp.asarray(idsp), 0, m.M - 1)
        valid = (jnp.asarray(idsp) >= 0) & m.mp_valid[idc]
        # corrected kf1 pose: S_cw = S_12 @ T_2w
        S_cw = S_12 @ m.kf_pose[kf2]
        T_cw = sim3_to_se3(S_cw)
        from ..ops.extractor import FrameFeatures

        feats = FrameFeatures(
            uv=m.kf_uv[kf1], uv_raw=m.kf_uv[kf1],
            response=jnp.zeros((m.N,)), octave=m.kf_octave[kf1],
            angle=m.kf_angle[kf1], desc=m.kf_desc[kf1],
            right_u=m.kf_right_u[kf1], depth=m.kf_depth[kf1],
            valid=m.kf_kp_valid[kf1],
        )
        assign, _ = match_local_points(
            sys.cam, feats, T_cw,
            m.mp_pos[idc], m.mp_desc[idc], m.mp_normal[idc],
            m.mp_max_dist[idc], m.mp_min_dist[idc], valid,
            th=2.0, n_levels=sys.cfg.orb.n_levels,
            scale_factor=sys.cfg.orb.scale_factor,
        )
        return int(jnp.sum(assign >= 0))

    # ------------------------------------------------------------------
    def _correct(self, kf1: int, kf2: int, S_12) -> None:
        """Loop correction (loopClosing.cpp:229-337) + global BA."""
        sys = self.system
        m = sys.map
        cfg = sys.cfg
        K = m.K
        old_poses = m.kf_pose  # snapshot (non-corrected)

        # Corrected Sim3 for kf1 and its covisible group.
        # One batched program corrects the whole covisible group and its
        # points (loopClosing.cpp:250-305 walks them one mutex-guarded
        # object at a time; per-member device dispatches through the
        # remote tunnel would cost a round trip each at K=512 scale).
        S_cw_corr = S_12 @ m.kf_pose[kf2]
        group = np.where((np.asarray(m.covis[kf1]) > 0) & np.asarray(m.kf_valid))[0]
        group = np.unique(np.concatenate([group, [kf1]]))
        group_j = jnp.asarray(group, jnp.int32)
        T_old_kf1_inv = inv_T(old_poses[kf1])
        corrected_g = jnp.einsum(
            "gij,jk->gik", old_poses[group_j] @ T_old_kf1_inv, S_cw_corr
        )  # (G,4,4) corrected Sim3 per group member
        corrected_host = np.asarray(corrected_g)
        corrected = {int(k): corrected_host[i] for i, k in enumerate(group)}

        # Move the group's map points through old^-1 then corrected pose
        # (loopClosing.cpp:263-287).
        pts = np.unique(np.concatenate([np.asarray(m.kf_mp[k]) for k in group]))
        pts = pts[pts >= 0]
        if len(pts):
            ptsj = jnp.asarray(pts)
            ref = np.asarray(m.mp_ref_kf)[pts]
            # use each point's strongest group keyframe: fall back to kf1
            use_kf = np.where(np.isin(ref, group), ref, kf1)
            g_index = {int(k): i for i, k in enumerate(group)}
            S_old = old_poses[jnp.asarray(use_kf)]
            S_new = corrected_g[
                jnp.asarray([g_index[int(k)] for k in use_kf], jnp.int32)
            ]
            p = m.mp_pos[ptsj]
            p_cam = jnp.einsum("nij,nj->ni", S_old[:, :3, :3], p) + S_old[:, :3, 3]
            S_new_inv = inv_T(S_new)  # corrected poses are SE3 (s=1)
            p_corr = (
                jnp.einsum("nij,nj->ni", S_new_inv[:, :3, :3], p_cam)
                + S_new_inv[:, :3, 3]
            )
            m = m._replace(mp_pos=m.mp_pos.at[ptsj].set(p_corr))

        # Write corrected keyframe poses (as SE3), one batched scatter.
        kf_pose = m.kf_pose.at[group_j].set(jax.vmap(sim3_to_se3)(corrected_g))
        m = m._replace(kf_pose=kf_pose, loop_edge=m.loop_edge.at[kf1].set(kf2))
        sys.map = m

        # Fuse loop-side points into the corrected group (searchAndFuse).
        for k in [int(kf1)] + [int(g) for g in group[:5] if g != kf1]:
            sys.map = _fuse_into_kf(
                sys.map, kf2, k, sys.cam, cfg.orb.scale_factor, cfg.orb.n_levels
            )

        # Essential graph over all keyframes.
        sys.map = self._essential_graph(sys.map, kf1, kf2, old_poses, corrected)

        # Global BA (10 iterations, loopClosing.cpp:380).
        sys.map = self._global_ba(sys.map)
        # Trajectory records referenced to pre-correction keyframe poses
        # stay valid: T_c_ref composes with the corrected keyframe pose.

    def _essential_graph(self, m: MapState, kf1, kf2, old_poses, corrected):
        cfg = self.system.cfg
        K = m.K
        covis = np.asarray(m.covis)
        kf_valid = np.asarray(m.kf_valid)
        parent = np.asarray(m.parent)
        loop_edge = np.asarray(m.loop_edge)
        ei, ej, meas, w = [], [], [], []
        # ONE device fetch; per-edge measurements are 4x4 numpy products
        # (a device op per edge costs a tunnel round trip each).
        old_np = np.asarray(old_poses)

        def add_edge(i, j, weight, use_corrected=False):
            if i < 0 or j < 0 or i == j or not (kf_valid[i] and kf_valid[j]):
                return
            if use_corrected:
                Si = corrected.get(i, old_np[i])
                Sj = corrected.get(j, old_np[j])
            else:
                Si, Sj = old_np[i], old_np[j]
            ei.append(i)
            ej.append(j)
            meas.append(Si @ np.linalg.inv(Sj))
            w.append(weight)

        for i in range(K):
            if not kf_valid[i]:
                continue
            add_edge(i, int(parent[i]), 1.0)
            if loop_edge[i] >= 0:
                add_edge(i, int(loop_edge[i]), 1.0, use_corrected=(i == kf1))
        # Strong-covisibility edges (weight >= 100, optimizer.cpp:608).
        strong = np.argwhere(
            np.triu(covis, 1) >= cfg.optim.essential_min_covis_weight
        )
        for i, j in strong:
            add_edge(int(i), int(j), 1.0)
        if not ei:
            return m
        E = len(ei)
        # Current (post-correction) poses as initial values.
        prob = PoseGraphProblem(
            S_iw=m.kf_pose,
            fixed=jnp.zeros(K, bool).at[kf2].set(True),
            vertex_valid=m.kf_valid,
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_meas=jnp.asarray(np.stack(meas).astype(np.float32)),
            edge_valid=jnp.ones(E, bool),
            edge_weight=jnp.ones(E),
        )
        S_opt = optimize_pose_graph(
            prob, iters=cfg.optim.essential_graph_iters, fix_scale=True
        )
        # Map points follow their reference keyframe's correction
        # (optimizer.cpp:630-661).
        ref = jnp.clip(m.mp_ref_kf, 0, K - 1)
        S_old_ref = m.kf_pose[ref]
        S_new_ref = S_opt[ref]
        p_cam = (
            jnp.einsum("nij,nj->ni", S_old_ref[:, :3, :3], m.mp_pos)
            + S_old_ref[:, :3, 3]
        )
        S_inv = inv_T(S_new_ref)  # fix_scale=True -> rigid
        p_new = (
            jnp.einsum("nij,nj->ni", S_inv[:, :3, :3], p_cam) + S_inv[:, :3, 3]
        )
        mp_pos = jnp.where(
            (m.mp_valid & (m.mp_ref_kf >= 0))[:, None], p_new, m.mp_pos
        )
        T_new = jax.vmap(sim3_to_se3)(S_opt)
        kf_pose = jnp.where(m.kf_valid[:, None, None], T_new, m.kf_pose)
        return m._replace(kf_pose=kf_pose, mp_pos=mp_pos)

    def _global_ba(self, m: MapState) -> MapState:
        """Full-map BA (globalBundleAdjust, optimizer.cpp:353-357).

        Point budget: ``capacity.global_ba_max_points``, selected by
        OBSERVATION COUNT when the map exceeds it (the best-constrained
        landmarks carry the solve; overflow is logged, never silent).
        Observations per point are compacted to ``global_ba_obs`` slots.
        On a multi-device mesh the solve runs map-block-partitioned
        (points sharded, psum-reduced camera system — SURVEY.md §2c P6);
        either path executes in bounded LM chunks with an abort check
        between chunks (the reference's interruptible global-BA thread,
        loopClosing.cpp:334 + optimizer.cpp:17-19 — ``abort_global_ba``
        on the LoopCloser requests an early stop)."""
        sys = self.system
        cfg = sys.cfg
        from .mapping import apply_local_ba, build_local_ba

        K = m.K
        win = jnp.where(m.kf_valid, jnp.arange(K, dtype=jnp.int32), -1)
        fixed = -jnp.ones((1,), jnp.int32)
        pts_cap = min(cfg.capacity.global_ba_max_points, m.M)
        n_obs_tab = jnp.sum(m.mp_obs_kf >= 0, axis=-1)
        n_valid = int(jnp.sum(m.mp_valid))
        if n_valid > pts_cap:
            print(
                f"[loop] global BA: map has {n_valid} points, optimizing "
                f"the {pts_cap} best-observed (capacity."
                f"global_ba_max_points); the rest follow their reference "
                f"keyframes' correction"
            )
        rank = jnp.where(m.mp_valid, n_obs_tab, -1)
        _, pts = jax.lax.top_k(rank, pts_cap)
        pts = jnp.where(
            jnp.take(rank, pts) >= 0, pts.astype(jnp.int32), -1
        )
        prob, obs_sel = build_local_ba(
            m, win, fixed, pts, sys.inv_sigma2_tab,
            obs_cap=cfg.capacity.global_ba_obs,
        )
        devices = jax.devices()
        should_abort = getattr(self.closer, "should_abort_ba", None)
        if len(devices) > 1:
            from jax.sharding import Mesh
            from ..parallel.ba_sharded import sharded_bundle_adjust

            mesh = Mesh(np.asarray(devices), axis_names=("pts",))
            T_new, p_new, outlier = sharded_bundle_adjust(
                mesh, sys.cam, prob, iters=cfg.optim.global_ba_iters,
                chunk=5, should_abort=should_abort,
            )
        else:
            from ..optim.schur import chunked_global_ba

            T_new, p_new, outlier = chunked_global_ba(
                sys.cam, prob, iters=cfg.optim.global_ba_iters,
                chunk=5, should_abort=should_abort,
            )
        return apply_local_ba(m, win, pts, T_new[: K], p_new, outlier, obs_sel)
