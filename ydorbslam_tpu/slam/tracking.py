"""Per-frame tracking: the front-end state machine.

Replaces the reference ``Tracking`` class (src/tracking.cpp): the state
machine NOT_INITIALIZED -> OK -> LOST (src/enumclass.hpp), stereo/depth
map initialization (tracking.cpp:333-367), motion-model tracking with
widened-window retry (:442-488), local-map tracking (:605-637), keyframe
decision (:740) and trajectory bookkeeping (:318-331).

Architecture (SURVEY.md §2c P1/P5): the control flow lives on host in
plain Python — it is cheap, branchy and frame-serial — while every
compute step (extraction, matching, pose LM) is a fused jitted program
on fixed-capacity arrays.  There are no threads and no mutexes: each
step consumes and returns immutable array state.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig, camera_intrinsics
from ..geometry.camera import backproject
from ..geometry.se3 import inv_T
from ..ops.extractor import FrameFeatures, extract_orb
from ..ops.pyramid import build_pyramid, level_sigma2
from ..ops.stereo import fill_depth_from_rgbd, stereo_match
from ..optim.pose import PoseObservations, optimize_pose
from .matchers import match_dense, match_local_points, match_motion_model


class TrackingState(enum.Enum):
    """Mirror of the reference TrackingState (src/enumclass.hpp:5-11)."""

    NO_IMAGE_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclasses.dataclass
class FrameRecord:
    """Per-frame trajectory bookkeeping (tracking.hpp:59-62 lists)."""

    timestamp: float
    T_cw: np.ndarray  # absolute pose at track time (4,4)
    ref_kf: int  # reference keyframe id (-1 before mapping exists)
    T_c_ref: Optional[np.ndarray]  # pose relative to the reference KF
    lost: bool


def landmark_positions(cam, feats: FrameFeatures, T_cw: jax.Array):
    """Backproject a frame's depth measurements to world points.

    (Frame::inverseProject, src/frame.cpp:473-484, batched.)
    """
    p_c = backproject(cam, feats.uv, jnp.maximum(feats.depth, 1e-3))
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    p_w = (p_c - t) @ R  # R^T (p - t)
    return p_w, feats.valid & (feats.depth > 0)


@jax.jit
def _pose_obs_from_assign(
    assign, curr: FrameFeatures, src_p_w, src_valid, inv_sigma2_tab
):
    """Build fixed-capacity PoseObservations from a match assignment."""
    ok = (assign >= 0) & curr.valid
    m = jnp.clip(assign, 0, src_p_w.shape[0] - 1)
    p_w = src_p_w[m]
    ok = ok & src_valid[m]
    obs = jnp.concatenate([curr.uv, curr.right_u[:, None]], axis=-1)
    return PoseObservations(
        p_w=p_w,
        obs_uvr=obs,
        inv_sigma2=inv_sigma2_tab[curr.octave],
        has_stereo=curr.right_u >= 0,
        valid=ok,
    )


class Tracker:
    """Frame-to-frame tracker (the minimum end-to-end slice).

    Covers grabImageRGBD/Stereo -> track() for the no-mapping
    configuration: motion-model projection matching against the last
    frame's depth-seeded landmarks + pose-only LM.  Local-map tracking
    and keyframe creation plug in via the ``local_map_hook`` (installed
    by slam.system when mapping is enabled).
    """

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.cam = camera_intrinsics(cfg)
        self.state = TrackingState.NO_IMAGE_YET
        self.inv_sigma2_tab = jnp.asarray(
            1.0 / level_sigma2(cfg.orb.n_levels, cfg.orb.scale_factor)
        )
        self.T_cw = jnp.eye(4)
        self.velocity = jnp.eye(4)
        self.last_feats: Optional[FrameFeatures] = None
        self.last_lms = None
        self.last_lms_valid = None
        self.records: List[FrameRecord] = []
        self.local_map_hook = None  # set by System when mapping runs
        self.new_kf_hook = None
        self.reloc_hook = None  # set by System: BoW + PnP relocalization
        self.pending_landmarks = None  # (p_w, valid) supplied by the hook
        self.n_inliers = 0
        # Frames since the last successful relocalization: within 1 s
        # (= fps frames) the local-map gate tightens to 50 inliers
        # (tracking.cpp:630-636).
        self.frames_since_reloc = 1 << 20

    # -- per-sensor frame ingestion ------------------------------------
    def _extract(self, gray: np.ndarray) -> FrameFeatures:
        o = self.cfg.orb
        has_dist = any(
            abs(k) > 0 for k in (
                self.cfg.camera.k1, self.cfg.camera.k2, self.cfg.camera.p1,
                self.cfg.camera.p2, self.cfg.camera.k3,
            )
        )
        return extract_orb(
            jnp.asarray(gray), self.cam,
            n_features=o.n_features, capacity=self.cfg.n_keypoints,
            n_levels=o.n_levels, scale_factor=o.scale_factor,
            th_high=o.ini_th_fast, th_low=o.min_th_fast,
            subpixel=o.subpixel,
            has_distortion=has_dist,
        )

    def track_rgbd(self, timestamp: float, gray: np.ndarray, depth: np.ndarray):
        """System::trackRGBD -> Tracking::grabImageRGBD (tracking.cpp:96-118)."""
        feats = self._extract(gray)
        depth = np.asarray(depth)
        if depth.dtype == np.uint16:  # sensor-native TUM encoding
            depth = depth.astype(np.float32) / self.cfg.depth.depth_map_factor
        feats = fill_depth_from_rgbd(
            feats, jnp.asarray(depth, jnp.float32), self.cam
        )
        return self._track(timestamp, feats)

    def track_stereo(self, timestamp: float, gray_l: np.ndarray, gray_r: np.ndarray):
        """System::trackStereo: dual extraction + stereo matching
        (src/frame.cpp:60-105)."""
        fl = self._extract(gray_l)
        fr = self._extract(gray_r)
        o = self.cfg.orb
        pl = build_pyramid(jnp.asarray(gray_l, jnp.float32), o.n_levels, o.scale_factor)
        pr = build_pyramid(jnp.asarray(gray_r, jnp.float32), o.n_levels, o.scale_factor)
        fl = stereo_match(fl, fr, pl, pr, self.cam, o.n_levels, o.scale_factor)
        return self._track(timestamp, fl)

    # -- core ----------------------------------------------------------
    def _initialize(self, timestamp: float, feats: FrameFeatures) -> bool:
        """Stereo/depth map init (tracking.cpp:333-367): needs > 500
        keypoints with depth (config tracking.min_init_depth_points)."""
        n_depth = int(jnp.sum(feats.valid & (feats.depth > 0)))
        if n_depth < self.cfg.tracking.min_init_depth_points:
            return False
        self.T_cw = jnp.eye(4)
        self._adopt_frame(feats)
        self.state = TrackingState.OK
        if self.new_kf_hook is not None:
            self.new_kf_hook(timestamp, feats, self.T_cw, force=True)
        return True

    def _adopt_frame(self, feats: FrameFeatures):
        self.last_feats = feats
        if self.pending_landmarks is not None:
            # The local-map hook supplies map-point positions where the
            # frame was matched to the map (higher quality than raw depth).
            self.last_lms, self.last_lms_valid = self.pending_landmarks
            self.pending_landmarks = None
        else:
            self.last_lms, self.last_lms_valid = landmark_positions(
                self.cam, feats, self.T_cw
            )

    def _track(self, timestamp: float, feats: FrameFeatures):
        cfg = self.cfg
        lost = False
        if self.state in (TrackingState.NO_IMAGE_YET, TrackingState.NOT_INITIALIZED):
            self.state = TrackingState.NOT_INITIALIZED
            if not self._initialize(timestamp, feats):
                lost = True
        else:
            self.frames_since_reloc += 1
            if self.state == TrackingState.LOST and self.reloc_hook is not None:
                # LOST -> BoW relocalization only (tracking.cpp:257-259).
                ok = self.reloc_hook(self, timestamp, feats)
                if ok:
                    self.frames_since_reloc = 0
            else:
                T_pred = self.velocity @ self.T_cw
                ok = self._track_motion(feats, T_pred)
                if not ok:
                    # Reference falls back to reference-KF BoW tracking
                    # (tracking.cpp:375-406); our dense equivalent matches
                    # appearance-only against the last frame.
                    ok = self._track_appearance(feats, T_pred)
            if ok and self.local_map_hook is not None:
                ok = self.local_map_hook(self, timestamp, feats)
            if ok:
                T_last = self.T_cw  # pose before update
                # velocity = T_curr @ inv(T_last) (tracking.cpp:273-281)
                self.velocity = self.new_T @ jnp.linalg.inv(T_last)
                self.T_cw = self.new_T
                self._adopt_frame(feats)
                self.state = TrackingState.OK
            else:
                self.state = TrackingState.LOST
                lost = True

        self.records.append(
            FrameRecord(
                timestamp=timestamp,
                T_cw=np.asarray(self.T_cw),
                ref_kf=-1,
                T_c_ref=None,
                lost=lost,
            )
        )
        return not lost

    def _optimize_with_assign(self, feats, assign, T_init):
        po = _pose_obs_from_assign(
            assign, feats, self.last_lms, self.last_lms_valid, self.inv_sigma2_tab
        )
        T, inliers, n_in = optimize_pose(
            self.cam, T_init, po,
            episodes=self.cfg.optim.pose_episodes,
            iters_per_episode=self.cfg.optim.pose_iters_per_episode,
        )
        return T, int(n_in)

    def _track_motion(self, feats, T_pred) -> bool:
        cfg = self.cfg
        o = cfg.orb
        for th in (7.0, 14.0):  # widened retry (tracking.cpp:456-461)
            assign, _ = match_motion_model(
                self.cam, feats, self.last_feats, self.last_lms,
                self.last_lms_valid, T_pred, self.T_cw,
                th=th, n_levels=o.n_levels, scale_factor=o.scale_factor,
            )
            n_matches = int(jnp.sum(assign >= 0))
            if n_matches >= 20:
                T, n_in = self._optimize_with_assign(feats, assign, T_pred)
                if n_in >= cfg.tracking.min_matches_motion:
                    self.new_T = T
                    self.n_inliers = n_in
                    return True
        return False

    def _track_appearance(self, feats, T_pred) -> bool:
        """Fallback: appearance-only dense match vs last frame + LM from
        the LAST pose (the reference's trackReferenceKeyFrame analog)."""
        assign, _ = match_dense(
            self.last_feats.desc, self.last_feats.valid & self.last_lms_valid,
            self.last_feats.angle,
            feats.desc, feats.valid, feats.angle,
            max_dist=self.cfg.matcher.th_low, ratio=self.cfg.matcher.ratio_ref_kf,
        )
        if int(jnp.sum(assign >= 0)) < 15:
            return False
        T, n_in = self._optimize_with_assign(feats, assign, self.T_cw)
        if n_in >= self.cfg.tracking.min_matches_motion:
            self.new_T = T
            self.n_inliers = n_in
            return True
        return False

    # -- output --------------------------------------------------------
    def trajectory(self):
        """-> (timestamps, poses T_cw list, lost flags)."""
        return (
            [r.timestamp for r in self.records],
            [r.T_cw for r in self.records],
            [r.lost for r in self.records],
        )
