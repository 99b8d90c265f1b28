"""Synthetic world generation for tests and benchmarks.

The reference repo ships no test data beyond 3 loose images
(SURVEY.md §4); all correctness tests here run on synthetic scenes with
exact ground truth: a random 3D landmark field rendered as bright
square "dots" into ideal pinhole cameras along a known trajectory.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation


def make_landmarks(rng, n=400, x=6.0, y=4.0, z=(2.0, 8.0)):
    """Random 3D points in a frustum-ish box in front of the origin."""
    pts = np.stack(
        [
            rng.uniform(-x, x, n),
            rng.uniform(-y, y, n),
            rng.uniform(z[0], z[1], n),
        ],
        axis=-1,
    )
    return pts.astype(np.float64)


def project_np(K, T_cw, pts_w):
    """Project world points with 3x3 K and 4x4 T_cw -> (uv (N,2), z (N,))."""
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    pc = pts_w @ R.T + t
    z = pc[:, 2]
    uv = np.stack([K[0, 0] * pc[:, 0] / z + K[0, 2], K[1, 1] * pc[:, 1] / z + K[1, 2]], -1)
    return uv, z


def _landmark_patch(i, dot):
    """Deterministic random texture per landmark: makes landmarks
    visually DISTINCT so descriptor matching behaves like on real
    scenes (identical flat dots alias in appearance space and make
    every matcher test pathological).

    The texture is PEAKED: a dominant bright center so FAST/NMS selects
    one stable keypoint per landmark (multiple equally-strong corners
    would create systematic multi-keypoint misassociations), with dim
    unique surroundings feeding descriptor distinctiveness."""
    r = np.random.default_rng(1000 + i)
    patch = r.uniform(30.0, 130.0, (dot, dot)).astype(np.float32)
    c = dot // 2
    if dot >= 5:
        patch[c - 1 : c + 2, c - 1 : c + 2] = r.uniform(150.0, 250.0, (3, 3))
    patch[c, c] = 255.0
    return patch


def render_dots(
    uv, z, width=640, height=480, dot=3, intensities=None, background=20.0
):
    """Render landmarks as small textured patches; nearer ones win.

    Patch corners/texture are strong FAST responses and each landmark's
    texture is unique, so the frames exercise the real detector AND
    give descriptors real discriminative power.
    """
    img = np.full((height, width), background, dtype=np.float32)
    order = np.argsort(-z)  # far first, near painted over
    r = dot // 2
    for i in order:
        if z[i] <= 0.1:
            continue
        u, v = int(round(uv[i, 0])), int(round(uv[i, 1]))
        if r + 8 <= u < width - r - 8 and r + 8 <= v < height - r - 8:
            img[v - r : v + r + 1, u - r : u + r + 1] = _landmark_patch(i, dot)
    return img


def circular_trajectory(n_frames, radius=0.4, z_step=0.01, yaw_amp=0.05):
    """World-to-camera poses of a gently arcing forward motion."""
    from scipy.spatial.transform import Rotation

    poses = []
    for i in range(n_frames):
        t = i / max(n_frames - 1, 1)
        yaw = yaw_amp * np.sin(2 * np.pi * t)
        c_w = np.array([radius * np.sin(2 * np.pi * t * 0.25), 0.02 * np.sin(4 * t), z_step * i])
        R_wc = Rotation.from_euler("y", yaw).as_matrix()
        T_cw = np.eye(4)
        T_cw[:3, :3] = R_wc.T
        T_cw[:3, 3] = -R_wc.T @ c_w
        poses.append(T_cw)
    return poses


def oscillating_trajectory(n_frames, amp=(0.25, 0.18, 0.12), period=40.0,
                           yaw_amp=0.02):
    """Bounded sinusoidal handheld-style motion (TUM fr1/xyz-like).

    Unlike ``circular_trajectory`` (which drifts forward forever and so
    keeps EXPLORING new territory every frame), this stays inside one
    workspace: after the map covers the viewing volume, keyframe
    insertion settles to the occasional-refresh cadence real desk
    sequences produce."""
    from scipy.spatial.transform import Rotation

    poses = []
    for i in range(n_frames):
        ph = 2 * np.pi * i / period
        c_w = np.array([
            amp[0] * np.sin(ph),
            amp[1] * np.sin(0.7 * ph + 1.0),
            amp[2] * np.sin(0.5 * ph + 2.0),
        ])
        yaw = yaw_amp * np.sin(0.9 * ph)
        R_wc = Rotation.from_euler("y", yaw).as_matrix()
        T_cw = np.eye(4)
        T_cw[:3, :3] = R_wc.T
        T_cw[:3, 3] = -R_wc.T @ c_w
        poses.append(T_cw)
    return poses


class SyntheticRgbdSequence:
    """Renders (gray, depth) frames of a static dot world with exact GT."""

    def __init__(self, rng, n_frames=30, n_landmarks=500, width=640, height=480,
                 fx=500.0, fy=500.0, cx=320.0, cy=240.0, trajectory="circular"):
        self.K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        self.width, self.height = width, height
        self.landmarks = make_landmarks(rng, n_landmarks)
        self.intensities = rng.uniform(100.0, 250.0, n_landmarks)
        self.poses = (
            oscillating_trajectory(n_frames) if trajectory == "xyz"
            else circular_trajectory(n_frames)
        )

    def __len__(self):
        return len(self.poses)

    def frame(self, i):
        """-> (timestamp, gray (H,W) f32, depth (H,W) f32 meters)."""
        uv, z = project_np(self.K, self.poses[i], self.landmarks)
        img = render_dots(uv, z, self.width, self.height, intensities=self.intensities)
        depth = np.zeros((self.height, self.width), np.float32)
        r = 1
        order = np.argsort(-z)
        for j in order:
            u, v = int(round(uv[j, 0])), int(round(uv[j, 1]))
            if 10 <= u < self.width - 10 and 10 <= v < self.height - 10 and z[j] > 0.1:
                depth[v - r : v + r + 2, u - r : u + r + 2] = z[j]
        return i / 30.0, img, depth


class OrbitDriftSequence:
    """Camera orbits inside the landmark cylinder facing outward; the
    DEPTH channel carries an additive bias that grows by ``drift_rate``
    m/frame, so RGB-D point seeding accumulates genuine translation
    drift over the circuit — the classic condition loop closure exists
    to repair (loopClosing.cpp:229-337).  The image stream is exact.
    (A multiplicative SCALE drift is deliberately NOT used: the Sim3
    solver fixes scale for stereo/RGB-D exactly like the reference,
    loopClosing.cpp:132, so a scale error is unverifiable by design.)"""

    def __init__(self, rng, n_frames=40, n_landmarks=900, radius=6.0,
                 orbit=2.5, drift_rate=0.008):
        self.n_frames = n_frames
        self.drift_rate = drift_rate
        self.orbit = orbit
        theta = rng.uniform(0, 2 * np.pi, n_landmarks)
        y = rng.uniform(-2.5, 2.5, n_landmarks)
        r = radius + rng.uniform(-1.0, 1.0, n_landmarks)
        self.landmarks = np.stack(
            [r * np.sin(theta), y, r * np.cos(theta)], -1
        )

    def pose(self, i):
        """T_cw: camera on the orbit circle, facing radially outward."""
        phi = 2 * np.pi * (i % self.n_frames) / self.n_frames
        R_wc = Rotation.from_euler("y", phi).as_matrix()
        c = self.orbit * np.array([np.sin(phi), 0.0, np.cos(phi)])
        T = np.eye(4)
        T[:3, :3] = R_wc.T
        T[:3, 3] = -R_wc.T @ c
        return T

    def gt_center_est_frame(self, i):
        """GT camera center expressed in the estimator's world frame
        (= the first camera's frame)."""
        phi = 2 * np.pi * (i % self.n_frames) / self.n_frames
        c_w = self.orbit * np.array([np.sin(phi), 0.0, np.cos(phi)])
        T0 = self.pose(0)
        return T0[:3, :3] @ c_w + T0[:3, 3]

    def frame(self, i):
        T = self.pose(i)
        pc = self.landmarks @ T[:3, :3].T + T[:3, 3]
        z = pc[:, 2]
        uv = np.stack(
            [500 * pc[:, 0] / np.where(z > 0.1, z, 1) + 320,
             500 * pc[:, 1] / np.where(z > 0.1, z, 1) + 240], -1,
        )
        uv[z <= 0.1] = -100
        img = render_dots(uv, z, 640, 480, dot=7)
        depth = np.zeros((480, 640), np.float32)
        order = np.argsort(-z)
        bias = self.drift_rate * i  # keeps growing, never wraps
        for j in order:
            u, v = int(round(uv[j, 0])), int(round(uv[j, 1]))
            if 10 <= u < 630 and 10 <= v < 470 and z[j] > 0.1:
                depth[v - 1 : v + 3, u - 1 : u + 3] = z[j] + bias
        return i / 30.0, img, depth
