"""Generate a REAL-TEXTURE TUM-format RGB-D sequence from the
reference repo's own photograph.

The environment has no network access to TUM servers, so the accuracy
artifact (docs/ACCURACY.md) is produced on a sequence with REAL image
statistics and EXACT ground truth: the reference's photo
(/root/reference/test/data/same-picture-different-angles.jpg, 650x476)
textures a slanted plane ~2.2-3.2 m in front of the camera; each frame
is the exact plane-induced homography warp H = K (R + t n^T / d) K^-1
of frame 0, and the depth map is the exact per-pixel ray/plane
intersection.  The camera follows a bounded handheld-style oscillation
(the TUM fr1/xyz workload shape).  Output layout matches a TUM
sequence: rgb/, depth/ (uint16 x5000), assoc.txt, groundtruth.txt,
plus a TUM1-style YAML.

Usage: python tools/make_warped_tum.py OUT_DIR [n_frames]
"""
import os
import sys

import numpy as np
from PIL import Image
from scipy.ndimage import map_coordinates
from scipy.spatial.transform import Rotation

W, H = 640, 480
FX = FY = 525.0
CX, CY = 319.5, 239.5
DEPTH_FACTOR = 5000.0
PLANE_N = np.array([0.15, 0.10, 1.0])
PLANE_N = PLANE_N / np.linalg.norm(PLANE_N)
PLANE_D = 2.6  # n . X = d  (meters)

K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])
REF_IMG = "/root/reference/test/data/same-picture-different-angles.jpg"


def base_texture():
    img = Image.open(REF_IMG).convert("L")
    a = np.asarray(img, dtype=np.float32)
    h, w = a.shape
    # center-crop / pad to 640x480 with reflected edges
    out = np.zeros((H, W), np.float32)
    ch, cw = min(h, H), min(w, W)
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    oy, ox = (H - ch) // 2, (W - cw) // 2
    out[oy:oy + ch, ox:ox + cw] = a[y0:y0 + ch, x0:x0 + cw]
    if oy:
        out[:oy] = out[2 * oy:oy:-1]
        out[oy + ch:] = out[oy + ch - 1:oy + ch - 1 - (H - oy - ch):-1]
    if ox:
        out[:, :ox] = out[:, 2 * ox:ox:-1]
        out[:, ox + cw:] = out[:, ox + cw - 1:ox + cw - 1 - (W - ox - cw):-1]
    return out


def trajectory(n, scale=1.0):
    """Bounded oscillation + small rotations; returns list of T_cw."""
    poses = []
    for i in range(n):
        ph = 2 * np.pi * i / 60.0
        c = scale * np.array([
            0.14 * np.sin(ph),
            0.10 * np.sin(0.7 * ph + 1.0),
            0.08 * np.sin(0.5 * ph + 2.0),
        ])
        rot = Rotation.from_euler(
            "yxz",
            [scale * 0.03 * np.sin(0.9 * ph),
             scale * 0.02 * np.sin(0.6 * ph + 0.5),
             scale * 0.01 * np.sin(0.4 * ph)],
        ).as_matrix()
        T = np.eye(4)
        T[:3, :3] = rot.T
        T[:3, 3] = -rot.T @ c
        poses.append(T)
    return poses


def render(tex, T_cw):
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    Hm = K @ (R + np.outer(t, PLANE_N) / PLANE_D) @ np.linalg.inv(K)
    Hinv = np.linalg.inv(Hm)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    ones = np.ones_like(u)
    x0 = Hinv @ np.stack([u.ravel(), v.ravel(), ones.ravel()])
    x0 = x0[:2] / x0[2]
    gray = map_coordinates(
        tex, [x0[1].reshape(H, W), x0[0].reshape(H, W)], order=1, mode="constant",
        cval=0.0,
    )
    # exact plane depth: n_c . X_c = d_c in the camera frame
    n_c = R @ PLANE_N
    d_c = PLANE_D + n_c @ t
    ray = np.linalg.inv(K) @ np.stack([u.ravel(), v.ravel(), ones.ravel()])
    s = d_c / (n_c @ ray)
    depth = s.reshape(H, W)  # ray z-component is 1 -> depth = s
    # invalidate pixels whose texture sample fell outside frame 0
    inside = (
        (x0[0] >= 0) & (x0[0] <= W - 1) & (x0[1] >= 0) & (x0[1] <= H - 1)
    ).reshape(H, W)
    depth = np.where(inside & (depth > 0), depth, 0.0)
    return np.clip(np.round(gray), 0, 255).astype(np.uint8), depth


YAML = f"""%YAML:1.0
Camera.fx: {FX}
Camera.fy: {FY}
Camera.cx: {CX}
Camera.cy: {CY}
LeftCamera.k1: 0.0
LeftCamera.k2: 0.0
LeftCamera.p1: 0.0
LeftCamera.p2: 0.0
LeftCamera.k3: 0.0
Camera.width: {W}
Camera.height: {H}
Camera.fps: 30.0
Camera.bf: 40.0
Camera.RGB: 1
ThDepth: 40.0
DepthMapFactor: {DEPTH_FACTOR}
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/warped_tum"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    os.makedirs(os.path.join(out, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out, "depth"), exist_ok=True)
    tex = base_texture()
    poses = trajectory(n, scale)
    assoc, gt = [], ["# timestamp tx ty tz qx qy qz qw"]
    for i, T in enumerate(poses):
        ts = f"{i / 30.0:.6f}"
        g, d = render(tex, T)
        Image.fromarray(g).save(os.path.join(out, "rgb", f"{ts}.png"))
        d16 = np.clip(np.round(d * DEPTH_FACTOR), 0, 65535).astype(np.uint16)
        Image.fromarray(d16, mode="I;16").save(
            os.path.join(out, "depth", f"{ts}.png"))
        assoc.append(f"{ts} rgb/{ts}.png {ts} depth/{ts}.png")
        Rwc = T[:3, :3].T
        c = -Rwc @ T[:3, 3]
        q = Rotation.from_matrix(Rwc).as_quat()  # x y z w
        gt.append(
            f"{ts} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}"
        )
    open(os.path.join(out, "assoc.txt"), "w").write("\n".join(assoc))
    open(os.path.join(out, "groundtruth.txt"), "w").write("\n".join(gt))
    open(os.path.join(out, "TUM1_warped.yaml"), "w").write(YAML)
    print(f"wrote {n} frames to {out}")


if __name__ == "__main__":
    main()
