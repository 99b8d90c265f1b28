"""Generate a REAL-TEXTURE drifted-revisit TUM sequence (loop-closure
accuracy artifact, VERDICT r3 #3).

The OrbitDriftSequence recipe (tests/test_loop_organic.py:101-158)
rendered with REAL image texture instead of dots: the camera orbits
inside a texture-lined cylinder facing outward, completes a full
circuit and revisits its starting view.  The DEPTH channel carries an
additive bias growing by ``drift_rate`` m/frame, so RGB-D point seeding
accumulates genuine translation drift over the circuit — the condition
loop closing exists to repair (/root/reference/src/loopClosing.cpp:
229-337).  The image stream is exact (no noise), and ground truth is
exact.

The cylinder lining is an atlas of distinct variants of the reference
repo's photograph (flips/rotations/inversions) so no two azimuths show
the same texture — loop detection must fire from a TRUE revisit, not
perceptual aliasing.

Output: standard TUM directory (rgb/, depth/ x5000, assoc.txt,
groundtruth.txt, TUM1-style YAML at the reference default gates).

Usage: python tools/make_orbit_tum.py OUT_DIR [n_circuit] [tail] [drift_rate]
"""
import os
import sys

import numpy as np
from PIL import Image
from scipy.ndimage import map_coordinates
from scipy.spatial.transform import Rotation

sys.path.insert(0, os.path.dirname(__file__))
from make_warped_tum import (  # noqa: E402
    CX, CY, DEPTH_FACTOR, FX, FY, H, K, W, YAML, base_texture,
)

CYL_R = 5.0  # cylinder radius (m) — straight-ahead depth 2.5 m keeps a
# large close-point fraction under the reference default ThDepth
# (40 * bf / fx = 3.05 m), so depth seeding & the close-point keyframe
# rules run exactly as on a real TUM desk sequence
ORBIT = 2.5  # camera orbit radius (m)
CYL_HALF_H = 3.2  # texture covers y in [-h, +h]


def atlas():
    """Horizontally-concatenated DISTINCT variants of the photo."""
    a = base_texture()  # (480, 640)
    tiles = [
        a,
        np.fliplr(a),
        np.flipud(a),
        np.fliplr(np.flipud(a)),
        255.0 - a,
        np.clip(255.0 * (a / 255.0) ** 0.5, 0, 255),
        np.fliplr(255.0 - a),
        np.clip(255.0 * (a / 255.0) ** 2.0, 0, 255),
    ]
    return np.concatenate(tiles, axis=1)  # (480, 5120)


def pose(i, n_circuit):
    """T_cw: camera on the orbit circle, facing radially outward."""
    phi = 2 * np.pi * i / n_circuit
    R_wc = Rotation.from_euler("y", phi).as_matrix()
    c = ORBIT * np.array([np.sin(phi), 0.0, np.cos(phi)])
    T = np.eye(4)
    T[:3, :3] = R_wc.T
    T[:3, 3] = -R_wc.T @ c
    return T


def render_cyl(tex, T_cw, depth_bias):
    """Exact ray/cylinder render + biased depth."""
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    Rwc = R.T
    c = -Rwc @ t  # camera center, world
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    rays_c = np.stack(
        [(u - CX) / FX, (v - CY) / FY, np.ones_like(u)], 0
    )  # (3,H,W), z=1
    d_w = np.tensordot(Rwc, rays_c, axes=1)  # (3,H,W)
    # |c_xz + s d_xz|^2 = R^2, take the positive root (camera inside).
    a = d_w[0] ** 2 + d_w[2] ** 2
    b = 2 * (c[0] * d_w[0] + c[2] * d_w[2])
    cc = c[0] ** 2 + c[2] ** 2 - CYL_R ** 2
    disc = np.maximum(b * b - 4 * a * cc, 0.0)
    s = (-b + np.sqrt(disc)) / (2 * a)  # param along ray; depth z = s
    X = c[:, None, None] + s[None] * d_w  # world hit point
    theta = np.arctan2(X[0], X[2])  # [-pi, pi)
    th, tw = tex.shape
    tx = (theta + np.pi) / (2 * np.pi) * (tw - 1)
    ty = (X[1] + CYL_HALF_H) / (2 * CYL_HALF_H) * (th - 1)
    inside = (ty >= 0) & (ty <= th - 1) & (s > 0.1)
    gray = map_coordinates(tex, [ty, tx], order=1, mode="constant", cval=0.0)
    gray = np.where(inside, gray, 0.0)
    depth = np.where(inside, s + depth_bias, 0.0)
    return np.clip(np.round(gray), 0, 255).astype(np.uint8), depth


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/orbit_tum"
    n_circuit = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    tail = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    drift_rate = float(sys.argv[4]) if len(sys.argv) > 4 else 0.004
    # Optional multiplicative per-pixel depth noise (sigma as a fraction
    # of depth): the REALISTIC error model — each frame is internally
    # consistent (no chi2-gate violation), but frame-to-frame seeding
    # noise accumulates as genuine random-walk VO drift, exactly the
    # condition loop closure repairs on real sensors.
    noise_sigma = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0
    seed = int(sys.argv[6]) if len(sys.argv) > 6 else 12345
    os.makedirs(os.path.join(out, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out, "depth"), exist_ok=True)
    tex = atlas()
    n = n_circuit + tail
    assoc, gt = [], ["# timestamp tx ty tz qx qy qz qw"]
    rng = np.random.default_rng(seed)
    for i in range(n):
        ts = f"{i / 30.0:.6f}"
        T = pose(i, n_circuit)
        g, d = render_cyl(tex, T, drift_rate * i)
        if noise_sigma > 0:
            d = np.where(
                d > 0, d * (1.0 + noise_sigma * rng.standard_normal(d.shape)),
                d,
            )
        Image.fromarray(g).save(os.path.join(out, "rgb", f"{ts}.png"))
        d16 = np.clip(np.round(d * DEPTH_FACTOR), 0, 65535).astype(np.uint16)
        Image.fromarray(d16, mode="I;16").save(
            os.path.join(out, "depth", f"{ts}.png"))
        assoc.append(f"{ts} rgb/{ts}.png {ts} depth/{ts}.png")
        Rwc = T[:3, :3].T
        c = -Rwc @ T[:3, 3]
        q = Rotation.from_matrix(Rwc).as_quat()
        gt.append(
            f"{ts} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}"
        )
    open(os.path.join(out, "assoc.txt"), "w").write("\n".join(assoc))
    open(os.path.join(out, "groundtruth.txt"), "w").write("\n".join(gt))
    open(os.path.join(out, "TUM1_warped.yaml"), "w").write(YAML)
    print(f"wrote {n} frames ({n_circuit} circuit + {tail} tail, "
          f"drift {drift_rate} m/frame) to {out}")


if __name__ == "__main__":
    main()
