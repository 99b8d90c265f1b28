"""Generate a REAL-TEXTURE KITTI-format STEREO sequence from the
reference repo's photograph (the stereo analog of make_warped_tum.py;
VERDICT r3 #4: the stereo path had no accuracy artifact).

Left and right images are plane-induced homography warps of the same
textured plane from two cameras separated by the calibrated baseline
(right camera displaced +b along the left camera's x axis, exactly the
rectified-stereo geometry the reference's row-band matcher assumes,
src/frame.cpp:362-471).  Ground truth is exact.  Output layout matches
a KITTI odometry sequence: image_0/, image_1/, times.txt, calib.txt,
poses.txt.

Usage: python tools/make_warped_kitti.py OUT_DIR [n_frames] [scale]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from make_warped_tum import (  # noqa: E402
    CX, CY, FX, FY, H, K, PLANE_D, PLANE_N, W, base_texture, render,
    trajectory,
)

BASELINE = 0.12  # meters (bf = fx * b = 63.0)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/warped_kitti"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    os.makedirs(os.path.join(out, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(out, "image_1"), exist_ok=True)
    from PIL import Image

    tex = base_texture()
    poses = trajectory(n, scale)
    Tb = np.eye(4)
    Tb[0, 3] = -BASELINE  # X_cr = X_cl - [b,0,0]
    times, prows = [], []
    for i, T in enumerate(poses):
        gl, _ = render(tex, T)
        gr, _ = render(tex, Tb @ T)
        Image.fromarray(gl).save(os.path.join(out, "image_0", f"{i:06d}.png"))
        Image.fromarray(gr).save(os.path.join(out, "image_1", f"{i:06d}.png"))
        times.append(f"{i / 10.0:.6e}")
        Twc = np.linalg.inv(T)
        prows.append(" ".join(f"{x:.6e}" for x in Twc[:3].reshape(12)))
    open(os.path.join(out, "times.txt"), "w").write("\n".join(times))
    open(os.path.join(out, "poses.txt"), "w").write("\n".join(prows))
    P0 = f"P0: {FX:.6e} 0 {CX:.6e} 0 0 {FY:.6e} {CY:.6e} 0 0 0 1 0"
    P1 = (
        f"P1: {FX:.6e} 0 {CX:.6e} {-FX * BASELINE:.6e} "
        f"0 {FY:.6e} {CY:.6e} 0 0 0 1 0"
    )
    open(os.path.join(out, "calib.txt"), "w").write(P0 + "\n" + P1 + "\n")
    print(f"wrote {n} stereo frames to {out} (baseline {BASELINE} m)")


if __name__ == "__main__":
    main()
