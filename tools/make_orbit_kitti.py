"""Generate a REAL-TEXTURE drifted-revisit KITTI-format STEREO sequence
(the stereo analog of make_orbit_tum.py; VERDICT r4 next #7: stereo had
no revisit artifact — the KITTI use case is loop-heavy and feeds the
same loop pipeline, reference src/frame.cpp:362-471 + loopClosing.cpp).

Camera orbits inside the texture-lined cylinder (distinct photo
variants per azimuth — closures must come from a TRUE revisit) and
re-approaches its start.  Left/right are exact ray renders from two
cameras separated by the calibrated baseline.  Stereo depth comes from
matched disparity, so the depth channel cannot carry an injected bias;
drift is induced the way it happens on real rigs — a small BASELINE
CALIBRATION ERROR: the yaml/calib advertise bf = fx*b*(1+eps) while
the true rig renders at b.  Every triangulated point lands a factor
(1+eps) too far, frame-to-frame geometry stays self-consistent
(chi2-healthy), and the accumulated map warp grows coherently around
the circuit — exactly the condition loop closure repairs.

Usage: python tools/make_orbit_kitti.py OUT [n_circuit] [tail] [bf_eps]
"""
import os
import sys

import numpy as np
from scipy.spatial.transform import Rotation

sys.path.insert(0, os.path.dirname(__file__))
from make_orbit_tum import CYL_R, ORBIT, atlas, pose, render_cyl  # noqa: E402
from make_warped_tum import CX, CY, FX, FY  # noqa: E402

BASELINE = 0.12  # true rig baseline (m)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/orbit_kitti"
    n_circuit = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    tail = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    bf_eps = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    os.makedirs(os.path.join(out, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(out, "image_1"), exist_ok=True)
    from PIL import Image

    tex = atlas()
    Tb = np.eye(4)
    Tb[0, 3] = -BASELINE  # X_cr = X_cl - [b,0,0]
    times, prows = [], []
    n = n_circuit + tail
    for i in range(n):
        T = pose(i, n_circuit)
        gl, _ = render_cyl(tex, T, 0.0)
        gr, _ = render_cyl(tex, Tb @ T, 0.0)
        Image.fromarray(gl).save(os.path.join(out, "image_0", f"{i:06d}.png"))
        Image.fromarray(gr).save(os.path.join(out, "image_1", f"{i:06d}.png"))
        times.append(f"{i / 10.0:.6e}")
        Twc = np.linalg.inv(T)
        prows.append(" ".join(f"{x:.6e}" for x in Twc[:3].reshape(12)))
    open(os.path.join(out, "times.txt"), "w").write("\n".join(times))
    open(os.path.join(out, "poses.txt"), "w").write("\n".join(prows))
    # calib: P0/P1 with the ADVERTISED (mis-calibrated) baseline.
    bf = FX * BASELINE * (1.0 + bf_eps)
    p0 = f"P0: {FX:.6e} 0 {CX:.6e} 0 0 {FY:.6e} {CY:.6e} 0 0 0 1 0"
    p1 = (f"P1: {FX:.6e} 0 {CX:.6e} {-bf:.6e} 0 {FY:.6e} {CY:.6e} 0 "
          f"0 0 1 0")
    open(os.path.join(out, "calib.txt"), "w").write(p0 + "\n" + p1 + "\n")
    print(f"wrote {n} stereo frames ({n_circuit} circuit + {tail} tail, "
          f"bf eps {bf_eps}) to {out}")


if __name__ == "__main__":
    main()
