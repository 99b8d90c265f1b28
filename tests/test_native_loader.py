"""Native C++ dataset loader vs the PIL reference implementation."""
import os
import subprocess

import numpy as np
import pytest

from ydorbslam_tpu.io.native_loader import (
    NativeTumLoader,
    build_native,
    native_available,
)
from ydorbslam_tpu.io.tum import TumRgbdDataset


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(5)
    root = tmp_path_factory.mktemp("tum")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    lines = []
    for i in range(3):
        ts = f"{100.0 + i:.6f}"
        g = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        d = rng.integers(0, 20000, (48, 64)).astype(np.uint16)
        Image.fromarray(g).save(root / "rgb" / f"{ts}.png")
        # 16-bit grayscale PNG ('I;16' saves as 16-bit)
        Image.fromarray(d, mode="I;16").save(root / "depth" / f"{ts}.png")
        lines.append(f"{ts} rgb/{ts}.png {ts} depth/{ts}.png")
    (root / "assoc.txt").write_text("\n".join(lines))
    return root


def test_native_matches_pil(tum_dir):
    if not native_available() and not build_native():
        pytest.skip("native toolchain unavailable")
    ld = NativeTumLoader(str(tum_dir), str(tum_dir / "assoc.txt"), 5000.0,
                         width=64, height=48)
    ref = TumRgbdDataset(str(tum_dir), str(tum_dir / "assoc.txt"), 5000.0)
    assert len(ld) == 3
    for i, (t, g, d) in enumerate(ld):
        t2, g2, d2 = ref[i]
        assert abs(t - t2) < 1e-6
        np.testing.assert_allclose(g, g2, atol=0.51)  # 8-bit rounding
        np.testing.assert_allclose(d, d2, atol=1e-4)
    ld.close()


def test_native_rgb_decode(tum_dir, tmp_path):
    if not native_available() and not build_native():
        pytest.skip("native toolchain unavailable")
    from PIL import Image

    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    ts = "200.000000"
    (tum_dir / "rgb2").mkdir(exist_ok=True)
    Image.fromarray(rgb).save(tum_dir / "rgb2" / f"{ts}.png")
    (tum_dir / "assoc2.txt").write_text(
        f"{ts} rgb2/{ts}.png {ts} depth/100.000000.png"
    )
    ld = NativeTumLoader(str(tum_dir), str(tum_dir / "assoc2.txt"), 5000.0,
                         width=64, height=48)
    t, g, d = ld.next()
    expect = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
    np.testing.assert_allclose(g, expect, atol=0.6)
    ld.close()
