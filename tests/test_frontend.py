"""Frontend kernel tests: pyramid, FAST, selection, descriptors, stereo.

Golden-value strategy (SURVEY.md §4): synthetic images with planted
corners and exact geometry, plus numpy re-implementations for the
bit-level ops.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ydorbslam_tpu.geometry import CameraIntrinsics
from ydorbslam_tpu.ops import (
    INVALID_DIST,
    build_pyramid,
    distance_matrix,
    extract_orb,
    fast_score_map,
    fill_depth_from_rgbd,
    filter_matches_by_rotation,
    gaussian_blur,
    level_budgets,
    nms_and_border,
    pyramid_shapes,
    ratio_test_matches,
    select_topk_cells,
    stereo_match,
    two_threshold_mask,
)
from ydorbslam_tpu.ops.descriptors import (
    brief_from_patches,
    brief_pattern,
    extract_patches,
    orientation_from_patches,
)

CAM = CameraIntrinsics.create(500.0, 500.0, 320.0, 240.0, bf=50.0, width=640, height=480)


def checkerboard(h=480, w=640, sq=32):
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy // sq) + (xx // sq)) % 2 * 200.0 + 20).astype(np.float32)


class TestPyramid:
    def test_shapes(self):
        shapes = pyramid_shapes(480, 640, 8, 1.2)
        assert shapes[0] == (480, 640)
        assert shapes[1] == (400, 533)
        assert len(shapes) == 8
        pyr = build_pyramid(jnp.asarray(checkerboard()), 8, 1.2)
        for lvl, (h, w) in zip(pyr, shapes):
            assert lvl.shape == (h, w)

    def test_downsample_preserves_mean(self):
        img = jnp.asarray(checkerboard())
        pyr = build_pyramid(img, 4, 1.2)
        m0 = float(img.mean())
        for lvl in pyr[1:]:
            assert abs(float(lvl.mean()) - m0) < 6.0

    def test_blur_preserves_mean_and_smooths(self):
        img = jnp.asarray(checkerboard())
        b = gaussian_blur(img)
        assert abs(float(b.mean()) - float(img.mean())) < 0.5
        assert float(jnp.abs(jnp.diff(b, axis=1)).mean()) < float(
            jnp.abs(jnp.diff(img, axis=1)).mean()
        )


class TestFast:
    def plant_dot(self, h=120, w=160, at=(60, 80), size=3, bright=200.0):
        img = np.full((h, w), 20.0, np.float32)
        v, u = at
        r = size // 2
        img[v - r : v + r + 1, u - r : u + r + 1] = bright
        return img

    def test_detects_planted_corner(self):
        img = self.plant_dot()
        score = fast_score_map(jnp.asarray(img))
        score = nms_and_border(score, 16)
        v, u = np.unravel_index(np.argmax(np.asarray(score)), score.shape)
        assert abs(v - 60) <= 2 and abs(u - 80) <= 2
        assert float(score[v, u]) > 50

    def test_flat_image_no_corners(self):
        score = fast_score_map(jnp.full((64, 64), 100.0))
        assert float(score.max()) == 0.0

    def test_two_threshold_fallback(self):
        # One strong dot and one weak dot in different 32px cells.
        img = self.plant_dot(128, 160, at=(40, 40), bright=220.0)
        img[100 - 1 : 100 + 2, 120 - 1 : 120 + 2] = 32.0  # weak (d=12)
        score = fast_score_map(jnp.asarray(img))
        score = nms_and_border(score, 16)
        out = np.asarray(two_threshold_mask(score, 32, 20.0, 7.0))
        assert out[40, 40] > 0  # strong survives high threshold
        assert out[100, 120] > 0  # weak survives via low-threshold fallback
        # but a weak corner in the SAME cell as a strong one is dropped
        img2 = self.plant_dot(128, 160, at=(40, 40), bright=220.0)
        img2[50 - 1 : 50 + 2, 44 - 1 : 44 + 2] = 32.0
        s2 = nms_and_border(fast_score_map(jnp.asarray(img2)), 16)
        out2 = np.asarray(two_threshold_mask(s2, 32, 20.0, 7.0))
        assert out2[50, 44] == 0


class TestSelect:
    def test_budgets(self):
        ks = level_budgets(1000, 8, 1.2)
        assert sum(ks) == 1000
        assert ks[0] > ks[1] > ks[-1] > 0

    def test_topk_positions(self):
        score = np.zeros((96, 128), np.float32)
        planted = [(20, 30, 50.0), (40, 90, 40.0), (70, 50, 30.0), (80, 100, 20.0)]
        for v, u, s in planted:
            score[v, u] = s
        uv, resp, valid = select_topk_cells(jnp.asarray(score), 6)
        uv, resp, valid = np.asarray(uv), np.asarray(resp), np.asarray(valid)
        assert valid.sum() == 4
        got = {(int(u), int(v)) for (u, v), ok in zip(uv, valid) if ok}
        assert got == {(30, 20), (90, 40), (50, 70), (100, 80)}
        assert resp[0] == 50.0  # sorted by response


class TestDescriptors:
    def test_pattern_properties(self):
        pat = brief_pattern()
        assert pat.shape == (256, 2, 2)
        assert pat.min() >= -13 and pat.max() <= 13

    def test_orientation_gradient(self):
        # Patch brighter on the +x side -> centroid to the right -> angle ~ 0.
        xx = np.tile(np.arange(31, dtype=np.float32), (31, 1))
        patches = jnp.stack([xx, xx.T], axis=0)
        ang = np.asarray(orientation_from_patches(patches))
        assert abs(ang[0]) < 0.05
        assert abs(ang[1] - np.pi / 2) < 0.05

    def test_extract_patches(self):
        img = jnp.asarray(np.arange(100.0 * 80).reshape(80, 100).astype(np.float32))
        uv = jnp.asarray([[50.0, 40.0], [10.0, 10.0]])
        p = extract_patches(img, uv, 3)
        assert p.shape == (2, 7, 7)
        assert float(p[0, 3, 3]) == float(img[40, 50])

    def test_brief_rotation_steering(self, rng):
        # A random-texture patch rotated by 90deg with angle passed in
        # should produce a (mostly) matching descriptor.
        base = rng.uniform(0, 255, size=(80, 80)).astype(np.float32)
        import scipy.ndimage as ndi

        sm = ndi.gaussian_filter(base, 2.0)
        rot = np.rot90(sm, k=-1).copy()  # rotation by -90deg: (x,y)->(−y,x)... sign checked below
        c = 40
        p0 = jnp.asarray(sm[c - 19 : c + 20, c - 19 : c + 20])[None]
        p90 = jnp.asarray(rot[c - 20 : c + 19, c - 20 : c + 19])[None]
        d0 = brief_from_patches(p0, jnp.asarray([0.0]))
        d90a = brief_from_patches(p90, jnp.asarray([np.pi / 2]))
        d90b = brief_from_patches(p90, jnp.asarray([-np.pi / 2]))
        dist_steered = int(
            np.asarray(distance_matrix(d0, d90a)).min(initial=256)
        ), int(np.asarray(distance_matrix(d0, d90b)).min(initial=256))
        dist_unsteered = int(np.asarray(distance_matrix(d0, brief_from_patches(p90, jnp.asarray([0.0]))))[0, 0])
        assert min(dist_steered) < 40  # steering recovers the descriptor
        assert dist_unsteered > 80  # without steering it's near-random

    def test_packing_shape_dtype(self, rng):
        patches = jnp.asarray(rng.uniform(0, 255, size=(5, 39, 39)).astype(np.float32))
        d = brief_from_patches(patches, jnp.zeros(5))
        assert d.shape == (5, 8) and d.dtype == jnp.uint32


class TestHamming:
    def test_distance_matrix_vs_numpy(self, rng):
        a = rng.integers(0, 2**32, size=(16, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, size=(12, 8), dtype=np.uint32)
        d = np.asarray(distance_matrix(jnp.asarray(a), jnp.asarray(b)))
        for i in range(16):
            for j in range(12):
                expect = bin(int.from_bytes(a[i].tobytes(), "little") ^ int.from_bytes(b[j].tobytes(), "little")).count("1")
                assert d[i, j] == expect

    def test_ratio_test(self):
        d = jnp.asarray([[10, 50, 60], [30, 31, 90], [200, 210, 220]])
        idx, best = ratio_test_matches(d, max_dist=100, ratio=0.8)
        assert int(idx[0]) == 0  # 10 < 0.8*50
        assert int(idx[1]) == -1  # 30 !< 0.8*31
        assert int(idx[2]) == -1  # too far

    def test_rotation_filter(self, rng):
        n = 100
        ang_a = jnp.zeros(n)
        # 90 matches rotated by ~0.5 rad, 10 outliers scattered.
        ang_b = np.full(n, 0.5)
        ang_b[:10] = rng.uniform(2.0, 6.0, 10)
        match = jnp.arange(n, dtype=jnp.int32)
        out = np.asarray(
            filter_matches_by_rotation(match, ang_a, jnp.asarray(ang_b))
        )
        assert (out[10:] >= 0).all()
        assert (out[:10] == -1).sum() >= 8


class TestExtractOrb:
    def test_end_to_end_synthetic(self, rng):
        from synthetic import SyntheticRgbdSequence

        seq = SyntheticRgbdSequence(rng, n_frames=1, n_landmarks=300)
        _, img, depth = seq.frame(0)
        feats = extract_orb(
            jnp.asarray(img), CAM, n_features=500, capacity=512,
            has_distortion=False,
        )
        n_valid = int(np.asarray(feats.valid).sum())
        assert n_valid > 150  # plenty of the 300 dots found
        uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
        # Detected keypoints should be near planted landmarks.
        gt_uv, gt_z = [], []
        from synthetic import project_np

        g_uv, g_z = project_np(seq.K, seq.poses[0], seq.landmarks)
        vis = (g_z > 0.1) & (g_uv[:, 0] > 20) & (g_uv[:, 0] < 620) & (g_uv[:, 1] > 20) & (g_uv[:, 1] < 460)
        d = np.linalg.norm(uv[:, None, :] - g_uv[None, vis, :], axis=-1).min(axis=1)
        assert np.median(d) < 2.5

        feats = fill_depth_from_rgbd(feats, jnp.asarray(depth), CAM)
        has_d = np.asarray(feats.depth) > 0
        assert has_d.sum() > 100
        ru = np.asarray(feats.right_u)[has_d]
        u = np.asarray(feats.uv)[has_d, 0]
        z = np.asarray(feats.depth)[has_d]
        np.testing.assert_allclose(u - ru, 50.0 / z, atol=1e-3)

    def test_octave_distribution(self, rng):
        from synthetic import SyntheticRgbdSequence

        seq = SyntheticRgbdSequence(rng, n_frames=1, n_landmarks=400)
        _, img, _ = seq.frame(0)
        feats = extract_orb(jnp.asarray(img), CAM, n_features=500, capacity=512,
                            has_distortion=False)
        octs = np.asarray(feats.octave)[np.asarray(feats.valid)]
        assert octs.max() >= 1  # multiple pyramid levels populated


class TestStereo:
    def test_synthetic_disparity(self, rng):
        # Dots at known depths; right image = left shifted by bf/z per dot.
        from synthetic import render_dots

        n = 120
        z = rng.uniform(1.0, 6.0, n)
        u = rng.uniform(60, 580, n)
        v = rng.uniform(60, 420, n)
        disp = 50.0 / z
        inten = rng.uniform(100, 250, n)
        left = render_dots(np.stack([u, v], -1), z, intensities=inten)
        right = render_dots(np.stack([u - disp, v], -1), z, intensities=inten)
        fl = extract_orb(jnp.asarray(left), CAM, n_features=300, capacity=384,
                         has_distortion=False)
        fr = extract_orb(jnp.asarray(right), CAM, n_features=300, capacity=384,
                         has_distortion=False)
        pl = build_pyramid(jnp.asarray(left))
        pr = build_pyramid(jnp.asarray(right))
        out = stereo_match(fl, fr, pl, pr, CAM)
        got = np.asarray(out.depth)
        ok = got > 0
        assert ok.sum() > 40
        uvl = np.asarray(out.uv)[ok]
        # For each matched kp, find nearest planted dot and compare depth.
        nn = np.linalg.norm(uvl[:, None, :] - np.stack([u, v], -1)[None], axis=-1)
        j = nn.argmin(axis=1)
        close = nn[np.arange(len(j)), j] < 3.0
        err = np.abs(got[ok][close] - z[j][close]) / z[j][close]
        assert np.median(err) < 0.08


class TestSubpixel:
    def test_recovers_fractional_peak(self):
        """A blob with a known fractional center: the parabola fit must
        cut the localization error vs the integer FAST peak."""
        from ydorbslam_tpu.ops.fast import (fast_score_map,
                                            fast_subpixel_offsets)

        for true_u, true_v in [(20.3, 20.6), (19.8, 20.1), (20.5, 19.7)]:
            yy, xx = np.mgrid[0:41, 0:41].astype(np.float64)
            img = 200.0 * np.exp(
                -(((xx - true_u) ** 2 + (yy - true_v) ** 2) / 6.0)
            )
            score = np.asarray(fast_score_map(jnp.asarray(img, jnp.float32)))
            v, u = np.unravel_index(score.argmax(), score.shape)
            P = 9
            patch = img[v - P // 2: v + P // 2 + 1, u - P // 2: u + P // 2 + 1]
            off = np.asarray(fast_subpixel_offsets(jnp.asarray(patch[None])))[0]
            assert np.all(np.abs(off) <= 0.5)
            err_int = np.hypot(u - true_u, v - true_v)
            err_sub = np.hypot(u + off[0] - true_u, v + off[1] - true_v)
            assert err_sub < err_int

    def test_zero_offset_on_clipped_neighbors(self):
        """Neighbors whose segment test fails (score 0) must disable the
        fit instead of biasing toward the clipped zero."""
        from ydorbslam_tpu.ops.fast import fast_subpixel_offsets

        # an isolated single bright pixel: FAST fires only exactly on it
        patch = np.zeros((9, 9), np.float32)
        patch[4, 4] = 255.0
        off = np.asarray(fast_subpixel_offsets(jnp.asarray(patch[None])))[0]
        assert off[0] == 0.0 and off[1] == 0.0

    def test_extractor_emits_fractional_uv(self):
        """End-to-end: extract_orb keypoints on a textured image carry
        fractional coordinates (the refinement is actually wired in)."""
        from ydorbslam_tpu.ops.extractor import extract_orb

        rng = np.random.default_rng(3)
        img = rng.uniform(0, 255, (480, 640)).astype(np.float32)
        feats = extract_orb(
            jnp.asarray(img), CAM, n_features=500, capacity=512,
            n_levels=4, scale_factor=1.2, th_high=20, th_low=7,
            has_distortion=False,
        )
        uv = np.asarray(feats.uv_raw)[np.asarray(feats.valid)]
        frac = np.abs(uv - np.round(uv))
        # level-0 keypoints: fractional part present on a solid majority
        assert (frac.max(axis=1) > 1e-3).mean() > 0.5
