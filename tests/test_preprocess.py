"""Golden tests: JAX preprocessing ops vs. NumPy transcriptions of the CUDA
kernels (cuda_depth_processing.cu)."""

import numpy as np
import pytest

from surfelmeshing_tpu.io.synthetic import SyntheticRGBDSequence
from surfelmeshing_tpu.ops import preprocess as pp

from golden_preprocess import (bilateral_golden, erode_golden, normals_golden,
                               outlier_fusion_golden, radii_golden)

H, W = 48, 64
FX = FY = 60.0
CX, CY = W / 2 + 0.5, H / 2 + 0.5


def make_depth(seed=0, hole_frac=0.1):
    rng = np.random.default_rng(seed)
    depth = rng.integers(4000, 14000, size=(H, W), dtype=np.uint16)
    # Smooth it so bilateral weights are non-degenerate.
    depth = (depth.astype(np.float64) * 0.2 +
             8000 + 2000 * np.sin(np.arange(W) / 7.0)[None, :]).astype(np.uint16)
    holes = rng.random((H, W)) < hole_frac
    depth[holes] = 0
    return depth


class TestBilateral:
    def test_matches_golden(self):
        depth = make_depth()
        got = np.asarray(pp.bilateral_filter_and_cutoff(
            depth, 3.0, 0.05, 2.0, 15000, 30.0))
        want = bilateral_golden(depth, 3.0, 0.05, 2.0, 15000, 30.0)
        # float32 accumulation in XLA vs float64 in golden: allow 1 unit of
        # rounding difference on a tiny fraction of pixels.
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1
        assert (diff != 0).mean() < 0.02

    def test_cutoff_and_circle(self):
        depth = np.full((H, W), 10000, np.uint16)
        depth[0, 0] = 0
        depth[5, 5] = 20000  # above cutoff
        got = np.asarray(pp.bilateral_filter_and_cutoff(
            depth, 3.0, 0.05, 2.0, 15000, 10.0))
        assert got[5, 5] == 0
        # Outside the radius-10 circle around the center: zero.
        assert got[0, 0] == 0
        assert got[H // 2, W // 2] != 0
        ys, xs = np.mgrid[0:H, 0:W]
        outside = (xs - W // 2) ** 2 + (ys - H // 2) ** 2 > 100
        assert np.all(got[outside] == 0)


class TestOutlierFusion:
    def _setup(self, k=2):
        rng = np.random.default_rng(3)
        depth = make_depth(1)
        others = np.stack([make_depth(10 + i) for i in range(k)])
        transforms = []
        for i in range(k):
            # Small rotations/translations in depth-unit space.
            angle = 0.02 * (i + 1)
            c, s = np.cos(angle), np.sin(angle)
            T = np.array([[c, 0, s, 50.0 * i],
                          [0, 1, 0, -30.0],
                          [-s, 0, c, 20.0]], np.float32)
            transforms.append(T)
        return depth, others, np.stack(transforms)

    @pytest.mark.parametrize("required", [None, 1, 2])
    def test_matches_golden(self, required):
        depth, others, T = self._setup()
        got = np.asarray(pp.outlier_depth_map_fusion(
            depth, others, T, FX, FY, CX, CY, 0.02, required))
        want = outlier_fusion_golden(depth, others, T, FX, FY, CX, CY,
                                     0.02, required)
        # f32 vs f64 projection rounding can flip borderline pixels.
        assert (got != want).mean() < 0.02

    def test_identity_transform_all_inliers(self):
        depth = make_depth(2)
        ident = np.array([[[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]]],
                         np.float32)
        got = np.asarray(pp.outlier_depth_map_fusion(
            depth, depth[None], ident, FX, FY, CX, CY, 0.02, None))
        # Pixels whose own projection lands on a valid pixel survive; in
        # particular no new nonzero values appear.
        assert np.all((got == 0) | (got == depth))
        assert (got != 0).sum() > 0.5 * (depth != 0).sum()


class TestErode:
    @pytest.mark.parametrize("radius", [1, 2, 3])
    def test_matches_golden(self, radius):
        depth = make_depth(4)
        got = np.asarray(pp.erode_depth(depth, radius))
        want = erode_golden(depth, radius)
        np.testing.assert_array_equal(got, want)

    def test_copy_without_border(self):
        depth = make_depth(5)
        got = np.asarray(pp.copy_without_border(depth))
        assert np.all(got[0] == 0) and np.all(got[-1] == 0)
        assert np.all(got[:, 0] == 0) and np.all(got[:, -1] == 0)
        np.testing.assert_array_equal(got[1:-1, 1:-1], depth[1:-1, 1:-1])


class TestNormals:
    def test_matches_golden(self):
        depth = make_depth(6, hole_frac=0.05)
        got_d, got_n = pp.compute_normals_and_drop_bad_pixels(
            depth, 85.0, 5000.0, FX, FY, CX, CY)
        want_d, want_n = normals_golden(depth, 85.0, 5000.0, FX, FY, CX, CY)
        got_d = np.asarray(got_d)
        got_n = np.asarray(got_n).transpose(1, 2, 0)  # (2,H,W) -> (H,W,2)
        mismatch = (got_d != want_d).mean()
        assert mismatch < 0.01
        agree = (got_d == want_d) & (want_d != 0)
        assert np.allclose(got_n[agree], want_n[agree], atol=1e-4)

    def test_flat_wall_normal(self):
        # A flat fronto-parallel wall must give normal ~(0, 0, -1).
        depth = np.full((H, W), 10000, np.uint16)
        got_d, got_n = pp.compute_normals_and_drop_bad_pixels(
            depth, 85.0, 5000.0, FX, FY, CX, CY)
        got_n = np.asarray(got_n).transpose(1, 2, 0)
        interior = np.zeros((H, W), bool)
        interior[2:-2, 2:-2] = True
        assert np.abs(got_n[interior]).max() < 1e-5  # stored xy of (0,0,-1)
        assert np.asarray(got_d)[H // 2, W // 2] == 10000


class TestRadii:
    def test_matches_golden(self):
        depth = make_depth(7, hole_frac=0.05)
        got_d, got_r = pp.compute_point_radii_and_remove_isolated(
            depth, 1.5, np.inf, 5000.0, FX, FY, CX, CY)
        want_d, want_r = radii_golden(depth, 1.5, np.inf, 5000.0,
                                      FX, FY, CX, CY)
        got_d, got_r = np.asarray(got_d), np.asarray(got_r)
        np.testing.assert_array_equal(got_d, want_d)
        valid = want_d != 0
        np.testing.assert_allclose(got_r[valid], want_r[valid], rtol=1e-4)

    def test_clamp(self):
        depth = make_depth(8, hole_frac=0.0)
        _, r_uncl = pp.compute_point_radii_and_remove_isolated(
            depth, 1.5, np.inf, 5000.0, FX, FY, CX, CY)
        _, r_cl = pp.compute_point_radii_and_remove_isolated(
            depth, 1.5, 1.0, 5000.0, FX, FY, CX, CY)
        assert np.all(np.asarray(r_cl) <= np.asarray(r_uncl) + 1e-7)


class TestFullChain:
    def test_synthetic_frame(self):
        # Long sequence -> small inter-frame motion, so the all-inlier
        # reprojection test keeps most of the overlap region.
        seq = SyntheticRGBDSequence(num_frames=30, width=W, height=H)
        # frames 1,2 as outlier-filter neighbors of frame 0
        cam = seq.camera
        depth0, _ = seq.depth_and_color(0)
        others = np.stack([seq.depth_and_color(i)[0] for i in (1, 2)])
        # others_T_reference in depth-unit space (main.cc:1038-1058).
        scale = seq.depth_scaling
        ref_pose = seq.poses[0]
        transforms = []
        for i in (1, 2):
            o = seq.poses[i].scaled_translation(scale)
            r = ref_pose.scaled_translation(scale)
            transforms.append((r.inverse() * o).inverse().matrix3x4())
        T = np.stack(transforms).astype(np.float32)

        d, normals, radii = pp.preprocess_frame(
            depth0, others, T,
            sigma_xy=3.0, sigma_value_factor=0.05, radius_factor=2.0,
            max_depth_u16=15000, depth_valid_region_radius=1000.0,
            tolerance=0.02, required_inliers=None, erosion_radius=1,
            observation_angle_threshold_deg=85.0, depth_scaling=scale,
            point_radius_extension_factor=1.5,
            point_radius_clamp_factor=np.inf,
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy)
        d = np.asarray(d)
        # A solid fraction of the wall must survive the full chain.
        assert (d != 0).mean() > 0.25
        nrm = np.asarray(normals).transpose(1, 2, 0)
        rad = np.asarray(radii)
        valid = d != 0
        # Normals have unit-or-less xy magnitude, radii positive where valid.
        assert np.all(np.linalg.norm(nrm[valid], axis=-1) <= 1.0 + 1e-5)
        assert np.all(rad[valid] > 0)


class TestMedianDensify:
    def test_matches_reference_semantics(self):
        """MedianFilterAndDensifyDepthMap golden (main.cc:207-252)."""
        rng = np.random.default_rng(11)
        depth = rng.integers(1000, 2000, (12, 16)).astype(np.uint16)
        depth[rng.random((12, 16)) < 0.3] = 0

        def golden(d):
            h, w = d.shape
            out = np.zeros_like(d)
            for y in range(h):
                for x in range(w):
                    vals = []
                    for dy in range(max(0, y - 1), min(h - 1, y + 1) + 1):
                        for dx in range(max(0, x - 1),
                                        min(w - 1, x + 1) + 1):
                            if d[dy, dx] != 0:
                                vals.append(int(d[dy, dx]))
                    if len(vals) >= 2:
                        vals.sort()
                        if len(vals) % 2 == 0:
                            avg = sum(vals) / len(vals)
                            lo = vals[len(vals) // 2 - 1]
                            hi = vals[len(vals) // 2]
                            out[y, x] = lo if abs(lo - avg) < abs(hi - avg) \
                                else hi
                        else:
                            out[y, x] = vals[len(vals) // 2]
                    else:
                        out[y, x] = d[y, x]
            return out

        got = np.asarray(pp.median_filter_and_densify(depth))
        want = golden(depth)
        np.testing.assert_array_equal(got, want)


class TestPyramidDownscale:
    def test_median_exclude_blocks(self):
        depth = np.zeros((4, 4), np.uint16)
        depth[0, 0] = 100     # block (0,0): values 100 only -> 100
        depth[0, 2] = 10      # block (0,1): 10, 20 -> even: closer to avg
        depth[0, 3] = 20
        # block (1,0): all zero -> 0
        depth[2, 2:4] = (5, 7)
        depth[3, 2:4] = (9, 1000)  # block (1,1): 5,7,9,1000
        got = np.asarray(pp.downscale_median_excluding(depth, 2))
        assert got.shape == (2, 2)
        assert got[0, 0] == 100
        assert got[0, 1] in (10, 20)
        # avg=15, |10-15| == |20-15| -> NOT strictly closer -> high value
        assert got[0, 1] == 20
        assert got[1, 0] == 0
        # avg=255.25; mid values 7, 9; |7-255| > |9-255| -> 9
        assert got[1, 1] == 9

    def test_pipeline_pyramid_level(self, tmp_path):
        from surfelmeshing_tpu.config import SurfelMeshingConfig
        from surfelmeshing_tpu.io.synthetic import write_tum_dataset
        from surfelmeshing_tpu.io.tum import read_tum_rgbd_dataset
        from surfelmeshing_tpu.pipeline import ReconstructionPipeline

        path = write_tum_dataset(str(tmp_path / "ds"), num_frames=5,
                                 width=64, height=48)
        video = read_tum_rgbd_dataset(path, "groundtruth.txt", 0.2)
        cfg = SurfelMeshingConfig(
            max_surfel_count=16384, outlier_filtering_frame_count=2,
            depth_erosion_radius=1, depth_valid_region_radius=1000.0,
            pyramid_level=1)
        pipe = ReconstructionPipeline(cfg, video.depth_camera)
        assert pipe.camera.width == 32 and pipe.camera.height == 24
        for i in range(video.frame_count - 1):
            pipe.process_frame(video, i)
        pipe.block_until_ready()
        assert pipe.surfel_count() > 50
