"""Tests for the keyframe spline and the software renderer."""

import numpy as np

from surfelmeshing_tpu.utils.se3 import SE3
from surfelmeshing_tpu.utils.spline import (KeyframePath, read_keyframes,
                                            write_keyframes)
from surfelmeshing_tpu.viewer.renderer import (OrbitCamera, Renderer,
                                               save_png, surfel_colors)


class TestSpline:
    def test_endpoints_and_roundtrip(self, tmp_path):
        poses = [SE3(t=[0, 0, 0]), SE3(t=[1, 0, 0]), SE3(t=[2, 1, 0])]
        path = KeyframePath(poses)
        assert np.allclose(path.sample(0.0).t, [0, 0, 0])
        assert np.allclose(path.sample(1.0).t, [1, 0, 0], atol=1e-9)
        mid = path.sample(0.5).t
        assert 0.0 < mid[0] < 1.0

        kf_file = str(tmp_path / "keyframes.txt")
        write_keyframes(kf_file, [(0, poses[0]), (10, poses[1]),
                                  (20, poses[2])])
        loaded = read_keyframes(kf_file)
        assert len(loaded) == 3
        assert loaded[1][0] == 10
        assert np.allclose(loaded[2][1].t, [2, 1, 0])


class TestRenderer:
    def _scene(self):
        # A small triangle fan facing the camera at z=2.
        verts = np.array([[0, 0, 2], [0.5, 0, 2], [0, 0.5, 2],
                          [-0.5, 0.2, 2]], np.float32)
        cols = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                         [255, 255, 0]], np.uint8)
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
        return verts, cols, tris

    def test_mesh_visible(self):
        verts, cols, tris = self._scene()
        r = Renderer(width=320, height=240)
        img = r.render(SE3.identity(), mesh_vertices=verts,
                       mesh_colors=cols, mesh_triangles=tris)
        assert img.shape == (240, 320, 3)
        # Something non-background rendered near the center.
        non_bg = (img != 255).any(axis=-1)
        assert non_bg.sum() > 50

    def test_zbuffer_order(self):
        # Two overlapping triangles; the nearer one wins.
        verts = np.array([[0, -0.4, 2], [0.4, 0.4, 2], [-0.4, 0.4, 2],
                          [0, -0.4, 1], [0.4, 0.4, 1], [-0.4, 0.4, 1]],
                         np.float32)
        cols = np.zeros((6, 3), np.uint8)
        cols[0:3] = (255, 0, 0)   # far: red
        cols[3:6] = (0, 255, 0)   # near: green
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.uint32)
        # patch limit: scale down to small triangles via a far camera
        r = Renderer(width=320, height=240, vertical_fov_deg=100)
        cam = OrbitCamera(center=np.array([0, 0, 1.5]), radius=8.0)
        img = r.render(cam.pose(), mesh_vertices=verts, mesh_colors=cols,
                       mesh_triangles=tris)
        greens = (img[:, :, 1] > 200) & (img[:, :, 0] < 100)
        reds = (img[:, :, 0] > 200) & (img[:, :, 1] < 100)
        assert greens.sum() > 0
        # The near (green) triangle should dominate the overlap region.
        assert greens.sum() >= reds.sum()

    def test_splats_and_frustum(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-0.5, 0.5, (500, 3)).astype(np.float32)
        pts[:, 2] += 2.0
        cols = np.full((500, 3), (200, 50, 50), np.uint8)
        r = Renderer(width=320, height=240)

        from surfelmeshing_tpu.utils.camera import PinholeCamera
        cam = PinholeCamera(640, 480, 525, 525, 320.5, 240.5)
        img = r.render(SE3.identity(), splat_points=pts, splat_colors=cols,
                       frustum_pose=SE3(t=[0, 0, 0.5]), frustum_camera=cam)
        non_bg = (img != 255).any(axis=-1)
        assert non_bg.sum() > 400
        save_png(str(tmp_path / "frame.png"), img)
        assert (tmp_path / "frame.png").exists()

    def test_nan_points_skipped(self):
        pts = np.array([[np.nan, 0, 2], [0, 0, 2]], np.float32)
        r = Renderer(width=64, height=64)
        img = r.render(SE3.identity(), splat_points=pts,
                       splat_colors=np.full((2, 3), 0, np.uint8))
        assert ((img != 255).any(axis=-1)).sum() > 0  # valid point drawn


class TestColorModes:
    def test_modes(self):
        n = 10
        colors = np.full((n, 3), 7, np.uint8)
        stamps = np.arange(n, dtype=np.int64)
        creation = np.zeros(n, np.int64)
        radii = np.full(n, 1e-5, np.float32)
        normals = np.tile([0, 0, -1.0], (n, 1))
        out = surfel_colors("color", colors, stamps, creation, radii,
                            normals, 9)
        assert (out == 7).all()
        out = surfel_colors("timestamp", colors, stamps, creation, radii,
                            normals, 9, active_window=5)
        assert tuple(out[-1]) == (255, 80, 80)   # updated this frame
        assert tuple(out[0]) == (40, 40, 255)    # too old
        out = surfel_colors("radius", colors, stamps, creation, radii,
                            normals, 9)
        assert out.shape == (n, 3)
        out = surfel_colors("normals", colors, stamps, creation, radii,
                            normals, 9)
        assert np.all(out[:, 2] < 10)  # -z normal maps to low blue
