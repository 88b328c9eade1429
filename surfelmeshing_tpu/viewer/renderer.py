"""Headless 3D viewer: software rasterizer for surfel splats + mesh.

Replaces the reference's Qt/OpenGL render window
(surfel_meshing_render_window.{h,cc}): splat rendering of un-meshed surfels,
triangle-mesh rendering, camera frustum lines, orbit camera, screenshots, and
the debug color modes (last-update timestamp, creation timestamp, radius,
normals — UpdateSurfelVertexBufferCUDA variants,
cuda_surfel_reconstruction_kernels.cu:274-351).  This environment has no
display; frames render to PNG via a vectorized z-buffered barycentric
rasterizer, which is what --create_video consumes (main.cc:1436-1440).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..utils.se3 import SE3


@dataclasses.dataclass
class OrbitCamera:
    """Orbit camera like the reference viewer's mouse navigation
    (surfel_meshing_render_window.h:74-79)."""
    center: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3))
    yaw: float = 0.0
    pitch: float = 0.0
    radius: float = 3.0
    up: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, -1.0, 0.0]))

    def pose(self) -> SE3:
        """global_T_camera for a camera looking at `center`."""
        cp, sp = np.cos(self.pitch), np.sin(self.pitch)
        cy, sy = np.cos(self.yaw), np.sin(self.yaw)
        offset = self.radius * np.array([cp * sy, sp, -cp * cy])
        eye = self.center + offset
        forward = self.center - eye
        forward = forward / np.linalg.norm(forward)
        right = np.cross(forward, -self.up)
        nr = np.linalg.norm(right)
        if nr < 1e-9:
            right = np.array([1.0, 0.0, 0.0])
        else:
            right = right / nr
        down = np.cross(forward, right)
        R = np.stack([right, down, forward], axis=1)  # camera axes in world
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = eye
        return SE3.from_matrix(m)


def surfel_colors(mode: str, colors_u8: np.ndarray, stamps: np.ndarray,
                  creation: np.ndarray, radii_sq: np.ndarray,
                  normals: np.ndarray, frame_index: int,
                  active_window: int = 3000) -> np.ndarray:
    """Debug color modes (kernels.cu:306-349)."""
    n = len(colors_u8)
    if mode == "color":
        return colors_u8
    out = np.empty((n, 3), np.uint8)
    if mode in ("timestamp", "creation"):
        ref = creation if mode == "creation" else stamps
        max_age = 3000 if mode == "creation" else active_window
        age = frame_index - ref.astype(np.int64)
        blend = np.clip((age - 1) / max(1, max_age - 1), 0.0, 1.0)
        intensity = (255 - 255.99 * blend).clip(0, 255).astype(np.uint8)
        out[:] = intensity[:, None]
        out[age < 1] = (255, 80, 80)     # updated this frame: red
        out[age > max_age] = (40, 40, 255)  # old: blue
    elif mode == "radius":
        r = np.sqrt(np.maximum(radii_sq, 0.0))
        blend = np.clip((r - 0.0005) / (0.01 - 0.0005), 0.0, 1.0)
        out[:, 0] = (255.99 * blend).astype(np.uint8)
        out[:, 1] = 255 - out[:, 0]
        out[:, 2] = 80
    elif mode == "normals":
        out[:] = (255.99 / 2.0 * (normals + 1.0)).clip(0, 255).astype(np.uint8)
    else:
        raise ValueError(f"unknown color mode {mode}")
    return out


class Renderer:
    """Z-buffered splat + triangle renderer to an RGB image."""

    def __init__(self, width: int = 1280, height: int = 720,
                 vertical_fov_deg: float = 50.0,
                 background=(255, 255, 255)):
        self.width = width
        self.height = height
        f = 0.5 * height / np.tan(0.5 * np.deg2rad(vertical_fov_deg))
        self.fx = self.fy = f
        self.cx = width / 2.0
        self.cy = height / 2.0
        self.background = np.array(background, np.uint8)

    def _begin(self):
        color = np.tile(self.background, (self.height, self.width, 1))
        zbuf = np.full((self.height, self.width), np.inf, np.float32)
        return color, zbuf

    def _project(self, pose_w2c: SE3, points: np.ndarray):
        local = points @ pose_w2c.rotation_matrix.T + pose_w2c.t
        z = local[:, 2]
        safe = np.where(z > 1e-6, z, 1.0)
        u = self.fx * local[:, 0] / safe + self.cx
        v = self.fy * local[:, 1] / safe + self.cy
        return u, v, z

    def render(self,
               camera_pose: SE3,                    # global_T_camera
               splat_points: Optional[np.ndarray] = None,
               splat_colors: Optional[np.ndarray] = None,
               splat_half_extent: float = 1.5,
               mesh_vertices: Optional[np.ndarray] = None,
               mesh_colors: Optional[np.ndarray] = None,
               mesh_triangles: Optional[np.ndarray] = None,
               triangle_normal_shading: bool = False,
               frustum_pose: Optional[SE3] = None,
               frustum_camera=None,
               lines: Optional[np.ndarray] = None,
               line_color=(255, 0, 0),
               line_sets=None) -> np.ndarray:
        """Render one frame; returns (H, W, 3) u8.

        `line_sets` is an optional list of (segments, color) pairs for
        additional debug line passes (neighbor/normal rendering,
        reference surfel_meshing_render_window.cc:382-430)."""
        color, zbuf = self._begin()
        w2c = camera_pose.inverse()

        if mesh_vertices is not None and mesh_triangles is not None and \
                len(mesh_triangles):
            # Size-class passes: most surfel triangles are pixel-scale, the
            # small-patch pass handles them vectorized; rare big triangles
            # (close-ups) go through the larger-patch passes.
            for patch in (12, 48, 192):
                self._raster_mesh(color, zbuf, w2c, mesh_vertices,
                                  mesh_colors, mesh_triangles,
                                  triangle_normal_shading, patch=patch,
                                  min_patch=patch // 4 if patch > 12 else 0)
        if splat_points is not None and len(splat_points):
            self._raster_splats(color, zbuf, w2c, splat_points, splat_colors,
                                splat_half_extent)
        if frustum_pose is not None and frustum_camera is not None:
            self._draw_frustum(color, zbuf, w2c, frustum_pose, frustum_camera)
        if lines is not None and len(lines):
            self._draw_lines(color, zbuf, w2c, lines, line_color)
        for segments, seg_color in (line_sets or ()):
            if segments is not None and len(segments):
                self._draw_lines(color, zbuf, w2c, segments, seg_color)
        return color

    # -- splats (point -> quad geometry shader analog, cc:948-1010) --------

    def _raster_splats(self, color, zbuf, w2c, points, colors, half_extent):
        finite = np.isfinite(points).all(axis=1)
        u, v, z = self._project(w2c, points)
        ok = finite & (z > 1e-6) & (u > -8) & (v > -8) & \
            (u < self.width + 8) & (v < self.height + 8)
        u, v, z = u[ok], v[ok], z[ok]
        c = colors[ok] if colors is not None else \
            np.full((ok.sum(), 3), 128, np.uint8)
        r = max(int(round(half_extent)), 0)
        order = np.argsort(-z)  # far-to-near painter within z-test
        u, v, z, c = u[order], v[order], z[order], c[order]
        ui = np.round(u).astype(np.int64)
        vi = np.round(v).astype(np.int64)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                x = ui + dx
                y = vi + dy
                valid = (x >= 0) & (y >= 0) & (x < self.width) & \
                    (y < self.height)
                xx, yy, zz, cc = x[valid], y[valid], z[valid], c[valid]
                closer = zz < zbuf[yy, xx]
                xx, yy, zz, cc = xx[closer], yy[closer], zz[closer], cc[closer]
                zbuf[yy, xx] = zz
                color[yy, xx] = cc

    # -- triangles ----------------------------------------------------------

    def _raster_mesh(self, color, zbuf, w2c, vertices, vcolors, triangles,
                     normal_shading, patch: int = 12, min_patch: int = 0):
        u, v, z = self._project(w2c, vertices)
        tri = triangles.astype(np.int64)
        tu, tv, tz = u[tri], v[tri], z[tri]           # (M, 3)
        ok = np.isfinite(tu).all(axis=1) & np.isfinite(tv).all(axis=1) & \
            (tz > 1e-6).all(axis=1)
        # This pass only rasters triangles in its size class.
        x0 = np.floor(tu.min(axis=1)).astype(np.int64)
        y0 = np.floor(tv.min(axis=1)).astype(np.int64)
        x1 = np.ceil(tu.max(axis=1)).astype(np.int64)
        y1 = np.ceil(tv.max(axis=1)).astype(np.int64)
        extent = np.maximum(x1 - x0, y1 - y0)
        ok &= (extent < patch) & (extent >= min_patch)
        ok &= (x1 >= 0) & (y1 >= 0) & (x0 < self.width) & (y0 < self.height)
        if not ok.any():
            return
        tri, tu, tv, tz = tri[ok], tu[ok], tv[ok], tz[ok]
        x0, y0 = x0[ok], y0[ok]
        m = len(tri)

        if normal_shading:
            a = vertices[tri[:, 0]]
            b = vertices[tri[:, 1]]
            c3 = vertices[tri[:, 2]]
            nrm = np.cross(b - a, c3 - a)
            nl = np.linalg.norm(nrm, axis=1, keepdims=True)
            nrm = np.where(nl > 1e-12, nrm / np.maximum(nl, 1e-12), 0.0)
            tri_color = ((nrm + 1.0) * 0.5 * 255).astype(np.uint8)  # (M,3)
        else:
            if vcolors is None:
                vcolors = np.full((len(vertices), 3), 180, np.uint8)
            tri_color = None

        # Vectorized barycentric fill over a patch x patch window per triangle.
        gy, gx = np.mgrid[0:patch, 0:patch]
        pxs = (x0[:, None] + gx.reshape(-1)[None, :]).astype(np.float64)
        pys = (y0[:, None] + gy.reshape(-1)[None, :]).astype(np.float64)
        ax, ay = tu[:, 0:1], tv[:, 0:1]
        bx, by = tu[:, 1:2], tv[:, 1:2]
        cx, cy = tu[:, 2:3], tv[:, 2:3]
        d = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        d = np.where(np.abs(d) < 1e-12, 1e-12, d)
        w0 = ((by - cy) * (pxs - cx) + (cx - bx) * (pys - cy)) / d
        w1 = ((cy - ay) * (pxs - cx) + (ax - cx) * (pys - cy)) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        pz = w0 / tz[:, 0:1] + w1 / tz[:, 1:2] + w2 / tz[:, 2:3]
        pz = 1.0 / np.maximum(pz, 1e-12)  # perspective-correct depth

        pxi = pxs.astype(np.int64)
        pyi = pys.astype(np.int64)
        inside &= (pxi >= 0) & (pyi >= 0) & (pxi < self.width) & \
            (pyi < self.height)

        flat_idx = np.where(inside, pyi * self.width + pxi, 0)
        tidx = np.broadcast_to(np.arange(m)[:, None], flat_idx.shape)

        sel = inside.reshape(-1)
        fi = flat_idx.reshape(-1)[sel]
        zi = pz.reshape(-1)[sel].astype(np.float32)
        ti = tidx.reshape(-1)[sel]
        wsel = np.stack([w0.reshape(-1)[sel], w1.reshape(-1)[sel],
                         w2.reshape(-1)[sel]], axis=1)

        # Two-pass z-buffer: min-scatter depth, then write matching colors.
        zflat = zbuf.reshape(-1)
        np.minimum.at(zflat, fi, zi)
        winners = zi <= zflat[fi] * (1.0 + 1e-6)
        fi, zi, ti, wsel = fi[winners], zi[winners], ti[winners], wsel[winners]
        if normal_shading:
            cols = tri_color[ti]
        else:
            vcs = vcolors[tri[ti]].astype(np.float64)       # (K, 3, 3)
            cols = np.clip((wsel[:, :, None] * vcs).sum(axis=1), 0,
                           255).astype(np.uint8)
        color.reshape(-1, 3)[fi] = cols

    # -- lines / frustum -----------------------------------------------------

    def _draw_lines(self, color, zbuf, w2c, segments, line_color):
        """segments: (L, 2, 3) world-space endpoints; sampled point draw."""
        seg = np.asarray(segments, np.float64)
        t = np.linspace(0.0, 1.0, 64)
        pts = seg[:, 0:1, :] + t[None, :, None] * (seg[:, 1:2, :] -
                                                   seg[:, 0:1, :])
        pts = pts.reshape(-1, 3)
        u, v, z = self._project(w2c, pts)
        ok = (z > 1e-6)
        ui = np.round(u[ok]).astype(np.int64)
        vi = np.round(v[ok]).astype(np.int64)
        zi = z[ok]
        inb = (ui >= 0) & (vi >= 0) & (ui < self.width) & (vi < self.height)
        ui, vi, zi = ui[inb], vi[inb], zi[inb]
        closer = zi <= zbuf[vi, ui] + 1e-4
        color[vi[closer], ui[closer]] = line_color

    def _draw_frustum(self, color, zbuf, w2c, frustum_pose, cam,
                      depth: float = 0.2):
        """Input-camera frustum wireframe (cc:361-380)."""
        corners_px = np.array([[0, 0], [cam.width, 0],
                               [cam.width, cam.height], [0, cam.height]],
                              np.float64)
        dirs = np.stack([(corners_px[:, 0] - cam.cx) / cam.fx,
                         (corners_px[:, 1] - cam.cy) / cam.fy,
                         np.ones(4)], axis=1) * depth
        R = frustum_pose.rotation_matrix
        t = frustum_pose.t
        corners = dirs @ R.T + t
        apex = np.tile(t, (4, 1))
        segs = []
        for i in range(4):
            segs.append([apex[i], corners[i]])
            segs.append([corners[i], corners[(i + 1) % 4]])
        self._draw_lines(color, zbuf, w2c, np.asarray(segs), (80, 80, 255))


def save_png(path: str, image: np.ndarray) -> None:
    from PIL import Image as PILImage
    PILImage.fromarray(image).save(path)
