"""Synthetic RGB-D sequence generator.

Produces deterministic raytraced depth + color frames of a simple scene
(back wall + floor + sphere) with a smooth camera trajectory and exact poses.
Used by tests and by bench.py when no TUM RGB-D dataset is on disk; can also
write a full TUM-format dataset directory (calibration.txt, associated.txt,
groundtruth.txt, PNGs) so the dataset loader path is exercised end-to-end.

Geometry conventions match the reference pipeline: depth stored as
u16 = depth_scaling * meters (TUM convention, main.cc:279-282), camera model
is the pinhole camera of utils.camera with pixel-corner cx/cy.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from ..utils.camera import PinholeCamera
from ..utils.se3 import SE3


def default_camera(width: int = 640, height: int = 480) -> PinholeCamera:
    # fr1-like intrinsics; stored cx/cy use the pixel-corner convention.
    f = 525.0 * width / 640.0
    return PinholeCamera(width, height, f, f,
                         width / 2.0 + 0.5, height / 2.0 + 0.5)


def _ray_directions(camera: PinholeCamera) -> np.ndarray:
    """(H, W, 3) unit-z ray directions through pixel centers."""
    fx_inv, fy_inv, cx_inv, cy_inv = camera.unprojection
    xs = np.arange(camera.width, dtype=np.float64)
    ys = np.arange(camera.height, dtype=np.float64)
    dir_x = fx_inv * xs + cx_inv
    dir_y = fy_inv * ys + cy_inv
    dx, dy = np.meshgrid(dir_x, dir_y)
    return np.stack([dx, dy, np.ones_like(dx)], axis=-1)


def _trajectory(num_frames: int) -> List[SE3]:
    """Smooth sideways arc with slight yaw; global_T_camera poses."""
    poses = []
    for i in range(num_frames):
        s = i / max(1, num_frames - 1)
        tx = 0.25 * np.sin(2 * np.pi * s * 0.5)
        ty = 0.05 * np.sin(2 * np.pi * s)
        tz = 0.1 * s
        yaw = 0.1 * np.sin(2 * np.pi * s * 0.5)
        q = np.array([0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)])
        poses.append(SE3(q, [tx, ty, tz]))
    return poses


def _intersect_scene(origins: np.ndarray, dirs: np.ndarray):
    """Raytrace the scene in world space.

    Scene: back wall (z=2.5), floor (y=0.8, normal -y), sphere at
    (0, 0.3, 1.8) r=0.35.  Returns (t, material_id) with t=inf for miss.
    """
    t = np.full(dirs.shape[:-1], np.inf)
    mat = np.zeros(dirs.shape[:-1], dtype=np.int32)

    # Back wall: z = 2.5.
    dz = dirs[..., 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        t_wall = (2.5 - origins[..., 2]) / dz
    hit = (t_wall > 0.05) & (dz > 1e-9)
    t = np.where(hit & (t_wall < t), t_wall, t)
    mat = np.where(hit & (t_wall <= t), 1, mat)

    # Floor: y = 0.8.
    dy = dirs[..., 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t_floor = (0.8 - origins[..., 1]) / dy
    hit = (t_floor > 0.05) & (dy > 1e-9)
    better = hit & (t_floor < t)
    t = np.where(better, t_floor, t)
    mat = np.where(better, 2, mat)

    # Sphere.
    center = np.array([0.0, 0.3, 1.8])
    oc = origins - center
    b = np.sum(oc * dirs, axis=-1)
    c = np.sum(oc * oc, axis=-1) - 0.35 ** 2
    disc = b * b - c
    sq = np.sqrt(np.maximum(disc, 0.0))
    t_sph = -b - sq
    hit = (disc > 0) & (t_sph > 0.05)
    better = hit & (t_sph < t)
    t = np.where(better, t_sph, t)
    mat = np.where(better, 3, mat)

    return t, mat


def render_frame(camera: PinholeCamera, global_T_camera: SE3,
                 depth_scaling: float = 5000.0,
                 noise_sigma: float = 0.0,
                 seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """-> (depth u16 (H,W), color u8 (H,W,3))."""
    dirs_cam = _ray_directions(camera)
    R = global_T_camera.rotation_matrix
    dirs_world = dirs_cam @ R.T
    origin = np.broadcast_to(global_T_camera.t, dirs_world.shape)

    t, mat = _intersect_scene(origin, dirs_world)
    # t is the parameter along a ray whose z-component in camera space is 1,
    # so camera-space depth z == t.
    depth_m = np.where(np.isfinite(t), t, 0.0)
    if noise_sigma > 0:
        rng = np.random.default_rng(seed)
        depth_m = np.where(
            depth_m > 0,
            depth_m * (1.0 + noise_sigma * rng.standard_normal(depth_m.shape)),
            0.0)
    depth_u16 = np.clip(depth_scaling * depth_m + 0.5, 0, 65535).astype(np.uint16)

    # Simple per-material shading with a distance falloff.
    base = np.array([[0, 0, 0], [200, 180, 160], [90, 130, 90], [180, 60, 60]],
                    dtype=np.float64)
    shade = np.clip(1.0 - 0.18 * np.where(np.isfinite(t), t, 0.0), 0.3, 1.0)
    color = (base[mat] * shade[..., None]).astype(np.uint8)
    return depth_u16, color


class SyntheticRGBDSequence:
    """In-memory RGB-D sequence with exact poses."""

    def __init__(self, num_frames: int = 20, width: int = 640,
                 height: int = 480, depth_scaling: float = 5000.0,
                 noise_sigma: float = 0.0):
        self.camera = default_camera(width, height)
        self.depth_scaling = depth_scaling
        self.poses = _trajectory(num_frames)   # global_T_frame
        self.noise_sigma = noise_sigma
        self._cache = {}

    @property
    def frame_count(self) -> int:
        return len(self.poses)

    def depth_and_color(self, i: int):
        if i not in self._cache:
            self._cache[i] = render_frame(
                self.camera, self.poses[i], self.depth_scaling,
                self.noise_sigma, seed=i)
        return self._cache[i]


def write_tum_dataset(path: str, num_frames: int = 12, width: int = 160,
                      height: int = 120, depth_scaling: float = 5000.0) -> str:
    """Write a TUM-format dataset directory for loader tests."""
    from PIL import Image as PILImage

    os.makedirs(os.path.join(path, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(path, "depth"), exist_ok=True)
    seq = SyntheticRGBDSequence(num_frames, width, height, depth_scaling)
    cam = seq.camera

    with open(os.path.join(path, "calibration.txt"), "w") as f:
        # calibration.txt holds pixel-center cx/cy; loader adds +0.5.
        f.write(f"{cam.fx} {cam.fy} {cam.cx - 0.5} {cam.cy - 0.5}\n")

    assoc_lines = []
    traj_lines = ["# ground truth trajectory"]
    for i in range(num_frames):
        ts = 1000.0 + 0.05 * i
        depth, color = seq.depth_and_color(i)
        rgb_name = f"rgb/{ts:.6f}.png"
        depth_name = f"depth/{ts:.6f}.png"
        PILImage.fromarray(color).save(os.path.join(path, rgb_name))
        PILImage.fromarray(depth, mode="I;16").save(os.path.join(path, depth_name))
        assoc_lines.append(f"{ts:.6f} {rgb_name} {ts:.6f} {depth_name}")
        p = seq.poses[i]
        traj_lines.append(
            f"{ts:.6f} {p.t[0]} {p.t[1]} {p.t[2]} "
            f"{p.q[0]} {p.q[1]} {p.q[2]} {p.q[3]}")

    with open(os.path.join(path, "associated.txt"), "w") as f:
        f.write("\n".join(assoc_lines) + "\n")
    with open(os.path.join(path, "groundtruth.txt"), "w") as f:
        f.write("\n".join(traj_lines) + "\n")
    return path
