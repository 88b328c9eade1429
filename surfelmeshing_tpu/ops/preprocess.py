"""Depth preprocessing stack (TPU, JAX/XLA).

Re-implements the reference's per-pixel CUDA preprocessing kernels
(applications/surfel_meshing/src/surfel_meshing/cuda_depth_processing.cu) as
vectorized XLA programs over (H, W) arrays.  The CUDA kernels launch one thread
per pixel with 32x32 blocks; here every kernel is a fused elementwise/stencil
expression that XLA tiles onto the VPU — stencils are expressed as static
shifted slices of a zero-padded image, which is equivalent to the reference's
window clamping because out-of-window samples carry the invalid value 0 and are
masked out identically.

Numerical parity notes:
- depth maps are u16 with 0 = invalid (value_to_ignore),
- the bilateral filter output reproduces `(sum / weight + 0.5f)` u16
  truncation (cuda_depth_processing.cu:116),
- unprojection uses the pixel-center intrinsics fx_inv*x + cx_inv with
  cx_inv = -(cx - 0.5)/fx (cuda_depth_processing.cu:258-264),
- projection in outlier fusion truncates pixel_pos toward zero like the C cast
  (cuda_depth_processing.cu:208-209, TODO at :207 preserved).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _shifted(padded: jnp.ndarray, pad: int, dy: int, dx: int,
             height: int, width: int) -> jnp.ndarray:
    """View of a (H+2p, W+2p) padded image shifted by (dy, dx), shape (H, W)."""
    return padded[pad + dy: pad + dy + height, pad + dx: pad + dx + width]


def bilateral_filter_and_cutoff(
    depth: jnp.ndarray,
    sigma_xy: float,
    sigma_value_factor: float,
    radius_factor: float,
    max_depth_u16: int,
    depth_valid_region_radius: float,
) -> jnp.ndarray:
    """BilateralFilteringAndDepthCutoffCUDA (cuda_depth_processing.cu:50-158).

    depth: (H, W) u16.  Returns filtered (H, W) u16.  Pixels outside the
    centered valid-region circle, zero pixels and pixels beyond max_depth_u16
    become 0; all others get a depth-adaptive bilateral-filtered value.
    """
    height, width = depth.shape
    radius = int(radius_factor * sigma_xy + 0.5)
    radius_sq = radius * radius
    denom_xy = 2.0 * sigma_xy * sigma_xy

    depth_f = depth.astype(jnp.float32)
    center = depth_f

    # Valid-region circle around the image center (cuda_depth_processing.cu:63-72).
    half_w, half_h = width // 2, height // 2
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    center_dist_sq = ((xs - half_w) ** 2 + (ys - half_h) ** 2).astype(jnp.float32)
    in_circle = center_dist_sq <= depth_valid_region_radius ** 2

    valid_center = (depth != 0) & (depth <= jnp.uint16(max_depth_u16))

    adapted_sigma = center * sigma_value_factor
    adapted_denom = 2.0 * adapted_sigma * adapted_sigma

    pad = radius
    padded = jnp.pad(depth_f, pad)  # zero pad == invalid samples
    sum_acc = jnp.zeros_like(center)
    weight_acc = jnp.zeros_like(center)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            grid_dist_sq = dx * dx + dy * dy
            if grid_dist_sq > radius_sq:
                continue
            sample = _shifted(padded, pad, dy, dx, height, width)
            sample_valid = sample != 0
            value_dist_sq = (center - sample) ** 2
            w = jnp.exp(-grid_dist_sq / denom_xy - value_dist_sq / adapted_denom)
            w = jnp.where(sample_valid, w, 0.0)
            sum_acc = sum_acc + w * sample
            weight_acc = weight_acc + w

    filtered = jnp.where(weight_acc == 0, 0.0,
                         sum_acc / jnp.maximum(weight_acc, 1e-30) + 0.5)
    out = jnp.where(in_circle & valid_center, filtered, 0.0)
    return out.astype(jnp.uint16)


def outlier_depth_map_fusion(
    depth: jnp.ndarray,
    other_depths: jnp.ndarray,
    others_T_reference: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    tolerance: float,
    required_inliers: Optional[int] = None,
) -> jnp.ndarray:
    """OutlierDepthMapFusionCUDA (cuda_depth_processing.cu:168-510).

    depth: (H, W) u16 reference depth; other_depths: (K, H, W) u16 neighbor
    depth maps; others_T_reference: (K, 3, 4) f32 transforms in *depth-unit*
    space (the driver scales pose translations by depth_scaling,
    main.cc:1038-1058).  A pixel survives when projecting its point into the
    other frames finds >= required_inliers depth values within
    [1-tol, 1+tol] * projected depth; required_inliers None/-1/K means "all"
    (the all-inlier kernel variant, :168-334).
    """
    height, width = depth.shape
    k = other_depths.shape[0]
    if required_inliers is None or required_inliers < 0:
        required_inliers = k

    fx_inv = 1.0 / fx
    fy_inv = 1.0 / fy
    cx_inv = -(cx - 0.5) / fx
    cy_inv = -(cy - 0.5) / fy
    max_tol = 1.0 + tolerance
    min_tol = 1.0 - tolerance

    depth_f = depth.astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    px_ref = depth_f * (fx_inv * xs.astype(jnp.float32) + cx_inv)
    py_ref = depth_f * (fy_inv * ys.astype(jnp.float32) + cy_inv)
    pz_ref = depth_f

    # NOTE: gathers use flat 1-D indices into each frame's flattened (H*W,)
    # image — a vmapped 2-D gather lowers to a slow elementwise multi-dim
    # gather on TPU (slice_sizes={1,1,1}).
    hw = height * width

    flats = []
    front_checks = []
    oz_list = []
    for k_static in range(k):
        T = others_T_reference[k_static]
        ox = T[0, 0] * px_ref + T[0, 1] * py_ref + T[0, 2] * pz_ref + T[0, 3]
        oy = T[1, 0] * px_ref + T[1, 1] * py_ref + T[1, 2] * pz_ref + T[1, 3]
        oz = T[2, 0] * px_ref + T[2, 1] * py_ref + T[2, 2] * pz_ref + T[2, 3]
        front = oz > 0
        safe_z = jnp.where(front, oz, 1.0)
        u = fx * (ox / safe_z) + cx
        v = fy * (oy / safe_z) + cy
        # C-style truncation toward zero (cuda_depth_processing.cu:208-209).
        ui = u.astype(jnp.int32)
        vi = v.astype(jnp.int32)
        in_image = (ui >= 0) & (vi >= 0) & (ui < width) & (vi < height)
        flats.append(jnp.clip(vi, 0, height - 1) * width +
                     jnp.clip(ui, 0, width - 1))
        front_checks.append(front & in_image)
        oz_list.append(oz)

    # u16 gathers run ~4x slower than f32 on TPU: convert first.  Width-1
    # flat gathers run ~2x slower than 8-wide row gathers (PERF.md), so
    # each source is viewed as (HW/8, 8) rows: gather row idx>>3, select
    # lane idx&7.  ONE gather PER other frame — each (HW/8, 8) f32 source
    # is ~1.2 MB and stays fully VMEM-resident, which probes 7x faster than
    # one fused K*HW-index gather from the (K*HW/8, 8) stack (2005M vs
    # 282M idx/s, tools/outlier_probe.py; traced 8.2 -> ~1.5 ms/frame at
    # 640x480 K=8).  Same values gathered either way — bit-exact.
    if hw % 8 == 0:
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        sampled = []
        for k_static in range(k):
            src = other_depths[k_static].reshape(-1, 8).astype(jnp.float32)
            # Barrier: materialize the converted per-frame source as a
            # standalone buffer (else XLA fuses the u16->f32 conversion
            # into the gather and reads u16 from HBM at the 4x-slower u16
            # gather rate); as a (HW/8, 8) f32 value it is VMEM-stageable.
            src = jax.lax.optimization_barrier(src)
            idx = flats[k_static].reshape(-1)
            rows = src[idx >> 3]
            lane = (idx & 7)[:, None]
            sampled.append(jnp.sum(jnp.where(lane == iota8, rows, 0.0),
                                   axis=1).reshape(height, width))
        sampled_all = jnp.stack(sampled)
    else:
        others_flat_f32 = other_depths.reshape(-1).astype(jnp.float32)
        all_flat = jnp.stack(
            [f.reshape(-1) + i * hw for i, f in enumerate(flats)]
        ).reshape(-1)
        sampled_all = others_flat_f32[all_flat].reshape(k, height, width)

    ok_count = jnp.zeros((height, width), jnp.int32)
    for k_static in range(k):
        sampled = sampled_all[k_static]
        oz = oz_list[k_static]
        ok = front_checks[k_static] & (sampled > 0) & \
            (sampled <= max_tol * oz) & (sampled >= min_tol * oz)
        ok_count += ok.astype(jnp.int32)
    keep = (depth != 0) & (ok_count >= required_inliers)
    return jnp.where(keep, depth, 0).astype(jnp.uint16)


def erode_depth(depth: jnp.ndarray, radius: int) -> jnp.ndarray:
    """ErodeDepthMapCUDA (cuda_depth_processing.cu:514-586).

    Zeroes a pixel unless every sample in its (2r+1)^2 box is valid; the
    radius-wide image border is always zeroed.
    """
    if radius == 0:
        return copy_without_border(depth)
    height, width = depth.shape
    pad = radius
    padded = jnp.pad(depth, pad)
    all_valid = jnp.ones(depth.shape, dtype=bool)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            all_valid &= _shifted(padded, pad, dy, dx, height, width) != 0
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    interior = (xs >= radius) & (ys >= radius) & \
        (xs < width - radius) & (ys < height - radius)
    return jnp.where(all_valid & interior, depth, 0).astype(depth.dtype)


def copy_without_border(depth: jnp.ndarray) -> jnp.ndarray:
    """CopyWithoutBorderCUDA (cuda_depth_processing.cu:589-639): 1px border -> 0."""
    height, width = depth.shape
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    interior = (xs >= 1) & (ys >= 1) & (xs < width - 1) & (ys < height - 1)
    return jnp.where(interior, depth, 0).astype(depth.dtype)


def compute_normals_and_drop_bad_pixels(
    depth: jnp.ndarray,
    observation_angle_threshold_deg: float,
    depth_scaling: float,
    fx: float, fy: float, cx: float, cy: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ComputeNormalsAndDropBadPixelsCUDA (cuda_depth_processing.cu:642-762).

    Central-difference cross-product normals from the 4-neighborhood; drops
    pixels whose normal is observed at a grazing angle.  Returns
    (out_depth u16, normals_xy (2, H, W) f32); the stored normal is the (x, y)
    pair, z is reconstructed downstream as -sqrt(max(0, 1 - x^2 - y^2)).
    Plane-major layout: on TPU a (H, W, 2) array would pad the minor dim to
    128 lanes.
    """
    height, width = depth.shape
    fx_inv = 1.0 / fx
    fy_inv = 1.0 / fy
    cx_inv = -(cx - 0.5) / fx
    cy_inv = -(cy - 0.5) / fy
    inv_depth_scaling = 1.0 / depth_scaling
    normal_dot_threshold = -math.cos(
        math.pi / 180.0 * observation_angle_threshold_deg)

    padded = jnp.pad(depth, 1)
    center = depth
    right = _shifted(padded, 1, 0, 1, height, width)
    left = _shifted(padded, 1, 0, -1, height, width)
    bottom = _shifted(padded, 1, 1, 0, height, width)
    top = _shifted(padded, 1, -1, 0, height, width)

    valid = (center != 0) & (right != 0) & (left != 0) & \
        (bottom != 0) & (top != 0)

    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0).astype(jnp.float32)

    def unproject(px, py, d_u16):
        d = inv_depth_scaling * d_u16.astype(jnp.float32)
        return (d * (fx_inv * px + cx_inv), d * (fy_inv * py + cy_inv), d)

    lx, ly, lz = unproject(xs - 1, ys, left)
    tx_, ty_, tz_ = unproject(xs, ys - 1, top)
    rx, ry, rz = unproject(xs + 1, ys, right)
    bx, by, bz = unproject(xs, ys + 1, bottom)

    # left_to_right x bottom_to_top (cuda_depth_processing.cu:685-695).
    ax, ay, az = rx - lx, ry - ly, rz - lz
    ux, uy, uz = tx_ - bx, ty_ - by, tz_ - bz
    nx = ay * uz - az * uy
    ny = az * ux - ax * uz
    nz = ax * uy - ay * ux
    length = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    degenerate = ~(length > 1e-6)
    # Negative-fy handling for ICL-NUIM data (cuda_depth_processing.cu:701).
    sign = -1.0 if fy_inv < 0 else 1.0
    inv_len = sign / jnp.where(degenerate, 1.0, length)
    nx = jnp.where(degenerate, 0.0, nx * inv_len)
    ny = jnp.where(degenerate, 0.0, ny * inv_len)
    nz = jnp.where(degenerate, -1.0, nz * inv_len)

    vx = fx_inv * xs + cx_inv
    vy = fy_inv * ys + cy_inv
    inv_dir_len = 1.0 / jnp.sqrt(vx * vx + vy * vy + 1.0)
    dot = inv_dir_len * (vx * nx + vy * ny + nz)
    keep = valid & (dot < normal_dot_threshold)

    out_depth = jnp.where(keep, center, 0).astype(jnp.uint16)
    normals_xy = jnp.stack([jnp.where(valid, nx, 0.0),
                            jnp.where(valid, ny, 0.0)]).astype(jnp.float32)
    return out_depth, normals_xy


def compute_point_radii_and_remove_isolated(
    depth: jnp.ndarray,
    point_radius_extension_factor: float,
    point_radius_clamp_factor: float,
    depth_scaling: float,
    fx: float, fy: float, cx: float, cy: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ComputePointRadiiAndRemoveIsolatedPixelsCUDA (cuda_depth_processing.cu:765-883).

    Per valid pixel: squared radius = max squared distance to the valid
    8-neighborhood points, times extension_factor^2, clamped to
    clamp_factor^2 * 2 * min squared neighbor distance; pixels with fewer than
    8 valid neighbors are culled.  Returns (out_depth u16, radius_sq (H,W) f32).
    """
    height, width = depth.shape
    fx_inv = 1.0 / fx
    fy_inv = 1.0 / fy
    cx_inv = -(cx - 0.5) / fx
    cy_inv = -(cy - 0.5) / fy
    inv_depth_scaling = 1.0 / depth_scaling
    ext_sq = point_radius_extension_factor ** 2
    clamp_term = point_radius_clamp_factor ** 2 * 2.0  # sqrt(2)^2 (cu:873)

    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0).astype(jnp.float32)
    d_center = inv_depth_scaling * depth.astype(jnp.float32)
    px = d_center * (fx_inv * xs + cx_inv)
    py = d_center * (fy_inv * ys + cy_inv)
    pz = d_center

    padded = jnp.pad(depth, 1)
    neighbor_count = jnp.zeros(depth.shape, dtype=jnp.int32)
    max_dist_sq = jnp.zeros(depth.shape, dtype=jnp.float32)
    min_dist_sq = jnp.full(depth.shape, jnp.inf, dtype=jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nd = _shifted(padded, 1, dy, dx, height, width)
            nd_valid = nd != 0
            d_n = inv_depth_scaling * nd.astype(jnp.float32)
            ox = d_n * (fx_inv * (xs + dx) + cx_inv)
            oy = d_n * (fy_inv * (ys + dy) + cy_inv)
            oz = d_n
            dist_sq = (ox - px) ** 2 + (oy - py) ** 2 + (oz - pz) ** 2
            neighbor_count += nd_valid.astype(jnp.int32)
            max_dist_sq = jnp.where(nd_valid & (dist_sq > max_dist_sq),
                                    dist_sq, max_dist_sq)
            min_dist_sq = jnp.where(nd_valid & (dist_sq < min_dist_sq),
                                    dist_sq, min_dist_sq)

    radius_sq = max_dist_sq * ext_sq
    if math.isfinite(clamp_term):
        radius_sq = jnp.minimum(radius_sq, clamp_term * min_dist_sq)
    valid_center = depth != 0
    radius_sq = jnp.where(valid_center, radius_sq, 0.0)
    # >= 8 valid neighbors required (cuda_depth_processing.cu:832-835).
    out_depth = jnp.where(valid_center & (neighbor_count >= 8), depth, 0)
    return out_depth.astype(jnp.uint16), radius_sq.astype(jnp.float32)


def median_filter_and_densify(depth: jnp.ndarray) -> jnp.ndarray:
    """MedianFilterAndDensifyDepthMap (main.cc:207-252), CPU fallback in the
    reference, on-device here: 3x3 median over valid samples (center
    included); needs >= 2 valid samples, else passes the input through; for
    even counts picks the middle value closer to the average
    (main.cc:230-243)."""
    height, width = depth.shape
    pad = 1
    padded = jnp.pad(depth, pad)
    samples = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            samples.append(_shifted(padded, pad, dy, dx, height, width))
    stack = jnp.stack(samples, axis=0).astype(jnp.int32)  # (9, H, W)
    valid = stack > 0
    count = jnp.sum(valid.astype(jnp.int32), axis=0)
    # Sort with invalid samples pushed to the top; the valid prefix is sorted.
    big = jnp.where(valid, stack, jnp.int32(65536))
    ordered = jnp.sort(big, axis=0)
    # Odd count: middle element at count // 2.
    mid_hi = jnp.take_along_axis(
        ordered, jnp.clip(count // 2, 0, 8)[None], axis=0)[0]
    # Even count: of elements at count/2 - 1 and count/2, take the one
    # closer to the average of the valid samples.
    mid_lo = jnp.take_along_axis(
        ordered, jnp.clip(count // 2 - 1, 0, 8)[None], axis=0)[0]
    avg = jnp.sum(jnp.where(valid, stack, 0), axis=0).astype(jnp.float32) / \
        jnp.maximum(count, 1).astype(jnp.float32)
    lo_closer = jnp.abs(mid_lo.astype(jnp.float32) - avg) < \
        jnp.abs(mid_hi.astype(jnp.float32) - avg)
    even_pick = jnp.where(lo_closer, mid_lo, mid_hi)
    median = jnp.where(count % 2 == 0, even_pick, mid_hi)
    out = jnp.where(count >= 2, median, depth.astype(jnp.int32))
    return out.astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("factor",))
def downscale_median_excluding(depth: jnp.ndarray, factor: int) -> jnp.ndarray:
    """DownscaleUsingMedianWhileExcluding (image.h:1003-1053) for power-of-2
    factors: each output pixel is the median of the non-zero values in its
    factor x factor block (even counts pick the middle value closer to the
    block average); all-invalid blocks stay 0.  Used for --pyramid_level
    depth downscaling (main.cc:951-963)."""
    h, w = depth.shape
    ho, wo = h // factor, w // factor
    blocks = depth[:ho * factor, :wo * factor] \
        .reshape(ho, factor, wo, factor) \
        .transpose(0, 2, 1, 3).reshape(ho, wo, factor * factor) \
        .astype(jnp.int32)
    valid = blocks > 0
    count = jnp.sum(valid.astype(jnp.int32), axis=-1)
    big = jnp.where(valid, blocks, jnp.int32(65536))
    ordered = jnp.sort(big, axis=-1)
    k = factor * factor
    mid_hi = jnp.take_along_axis(
        ordered, jnp.clip(count // 2, 0, k - 1)[..., None], axis=-1)[..., 0]
    mid_lo = jnp.take_along_axis(
        ordered, jnp.clip(count // 2 - 1, 0, k - 1)[..., None],
        axis=-1)[..., 0]
    avg = jnp.sum(jnp.where(valid, blocks, 0), axis=-1).astype(jnp.float32) \
        / jnp.maximum(count, 1).astype(jnp.float32)
    lo_closer = jnp.abs(mid_lo.astype(jnp.float32) - avg) < \
        jnp.abs(mid_hi.astype(jnp.float32) - avg)
    median = jnp.where((count % 2 == 0) & lo_closer, mid_lo, mid_hi)
    return jnp.where(count > 0, median, 0).astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=(
    "sigma_xy", "sigma_value_factor", "radius_factor", "max_depth_u16",
    "depth_valid_region_radius", "required_inliers", "erosion_radius",
    "observation_angle_threshold_deg", "depth_scaling",
    "point_radius_extension_factor", "point_radius_clamp_factor",
    "tolerance", "fx", "fy", "cx", "cy"))
def preprocess_frame(
    depth: jnp.ndarray,
    other_depths: jnp.ndarray,
    others_T_reference: jnp.ndarray,
    *,
    sigma_xy: float,
    sigma_value_factor: float,
    radius_factor: float,
    max_depth_u16: int,
    depth_valid_region_radius: float,
    tolerance: float,
    required_inliers: Optional[int],
    erosion_radius: int,
    observation_angle_threshold_deg: float,
    depth_scaling: float,
    point_radius_extension_factor: float,
    point_radius_clamp_factor: float,
    fx: float, fy: float, cx: float, cy: float,
):
    """Full preprocessing chain for one frame (driver order, main.cc:1014-1191).

    Returns (depth u16, normals_xy (2,H,W) f32, radius_sq (H,W) f32).
    """
    d = bilateral_filter_and_cutoff(
        depth, sigma_xy, sigma_value_factor, radius_factor,
        max_depth_u16, depth_valid_region_radius)
    d = outlier_depth_map_fusion(
        d, other_depths, others_T_reference, fx, fy, cx, cy,
        tolerance, required_inliers)
    d = erode_depth(d, erosion_radius)
    d, normals_xy = compute_normals_and_drop_bad_pixels(
        d, observation_angle_threshold_deg, depth_scaling, fx, fy, cx, cy)
    d, radius_sq = compute_point_radii_and_remove_isolated(
        d, point_radius_extension_factor, point_radius_clamp_factor,
        depth_scaling, fx, fy, cx, cy)
    return d, normals_xy, radius_sq
