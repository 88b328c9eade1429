"""NumPy golden implementations of the reference preprocessing kernels.

Direct per-pixel loop transcriptions of the semantics in
cuda_depth_processing.cu, used as oracles for the vectorized JAX ops.
"""

import math

import numpy as np


def bilateral_golden(depth, sigma_xy, sigma_value_factor, radius_factor,
                     max_depth_u16, depth_valid_region_radius):
    h, w = depth.shape
    out = np.zeros_like(depth)
    radius = int(radius_factor * sigma_xy + 0.5)
    radius_sq = radius * radius
    denom_xy = 2.0 * sigma_xy * sigma_xy
    half_w, half_h = w // 2, h // 2
    valid_r_sq = depth_valid_region_radius ** 2
    for y in range(h):
        for x in range(w):
            if (x - half_w) ** 2 + (y - half_h) ** 2 > valid_r_sq:
                continue
            center = int(depth[y, x])
            if center == 0 or center > max_depth_u16:
                continue
            adapted_sigma = center * sigma_value_factor
            adapted_denom = 2.0 * adapted_sigma * adapted_sigma
            s = 0.0
            wsum = 0.0
            for sy in range(max(0, y - radius), min(h - 1, y + radius) + 1):
                for sx in range(max(0, x - radius), min(w - 1, x + radius) + 1):
                    gd = (sx - x) ** 2 + (sy - y) ** 2
                    if gd > radius_sq:
                        continue
                    sample = int(depth[sy, sx])
                    if sample == 0:
                        continue
                    vd = float(center - sample) ** 2
                    wgt = math.exp(-gd / denom_xy - vd / adapted_denom)
                    s += wgt * sample
                    wsum += wgt
            out[y, x] = 0 if wsum == 0 else int(s / wsum + 0.5)
    return out


def outlier_fusion_golden(depth, other_depths, others_T_reference,
                          fx, fy, cx, cy, tolerance, required_inliers=None):
    h, w = depth.shape
    k = other_depths.shape[0]
    if required_inliers is None or required_inliers < 0:
        required_inliers = k
    fx_inv, fy_inv = 1.0 / fx, 1.0 / fy
    cx_inv = -(cx - 0.5) / fx
    cy_inv = -(cy - 0.5) / fy
    max_tol = 1.0 + tolerance
    min_tol = 1.0 - tolerance
    out = np.zeros_like(depth)
    for y in range(h):
        for x in range(w):
            d = float(depth[y, x])
            if d == 0:
                continue
            p = np.array([d * (fx_inv * x + cx_inv),
                          d * (fy_inv * y + cy_inv), d])
            ok = 0
            for i in range(k):
                T = others_T_reference[i]
                o = T[:, :3] @ p + T[:, 3]
                if o[2] <= 0:
                    continue
                u = fx * (o[0] / o[2]) + cx
                v = fy * (o[1] / o[2]) + cy
                px, py = int(u), int(v)
                if px < 0 or py < 0 or px >= w or py >= h:
                    continue
                od = float(other_depths[i][py, px])
                if od <= 0 or od > max_tol * o[2] or od < min_tol * o[2]:
                    continue
                ok += 1
            if ok >= required_inliers:
                out[y, x] = depth[y, x]
    return out


def erode_golden(depth, radius):
    h, w = depth.shape
    out = np.zeros_like(depth)
    for y in range(radius, h - radius):
        for x in range(radius, w - radius):
            window = depth[y - radius:y + radius + 1, x - radius:x + radius + 1]
            if np.all(window != 0):
                out[y, x] = depth[y, x]
    return out


def normals_golden(depth, observation_angle_threshold_deg, depth_scaling,
                   fx, fy, cx, cy):
    h, w = depth.shape
    out_depth = np.zeros_like(depth)
    out_normals = np.zeros((h, w, 2), np.float32)
    fx_inv, fy_inv = 1.0 / fx, 1.0 / fy
    cx_inv = -(cx - 0.5) / fx
    cy_inv = -(cy - 0.5) / fy
    inv_scale = 1.0 / depth_scaling
    thresh = -math.cos(math.pi / 180.0 * observation_angle_threshold_deg)

    def unproject(x, y, d):
        return np.array([d * (fx_inv * x + cx_inv),
                         d * (fy_inv * y + cy_inv), d])

    for y in range(1, h - 1):
        for x in range(1, w - 1):
            if depth[y, x] == 0:
                continue
            r, l = int(depth[y, x + 1]), int(depth[y, x - 1])
            b, t = int(depth[y + 1, x]), int(depth[y - 1, x])
            if r == 0 or l == 0 or b == 0 or t == 0:
                continue
            lp = unproject(x - 1, y, inv_scale * l)
            tp = unproject(x, y - 1, inv_scale * t)
            rp = unproject(x + 1, y, inv_scale * r)
            bp = unproject(x, y + 1, inv_scale * b)
            n = np.cross(rp - lp, tp - bp)
            length = np.linalg.norm(n)
            if not length > 1e-6:
                n = np.array([0.0, 0.0, -1.0])
            else:
                n = ((-1.0 if fy_inv < 0 else 1.0) / length) * n
            out_normals[y, x] = n[:2]
            view = np.array([fx_inv * x + cx_inv, fy_inv * y + cy_inv, 1.0])
            view /= np.linalg.norm(view)
            if np.dot(view, n) < thresh:
                out_depth[y, x] = depth[y, x]
    return out_depth, out_normals


def radii_golden(depth, ext_factor, clamp_factor, depth_scaling,
                 fx, fy, cx, cy):
    h, w = depth.shape
    out_depth = np.zeros_like(depth)
    radius_sq_img = np.zeros((h, w), np.float32)
    fx_inv, fy_inv = 1.0 / fx, 1.0 / fy
    cx_inv = -(cx - 0.5) / fx
    cy_inv = -(cy - 0.5) / fy
    inv_scale = 1.0 / depth_scaling
    clamp_term = clamp_factor ** 2 * 2.0
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            if depth[y, x] == 0:
                continue
            d = inv_scale * depth[y, x]
            p = np.array([d * (fx_inv * x + cx_inv),
                          d * (fy_inv * y + cy_inv), d])
            count = 0
            r_sq = 0.0
            min_sq = np.inf
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    dd = inv_scale * depth[y + dy, x + dx]
                    if dd <= 0:
                        continue
                    count += 1
                    o = np.array([dd * (fx_inv * (x + dx) + cx_inv),
                                  dd * (fy_inv * (y + dy) + cy_inv), dd])
                    dist_sq = float(np.sum((o - p) ** 2))
                    r_sq = max(r_sq, dist_sq)
                    min_sq = min(min_sq, dist_sq)
            r_sq *= ext_factor ** 2
            if math.isfinite(clamp_term):
                r_sq = min(r_sq, clamp_term * min_sq)
            radius_sq_img[y, x] = r_sq
            if count >= 8:
                out_depth[y, x] = depth[y, x]
    return out_depth, radius_sq_img
