"""Surfel fusion engine (TPU, JAX/XLA).

Re-implements the reference's CUDA surfel reconstruction
(applications/surfel_meshing/src/surfel_meshing/cuda_surfel_reconstruction_kernels.cu
sequenced by cuda_surfel_reconstruction.cc:112-320) as ONE jitted functional
update over a fixed-capacity structure-of-arrays surfel map.

Design (TPU-first, not a translation):
- The CUDA code is scatter-heavy and lock-based: surfels race for pixels with
  atomicMin/atomicCAS and take per-surfel NaN-CAS spin locks
  (kernels.cu:818-868, :925-981).  Here each phase is a pure data-parallel
  pass: pixel-level conflict resolution uses deterministic segment scatters
  (min / add), and per-surfel mutation is a *gather* — each surfel reads its
  own pixels, so no locks exist at all.
- Nondeterministic outcomes in the reference (which surfel claims a pixel via
  atomicCAS first) are made deterministic by a min-index rule.
- The entire Integrate() phase sequence — RenderMinDepth, Associate, Merge,
  Blend, Integrate, UpdateNeighbors, CreateNewSurfels, Regularize — runs as a
  single XLA program with no host round-trips; surfel_count lives on device.

Memory layout is **attribute-major**: vectors are stored as (3, N) / (4, N)
arrays and all math is componentwise over (N,) slices.  On TPU the minor
dimension is tiled to 128 lanes, so (N, 3) rows would waste ~42x HBM bandwidth
on every gather/scatter; attribute-major gives perfectly tiled (N,) streams
(the reference's surfel buffer is attribute-major for the same coalescing
reason, kernels.cuh:39-41).

Surfel attributes mirror kernels.cuh:49-78; u32-bit-cast stamps become plain
int32 arrays, the color-alpha "neighbor detach request" flag becomes a bool
array, and the gradient accumulators are transient values inside the jit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INVALID_INDEX = jnp.int32(2**31 - 1)

# Constants fixed in the reference (kernels.cu:50-74).
SURFEL_NORMAL_TO_VIEWING_DIR_THRESHOLD = 0.0
MAX_OBSERVATION_RADIUS_FACTOR = 1.5          # kernels.cu:58
CHECK_SCALE_COMPAT_INTEGRATION = False       # kernels.cu:61
CHECK_SCALE_COMPAT_NEIGHBORS = True          # kernels.cu:64
MERGE_RADIUS_DIFF_THRESHOLD_SQ = 1.2 ** 2    # kernels.cu:1959-1960
MERGE_DISTANCE_FACTOR = 0.5 * 0.25 * 0.25    # kernels.cu:1971
MERGE_COS_NORMAL_THRESHOLD = 0.93969         # 20 deg, kernels.cu:1981


class SurfelState(NamedTuple):
    """Fixed-capacity attribute-major surfel map; a pytree living in HBM."""
    pos: jnp.ndarray            # (3, N) f32 raw position
    smooth_pos: jnp.ndarray     # (3, N) f32 regularized position
    normal: jnp.ndarray         # (3, N) f32
    color: jnp.ndarray          # (3, N) u8
    detach: jnp.ndarray         # (N,) bool: neighbor detach request flag
    confidence: jnp.ndarray     # (N,) f32
    radius_sq: jnp.ndarray      # (N,) f32 (-1 marks merged-away surfels)
    creation_stamp: jnp.ndarray  # (N,) i32
    last_update_stamp: jnp.ndarray  # (N,) i32
    neighbors: jnp.ndarray      # (4, N) i32, INVALID_INDEX = none
    surfel_count: jnp.ndarray   # () i32
    merge_count: jnp.ndarray    # () i32
    overflow_count: jnp.ndarray  # () i32: creations dropped at capacity


def create_surfel_state(capacity: int) -> SurfelState:
    return SurfelState(
        pos=jnp.zeros((3, capacity), jnp.float32),
        smooth_pos=jnp.zeros((3, capacity), jnp.float32),
        normal=jnp.zeros((3, capacity), jnp.float32),
        color=jnp.zeros((3, capacity), jnp.uint8),
        detach=jnp.zeros((capacity,), bool),
        confidence=jnp.zeros((capacity,), jnp.float32),
        radius_sq=jnp.zeros((capacity,), jnp.float32),
        creation_stamp=jnp.zeros((capacity,), jnp.int32),
        last_update_stamp=jnp.full((capacity,), -(2**30), jnp.int32),
        neighbors=jnp.full((4, capacity), INVALID_INDEX, jnp.int32),
        surfel_count=jnp.zeros((), jnp.int32),
        merge_count=jnp.zeros((), jnp.int32),
        overflow_count=jnp.zeros((), jnp.int32),
    )


@dataclasses.dataclass(frozen=True)
class FusionParams:
    """Static fusion parameters (baked into the compiled program)."""
    width: int
    height: int
    fx: float
    fy: float
    cx: float            # pixel-corner convention
    cy: float
    depth_scaling: float = 5000.0
    sensor_noise_factor: float = 0.05
    max_surfel_confidence: float = 5.0
    normal_compatibility_threshold_deg: float = 40.0
    regularizer_weight: float = 10.0
    regularization_frame_window_size: int = 30
    do_blending: bool = True
    measurement_blending_radius: int = 12
    regularization_iterations: int = 1
    radius_factor_for_regularization_neighbors: float = 2.0
    surfel_integration_active_window_size: int = 2**31 - 1
    # Profiling aid: stop the compiled program after phase k (1=min-depth,
    # 2=associate, 3=merge, 4=blend, 5=integrate, 6=neighbors, 7=create).
    debug_stop_after: int = 99

    @property
    def cos_normal_compat(self) -> float:
        return float(np.cos(np.pi / 180.0 *
                            self.normal_compatibility_threshold_deg))

    @property
    def active_window(self) -> int:
        # Clamp to avoid i32 underflow of frame_index - window while keeping
        # "always active" semantics for the INT_MAX default (main.cc:368-371).
        return min(self.surfel_integration_active_window_size, 2**30)

    @property
    def unprojection(self):
        return (1.0 / self.fx, 1.0 / self.fy,
                -(self.cx - 0.5) / self.fx, -(self.cy - 0.5) / self.fy)


# ---------------------------------------------------------------------------
# Componentwise vec3 helpers: a "vec" is a tuple of three (N,) arrays.
# ---------------------------------------------------------------------------

def _v(m: jnp.ndarray):
    """(3, N) array -> tuple of 3 (N,) views."""
    return (m[0], m[1], m[2])


def _stack(v) -> jnp.ndarray:
    return jnp.stack(v, axis=0)


def _transform(T: jnp.ndarray, v):
    """Apply (3,4) rigid transform rows to a componentwise vec."""
    x, y, z = v
    return (T[0, 0] * x + T[0, 1] * y + T[0, 2] * z + T[0, 3],
            T[1, 0] * x + T[1, 1] * y + T[1, 2] * z + T[1, 3],
            T[2, 0] * x + T[2, 1] * y + T[2, 2] * z + T[2, 3])


def _rotate(T: jnp.ndarray, v):
    x, y, z = v
    return (T[0, 0] * x + T[0, 1] * y + T[0, 2] * z,
            T[1, 0] * x + T[1, 1] * y + T[1, 2] * z,
            T[2, 0] * x + T[2, 1] * y + T[2, 2] * z)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _gather(v, idx):
    return (v[0][idx], v[1][idx], v[2][idx])


def _where(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def _project(params: FusionParams, local):
    """Project camera-space points -> (u, v, px, py, in_image).

    Pixel int via C-style truncation; the reference also rejects
    pixel_pos < 0 before truncation (kernels.cu:1496-1500).
    """
    x, y, z = local
    safe_z = jnp.where(z > 0, z, 1.0)
    u = params.fx * (x / safe_z) + params.cx
    v = params.fy * (y / safe_z) + params.cy
    px = u.astype(jnp.int32)
    py = v.astype(jnp.int32)
    in_image = (z > 0) & (u >= 0) & (v >= 0) & \
        (px < params.width) & (py < params.height)
    return u, v, px, py, in_image


def _side_pixel(params: FusionParams, u, v, px, py):
    """Second association pixel from the sub-pixel position: the neighbor
    toward which the surfel leans within its pixel (kernels.cu:1506-1555).
    Returns (sx, sy, valid)."""
    x_frac = u - px.astype(jnp.float32)
    y_frac = v - py.astype(jnp.float32)
    bl = x_frac < y_frac              # bottom-left triangle half
    near = x_frac < 1.0 - y_frac      # toward top-left

    left = bl & near
    bottom = bl & ~near
    top = ~bl & near
    right = ~bl & ~near

    sx = jnp.where(left, px - 1, jnp.where(right, px + 1, px))
    sy = jnp.where(top, py - 1, jnp.where(bottom, py + 1, py))
    valid = jnp.where(
        left, px > 1,                      # quirk preserved: px > 1, not >= 1
        jnp.where(right, px < params.width - 1,
                  jnp.where(top, py > 0, py < params.height - 1)))
    return sx, sy, valid


def _flat(params: FusionParams, px, py, valid):
    """Flattened pixel index; INVALID (dropped by scatters) when masked."""
    return jnp.where(valid, py * params.width + px, INVALID_INDEX)


def _unproject_image_flat(params: FusionParams, depth_m_flat: jnp.ndarray):
    """(HW,) meters -> componentwise camera-space points at pixel centers."""
    hw = depth_m_flat.shape[0]
    fx_inv, fy_inv, cx_inv, cy_inv = params.unprojection
    lin = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)[:, 0]
    xs = (lin % params.width).astype(jnp.float32)
    ys = (lin // params.width).astype(jnp.float32)
    return (depth_m_flat * (fx_inv * xs + cx_inv),
            depth_m_flat * (fy_inv * ys + cy_inv),
            depth_m_flat)


def _normal_flat(normals_xy: jnp.ndarray, hw: int):
    """(2, H, W) stored normal -> componentwise (HW,) with
    z = -sqrt(1 - x^2 - y^2) (kernels.cu:810-812)."""
    nx = normals_xy[0].reshape(hw)
    ny = normals_xy[1].reshape(hw)
    nz = -jnp.sqrt(jnp.maximum(0.0, 1.0 - nx * nx - ny * ny))
    return (nx, ny, nz)


# ---------------------------------------------------------------------------
# The per-frame fusion update.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("params",), donate_argnums=(0,))
def integrate_frame(
    state: SurfelState,
    depth: jnp.ndarray,          # (H, W) u16, preprocessed
    normals_xy: jnp.ndarray,     # (2, H, W) f32
    radius_img: jnp.ndarray,     # (H, W) f32 squared radii
    color: jnp.ndarray,          # (3, H, W) u8
    global_T_local: jnp.ndarray,  # (3, 4) f32
    local_T_global: jnp.ndarray,  # (3, 4) f32
    frame_index: jnp.ndarray,    # () i32
    params: FusionParams,
) -> SurfelState:
    """One fusion step == CUDASurfelReconstruction::Integrate
    (cuda_surfel_reconstruction.cc:112-320)."""
    n = state.pos.shape[1]
    h, w = params.height, params.width
    hw = h * w
    noise = params.sensor_noise_factor
    inv_scale = jnp.float32(1.0 / params.depth_scaling)
    cos_compat = jnp.float32(params.cos_normal_compat)
    reg_factor_sq = jnp.float32(
        params.radius_factor_for_regularization_neighbors ** 2)

    frame_index = jnp.asarray(frame_index, jnp.int32)

    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    in_count = idx < state.surfel_count
    active = in_count & (state.last_update_stamp >
                         frame_index - params.active_window)

    # Shared per-surfel projection of the *raw* position (kernels.cu:1481-1493).
    pos_v = _v(state.pos)
    local_pos = _transform(local_T_global, pos_v)
    z = local_pos[2]
    u, v, px, py, in_image = _project(params, local_pos)
    sx, sy, side_ok = _side_pixel(params, u, v, px, py)

    proj_a = active & in_image
    pix_a = _flat(params, px, py, proj_a)
    proj_b = proj_a & side_ok
    pix_b = _flat(params, sx, sy, proj_b)

    def _dbg_return(*live):
        # Keep `live` values observable so XLA cannot dead-code-eliminate the
        # phases under test (used only with params.debug_stop_after).
        probe = sum(jnp.sum(jnp.ravel(v)[:1].astype(jnp.float32))
                    for v in live)
        return state._replace(
            merge_count=state.merge_count + probe.astype(jnp.int32))

    # --- Phase 1: RenderMinDepth (kernels.cu:1458-1557) -------------------
    first_depth = jnp.full((hw,), jnp.inf, jnp.float32)
    first_depth = first_depth.at[pix_a].min(z, mode="drop")
    first_depth = first_depth.at[pix_b].min(z, mode="drop")
    if params.debug_stop_after <= 1:
        return _dbg_return(first_depth)

    # --- Phase 2: Associate (kernels.cu:1586-1854) ------------------------
    depth_m_flat = depth.reshape(hw).astype(jnp.float32) * inv_scale
    normals_img = _normal_flat(normals_xy, hw)
    radius_flat = radius_img.reshape(hw)

    normal_v = _v(state.normal)
    local_normal = _rotate(local_T_global, normal_v)
    surfel_dist = jnp.sqrt(_dot(local_pos, local_pos))
    facing_ok = (_dot(local_pos, local_normal) /
                 jnp.maximum(surfel_dist, 1e-30)) <= \
        SURFEL_NORMAL_TO_VIEWING_DIR_THRESHOLD

    def associate_checks(pix, on):
        """Common per-candidate-pixel tests; returns (on, conflicting, meas)."""
        pixc = jnp.clip(pix, 0, hw - 1)
        meas = depth_m_flat[pixc]
        on = on & (meas > 0)
        first = first_depth[pixc]
        conflict_zone = first < (1.0 - noise) * meas
        is_conflicting = on & conflict_zone & (first == z)
        on = on & ~conflict_zone
        occluded = z > (1.0 + noise) * meas
        on = on & ~occluded
        on = on & facing_ok
        # Normal compatibility when the measurement is in front
        # (kernels.cu:1653-1668); the measurement normal is in camera space.
        meas_normal = _gather(normals_img, pixc)
        compat_needed = meas < z
        compat = _dot(local_normal, meas_normal) >= cos_compat
        on = on & (~compat_needed | compat)
        return on, is_conflicting, meas

    support_a, conflict_a, _ = associate_checks(pix_a, proj_a)
    support_b, conflict_b, _ = associate_checks(pix_b, proj_b)
    support_a = support_a & (state.radius_sq > 0)   # <= 0 rejected (cu:1673-1676)
    support_b = support_b & (state.radius_sq > 0)

    conflicting_surfels = jnp.full((hw,), INVALID_INDEX, jnp.int32)
    conflicting_surfels = conflicting_surfels.at[
        jnp.where(conflict_a, pix_a, INVALID_INDEX)].min(idx, mode="drop")
    conflicting_surfels = conflicting_surfels.at[
        jnp.where(conflict_b, pix_b, INVALID_INDEX)].min(idx, mode="drop")

    supporting_surfels = jnp.full((hw,), INVALID_INDEX, jnp.int32)
    supporting_surfels = supporting_surfels.at[
        jnp.where(support_a, pix_a, INVALID_INDEX)].min(idx, mode="drop")
    supporting_surfels = supporting_surfels.at[
        jnp.where(support_b, pix_b, INVALID_INDEX)].min(idx, mode="drop")

    support_counts = jnp.zeros((hw,), jnp.int32)
    support_counts = support_counts.at[
        jnp.where(support_a, pix_a, INVALID_INDEX)].add(1, mode="drop")
    support_counts = support_counts.at[
        jnp.where(support_b, pix_b, INVALID_INDEX)].add(1, mode="drop")

    support_depth_sums = jnp.zeros((hw,), jnp.float32)
    support_depth_sums = support_depth_sums.at[
        jnp.where(support_a, pix_a, INVALID_INDEX)].add(z, mode="drop")
    support_depth_sums = support_depth_sums.at[
        jnp.where(support_b, pix_b, INVALID_INDEX)].add(z, mode="drop")
    if params.debug_stop_after <= 2:
        return _dbg_return(first_depth, supporting_surfels, support_counts,
                           support_depth_sums, conflicting_surfels)

    # --- Phase 3: Merge (kernels.cu:1857-2096) ----------------------------
    # Only the main pixel participates; a surfel tombstones itself when the
    # pixel's supported surfel is a different, very similar surfel.  The merge
    # pass also marks conflicts (kernels.cu:1881-1890) — it runs over all
    # surfels with radius >= 0, not only the active window.
    merge_on = in_count & (state.radius_sq >= 0) & in_image
    m_on, m_conflict, _ = associate_checks(pix_a, merge_on)
    conflicting_surfels = conflicting_surfels.at[
        jnp.where(m_conflict, pix_a, INVALID_INDEX)].min(idx, mode="drop")
    supported = supporting_surfels[jnp.clip(pix_a, 0, hw - 1)]
    m_on = m_on & (supported != idx) & (supported != INVALID_INDEX)
    sup_idx = jnp.clip(supported, 0, n - 1)
    other_radius = state.radius_sq[sup_idx]
    radius_ratio = state.radius_sq / jnp.where(other_radius != 0,
                                               other_radius, 1e-30)
    m_on = m_on & (radius_ratio <= MERGE_RADIUS_DIFF_THRESHOLD_SQ) & \
        (radius_ratio >= 1.0 / MERGE_RADIUS_DIFF_THRESHOLD_SQ)
    sup_pos = _gather(pos_v, sup_idx)
    diff = _sub(pos_v, sup_pos)
    dist_sq = _dot(diff, diff)
    m_on = m_on & (dist_sq <= MERGE_DISTANCE_FACTOR *
                   (state.radius_sq + other_radius))
    sup_normal = _gather(normal_v, sup_idx)
    m_on = m_on & (_dot(normal_v, sup_normal) >= MERGE_COS_NORMAL_THRESHOLD)

    last_update_stamp = jnp.where(m_on, 0, state.last_update_stamp)
    radius_sq = jnp.where(m_on, -1.0, state.radius_sq)
    detach = state.detach | m_on
    merge_count = state.merge_count + jnp.sum(m_on.astype(jnp.int32))
    if params.debug_stop_after <= 3:
        return _dbg_return(last_update_stamp, radius_sq, detach,
                           supporting_surfels, conflicting_surfels,
                           first_depth, support_counts, support_depth_sums)

    # --- Phase 4: Measurement blending (kernels.cu:563-738, .cc:148-205) --
    if params.do_blending:
        depth = _blend_measurements(
            params, depth, supporting_surfels.reshape(h, w),
            support_counts.reshape(h, w), support_depth_sums.reshape(h, w))
        depth_m_flat = depth.reshape(hw).astype(jnp.float32) * inv_scale

    # Camera-space measurement data (post-blending).
    points_local = _unproject_image_flat(params, depth_m_flat)
    points_global = _transform(global_T_local, points_local)
    normals_global = _rotate(global_T_local, normals_img)
    color_flat = (color[0].reshape(hw), color[1].reshape(hw),
                  color[2].reshape(hw))
    if params.debug_stop_after <= 4:
        return _dbg_return(depth_m_flat, points_global[0], normals_global[0])

    # --- Phase 5: Integrate measurements (kernels.cu:741-1142) ------------
    attrs = dict(
        pos=pos_v, smooth=_v(state.smooth_pos), normal=normal_v,
        color=tuple(c.astype(jnp.float32) for c in _v(state.color)),
        detach=detach, conf=state.confidence, radius=radius_sq,
        creation=state.creation_stamp, stamp=last_update_stamp,
        neighbors=state.neighbors,
    )
    base_on = active & in_image & (radius_sq >= 0)

    def integrate_at(attrs, pix, on):
        pixc = jnp.clip(pix, 0, hw - 1)
        meas = depth_m_flat[pixc]
        on = on & (meas > 0)
        first = first_depth[pixc]
        conflict_zone = first < (1.0 - noise) * meas
        conflicting = on & conflict_zone & (first == z) & \
            (conflicting_surfels[pixc] == idx)
        on = on & ~conflict_zone
        on = on & ~(z > (1.0 + noise) * meas)

        g_pos = _gather(points_global, pixc)
        g_normal = _gather(normals_global, pixc)
        g_color = tuple(c[pixc].astype(jnp.float32) for c in color_flat)
        g_radius = radius_flat[pixc]

        # Conflict handling (kernels.cu:816-868): confidence - 1; at zero the
        # surfel is re-initialized from the measurement and flags detach.
        new_conf = attrs["conf"] - 1.0
        reinit = conflicting & (new_conf <= 0)
        dec = conflicting & ~reinit

        a = dict(attrs)
        a["pos"] = _where(reinit, g_pos, attrs["pos"])
        a["smooth"] = _where(reinit, g_pos, attrs["smooth"])
        a["normal"] = _where(reinit, g_normal, attrs["normal"])
        a["color"] = _where(reinit, g_color, attrs["color"])
        a["detach"] = jnp.where(reinit, True, attrs["detach"])
        a["radius"] = jnp.where(reinit, g_radius, attrs["radius"])
        a["neighbors"] = jnp.where(reinit[None, :], INVALID_INDEX,
                                   attrs["neighbors"])
        a["conf"] = jnp.where(reinit, 1.0,
                              jnp.where(dec, new_conf, attrs["conf"]))
        a["creation"] = jnp.where(reinit, frame_index, attrs["creation"])
        a["stamp"] = jnp.where(reinit, frame_index, attrs["stamp"])

        # Same-surface checks (kernels.cu:875-919).
        local_srf_normal = _rotate(local_T_global, a["normal"])
        dot_view = _dot(local_pos, local_srf_normal) / \
            jnp.maximum(surfel_dist, 1e-30)
        on = on & (dot_view <= SURFEL_NORMAL_TO_VIEWING_DIR_THRESHOLD)
        compat_needed = meas < z
        local_meas_normal = _gather(normals_img, pixc)
        compat = _dot(local_srf_normal, local_meas_normal) >= cos_compat
        on = on & (~compat_needed | compat)
        on = on & (a["radius"] >= 0)
        # Surfels replaced this frame are not updated (kernels.cu:937-940).
        on = on & (a["creation"] < frame_index)

        weight = 1.0 / jnp.maximum(
            1, support_counts[pixc]).astype(jnp.float32)
        conf = a["conf"]
        norm_factor = 1.0 / (conf + weight)

        new_conf2 = jnp.minimum(conf + weight, params.max_surfel_confidence)
        a["conf"] = jnp.where(on, new_conf2, a["conf"])
        blended = tuple((conf * p + weight * g) * norm_factor
                        for p, g in zip(a["pos"], g_pos))
        a["pos"] = _where(on, blended, a["pos"])
        nrm = tuple(conf * s + weight * g
                    for s, g in zip(a["normal"], g_normal))
        nrm_len = jnp.maximum(jnp.sqrt(_dot(nrm, nrm)), 1e-30)
        nrm = tuple(c / nrm_len for c in nrm)
        a["normal"] = _where(on, nrm, a["normal"])
        a["radius"] = jnp.where(on, jnp.minimum(a["radius"], g_radius),
                                a["radius"])
        # u8 color blend with +0.5 truncation (kernels.cu:962-967);
        # the update also clears the detach flag.
        new_color = tuple(jnp.floor((conf * c + weight * g) * norm_factor
                                    + 0.5)
                          for c, g in zip(a["color"], g_color))
        a["color"] = _where(on, new_color, a["color"])
        a["detach"] = jnp.where(on, False, a["detach"])
        a["stamp"] = jnp.where(on, frame_index, a["stamp"])
        return a

    attrs = integrate_at(attrs, pix_a, base_on)
    attrs = integrate_at(attrs, pix_b, base_on & side_ok)

    pos_v = attrs["pos"]
    smooth_v = attrs["smooth"]
    normal_v = attrs["normal"]
    color_v = tuple(jnp.clip(c, 0, 255).astype(jnp.uint8)
                    for c in attrs["color"])
    detach = attrs["detach"]
    confidence = attrs["conf"]
    radius_sq = attrs["radius"]
    creation_stamp = attrs["creation"]
    last_update_stamp = attrs["stamp"]
    neighbors = attrs["neighbors"]
    if params.debug_stop_after <= 5:
        return _dbg_return(pos_v[0], smooth_v[0], normal_v[0], color_v[0],
                           confidence, radius_sq, last_update_stamp,
                           neighbors)

    # --- Phase 6: Neighbor update (kernels.cu:1197-1455) ------------------
    neighbors = _update_neighbors(
        params, idx, active, local_pos, z, px, py,
        pos_v, normal_v, radius_sq, detach,
        neighbors, depth_m_flat, radius_flat,
        supporting_surfels, local_T_global)
    if params.debug_stop_after <= 6:
        return _dbg_return(neighbors, pos_v[0], smooth_v[0])

    # --- Phase 7: New surfel creation (kernels.cu:90-271, .cc:37-146) -----
    (pos_v, smooth_v, normal_v, color_v, detach, confidence, radius_sq,
     creation_stamp, last_update_stamp, neighbors, surfel_count,
     overflow_count) = _create_new_surfels(
        params, depth, radius_flat, supporting_surfels, conflicting_surfels,
        points_global, normals_global, color_flat, depth_m_flat,
        pos_v, smooth_v, normal_v, color_v, detach, confidence, radius_sq,
        creation_stamp, last_update_stamp, neighbors,
        state.surfel_count, state.overflow_count, frame_index)
    if params.debug_stop_after <= 7:
        return _dbg_return(pos_v[0], smooth_v[0], normal_v[0], color_v[0],
                           confidence, radius_sq, neighbors,
                           surfel_count[None], overflow_count[None])

    # --- Phase 8: Regularization (kernels.cu:2099-2410) -------------------
    if params.regularization_iterations == 0:
        recent = last_update_stamp >= \
            frame_index - params.regularization_frame_window_size
        smooth_v = _where(recent, pos_v, smooth_v)
    else:
        for _ in range(params.regularization_iterations):
            smooth_v, neighbors = _regularize(
                params, idx, pos_v, smooth_v, normal_v, radius_sq,
                last_update_stamp, neighbors, frame_index)

    return SurfelState(
        pos=_stack(pos_v), smooth_pos=_stack(smooth_v),
        normal=_stack(normal_v), color=_stack(color_v),
        detach=detach, confidence=confidence, radius_sq=radius_sq,
        creation_stamp=creation_stamp, last_update_stamp=last_update_stamp,
        neighbors=neighbors, surfel_count=surfel_count,
        merge_count=merge_count, overflow_count=overflow_count)


# ---------------------------------------------------------------------------
# Phase implementations.
# ---------------------------------------------------------------------------

def _blend_measurements(params, depth, supporting_surfels, counts, sums):
    """Observation-boundary blending (kernels.cu:563-738, kernels.cc:148-205).

    BFS feathering from measurement/surfel boundaries: raw depth is pulled
    toward the average supporting-surfel depth with a weight decaying over
    `measurement_blending_radius` rings.  The reference's in-place races are
    resolved by Jacobi iterations over a previous-ring snapshot.
    """
    h, w = depth.shape
    radius = params.measurement_blending_radius
    scale = jnp.float32(params.depth_scaling)

    def shifted(img, dy, dx, fill=0):
        p = jnp.pad(img, 1, constant_values=fill)
        return p[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    supported = supporting_surfels != INVALID_INDEX
    valid = depth != 0
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    interior = (xs >= 1) & (ys >= 1) & (xs < w - 1) & (ys < h - 1)
    eligible = interior & valid & supported

    meas_border = jnp.zeros((h, w), bool)
    surf_border = jnp.zeros((h, w), bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb_valid = shifted(valid, dy, dx, fill=False)
            nb_supported = shifted(supported, dy, dx, fill=False)
            meas_border |= ~nb_valid
            surf_border |= nb_valid & ~nb_supported
    meas_border &= eligible
    surf_border &= eligible

    avg = sums / jnp.maximum(counts, 1).astype(jnp.float32)
    delta0 = avg - depth.astype(jnp.float32) / scale

    # distance rings: 0 = untouched, 1..radius-1 = ring, 255 = unknown.
    dist_map = jnp.where(meas_border, 1,
                         jnp.where(eligible, 255, 0)).astype(jnp.int32)
    deltas = jnp.where(meas_border, delta0, 0.0)
    new_dist = jnp.where(surf_border, 1, 0).astype(jnp.int32)
    new_deltas = jnp.where(surf_border, delta0, 0.0)

    depth_f = depth.astype(jnp.float32)
    depth_f = jnp.where(meas_border,
                        jnp.floor(scale * avg + 0.5), depth_f)

    unsupported_target = interior & valid & ~supported

    def ring(carry, it):
        depth_f, dist_map, deltas, new_dist, new_deltas = carry
        interp = (it.astype(jnp.float32) - 1.0) / (radius - 1.0)
        blend_w = scale * (1.0 - interp)

        def ring_avg(dmap, dvals):
            ssum = jnp.zeros((h, w), jnp.float32)
            cnt = jnp.zeros((h, w), jnp.int32)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    at_ring = shifted(dmap, dy, dx) == it - 1
                    ssum += jnp.where(at_ring, shifted(dvals, dy, dx), 0.0)
                    cnt += at_ring.astype(jnp.int32)
            return ssum, cnt

        ssum, cnt = ring_avg(dist_map, deltas)
        grow = (dist_map == 255) & (cnt > 0)
        avg_d = ssum / jnp.maximum(cnt, 1).astype(jnp.float32)
        dist_map = jnp.where(grow, it, dist_map)
        deltas = jnp.where(grow, avg_d, deltas)
        depth_f = jnp.where(grow, depth_f + blend_w * avg_d + 0.5, depth_f)

        nsum, ncnt = ring_avg(new_dist, new_deltas)
        ngrow = unsupported_target & (new_dist == 0) & (ncnt > 0)
        navg = nsum / jnp.maximum(ncnt, 1).astype(jnp.float32)
        new_dist = jnp.where(ngrow, it, new_dist)
        new_deltas = jnp.where(ngrow, navg, new_deltas)
        depth_f = jnp.where(ngrow, depth_f + blend_w * navg + 0.5, depth_f)
        return (depth_f, dist_map, deltas, new_dist, new_deltas), None

    if radius >= 2:
        (depth_f, *_), _ = jax.lax.scan(
            ring, (depth_f, dist_map, deltas, new_dist, new_deltas),
            jnp.arange(2, radius, dtype=jnp.int32))
    return jnp.clip(jnp.floor(depth_f), 0, 65535).astype(jnp.uint16)


def _update_neighbors(params, idx, active, local_pos, z, px, py,
                      pos_v, normal_v, radius_sq, detach,
                      neighbors, depth_m_flat, radius_flat,
                      supporting_surfels, local_T_global):
    """Refresh the 4 regularization neighbors from the supporting-surfel maps
    of the 4 adjacent pixels (kernels.cu:1197-1455)."""
    n = radius_sq.shape[0]
    h, w = params.height, params.width
    hw = h * w
    noise = params.sensor_noise_factor
    reg_factor_sq = jnp.float32(
        params.radius_factor_for_regularization_neighbors ** 2)

    border_ok = (px >= 1) & (py >= 1) & (px < w - 1) & (py < h - 1) & (z > 0)
    on = active & border_ok
    pixc = jnp.clip(jnp.where(on, py * w + px, 0), 0, hw - 1)
    meas = depth_m_flat[pixc]
    on = on & ~(z > (1.0 + noise) * meas)     # zero meas occludes everything
    local_normal = _rotate(local_T_global, normal_v)
    sdist = jnp.sqrt(_dot(local_pos, local_pos))
    on = on & ((_dot(local_pos, local_normal) /
                jnp.maximum(sdist, 1e-30)) <=
               SURFEL_NORMAL_TO_VIEWING_DIR_THRESHOLD)
    on = on & (radius_sq >= 0)
    if CHECK_SCALE_COMPAT_NEIGHBORS:
        obs_radius = radius_flat[pixc]
        on = on & (obs_radius / jnp.where(radius_sq != 0, radius_sq, 1e-30)
                   <= MAX_OBSERVATION_RADIUS_FACTOR ** 2)

    # Existing neighbor slots with squared distances (raw positions),
    # kept as 4 separate (N,) lanes.
    slot_idx = [neighbors[k] for k in range(4)]
    slot_dist = []
    for k in range(4):
        valid_k = slot_idx[k] != INVALID_INDEX
        clip_k = jnp.clip(slot_idx[k], 0, n - 1)
        d = _sub(pos_v, _gather(pos_v, clip_k))
        slot_dist.append(jnp.where(valid_k, _dot(d, d), jnp.inf))

    for (dx, dy) in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        cand_pix = jnp.clip(pixc + dy * w + dx, 0, hw - 1)
        cand = supporting_surfels[cand_pix]
        c_ok = on & (cand != INVALID_INDEX) & (cand != idx)
        cand_clip = jnp.clip(cand, 0, n - 1)
        cd = _sub(_gather(pos_v, cand_clip), pos_v)
        c_dist = _dot(cd, cd)
        c_ok = c_ok & (c_dist <= reg_factor_sq * radius_sq)
        c_ok = c_ok & (_dot(normal_v, _gather(normal_v, cand_clip)) > 0)

        already = (slot_idx[0] == cand)
        for k in range(1, 4):
            already = already | (slot_idx[k] == cand)
        c_ok = c_ok & ~already

        # Replace the farthest slot if the candidate is closer (first max
        # wins, like the reference's strict > scan, kernels.cu:1353-1369).
        best = jnp.zeros_like(idx)
        best_dist = slot_dist[0]
        for k in range(1, 4):
            better = slot_dist[k] > best_dist
            best = jnp.where(better, k, best)
            best_dist = jnp.where(better, slot_dist[k], best_dist)
        c_ok = c_ok & (c_dist < best_dist)
        for k in range(4):
            hit = c_ok & (best == k)
            slot_idx[k] = jnp.where(hit, cand, slot_idx[k])
            slot_dist[k] = jnp.where(hit, c_dist, slot_dist[k])

    # Drop neighbors whose surfel has the detach flag set
    # (kernels.cu:1420-1437); applies to every surfel, not only active ones.
    for k in range(4):
        clip_k = jnp.clip(slot_idx[k], 0, n - 1)
        slot_detach = detach[clip_k] & (slot_idx[k] != INVALID_INDEX)
        slot_idx[k] = jnp.where(slot_detach, INVALID_INDEX, slot_idx[k])
    return jnp.stack(slot_idx, axis=0)


def _create_new_surfels(params, depth, radius_flat, supporting_surfels,
                        conflicting_surfels, points_global, normals_global,
                        color_flat, depth_m_flat,
                        pos_v, smooth_v, normal_v, color_v, detach, confidence,
                        radius_sq, creation_stamp, last_update_stamp,
                        neighbors, surfel_count, overflow_count, frame_index):
    """Append a surfel for every unexplained valid depth pixel
    (kernels.cu:90-271); index compaction via cumsum replaces CUB's
    DeviceScan::ExclusiveSum (kernels.cc:94-113)."""
    h, w = depth.shape
    hw = h * w
    n = radius_sq.shape[0]
    reg_factor_sq = jnp.float32(
        params.radius_factor_for_regularization_neighbors ** 2)

    lin = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)[:, 0]
    xs = lin % w
    ys = lin // w
    interior = (xs >= 1) & (ys >= 1) & (xs < w - 1) & (ys < h - 1)
    flags_flat = interior & (depth.reshape(hw) > 0) & \
        (supporting_surfels == INVALID_INDEX) & \
        (conflicting_surfels == INVALID_INDEX)

    prefix = jnp.cumsum(flags_flat.astype(jnp.int32)) - \
        flags_flat.astype(jnp.int32)
    total = prefix[-1] + flags_flat[-1].astype(jnp.int32)
    dest = surfel_count + prefix                      # (HW,)
    fits = flags_flat & (dest < n)
    dest_idx = jnp.where(fits, dest, INVALID_INDEX)

    # Initial neighbors from the 4 adjacent pixels (kernels.cu:189-224):
    # an adjacent supporting surfel within range, else the adjacent pixel's
    # new surfel (depth-difference proximity test).
    nbr_slots = []
    exist_sum = (jnp.zeros((hw,), jnp.float32),) * 3
    exist_sum = list(exist_sum)
    exist_cnt = jnp.ones((hw,), jnp.float32)  # count + 1
    for (dx, dy) in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        adj = jnp.clip(lin + dy * w + dx, 0, hw - 1)
        sup = supporting_surfels[adj]
        has_sup = sup != INVALID_INDEX
        supc = jnp.clip(sup, 0, n - 1)
        d = _sub(_gather(pos_v, supc), points_global)
        d_sq = _dot(d, d)
        in_range = d_sq <= reg_factor_sq * radius_flat
        use_sup = has_sup & in_range
        sup_smooth = _gather(smooth_v, supc)
        for k in range(3):
            exist_sum[k] = exist_sum[k] + jnp.where(use_sup,
                                                    sup_smooth[k], 0.0)
        exist_cnt += use_sup.astype(jnp.float32)

        adj_new = flags_flat[adj]
        approx_sq = (depth_m_flat - depth_m_flat[adj]) ** 2
        use_new = (~has_sup) & adj_new & \
            (approx_sq <= reg_factor_sq * radius_flat)
        adj_dest = surfel_count + prefix[adj]
        slot = jnp.where(use_sup, sup,
                         jnp.where(use_new & (adj_dest < n), adj_dest,
                                   INVALID_INDEX))
        nbr_slots.append(slot)
    new_smooth = tuple((points_global[k] + exist_sum[k]) / exist_cnt
                       for k in range(3))

    pos_out = []
    smooth_out = []
    normal_out = []
    color_out = []
    for k in range(3):
        pos_out.append(pos_v[k].at[dest_idx].set(points_global[k],
                                                 mode="drop"))
        smooth_out.append(smooth_v[k].at[dest_idx].set(new_smooth[k],
                                                       mode="drop"))
        normal_out.append(normal_v[k].at[dest_idx].set(normals_global[k],
                                                       mode="drop"))
        color_out.append(color_v[k].at[dest_idx].set(color_flat[k],
                                                     mode="drop"))
    detach = detach.at[dest_idx].set(False, mode="drop")
    confidence = confidence.at[dest_idx].set(1.0, mode="drop")
    radius_sq = radius_sq.at[dest_idx].set(radius_flat, mode="drop")
    creation_stamp = creation_stamp.at[dest_idx].set(frame_index, mode="drop")
    last_update_stamp = last_update_stamp.at[dest_idx].set(
        frame_index, mode="drop")
    nbr_rows = [neighbors[k].at[dest_idx].set(nbr_slots[k], mode="drop")
                for k in range(4)]

    created = jnp.minimum(total, jnp.maximum(n - surfel_count, 0))
    overflow_count = overflow_count + (total - created)
    surfel_count = surfel_count + created
    return (tuple(pos_out), tuple(smooth_out), tuple(normal_out),
            tuple(color_out), detach, confidence, radius_sq,
            creation_stamp, last_update_stamp, jnp.stack(nbr_rows, axis=0),
            surfel_count, overflow_count)


def _regularize(params, idx, pos_v, smooth_v, normal_v, radius_sq,
                last_update_stamp, neighbors, frame_index):
    """One gradient-descent denoising iteration (kernels.cu:2099-2308).

    Each surfel contributes plane-distance gradient terms to its recent
    neighbors (atomicAdd in CUDA -> segment scatter-add here), then every
    recent surfel takes a step on its smoothed position with a data term
    toward the raw position, step length clamped to the surfel radius.
    """
    n = radius_sq.shape[0]
    w_reg = jnp.float32(params.regularizer_weight)
    window = params.regularization_frame_window_size
    reg_factor_sq = jnp.float32(
        params.radius_factor_for_regularization_neighbors ** 2)

    slot = [neighbors[k] for k in range(4)]
    use = []
    to_nbr = []
    ndot = []
    nbr_dist_sq = []
    cnt = jnp.zeros((n,), jnp.float32)
    for k in range(4):
        valid_k = slot[k] != INVALID_INDEX
        clip_k = jnp.clip(slot[k], 0, n - 1)
        recent_k = last_update_stamp[clip_k] >= frame_index - window
        u = valid_k & recent_k
        use.append(u)
        cnt += u.astype(jnp.float32)
        d = _sub(_gather(smooth_v, clip_k), smooth_v)
        to_nbr.append(d)
        ndot.append(_dot(normal_v, d))
        nbr_dist_sq.append(_dot(d, d))

    factor = 2.0 * w_reg / jnp.maximum(cnt, 1.0)
    grad = [jnp.zeros((n,), jnp.float32) for _ in range(3)]
    gcount = jnp.zeros((n,), jnp.float32)
    for k in range(4):
        tgt = jnp.where(use[k], slot[k], INVALID_INDEX)
        term_scale = factor * ndot[k]
        for c in range(3):
            grad[c] = grad[c].at[tgt].add(
                jnp.where(use[k], term_scale * normal_v[c], 0.0),
                mode="drop")
        gcount = gcount.at[tgt].add(
            jnp.where(use[k], w_reg / jnp.maximum(cnt, 1.0), 0.0),
            mode="drop")
        # Remove active neighbors that drifted out of range
        # (kernels.cu:2184-2192).
        drop = use[k] & (nbr_dist_sq[k] > reg_factor_sq * radius_sq)
        slot[k] = jnp.where(drop, INVALID_INDEX, slot[k])

    # Per-surfel step (kernels.cu:2197-2308) over the updated neighbor list.
    recent = last_update_stamp >= frame_index - window
    reg_grad = [jnp.zeros((n,), jnp.float32) for _ in range(3)]
    cnt2 = jnp.zeros((n,), jnp.float32)
    for k in range(4):
        valid_k = slot[k] != INVALID_INDEX
        clip_k = jnp.clip(slot[k], 0, n - 1)
        d = _sub(_gather(smooth_v, clip_k), smooth_v)
        nd = _dot(normal_v, d)
        for c in range(3):
            reg_grad[c] = reg_grad[c] - jnp.where(valid_k, nd * normal_v[c],
                                                  0.0)
        cnt2 += valid_k.astype(jnp.float32)
    factor2 = jnp.where(cnt2 > 0, 2.0 * w_reg / jnp.maximum(cnt2, 1.0), 0.0)

    gradient = tuple(2.0 * (smooth_v[c] - pos_v[c]) + grad[c] +
                     factor2 * reg_grad[c] for c in range(3))
    weight_sum = 1.0 + w_reg + gcount
    step = 0.5 / weight_sum
    max_step = jnp.sqrt(radius_sq)      # NaN for merged surfels, as in CUDA
    grad_len = step * jnp.sqrt(_dot(gradient, gradient))
    step_factor = jnp.where(grad_len > max_step,
                            max_step / jnp.maximum(grad_len, 1e-30) * step,
                            step)
    new_smooth = tuple(smooth_v[c] - step_factor * gradient[c]
                       for c in range(3))
    smooth_v = _where(recent, new_smooth, smooth_v)
    return smooth_v, jnp.stack(slot, axis=0)


# ---------------------------------------------------------------------------
# Export / snapshot.
# ---------------------------------------------------------------------------

@jax.jit
def export_vertices(state: SurfelState):
    """ExportVerticesCUDA (kernels.cu:2412-2464): smoothed positions with NaN
    for merged surfels, plus colors.  Returns ((3, N) f32, (3, N) u8)."""
    merged = state.radius_sq < 0
    positions = jnp.where(merged[None, :], jnp.nan, state.smooth_pos)
    return positions, state.color


@jax.jit
def meshing_snapshot(state: SurfelState):
    """The SoA snapshot consumed by the meshing engine — same fields the
    reference downloads in TransferAllToCPU
    (cuda_surfel_reconstruction.cc:339-359)."""
    return (state.smooth_pos, state.radius_sq, state.normal,
            state.last_update_stamp, state.surfel_count)
