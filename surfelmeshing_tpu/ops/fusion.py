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

Memory layout: **one packed (N, PACK_WIDTH) f32 attribute matrix** (the
reference keeps a (25, N) attribute buffer for the same coalescing reason,
kernels.cuh:39-48).  TPU gathers cost ~1 pass per *index stream* regardless of
row width (up to the 128-lane tile), so fetching a whole surfel row costs the
same as fetching one scalar; packing collapses what would be dozens of scalar
gathers per frame into a handful of row gathers.  Integer attributes ride in
f32 lanes via bitcast; XLA lays the matrix out column-contiguous, so
per-attribute column slices in elementwise phases are free.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

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

# Pack column indices (analog of kSurfelX.. in kernels.cuh:49-78).  The
# order is chosen so every hot gather reads ONE contiguous column slice
# (gather cost scales with the index stream, not the row width, so wide
# contiguous slices are free while concat-materializing a sub-pack is not):
#   [SX..STAMP]   regularization distance gather
#   [NX..RCNT]    regularization cross-term gather
#   [PX..DETACH]  neighbor-update candidate/slot gather
#   [PX..SZ]      creation supporter gather
#   [PX..RAD]     merge gather
PX, PY, PZ = 0, 1, 2          # raw position
SX, SY, SZ = 3, 4, 5          # smoothed position
STAMP = 6                     # last-update stamp (i32 bitcast)
NX, NY, NZ = 7, 8, 9          # normal
RCNT = 10                     # last-computed recent-neighbor count (f32)
DETACH = 11                   # neighbor detach request flag (0.0 / 1.0)
CONF = 12                     # confidence
RAD = 13                      # squared radius (-1 == merged away)
CR, CG, CB = 14, 15, 16       # color (0..255 in f32)
CREATION = 17                 # creation stamp (i32 bitcast)
PACK_WIDTH = 18


# Debug tap: tests set _TAP to a dict and run integrate_frame under
# jax.disable_jit() to capture intermediate phase maps for oracle
# comparison (under jit, _TAP is None at trace time and taps are no-ops).
_TAP = None


def _tap(name, value):
    if _TAP is not None:
        _TAP[name] = value


def _i32(col: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(col, jnp.int32)


def _f32bits(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x.astype(jnp.int32), jnp.float32)


class SurfelState(NamedTuple):
    """Fixed-capacity packed surfel map; a pytree living in HBM."""
    pack: jnp.ndarray           # (N, PACK_WIDTH) f32
    neighbors: jnp.ndarray      # (4, N) i32 slot-major, INVALID_INDEX = none
                                #   (slot-major so per-slot index vectors are
                                #   contiguous rows: 1-D gathers with no
                                #   layout conversion)
    nbr_dist: jnp.ndarray       # (4, N) f32 stored squared slot distances
                                #   (+inf for empty slots); maintained by the
                                #   fast_neighbor_update path, see
                                #   FusionParams.fast_neighbor_update
    surfel_count: jnp.ndarray   # () i32
    merge_count: jnp.ndarray    # () i32
    overflow_count: jnp.ndarray  # () i32: creations dropped at capacity
    skipped_tile_count: jnp.ndarray  # () i32: tiles past the active budget
    active_tile_count: jnp.ndarray   # () i32: tiles the LAST tiled frame
                                     #   wanted (frontier + flagged) — the
                                     #   visible-set demand signal that
                                     #   auto-sizes the next frame's budget


def create_surfel_state(capacity: int) -> SurfelState:
    pack = np.zeros((capacity, PACK_WIDTH), np.float32)
    pack[:, STAMP] = np.asarray(np.int32(-(2**30))).view(np.float32)
    return SurfelState(
        pack=jnp.asarray(pack),
        neighbors=jnp.full((4, capacity), INVALID_INDEX, jnp.int32),
        nbr_dist=jnp.full((4, capacity), jnp.inf, jnp.float32),
        surfel_count=jnp.zeros((), jnp.int32),
        merge_count=jnp.zeros((), jnp.int32),
        overflow_count=jnp.zeros((), jnp.int32),
        skipped_tile_count=jnp.zeros((), jnp.int32),
        active_tile_count=jnp.zeros((), jnp.int32),
    )


# -- convenience accessors (host/test side) ---------------------------------

def positions(state: SurfelState) -> jnp.ndarray:
    return state.pack[:, PX:PZ + 1]


def smooth_positions(state: SurfelState) -> jnp.ndarray:
    return state.pack[:, SX:SZ + 1]


def normals(state: SurfelState) -> jnp.ndarray:
    return state.pack[:, NX:NZ + 1]


def confidences(state: SurfelState) -> jnp.ndarray:
    return state.pack[:, CONF]


def radii_sq(state: SurfelState) -> jnp.ndarray:
    return state.pack[:, RAD]


def colors_u8(state: SurfelState) -> jnp.ndarray:
    return jnp.clip(state.pack[:, CR:CB + 1], 0, 255).astype(jnp.uint8)


def creation_stamps(state: SurfelState) -> jnp.ndarray:
    return _i32(state.pack[:, CREATION])


def update_stamps(state: SurfelState) -> jnp.ndarray:
    return _i32(state.pack[:, STAMP])


def plant_surfel(state: SurfelState, index: int, pos, normal,
                 confidence: float = 1.0, radius_sq: float = 1e-4,
                 creation: int = 0, stamp: int = 0,
                 smooth=None, color=(128, 128, 128)) -> SurfelState:
    """Test helper: write one surfel's attributes into the pack."""
    row = np.zeros(PACK_WIDTH, np.float32)
    row[PX:PZ + 1] = pos
    row[SX:SZ + 1] = pos if smooth is None else smooth
    row[NX:NZ + 1] = normal
    row[CONF] = confidence
    row[RAD] = radius_sq
    row[CR:CB + 1] = color
    row[CREATION] = np.int32(creation).view(np.float32)
    row[STAMP] = np.int32(stamp).view(np.float32)
    return state._replace(pack=state.pack.at[index].set(jnp.asarray(row)))


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
    # Static per-frame creation budget.  Creations beyond it are dropped and
    # re-attempted next frame (their pixels stay unsupported), so bursts ramp
    # over a few frames; a tight budget keeps the creation scatter small and
    # the bucketed-shape bound tight.
    max_creations_per_frame: int = 2**15
    # Active-set tiling: when > 0, each frame gathers a working set of
    # `active_surfel_budget` surfels — the tiles (contiguous slot ranges of
    # `tile_size` rows) containing any live surfel that projects into the
    # image or was updated within the regularization window, plus the
    # creation frontier — and runs all per-surfel phases on it.  Per-frame
    # cost then tracks the visible/recent set instead of the capacity (the
    # CUDA analog: kernels launch over surfel_count and gate on the active
    # window, kernels.cu:77-87).  Requires capacity % tile_size == 0.
    # 0 disables tiling (every slot processed every frame).
    active_surfel_budget: int = 0
    tile_size: int = 4096
    # Measurement blending backend: None = auto (Pallas kernel on TPU, XLA
    # elsewhere).  Both run the same _blend_core; results agree to within
    # one depth unit (backends differ in FMA contraction).
    pallas_blending: bool | None = None
    # Regularization cross-term accumulation:
    #   True  (TPU-native default): gather over each surfel's own neighbor
    #          slots assuming mutual adjacency — no scatter at all.  The
    #          paper's objective sum_edges w (n . (p_i - p_j))^2 is symmetric,
    #          so this computes the same gradient whenever links are mutual
    #          (they almost always are: both ends pick nearest supporters).
    #   False (reference parity): scatter-add the exact i->j cross terms like
    #          the CUDA atomicAdd accumulation (kernels.cu:2115-2194).
    symmetric_regularization: bool = True
    # Conflict arbitration:
    #   False (TPU-native default): a surfel is the pixel's conflictor iff
    #          first_depth == its depth (exact f32 equality — the same test
    #          the reference uses, kernels.cu:1610-1618); the conflict MAP is
    #          never materialized (its "pixel has a conflictor" role is the
    #          elementwise test first < (1-noise)*meas).  Deviation from the
    #          reference only when two distinct surfels project with bitwise-
    #          equal depth to the same pixel (both then decrement).
    #   True:  build the min-index conflictor map like the reference's
    #          last-writer map, guaranteeing a single decrementer per pixel.
    exact_conflict_arbitration: bool = False
    # Pixel-map construction backend for phases 1-2 (the three per-pixel
    # reduction maps: min-depth raster, min-index supporter, count+depth-sum):
    #   True  (TPU-native default): sort the surfel->pixel candidate stream
    #          by pixel key (TPU sort of 1M i32 keys measures ~1.6 ms,
    #          tools/sort_probe.py), reduce each contiguous pixel run with
    #          guarded prefix passes (vector-rate), and write run results
    #          with ONE unique-index row set per map.  Bit-identical to the
    #          scatter path: min/add reductions are order-independent.
    #   False: three .at[].min/.add scatter streams (scalar-unit bound,
    #          ~143M updates/s -> ~7 ms per stream at 1M candidates).
    sorted_pixel_maps: bool = True
    # Mega-sort consolidation (round-3 lever): ONE key sort + ONE restore
    # sort per frame build the three pixel maps AND deliver every
    # per-candidate pixel value, with association flags computed in the
    # sorted domain (the per-pixel dummy's image columns broadcast over
    # its run).  Only applies when the other static conditions hold (see
    # mega_sort gating in _integrate_body); bit-exact vs the 2-sort path.
    mega_sort: bool = True
    # Neighbor update (phase 6) slot handling:
    #   True  (TPU-native default): existing-slot distances come from the
    #          stored state.nbr_dist column (written at creation, candidate
    #          replacement, and refreshed from *smoothed* positions every
    #          regularization pass) instead of re-gathering the 4 neighbor
    #          positions per frame — dropping 4 of the 8 neighbor-update
    #          gather streams.  Detached neighbors are dropped one phase
    #          later by the regularization pass (merged tombstones via their
    #          zero stamp, moved reinit targets via the distance test)
    #          instead of the same-frame detach sweep, and candidates
    #          carrying a detach flag are not inserted at all.  Quality
    #          impact bounded by the deviation A/B test (tests/test_fusion).
    #   False (reference parity): re-gather slot positions + detach every
    #          frame like UpdateNeighborsCUDAKernel (kernels.cu:1302-1322)
    #          and the detach sweep (kernels.cu:1420-1437).
    fast_neighbor_update: bool = True
    # Profiling aid: stop the compiled program after phase k in PROGRAM
    # order (1=min-depth, 2=associate, 3=blend [hoisted before merge],
    # 4=merge, 5=integrate, 6=neighbors, 7=create).
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
# Small helpers.
# ---------------------------------------------------------------------------

def _project(params: FusionParams, x, y, z):
    """Project camera-space points -> (u, v, px, py, in_image).

    Pixel int via C-style truncation; the reference also rejects
    pixel_pos < 0 before truncation (kernels.cu:1496-1500)."""
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
    toward which the surfel leans within its pixel (kernels.cu:1506-1555)."""
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


def _safe_idx(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Clamp gather indices so INVALID/out-of-range rows read row 0 (near
    the live region) instead of row n-1: clipping INVALID_INDEX to the far
    end of a large array makes every gather stride between the live region
    and the array tail (measured 6x slowdown at 20M rows; PERF.md)."""
    return jnp.where((idx < 0) | (idx >= n), 0, idx)


def _shift_flat(img_flat: jnp.ndarray, hw: int, shift: int) -> jnp.ndarray:
    """img[i + shift] over a flattened image; out-of-range -> 0.

    Adjacent-pixel access at +-1 / +-W is a regular stride: express it as a
    pad+slice instead of a gather."""
    if shift == 0:
        return img_flat
    if shift > 0:
        return jnp.concatenate(
            [img_flat[shift:], jnp.zeros((shift,), img_flat.dtype)])
    return jnp.concatenate(
        [jnp.zeros((-shift,), img_flat.dtype), img_flat[:shift]])


# ---------------------------------------------------------------------------
# The per-frame fusion update.
# ---------------------------------------------------------------------------

def _integrate_dispatch(state, depth, normals_xy, radius_img, color,
                        global_T_local, local_T_global, frame_index, params):
    if 0 < params.active_surfel_budget < state.pack.shape[0]:
        return _integrate_tiled(state, depth, normals_xy, radius_img, color,
                                global_T_local, local_T_global, frame_index,
                                params)
    return _integrate_body(state, depth, normals_xy, radius_img, color,
                           global_T_local, local_T_global, frame_index,
                           params)


# TPU compiles get a raised memory-space-assignment VMEM budget: the xplane
# trace shows row gathers from VMEM(S(1))-placed image packs running 4x
# faster than from HBM (209M vs 76M idx/s), and the default ~16 MiB scoped
# budget leaves the phase-3 post-blend pack and several scatter operand
# streams in HBM.  Per-jit compiler_options (proto-backed DebugOptions
# flags) are forwarded by the remote-compile path; CPU/other backends get
# no options (the TPU flag is unknown to them).
_TPU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
_backend_jit_cache = {}


def _in_trace() -> bool:
    """True when called under an outer jit trace (compiler_options are only
    legal on a top-level jit, so nested calls must inline)."""
    try:
        from jax._src import core as _core
        return not _core.trace_state_clean()
    except Exception:
        return False


def _backend_jit(key, fn, **jit_kwargs):
    """jax.jit with _TPU_COMPILER_OPTIONS on TPU backends, resolved lazily
    at first call (module import happens before the backend is chosen).
    Under an outer trace the function is returned un-jitted: it inlines
    into the caller's jit (whose own compiler options apply)."""
    if _in_trace():
        return functools.partial(fn)
    backend = jax.default_backend()
    cached = _backend_jit_cache.get((key, backend))
    if cached is None:
        tpu = backend in ("tpu", "axon")
        cached = jax.jit(
            fn, compiler_options=_TPU_COMPILER_OPTIONS if tpu else None,
            **jit_kwargs)
        _backend_jit_cache[(key, backend)] = cached
    return cached


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
    fn = _backend_jit("integrate_frame", _integrate_dispatch,
                      static_argnames=("params",), donate_argnums=(0,))
    return fn(state, depth, normals_xy, radius_img, color, global_T_local,
              local_T_global, frame_index, params)


@functools.partial(jax.jit, static_argnames=("params",))
def integrate_frame_probe(
    state: SurfelState,
    depth: jnp.ndarray,
    normals_xy: jnp.ndarray,
    radius_img: jnp.ndarray,
    color: jnp.ndarray,
    global_T_local: jnp.ndarray,
    local_T_global: jnp.ndarray,
    frame_index: jnp.ndarray,
    params: FusionParams,
) -> SurfelState:
    """Non-donating integrate for staged stage timing: callers pass
    params.debug_stop_after = k and difference blocked wall times to get
    per-phase device ms (the reference brackets each phase with cudaEvents,
    cuda_surfel_reconstruction.cc:112-320; XLA programs can't be bracketed,
    so the cumulative-prefix programs are timed instead)."""
    if 0 < params.active_surfel_budget < state.pack.shape[0]:
        return _integrate_tiled(state, depth, normals_xy, radius_img, color,
                                global_T_local, local_T_global, frame_index,
                                params)
    return _integrate_body(state, depth, normals_xy, radius_img, color,
                           global_T_local, local_T_global, frame_index,
                           params)


def _integrate_tiled(
    state: SurfelState,
    depth: jnp.ndarray,
    normals_xy: jnp.ndarray,
    radius_img: jnp.ndarray,
    color: jnp.ndarray,
    global_T_local: jnp.ndarray,
    local_T_global: jnp.ndarray,
    frame_index: jnp.ndarray,
    params: FusionParams,
) -> SurfelState:
    """Active-set fusion: gather the tiles holding this frame's relevant
    surfels (in-image, recently updated, or on the creation frontier), run
    the full 8-phase update on that working set, scatter the tiles back.

    Replaces the reference's dynamic surfel_count kernel grids + active
    window gating (kernels.cu:77-87) under XLA's static shapes: per-frame
    cost tracks the visible/recent set, not the 20M capacity.  Tiles beyond
    the budget are skipped for the frame (their surfels go stale and their
    pixels may spawn duplicate surfels, later merged); the count is
    recorded in skipped_tile_count.  Frontier tiles are compacted first so
    creations are never dropped by tile overflow.
    """
    n = state.pack.shape[0]
    ts = params.tile_size
    if n % ts != 0:
        raise ValueError(
            f"active_surfel_budget requires capacity ({n}) to be a "
            f"multiple of tile_size ({ts})")
    if not params.symmetric_regularization:
        raise ValueError("active_surfel_budget requires "
                         "symmetric_regularization (the exact scatter "
                         "accumulation needs full shapes)")
    k_cap = max(params.active_surfel_budget // ts, 1)
    t_n = n // ts
    # The creation frontier [surfel_count, surfel_count + budget) spans at
    # most budget//ts + 1 tiles; it must always fit or creations would be
    # silently lost while surfel_count still grows.
    c_budget_ = min(params.max_creations_per_frame,
                    params.height * params.width)
    if k_cap < c_budget_ // ts + 1:
        raise ValueError(
            f"active_surfel_budget ({params.active_surfel_budget}) too "
            f"small for the creation frontier: needs at least "
            f"{(c_budget_ // ts + 1) * ts} (max_creations_per_frame + one "
            f"tile)")
    frame_index = jnp.asarray(frame_index, jnp.int32)
    pack, neighbors = state.pack, state.neighbors

    # Tile flag pass: one elementwise sweep over capacity (bandwidth-bound;
    # no per-row scatters or gathers).
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    live = row_idx < state.surfel_count
    Tl = local_T_global
    ox, oy, oz = pack[:, PX], pack[:, PY], pack[:, PZ]
    lx = Tl[0, 0] * ox + Tl[0, 1] * oy + Tl[0, 2] * oz + Tl[0, 3]
    ly = Tl[1, 0] * ox + Tl[1, 1] * oy + Tl[1, 2] * oz + Tl[1, 3]
    z = Tl[2, 0] * ox + Tl[2, 1] * oy + Tl[2, 2] * oz + Tl[2, 3]
    _, _, _, _, in_image = _project(params, lx, ly, z)
    stamps = _i32(pack[:, STAMP])
    recent = stamps >= frame_index - params.regularization_frame_window_size
    tflags = jnp.any((live & (in_image | recent)).reshape(t_n, ts), axis=1)

    # Creation frontier tiles: [surfel_count, surfel_count + budget).
    c_budget = min(params.max_creations_per_frame,
                   params.height * params.width)
    tile_start = jax.lax.broadcasted_iota(jnp.int32, (t_n, 1), 0)[:, 0] * ts
    frontier = (tile_start < state.surfel_count + c_budget) & \
        (tile_start + ts > state.surfel_count)

    # Prioritized compaction over the (tiny) tile axis: frontier tiles
    # first — they must never be dropped — then the flagged rest.
    f = frontier.astype(jnp.int32)
    o = (tflags & ~frontier).astype(jnp.int32)
    fpos = jnp.cumsum(f) - f
    num_f = fpos[-1] + f[-1]
    opos = jnp.cumsum(o) - o + num_f
    pos = jnp.where(frontier, fpos,
                    jnp.where(o > 0, opos, INVALID_INDEX))
    pos = jnp.where(pos < k_cap, pos, INVALID_INDEX)      # (t_n,) tile_pos
    tile_iota = jax.lax.broadcasted_iota(jnp.int32, (t_n, 1), 0)[:, 0]
    tile_ids = jnp.full((k_cap,), INVALID_INDEX, jnp.int32).at[pos].set(
        tile_iota, mode="drop", unique_indices=True)
    total_tiles = opos[-1] + o[-1]          # frontier + flagged rest
    skipped = jnp.maximum(total_tiles - k_cap, 0)

    # Gather the working set (whole-tile block gathers: bandwidth-bound).
    ids_c = jnp.clip(tile_ids, 0, t_n - 1)
    pack_w = pack.reshape(t_n, ts, PACK_WIDTH)[ids_c].reshape(
        k_cap * ts, PACK_WIDTH)
    nbr_w = jnp.stack([
        neighbors[k].reshape(t_n, ts)[ids_c].reshape(k_cap * ts)
        for k in range(4)])
    dist_w = jnp.stack([
        state.nbr_dist[k].reshape(t_n, ts)[ids_c].reshape(k_cap * ts)
        for k in range(4)])
    slot_live = tile_ids != INVALID_INDEX
    gidx = jnp.where(
        slot_live[:, None],
        ids_c[:, None] * ts +
        jax.lax.broadcasted_iota(jnp.int32, (1, ts), 1),
        INVALID_INDEX).reshape(-1)

    tiling = _Tiling(tile_ids=tile_ids, tile_pos=pos, gidx=gidx,
                     full_pack=pack, full_neighbors=neighbors)
    wstate = SurfelState(
        pack=pack_w, neighbors=nbr_w, nbr_dist=dist_w,
        surfel_count=state.surfel_count,
        merge_count=state.merge_count, overflow_count=state.overflow_count,
        skipped_tile_count=state.skipped_tile_count + skipped,
        active_tile_count=total_tiles)
    out = _integrate_body(wstate, depth, normals_xy, radius_img, color,
                          global_T_local, local_T_global, frame_index,
                          params, tiling)

    # Final writeback of the working tiles.
    full_pack = pack.reshape(t_n, ts, PACK_WIDTH).at[tile_ids].set(
        out.pack.reshape(k_cap, ts, PACK_WIDTH), mode="drop",
        unique_indices=True).reshape(n, PACK_WIDTH)
    full_nbr = jnp.stack([
        neighbors[k].reshape(t_n, ts).at[tile_ids].set(
            out.neighbors[k].reshape(k_cap, ts), mode="drop",
            unique_indices=True).reshape(n)
        for k in range(4)])
    full_dist = jnp.stack([
        state.nbr_dist[k].reshape(t_n, ts).at[tile_ids].set(
            out.nbr_dist[k].reshape(k_cap, ts), mode="drop",
            unique_indices=True).reshape(n)
        for k in range(4)])
    return SurfelState(
        pack=full_pack, neighbors=full_nbr, nbr_dist=full_dist,
        surfel_count=out.surfel_count,
        merge_count=out.merge_count, overflow_count=out.overflow_count,
        skipped_tile_count=out.skipped_tile_count,
        active_tile_count=out.active_tile_count)


def integrate_frame_bucketed(*args, **kwargs):
    """integrate_frame over only the first n_eff surfel slots.

    Every per-surfel stream costs O(n) regardless of how many slots are live,
    so the driver picks n_eff = next bucket above surfel_count (+ creation
    headroom) and this variant runs the whole update on sliced views, then
    writes the rows back.  Requires n_eff >= surfel_count +
    max_creations_per_frame so in-frame creations stay inside the slice.
    This mirrors the reference's count-sized kernel grids
    (cuda_surfel_reconstruction.cc:131-140: every kernel launches over
    surfels_size, not capacity)."""
    fn = _backend_jit("integrate_frame_bucketed", _integrate_bucketed_impl,
                      static_argnames=("params", "n_eff"),
                      donate_argnums=(0,))
    return fn(*args, **kwargs)


def _integrate_bucketed_impl(
    state: SurfelState,
    depth: jnp.ndarray,
    normals_xy: jnp.ndarray,
    radius_img: jnp.ndarray,
    color: jnp.ndarray,
    global_T_local: jnp.ndarray,
    local_T_global: jnp.ndarray,
    frame_index: jnp.ndarray,
    params: FusionParams,
    n_eff: int,
) -> SurfelState:
    n = state.pack.shape[0]
    if n_eff >= n:
        # Full-shape bucket: route through the dispatch so active-set
        # tiling still applies (a direct _integrate_body here silently
        # disabled --active_surfel_budget on the app path).
        return _integrate_dispatch(state, depth, normals_xy, radius_img,
                                   color, global_T_local, local_T_global,
                                   frame_index, params)
    sub = state._replace(pack=state.pack[:n_eff],
                         neighbors=state.neighbors[:, :n_eff],
                         nbr_dist=state.nbr_dist[:, :n_eff])
    sub = _integrate_body(sub, depth, normals_xy, radius_img, color,
                          global_T_local, local_T_global, frame_index,
                          params)
    return state._replace(
        pack=jax.lax.dynamic_update_slice(state.pack, sub.pack, (0, 0)),
        neighbors=jax.lax.dynamic_update_slice(state.neighbors,
                                               sub.neighbors, (0, 0)),
        nbr_dist=jax.lax.dynamic_update_slice(state.nbr_dist,
                                              sub.nbr_dist, (0, 0)),
        surfel_count=sub.surfel_count,
        merge_count=sub.merge_count,
        overflow_count=sub.overflow_count)


class _Sharding(NamedTuple):
    """Surfel-axis SPMD context: the pack rows are sharded over a mesh axis
    (the tensor-parallel analog for this workload, used via
    parallel.shard.make_sharded_step under jax.shard_map).

    Per-shard scatters build local image maps that are combined with
    pmin/psum over ICI (three ~1.2 MB maps per frame); gathers by global
    surfel index read an all-gathered pack.  Bit-exact vs the single-device
    path: min/add scatters are order-independent, so local-then-combine
    equals the global scatter.
    """
    axis: str            # mesh axis name
    offset: jnp.ndarray  # global surfel index of this shard's row 0


class _Tiling(NamedTuple):
    """Working-set context for the tiled (active-set) fusion path.

    tile_ids[k] is the global tile index held by working-tile slot k
    (INVALID_INDEX for unused slots); tile_pos[t] is the inverse map; gidx
    is the per-working-row global surfel index (INVALID_INDEX on unused
    slots).  full_pack/full_neighbors are the capacity-sized arrays; the
    body scatters the working tiles back into them before every
    gather-by-global-index ("sync") and at the end.
    """
    tile_ids: jnp.ndarray       # (K,) i32
    tile_pos: jnp.ndarray       # (T,) i32 working slot per tile or INVALID
    gidx: jnp.ndarray           # (K*tile_size,) i32
    full_pack: jnp.ndarray      # (N, PACK_WIDTH)
    full_neighbors: jnp.ndarray  # (N, 4)


def _seg_prefix(sk, vals):
    """Guarded Hillis-Steele prefix reductions over contiguous runs of the
    sorted key vector `sk`: after ceil(log2(m)) passes, position i holds the
    reduction over every j <= i with sk[j] == sk[i] (runs are contiguous, so
    the same-key-at-lag guard composes transitively).  `vals` is a list of
    (vector, op) with op in {"minf", "mini", "sum"}; returns reduced vectors.
    All passes are elementwise/shift work (vector-rate; tools/sort_probe.py
    measures 20 passes over 1M x 2 streams at ~0.5 ms) — no scatters."""
    m = sk.shape[0]
    idents = {"minf": jnp.inf, "mini": INVALID_INDEX, "sum": 0}
    vals = [(v, op) for v, op in vals]
    shift = 1
    while shift < m:
        lag_k = jnp.concatenate(
            [jnp.full((shift,), -1, sk.dtype), sk[:-shift]])
        guard = lag_k == sk
        out = []
        for v, op in vals:
            ident = jnp.asarray(idents[op], v.dtype)
            lag_v = jnp.concatenate(
                [jnp.full((shift,), ident, v.dtype), v[:-shift]])
            contrib = jnp.where(guard, lag_v, ident)
            if op == "sum":
                v = v + contrib
            else:
                v = jnp.minimum(v, contrib)
            out.append((v, op))
        vals = out
        shift *= 2
    return [v for v, _ in vals]


def _seg_broadcast_last(sk, vals):
    """Backward pointer-jumping over contiguous runs of the sorted key
    vector `sk`: after ceil(log2(m)) passes every element holds the value
    of the LAST element of its run (where the dummy entry sits, carrying
    the run total after _seg_prefix and any dummy-attached per-pixel
    payloads).  Inductive invariant: after pass k, v_i = orig[min(run_end,
    i + 2^k - 1)]."""
    m = sk.shape[0]
    shift = 1
    while shift < m:
        lead_k = jnp.concatenate(
            [sk[shift:], jnp.full((shift,), -2, sk.dtype)])
        guard = lead_k == sk
        vals = [jnp.where(guard,
                          jnp.concatenate(
                              [v[shift:], jnp.zeros((shift,), v.dtype)]),
                          v) for v in vals]
        shift *= 2
    return vals


class _StageScopes:
    """Sequential jax.named_scope sections without re-indenting the phase
    code: calling the instance with a stage name closes the previous scope
    and opens `sm_<name>`; calling with None closes the current one.  The
    scope names land in HLO metadata op_name (CPU) / the xplane tf_op stat
    (TPU), which is how utils/stage_trace.py attributes traced device time
    to the reference's --log_timings columns (main.cc:1531-1545) — the XLA
    analog of the reference's per-phase cudaEvent brackets
    (cuda_surfel_reconstruction.cc:112-320)."""

    def __init__(self):
        self._cm = None

    def __call__(self, name):
        if self._cm is not None:
            self._cm.__exit__(None, None, None)
            self._cm = None
        if name is not None:
            self._cm = jax.named_scope("sm_" + name)
            self._cm.__enter__()


def _gather_flat_lane8(src_flat, idx):
    """Flat 1-col gather via the lane8 trick (PERF.md): view the source as
    (M/8, 8) rows, gather row idx>>3, select lane idx&7 — ~2.1x the
    width-1 gather rate.  Falls back to a plain gather when M % 8 != 0."""
    m = src_flat.shape[0]
    if m % 8 != 0:
        return src_flat[idx]
    rows = src_flat.reshape(-1, 8)[idx >> 3]
    lane = (idx & 7)[:, None]
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    return jnp.sum(jnp.where(lane == iota8, rows, 0), axis=1)


def _integrate_body(
    state: SurfelState,
    depth: jnp.ndarray,
    normals_xy: jnp.ndarray,
    radius_img: jnp.ndarray,
    color: jnp.ndarray,
    global_T_local: jnp.ndarray,
    local_T_global: jnp.ndarray,
    frame_index: jnp.ndarray,
    params: FusionParams,
    tiling: _Tiling | None = None,
    shard: _Sharding | None = None,
) -> SurfelState:
    n = state.pack.shape[0]
    h, w = params.height, params.width
    hw = h * w
    noise = params.sensor_noise_factor
    inv_scale = jnp.float32(1.0 / params.depth_scaling)
    cos_compat = jnp.float32(params.cos_normal_compat)

    frame_index = jnp.asarray(frame_index, jnp.int32)
    pack = state.pack

    # Merge-phase gather source, built at the TOP of the frame from the
    # pristine pack (the merge tombstone is the frame's first pack
    # mutation): pos/normal/radius in ONE <=8-wide concat (fast-gather
    # rules, PERF.md).  Hoisting lengthens its produce->consume window
    # across the association sorts so memory-space assignment stages it in
    # VMEM — traced 6.7 -> ~2 ms at 500k rows when S(1)-placed (round-4
    # trace, fusion.1753).
    if tiling is not None:
        merge_pack0 = tiling.full_pack
    elif shard is not None:
        merge_pack0 = jax.lax.all_gather(pack, shard.axis, axis=0,
                                         tiled=True)
    else:
        merge_pack0 = pack
    merge_src = jnp.concatenate(
        [merge_pack0[:, PX:PZ + 1], merge_pack0[:, NX:NZ + 1],
         merge_pack0[:, RAD:RAD + 1]], axis=1)         # 7 cols
    if tiling is None:
        # Barrier: stop XLA from sinking this concat into an HBM-resident
        # producer fusion.  As a standalone (N,7) buffer with a frame-long
        # produce->consume window, memory-space assignment can stage it in
        # VMEM like the sibling S(1) gather sources (~110 vs ~250M idx/s,
        # PERF.md round-4 trace).  Semantics-neutral.  Skipped when tiling:
        # there the source is the full-capacity pack and a forced
        # materialization would copy O(capacity) bytes every frame.
        merge_src = jax.lax.optimization_barrier(merge_src)

    def combine_min(img):
        """Combine per-shard scatter maps (identity off the sharded path)."""
        return img if shard is None else jax.lax.pmin(img, shard.axis)

    def combine_add(img):
        return img if shard is None else jax.lax.psum(img, shard.axis)

    if shard is not None:
        assert tiling is None
        idx = shard.offset + \
            jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

        def sync(pack_w):
            """Global-index gathers read the all-gathered pack (rows are
            ordered by shard, so global row i is row i of the gather)."""
            return jax.lax.all_gather(pack_w, shard.axis, axis=0, tiled=True)

        def dest_translate(dest):
            """Global row index -> this shard's local row (creations are
            written only by the shard that owns their slot range)."""
            local = dest - shard.offset
            return jnp.where((dest == INVALID_INDEX) | (local < 0) |
                             (local >= n), INVALID_INDEX, local)
    elif tiling is None:
        idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

        def sync(pack_w):
            """Full-shape mode: the working pack IS the full pack."""
            return pack_w

        def dest_translate(dest):
            return dest
    else:
        ts = params.tile_size
        idx = tiling.gidx
        n_full = tiling.full_pack.shape[0]

        def sync(pack_w):
            """Scatter the working tiles back into the full pack so
            gathers by global surfel index see this frame's updates."""
            k_cap = tiling.tile_ids.shape[0]
            return tiling.full_pack.reshape(-1, ts, PACK_WIDTH).at[
                tiling.tile_ids].set(
                pack_w.reshape(k_cap, ts, PACK_WIDTH), mode="drop",
                unique_indices=True).reshape(n_full, PACK_WIDTH)

        def dest_translate(dest):
            """Global row index -> working-copy row index (creations land
            in frontier tiles, which are always resident)."""
            wt = tiling.tile_pos[jnp.clip(dest // ts, 0,
                                          tiling.tile_pos.shape[0] - 1)]
            return jnp.where((wt == INVALID_INDEX) | (dest == INVALID_INDEX),
                             INVALID_INDEX,
                             jnp.minimum(wt, n // ts) * ts + dest % ts)

    in_count = (idx != INVALID_INDEX) & (idx < state.surfel_count)
    stamps = _i32(pack[:, STAMP])
    active = in_count & (stamps > frame_index - params.active_window)

    # Shared per-surfel projection of the *raw* position (kernels.cu:1481-1493).
    Tl = local_T_global
    ox, oy, oz = pack[:, PX], pack[:, PY], pack[:, PZ]
    lx = Tl[0, 0] * ox + Tl[0, 1] * oy + Tl[0, 2] * oz + Tl[0, 3]
    ly = Tl[1, 0] * ox + Tl[1, 1] * oy + Tl[1, 2] * oz + Tl[1, 3]
    z = Tl[2, 0] * ox + Tl[2, 1] * oy + Tl[2, 2] * oz + Tl[2, 3]
    u, v, px, py, in_image = _project(params, lx, ly, z)
    sx, sy, side_ok = _side_pixel(params, u, v, px, py)

    proj_a = active & in_image
    pix_a = jnp.where(proj_a, py * w + px, INVALID_INDEX)
    proj_b = proj_a & side_ok
    pix_b = jnp.where(proj_b, sy * w + sx, INVALID_INDEX)
    # Gather pixels are valid for every live in-image surfel, not only
    # active ones: the merge pass is not active-window gated (the reference
    # comments the gate out, kernels.cu:2016-2017).  The scatter streams
    # above stay active-gated (kernels.cu:1477,1718).
    img_a = in_count & in_image
    pix_a_c = jnp.clip(jnp.where(img_a, py * w + px, 0), 0, hw - 1)
    pix_b_c = jnp.clip(jnp.where(img_a & side_ok, sy * w + sx, 0), 0,
                       hw - 1)

    stage = _StageScopes()

    def _dbg_return(*live):
        stage(None)
        probe = sum(jnp.sum(jnp.ravel(t)[:1].astype(jnp.float32))
                    for t in live)
        return state._replace(
            merge_count=state.merge_count + probe.astype(jnp.int32))

    # --- Phase 1: RenderMinDepth (kernels.cu:1458-1557) -------------------
    stage("data_association")
    sorted_maps = params.sorted_pixel_maps
    # Mega-sort consolidation (PERF.md round-3 lever 1): ONE wide key sort
    # + ONE restore sort per frame build all three per-pixel maps AND
    # deliver every per-candidate pixel value (first-depth, measurement,
    # normal, radius, rgb, supporter, count) — the association flags are
    # computed in the SORTED domain, where the per-pixel dummy entry's
    # image columns are pointer-jump broadcast over its run, so the
    # phase-1/phase-2 sort pair collapses into one and the img_pre gather
    # pair disappears.  Applies on the default single-device path; the
    # two-sort path remains for sharded mode (per-candidate values must be
    # post-combine global there), exact conflict arbitration (conflictor
    # claims need the unsorted m_conflict flags), finite active windows
    # (merge-eligible surfels can sit outside the candidate stream), and
    # debug staging.  Bit-exact: same f32/i32 formulas, different storage
    # order (tests/test_fusion.py asserts pack equality vs the 2-sort and
    # scatter paths).
    mega_sort = (params.mega_sort and sorted_maps and shard is None
                 and not params.exact_conflict_arbitration
                 and params.active_window >= 2**30
                 and params.debug_stop_after > 8
                 and n < 2**27)
    if sorted_maps:
        # Sort-and-segment-reduce map construction (see FusionParams).
        # NO scatter anywhere: a per-element map write of a 1M stream runs
        # at the same scalar-unit rate whether RMW or unique-set (traced),
        # so the maps are extracted by a second sort instead.  One dummy
        # entry per pixel rides the stream with a doubled key (2*pix+1 vs
        # candidates' 2*pix) so it is the LAST element of its pixel run
        # regardless of sort stability; after the prefix reduction the
        # dummy holds the run total, and sorting back by source index
        # lands all hw dummies in one contiguous pixel-ordered SLICE.
        # Masked candidates key to the 2*hw sentinel and sort to the end.
        n2 = 2 * pix_a.shape[0]
        ab_key = jnp.concatenate([
            jnp.where(proj_a, 2 * pix_a, 2 * hw),
            jnp.where(proj_b, 2 * pix_b, 2 * hw),
            2 * jax.lax.iota(jnp.int32, hw) + 1])
        src_iota = jax.lax.iota(jnp.int32, n2 + hw)
    if mega_sort:
        first_depth = None        # built by the mega sort in phase 2
    elif sorted_maps:
        aug_z = jnp.concatenate(
            [z, z, jnp.full((hw,), jnp.inf, jnp.float32)])
        sk, sz_srt, ssrc = jax.lax.sort([ab_key, aug_z, src_iota],
                                        num_keys=1)
        run_key = sk >> 1                       # candidates+dummy: one run
        (min_z,) = _seg_prefix(run_key, [(sz_srt, "minf")])
        _, fd_restored = jax.lax.sort([ssrc, min_z], num_keys=1)
        first_depth = combine_min(fd_restored[n2:])
    else:
        # One concatenated scatter stream for both candidate pixels.
        first_depth = jnp.full((hw,), jnp.inf, jnp.float32)
        first_depth = combine_min(first_depth.at[
            jnp.concatenate([pix_a, pix_b])].min(
            jnp.concatenate([z, z]), mode="drop"))
    if not mega_sort:
        _tap("first_depth", first_depth)
        if params.debug_stop_after <= 1:
            return _dbg_return(first_depth)

    # --- Phase 2: Associate (kernels.cu:1586-1854) ------------------------
    depth_m_flat = depth.reshape(hw).astype(jnp.float32) * inv_scale
    mnx = normals_xy[0].reshape(hw)
    mny = normals_xy[1].reshape(hw)
    mnz = -jnp.sqrt(jnp.maximum(0.0, 1.0 - mnx * mnx - mny * mny))
    radius_flat = radius_img.reshape(hw)

    snx = Tl[0, 0] * pack[:, NX] + Tl[0, 1] * pack[:, NY] + \
        Tl[0, 2] * pack[:, NZ]
    sny = Tl[1, 0] * pack[:, NX] + Tl[1, 1] * pack[:, NY] + \
        Tl[1, 2] * pack[:, NZ]
    snz = Tl[2, 0] * pack[:, NX] + Tl[2, 1] * pack[:, NY] + \
        Tl[2, 2] * pack[:, NZ]
    surfel_dist = jnp.sqrt(lx * lx + ly * ly + z * z)
    facing_ok = ((lx * snx + ly * sny + z * snz) /
                 jnp.maximum(surfel_dist, 1e-30)) <= \
        SURFEL_NORMAL_TO_VIEWING_DIR_THRESHOLD
    radius_col = pack[:, RAD]

    def associate_checks(meas, first, p_mnx, p_mny, p_mnz, on):
        """Common per-candidate association tests; column args are the
        candidate's per-pixel values (gathered rows or restore-sort
        streams)."""
        on = on & (meas > 0)
        conflict_zone = first < (1.0 - noise) * meas
        is_conflicting = on & conflict_zone & (first == z)
        on = on & ~conflict_zone
        on = on & ~(z > (1.0 + noise) * meas)
        on = on & facing_ok
        # Normal compatibility when the measurement is in front
        # (kernels.cu:1653-1668); the measurement normal is in camera space.
        compat_needed = meas < z
        compat = (snx * p_mnx + sny * p_mny + snz * p_mnz) >= cos_compat
        on = on & (~compat_needed | compat)
        return on, is_conflicting

    if not mega_sort:
        # Pre-blend image pack (cols: depth_m, first_depth, mnx, mny, mnz,
        # radius) + one row-gather per candidate stream.  The mega path
        # delivers the same columns from its restore sort instead.
        img_pre = jnp.stack(
            [depth_m_flat, first_depth, mnx, mny, mnz, radius_flat], axis=1)
        rows_pre_a = img_pre[pix_a_c]
        rows_pre_b = img_pre[pix_b_c]
        pre_meas_a, pre_first_a = rows_pre_a[:, 0], rows_pre_a[:, 1]
        pre_mnx_a, pre_mny_a, pre_mnz_a = (rows_pre_a[:, 2],
                                           rows_pre_a[:, 3],
                                           rows_pre_a[:, 4])
        pre_rad_a = rows_pre_a[:, 5]
        pre_meas_b, pre_first_b = rows_pre_b[:, 0], rows_pre_b[:, 1]
        pre_mnx_b, pre_mny_b, pre_mnz_b = (rows_pre_b[:, 2],
                                           rows_pre_b[:, 3],
                                           rows_pre_b[:, 4])
        pre_rad_b = rows_pre_b[:, 5]

        support_a, conflict_a = associate_checks(
            pre_meas_a, pre_first_a, pre_mnx_a, pre_mny_a, pre_mnz_a,
            proj_a)
        support_b, conflict_b = associate_checks(
            pre_meas_b, pre_first_b, pre_mnx_b, pre_mny_b, pre_mnz_b,
            proj_b)
        support_a = support_a & (radius_col > 0)   # <= 0 rejected
        support_b = support_b & (radius_col > 0)   # (cu:1673-1676)

        # --- Phase 3 (part 1): merge checks that feed the conflict map ----
        # The merge pass runs over all surfels with radius >= 0, not only
        # the active window, and also marks conflicts (kernels.cu:1881-1890).
        merge_on = in_count & (radius_col >= 0) & in_image
        m_on, m_conflict = associate_checks(
            pre_meas_a, pre_first_a, pre_mnx_a, pre_mny_a, pre_mnz_a,
            merge_on)

    # Support count + depth sum ride ONE i32 reduction: the depth in the
    # low 25 bits as fixed point at depth-unit resolution (supporter depth
    # * depth_scaling <= (1+noise)*65535 < 2^17), the count in bits 25..
    # (cost is per index stream; halving the streams halves the time).
    # Documented deviation from the reference's separate f32 sums
    # (kernels.cu:1691-1694): the blending average is quantized to one
    # depth unit, and >=64 supporters on one pixel would overflow into the
    # sign bit (the sum field itself is safe: 63 * (2^17-1) < 2^25; real
    # data has a handful of supporters per pixel).
    SUM_BITS = 25
    if not mega_sort:
        z_units = jnp.clip(jnp.round(z * params.depth_scaling), 0,
                           (1 << 17) - 1).astype(jnp.int32)
        sup_idx_ab = jnp.concatenate([
            jnp.where(support_a, idx, INVALID_INDEX),
            jnp.where(support_b, idx, INVALID_INDEX)])
        packed_ab = jnp.concatenate([
            jnp.where(support_a, z_units + (1 << SUM_BITS), 0),
            jnp.where(support_b, z_units + (1 << SUM_BITS), 0)])
        if params.exact_conflict_arbitration:
            conf_idx_ab = jnp.concatenate([
                jnp.where(conflict_a | m_conflict, idx, INVALID_INDEX),
                jnp.where(conflict_b, idx, INVALID_INDEX)])
    # RGB packed into one f32 lane (u8 values are integers < 2^24, exact);
    # computed here so the sorted path can deliver it per candidate.
    cr = color[0].reshape(hw).astype(jnp.float32)
    cg = color[1].reshape(hw).astype(jnp.float32)
    cb = color[2].reshape(hw).astype(jnp.float32)
    rgb_packed = cr + cg * 256.0 + cb * 65536.0
    # Per-candidate streams (concat order [a; b]) delivered by the sorted
    # path below or by the legacy img_post gathers (scatter path).
    sup_own_ab = counts_ab = rgb_ab = conf_own_ab = None
    if mega_sort:
        # ---- The mega sort (one key sort + one restore sort) ----
        # Candidate entries carry their surfel-side values; the per-pixel
        # dummy entries carry the pixel's image columns, overlaid into the
        # SAME payload streams (a candidate never needs its pixel slot and
        # vice versa).  Flag bit 27 rides above the surfel index (mega is
        # gated on n < 2^27).
        # Payloads are THINNED by overlaying candidate-only and dummy-only
        # values in the same stream (sort cost scales with payload count):
        #   zmeas:  candidate z | dummy measurement depth
        #   radsnz: candidate camera-space normal z | dummy pixel radius
        #   mnz is NOT carried — it is recomputed from the broadcast
        #   mnx/mny with the exact formula that produced it pre-sort
        #   (-sqrt(max(0, 1-x^2-y^2))), hence bit-identical.  The candidate
        #   snz cannot be recomputed that way (it comes from the rotation,
        #   not a unit decomposition), so it rides the radius stream.
        FLAG_ELIG = jnp.int32(1 << 27)
        idx_flags = idx | jnp.where(facing_ok & (radius_col > 0),
                                    FLAG_ELIG, 0)
        # The idx stream's dummy lanes are dead (dummies have no surfel),
        # so the pixel's packed rgb rides there as i32 (u8 triplet < 2^24,
        # exact) — one payload stream fewer in the key sort.  Candidate
        # lanes still read idx|flags (is_cand excludes dummies from every
        # idx consumer); the sentinel run's broadcast picks up a masked
        # candidate's idx instead of rgb, which only flows into lanes the
        # on=False masks discard.
        s_in = [
            ab_key,
            jnp.concatenate([z, z, depth_m_flat]),
            jnp.concatenate([idx_flags, idx_flags,
                             rgb_packed.astype(jnp.int32)]),
            jnp.concatenate([snx, snx, mnx]),
            jnp.concatenate([sny, sny, mny]),
            jnp.concatenate([snz, snz, radius_flat]),
            src_iota,
        ]
        (sk, zmeas_s, idx_s, nx_s, ny_s, radsnz_s,
         src_s) = jax.lax.sort(s_in, num_keys=1)
        run_key = sk >> 1
        is_cand = ((sk & 1) == 0) & (sk < 2 * hw)
        # Run minimum of candidate z -> first_depth (dummy lanes masked to
        # inf; the dummy's slot in zmeas carries the measurement instead).
        (minz_s,) = _seg_prefix(run_key, [
            (jnp.where(is_cand, zmeas_s, jnp.inf), "minf")])
        first_s, mnx_s, mny_s, measb_s, radb_s, rgbb_s = \
            _seg_broadcast_last(run_key, [minz_s, nx_s, ny_s,
                                          zmeas_s, radsnz_s, idx_s])
        mnz_s = -jnp.sqrt(jnp.maximum(0.0, 1.0 - mnx_s * mnx_s -
                                      mny_s * mny_s))
        # Association flags IN the sorted domain (same formulas as
        # associate_checks; dummies and sentinel-run entries excluded by
        # is_cand).  nx_s/ny_s/radsnz_s hold the candidate's surfel normal
        # at candidate lanes; mnx_s.. the broadcast pixel normal.
        s_on = is_cand & (measb_s > 0)
        s_on = s_on & ~(first_s < (1.0 - noise) * measb_s)
        s_on = s_on & ~(zmeas_s > (1.0 + noise) * measb_s)
        s_on = s_on & ((idx_s & FLAG_ELIG) != 0)
        compat_s = (nx_s * mnx_s + ny_s * mny_s + radsnz_s * mnz_s) >= \
            cos_compat
        s_on = s_on & (~(measb_s < zmeas_s) | compat_s)
        own_s = idx_s & (FLAG_ELIG - 1)
        zu_s = jnp.clip(jnp.round(zmeas_s * params.depth_scaling), 0,
                        (1 << 17) - 1).astype(jnp.int32)
        sup_val = jnp.where(s_on, own_s, INVALID_INDEX)
        packed_val = jnp.where(s_on, zu_s + (1 << SUM_BITS), 0)
        sup_red, packed_red = _seg_prefix(
            run_key, [(sup_val, "mini"), (packed_val, "sum")])
        supb_s, packedb_s = _seg_broadcast_last(run_key,
                                                [sup_red, packed_red])
        restored = jax.lax.sort(
            [src_s, first_s, supb_s, packedb_s, mnx_s, mny_s,
             measb_s, radb_s, rgbb_s], num_keys=1)
        (_, r_first, r_sup, r_packed, r_mnx, r_mny, r_meas, r_rad,
         r_rgb) = restored
        first_depth = r_first[n2:]
        supporting_surfels = r_sup[n2:]
        packed = r_packed[n2:]
        conflicting_surfels = None
        sup_own_ab = r_sup[:n2]
        counts_ab = (r_packed[:n2] >> SUM_BITS).astype(jnp.float32)
        rgb_ab = r_rgb[:n2].astype(jnp.float32)   # i32 (idx-lane overlay)
        nr = n2 // 2
        r_mnz = -jnp.sqrt(jnp.maximum(0.0, 1.0 - r_mnx * r_mnx -
                                      r_mny * r_mny))
        pre_meas_a, pre_meas_b = r_meas[:nr], r_meas[nr:n2]
        pre_first_a, pre_first_b = r_first[:nr], r_first[nr:n2]
        pre_mnx_a, pre_mnx_b = r_mnx[:nr], r_mnx[nr:n2]
        pre_mny_a, pre_mny_b = r_mny[:nr], r_mny[nr:n2]
        pre_mnz_a, pre_mnz_b = r_mnz[:nr], r_mnz[nr:n2]
        pre_rad_a, pre_rad_b = r_rad[:nr], r_rad[nr:n2]
        _tap("first_depth", first_depth)
        # --- Phase 3 (part 1): merge checks (see the non-mega branch) -----
        merge_on = in_count & (radius_col >= 0) & in_image
        m_on, m_conflict = associate_checks(
            pre_meas_a, pre_first_a, pre_mnx_a, pre_mny_a, pre_mnz_a,
            merge_on)
    elif sorted_maps:
        # Second sort with the SAME augmented keys (support flags depend on
        # first_depth, so the phase-2 payloads don't exist at the first
        # sort); a second sort measures cheaper than gathering the payloads
        # through a carried permutation (tools/sort_probe.py).  Same
        # dummy-entry + restore-sort + slice extraction as phase 1, plus:
        # after the prefix reduction the run totals (at the dummy) are
        # pointer-jump broadcast back over the whole run, so the restore
        # sort ALSO returns per-candidate supporter / count+sum / rgb
        # values — replacing three columns of the post-blend gather pair.
        ops = [jnp.concatenate(
                   [sup_idx_ab, jnp.full((hw,), INVALID_INDEX, jnp.int32)]),
               jnp.concatenate([packed_ab, jnp.zeros((hw,), jnp.int32)]),
               jnp.concatenate([jnp.zeros((n2,), jnp.float32), rgb_packed])]
        if params.exact_conflict_arbitration:
            ops.append(jnp.concatenate(
                [conf_idx_ab, jnp.full((hw,), INVALID_INDEX, jnp.int32)]))
        srt = jax.lax.sort([ab_key] + ops + [src_iota], num_keys=1)
        vals = [(srt[1], "mini"), (srt[2], "sum")]
        if params.exact_conflict_arbitration:
            vals.append((srt[4], "mini"))
        red = _seg_prefix(srt[0] >> 1, vals)
        # Broadcast order fixes the restored layout: [mini, sum, rgb(,conf)]
        bc = _seg_broadcast_last(srt[0] >> 1,
                                 red[:2] + [srt[3]] + red[2:])
        restored = jax.lax.sort([srt[-1]] + bc, num_keys=1)
        supporting_surfels = combine_min(restored[1][n2:])
        packed = combine_add(restored[2][n2:])
        rgb_ab = restored[3][:n2]
        conflicting_surfels = None
        if params.exact_conflict_arbitration:
            conflicting_surfels = combine_min(restored[4][n2:])
        if shard is None:
            sup_own_ab = restored[1][:n2]
            counts_ab = (restored[2][:n2] >> SUM_BITS).astype(jnp.float32)
            if params.exact_conflict_arbitration:
                conf_own_ab = restored[4][:n2]
        else:
            # The restore-sort's per-candidate values reduce only THIS
            # shard's candidate stream; the per-candidate contract is the
            # GLOBAL per-pixel reduction (the reference's atomics produce
            # one global map, kernels.cu:1691-1694).  Re-gather them from
            # the ICI-combined maps, masked exactly like the sorted-domain
            # values (masked candidates ride the sentinel run and come
            # back INVALID / 0).
            ab_mask = jnp.concatenate([proj_a, proj_b])
            pix_ab = jnp.concatenate([pix_a_c, pix_b_c])
            sup_own_ab = jnp.where(
                ab_mask, _gather_flat_lane8(supporting_surfels, pix_ab),
                INVALID_INDEX)
            counts_ab = jnp.where(
                ab_mask, _gather_flat_lane8(packed, pix_ab) >> SUM_BITS,
                0).astype(jnp.float32)
            if params.exact_conflict_arbitration:
                conf_own_ab = jnp.where(
                    ab_mask,
                    _gather_flat_lane8(conflicting_surfels, pix_ab),
                    INVALID_INDEX)
    else:
        if params.exact_conflict_arbitration:
            conflicting_surfels = jnp.full((hw,), INVALID_INDEX, jnp.int32)
            conflicting_surfels = combine_min(conflicting_surfels.at[
                jnp.concatenate([pix_a, pix_b])].min(
                conf_idx_ab, mode="drop"))
        else:
            conflicting_surfels = None
        supporting_surfels = jnp.full((hw,), INVALID_INDEX, jnp.int32)
        supporting_surfels = combine_min(supporting_surfels.at[
            jnp.concatenate([
                jnp.where(support_a, pix_a, INVALID_INDEX),
                jnp.where(support_b, pix_b, INVALID_INDEX)])].min(
            jnp.concatenate([idx, idx]), mode="drop"))
        ab_pix = jnp.concatenate([
            jnp.where(support_a, pix_a, INVALID_INDEX),
            jnp.where(support_b, pix_b, INVALID_INDEX)])
        packed = combine_add(jnp.zeros((hw,), jnp.int32).at[ab_pix].add(
            packed_ab, mode="drop"))
    support_counts = packed >> SUM_BITS
    support_depth_sums = (packed & ((1 << SUM_BITS) - 1)).astype(
        jnp.float32) * inv_scale
    # Pixel-has-a-conflictor is elementwise: the conflict zone test
    # first < (1-noise)*meas is exactly what every would-be marker passes,
    # and the min-z surfel that wrote first_depth always evaluates it
    # (kernels.cu:1610-1618).  The explicit min-index conflictor map is only
    # materialized under exact_conflict_arbitration.
    has_conflict = first_depth < (1.0 - noise) * depth_m_flat
    _tap("supporting_surfels", supporting_surfels)
    _tap("support_counts", support_counts)
    _tap("support_depth_sums", support_depth_sums)
    _tap("has_conflict", has_conflict)
    if params.debug_stop_after <= 2:
        return _dbg_return(first_depth, supporting_surfels, support_counts,
                           support_depth_sums, has_conflict)

    stage("measurement_blending")
    # --- Phase 4 (hoisted): Measurement blending (kernels.cu:563-738) -----
    # Blending has no data dependency on the merge pass (it reads only the
    # phase-2 maps and the raw depth; merge mutates only the pack), so it
    # runs first here: the post-blend per-pixel values then ride in ONE
    # "post" image pack whose per-surfel gather also carries the
    # supporting-surfel index the merge pass needs — one gather stream
    # instead of five (geo/app at both pixels + a flat supported lookup).
    # The reference order Merge->Blend produces identical results.
    if params.do_blending:
        depth = _blend_measurements(
            params, depth, supporting_surfels.reshape(h, w),
            support_counts.reshape(h, w), support_depth_sums.reshape(h, w))
        depth_post_flat = depth.reshape(hw).astype(jnp.float32) * inv_scale
    else:
        depth_post_flat = depth_m_flat
    _tap("blended_depth", depth)

    stage("integration")
    sup_f = _f32bits(supporting_surfels)
    # Supporting-surfel index at the 4 adjacent pixels (regular shifts, not
    # gathers) for phases 6-7.
    sup_shift = [_shift_flat(sup_f, hw, s) for s in (-1, +1, -w, +w)]
    if params.exact_conflict_arbitration:
        conflict_col = _f32bits(conflicting_surfels)
    else:
        conflict_col = jnp.zeros((hw,), jnp.float32)   # img_app tap column
    n_rows = pix_a_c.shape[0]
    if sorted_maps:
        # Per-candidate supporter/count/rgb(/conflict) came back from the
        # phase-2 restore sort; only the post-blend depth and the
        # adjacent-supporter columns still need gathers — the 8-wide
        # post-blend gather pair (the last HBM-source pair, PERF.md) is
        # gone.
        if params.exact_conflict_arbitration:
            meas_ab = _gather_flat_lane8(
                depth_post_flat, jnp.concatenate([pix_a_c, pix_b_c]))
            meas_a, meas_b = meas_ab[:n_rows], meas_ab[n_rows:]
            conf_a = conf_own_ab[:n_rows]
            conf_b = conf_own_ab[n_rows:]
        else:
            # The post-blend depth at pixel A rides the adjacent-supporter
            # gather: ONE 5-wide row gather at pix_a delivers meas_a plus
            # the 4 neighbor-candidate columns, and pixel B needs only a
            # thin lane8 depth gather — 2N instead of 3N gather indices
            # per frame (gather cost is per index stream, PERF.md).
            img_a5 = jnp.stack([depth_post_flat] + sup_shift, axis=1)
            rows_a5 = img_a5[pix_a_c]
            meas_a = rows_a5[:, 0]
            sup_a_rows = rows_a5[:, 1:5]
            meas_b = _gather_flat_lane8(depth_post_flat, pix_b_c)
            conf_a = conf_b = None
        counts_a, counts_b = counts_ab[:n_rows], counts_ab[n_rows:]
        rgb_a, rgb_b = rgb_ab[:n_rows], rgb_ab[n_rows:]
        supported = sup_own_ab[:n_rows]
        if params.debug_stop_after <= 3:    # 3 == blending (hoisted)
            return _dbg_return(meas_a, meas_b, counts_ab, rgb_ab)
    else:
        post_cols = [
            depth_post_flat,                        # 0 meas (post-blend)
            support_counts.astype(jnp.float32),     # 1
            sup_f,                                  # 2 supporting surfel
            rgb_packed,                             # 3
        ]
        if params.exact_conflict_arbitration:
            # 4: conflictor map; the adjacent-supporter columns don't fit
            # under the 8-column fast-gather cliff, so they ride a
            # separate stream.
            post_cols.append(conflict_col)
        else:
            # 4-7: adjacent supporting surfels — exactly 8 columns, so the
            # neighbor-update candidate lookups share this gather stream.
            post_cols.extend(sup_shift)
        img_post = jnp.stack(post_cols, axis=1)
        post_a = img_post[pix_a_c]
        post_b = img_post[pix_b_c]
        meas_a, meas_b = post_a[:, 0], post_b[:, 0]
        counts_a, counts_b = post_a[:, 1], post_b[:, 1]
        rgb_a, rgb_b = post_a[:, 3], post_b[:, 3]
        supported = _i32(post_a[:, 2])
        if params.exact_conflict_arbitration:
            conf_a = _i32(post_a[:, 4])
            conf_b = _i32(post_b[:, 4])
        else:
            conf_a = conf_b = None
            sup_a_rows = post_a[:, 4:8]
        if params.debug_stop_after <= 3:    # 3 == blending (hoisted)
            return _dbg_return(post_a, post_b)

    stage("surfel_merging")
    # --- Phase 3 (part 2): merge tombstoning (kernels.cu:1949-1991) -------
    m_on = m_on & (supported != idx) & (supported != INVALID_INDEX)
    sup_rows = merge_src[_safe_idx(supported, merge_src.shape[0])]
    other_radius = sup_rows[:, 6]
    radius_ratio = radius_col / jnp.where(other_radius != 0,
                                          other_radius, 1e-30)
    m_on = m_on & (radius_ratio <= MERGE_RADIUS_DIFF_THRESHOLD_SQ) & \
        (radius_ratio >= 1.0 / MERGE_RADIUS_DIFF_THRESHOLD_SQ)
    ddx = ox - sup_rows[:, 0]
    ddy = oy - sup_rows[:, 1]
    ddz = oz - sup_rows[:, 2]
    m_on = m_on & (ddx * ddx + ddy * ddy + ddz * ddz <=
                   MERGE_DISTANCE_FACTOR * (radius_col + other_radius))
    m_on = m_on & (pack[:, NX] * sup_rows[:, 3] +
                   pack[:, NY] * sup_rows[:, 4] +
                   pack[:, NZ] * sup_rows[:, 5] >=
                   MERGE_COS_NORMAL_THRESHOLD)

    pack = pack.at[:, STAMP].set(
        jnp.where(m_on, _f32bits(jnp.zeros((n,), jnp.int32)), pack[:, STAMP]))
    pack = pack.at[:, RAD].set(jnp.where(m_on, -1.0, pack[:, RAD]))
    pack = pack.at[:, DETACH].set(
        jnp.maximum(pack[:, DETACH], m_on.astype(jnp.float32)))
    m_total = jnp.sum(m_on.astype(jnp.int32))
    if shard is not None:
        m_total = jax.lax.psum(m_total, shard.axis)
    merge_count = state.merge_count + m_total
    _tap("merge_mask", m_on)
    _tap("pack_after_merge", pack)
    if params.debug_stop_after <= 4:        # 4 == merge (after blending)
        return _dbg_return(pack, supporting_surfels, has_conflict,
                           first_depth, support_counts, support_depth_sums)

    stage("integration")
    # Camera-space measurement data (post-blending), as one image pack.
    fx_inv, fy_inv, cx_inv, cy_inv = params.unprojection
    Tg = global_T_local
    lin = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)[:, 0]
    xs_f = (lin % w).astype(jnp.float32)
    ys_f = (lin // w).astype(jnp.float32)
    plx = depth_post_flat * (fx_inv * xs_f + cx_inv)
    ply = depth_post_flat * (fy_inv * ys_f + cy_inv)
    plz = depth_post_flat
    pgx = Tg[0, 0] * plx + Tg[0, 1] * ply + Tg[0, 2] * plz + Tg[0, 3]
    pgy = Tg[1, 0] * plx + Tg[1, 1] * ply + Tg[1, 2] * plz + Tg[1, 3]
    pgz = Tg[2, 0] * plx + Tg[2, 1] * ply + Tg[2, 2] * plz + Tg[2, 3]
    ngx = Tg[0, 0] * mnx + Tg[0, 1] * mny + Tg[0, 2] * mnz
    ngy = Tg[1, 0] * mnx + Tg[1, 1] * mny + Tg[1, 2] * mnz
    ngz = Tg[2, 0] * mnx + Tg[2, 1] * mny + Tg[2, 2] * mnz

    # Per-pixel image packs for the C-domain creation gathers (phase 7)
    # and the stop-after-4 debug taps; the per-surfel phase-5 streams
    # derive geometry elementwise instead of gathering these.
    img_geo = jnp.stack([
        depth_post_flat,                            # 0 meas (post-blend)
        pgx, pgy, pgz,                              # 1-3 global point
        ngx, ngy, ngz,                              # 4-6 global normal
        support_counts.astype(jnp.float32),         # 7
    ], axis=1)
    img_app = jnp.stack([
        cr, cg, cb,                                 # 0-2 color
        radius_flat,                                # 3
        mnx, mny, mnz,                              # 4-6 meas normal (cam)
        conflict_col,                               # 7 conflictor map (opt)
    ], axis=1)
    img_sup = jnp.stack(sup_shift, axis=1)    # creation's C-domain lookups

    # --- Phase 5: Integrate measurements (kernels.cu:741-1142) ------------
    # Measurement geometry (unprojected global point, rotated normal, color)
    # is recomputed per surfel from the thin per-candidate streams + the
    # already-gathered pre rows: elementwise VPU work is ~free next to the
    # gather streams it replaces (4 wide row gathers -> 0).
    if params.exact_conflict_arbitration:
        sup_a = img_sup[pix_a_c]
    else:
        sup_a = sup_a_rows

    neighbors = state.neighbors
    nbr_dist = state.nbr_dist
    base_on = active & in_image & (pack[:, RAD] >= 0)

    def integrate_at(pack, neighbors, nbr_dist, meas, counts_f, rgb, conf_i,
                     p_mnx, p_mny, p_mnz, p_rad, first, p_premeas, pxf, pyf,
                     on):
        on = on & (meas > 0)
        conflict_zone = first < (1.0 - noise) * meas
        conflicting = on & conflict_zone & (first == z)
        if params.exact_conflict_arbitration:
            conflicting = conflicting & (conf_i == idx)
        else:
            # Marker eligibility: the reference's conflictor map is written
            # by the ASSOCIATION pass from the pre-blend depth
            # (kernels.cu:1610-1618 runs before blending, :563-738), so a
            # surfel may only decrement where the PRE-blend conflict zone
            # also held.  Without this gate, pixels that blending pushes
            # across the zone boundary spuriously reinit their min-z surfel
            # (measured: up to 36% rel deviation on corner/lookaway at
            # 320x240x60f; elementwise, zero extra gathers).  Remaining
            # deviation vs the exact map: the min-index tie-break when two
            # surfels project with bitwise-equal min depth.
            conflicting = conflicting & (first < (1.0 - noise) * p_premeas)
        on = on & ~conflict_zone
        on = on & ~(z > (1.0 + noise) * meas)

        # Unproject the measurement at this surfel's pixel and rotate the
        # measurement normal to global space (formerly img_geo cols 1-6).
        m_plx = meas * (fx_inv * pxf + cx_inv)
        m_ply = meas * (fy_inv * pyf + cy_inv)
        g_px = Tg[0, 0] * m_plx + Tg[0, 1] * m_ply + Tg[0, 2] * meas + \
            Tg[0, 3]
        g_py = Tg[1, 0] * m_plx + Tg[1, 1] * m_ply + Tg[1, 2] * meas + \
            Tg[1, 3]
        g_pz = Tg[2, 0] * m_plx + Tg[2, 1] * m_ply + Tg[2, 2] * meas + \
            Tg[2, 3]
        g_nx = Tg[0, 0] * p_mnx + Tg[0, 1] * p_mny + Tg[0, 2] * p_mnz
        g_ny = Tg[1, 0] * p_mnx + Tg[1, 1] * p_mny + Tg[1, 2] * p_mnz
        g_nz = Tg[2, 0] * p_mnx + Tg[2, 1] * p_mny + Tg[2, 2] * p_mnz
        m_cb = jnp.floor(rgb * (1.0 / 65536.0))
        rem = rgb - m_cb * 65536.0
        m_cg = jnp.floor(rem * (1.0 / 256.0))
        m_cr = rem - m_cg * 256.0
        geo = {"px": g_px, "py": g_py, "pz": g_pz,
               "nx": g_nx, "ny": g_ny, "nz": g_nz,
               "counts": counts_f}
        app = {"cr": m_cr, "cg": m_cg, "cb": m_cb, "radius": p_rad,
               "mnx": p_mnx, "mny": p_mny, "mnz": p_mnz}

        # Conflict handling (kernels.cu:816-868): confidence - 1; at zero the
        # surfel is re-initialized from the measurement and flags detach.
        conf0 = pack[:, CONF]
        new_conf = conf0 - 1.0
        reinit = conflicting & (new_conf <= 0)
        dec = conflicting & ~reinit

        reinit_cols = {
            PX: geo["px"], PY: geo["py"], PZ: geo["pz"],
            SX: geo["px"], SY: geo["py"], SZ: geo["pz"],
            NX: geo["nx"], NY: geo["ny"], NZ: geo["nz"],
            CR: app["cr"], CG: app["cg"], CB: app["cb"],
            RAD: app["radius"], CONF: jnp.ones_like(conf0),
            DETACH: jnp.ones_like(conf0),
            CREATION: _f32bits(jnp.broadcast_to(frame_index, conf0.shape)),
            STAMP: _f32bits(jnp.broadcast_to(frame_index, conf0.shape)),
        }
        cols = [pack[:, k] for k in range(PACK_WIDTH)]
        for k, val in reinit_cols.items():
            cols[k] = jnp.where(reinit, val, cols[k])
        cols[CONF] = jnp.where(dec, new_conf, cols[CONF])
        neighbors = jnp.where(reinit[None, :], INVALID_INDEX, neighbors)
        nbr_dist = jnp.where(reinit[None, :], jnp.inf, nbr_dist)

        # Same-surface checks (kernels.cu:875-919) with (possibly reinit'd)
        # attributes.
        nx_, ny_, nz_ = cols[NX], cols[NY], cols[NZ]
        lsnx = Tl[0, 0] * nx_ + Tl[0, 1] * ny_ + Tl[0, 2] * nz_
        lsny = Tl[1, 0] * nx_ + Tl[1, 1] * ny_ + Tl[1, 2] * nz_
        lsnz = Tl[2, 0] * nx_ + Tl[2, 1] * ny_ + Tl[2, 2] * nz_
        dot_view = (lx * lsnx + ly * lsny + z * lsnz) / \
            jnp.maximum(surfel_dist, 1e-30)
        on = on & (dot_view <= SURFEL_NORMAL_TO_VIEWING_DIR_THRESHOLD)
        compat_needed = meas < z
        compat = (lsnx * app["mnx"] + lsny * app["mny"] +
                  lsnz * app["mnz"]) >= cos_compat
        on = on & (~compat_needed | compat)
        on = on & (cols[RAD] >= 0)
        # Surfels replaced this frame are not updated (kernels.cu:937-940).
        on = on & (_i32(cols[CREATION]) < frame_index)

        weight = 1.0 / jnp.maximum(1.0, geo["counts"])
        conf = cols[CONF]
        norm_factor = 1.0 / (conf + weight)

        cols[CONF] = jnp.where(
            on, jnp.minimum(conf + weight, params.max_surfel_confidence),
            cols[CONF])
        for k, g in ((PX, geo["px"]), (PY, geo["py"]), (PZ, geo["pz"])):
            cols[k] = jnp.where(on, (conf * cols[k] + weight * g) *
                                norm_factor, cols[k])
        bnx = conf * cols[NX] + weight * geo["nx"]
        bny = conf * cols[NY] + weight * geo["ny"]
        bnz = conf * cols[NZ] + weight * geo["nz"]
        bl = jnp.maximum(jnp.sqrt(bnx * bnx + bny * bny + bnz * bnz), 1e-30)
        cols[NX] = jnp.where(on, bnx / bl, cols[NX])
        cols[NY] = jnp.where(on, bny / bl, cols[NY])
        cols[NZ] = jnp.where(on, bnz / bl, cols[NZ])
        cols[RAD] = jnp.where(on, jnp.minimum(cols[RAD], app["radius"]),
                              cols[RAD])
        # u8 color blend with +0.5 truncation (kernels.cu:962-967); the
        # update also clears the detach flag.
        for k, g in ((CR, app["cr"]), (CG, app["cg"]), (CB, app["cb"])):
            cols[k] = jnp.where(
                on, jnp.floor((conf * cols[k] + weight * g) * norm_factor
                              + 0.5), cols[k])
        cols[DETACH] = jnp.where(on, 0.0, cols[DETACH])
        cols[STAMP] = jnp.where(
            on, _f32bits(jnp.broadcast_to(frame_index, conf.shape)),
            cols[STAMP])
        return jnp.stack(cols, axis=1), neighbors, nbr_dist

    pack, neighbors, nbr_dist = integrate_at(
        pack, neighbors, nbr_dist, meas_a, counts_a, rgb_a, conf_a,
        pre_mnx_a, pre_mny_a, pre_mnz_a, pre_rad_a, pre_first_a, pre_meas_a,
        px.astype(jnp.float32), py.astype(jnp.float32), base_on)
    pack, neighbors, nbr_dist = integrate_at(
        pack, neighbors, nbr_dist, meas_b, counts_b, rgb_b, conf_b,
        pre_mnx_b, pre_mny_b, pre_mnz_b, pre_rad_b, pre_first_b, pre_meas_b,
        sx.astype(jnp.float32), sy.astype(jnp.float32),
        base_on & side_ok)
    _tap("pack_after_integrate", pack)
    _tap("neighbors_after_integrate", neighbors)
    if params.debug_stop_after <= 5:
        return _dbg_return(pack, neighbors)

    # --- Phase 6: Neighbor update (kernels.cu:1197-1455) ------------------
    stage("neighbor_update")
    gpack = sync(pack)   # phase 3+5 updates, visible to global-index gathers
    neighbors, nbr_dist = _update_neighbors(
        params, idx, active, lx, ly, z, px, py, pack, neighbors, nbr_dist,
        meas_a, pre_rad_a, sup_a, Tl, gpack)
    _tap("neighbors_after_update", neighbors)
    if params.debug_stop_after <= 6:
        return _dbg_return(neighbors, pack)

    # --- Phase 7: New surfel creation (kernels.cu:90-271, .cc:37-146) -----
    stage("new_surfel_creation")
    if params.exact_conflict_arbitration:
        conflict_free = conflicting_surfels == INVALID_INDEX
    else:
        conflict_free = ~has_conflict
    (pack, neighbors, nbr_dist, surfel_count, overflow_count) = \
        _create_new_surfels(
            params, depth, supporting_surfels, conflict_free,
            img_geo, img_app, img_sup, depth_post_flat, pack, neighbors,
            nbr_dist, state.surfel_count, state.overflow_count, frame_index,
            gpack, dest_translate,
            contiguous_dest=(shard is None and tiling is None))
    _tap("pack_after_create", pack)
    _tap("neighbors_after_create", neighbors)
    _tap("surfel_count_after_create", surfel_count)
    if params.debug_stop_after <= 7:
        return _dbg_return(pack, neighbors, surfel_count[None],
                           overflow_count[None])

    # --- Phase 8: Regularization (kernels.cu:2099-2410) -------------------
    stage("regularization")
    if params.regularization_iterations == 0:
        recent = _i32(pack[:, STAMP]) >= \
            frame_index - params.regularization_frame_window_size
        for s, p in ((SX, PX), (SY, PY), (SZ, PZ)):
            pack = pack.at[:, s].set(
                jnp.where(recent, pack[:, p], pack[:, s]))
    else:
        for _ in range(params.regularization_iterations):
            pack, neighbors, nbr_dist = _regularize(
                params, pack, neighbors, nbr_dist, frame_index, sync)

    stage(None)
    return SurfelState(
        pack=pack, neighbors=neighbors, nbr_dist=nbr_dist,
        surfel_count=surfel_count,
        merge_count=merge_count, overflow_count=overflow_count,
        skipped_tile_count=state.skipped_tile_count,
        active_tile_count=state.active_tile_count)


# ---------------------------------------------------------------------------
# Phase implementations.
# ---------------------------------------------------------------------------

def _blend_core(depth_f, supported, valid, avg, radius, scale):
    """Observation-boundary blending core over f32 maps — shared verbatim by
    the XLA path and the Pallas kernel (so the two are bit-exact).

    BFS feathering from measurement/surfel boundaries
    (kernels.cu:563-738, kernels.cc:148-205): raw depth is pulled toward the
    average supporting-surfel depth with a weight decaying over
    `radius` rings.  The reference's in-place races are resolved by Jacobi
    iterations over a previous-ring snapshot.  All maps f32; `supported` /
    `valid` are 0/1 masks; iteration count is static.
    """
    h, w = depth_f.shape
    scale = jnp.float32(scale)

    def shifted(img, dy, dx):
        """img[y+dy, x+dx] with zero fill, as lane/sublane slices."""
        if dy > 0:
            img = jnp.concatenate(
                [img[dy:], jnp.zeros((dy, w), img.dtype)], axis=0)
        elif dy < 0:
            img = jnp.concatenate(
                [jnp.zeros((-dy, w), img.dtype), img[:dy]], axis=0)
        if dx > 0:
            img = jnp.concatenate(
                [img[:, dx:], jnp.zeros((h, dx), img.dtype)], axis=1)
        elif dx < 0:
            img = jnp.concatenate(
                [jnp.zeros((h, -dx), img.dtype), img[:, :dx]], axis=1)
        return img

    supported_b = supported > 0.5
    valid_b = valid > 0.5
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    interior = (xs >= 1) & (ys >= 1) & (xs < w - 1) & (ys < h - 1)
    eligible = interior & valid_b & supported_b

    meas_border = jnp.zeros((h, w), bool)
    surf_border = jnp.zeros((h, w), bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb_valid = shifted(valid, dy, dx) > 0.5
            nb_supported = shifted(supported, dy, dx) > 0.5
            meas_border |= ~nb_valid
            surf_border |= nb_valid & ~nb_supported
    meas_border &= eligible
    surf_border &= eligible

    delta0 = avg - depth_f / scale

    # distance rings: 0 = untouched, 1..radius-1 = ring, 255 = unknown.
    dist_map = jnp.where(meas_border, 1.0, jnp.where(eligible, 255.0, 0.0))
    deltas = jnp.where(meas_border, delta0, 0.0)
    new_dist = jnp.where(surf_border, 1.0, 0.0)
    new_deltas = jnp.where(surf_border, delta0, 0.0)

    depth_f = jnp.where(meas_border, jnp.floor(scale * avg + 0.5), depth_f)

    unsupported_target = interior & valid_b & ~supported_b

    for it in range(2, radius):
        interp = (it - 1.0) / (radius - 1.0)
        blend_w = scale * jnp.float32(1.0 - interp)

        def ring_avg(dmap, dvals, it=it):
            ssum = jnp.zeros((h, w), jnp.float32)
            cnt = jnp.zeros((h, w), jnp.float32)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    at_ring = shifted(dmap, dy, dx) == it - 1
                    ssum += jnp.where(at_ring, shifted(dvals, dy, dx), 0.0)
                    cnt += at_ring.astype(jnp.float32)
            return ssum, cnt

        ssum, cnt = ring_avg(dist_map, deltas)
        grow = (dist_map == 255.0) & (cnt > 0)
        avg_d = ssum / jnp.maximum(cnt, 1.0)
        dist_map = jnp.where(grow, jnp.float32(it), dist_map)
        deltas = jnp.where(grow, avg_d, deltas)
        depth_f = jnp.where(grow, depth_f + blend_w * avg_d + 0.5, depth_f)

        nsum, ncnt = ring_avg(new_dist, new_deltas)
        ngrow = unsupported_target & (new_dist == 0.0) & (ncnt > 0)
        navg = nsum / jnp.maximum(ncnt, 1.0)
        new_dist = jnp.where(ngrow, jnp.float32(it), new_dist)
        new_deltas = jnp.where(ngrow, navg, new_deltas)
        depth_f = jnp.where(ngrow, depth_f + blend_w * navg + 0.5, depth_f)

    return depth_f


def _blend_pallas(depth_f, supported, valid, avg, radius, scale, interpret):
    """Single-program Pallas kernel: the whole blending pyramid runs with
    every ring map resident in VMEM (6 maps x 1.2 MB at 640x480 ~ 7 MB),
    instead of XLA round-tripping each Jacobi iteration through HBM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(depth_ref, sup_ref, valid_ref, avg_ref, out_ref):
        out_ref[:] = _blend_core(depth_ref[:], sup_ref[:], valid_ref[:],
                                 avg_ref[:], radius, scale)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(depth_f.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY if interpret
                               else pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY if interpret
                               else pltpu.VMEM),
        # The ring maps + Jacobi temporaries exceed the 16 MB default
        # scoped-vmem budget at 640x480; the chip has more.
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(depth_f, supported, valid, avg)


def _blend_measurements(params, depth, supporting_surfels, counts, sums):
    """Measurement blending dispatch: Pallas kernel on TPU backends, plain
    XLA elsewhere (bit-identical: both run _blend_core)."""
    radius = params.measurement_blending_radius
    supported = (supporting_surfels != INVALID_INDEX).astype(jnp.float32)
    valid = (depth != 0).astype(jnp.float32)
    avg = sums / jnp.maximum(counts, 1).astype(jnp.float32)
    depth_f = depth.astype(jnp.float32)
    if radius >= 2:
        use_pallas = params.pallas_blending
        if use_pallas is None:
            use_pallas = jax.default_backend() in ("tpu", "axon")
        if use_pallas:
            depth_f = _blend_pallas(
                depth_f, supported, valid, avg, radius,
                params.depth_scaling,
                interpret=jax.default_backend() not in ("tpu", "axon"))
        else:
            depth_f = _blend_core(depth_f, supported, valid, avg, radius,
                                  params.depth_scaling)
    else:
        # radius < 2 still applies the border snap (the it-loop is empty).
        depth_f = _blend_core(depth_f, supported, valid, avg, max(radius, 1),
                              params.depth_scaling)
    return jnp.clip(jnp.floor(depth_f), 0, 65535).astype(jnp.uint16)


def _update_neighbors(params, idx, active, lx, ly, z, px, py, pack,
                      neighbors, nbr_dist, meas_a, radius_a, sup_a, Tl,
                      gpack):
    """Refresh the 4 regularization neighbors from the supporting-surfel maps
    of the 4 adjacent pixels (kernels.cu:1197-1455); -> (neighbors, nbr_dist).

    The adjacent supporting-surfel indices ride in the gathered image rows
    (sup_a), so this phase needs only the candidate row gathers — plus the
    existing-slot gathers when fast_neighbor_update is off (on, the slot
    distances come from the stored nbr_dist state; see FusionParams).
    Gathers read <=8-column concats of `gpack`, the full pack synced after
    phase 5 (== `pack` in full-shape mode), with flat 1-D indices (both
    measured requirements for fast TPU gathers, see PERF.md).
    """
    n = gpack.shape[0]
    h, w = params.height, params.width
    noise = params.sensor_noise_factor
    reg_factor_sq = jnp.float32(
        params.radius_factor_for_regularization_neighbors ** 2)
    radius_col = pack[:, RAD]

    border_ok = (px >= 1) & (py >= 1) & (px < w - 1) & (py < h - 1) & (z > 0)
    on = active & border_ok
    meas = meas_a
    on = on & ~(z > (1.0 + noise) * meas)     # zero meas occludes everything
    nx_, ny_, nz_ = pack[:, NX], pack[:, NY], pack[:, NZ]
    lsnx = Tl[0, 0] * nx_ + Tl[0, 1] * ny_ + Tl[0, 2] * nz_
    lsny = Tl[1, 0] * nx_ + Tl[1, 1] * ny_ + Tl[1, 2] * nz_
    lsnz = Tl[2, 0] * nx_ + Tl[2, 1] * ny_ + Tl[2, 2] * nz_
    sdist = jnp.sqrt(lx * lx + ly * ly + z * z)
    on = on & ((lx * lsnx + ly * lsny + z * lsnz) /
               jnp.maximum(sdist, 1e-30) <=
               SURFEL_NORMAL_TO_VIEWING_DIR_THRESHOLD)
    on = on & (radius_col >= 0)
    if CHECK_SCALE_COMPAT_NEIGHBORS:
        on = on & (radius_a /
                   jnp.where(radius_col != 0, radius_col, 1e-30)
                   <= MAX_OBSERVATION_RADIUS_FACTOR ** 2)

    ox, oy, oz = pack[:, PX], pack[:, PY], pack[:, PZ]

    # A 7-column concat-materialized gather source: raw position, normal,
    # detach.  The detach flag rides along so no fresh gather is needed at
    # the end: the pack is static during this phase, so a slot's detach
    # value is known from whichever gather fetched it (old slot or
    # candidate).
    pn_pack = jnp.concatenate(
        [gpack[:, PX:PZ + 1], gpack[:, NX:NZ + 1],
         gpack[:, DETACH:DETACH + 1]], axis=1)

    slot_idx = neighbors                                  # (4, N)
    slot_valid = slot_idx != INVALID_INDEX
    fast = params.fast_neighbor_update
    if fast:
        # Stored squared distances (creation / replacement / reg-refreshed).
        slot_dist = jnp.where(slot_valid, nbr_dist, jnp.inf)
        slot_det = None
    else:
        # Existing slots: one 1-D per-slot gather each (slot-major rows
        # need no index layout conversion).
        dist_rows, det_rows = [], []
        for k in range(4):
            rows_k = pn_pack[_safe_idx(slot_idx[k], n)]
            sdx = rows_k[:, 0] - ox
            sdy = rows_k[:, 1] - oy
            sdz = rows_k[:, 2] - oz
            dist_rows.append(sdx * sdx + sdy * sdy + sdz * sdz)
            det_rows.append(rows_k[:, 6])
        slot_dist = jnp.where(slot_valid, jnp.stack(dist_rows), jnp.inf)
        slot_det = jnp.stack(det_rows)                    # (4, N)
    slot4 = jax.lax.broadcasted_iota(jnp.int32, (4, 1), 0)

    for direction in range(4):
        cand = _i32(sup_a[:, direction])
        c_ok = on & (cand != INVALID_INDEX) & (cand != idx)
        cand_rows = pn_pack[_safe_idx(cand, n)]          # one narrow gather
        cdx = cand_rows[:, 0] - ox
        cdy = cand_rows[:, 1] - oy
        cdz = cand_rows[:, 2] - oz
        c_dist = cdx * cdx + cdy * cdy + cdz * cdz
        c_ok = c_ok & (c_dist <= reg_factor_sq * radius_col)
        c_ok = c_ok & (nx_ * cand_rows[:, 3] + ny_ * cand_rows[:, 4] +
                       nz_ * cand_rows[:, 5] > 0)
        if fast:
            # No detach sweep over the slots: don't insert flagged
            # candidates at all (the reference inserts then sweeps).
            c_ok = c_ok & (cand_rows[:, 6] <= 0)

        already = jnp.any(slot_idx == cand[None, :], axis=0)
        c_ok = c_ok & ~already

        # argmax + max instead of take_along_axis (which lowers to a slow
        # per-element gather on TPU); the selected slot's distance IS the max.
        best = jnp.argmax(slot_dist, axis=0)
        best_dist = jnp.max(slot_dist, axis=0)
        c_ok = c_ok & (c_dist < best_dist)
        onehot = (slot4 == best[None, :]) & c_ok[None, :]
        slot_idx = jnp.where(onehot, cand[None, :], slot_idx)
        slot_dist = jnp.where(onehot, c_dist[None, :], slot_dist)
        if not fast:
            slot_det = jnp.where(onehot, cand_rows[:, 6][None, :], slot_det)

    if fast:
        return slot_idx, jnp.where(slot_idx != INVALID_INDEX, slot_dist,
                                   jnp.inf)
    # Drop neighbors whose surfel has the detach flag set
    # (kernels.cu:1420-1437).
    slot_detach = (slot_det > 0) & (slot_idx != INVALID_INDEX)
    return jnp.where(slot_detach, INVALID_INDEX, slot_idx), nbr_dist


def _create_new_surfels(params, depth, supporting_surfels,
                        conflict_free, img_geo, img_app, img_sup,
                        depth_m_flat,
                        pack, neighbors, nbr_dist, surfel_count,
                        overflow_count, frame_index, gpack, dest_translate,
                        contiguous_dest=False):
    """Append a surfel for every unexplained valid depth pixel
    (kernels.cu:90-271); index compaction via cumsum replaces CUB's
    DeviceScan::ExclusiveSum (kernels.cc:94-113).

    Compaction runs FIRST: after the flag/prefix pass over the image, every
    remaining stream (image-row fetch, adjacent-pixel tests, supporter row
    gathers for neighbor initialization, row construction) runs over the
    C = creation-budget domain instead of the HW pixel domain — the CUDA
    creation kernel's per-new-surfel iteration space (kernels.cc:115-126),
    reached here without the reference's separate flag image."""
    h, w = depth.shape
    hw = h * w
    n = gpack.shape[0]        # full capacity (pack may be a working set)
    reg_factor_sq = jnp.float32(
        params.radius_factor_for_regularization_neighbors ** 2)

    lin = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)[:, 0]
    xs = lin % w
    ys = lin // w
    interior = (xs >= 1) & (ys >= 1) & (xs < w - 1) & (ys < h - 1)
    flags_flat = interior & (depth.reshape(hw) > 0) & \
        (supporting_surfels == INVALID_INDEX) & conflict_free

    c_budget = min(params.max_creations_per_frame, hw)

    prefix = jnp.cumsum(flags_flat.astype(jnp.int32)) - \
        flags_flat.astype(jnp.int32)
    total = prefix[-1] + flags_flat[-1].astype(jnp.int32)
    fits = flags_flat & (surfel_count + prefix < n) & (prefix < c_budget)

    # Compact the flagged pixels into the creation budget: src_pix[j] is the
    # pixel of the j-th created surfel.  A stable sort on the fit flag
    # replaces the HW->C compaction scatter: flagged pixels land first, in
    # pixel order == prefix order (vector-rate sort ~0.5 ms vs ~2 ms
    # scalar-loop scatter-SET at 307k indices; PERF.md).  Slots past the
    # flagged count hold arbitrary non-fit pixels; their rows are dropped
    # by the destination masking below (the scatter path left src_pix == 0
    # there — same droppage, identical final state).
    _, order = jax.lax.sort((jnp.where(fits, 0, 1), lin), num_keys=1,
                            is_stable=True)
    src_pix = order[:c_budget]

    # ---- Everything below runs in the C domain. ----
    geo_c = img_geo[src_pix]                                # (C, 8)
    app_c = img_app[src_pix]                                # (C, 8)
    sup_c = img_sup[src_pix]                                # (C, 4)
    pgx, pgy, pgz = geo_c[:, 1], geo_c[:, 2], geo_c[:, 3]
    depth_c = geo_c[:, 0]
    radius_c = app_c[:, 3]

    # Adjacent-pixel creation info: flags/prefix/depth at the 4 neighbors of
    # each source pixel (source pixels are interior, so +-1/+-W stay in
    # bounds; unused budget slots have src_pix == 0 and are clipped — their
    # rows are dropped by the INVALID destination below).
    aux = jnp.stack([depth_m_flat, flags_flat.astype(jnp.float32),
                     prefix.astype(jnp.float32)], axis=1)    # (HW, 3)

    # Initial neighbors from the 4 adjacent pixels (kernels.cu:189-224).
    nbr_slots = []
    nbr_dists = []   # stored squared slot distances (fast_neighbor_update)
    exist_sum = [jnp.zeros((c_budget,), jnp.float32) for _ in range(3)]
    exist_cnt = jnp.ones((c_budget,), jnp.float32)  # count + 1
    shifts = (-1, +1, -w, +w)
    ps_pack = gpack[:, PX:SZ + 1]             # pos + smooth (6 cols)
    for k, shift in enumerate(shifts):
        # Supporting surfel at that adjacency rides in the gathered image
        # row (img_sup columns are the shifted supporting maps).
        sup = _i32(sup_c[:, k])
        has_sup = sup != INVALID_INDEX
        sup_rows = ps_pack[_safe_idx(sup, n)]         # narrow C-row gather
        dx = sup_rows[:, 0] - pgx
        dy = sup_rows[:, 1] - pgy
        dz = sup_rows[:, 2] - pgz
        in_range = dx * dx + dy * dy + dz * dz <= reg_factor_sq * radius_c
        use_sup = has_sup & in_range
        exist_sum[0] += jnp.where(use_sup, sup_rows[:, 3], 0.0)
        exist_sum[1] += jnp.where(use_sup, sup_rows[:, 4], 0.0)
        exist_sum[2] += jnp.where(use_sup, sup_rows[:, 5], 0.0)
        exist_cnt += use_sup.astype(jnp.float32)

        adj = aux[jnp.clip(src_pix + shift, 0, hw - 1)]      # (C, 3)
        adj_new = adj[:, 1] > 0
        adj_depth = adj[:, 0]
        adj_prefix = adj[:, 2].astype(jnp.int32)
        approx_sq = (depth_c - adj_depth) ** 2
        use_new = (~has_sup) & adj_new & \
            (approx_sq <= reg_factor_sq * radius_c)
        adj_dest = surfel_count + adj_prefix
        slot = jnp.where(use_sup, sup,
                         jnp.where(use_new & (adj_dest < n) &
                                   (adj_prefix < c_budget), adj_dest,
                                   INVALID_INDEX))
        nbr_slots.append(slot)
        # Stored distance: the quantity the slot was accepted under — the
        # exact supporter distance, or the depth-difference proxy used for
        # not-yet-created adjacent surfels (kernels.cu:207-215).
        nbr_dists.append(jnp.where(
            slot == INVALID_INDEX, jnp.inf,
            jnp.where(use_sup, dx * dx + dy * dy + dz * dz, approx_sq)))

    new_sx = (pgx + exist_sum[0]) / exist_cnt
    new_sy = (pgy + exist_sum[1]) / exist_cnt
    new_sz = (pgz + exist_sum[2]) / exist_cnt

    ones = jnp.ones((c_budget,), jnp.float32)
    frame_f = _f32bits(jnp.broadcast_to(frame_index, (c_budget,)))
    new_rows_cols = [None] * PACK_WIDTH
    new_rows_cols[PX], new_rows_cols[PY], new_rows_cols[PZ] = pgx, pgy, pgz
    new_rows_cols[SX], new_rows_cols[SY], new_rows_cols[SZ] = \
        new_sx, new_sy, new_sz
    new_rows_cols[NX], new_rows_cols[NY], new_rows_cols[NZ] = \
        geo_c[:, 4], geo_c[:, 5], geo_c[:, 6]
    new_rows_cols[CONF] = ones
    new_rows_cols[RAD] = radius_c
    new_rows_cols[CR], new_rows_cols[CG], new_rows_cols[CB] = \
        app_c[:, 0], app_c[:, 1], app_c[:, 2]
    new_rows_cols[CREATION] = frame_f
    new_rows_cols[STAMP] = frame_f
    new_rows_cols[RCNT] = jnp.zeros((c_budget,), jnp.float32)
    new_rows_cols[DETACH] = jnp.zeros((c_budget,), jnp.float32)
    rows_c = jnp.stack(new_rows_cols, axis=1)               # (C, PACK)
    nbrs_c = jnp.stack(nbr_slots, axis=0)                   # (4, C)
    dists_c = jnp.stack(nbr_dists, axis=0)                  # (4, C)

    created = jnp.minimum(jnp.minimum(total, c_budget),
                          jnp.maximum(n - surfel_count, 0))
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (c_budget, 1), 0)[:, 0]
    if contiguous_dest and c_budget <= pack.shape[0]:
        # Full-shape mode: destinations are contiguous
        # [surfel_count, surfel_count + created) by construction, so the
        # three destination scatters collapse to dynamic slices (read,
        # select, write back) — contiguous copies instead of scalar-loop
        # scatter-SET (PERF.md scatter notes).  `start` clamps the window
        # into bounds near capacity; `off` re-aligns slots so row j still
        # lands at absolute index surfel_count + j (created never exceeds
        # n - surfel_count, keeping every taken row inside the window).
        start = jnp.clip(surfel_count, 0, pack.shape[0] - c_budget)
        off = surfel_count - start
        idx_c = slot_iota - off
        take = (idx_c >= 0) & (idx_c < created)
        safe_c = jnp.clip(idx_c, 0, c_budget - 1)
        zero = jnp.int32(0)
        cur = jax.lax.dynamic_slice(pack, (start, zero),
                                    (c_budget, PACK_WIDTH))
        pack = jax.lax.dynamic_update_slice(
            pack, jnp.where(take[:, None], rows_c[safe_c], cur),
            (start, zero))
        cur_n = jax.lax.dynamic_slice(neighbors, (zero, start),
                                      (4, c_budget))
        neighbors = jax.lax.dynamic_update_slice(
            neighbors, jnp.where(take[None, :], nbrs_c[:, safe_c], cur_n),
            (zero, start))
        cur_d = jax.lax.dynamic_slice(nbr_dist, (zero, start),
                                      (4, c_budget))
        nbr_dist = jax.lax.dynamic_update_slice(
            nbr_dist, jnp.where(take[None, :], dists_c[:, safe_c], cur_d),
            (zero, start))
    else:
        dest_c = jnp.where(slot_iota < created, surfel_count + slot_iota,
                           INVALID_INDEX)
        dest_w = dest_translate(dest_c)  # frontier tiles always resident
        pack = pack.at[dest_w].set(rows_c, mode="drop", unique_indices=True)
        neighbors = neighbors.at[:, dest_w].set(nbrs_c, mode="drop",
                                                unique_indices=True)
        nbr_dist = nbr_dist.at[:, dest_w].set(dists_c, mode="drop",
                                              unique_indices=True)

    # Overflow counts only capacity-dropped creations; budget-deferred ones
    # retry next frame and are not overflow.
    capacity_short = jnp.maximum(
        0, jnp.minimum(total, c_budget) - jnp.maximum(n - surfel_count, 0))
    overflow_count = overflow_count + capacity_short
    surfel_count = surfel_count + created
    return pack, neighbors, nbr_dist, surfel_count, overflow_count


def _regularize(params, pack, neighbors, nbr_dist, frame_index, sync_fn):
    """One gradient-descent denoising iteration (kernels.cu:2099-2308);
    -> (pack, neighbors, nbr_dist).

    Each surfel contributes plane-distance gradient terms to its recent
    neighbors (atomicAdd in CUDA -> segment scatter-add here), then every
    recent surfel takes a step on its smoothed position with a data term
    toward the raw position, step length clamped to the surfel radius.

    Neighbor data is fetched by global surfel index from `sync_fn(pack)`
    (the full pack; identity in full-shape mode).  In the symmetric mode
    the per-neighbor recent-count needed for the cross-term weight is read
    from the RCNT pack column, refreshed for every processed surfel this
    iteration — under active-set tiling an out-of-working-set neighbor
    contributes its last-computed count (stale by at most the time since
    it left the working set).
    """
    w_reg = jnp.float32(params.regularizer_weight)
    window = params.regularization_frame_window_size
    reg_factor_sq = jnp.float32(
        params.radius_factor_for_regularization_neighbors ** 2)

    sx, sy, sz = pack[:, SX], pack[:, SY], pack[:, SZ]
    nx_, ny_, nz_ = pack[:, NX], pack[:, NY], pack[:, NZ]
    stamps = _i32(pack[:, STAMP])

    gsrc = sync_fn(pack)
    n = gsrc.shape[0]
    symmetric = params.symmetric_regularization
    # Narrow concat source + per-slot 1-D gathers (fast-gather rules,
    # PERF.md).  In symmetric mode ONE 8-column gather serves both the
    # distance terms and the cross terms: smooth pos + stamp + normal +
    # RCNT.  RCNT is the count stored by the *previous* iteration (or
    # frame) — a Jacobi-style lag that halves the slot gathers; new
    # surfels carry RCNT=0, so their in-edges contribute nothing until
    # their first regularization pass.  Quality impact is bounded by the
    # deviation A/B test (tests/test_fusion.py).
    if symmetric:
        reg_src = jnp.concatenate(
            [gsrc[:, SX:SZ + 1], gsrc[:, STAMP:RCNT + 1]], axis=1)
    else:
        reg_src = jnp.concatenate(
            [gsrc[:, SX:SZ + 1], gsrc[:, STAMP:STAMP + 1]], axis=1)
    slot_valid = neighbors != INVALID_INDEX                  # (4, N)
    dxs, dys, dzs, recents, slot_stamps = [], [], [], [], []
    snx, sny, snz, cnt_i = [], [], [], []
    for k in range(4):
        rows_k = reg_src[_safe_idx(neighbors[k], n)]
        dxs.append(rows_k[:, 0] - sx)
        dys.append(rows_k[:, 1] - sy)
        dzs.append(rows_k[:, 2] - sz)
        recents.append(_i32(rows_k[:, 3]) >= frame_index - window)
        slot_stamps.append(_i32(rows_k[:, 3]))
        if symmetric:
            snx.append(rows_k[:, 4])
            sny.append(rows_k[:, 5])
            snz.append(rows_k[:, 6])
            cnt_i.append(rows_k[:, 7])
    dx = jnp.stack(dxs)                                      # (4, N)
    dy = jnp.stack(dys)
    dz = jnp.stack(dzs)
    slot_recent = jnp.stack(recents)
    use = slot_valid & slot_recent
    cnt = jnp.sum(use.astype(jnp.float32), axis=0)

    ndot = nx_[None, :] * dx + ny_[None, :] * dy + nz_[None, :] * dz
    nbr_dist_sq = dx * dx + dy * dy + dz * dz

    factor = 2.0 * w_reg / jnp.maximum(cnt, 1.0)
    if symmetric:
        # Cross terms gathered from each surfel's own slots, assuming
        # mutual adjacency (see FusionParams docstring).  The term i
        # contributes to j is factor_i * (n_i . (p_j - p_i)) * n_i; j
        # evaluates it from the gathered (n_i, cnt_i) with its own recency
        # gating the edge (matching the direction the reference gates on,
        # kernels.cu:2154-2161).
        recent_self = stamps >= frame_index - window
        pack = pack.at[:, RCNT].set(cnt)   # for the NEXT iteration/frame
        snx = jnp.stack(snx)                                  # (4, N)
        sny = jnp.stack(sny)
        snz = jnp.stack(snz)
        cnt_i = jnp.stack(cnt_i)
        factor_i = jnp.where(cnt_i > 0,
                             2.0 * w_reg / jnp.maximum(cnt_i, 1.0), 0.0)
        wcnt_i = jnp.where(cnt_i > 0, w_reg / jnp.maximum(cnt_i, 1.0), 0.0)
        edge_on = slot_valid & recent_self[None, :]
        # p_j - p_i as seen from j = -(to_nbr computed from j) with i's data:
        # to_nbr (above) is p_i - p_j, so negate.
        in_dot = -(snx * dx + sny * dy + snz * dz)            # n_i.(p_j-p_i)
        contrib = jnp.where(edge_on, factor_i * in_dot, 0.0)
        grad_x = jnp.sum(contrib * snx, axis=0)
        grad_y = jnp.sum(contrib * sny, axis=0)
        grad_z = jnp.sum(contrib * snz, axis=0)
        gcount = jnp.sum(jnp.where(edge_on, wcnt_i, 0.0), axis=0)
    else:
        scatter_idx = jnp.where(use, neighbors, INVALID_INDEX).reshape(-1)
        term = factor[None, :] * ndot                        # (4, N)
        # NOTE: scalar scatter-adds measure faster than a fused 4-wide row
        # scatter-add on this TPU generation; keep them separate.
        grad_x = jnp.zeros((n,), jnp.float32).at[scatter_idx].add(
            (term * nx_[None, :]).reshape(-1), mode="drop")
        grad_y = jnp.zeros((n,), jnp.float32).at[scatter_idx].add(
            (term * ny_[None, :]).reshape(-1), mode="drop")
        grad_z = jnp.zeros((n,), jnp.float32).at[scatter_idx].add(
            (term * nz_[None, :]).reshape(-1), mode="drop")
        gcount = jnp.zeros((n,), jnp.float32).at[scatter_idx].add(
            jnp.broadcast_to((w_reg / jnp.maximum(cnt, 1.0))[None, :],
                             use.shape).reshape(-1), mode="drop")

    # Remove active neighbors that drifted out of range (kernels.cu:2184-2192).
    drop = use & (nbr_dist_sq > reg_factor_sq * pack[:, RAD][None, :])
    if params.fast_neighbor_update:
        # Stand-in for the skipped phase-6 detach sweep: merge tombstones
        # carry stamp == 0 (kernels.cu merge pass), so slots pointing at
        # them are released here, one phase later.  (A live neighbor whose
        # last update truly was frame 0 is also released — it re-enters via
        # the candidate path if still relevant.)
        tombstoned = (jnp.stack(slot_stamps) == 0) & (frame_index > 0)
        drop = drop | (slot_valid & tombstoned)
    neighbors = jnp.where(drop, INVALID_INDEX, neighbors)

    # Per-surfel step (kernels.cu:2197-2308) over the updated neighbor list;
    # reuse the gathered rows (removal only invalidates, indices unchanged).
    valid2 = neighbors != INVALID_INDEX
    ndot2 = jnp.where(valid2, ndot, 0.0)
    cnt2 = jnp.sum(valid2.astype(jnp.float32), axis=0)
    sum_ndot2 = jnp.sum(ndot2, axis=0)
    factor2 = jnp.where(cnt2 > 0, 2.0 * w_reg / jnp.maximum(cnt2, 1.0), 0.0)
    reg_x = -sum_ndot2 * nx_
    reg_y = -sum_ndot2 * ny_
    reg_z = -sum_ndot2 * nz_

    recent = stamps >= frame_index - window
    gx = 2.0 * (sx - pack[:, PX]) + grad_x + factor2 * reg_x
    gy = 2.0 * (sy - pack[:, PY]) + grad_y + factor2 * reg_y
    gz = 2.0 * (sz - pack[:, PZ]) + grad_z + factor2 * reg_z
    weight_sum = 1.0 + w_reg + gcount
    step = 0.5 / weight_sum
    max_step = jnp.sqrt(pack[:, RAD])   # NaN for merged surfels, as in CUDA
    grad_len = step * jnp.sqrt(gx * gx + gy * gy + gz * gz)
    step_factor = jnp.where(grad_len > max_step,
                            max_step / jnp.maximum(grad_len, 1e-30) * step,
                            step)
    pack = pack.at[:, SX].set(jnp.where(recent, sx - step_factor * gx, sx))
    pack = pack.at[:, SY].set(jnp.where(recent, sy - step_factor * gy, sy))
    pack = pack.at[:, SZ].set(jnp.where(recent, sz - step_factor * gz, sz))

    if params.fast_neighbor_update:
        # Refresh the stored slot distances from this pass's smoothed-
        # position gather (the quantity the NEXT frame's neighbor update
        # replaces against; see FusionParams.fast_neighbor_update).
        nbr_dist = jnp.where(valid2, nbr_dist_sq, jnp.inf)
    return pack, neighbors, nbr_dist


@functools.partial(jax.jit, static_argnames=("params",), donate_argnums=(0,))
def regularize_only(state: SurfelState, frame_index: jnp.ndarray,
                    params: FusionParams) -> SurfelState:
    """Standalone regularization iteration (CUDASurfelReconstruction::
    Regularize, cuda_surfel_reconstruction.cc:322-337; driven by the 'd'
    terminal key, main.cc:1573-1580)."""
    pack, neighbors, nbr_dist = _regularize(
        params, state.pack, state.neighbors, state.nbr_dist,
        jnp.asarray(frame_index, jnp.int32), lambda p: p)
    return state._replace(pack=pack, neighbors=neighbors,
                          nbr_dist=nbr_dist)


# ---------------------------------------------------------------------------
# Export / snapshot.
# ---------------------------------------------------------------------------

@jax.jit
def export_vertices(state: SurfelState):
    """ExportVerticesCUDA (kernels.cu:2412-2464): smoothed positions with NaN
    for merged surfels, plus colors.  Returns ((N, 3) f32, (N, 3) u8)."""
    merged = state.pack[:, RAD] < 0
    pos = jnp.where(merged[:, None], jnp.nan, state.pack[:, SX:SZ + 1])
    col = jnp.clip(state.pack[:, CR:CB + 1], 0, 255).astype(jnp.uint8)
    return pos, col


@functools.partial(jax.jit, static_argnames=("window", "max_rows"))
def meshing_snapshot_delta(state: SurfelState, last_snap_frame: jnp.ndarray,
                           window: int, max_rows: int):
    """Changed-rows snapshot for the meshing engine (round-3 e2e lever).

    The reference re-downloads the full 8-attribute SoA every transfer
    (cuda_surfel_reconstruction.cc:339-359) and lets the CPU mesher diff it
    (surfel_meshing.cc:189-288); through a slow host link the full map
    dominates e2e time.  This ships index + payload for only the rows that
    can have changed since the last snapshot taken at `last_snap_frame`:

      - stamp >= last_snap_frame + 1 - window: integrated/created since,
        OR regularization-moved on some frame after the last snapshot (a
        row with stamp s is reg-moved on every frame f <= s + window);
      - radius < 0: merged tombstones (their stamp is 0, so the stamp test
        misses them; shipping them repeatedly is harmless — the engine
        treats known-merged rows as zombies).

    Returns (indices, positions, radii_sq, normals, stamps, total_dirty,
    surfel_count).  Rows are compacted in ascending index order; only the
    first min(total_dirty, max_rows) rows are valid.  If total_dirty >
    max_rows the caller must retry with a larger bucket (or fall back to a
    full snapshot) — rows beyond the budget were NOT shipped.
    """
    pack = state.pack
    n = pack.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    stamps = _i32(pack[:, STAMP])
    live = iota < state.surfel_count
    thresh = jnp.asarray(last_snap_frame, jnp.int32) + 1 - window
    dirty = live & ((stamps >= thresh) | (pack[:, RAD] < 0))
    d32 = dirty.astype(jnp.int32)
    prefix = jnp.cumsum(d32) - d32
    total = prefix[-1] + d32[-1]
    slot = jnp.where(dirty & (prefix < max_rows), prefix, INVALID_INDEX)
    rows_idx = jnp.full((max_rows,), INVALID_INDEX, jnp.int32).at[slot].set(
        iota, mode="drop", unique_indices=True)
    gidx = _safe_idx(rows_idx, n)
    src1 = jnp.concatenate([pack[:, SX:SZ + 1], pack[:, RAD:RAD + 1]],
                           axis=1)
    src2 = jnp.concatenate([pack[:, NX:NZ + 1], pack[:, STAMP:STAMP + 1]],
                           axis=1)
    r1 = src1[gidx]
    r2 = src2[gidx]
    return (rows_idx, r1[:, :3], r1[:, 3], r2[:, :3], _i32(r2[:, 3]),
            total, state.surfel_count)


@jax.jit
def meshing_snapshot(state: SurfelState):
    """The SoA snapshot consumed by the meshing engine — same fields the
    reference downloads in TransferAllToCPU
    (cuda_surfel_reconstruction.cc:339-359).  Row-major (N, 3) slices, ready
    for the host engine."""
    return (state.pack[:, SX:SZ + 1], state.pack[:, RAD],
            state.pack[:, NX:NZ + 1], _i32(state.pack[:, STAMP]),
            state.surfel_count)
