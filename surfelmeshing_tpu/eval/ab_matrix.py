"""Deviation A/B matrix across hostile scenes and trajectories.

The TPU-native fusion keeps four documented deviations from the reference's
CUDA semantics (fast_neighbor_update, symmetric_regularization, elementwise
conflict arbitration, the RCNT Jacobi lag — see ops/fusion.FusionParams and
the reference kernels at cuda_surfel_reconstruction_kernels.cu:1302-1322,
1420-1437, 2115-2194, 1610-1618).  Round 2 justified their defaults with a
single synthetic scene; this module measures every mode on the full scene ×
trajectory registry of io/synthetic.py (occlusion edges, thin structures,
creases, look-away revisits, forward scale drift) so the defaults are
bounded per geometry class, not per data point.

`python -m surfelmeshing_tpu.eval.ab_matrix` prints the markdown table
recorded in PERF.md.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from ..io.synthetic import SCENES, TRAJECTORIES, SyntheticRGBDSequence

# NOTE: ops.fusion / ops.preprocess are imported lazily inside the functions
# below — importing them initializes the JAX backend (module-level jnp
# constants), which would pin the platform before main()'s --cpu flag can
# choose it (the site hook ignores JAX_PLATFORMS env; see CLAUDE.md).

# The A/B contrast set: TPU-native defaults vs each reference-exact switch
# alone vs everything exact.
MODES = (
    ("tpu_defaults", {}),
    ("exact_reg", dict(symmetric_regularization=False)),
    ("exact_conflict", dict(exact_conflict_arbitration=True)),
    ("exact_neighbors", dict(fast_neighbor_update=False)),
    ("exact_all", dict(symmetric_regularization=False,
                       exact_conflict_arbitration=True,
                       fast_neighbor_update=False)),
)


def run_fusion_sequence(
    params: FusionParams,
    capacity: int,
    frames: int = 8,
    width: int = 160,
    height: int = 120,
    scene: str = "default",
    trajectory: str = "arc",
    noise_sigma: float = 0.0,
    seq: Optional[SyntheticRGBDSequence] = None,
) -> Tuple["object", SyntheticRGBDSequence]:
    """Preprocess + fuse a synthetic sequence (the driver loop of
    app/main.py:224-473 minus meshing/IO) and return the final state.
    Pass `seq` to reuse one rendered sequence across modes (the renders
    are host-side and dominate wall time at operating scale)."""
    import jax.numpy as jnp

    from ..ops import preprocess as pp
    from ..ops.fusion import integrate_frame, create_surfel_state

    if seq is None:
        seq = SyntheticRGBDSequence(num_frames=frames + 2, width=width,
                                    height=height, scene=scene,
                                    trajectory=trajectory,
                                    noise_sigma=noise_sigma)
    cam = seq.camera
    scale = seq.depth_scaling
    params = dataclasses.replace(
        params, width=width, height=height,
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, depth_scaling=scale)
    state = create_surfel_state(capacity)
    # Preprocessing is mode-independent: cache its outputs on the sequence
    # so the 5-mode A/B pays for it once per (scene, trajectory).
    pp_cache = getattr(seq, "_pp_cache", None)
    if pp_cache is None:
        pp_cache = seq._pp_cache = {}
    for i in range(1, frames + 1):
        if i not in pp_cache:
            depth, color = seq.depth_and_color(i)
            others = np.stack([seq.depth_and_color(i - 1)[0],
                               seq.depth_and_color(i + 1)[0]])
            ref = seq.poses[i].scaled_translation(scale)
            T = np.stack([
                ((ref.inverse() * seq.poses[j].scaled_translation(scale))
                 .inverse().matrix3x4())
                for j in (i - 1, i + 1)]).astype(np.float32)
            d, normals, radius = pp.preprocess_frame(
                depth, others, T,
                sigma_xy=3.0, sigma_value_factor=0.05, radius_factor=2.0,
                max_depth_u16=int(scale * 3.5),
                depth_valid_region_radius=max(width, height),
                tolerance=0.02, required_inliers=None, erosion_radius=1,
                observation_angle_threshold_deg=85.0, depth_scaling=scale,
                point_radius_extension_factor=1.5,
                point_radius_clamp_factor=np.inf,
                fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy)
            T_gl = seq.poses[i].matrix3x4().astype(np.float32)
            T_lg = seq.poses[i].inverse().matrix3x4().astype(np.float32)
            color_pm = jnp.asarray(
                np.ascontiguousarray(color.transpose(2, 0, 1)))
            pp_cache[i] = (d, normals, radius, color_pm,
                           jnp.asarray(T_gl), jnp.asarray(T_lg))
        d, normals, radius, color_pm, T_gl, T_lg = pp_cache[i]
        state = integrate_frame(
            state, d, normals, radius, color_pm,
            T_gl, T_lg, jnp.int32(i), params)
    return state, seq


def scene_error_mm(state, seq: SyntheticRGBDSequence) -> float:
    """Mean exact distance (mm) of live smoothed surfels to the true scene
    surface — the accuracy numerator for the A/B (no mesh file needed)."""
    from ..ops.fusion import meshing_snapshot

    count = int(state.surfel_count)
    smooth, radius_sq, _, _, _ = meshing_snapshot(state)
    # pow2 pad so the device slice compiles once per bucket, not per count.
    pad = min(1 << max(10, (max(count, 2) - 1).bit_length()), smooth.shape[0])
    pts = np.asarray(smooth[:pad])[:count]
    alive = np.asarray(radius_sq[:pad])[:count] >= 0
    d = seq.surface_distance(pts[alive])
    return float(d.mean() * 1000.0)


def deviation_matrix(
    frames: int = 8,
    width: int = 160,
    height: int = 120,
    capacity: int = 65536,
    scenes=None,
    trajectories=None,
    noise_sigma: float = 0.0,
    base_params: Optional[FusionParams] = None,
    modes=None,
) -> Dict[str, Dict[str, float]]:
    """-> {"scene/trajectory": {mode: error_mm}} for every combination."""
    import sys
    import time

    from ..ops.fusion import FusionParams

    if base_params is None:
        base_params = FusionParams(
            width=width, height=height, fx=1.0, fy=1.0, cx=0.0, cy=0.0,
            depth_scaling=5000.0, do_blending=True,
            regularization_iterations=1)
    out: Dict[str, Dict[str, float]] = {}
    for scene in (scenes or SCENES):
        for traj in (trajectories or TRAJECTORIES):
            row: Dict[str, float] = {}
            seq = SyntheticRGBDSequence(
                num_frames=frames + 2, width=width, height=height,
                scene=scene, trajectory=traj, noise_sigma=noise_sigma)
            for mode, kw in (modes or MODES):
                t0 = time.perf_counter()
                params = dataclasses.replace(base_params, **kw)
                state, seq = run_fusion_sequence(
                    params, capacity, frames=frames, width=width,
                    height=height, scene=scene, trajectory=traj,
                    noise_sigma=noise_sigma, seq=seq)
                if int(state.overflow_count) > 0:
                    raise RuntimeError(
                        f"{scene}/{traj}/{mode}: surfel overflow "
                        f"({int(state.overflow_count)}) — raise --capacity; "
                        "a clamped run would bias the deviation bound")
                row[mode] = scene_error_mm(state, seq)
                print(f"ab_matrix: {scene}/{traj}/{mode} = "
                      f"{row[mode]:.4f} mm  surfels="
                      f"{int(state.surfel_count)}  "
                      f"({time.perf_counter() - t0:.0f}s)",
                      file=sys.stderr, flush=True)
            out[f"{scene}/{traj}"] = row
    return out


def format_markdown(matrix: Dict[str, Dict[str, float]]) -> str:
    names = [m for m, _ in MODES]
    lines = ["| scene/trajectory | " + " | ".join(names) +
             " | max rel dev |",
             "|---|" + "---|" * (len(names) + 1)]
    for key, row in matrix.items():
        exact = row["exact_all"]
        rel = max(abs(row[m] - exact) for m in names) / max(exact, 1e-9)
        lines.append(
            f"| {key} | " +
            " | ".join(f"{row[m]:.4f}" for m in names) +
            f" | {100.0 * rel:.2f}% |")
    return "\n".join(lines)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--capacity", type=int, default=65536)
    ap.add_argument("--noise_sigma", type=float, default=0.0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default: session platform)")
    ap.add_argument("--scenes", type=str, default=None,
                    help="comma-separated scene subset (default: all)")
    ap.add_argument("--trajectories", type=str, default=None,
                    help="comma-separated trajectory subset (default: all)")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    matrix = deviation_matrix(
        frames=args.frames, width=args.width,
        height=args.height, capacity=args.capacity,
        noise_sigma=args.noise_sigma,
        scenes=args.scenes.split(",") if args.scenes else None,
        trajectories=(args.trajectories.split(",")
                      if args.trajectories else None))
    print(format_markdown(matrix))


if __name__ == "__main__":
    main()
