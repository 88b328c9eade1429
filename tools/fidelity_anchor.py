"""Reference-stand-in fidelity anchor (VERDICT r2 #7).

BASELINE's "within 1 mm mean distance of the CUDA reference output" needs a
denominator, and no CUDA artifact exists in this image.  The stand-in: the
per-phase GOLDEN NumPy fusion oracle (tests/golden_fusion.py — an
independent scalar re-implementation of the CUDA semantics at
cuda_surfel_reconstruction_kernels.cu) run frame-by-frame over a synthetic
sequence, meshed by the native engine, plays the role of the reference
output (reference export path: main.cc:128-176).  The TPU pipeline fuses
the SAME preprocessed inputs and is meshed identically; the metric is the
mean sampled-surface distance between the two meshes plus the direct
surfel-position deltas.

Run:  JAX_PLATFORMS=cpu python tools/fidelity_anchor.py [--frames 50]
Prints one JSON line; record the numbers in PERF.md.
"""

import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _load_oracle():
    spec = importlib.util.spec_from_file_location(
        "golden_fusion", os.path.join(ROOT, "tests", "golden_fusion.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.Oracle


def build_mesh(positions, radii_sq, normals, stamps, count):
    """Native advancing-front mesh of a surfel snapshot -> (verts, tris)."""
    from surfelmeshing_tpu.meshing.engine import MeshingEngine

    eng = MeshingEngine()
    eng.integrate(0, positions[:count], radii_sq[:count], normals[:count],
                  stamps[:count])
    eng.check_remeshing()
    eng.triangulate()
    tris = eng.get_triangles()
    return positions[:count].copy(), tris


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--capacity", type=int, default=200000)
    ap.add_argument("--scene", default="default")
    ap.add_argument("--trajectory", default="arc")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp

    from surfelmeshing_tpu.eval.mesh_accuracy import (point_to_mesh_distance,
                                                      sample_mesh_surface)
    from surfelmeshing_tpu.io.synthetic import SyntheticRGBDSequence
    from surfelmeshing_tpu.ops import preprocess as pp
    from surfelmeshing_tpu.ops import fusion as F
    from surfelmeshing_tpu.ops.fusion import (FusionParams,
                                              create_surfel_state,
                                              integrate_frame,
                                              meshing_snapshot)

    Oracle = _load_oracle()
    t_start = time.time()

    seq = SyntheticRGBDSequence(num_frames=args.frames + 2, width=args.width,
                                height=args.height, scene=args.scene,
                                trajectory=args.trajectory)
    cam = seq.camera
    scale = seq.depth_scaling
    params = FusionParams(
        width=args.width, height=args.height, fx=cam.fx, fy=cam.fy,
        cx=cam.cx, cy=cam.cy, depth_scaling=scale, do_blending=True,
        regularization_iterations=1)

    state = create_surfel_state(args.capacity)
    # Oracle stores neighbors surfel-major (N, 4); the device state is
    # slot-major (4, N).
    oracle = Oracle(np.array(state.pack), np.array(state.neighbors).T, 0,
                    nbr_dist=np.array(state.nbr_dist).T)

    for i in range(1, args.frames + 1):
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
            depth_valid_region_radius=max(args.width, args.height),
            tolerance=0.02, required_inliers=None, erosion_radius=1,
            observation_angle_threshold_deg=85.0, depth_scaling=scale,
            point_radius_extension_factor=1.5,
            point_radius_clamp_factor=np.inf,
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy)
        T_gl = seq.poses[i].matrix3x4().astype(np.float32)
        T_lg = seq.poses[i].inverse().matrix3x4().astype(np.float32)
        color_pm = np.ascontiguousarray(color.transpose(2, 0, 1))

        state = integrate_frame(
            state, d, normals, radius, jnp.asarray(color_pm),
            jnp.asarray(T_gl), jnp.asarray(T_lg), jnp.int32(i), params)
        oracle.run_frame(np.asarray(d), np.asarray(normals),
                         np.asarray(radius), color_pm, T_gl, T_lg, i,
                         params)
        if i % 10 == 0:
            print(f"frame {i}: tpu={int(state.surfel_count)} "
                  f"oracle={oracle.count}", file=sys.stderr)

    # --- Snapshots -> native meshes ---------------------------------------
    count = int(state.surfel_count)
    smooth, rad, nrm, stamps, _ = (np.asarray(a)
                                   for a in meshing_snapshot(state))
    v_tpu, t_tpu = build_mesh(smooth, rad, nrm, stamps.astype(np.uint32),
                              count)

    P = oracle.pack
    o_smooth = np.ascontiguousarray(P[:, F.SX:F.SZ + 1])
    o_rad = np.ascontiguousarray(P[:, F.RAD])
    o_nrm = np.ascontiguousarray(P[:, F.NX:F.NZ + 1])
    o_stamps = np.ascontiguousarray(
        P[:, F.STAMP].view(np.int32).astype(np.uint32))
    v_ref, t_ref = build_mesh(o_smooth, o_rad, o_nrm, o_stamps,
                              oracle.count)

    # --- Metrics ----------------------------------------------------------
    # Direct surfel-level fidelity (same creation order => same row ids).
    n_common = min(count, oracle.count)
    alive = (rad[:n_common] >= 0) & (o_rad[:n_common] >= 0)
    pos_delta = np.linalg.norm(
        smooth[:n_common][alive] - o_smooth[:n_common][alive], axis=1)

    # Exact sampled-point -> mesh-surface distances in BOTH directions
    # (point-to-point nearest-sample distances are floored by the sample
    # spacing and would drown the sub-mm fidelity signal).
    rec_samples = sample_mesh_surface(v_tpu, t_tpu, max_samples=200000)
    gt_samples = sample_mesh_surface(v_ref, t_ref, max_samples=200000)
    d_rec = point_to_mesh_distance(rec_samples, v_ref, t_ref)
    d_gt = point_to_mesh_distance(gt_samples, v_tpu, t_tpu)

    out = {
        "metric": "mesh_mean_distance_vs_golden_standin_mm",
        "value": round(float(d_rec.mean()) * 1000.0, 4),
        "unit": "mm",
        "frames": args.frames,
        "shape": [args.height, args.width],
        "scene": args.scene,
        "trajectory": args.trajectory,
        "surfels_tpu": count,
        "surfels_oracle": oracle.count,
        "triangles_tpu": int(len(t_tpu)),
        "triangles_ref": int(len(t_ref)),
        "mesh_median_mm": round(float(np.median(d_rec)) * 1000.0, 4),
        "mesh_rms_mm": round(float(np.sqrt((d_rec ** 2).mean())) * 1000.0,
                             4),
        "completeness_1mm": round(float((d_gt <= 0.001).mean()), 4),
        "surfel_mean_delta_mm": round(float(pos_delta.mean()) * 1000.0, 4),
        "surfel_max_delta_mm": round(float(pos_delta.max()) * 1000.0, 4),
        "elapsed_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
