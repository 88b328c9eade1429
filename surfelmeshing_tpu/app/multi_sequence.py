"""Batched multi-sequence reconstruction (BASELINE config 5).

Reconstructs S TUM sequences in lockstep with per-device surfel maps sharded
over a 1-D device mesh — the TPU-native scale-out axis (SURVEY.md §2.4: the
workload is embarrassingly parallel across sequences; no collectives ride the
hot path).  Sequences shorter than the longest are padded with empty frames.

Usage:
    python -m surfelmeshing_tpu.app.multi_sequence \
        <dataset_dir_1> ... <dataset_dir_S> --trajectory groundtruth.txt \
        --max_surfel_count 500000 --output_dir out/
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

import numpy as np

logger = logging.getLogger("surfelmeshing_tpu.multi")


def run_batched(dataset_dirs, trajectory_filename: str,
                max_surfel_count: int = 500_000,
                outlier_filtering_frame_count: int = 2,
                max_frames: int = 0,
                output_dir: str = ".",
                devices=None):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ..config import SurfelMeshingConfig
    from ..io.mesh_io import write_ply
    from ..io.tum import read_tum_rgbd_dataset
    from ..ops import preprocess as pp
    from ..ops.fusion import RAD, SX, SZ, FusionParams
    from ..parallel.batch import (create_batched_state, make_batched_preprocess,
                                  make_batched_step)

    s = len(dataset_dirs)
    if devices is None:
        devices = jax.devices()
    n_dev = max(1, min(len(devices), s))
    # Sequence count must tile the mesh.
    while s % n_dev != 0:
        n_dev -= 1
    mesh = Mesh(np.array(devices[:n_dev]), ("seq",))
    logger.info("batched reconstruction: %d sequences on %d device(s)",
                s, n_dev)

    videos = [read_tum_rgbd_dataset(d, trajectory_filename, 0.05)
              for d in dataset_dirs]
    cams = [v.depth_camera for v in videos]
    cam = cams[0]
    for c in cams[1:]:
        if (c.width, c.height) != (cam.width, cam.height):
            raise ValueError("all sequences must share the image size")

    cfg = SurfelMeshingConfig(
        max_surfel_count=max_surfel_count,
        outlier_filtering_frame_count=outlier_filtering_frame_count)
    params = FusionParams(
        width=cam.width, height=cam.height, fx=cam.fx, fy=cam.fy,
        cx=cam.cx, cy=cam.cy, depth_scaling=cfg.depth_scaling,
        do_blending=cfg.do_blending,
        regularization_iterations=(
            cfg.regularization_iterations_per_integration_iteration))

    pp_kwargs = dict(
        sigma_xy=cfg.bilateral_filter_sigma_xy,
        sigma_value_factor=cfg.bilateral_filter_sigma_depth_factor,
        radius_factor=cfg.bilateral_filter_radius_factor,
        max_depth_u16=int(cfg.depth_scaling * cfg.max_depth),
        depth_valid_region_radius=cfg.depth_valid_region_radius,
        tolerance=cfg.outlier_filtering_depth_tolerance_factor,
        required_inliers=None,
        erosion_radius=cfg.depth_erosion_radius,
        observation_angle_threshold_deg=cfg.observation_angle_threshold_deg,
        depth_scaling=cfg.depth_scaling,
        point_radius_extension_factor=cfg.point_radius_extension_factor,
        point_radius_clamp_factor=cfg.point_radius_clamp_factor,
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy)

    state = create_batched_state(s, max_surfel_count, mesh)
    step = make_batched_step(params, mesh)
    # Preprocessing runs sharded on the mesh too (SURVEY.md §2.4): the host
    # only assembles raw (S, ...) input stacks; preprocessed maps stay
    # device-resident and flow straight into the fusion step.
    preprocess = make_batched_preprocess(pp_kwargs, mesh)

    k = outlier_filtering_frame_count
    n_frames = min(v.frame_count for v in videos) - k // 2
    if max_frames:
        n_frames = min(n_frames, max_frames + k // 2)
    offsets = list(range(-k // 2, 0)) + list(range(1, k // 2 + 1))

    def assemble(i):
        """Host I/O: raw input stacks for frame i (numpy only)."""
        depths, others_b, ts, colors, t_gls, t_lgs = [], [], [], [], [], []
        for v in videos:
            depths.append(np.asarray(v.depth_frames[i].get_image())
                          .astype(np.uint16))
            others_b.append(np.stack([
                np.asarray(v.depth_frames[i + o].get_image())
                .astype(np.uint16) for o in offsets]))
            ref = v.depth_frames[i].global_T_frame \
                .scaled_translation(cfg.depth_scaling)
            ts.append(np.stack([
                ((ref.inverse() * v.depth_frames[i + o].global_T_frame
                  .scaled_translation(cfg.depth_scaling)).inverse()
                 .matrix3x4())
                for o in offsets]).astype(np.float32))
            color = np.asarray(v.color_frames[i].get_image())[..., :3]
            colors.append(np.ascontiguousarray(color.transpose(2, 0, 1)))
            t_gls.append(v.depth_frames[i].global_T_frame.matrix3x4()
                         .astype(np.float32))
            t_lgs.append(v.depth_frames[i].global_T_frame.inverse()
                         .matrix3x4().astype(np.float32))
            v.depth_frames[i - k // 2].clear_image()
            v.color_frames[i].clear_image()
        return tuple(np.stack(a) for a in
                     (depths, others_b, ts, colors, t_gls, t_lgs))

    from concurrent.futures import ThreadPoolExecutor
    io_pool = ThreadPoolExecutor(max_workers=1)

    t0 = time.perf_counter()
    frames_done = 0
    pending = io_pool.submit(assemble, k // 2)
    for i in range(k // 2, n_frames):
        depth_s, others_s, t_s, color_s, t_gl_s, t_lg_s = pending.result()
        if i + 1 < n_frames:   # overlap next frame's disk I/O with compute
            pending = io_pool.submit(assemble, i + 1)
        d, nrm, rad = preprocess(jnp.asarray(depth_s),
                                 jnp.asarray(others_s), jnp.asarray(t_s))
        state, total = step(
            state, d, nrm, rad, jnp.asarray(color_s),
            jnp.asarray(t_gl_s), jnp.asarray(t_lg_s), jnp.int32(i))
        frames_done += 1
        if i % 50 == 0:
            logger.info("frame %d: %d surfels total", i, int(total))
    io_pool.shutdown()

    import jax
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0
    logger.info("%d sequences x %d frames in %.1fs (%.2f seq-frames/s)",
                s, frames_done, elapsed, s * frames_done / elapsed)

    os.makedirs(output_dir, exist_ok=True)
    counts = np.asarray(state.surfel_count)
    for si, d in enumerate(dataset_dirs):
        count = int(counts[si])
        pack = np.asarray(state.pack[si, :count])
        alive = pack[:, RAD] >= 0
        name = os.path.basename(os.path.normpath(d)) or f"seq{si}"
        out = os.path.join(output_dir, f"{name}.ply")
        write_ply(out, pack[alive][:, SX:SZ + 1])
        logger.info("wrote %s (%d points)", out, int(alive.sum()))
    return counts


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname).1s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("datasets", nargs="+")
    p.add_argument("--trajectory", default="groundtruth.txt")
    p.add_argument("--max_surfel_count", type=int, default=500_000)
    p.add_argument("--outlier_filtering_frame_count", type=int, default=2)
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument("--output_dir", default=".")
    args = p.parse_args(argv)
    run_batched(args.datasets, args.trajectory, args.max_surfel_count,
                args.outlier_filtering_frame_count, args.max_frames,
                args.output_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
