"""Application driver: CLI-compatible rebuild of the reference main
(applications/surfel_meshing/src/surfel_meshing/main.cc:255-1760).

Usage:
    python -m surfelmeshing_tpu.app.main <dataset_folder_path> \
        <trajectory_filename> [flags...]

Drives the per-frame loop: dataset playback with pose interpolation, depth
preprocessing + surfel fusion on the TPU, asynchronous incremental meshing
snapshots, FPS pacing, timing reports, and OBJ/PLY export.
"""

from __future__ import annotations

import logging
import sys
import time

import numpy as np

from ..config import SurfelMeshingConfig, config_from_args
from ..io.tum import read_tum_rgbd_dataset
from ..pipeline import ReconstructionPipeline

logger = logging.getLogger("surfelmeshing_tpu")


def run(cfg: SurfelMeshingConfig) -> int:
    if not cfg.dataset_folder_path:
        print("error: dataset_folder_path is required", file=sys.stderr)
        return 1

    video = read_tum_rgbd_dataset(
        cfg.dataset_folder_path, cfg.trajectory_filename,
        cfg.max_pose_interpolation_time_extent)
    logger.info("Read dataset with %d frames", video.frame_count)
    if video.frame_count == 0:
        print("error: could not read dataset", file=sys.stderr)
        return 1

    if cfg.invert_quaternions:
        for frame in list(video.color_frames) + list(video.depth_frames):
            q = frame.global_T_frame.q
            frame.global_T_frame.q[:3] = -q[:3]

    end_frame = min(cfg.end_frame, video.frame_count)
    half_window = cfg.outlier_filtering_frame_count // 2

    pipe = ReconstructionPipeline(cfg, video.depth_camera)

    mesher = None
    if cfg.asynchronous_triangulation or cfg.full_meshing_every_frame:
        try:
            from ..meshing.driver import MeshingDriver
            mesher = MeshingDriver(cfg)
        except (ImportError, OSError) as exc:
            logger.warning("meshing engine unavailable (%s); "
                           "running fusion only", exc)

    stats_interval = 200
    frame_count_hits = 0
    frame_count_misses = 0
    target_dt = 1.0 / cfg.restrict_fps_to if cfg.restrict_fps_to > 0 else 0.0

    for frame_index in range(cfg.start_frame, end_frame - half_window):
        frame_start = time.perf_counter()
        result = pipe.process_frame(video, frame_index)
        if result is None:
            continue
        if mesher is not None:
            if mesher.idle() or frame_index == end_frame - half_window - 1:
                mesher.submit(*pipe.snapshot(), frame_index)
        if cfg.log_timings:
            pipe.log_frame_timings(frame_index)
        if frame_index % stats_interval == 0:
            pipe.block_until_ready()
            logger.info("frame %d: %d surfels", frame_index,
                        pipe.surfel_count())
        # FPS cap (main.cc:1669-1692).
        if target_dt > 0:
            elapsed = time.perf_counter() - frame_start
            if elapsed < target_dt:
                frame_count_hits += 1
                time.sleep(target_dt - elapsed)
            else:
                frame_count_misses += 1

    pipe.block_until_ready()
    logger.info("done: %d surfels, fps target hit %d / missed %d",
                pipe.surfel_count(), frame_count_hits, frame_count_misses)
    logger.info("%s", pipe.timing.report())

    if mesher is not None:
        mesher.finish(full_retriangulation=cfg.full_retriangulation_at_end)

    if cfg.log_timings:
        with open(cfg.log_timings, "w") as f:
            f.write("\n".join(pipe.timings_log_lines) + "\n")

    if cfg.export_point_cloud:
        n = pipe.export_point_cloud(cfg.export_point_cloud)
        logger.info("Wrote %s (%d points)", cfg.export_point_cloud, n)

    if cfg.export_mesh:
        if mesher is not None:
            mesher.export_obj(cfg.export_mesh, pipe)
            logger.info("Wrote %s", cfg.export_mesh)
        else:
            logger.warning("--export_mesh requested but meshing engine "
                           "unavailable; skipping")
    return 0


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname).1s %(message)s")
    cfg = config_from_args(argv)
    return run(cfg)


if __name__ == "__main__":
    sys.exit(main())
