"""Mesh-accuracy evaluation app (ICL-NUIM protocol, BASELINE config 4).

Reconstructs a TUM/ICL-NUIM-format sequence and evaluates the surfel cloud /
mesh against a ground-truth model (OBJ) or point cloud (PLY):

    python -m surfelmeshing_tpu.app.evaluate <dataset_dir> <trajectory> \
        --ground_truth model.obj [--max_frames N] [--tolerance 0.01]

Prints mean/median/RMS accuracy and completeness as JSON.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import numpy as np

logger = logging.getLogger("surfelmeshing_tpu.eval")


def evaluate_sequence(dataset_dir: str, trajectory: str, ground_truth: str,
                      max_frames: int = 0, tolerance: float = 0.01,
                      max_surfel_count: int = 2_000_000,
                      outlier_filtering_frame_count: int = 2,
                      pyramid_level: int = 0):
    from ..config import SurfelMeshingConfig
    from ..eval.mesh_accuracy import (evaluate_accuracy,
                                      load_obj_vertices_triangles,
                                      sample_mesh_surface)
    from ..io.mesh_io import read_ply
    from ..io.tum import read_tum_rgbd_dataset
    from ..ops.fusion import export_vertices
    from ..pipeline import ReconstructionPipeline

    video = read_tum_rgbd_dataset(dataset_dir, trajectory, 0.05)
    cfg = SurfelMeshingConfig(
        max_surfel_count=max_surfel_count,
        outlier_filtering_frame_count=outlier_filtering_frame_count,
        pyramid_level=pyramid_level)
    pipe = ReconstructionPipeline(cfg, video.depth_camera)

    end = video.frame_count
    if max_frames:
        end = min(end, max_frames)
    for i in range(end):
        pipe.process_frame(video, i)
    pipe.block_until_ready()
    logger.info("reconstructed %d surfels", pipe.surfel_count())

    positions, _ = export_vertices(pipe.state)
    count = pipe.surfel_count()
    rec = np.asarray(positions[:count])

    if ground_truth.endswith(".obj"):
        v, t = load_obj_vertices_triangles(ground_truth)
        gt = sample_mesh_surface(v, t) if len(t) else v
    else:
        r = read_ply(ground_truth)
        gt = np.stack([r["x"], r["y"], r["z"]], axis=1)

    result = evaluate_accuracy(rec, gt, completeness_tolerance=tolerance)
    return result


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname).1s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("dataset_dir")
    p.add_argument("trajectory")
    p.add_argument("--ground_truth", required=True)
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument("--tolerance", type=float, default=0.01)
    p.add_argument("--max_surfel_count", type=int, default=2_000_000)
    p.add_argument("--outlier_filtering_frame_count", type=int, default=2)
    p.add_argument("--pyramid_level", type=int, default=0)
    args = p.parse_args(argv)
    result = evaluate_sequence(
        args.dataset_dir, args.trajectory, args.ground_truth,
        args.max_frames, args.tolerance, args.max_surfel_count,
        args.outlier_filtering_frame_count, args.pyramid_level)
    print(json.dumps(result.as_dict()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
