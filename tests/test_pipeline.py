"""End-to-end pipeline test: TUM dataset dir -> preprocess -> fusion -> PLY."""

import numpy as np

from surfelmeshing_tpu.config import SurfelMeshingConfig
from surfelmeshing_tpu.io.mesh_io import read_ply
from surfelmeshing_tpu.io.synthetic import write_tum_dataset
from surfelmeshing_tpu.io.tum import read_tum_rgbd_dataset
from surfelmeshing_tpu.pipeline import ReconstructionPipeline


def test_pipeline_on_synthetic_tum_dataset(tmp_path):
    path = write_tum_dataset(str(tmp_path / "ds"), num_frames=8,
                             width=64, height=48)
    video = read_tum_rgbd_dataset(path, "groundtruth.txt", 0.2)
    assert video.frame_count == 8

    cfg = SurfelMeshingConfig(
        max_surfel_count=65536,
        outlier_filtering_frame_count=2,
        depth_erosion_radius=1,
        depth_valid_region_radius=1000.0,
        max_depth=3.0,
    )
    pipe = ReconstructionPipeline(cfg, video.depth_camera)

    processed = 0
    for i in range(video.frame_count - 1):
        result = pipe.process_frame(video, i)
        if result is not None:
            processed += 1
            pipe.log_frame_timings(i)
    assert processed >= 5
    pipe.block_until_ready()
    count = pipe.surfel_count()
    assert count > 100

    # The fused cloud lies on the synthetic scene geometry.
    smooth, radius_sq, normal, stamps, n = pipe.snapshot()
    pts = smooth[radius_sq >= 0]
    d_wall = np.abs(pts[:, 2] - 2.5)
    d_floor = np.abs(pts[:, 1] - 0.8)
    d_sphere = np.abs(
        np.linalg.norm(pts - np.array([0.0, 0.3, 1.8]), axis=1) - 0.35)
    dist = np.minimum(np.minimum(d_wall, d_floor), d_sphere)
    # Median robust to boundary-blending feathered points; mean bounded too.
    assert np.median(dist) < 0.005
    assert dist.mean() < 0.02

    ply_path = str(tmp_path / "cloud.ply")
    exported = pipe.export_point_cloud(ply_path)
    assert exported > 100
    rec = read_ply(ply_path)
    assert len(rec) == exported
    assert pipe.timing.stats("integration").count == processed
    assert len(pipe.timings_log_lines) == processed
    assert "surfel_count" in pipe.timings_log_lines[-1]
