"""Full-system test: TUM dataset -> fusion -> async meshing -> OBJ export."""

import numpy as np

from surfelmeshing_tpu.config import SurfelMeshingConfig
from surfelmeshing_tpu.io.synthetic import write_tum_dataset
from surfelmeshing_tpu.io.tum import read_tum_rgbd_dataset
from surfelmeshing_tpu.meshing.driver import MeshingDriver
from surfelmeshing_tpu.pipeline import ReconstructionPipeline


def test_fusion_plus_meshing_end_to_end(tmp_path):
    path = write_tum_dataset(str(tmp_path / "ds"), num_frames=8,
                             width=64, height=48)
    video = read_tum_rgbd_dataset(path, "groundtruth.txt", 0.2)

    cfg = SurfelMeshingConfig(
        max_surfel_count=65536,
        outlier_filtering_frame_count=2,
        depth_erosion_radius=1,
        depth_valid_region_radius=1000.0,
    )
    pipe = ReconstructionPipeline(cfg, video.depth_camera)
    mesher = MeshingDriver(cfg, log_timings=True)

    last_frame = None
    for i in range(video.frame_count - 1):
        result = pipe.process_frame(video, i)
        if result is None:
            continue
        last_frame = i
        if mesher.idle():
            mesher.submit(*pipe.snapshot(), i)
    # Final snapshot for the last frame (main.cc:1247-1254).
    pipe.block_until_ready()
    mesher.drain()
    mesher.submit(*pipe.snapshot(), last_frame)
    mesher.drain()

    assert mesher.engine.triangle_count > 200
    frame_index, count, tris = mesher.peek_output()
    assert frame_index == last_frame
    assert tris.shape[1] == 3

    # Triangle vertices lie on the fused cloud; mesh edges are short.
    smooth, radius_sq, normal, stamps, n = pipe.snapshot()
    tris64 = tris.astype(np.int64)
    a, b, c = (smooth[tris64[:, k]] for k in range(3))
    edges = np.concatenate([
        np.linalg.norm(a - b, axis=1),
        np.linalg.norm(b - c, axis=1),
        np.linalg.norm(c - a, axis=1)])
    # Edge lengths bounded by a few times the surfel radius scale.
    median_radius = np.median(np.sqrt(radius_sq[radius_sq > 0]))
    assert np.median(edges) < 5 * median_radius

    obj_path = str(tmp_path / "mesh.obj")
    mesher.export_obj(obj_path, pipe)
    text = open(obj_path).read()
    assert text.count("\nf ") + text.startswith("f ") > 100
    mesher.finish()
    assert len(mesher.timings_log_lines) > 0
