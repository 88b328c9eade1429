"""Generate docs/demo.png: full pipeline on a synthetic sequence, final mesh
rendered from an orbit viewpoint."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    import tempfile

    from surfelmeshing_tpu.config import SurfelMeshingConfig
    from surfelmeshing_tpu.io.synthetic import write_tum_dataset
    from surfelmeshing_tpu.io.tum import read_tum_rgbd_dataset
    from surfelmeshing_tpu.meshing.driver import MeshingDriver
    from surfelmeshing_tpu.ops.fusion import export_vertices
    from surfelmeshing_tpu.pipeline import ReconstructionPipeline
    from surfelmeshing_tpu.viewer.renderer import (OrbitCamera, Renderer,
                                                   save_png)

    with tempfile.TemporaryDirectory() as tmp:
        ds = write_tum_dataset(os.path.join(tmp, "ds"), num_frames=16,
                               width=160, height=120)
        video = read_tum_rgbd_dataset(ds, "groundtruth.txt", 0.2)
        cfg = SurfelMeshingConfig(
            max_surfel_count=200_000, outlier_filtering_frame_count=2,
            depth_erosion_radius=1, depth_valid_region_radius=1000.0)
        pipe = ReconstructionPipeline(cfg, video.depth_camera)
        mesher = MeshingDriver(cfg)
        for i in range(video.frame_count - 1):
            if pipe.process_frame(video, i) is not None and mesher.idle():
                mesher.submit(*pipe.snapshot(), i)
        pipe.block_until_ready()
        mesher.drain()
        mesher.submit(*pipe.snapshot(), video.frame_count - 2)
        mesher.drain()

        positions, colors = export_vertices(pipe.state)
        count = pipe.surfel_count()
        positions = np.asarray(positions[:count])
        colors = np.asarray(colors[:count])
        tris = mesher.engine.get_triangles()
        print(f"{count} surfels, {len(tris)} triangles")

        r = Renderer(960, 540, background=(250, 250, 250))
        cam = OrbitCamera(center=np.array([0.0, 0.2, 2.0]), radius=3.4,
                          yaw=0.3, pitch=-0.2,
                          up=np.array([0.0, -1.0, 0.0]))
        img = r.render(cam.pose(), mesh_vertices=positions,
                       mesh_colors=colors, mesh_triangles=tris,
                       splat_points=positions, splat_colors=colors,
                       splat_half_extent=1.0)
        out = os.path.join(os.path.dirname(__file__), "..", "docs",
                           "demo.png")
        save_png(out, img)
        print("wrote", out)
        mesher.finish()


if __name__ == "__main__":
    main()
