"""Application driver: CLI-compatible rebuild of the reference main
(applications/surfel_meshing/src/surfel_meshing/main.cc:255-1760).

Usage:
    python -m surfelmeshing_tpu.app.main <dataset_folder_path> \
        <trajectory_filename> [flags...]

Drives the per-frame loop: dataset playback with pose interpolation, depth
preprocessing + surfel fusion on the TPU, asynchronous incremental meshing,
FPS pacing, timing reports, camera following / keyframe-spline playback,
frame-by-frame video rendering through the headless viewer, and OBJ/PLY
export.
"""

from __future__ import annotations

import logging
import os
import sys
import time

import numpy as np

from ..config import SurfelMeshingConfig, config_from_args
from ..io.tum import read_tum_rgbd_dataset
from ..pipeline import ReconstructionPipeline
from ..utils.se3 import SE3
from ..utils.spline import KeyframePath, read_keyframes, write_keyframes

logger = logging.getLogger("surfelmeshing_tpu")


def _up_direction(cfg, video):
    """Up-direction heuristic (main.cc:644-659)."""
    if cfg.trajectory_filename == "groundtruth.txt":
        return np.array([0.0, 0.0, 1.0])
    gt_path = os.path.join(cfg.dataset_folder_path, "groundtruth.txt")
    if os.path.exists(gt_path):
        try:
            gt_video = read_tum_rgbd_dataset(cfg.dataset_folder_path,
                                             "groundtruth.txt")
            r_traj = video.depth_frames[0].frame_T_global.rotation_matrix
            r_gt = gt_video.depth_frames[0].frame_T_global.rotation_matrix
            return r_traj.T @ r_gt @ np.array([0.0, 0.0, 1.0])
        except Exception:  # noqa: BLE001 - heuristic only
            pass
    return video.depth_frames[0].frame_T_global.rotation_matrix.T @ \
        np.array([0.0, 1.0, 0.0])


def build_debug_line_sets(cfg, pipe, count):
    """Debug line passes (surfel_meshing_render_window.cc:382-430): red
    surfel->neighbor segments, blue radius-length normal segments.  Shared
    by the video writer and the live WebGL viewer."""
    from ..ops import fusion as F
    line_sets = []
    if cfg.debug_neighbor_rendering or cfg.debug_normal_rendering:
        from ..ops.fusion import INVALID_INDEX
        smooth = np.asarray(F.smooth_positions(pipe.state)[:count])
        if cfg.debug_neighbor_rendering:
            nbrs = np.asarray(pipe.state.neighbors[:, :count]).T
            src, slot = np.nonzero(nbrs != int(INVALID_INDEX))
            tgt = nbrs[src, slot]
            ok = tgt < count
            segs = np.stack([smooth[src[ok]], smooth[tgt[ok]]], axis=1)
            line_sets.append((segs, (255, 0, 0)))
        if cfg.debug_normal_rendering:
            radii = np.sqrt(np.maximum(
                np.asarray(F.radii_sq(pipe.state)[:count]), 0.0))
            nrm = np.asarray(F.normals(pipe.state)[:count])
            tips = smooth + radii[:, None] * nrm
            segs = np.stack([smooth, tips], axis=1)
            segs = segs[np.isfinite(segs).all(axis=(1, 2))]
            line_sets.append((segs, (0, 0, 255)))
    return line_sets


class VideoWriter:
    """Frame-by-frame screenshot video (--create_video, main.cc:1436-1440)."""

    def __init__(self, cfg, camera):
        from ..viewer.renderer import Renderer
        self.cfg = cfg
        self.renderer = Renderer(cfg.render_window_default_width,
                                 cfg.render_window_default_height)
        self.camera = camera
        self.count = 0

    def render_frame(self, pipe, mesher, view_pose, input_pose,
                     frame_index=0):
        from ..ops import fusion as F
        from ..ops.fusion import export_vertices
        from ..viewer.renderer import surfel_colors
        positions, colors = export_vertices(pipe.state)
        count = pipe.surfel_count()
        positions = np.asarray(positions[:count])
        colors = np.asarray(colors[:count])
        # Debug color modes (--visualize_*, kernels.cu:274-351).
        mode = "color"
        if self.cfg.visualize_last_update_timestamp:
            mode = "timestamp"
        elif self.cfg.visualize_creation_timestamp:
            mode = "creation"
        elif self.cfg.visualize_radii:
            mode = "radius"
        elif self.cfg.visualize_surfel_normals:
            mode = "normals"
        if mode != "color":
            colors = surfel_colors(
                mode, colors,
                np.asarray(F.update_stamps(pipe.state)[:count]),
                np.asarray(F.creation_stamps(pipe.state)[:count]),
                np.asarray(F.radii_sq(pipe.state)[:count]),
                np.asarray(F.normals(pipe.state)[:count]),
                frame_index,
                active_window=min(
                    self.cfg.surfel_integration_active_window_size, 3000))
        tris = None
        mesh_surfels = 0
        if mesher is not None:
            out = mesher.peek_output()
            if out is not None:
                _, mesh_surfels, tris = out
        splats = None
        splat_colors = None
        if self.cfg.render_new_surfels_as_splats:
            splats = positions[mesh_surfels:]
            splat_colors = colors[mesh_surfels:]

        line_sets = build_debug_line_sets(self.cfg, pipe, count)

        img = self.renderer.render(
            view_pose,
            splat_points=splats,
            splat_colors=splat_colors,
            splat_half_extent=self.cfg.splat_half_extent_in_pixels,
            mesh_vertices=positions,
            mesh_colors=colors,
            mesh_triangles=tris if tris is not None and len(tris) else None,
            triangle_normal_shading=self.cfg.triangle_normal_shading,
            frustum_pose=input_pose if self.cfg.render_camera_frustum
            else None,
            frustum_camera=pipe.camera if self.cfg.render_camera_frustum
            else None,
            line_sets=line_sets or None)
        from ..viewer.renderer import save_png
        save_png(f"frame{self.count:06d}.png", img)
        self.count += 1


def debug_triangulate_surfel(mesher, key: str, surfel_index: int,
                             live_viewer=None) -> bool:
    """The y/e per-surfel debug-triangulation keys (main.cc:1609-1627):
    y = force re-triangulation of the selected surfel (SetSurfelToRemesh +
    Triangulate(force_debug)); e = reset every triangle within its radius
    first (RemeshTrianglesAt) then re-triangulate.  Logs the surfel's
    meshing state and, when a live viewer is attached, renders its
    neighborhood as debug lines (the headless analog of the reference's
    step-by-step debug rendering).  Returns False when the index is
    invalid."""
    if mesher is None:
        logger.warning("no meshing engine (synchronous_meshing without "
                       "meshing?)")
        return False
    mesher.drain()
    eng = mesher.engine
    info = eng.surfel_info(surfel_index)
    if info is None:
        logger.warning("surfel %d out of range (engine has %d)",
                       surfel_index, eng.surfel_count)
        return False
    if key == "e":
        logger.info("Retriangulating surfel %d (radius_squared: %g) ...",
                    surfel_index, info["radius_sq"])
        eng.remesh_triangles_at(surfel_index)
    else:
        logger.info("Trying to triangulate surfel %d ...", surfel_index)
        eng.queue_for_remesh(surfel_index)
    eng.triangulate()
    after = eng.surfel_info(surfel_index)
    dists, nbrs = eng.find_neighbors(
        info["position"], 4.0 * info["radius_sq"], max_count=64,
        include_completed=True, include_free=True)
    logger.info(
        "surfel %d: state %d -> %d, triangles %d -> %d, fronts %d -> %d, "
        "%d neighbors in 2r, self-check %d", surfel_index, info["state"],
        after["state"], info["triangles"], after["triangles"],
        info["fronts"], after["fronts"], len(nbrs),
        eng.check_surfel_state(surfel_index))
    if live_viewer is not None and len(nbrs):
        segs = np.empty((len(nbrs), 2, 3), np.float32)
        for j, nb in enumerate(nbrs):
            nb_info = eng.surfel_info(int(nb))
            segs[j, 0] = info["position"]
            segs[j, 1] = nb_info["position"] if nb_info is not None \
                else info["position"]
        live_viewer.update_debug_lines([(segs, (255, 255, 0))])
    return True


def _terminal_controls(cfg, pipe, mesher, frame_index, input_pose,
                       recorded_keyframes, live_viewer=None) -> str:
    """Terminal key controls (main.cc:1548-1653; reference README
    "Terminal controls"): Return = next frame, q = quit, r = run,
    a/s = regularizer weight x1.1 / /1.1, d = one regularization iteration,
    t = full retriangulation, p = save mesh now, k = record keyframe,
    'y N' / 'e N' = per-surfel debug triangulation of surfel N
    (main.cc:1609-1627; the index argument replaces the reference's
    click-selected surfel on this headless terminal)."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from ..ops.fusion import regularize_only

    while True:
        try:
            cmd = input(
                "[Return=step, q, r, a, s, d, t, p, k, y N, e N] > ").strip()
        except EOFError:
            return "quit"
        if cmd == "":
            return "step"
        key = cmd[0].lower()
        if key == "q":
            return "quit"
        if key == "r":
            return "run"
        if key in ("y", "e"):
            parts = cmd.split()
            try:
                sel = int(parts[1])
            except (IndexError, ValueError):
                logger.warning("usage: %s <surfel_index>", key)
                continue
            debug_triangulate_surfel(mesher, key, sel, live_viewer)
            continue
        if key == "a":
            cfg.regularizer_weight *= 1.1
            pipe.fusion_params = _dc.replace(
                pipe.fusion_params, regularizer_weight=cfg.regularizer_weight)
            logger.info("regularizer_weight: %f", cfg.regularizer_weight)
        elif key == "s":
            cfg.regularizer_weight /= 1.1
            pipe.fusion_params = _dc.replace(
                pipe.fusion_params, regularizer_weight=cfg.regularizer_weight)
            logger.info("regularizer_weight: %f", cfg.regularizer_weight)
        elif key == "d":
            logger.info("Regularization iteration ...")
            pipe.state = regularize_only(pipe.state, jnp.int32(frame_index),
                                         pipe.fusion_params)
        elif key == "t" and mesher is not None:
            mesher.drain()
            mesher.engine.full_retriangulation()
            logger.info("full retriangulation: %d triangles",
                        mesher.engine.triangle_count)
        elif key == "p":
            if cfg.export_mesh and mesher is not None:
                mesher.drain()
                mesher.export_obj(cfg.export_mesh, pipe)
                logger.info("Wrote %s", cfg.export_mesh)
            elif cfg.export_point_cloud:
                pipe.export_point_cloud(cfg.export_point_cloud)
                logger.info("Wrote %s", cfg.export_point_cloud)
            else:
                logger.warning("no --export_mesh/--export_point_cloud path")
        elif key == "k":
            recorded_keyframes.append((frame_index, input_pose))
            logger.info("recorded keyframe at frame %d", frame_index)


def _dump_input_images(cfg, video, frame_index: int) -> None:
    """Save the current input color/depth frame as PNGs (headless analog of
    the reference's input-image windows, main.cc:744-747,1004-1008)."""
    import os

    from PIL import Image as PILImage

    os.makedirs("input_images", exist_ok=True)
    color = np.asarray(video.color_frames[frame_index].get_image())
    if color.ndim == 2:
        color = np.stack([color] * 3, axis=-1)
    PILImage.fromarray(color[..., :3].astype(np.uint8)).save(
        f"input_images/frame{frame_index:06d}_color.png")
    depth = np.asarray(video.depth_frames[frame_index].get_image())
    vmax = max(cfg.depth_scaling * cfg.max_depth, 1.0)
    vis = np.clip(255.0 * depth.astype(np.float32) / vmax, 0,
                  255).astype(np.uint8)
    PILImage.fromarray(vis).save(
        f"input_images/frame{frame_index:06d}_depth.png")


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
        # Reference quirk preserved (main.cc:632-642): color frames get the
        # conjugated quaternion; depth frames additionally get the whole
        # pose inverted.
        for frame in video.color_frames:
            q = frame.global_T_frame.q.copy()
            frame.global_T_frame = SE3([-q[0], -q[1], -q[2], q[3]],
                                       frame.global_T_frame.t)
        for frame in video.depth_frames:
            q = frame.global_T_frame.q.copy()
            inverted = SE3([-q[0], -q[1], -q[2], q[3]],
                           frame.global_T_frame.t)
            frame.global_T_frame = inverted.inverse()

    end_frame = min(cfg.end_frame, video.frame_count)
    half_window = cfg.outlier_filtering_frame_count // 2

    pipe = ReconstructionPipeline(cfg, video.depth_camera)

    resume_frame = None
    if cfg.load_checkpoint:
        from ..io.checkpoint import load_checkpoint
        import jax as _jax
        state, resume_frame = load_checkpoint(cfg.load_checkpoint)
        if state.pack.shape[0] != pipe.state.pack.shape[0]:
            print("error: checkpoint capacity "
                  f"{state.pack.shape[0]} != configured "
                  f"{pipe.state.pack.shape[0]}", file=sys.stderr)
            return 1
        pipe.state = _jax.device_put(state, pipe.device)
        logger.info("resumed from %s at frame %d", cfg.load_checkpoint,
                    resume_frame)

    mesher = None
    try:
        from ..meshing.driver import MeshingDriver
        mesher = MeshingDriver(cfg, log_timings=bool(cfg.log_timings))
    except (ImportError, OSError) as exc:
        logger.warning("meshing engine unavailable (%s); "
                       "running fusion only", exc)

    up = _up_direction(cfg, video)
    logger.info("up direction: %s", np.round(up, 3))

    playback_path = None
    if cfg.playback_keyframes:
        keyframes = read_keyframes(cfg.playback_keyframes)
        playback_path = KeyframePath([p for _, p in keyframes])
        logger.info("Keyframe playback with %d keyframes", len(keyframes))
    recorded_keyframes = []

    video_writer = VideoWriter(cfg, video.depth_camera) \
        if cfg.create_video else None

    live_viewer = None
    last_pushed_mesh = (-1, -1)
    if cfg.live_viewer_port:
        from ..viewer.live import LiveViewerServer
        live_viewer = LiveViewerServer(port=cfg.live_viewer_port)
        logger.info("live viewer: http://127.0.0.1:%d/", live_viewer.port)

    def push_live(force=False, input_pose=None):
        nonlocal last_pushed_mesh
        if live_viewer is None:
            return
        from ..ops.fusion import export_vertices
        out = mesher.peek_output() if mesher is not None else None
        mesh_id = (out[0], len(out[2])) if out is not None else (-1, 0)
        if not force and mesh_id == last_pushed_mesh:
            return
        last_pushed_mesh = mesh_id
        positions, colors = export_vertices(pipe.state)
        count = pipe.surfel_count()
        tris = out[2] if out is not None else np.zeros((0, 3), np.uint32)
        mesh_count = out[1] if out is not None else 0
        live_viewer.update(
            np.asarray(positions[:count]), np.asarray(colors[:count]),
            tris, mesh_count,
            pose=(input_pose.matrix3x4() if input_pose is not None
                  else None),
            debug_lines=build_debug_line_sets(cfg, pipe, count)
            if (cfg.debug_neighbor_rendering or
                cfg.debug_normal_rendering) else None)

    stats_interval = 200
    frame_count_hits = 0
    frame_count_misses = 0
    target_dt = 1.0 / cfg.restrict_fps_to if cfg.restrict_fps_to > 0 else 0.0
    processed_frames = 0
    last_frame = None

    profiler_ctx = None
    if cfg.profile_dir:
        import contextlib

        import jax
        profiler_ctx = jax.profiler.trace(cfg.profile_dir)
        profiler_ctx.__enter__()
        logger.info("profiling to %s", cfg.profile_dir)

    first_frame = cfg.start_frame
    if resume_frame is not None:
        first_frame = max(first_frame, resume_frame + 1)
    frame_range = range(first_frame, end_frame - half_window)
    for frame_index in frame_range:
        frame_start = time.perf_counter()
        if cfg.show_input_images and video_writer is not None:
            # Input-image display analog (main.cc:744-747,1004-1008): the
            # reference shows the current color/depth frame in windows;
            # headless, they are saved next to the video frames.
            _dump_input_images(cfg, video, frame_index)
        result = pipe.process_frame(video, frame_index)
        if result is None:
            continue
        processed_frames += 1
        last_frame = frame_index

        if mesher is not None:
            if cfg.asynchronous_triangulation:
                # Snapshot pacing: only when the mesher is idle or about to
                # finish (main.cc:1235-1254).
                if mesher.idle() or frame_index == end_frame - half_window - 1:
                    mesher.submit_snapshot(
                        pipe.snapshot_for_meshing(frame_index),
                        frame_index)
            else:
                # Synchronous meshing inline each frame (main.cc:1343-1389).
                mesher.submit_snapshot(
                    pipe.snapshot_for_meshing(frame_index),
                    frame_index)
                mesher.drain()
                if cfg.full_meshing_every_frame:
                    mesher.engine.full_retriangulation()

        input_pose = video.depth_frames[frame_index].global_T_frame
        if cfg.record_keyframes:
            recorded_keyframes.append((frame_index, input_pose))
        if video_writer is not None:
            if playback_path is not None:
                s = playback_path.max_parameter * processed_frames / max(
                    1, len(frame_range))
                view_pose = playback_path.sample(s)
            elif cfg.follow_input_camera:
                view_pose = input_pose
            else:
                view_pose = video.depth_frames[cfg.start_frame].global_T_frame
            video_writer.render_frame(pipe, mesher, view_pose, input_pose,
                                      frame_index)

        if live_viewer is not None and \
                (processed_frames % 5 == 0 or mesher is None):
            push_live(input_pose=input_pose)
        if live_viewer is not None:
            # y/e debug-triangulation requests from the browser
            # (main.cc:1609-1627 analog; selection is browser-side).
            for key, sel in live_viewer.poll_actions():
                debug_triangulate_surfel(mesher, key, sel, live_viewer)
        if cfg.log_timings:
            pipe.log_frame_timings(frame_index)
        if frame_index % stats_interval == 0:
            pipe.block_until_ready()
            tri = mesher.engine.triangle_count if mesher else 0
            if cfg.active_surfel_budget:
                # Silent-quality-loss counter for active-set tiling: tiles
                # skipped because the working set was full (their surfels
                # went stale for the frame).
                logger.info(
                    "frame %d: %d surfels, %d triangles, %d skipped tiles "
                    "(budget %d)", frame_index, pipe.surfel_count(), tri,
                    int(pipe.state.skipped_tile_count),
                    pipe.active_budget())
            else:
                logger.info("frame %d: %d surfels, %d triangles",
                            frame_index, pipe.surfel_count(), tri)
            if cfg.abort_on_surfel_overflow and \
                    int(pipe.state.overflow_count) > 0:
                # Reference parity: abort on exceeding max_surfel_count
                # (README.md:105-107).  Checked here (the stats interval
                # already blocks) and at exit.
                logger.error("max_surfel_count exceeded — aborting "
                             "(--abort_on_surfel_overflow)")
                return 1
        if cfg.step_by_step_playback:
            action = _terminal_controls(cfg, pipe, mesher, frame_index,
                                        input_pose, recorded_keyframes,
                                        live_viewer)
            if action == "quit":
                break
            if action == "run":
                cfg.step_by_step_playback = False
        # FPS cap (main.cc:1669-1692).
        if target_dt > 0:
            elapsed = time.perf_counter() - frame_start
            if elapsed < target_dt:
                frame_count_hits += 1
                time.sleep(target_dt - elapsed)
            else:
                frame_count_misses += 1

    pipe.block_until_ready()
    if profiler_ctx is not None:
        profiler_ctx.__exit__(None, None, None)
    overflow = int(pipe.state.overflow_count)
    if overflow > 0:
        # The reference aborts on exceeding --max_surfel_count
        # (README.md:105-107); the default here is a documented deviation —
        # keep the partial map but report loudly
        # (--abort_on_surfel_overflow restores the reference behavior).
        logger.error("max_surfel_count exceeded: %d surfel creations were "
                     "dropped — increase --max_surfel_count", overflow)
        if cfg.abort_on_surfel_overflow:
            return 1
    logger.info("done: %d surfels, fps target hit %d / missed %d",
                pipe.surfel_count(), frame_count_hits, frame_count_misses)
    if cfg.active_surfel_budget:
        skipped = int(pipe.state.skipped_tile_count)
        log = logger.warning if skipped else logger.info
        log("active-set tiling: %d tiles skipped over the run%s", skipped,
            " — stale surfels / duplicate creations possible; raise "
            "--active_surfel_budget" if skipped else "")
    logger.info("%s", pipe.timing.report())

    # Post-processing terminal controls (main.cc:1550: show_result &&
    # is_last_frame); only when attached to an interactive terminal.
    if cfg.show_result and sys.stdin.isatty() and last_frame is not None:
        pose = video.depth_frames[last_frame].global_T_frame
        while True:
            action = _terminal_controls(cfg, pipe, mesher, last_frame, pose,
                                        recorded_keyframes)
            if action in ("quit", "run"):
                break

    if mesher is not None:
        # Final snapshot so the mesh covers the last fused state
        # (main.cc:1247-1254).
        if last_frame is not None:
            mesher.drain()
            mesher.submit_snapshot(pipe.snapshot_for_meshing(last_frame),
                                   last_frame)
        mesher.finish(full_retriangulation=cfg.full_retriangulation_at_end)
        logger.info("final mesh: %d triangles", mesher.engine.triangle_count)
        if live_viewer is not None:
            # Final state (the mesher thread has exited; publish directly).
            from ..ops.fusion import export_vertices
            positions, colors = export_vertices(pipe.state)
            count = pipe.surfel_count()
            live_viewer.update(
                np.asarray(positions[:count]), np.asarray(colors[:count]),
                mesher.engine.get_triangles(), count)

    if cfg.record_keyframes and recorded_keyframes:
        write_keyframes(cfg.record_keyframes, recorded_keyframes)
        logger.info("Wrote %d keyframes to %s", len(recorded_keyframes),
                    cfg.record_keyframes)

    if cfg.save_checkpoint and last_frame is not None:
        from ..io.checkpoint import save_checkpoint
        save_checkpoint(cfg.save_checkpoint, pipe.state, last_frame)
        logger.info("Wrote checkpoint %s (frame %d)", cfg.save_checkpoint,
                    last_frame)

    if cfg.log_timings:
        with open(cfg.log_timings, "w") as f:
            f.write("\n".join(pipe.timings_log_lines) + "\n")
        # Meshing-thread timings go to their own file, like the reference
        # (asynchronous_meshing.cc:158-165 writes timings_cpu.txt).
        if mesher is not None and mesher.timings_log_lines:
            with open("timings_cpu.txt", "w") as f:
                f.write("\n".join(mesher.timings_log_lines) + "\n")

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
