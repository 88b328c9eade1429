#!/usr/bin/env python
"""End-to-end bench: preprocessing + fusion + ASYNC MESHING frames/sec.

Drives the SHIPPED ReconstructionPipeline exactly like bench.py (chunked
bucketed dispatch, untimed prefetch + precompile, no-compile-in-timed-region
discipline) and adds the asynchronous meshing thread paced the reference way:
a snapshot is submitted whenever the mesher is idle (main.cc:1235-1254),
using the pipeline's delta transport (snapshot_for_meshing) so only changed
rows cross the tunnel after the first full snapshot.

The timed region is the fusion frame loop including snapshot submission —
the mesher trails asynchronously, exactly as in the reference's driver; its
final drain is untimed.  If XLA compiles inside the timed region (e.g. the
auto-budget ladder steps to a new bucket), the attempt is discarded and
re-run once from a state snapshot with a fresh mesher.

Usage: python tools/bench_e2e.py [CAP[:BUDGET] ...]     default: 500k 20m:-1
  BUDGET absent/0 -> shape-bucketed full path; -1 -> tiled auto budget;
  N -> fixed tiled budget.  Prints one JSON line per config.
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_configs_common import parse_size  # noqa: E402


class _CompileCounter(logging.Handler):
    """Counts XLA compiles / cache loads (same contract as bench.py)."""

    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.count = 0

    def emit(self, record):  # noqa: D102
        msg = record.getMessage()
        if "Compiling" in msg or "compilation cache" in msg:
            self.count += 1


def run_config(cfg_str, video, counter):
    from surfelmeshing_tpu.config import SurfelMeshingConfig
    from surfelmeshing_tpu.meshing.driver import MeshingDriver
    from surfelmeshing_tpu.pipeline import ReconstructionPipeline

    parts = cfg_str.split(":")
    cap = parse_size(parts[0])
    budget = parse_size(parts[1]) if len(parts) > 1 else 0

    CHUNK = 4
    WARMUP = 8
    cfg = SurfelMeshingConfig(
        max_surfel_count=cap,
        use_shape_buckets=(budget == 0),
        shape_bucket_step=65_536,
        max_creations_per_frame=2**15,
        frame_chunk=CHUNK,
        active_surfel_budget=budget,
        restrict_fps_to=0,
    )
    pipe = ReconstructionPipeline(cfg, video.depth_camera)
    mesher = MeshingDriver(cfg)

    half = cfg.outlier_filtering_frame_count // 2
    lo, hi = half, video.frame_count - half
    n_timed = (hi - lo - WARMUP) // CHUNK * CHUNK
    timed = list(range(lo + WARMUP, lo + WARMUP + n_timed))

    pipe.prefetch_inputs(video, lo, hi)

    # Warmup: compiles the early-growth buckets/budgets, fills the map, and
    # walks the snapshot path (full once, then deltas — ratcheting the delta
    # row bucket to its steady state so its executables exist before timing).
    for i in range(lo, lo + WARMUP):
        pipe.process_frame(video, i)
        if (i - lo) % CHUNK == CHUNK - 1:
            mesher.submit_snapshot(pipe.snapshot_for_meshing(i), i)
            mesher.drain()
    pipe.drain()

    if cfg.use_shape_buckets:
        ladder = pipe.shape_bucket_ladder()
        print(f"bench_e2e[{cfg_str}]: precompiling buckets {ladder}",
              file=sys.stderr)
        pipe.precompile_shape_buckets(video, timed[0], ladder)

    snap = pipe.snapshot_dispatch_state()
    snap_frame, snap_bucket = pipe._last_snap_frame, pipe._delta_bucket

    for attempt in range(2):
        compiles_before = counter.count
        rows_before = pipe.snapshot_rows_shipped
        snaps = 0
        t0 = time.perf_counter()
        for k, i in enumerate(timed):
            pipe.process_frame(video, i)
            # Snapshot pacing at chunk boundaries (state reads mid-chunk
            # would force an early flush and change the dispatch shape).
            if (k + 1) % CHUNK == 0 and mesher.idle():
                mesher.submit_snapshot(pipe.snapshot_for_meshing(i), i)
                snaps += 1
        pipe.drain()
        elapsed = time.perf_counter() - t0
        compiled = counter.count - compiles_before
        if compiled == 0:
            break
        print(f"bench_e2e[{cfg_str}]: {compiled} compile(s) in the timed "
              f"region (attempt {attempt + 1}); re-running from snapshot",
              file=sys.stderr)
        pipe.restore_dispatch_state(snap)
        pipe._delta_bucket = snap_bucket
        pipe.prefetch_inputs(video, timed[0], hi)
        mesher.finish()
        mesher = MeshingDriver(cfg)   # the engine's mesh can't roll back
        # Untimed full-snapshot re-seed so attempt 2's deltas have a base.
        pipe._last_snap_frame = None
        mesher.submit_snapshot(pipe.snapshot_for_meshing(snap_frame),
                               snap_frame)
        mesher.drain()
    else:
        print(f"bench_e2e[{cfg_str}]: WARNING — compiles persisted across "
              "the re-run; number is polluted", file=sys.stderr)

    mesher.drain()
    tris = int(mesher.engine.triangle_count)
    mesher.finish()
    fps = len(timed) / elapsed
    return {
        "config": cfg_str, "capacity": cap, "budget": budget,
        "e2e_fps": round(fps, 2),
        "ms_per_frame": round(1000 * elapsed / len(timed), 1),
        "snapshots": snaps,
        "rows_shipped": int(pipe.snapshot_rows_shipped - rows_before),
        "triangles": tris,
        "surfels": pipe.surfel_count(),
        "compiles_in_timed_region": compiled,
    }


def main():
    import jax

    if os.environ.get("SM_BENCH_SMOKE") == "1":
        # Smoke mode validates pacing/rollback logic on CPU at toy shapes.
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_log_compiles", True)
    counter = _CompileCounter()
    logging.getLogger("jax").addHandler(counter)

    from surfelmeshing_tpu.io.synthetic import synthetic_rgbd_video

    if os.environ.get("SM_BENCH_SMOKE") == "1":
        video, _seq = synthetic_rgbd_video(24, 160, 120, noise_sigma=0.002)
        configs = sys.argv[1:] or ["41k", "41k:-1"]
    else:
        video, _seq = synthetic_rgbd_video(40, 640, 480, noise_sigma=0.002)
        configs = sys.argv[1:] or ["500k", "20m:-1"]
    for cfg_str in configs:
        print(json.dumps(run_config(cfg_str, video, counter)), flush=True)


if __name__ == "__main__":
    main()
