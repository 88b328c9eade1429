#!/usr/bin/env python
"""Benchmark: RGB-D fusion frames/sec at 640x480 on one TPU chip.

Mirrors BASELINE config 1 (fusion-only, 500k surfel cap) on a synthetic
640x480 sequence (no TUM data ships with this image).  The per-frame step =
full depth preprocessing (bilateral, 8-frame outlier fusion, erosion, normals,
radii) + the complete 8-phase surfel fusion update, identical to what runs on
a real dataset; only disk I/O and meshing are excluded, matching the
reference's "fusion" stage timings (main.cc:1531-1545).

This drives the SHIPPED ReconstructionPipeline (--use_shape_buckets +
--frame_chunk dispatch) — the measured thing is the shipped thing.  The
bench itself owns no dispatch policy: it only stages inputs (untimed
prefetch, main.cc:891-898 analog), warms up, precompiles every bucket the
pipeline's ladder can reach, and times the frame loop.

Benchmark discipline: NO XLA compile (or persistent-cache executable load)
may land inside the timed region.  jax_log_compiles is monitored; if a
compile fires anyway, the run is invalid and is re-run ONCE from a state
snapshot (everything is compiled by then).  The re-run is reported on
stderr so a flaky number is never silent.

Time budget: the whole run is boxed to SM_BENCH_BUDGET_S wall seconds
(default 1500).  The bucket ladder is precompiled TOP-DOWN (capacity
first) with a budget check before each bucket; if the cache is cold and
the full ladder cannot compile in budget, dispatch is restricted to the
compiled subset (pipeline.set_allowed_buckets — rounds bucket picks UP,
bit-exact, just more dead-row padding) and the JSON line carries
"degraded": true.  A cold cache costs ONE mandatory top-bucket compile;
the run always ends with a measured number (the reference always logs
its timings, main.cc:1531-1545).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 30 FPS — the reference's real-time target (main.cc:304-307).
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


class _CompileCounter(logging.Handler):
    """Counts XLA compiles / compile-cache executable loads.

    With jax_log_compiles=True, JAX logs "Compiling <name> ..." and
    "... compilation cache hit/miss ..." at WARNING on jax._src.* loggers
    (jax/_src/interpreters/pxla.py:1941, jax/_src/compiler.py:100); either
    one inside the timed region means the measurement is polluted."""

    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.count = 0

    def emit(self, record):  # noqa: D102
        msg = record.getMessage()
        if "Compiling" in msg or "compilation cache" in msg:
            self.count += 1


def main():
    t_start = time.perf_counter()
    SMOKE = os.environ.get("SM_BENCH_SMOKE") == "1"
    budget_s = float(os.environ.get("SM_BENCH_BUDGET_S", "1500"))
    deadline = t_start + budget_s

    import jax

    if SMOKE and os.environ.get("SM_BENCH_CPU", "1") == "1":
        # Smoke mode validates dispatch logic, not device speed: run on CPU
        # (must be decided before any backend init; see CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache: bucket compiles are minutes-long on a
    # tunneled TPU; cache them across bench runs.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_log_compiles", True)
    counter = _CompileCounter()
    logging.getLogger("jax").addHandler(counter)

    from surfelmeshing_tpu.config import SurfelMeshingConfig
    from surfelmeshing_tpu.io.synthetic import synthetic_rgbd_video
    from surfelmeshing_tpu.pipeline import ReconstructionPipeline

    W, H = 640, 480
    CAP = 500_000
    NUM_FRAMES = 40
    WARMUP = 8   # warmup frames (multiple of CHUNK)
    CHUNK = 4
    STEP = 65_536
    CREATION_BUDGET = 2**15
    if SMOKE:
        W, H, CAP, NUM_FRAMES = 160, 120, 40_960, 24
        WARMUP, STEP, CREATION_BUDGET = 4, 4_096, 4_096

    video, _seq = synthetic_rgbd_video(NUM_FRAMES, W, H, noise_sigma=0.002)
    cfg = SurfelMeshingConfig(
        max_surfel_count=CAP,
        use_shape_buckets=True,
        shape_bucket_step=STEP,
        max_creations_per_frame=CREATION_BUDGET,
        # Adaptive count bound: charge unconfirmed frames 2x the confirmed
        # per-frame growth (max of the last TWO chunk samples — see
        # pipeline._count_bound) instead of the full budget — tighter
        # buckets once growth settles.  Factor 4.0 and max-of-4-samples
        # both measured as null results (runs 3-4, PERF.md): with ~12
        # unconfirmed-frame charges in flight the bound stayed >= 458753
        # and clamped to the capacity bucket.  A burst past the bound just
        # defers creations one frame (drop-and-retry).  All reachable
        # buckets are in the precompiled ladder (it starts at the
        # fresh-state bound), so adaptive picks never compile inside the
        # timed region.
        adaptive_creation_bound=2.0,
        frame_chunk=CHUNK,
        restrict_fps_to=0,
    )
    pipe = ReconstructionPipeline(cfg, video.depth_camera)

    half = cfg.outlier_filtering_frame_count // 2
    lo, hi = half, NUM_FRAMES - half
    n_timed = (hi - lo - WARMUP) // CHUNK * CHUNK
    timed = list(range(lo + WARMUP, lo + WARMUP + n_timed))

    # Untimed prefetch: depth windows, colors, pose packs all device-staged;
    # the timed loop performs dispatch only (no host->device transfers).
    pipe.prefetch_inputs(video, lo, hi)

    # Precompile the complete reachable bucket ladder (from frame 0's bound
    # through capacity — the count bound never decreases), TOP-DOWN with a
    # wall-budget check before each bucket.  The top (capacity) bucket is
    # mandatory — without one executable there is no number at all — so it
    # compiles regardless of budget; every further (smaller, cheaper-to-run)
    # bucket is optional.  Whatever subset got compiled becomes the allowed
    # dispatch set; with a warm persistent cache this loads the full ladder
    # in seconds.
    ladder = sorted(pipe.shape_bucket_ladder(), reverse=True)
    print(f"bench: ladder (top-down) {ladder}, budget {budget_s:.0f}s",
          file=sys.stderr)
    compiled, longest = [], 0.0
    for n_eff in ladder:
        remaining = deadline - time.perf_counter()
        # Reserve time for warmup + timed loop (~60 s warm); require head-
        # room of the worst compile seen so far (min 120 s) per new bucket.
        if compiled and remaining < max(1.3 * longest, 120.0) + 60.0:
            print(f"bench: budget exhausted after {len(compiled)} bucket(s);"
                  f" skipping {n_eff} and below", file=sys.stderr)
            break
        t0 = time.perf_counter()
        pipe.precompile_shape_buckets(video, timed[0], [n_eff])
        dt = time.perf_counter() - t0
        longest = max(longest, dt)
        compiled.append(n_eff)
        print(f"bench: bucket {n_eff} ready in {dt:.1f}s", file=sys.stderr)
    degraded = len(compiled) < len(ladder)
    pipe.set_allowed_buckets(compiled)

    # Warmup: fills the map; dispatches only at precompiled buckets.
    for i in range(lo, lo + WARMUP):
        pipe.process_frame(video, i)
    pipe.drain()

    snap = pipe.snapshot_dispatch_state()
    fps = None
    trace_dir = os.environ.get("SM_BENCH_TRACE")   # diagnostic only
    for attempt in range(2):
        compiles_before = counter.count
        if trace_dir:
            jax.profiler.start_trace(trace_dir)
        t0 = time.perf_counter()
        for i in timed:
            pipe.process_frame(video, i)
        pipe.drain()
        elapsed = time.perf_counter() - t0
        if trace_dir:
            jax.profiler.stop_trace()
            trace_dir = None   # trace only the first attempt
        compiled = counter.count - compiles_before
        fps = len(timed) / elapsed
        if compiled == 0:
            break
        print(f"bench: {compiled} compile(s) inside the timed region "
              f"(attempt {attempt + 1}); re-running once from snapshot",
              file=sys.stderr)
        pipe.restore_dispatch_state(snap)
        pipe.prefetch_inputs(video, timed[0], hi)
    else:
        print("bench: WARNING — compiles persisted across the re-run; "
              "the reported number is polluted", file=sys.stderr)

    count = pipe.surfel_count()
    overflow = int(pipe.state.overflow_count)
    print(f"bench: {len(timed)} timed frames, {1000 * elapsed / len(timed):.1f} "
          f"ms/frame, surfels={count}, overflow={overflow}", file=sys.stderr)
    picks = pipe.bucket_pick_log[-(len(timed) // CHUNK):]
    print(f"bench: timed bucket picks {[b for _, b in picks]}",
          file=sys.stderr)

    if SMOKE and os.environ.get("SM_BENCH_CHECK") == "1":
        # Exactness audit: replay every frame through a per-frame,
        # full-shape pipeline and compare — proves the bucketed chunked
        # dispatch is lossless.
        import jax.numpy as jnp
        ref_cfg = SurfelMeshingConfig(
            max_surfel_count=CAP, use_shape_buckets=False, frame_chunk=1,
            max_creations_per_frame=CREATION_BUDGET, restrict_fps_to=0)
        ref = ReconstructionPipeline(ref_cfg, video.depth_camera)
        for i in range(lo, timed[-1] + 1):
            ref.process_frame(video, i)
        ref.drain()
        ok_cnt = ref.surfel_count() == count
        d = jnp.abs(ref.state.pack - pipe.state.pack)
        d = jnp.where(jnp.isnan(d), 0.0, d)
        print(json.dumps({"smoke_check": {
            "count_equal": ok_cnt,
            "pack_equal": bool(jnp.array_equal(ref.state.pack,
                                               pipe.state.pack)),
            "max_abs_diff": float(jnp.max(d)),
        }}))
        # lax.scan compiles the chunk body as a loop, which changes XLA's
        # FMA-contraction choices vs the straight-line per-frame jit; the
        # residual is sub-micrometre f32 noise, not a dispatch-logic
        # difference — counts and every discrete column stay identical.
        assert ok_cnt, "bucketed chunked dispatch diverged (count)"
        assert float(jnp.max(d)) <= 1e-2, "bucketed chunked dispatch diverged"

    out = {
        "metric": ("SMOKE_" if SMOKE else "") + "fusion_fps_640x480_500k",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
    }
    if degraded:
        # Budget-boxed precompile stopped early: timed frames ran at the
        # nearest compiled bucket ABOVE their bound (bit-exact; extra
        # dead-row padding), so the value understates a warm-cache run.
        out["degraded"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
