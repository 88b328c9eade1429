#!/usr/bin/env python
"""Trace the bench.py fusion step and dump an xplane trace.

Usage: python tools/trace_bench.py [/tmp/bench_trace] [n_eff] [nomega]

With n_eff (e.g. 327680) the step runs integrate_frame_bucketed at that
fixed bucket, matching the shapes the bucketed bench spends most frames
in; also prints wall ms/frame over the traced region so host/dispatch
overhead = wall - device module total.

Same program as bench.py (500k cap, full preprocessing + 8-phase fusion),
but wraps a handful of post-warmup frames in jax.profiler.trace so
tools/parse_xplane.py can attribute device time per HLO op.
"""

import sys

sys.path.insert(0, ".")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_trace"
    n_eff = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    nomega = "nomega" in sys.argv[3:]
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    from surfelmeshing_tpu.io.synthetic import SyntheticRGBDSequence
    from surfelmeshing_tpu.ops import preprocess as pp
    from surfelmeshing_tpu.ops.fusion import (FusionParams,
                                              create_surfel_state,
                                              integrate_frame,
                                              integrate_frame_bucketed)

    W, H = 640, 480
    SCALE = 5000.0
    CAP = 500_000
    K = 8
    NUM_FRAMES = 26
    WARMUP = 6
    TRACE_N = 10

    seq = SyntheticRGBDSequence(num_frames=NUM_FRAMES, width=W, height=H,
                                noise_sigma=0.002)
    cam = seq.camera
    params = FusionParams(
        width=W, height=H, fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        depth_scaling=SCALE, do_blending=True, regularization_iterations=1,
        mega_sort=not nomega)

    device = jax.devices()[0]
    depths, colors = [], []
    for i in range(NUM_FRAMES):
        d, c = seq.depth_and_color(i)
        depths.append(jax.device_put(jnp.asarray(d), device))
        colors.append(jax.device_put(
            jnp.asarray(np.ascontiguousarray(c.transpose(2, 0, 1))), device))

    def transforms_for(i):
        ref = seq.poses[i].scaled_translation(SCALE)
        mats = []
        for off in list(range(-K // 2, 0)) + list(range(1, K // 2 + 1)):
            other = seq.poses[i + off].scaled_translation(SCALE)
            mats.append((ref.inverse() * other).inverse().matrix3x4())
        return jnp.asarray(np.stack(mats).astype(np.float32))

    pp_kwargs = dict(
        sigma_xy=3.0, sigma_value_factor=0.05, radius_factor=2.0,
        max_depth_u16=int(SCALE * 3.0), depth_valid_region_radius=333.0,
        tolerance=0.02, required_inliers=None, erosion_radius=2,
        observation_angle_threshold_deg=85.0, depth_scaling=SCALE,
        point_radius_extension_factor=1.5,
        point_radius_clamp_factor=float("inf"),
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy)

    state = jax.device_put(create_surfel_state(CAP), device)

    def step(state, i):
        others = jnp.stack([depths[i + off]
                            for off in list(range(-K // 2, 0)) +
                            list(range(1, K // 2 + 1))])
        d, normals, radius = pp.preprocess_frame(
            depths[i], others, transforms_for(i), **pp_kwargs)
        T_gl = jnp.asarray(seq.poses[i].matrix3x4().astype(np.float32))
        T_lg = jnp.asarray(
            seq.poses[i].inverse().matrix3x4().astype(np.float32))
        if n_eff:
            return integrate_frame_bucketed(state, d, normals, radius,
                                            colors[i], T_gl, T_lg,
                                            jnp.int32(i), params, n_eff)
        return integrate_frame(state, d, normals, radius, colors[i],
                               T_gl, T_lg, jnp.int32(i), params)

    lo = K // 2
    for i in range(lo, lo + WARMUP):
        state = step(state, i)
    jax.block_until_ready(state)

    import time
    t0 = time.perf_counter()
    with jax.profiler.trace(out):
        for i in range(lo + WARMUP, lo + WARMUP + TRACE_N):
            state = step(state, i)
        jax.block_until_ready(state)
    wall = (time.perf_counter() - t0) / TRACE_N
    print(f"wall: {wall*1e3:.1f} ms/frame over {TRACE_N} traced frames")
    print("trace written to", out, f"({TRACE_N} frames)")


if __name__ == "__main__":
    main()
