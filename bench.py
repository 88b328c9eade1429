#!/usr/bin/env python
"""Benchmark: RGB-D fusion frames/sec at 640x480 on one TPU chip.

Mirrors BASELINE config 1 (fusion-only, 500k surfel cap) on a synthetic
640x480 sequence (no TUM data ships with this image).  The per-frame step =
full depth preprocessing (bilateral, 8-frame outlier fusion, erosion, normals,
radii) + the complete 8-phase surfel fusion update, identical to what runs on
a real dataset; only disk I/O and meshing are excluded, matching the
reference's "fusion" stage timings (main.cc:1531-1545).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 30 FPS — the reference's real-time target (main.cc:304-307).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    # Persistent compilation cache: bucket compiles are minutes-long on a
    # tunneled TPU; cache them across bench runs.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from surfelmeshing_tpu.io.synthetic import SyntheticRGBDSequence
    from surfelmeshing_tpu.ops import preprocess as pp
    from surfelmeshing_tpu.ops.fusion import (FusionParams,
                                              create_surfel_state,
                                              integrate_frame)

    W, H = 640, 480
    SCALE = 5000.0
    CAP = 500_000
    K = 8  # outlier_filtering_frame_count
    NUM_FRAMES = 40
    WARMUP = 6

    seq = SyntheticRGBDSequence(num_frames=NUM_FRAMES, width=W, height=H,
                                noise_sigma=0.002)
    cam = seq.camera
    params = FusionParams(
        width=W, height=H, fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        depth_scaling=SCALE, do_blending=True, regularization_iterations=1)

    device = jax.devices()[0]

    # Pre-render frames and upload (I/O excluded, like the reference's
    # untimed prefetch, main.cc:891-898).
    depths = []
    colors = []
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
        # Full-capacity shapes: ONE compiled program for the whole run.
        # (Bucketed shapes — integrate_frame_bucketed — trade extra compiles
        # for count-proportional cost; off here for benchmark determinism.)
        return integrate_frame(state, d, normals, radius, colors[i],
                               T_gl, T_lg, jnp.int32(i), params)

    lo, hi = K // 2, NUM_FRAMES - K // 2
    # Warmup (compile + first frames).
    for i in range(lo, lo + WARMUP):
        state = step(state, i)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    n = 0
    for i in range(lo + WARMUP, hi):
        state = step(state, i)
        n += 1
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    fps = n / elapsed
    print(json.dumps({
        "metric": "fusion_fps_640x480_500k",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
