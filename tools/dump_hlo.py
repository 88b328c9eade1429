#!/usr/bin/env python
"""Dump the optimized HLO of the bench fusion step (works through axon:
client-side --xla_dump_to is a no-op because compilation happens server-side,
but compiled.as_text() returns the optimized module).

Usage: python tools/dump_hlo.py [/tmp/fusion_opt.hlo]
"""

import sys

sys.path.insert(0, ".")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fusion_opt.hlo"
    import jax

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
    seq = SyntheticRGBDSequence(num_frames=3, width=W, height=H)
    cam = seq.camera
    params = FusionParams(
        width=W, height=H, fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        depth_scaling=SCALE, do_blending=True, regularization_iterations=1)

    state = create_surfel_state(CAP)
    depth = jnp.zeros((H, W), jnp.uint16)
    normals = jnp.zeros((2, H, W), jnp.float32)
    radius = jnp.zeros((H, W), jnp.float32)
    color = jnp.zeros((3, H, W), jnp.uint8)
    T = jnp.zeros((3, 4), jnp.float32)

    lowered = integrate_frame.lower(state, depth, normals, radius, color,
                                    T, T, jnp.int32(0), params)
    compiled = lowered.compile()
    text = compiled.as_text()
    with open(out, "w") as f:
        f.write(text)
    print("wrote", out, len(text), "bytes")


if __name__ == "__main__":
    main()
