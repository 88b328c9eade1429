#!/usr/bin/env python
"""End-to-end bench: preprocessing + fusion + asynchronous meshing FPS.

The BASELINE north-star config: 640x480 RGB-D, 20M surfel capacity, full
8-phase fusion with async incremental triangulation pacing snapshots like
the reference driver (main.cc:1235-1254).  Synthetic sequence (no TUM data
on this machine).  Prints one JSON line per config.

Usage: python tools/bench_e2e.py [CAP[:BUDGET] ...]   default 20m:2m
"""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "/root/repo")

from bench_configs_common import (AutoBudgetPolicy, build_inputs,  # noqa: E402
                                  parse_size)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from surfelmeshing_tpu.meshing.driver import MeshingDriver
    from surfelmeshing_tpu.ops.fusion import (create_surfel_state,
                                              integrate_frame,
                                              meshing_snapshot,
                                              meshing_snapshot_delta)

    configs = sys.argv[1:] or ["20m:2m"]
    env = build_inputs()
    TILE = 4096

    for cfg_str in configs:
        parts = cfg_str.split(":")
        cap = parse_size(parts[0])
        budget = parse_size(parts[1]) if len(parts) > 1 else 0
        if budget:
            cap = (cap + TILE - 1) // TILE * TILE
        params = env.make_params(budget=budget, tile=TILE)
        device = jax.devices()[0]
        state = jax.device_put(create_surfel_state(cap), device)
        mesher = MeshingDriver()
        # -1 = auto budget (pipeline --active_surfel_budget -1 policy).
        policy = AutoBudgetPolicy(
            cap, TILE, params.max_creations_per_frame, env.W, env.H) \
            if budget == -1 else None

        def fstep(state, i):
            p = policy.params_for_frame(params) if policy else params
            state = env.step(state, i, p, integrate_frame)
            if policy:
                policy.observe(state)
            return state

        import numpy as np

        def snapshot(state):
            smooth, radius_sq, normal, stamps, count = \
                meshing_snapshot(state)
            count = int(count)
            pad = min(1 << max(10, (max(count, 2) - 1).bit_length()),
                      smooth.shape[0])
            return (np.asarray(smooth[:pad])[:count],
                    np.asarray(radius_sq[:pad])[:count],
                    np.asarray(normal[:pad])[:count],
                    np.asarray(stamps[:pad])[:count], count)

        # Delta transport (pipeline.snapshot_for_meshing semantics): ship
        # only rows changed since the last snapshot — the e2e lever that
        # kills the ~10 MB/snapshot full-map readback through the tunnel.
        last_snap = [None]
        delta_bucket = [1 << 16]
        rows_shipped = [0]
        window = 30   # regularization_frame_window_size default

        def tagged_snapshot(state, frame_index):
            if last_snap[0] is None:
                out = snapshot(state)
                last_snap[0] = frame_index
                rows_shipped[0] += out[4]
                return ("full",) + out
            while True:
                max_rows = min(delta_bucket[0], cap)
                (idx, pos, rad, nrm, stamps_, total, count) = \
                    meshing_snapshot_delta(state, jnp.int32(last_snap[0]),
                                           window, max_rows)
                total = int(total)
                if total <= max_rows or max_rows >= cap:
                    break
                delta_bucket[0] = 1 << (total - 1).bit_length()
            m = min(total, max_rows)
            last_snap[0] = frame_index
            rows_shipped[0] += m
            return ("delta", np.asarray(idx[:m]), np.asarray(pos[:m]),
                    np.asarray(rad[:m]), np.asarray(nrm[:m]),
                    np.asarray(stamps_[:m]), int(count))

        lo, hi = env.lo, env.hi
        warm = 6
        for i in range(lo, lo + warm):
            state = fstep(state, i)
        jax.block_until_ready(state)
        mesher.submit_snapshot(tagged_snapshot(state, lo + warm - 1),
                               lo + warm - 1)

        t0 = time.perf_counter()
        n = 0
        snaps = 0
        for i in range(lo + warm, hi):
            state = fstep(state, i)
            if mesher.idle():
                mesher.submit_snapshot(tagged_snapshot(state, i), i)
                snaps += 1
            n += 1
        jax.block_until_ready(state)
        elapsed = time.perf_counter() - t0
        mesher.drain()
        tris = mesher.engine.triangle_count
        mesher.finish()
        fps = n / elapsed
        print(json.dumps({
            "config": cfg_str, "capacity": cap, "budget": budget,
            "e2e_fps": round(fps, 2),
            "ms_per_frame": round(1000 * elapsed / n, 1),
            "snapshots": snaps,
            "rows_shipped": int(rows_shipped[0]),
            "triangles": int(tris),
            "surfels": int(state.surfel_count),
        }), flush=True)


if __name__ == "__main__":
    main()
