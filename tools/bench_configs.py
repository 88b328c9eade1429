#!/usr/bin/env python
"""Fusion timing sweep across capacities / active-set budgets on the TPU.

Prints one JSON line per config (not the driver bench — see bench.py).
Usage: python tools/bench_configs.py [--trajectory NAME] [config ...]
where config is "CAP[:BUDGET]" e.g. "500k" "2m:2m" "20m:2m" "20m:-1"
(-1 = auto budget tracking the lagged visible-set tile demand, the
pipeline's --active_surfel_budget -1 policy).
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from bench_configs_common import BenchEnv, parse_size  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from surfelmeshing_tpu.ops.fusion import (create_surfel_state,
                                              integrate_frame)

    args = sys.argv[1:]
    trajectory = "arc"
    if "--trajectory" in args:
        k = args.index("--trajectory")
        trajectory = args[k + 1]
        del args[k:k + 2]
    configs = args or ["500k", "2m:2m", "20m:2m"]

    TILE = 4096
    WARMUP = 6
    env = BenchEnv(trajectory=trajectory)
    device = jax.devices()[0]

    for cfg in configs:
        parts = cfg.split(":")
        cap = parse_size(parts[0])
        budget = parse_size(parts[1]) if len(parts) > 1 else 0
        if budget:
            cap = (cap + TILE - 1) // TILE * TILE
        auto = budget == -1
        params = env.make_params(budget=budget, tile=TILE)
        state = jax.device_put(create_surfel_state(cap), device)

        # Auto budget (pipeline._auto_budget policy): lagged visible-set
        # tile demand x2 on a power-of-2 tile ladder; live-count seed
        # before any demand is observed.
        lag_count, lag_tiles = 0, 0
        pending = []
        c_floor = min(params.max_creations_per_frame, env.W * env.H)
        floor_tiles = c_floor // TILE + 2

        def auto_budget():
            if lag_tiles > 0:
                want = 2 * lag_tiles
            else:
                want = -(-2 * max(lag_count + 2 * 32768, 1) // TILE)
            tiles = 1 << (max(floor_tiles, want) - 1).bit_length()
            return int(min(tiles * TILE, cap))

        budgets_used = set()

        def step(state, i):
            nonlocal lag_count, lag_tiles
            p = params
            if auto:
                while pending and pending[0].is_ready():
                    import numpy as np
                    v = np.asarray(jax.device_get(pending.pop(0)))
                    lag_count, lag_tiles = int(v[0]), int(v[1])
                b = auto_budget()
                budgets_used.add(b)
                p = dataclasses.replace(params, active_surfel_budget=b)
            state = env.step(state, i, p, integrate_frame)
            if auto:
                h = jnp.stack([state.surfel_count, state.active_tile_count])
                pending.append(h)
                try:
                    h.copy_to_host_async()
                except AttributeError:
                    pass
            return state

        lo, hi = env.lo, env.hi
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
        print(json.dumps({
            "config": cfg, "capacity": cap, "budget": budget,
            "trajectory": trajectory,
            "fps": round(n / elapsed, 2),
            "ms_per_frame": round(1000 * elapsed / n, 1),
            "surfels": int(state.surfel_count),
            "skipped_tiles": int(state.skipped_tile_count),
            **({"budgets_used": sorted(budgets_used),
                "final_active_tiles": int(state.active_tile_count)}
               if auto else {}),
        }), flush=True)


if __name__ == "__main__":
    main()
