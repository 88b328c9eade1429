#!/usr/bin/env python
"""Fusion timing sweep across capacities / active-set budgets on the TPU.

Prints one JSON line per config (not the driver bench — see bench.py).
Usage: python tools/bench_configs.py [--trajectory NAME] [config ...]
where config is "CAP[:BUDGET]" e.g. "500k" "2m:2m" "20m:2m" "20m:-1"
(-1 = auto budget tracking the lagged visible-set tile demand, the
pipeline's --active_surfel_budget -1 policy).
"""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from bench_configs_common import (AutoBudgetPolicy, BenchEnv,  # noqa: E402
                                  parse_size)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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
        policy = AutoBudgetPolicy(cap, TILE, params.max_creations_per_frame,
                                  env.W, env.H) if auto else None

        def step(state, i):
            p = policy.params_for_frame(params) if auto else params
            state = env.step(state, i, p, integrate_frame)
            if auto:
                policy.observe(state)
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
            **({"budgets_used": sorted(policy.budgets_used),
                "final_active_tiles": int(state.active_tile_count)}
               if auto else {}),
        }), flush=True)


if __name__ == "__main__":
    main()
