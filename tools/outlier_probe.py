#!/usr/bin/env python
"""Probe variants of the two dominant gather classes (PERF.md round-4):

1. The outlier-reprojection gather (preprocess.outlier_depth_map_fusion):
   K*HW indices into the K-frame depth stack via the lane8 trick.
     cur    - one fused K*HW-index lane8 gather, source = (K*HW/8, 8) view
              of the u16->f32 converted stack (what ships today)
     bar    - same, + optimization_barrier pinning the converted source
     perk   - K separate HW-index lane8 gathers, one per frame, each from a
              barriered (HW/8, 8) per-frame source (smaller VMEM residency)
2. The per-surfel slot/candidate gathers (fusion pn_pack / reg_src):
   8 streams of N indices into an (N, 8) concat-materialized source.
     surf   - 8 gathers, plain concat source (what ships today)
     surfbar- 8 gathers, barriered source

Chained CHAIN deep so tunnel latency can't hide (PERF.md: microbenchmarks
through the axon tunnel lie; chains are trustworthy).
"""

import sys
import time

sys.path.insert(0, ".")

H, W, K = 480, 640, 8
HW = H * W
N = 458_752
CHAIN = 20
REP = 5


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    kidx = jax.random.PRNGKey(1)
    # Realistic reprojection indices: near-identity with small jitter.
    base = jnp.tile(jax.lax.iota(jnp.int32, HW), (K,))
    jit_off = jax.random.randint(kidx, (K * HW,), -3 * W, 3 * W, jnp.int32)
    off_k = (jax.lax.iota(jnp.int32, K * HW) // HW) * HW
    all_flat0 = jnp.clip(base + jit_off, 0, HW - 1) + off_k
    others = jax.random.randint(jax.random.PRNGKey(2), (K, H, W),
                                0, 20000, jnp.uint16)

    def lane8(src_rows, idx):
        rows = src_rows[idx >> 3]
        lane = (idx & 7)[:, None]
        iota8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        return jnp.sum(jnp.where(lane == iota8, rows, 0.0), axis=1)

    def chain_out(sample_fn, idx):
        acc = jnp.float32(0)
        for _ in range(CHAIN):
            s = sample_fn(idx)
            bump = (s[0] != s[0]).astype(jnp.int32)     # always 0, not CSEable
            idx = jnp.roll(idx, 1) + bump
            acc = acc + s[1]
        return acc, idx

    def v_cur(idx):
        src = others.reshape(-1).astype(jnp.float32).reshape(-1, 8)
        return lane8(src, idx)

    def v_bar(idx):
        src = others.reshape(-1).astype(jnp.float32).reshape(-1, 8)
        src = jax.lax.optimization_barrier(src)
        return lane8(src, idx)

    def v_perk(idx):
        outs = []
        for k in range(K):
            src = others[k].reshape(-1, 8).astype(jnp.float32)
            src = jax.lax.optimization_barrier(src)
            outs.append(lane8(src, idx[k * HW:(k + 1) * HW] - k * HW))
        return jnp.concatenate(outs)

    variants = {"cur": v_cur, "bar": v_bar, "perk": v_perk}

    for name in (sys.argv[1:] or list(variants)):
        if name.startswith("surf"):
            run_surf(jax, jnp, name)
            continue
        fn = jax.jit(lambda idx, f=variants[name]: chain_out(f, idx))
        out, _ = fn(all_flat0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(REP):
            out, _ = fn(all_flat0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (REP * CHAIN)
        print(f"{name:8s}: {dt*1e3:7.3f} ms/step "
              f"({K*HW/dt/1e6:.0f}M idx/s)")


def run_surf(jax, jnp, name):
    import jax.numpy as jnp
    pack = jax.random.normal(jax.random.PRNGKey(3), (N, 17), jnp.float32)
    idx8 = jax.random.randint(jax.random.PRNGKey(4), (8, N), 0, N, jnp.int32)

    def step(idx8):
        src = jnp.concatenate([pack[:, 0:3], pack[:, 3:6], pack[:, 8:10]],
                              axis=1)
        if name == "surfbar":
            src = jax.lax.optimization_barrier(src)
        acc = jnp.float32(0)
        for k in range(8):
            rows = src[idx8[k]]
            acc = acc + rows[:, 0].sum()
        return acc

    def chain(idx8):
        acc = jnp.float32(0)
        for _ in range(CHAIN):
            s = step(idx8)
            bump = (s != s).astype(jnp.int32)
            idx8 = jnp.roll(idx8, 1, axis=1) + bump
            acc = acc + s
        return acc, idx8

    fn = jax.jit(chain)
    out, _ = fn(idx8)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REP):
        out, _ = fn(idx8)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (REP * CHAIN)
    print(f"{name:8s}: {dt*1e3:7.3f} ms/step "
          f"({8*N/dt/1e6:.0f}M idx/s over 8 streams)")


if __name__ == "__main__":
    main()
