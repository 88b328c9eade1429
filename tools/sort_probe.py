#!/usr/bin/env python
"""Probe: can sort + segmented scan + unique-index scatter beat the three
scalar-unit-bound scatters of fusion phases 1-2?

The scatters run at ~140M updates/s (PERF.md); 3 streams x 1M updates =
21.6 ms/frame.  A sort-based segment reduction replaces them with ONE key
sort (pixel index) + associative scans (vector-rate) + one unique-index
row-set scatter per map.  Worth it iff TPU sort of 1M keys + 3 payloads
costs well under ~15 ms.

Variants:
  sort1   - jax.lax.sort of 1M i32 keys alone
  sort4   - keys + 3 payload operands (the real configuration)
  scan    - segmented min/sum scans over a sorted array (cost of the scans)
  full    - sort4 + scans + 3 unique scatter-writes (end-to-end candidate)
  argsortg- argsort keys, then ONE 8-wide-row gather of payloads (PERF.md
            fast-gather class) instead of carrying payloads through sort

Chained like gather_probe so tunnel latency can't hide (PERF.md).

Usage: python tools/sort_probe.py [variant ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

HW = 307_200
M = 1_000_000          # 2 candidate pixels x 500k surfels
CHAIN = 20


def run(variant):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    keys0 = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, HW, jnp.int32)
    z = jax.random.uniform(jax.random.PRNGKey(1), (M,), jnp.float32)
    idxv = jax.random.randint(jax.random.PRNGKey(2), (M,), 0, M, jnp.int32)
    zu = jax.random.randint(jax.random.PRNGKey(3), (M,), 0, 1 << 17,
                            jnp.int32)

    def chain_tax(k, out):
        # f32-based NaN-comparison tax (i32 x!=x folds to 0 and the chain
        # CSEs away -- measured 0.002ms/step on the first probe version);
        # also roll so successive iterations sort a different array.
        t = (z[0] != z[0]).astype(jnp.int32)
        return jnp.roll(k, 1) + t

    def seg_ops(sk, sz, si, szu):
        """Segment boundaries from sorted keys; forward scans then pick the
        run-final element for each pixel (unique-index scatter-set)."""
        newseg = jnp.concatenate(
            [jnp.ones((1,), bool), sk[1:] != sk[:-1]])

        def scanfn(a, b):
            (af, amin, aidx, asum), (bf, bmin, bidx, bsum) = a, b
            return (af | bf,
                    jnp.where(bf, bmin, jnp.minimum(amin, bmin)),
                    jnp.where(bf, bidx, jnp.minimum(aidx, bidx)),
                    jnp.where(bf, bsum, asum + bsum))

        _, mn, mi, sm = jax.lax.associative_scan(
            scanfn, (newseg, sz, si, szu))
        is_last = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
        outpix = jnp.where(is_last, sk, HW)
        first_depth = jnp.full((HW,), jnp.inf, jnp.float32).at[outpix].set(
            mn, mode="drop", unique_indices=True)
        supporting = jnp.full((HW,), 2**31 - 1, jnp.int32).at[outpix].set(
            mi, mode="drop", unique_indices=True)
        sums = jnp.zeros((HW,), jnp.int32).at[outpix].set(
            sm, mode="drop", unique_indices=True)
        return first_depth, supporting, sums

    @jax.jit
    def chain_sort1(k):
        out = k
        for _ in range(CHAIN):
            out = jax.lax.sort(chain_tax(out, out))
        return out

    @jax.jit
    def chain_sort2(k):
        for _ in range(CHAIN):
            sk, perm = jax.lax.sort([k, jax.lax.iota(jnp.int32, M)],
                                    num_keys=1)
            k = chain_tax(sk, perm)
        return sk

    @jax.jit
    def chain_cumsum(k):
        out = k
        for _ in range(CHAIN):
            out = jnp.cumsum(chain_tax(out, out))
        return out

    @jax.jit
    def chain_segmin(k):
        # Manual log-shift segmented min over a sorted-by-key array:
        # 20 passes of (shift, same-segment select, min) on 2 streams.
        sk = k
        for _ in range(CHAIN):
            sk = chain_tax(sk, sk)
            val = z
            vid = idxv
            shift = 1
            while shift < M:
                ks = jnp.concatenate([jnp.full((shift,), -1, jnp.int32),
                                      sk[:-shift]])
                same = ks == sk
                vs = jnp.concatenate([jnp.full((shift,), jnp.inf), val[:-shift]])
                ids = jnp.concatenate([jnp.full((shift,), 2**31 - 1, jnp.int32),
                                       vid[:-shift]])
                val = jnp.minimum(val, jnp.where(same, vs, jnp.inf))
                vid = jnp.minimum(vid, jnp.where(same, ids, 2**31 - 1))
                shift *= 2
            sk = sk + (val[0] != val[0]).astype(jnp.int32)
        return val

    def _f32tax(v):
        # Serializing, non-foldable tax: f32 NaN self-compare of a result.
        return (v.reshape(-1)[0] != v.reshape(-1)[0]).astype(jnp.int32)

    @jax.jit
    def chain_sort4(k):
        for _ in range(CHAIN):
            sk, sz, si, szu = jax.lax.sort(
                [k, z, idxv, zu], num_keys=1)
            k = jnp.roll(sk, 1) + _f32tax(sz)
        return sk

    @jax.jit
    def chain_scan(k):
        sk = k  # unsorted keys: scan cost is data-independent
        out = None
        for _ in range(CHAIN):
            fd, sup, sm = seg_ops(sk, z, idxv, zu)
            sk = jnp.roll(sk, 1) + _f32tax(fd)
        return fd

    @jax.jit
    def chain_full(k):
        for _ in range(CHAIN):
            sk, sz, si, szu = jax.lax.sort(
                [k, z, idxv, zu], num_keys=1)
            fd, sup, sm = seg_ops(sk, sz, si, szu)
            k = jnp.roll(sk, 1) + _f32tax(fd)
        return fd

    @jax.jit
    def chain_argsortg(k):
        src = jnp.stack([z, jax.lax.bitcast_convert_type(idxv, jnp.float32),
                         jax.lax.bitcast_convert_type(zu, jnp.float32),
                         z, z, z, z, z], axis=1)
        for _ in range(CHAIN):
            sk, perm = jax.lax.sort(
                [k, jax.lax.iota(jnp.int32, M)], num_keys=1)
            rows = src[perm]
            k = jnp.roll(sk, 1) + _f32tax(rows)
        return sk

    fns = {"sort1": chain_sort1, "sort2": chain_sort2, "sort4": chain_sort4,
           "scan": chain_scan, "full": chain_full, "argsortg": chain_argsortg,
           "cumsum": chain_cumsum, "segmin": chain_segmin}
    fn = fns[variant]

    out = fn(keys0)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    REP = 5
    for _ in range(REP):
        out = fn(keys0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (REP * CHAIN)
    print(f"{variant:9s}: {dt*1e3:7.3f} ms/step ({M/dt/1e6:.0f}M elem/s)")


if __name__ == "__main__":
    for v in sys.argv[1:] or ["sort1", "sort2", "sort4", "scan", "full",
                              "argsortg", "cumsum", "segmin"]:
        try:
            run(v)
        except Exception as e:
            print(f"{v:9s}: FAILED {type(e).__name__}: {str(e)[:200]}")
