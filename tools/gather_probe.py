#!/usr/bin/env python
"""Probe: can a Pallas kernel with the gather source VMEM-resident beat
XLA's HBM row gather?  (The xplane trace shows same-shape 500k-row gathers
running at 9.5ms from an HBM source vs 2.4ms from a VMEM(S(1)) source —
placement is worth 4x; a Pallas kernel controls placement.)

Variants (each chained CHAIN times so the axon tunnel can't hide latency;
wall-clock per iteration is trustworthy for chains, PERF.md):
  xla      - out = src[idx]                      (XLA decides placement)
  pallas   - jnp.take(src, idx, axis=0) inside a kernel, src one VMEM block
  pallas3  - three packs gathered with ONE shared index vector in one kernel

Usage: python tools/gather_probe.py [variant ...]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

HW = 307_200          # 640*480
N = 500_736           # padded surfel count
COLS = 8
CHAIN = 30


def _chain_idx(idx, out):
    """Make the next iteration's indices depend on this output (serializes
    the chain without changing the values: term is always 0)."""
    import jax.numpy as jnp
    return idx + (out[0, 0] != out[0, 0]).astype(jnp.int32)


def run(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (HW, COLS), jnp.float32)
    src2 = src * 2.0
    src3 = src * 3.0
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, HW, jnp.int32)

    BLK = 16_384

    def pallas_gather(src, idx):
        # Mosaic's dynamic_gather wants operand/indices/output the same
        # shape, so gather in source-sized blocks of broadcast indices
        # (take_along_axis over axis 0, sublane-dim gather).
        n_pad = ((N + HW - 1) // HW) * HW
        idx_p = jnp.pad(idx, (0, n_pad - N))

        def kern(idx_ref, src_ref, out_ref):
            ixb = jnp.broadcast_to(idx_ref[...][:, None], (HW, COLS))
            out_ref[...] = jnp.take_along_axis(src_ref[...], ixb, axis=0)

        out = pl.pallas_call(
            kern,
            grid=(n_pad // HW,),
            in_specs=[
                pl.BlockSpec((HW,), lambda i: (i,)),
                pl.BlockSpec((HW, COLS), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((HW, COLS), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_pad, COLS), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(idx_p, src)
        return out[:N]

    def pallas_gather3(srcs, idx):
        # Three packs gathered with one shared index block per grid step.
        n_pad = ((N + HW - 1) // HW) * HW
        idx_p = jnp.pad(idx, (0, n_pad - N))

        def kern(idx_ref, a_ref, b_ref, c_ref, oa, ob, oc):
            ixb = jnp.broadcast_to(idx_ref[...][:, None], (HW, COLS))
            oa[...] = jnp.take_along_axis(a_ref[...], ixb, axis=0)
            ob[...] = jnp.take_along_axis(b_ref[...], ixb, axis=0)
            oc[...] = jnp.take_along_axis(c_ref[...], ixb, axis=0)

        outs = pl.pallas_call(
            kern,
            grid=(n_pad // HW,),
            in_specs=[pl.BlockSpec((HW,), lambda i: (i,))] +
                     [pl.BlockSpec((HW, COLS), lambda i: (0, 0))] * 3,
            out_specs=[pl.BlockSpec((HW, COLS), lambda i: (i, 0))] * 3,
            out_shape=[jax.ShapeDtypeStruct((n_pad, COLS), jnp.float32)] * 3,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(idx_p, *srcs)
        return [o[:N] for o in outs]

    def pallas_gather_lane(src, idx):
        # Transposed formulation: operand (COLS, HW), lane-dim gather.
        srcT = src.T
        n_pad = ((N + HW - 1) // HW) * HW
        idx_p = jnp.pad(idx, (0, n_pad - N))

        def kern(idx_ref, src_ref, out_ref):
            ixb = jnp.broadcast_to(idx_ref[...][None, :], (COLS, HW))
            out_ref[...] = jnp.take_along_axis(src_ref[...], ixb, axis=1)

        out = pl.pallas_call(
            kern,
            grid=(n_pad // HW,),
            in_specs=[
                pl.BlockSpec((HW,), lambda i: (i,)),
                pl.BlockSpec((COLS, HW), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((COLS, HW), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((COLS, n_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(idx_p, srcT)
        return out[:, :N].T

    @jax.jit
    def chain_xla(idx):
        for _ in range(CHAIN):
            out = src[idx]
            idx = _chain_idx(idx, out)
        return out, idx

    @jax.jit
    def chain_pallas(idx):
        for _ in range(CHAIN):
            out = pallas_gather(src, idx)
            idx = _chain_idx(idx, out)
        return out, idx

    @jax.jit
    def chain_pallas3(idx):
        for _ in range(CHAIN):
            oa, ob, oc = pallas_gather3((src, src2, src3), idx)
            idx = _chain_idx(idx, oa)
        return oa, idx

    @jax.jit
    def chain_xla3(idx):
        for _ in range(CHAIN):
            oa, ob, oc = src[idx], src2[idx], src3[idx]
            idx = _chain_idx(idx, oa + ob + oc)
        return oa, idx

    @jax.jit
    def chain_pallas_lane(idx):
        for _ in range(CHAIN):
            out = pallas_gather_lane(src, idx)
            idx = _chain_idx(idx, out)
        return out, idx

    fns = {"xla": chain_xla, "pallas": chain_pallas,
           "pallas3": chain_pallas3, "xla3": chain_xla3,
           "pallas_lane": chain_pallas_lane}
    fn = fns[variant]

    out, _ = fn(idx0)   # compile
    jax.block_until_ready(out)
    # correctness spot check vs XLA
    ref = np.asarray(src)[np.asarray(idx0)]
    got = np.asarray(out)
    if variant in ("xla", "pallas", "pallas_lane"):
        assert np.array_equal(ref, got), "gather mismatch!"

    t0 = time.perf_counter()
    REP = 5
    for _ in range(REP):
        out, _ = fn(idx0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (REP * CHAIN)
    streams = 3 if variant.endswith("3") else 1
    print(f"{variant:8s}: {dt*1e3:7.3f} ms/gather-step "
          f"({N*streams/dt/1e6:.0f}M idx/s incl. chain overhead)")


if __name__ == "__main__":
    for v in sys.argv[1:] or ["xla", "pallas", "xla3", "pallas3"]:
        try:
            run(v)
        except Exception as e:
            print(f"{v:8s}: FAILED {type(e).__name__}: {str(e)[:300]}")
