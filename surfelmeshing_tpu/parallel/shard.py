"""Single-map fusion sharded over the surfel axis (tensor parallelism).

The reference is single-GPU: every per-surfel CUDA kernel iterates the whole
surfel buffer (cuda_surfel_reconstruction_kernels.cc:249-251).  On a TPU mesh
the natural decomposition of the SAME map is to shard the surfel rows: every
per-surfel stream (the scatter-raster, association, merge, integration,
neighbor update, regularization — the entire fusion cost at large maps) then
runs at 1/D length per chip, while the image-domain work is replicated.

Communication per frame (all on ICI):
- three ~1.2 MB map combines (pmin of the min-depth raster, pmin of the
  supporting-surfel claims, psum of the packed count+depth-sum map) — the
  scatters are order-independent min/add, so local-scatter-then-combine is
  bit-exact vs a global scatter;
- all-gathers of the pack at the phase boundaries where gathers address
  surfels by global index (merge lookup, neighbor candidates,
  regularization slots), standing in for the single-chip path's in-place
  reads.

Bit-exactness vs integrate_frame is asserted in tests/test_parallel.py on an
8-virtual-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fusion import (FusionParams, SurfelState, _integrate_body,
                          _Sharding, create_surfel_state)


def _state_spec(axis: str) -> SurfelState:
    return SurfelState(
        pack=P(axis, None),
        neighbors=P(None, axis),
        nbr_dist=P(None, axis),
        surfel_count=P(),
        merge_count=P(),
        overflow_count=P(),
        skipped_tile_count=P(),
        active_tile_count=P(),
    )


def create_sharded_state(capacity: int, mesh: Mesh,
                         axis: str = "surf") -> SurfelState:
    """SurfelState with the surfel rows sharded over `axis`."""
    if capacity % mesh.shape[axis]:
        raise ValueError(f"capacity ({capacity}) must divide evenly over "
                         f"the {mesh.shape[axis]}-way '{axis}' mesh axis")
    state = create_surfel_state(capacity)
    spec = _state_spec(axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, spec)


def make_sharded_step(params: FusionParams, mesh: Mesh, axis: str = "surf"):
    """Returns a jitted fusion step over a surfel-sharded SurfelState.

    (state, depth, normals_xy, radius_img, color, T_gl, T_lg, frame_index)
    -> state, with state.pack/neighbors sharded over `axis` and every other
    input replicated.  Semantics match ops.fusion.integrate_frame exactly.
    """
    if params.active_surfel_budget:
        raise ValueError("surfel-axis sharding and active-set tiling are "
                         "separate dispatch modes; set active_surfel_budget=0")

    def local_step(state, depth, normals_xy, radius_img, color,
                   t_gl, t_lg, frame_index):
        n_local = state.pack.shape[0]
        offset = jax.lax.axis_index(axis).astype(jnp.int32) * n_local
        return _integrate_body(state, depth, normals_xy, radius_img, color,
                               t_gl, t_lg, frame_index, params,
                               shard=_Sharding(axis=axis, offset=offset))

    spec = _state_spec(axis)
    rep = P()
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(spec, rep, rep, rep, rep, rep, rep, rep),
        out_specs=spec,
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))
