"""Batched multi-sequence reconstruction over a device mesh.

The reference is single-process/single-GPU (SURVEY.md §2.4); the TPU-native
scale-out axis is *sequences*: S independent RGB-D streams with per-device
surfel maps, sharded over a 1-D mesh with `shard_map`.  Per-sequence fusion is
embarrassingly parallel — no collectives on the hot path; ICI is only used for
optional metric reductions (jax.lax.psum of surfel counts).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fusion import FusionParams, SurfelState, create_surfel_state


def create_batched_state(num_sequences: int, capacity: int,
                         mesh: Mesh) -> SurfelState:
    """SurfelState with a leading sequence axis, sharded over mesh axis 'seq'."""
    state = create_surfel_state(capacity)
    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (num_sequences,) + x.shape),
        state)
    sharding = NamedSharding(mesh, P("seq"))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), batched)


def make_batched_step(params: FusionParams, mesh: Mesh):
    """Returns a jitted step: (state_S, depth_S, normals_S, radius_S,
    color_S, T_gl_S, T_lg_S, frame_index) -> (state_S, counts_psum).

    Each device fuses its local shard of sequences with a vmapped
    integrate_frame; a psum of surfel counts rides ICI as the (only)
    collective, standing in for the reference's per-200-frame stats lines
    (main.cc:1340-1342).
    """
    from ..ops.fusion import integrate_frame

    def local_step(state, depth, normals, radius, color, t_gl, t_lg,
                   frame_index):
        step = functools.partial(integrate_frame, params=params)
        new_state = jax.vmap(
            lambda st, d, nr, ra, co, a, b: step(
                st, d, nr, ra, co, a, b, frame_index))(
            state, depth, normals, radius, color, t_gl, t_lg)
        total = jax.lax.psum(jnp.sum(new_state.surfel_count), "seq")
        return new_state, total

    spec = P("seq")
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, spec, P()),
        out_specs=(spec, P()),
        check_vma=False)
    return jax.jit(sharded)


def make_batched_preprocess(pp_kwargs: dict, mesh: Mesh):
    """Sharded batched preprocessing: (depth_S, others_S, T_S) -> outputs."""
    from ..ops.preprocess import preprocess_frame

    def local(depth, others, transforms):
        fn = functools.partial(preprocess_frame, **pp_kwargs)
        return jax.vmap(fn)(depth, others, transforms)

    spec = P("seq")
    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, spec, spec), check_vma=False)
    return jax.jit(sharded)
