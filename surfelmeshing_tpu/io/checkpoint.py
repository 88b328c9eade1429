"""Reconstruction checkpoint / resume.

The reference has no reconstruction-state persistence (SURVEY.md §5:
"resume is re-run the dataset"); here the whole fusion state is a pytree of
arrays, so checkpointing is a single compressed npz.  The meshing engine is
rebuilt from the fused surfels on resume (a full retriangulation), which is
exact up to triangulation order.
"""

from __future__ import annotations

import numpy as np

from ..ops.fusion import SurfelState

_FORMAT_VERSION = 1


def save_checkpoint(path: str, state: SurfelState, frame_index: int) -> None:
    np.savez_compressed(
        path,
        version=_FORMAT_VERSION,
        frame_index=frame_index,
        pack=np.asarray(state.pack),
        neighbors=np.asarray(state.neighbors),
        surfel_count=np.asarray(state.surfel_count),
        merge_count=np.asarray(state.merge_count),
        overflow_count=np.asarray(state.overflow_count),
    )


def load_checkpoint(path: str):
    """-> (SurfelState, frame_index)."""
    import jax.numpy as jnp

    data = np.load(path)
    if int(data["version"]) != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {data['version']}")
    state = SurfelState(
        pack=jnp.asarray(data["pack"]),
        neighbors=jnp.asarray(data["neighbors"]),
        surfel_count=jnp.asarray(data["surfel_count"]),
        merge_count=jnp.asarray(data["merge_count"]),
        overflow_count=jnp.asarray(data["overflow_count"]),
    )
    return state, int(data["frame_index"])
