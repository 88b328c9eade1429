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

_FORMAT_VERSION = 4    # v4 adds the nbr_dist stored-slot-distance array


def save_checkpoint(path: str, state: SurfelState, frame_index: int) -> None:
    fields = {name: np.asarray(value)
              for name, value in state._asdict().items()}
    np.savez_compressed(
        path, version=_FORMAT_VERSION, frame_index=frame_index, **fields)


def load_checkpoint(path: str):
    """-> (SurfelState, frame_index)."""
    import jax.numpy as jnp

    data = np.load(path)
    if int(data["version"]) != _FORMAT_VERSION:
        # older versions used different pack column order / neighbor
        # layout; no migration path.
        raise ValueError(f"unsupported checkpoint version {data['version']}")
    fields = {}
    for name in SurfelState._fields:
        if name in data:
            fields[name] = jnp.asarray(data[name])
        else:
            # Scalar counters added in later minor revisions default to 0;
            # array-layout changes bump _FORMAT_VERSION and are rejected
            # above (no migration path).
            fields[name] = jnp.zeros((), jnp.int32)
    return SurfelState(**fields), int(data["frame_index"])
