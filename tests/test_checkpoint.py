"""Checkpoint/resume round-trip test."""

import numpy as np

from surfelmeshing_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from surfelmeshing_tpu.ops import fusion as F

from test_fusion import PARAMS, flat_wall_inputs, run_frame


def test_checkpoint_roundtrip(tmp_path):
    state = F.create_surfel_state(4096)
    depth, normals, radius, color = flat_wall_inputs()
    state = run_frame(state, depth, normals, radius, color, 0)
    state = run_frame(state, depth, normals, radius, color, 1)

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, frame_index=1)
    restored, frame_index = load_checkpoint(path)
    assert frame_index == 1
    np.testing.assert_array_equal(np.asarray(restored.pack),
                                  np.asarray(state.pack))
    np.testing.assert_array_equal(np.asarray(restored.neighbors),
                                  np.asarray(state.neighbors))
    assert int(restored.surfel_count) == int(state.surfel_count)

    # Resumed state continues integrating identically.
    s2 = run_frame(restored, depth, normals, radius, color, 2)
    s1 = run_frame(state, depth, normals, radius, color, 2)
    np.testing.assert_array_equal(np.asarray(s1.pack), np.asarray(s2.pack))
