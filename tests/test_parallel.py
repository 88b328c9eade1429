"""Batched multi-sequence sharding tests on a virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from surfelmeshing_tpu.ops.fusion import FusionParams
from surfelmeshing_tpu.parallel.batch import (create_batched_state,
                                              make_batched_step)

H, W = 24, 32
FX = FY = 30.0
CX, CY = W / 2 + 0.5, H / 2 + 0.5
SCALE = 5000.0


def test_batched_step_runs_on_mesh():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devices[:8]), ("seq",))
    params = FusionParams(width=W, height=H, fx=FX, fy=FY, cx=CX, cy=CY,
                          depth_scaling=SCALE, do_blending=False,
                          regularization_iterations=1)
    s = 8
    state = create_batched_state(s, 2048, mesh)

    depth = np.full((s, H, W), 10000, np.uint16)
    # Vary depth per sequence so the shards diverge.
    for i in range(s):
        depth[i] += 500 * i
    normals = np.zeros((s, 2, H, W), np.float32)
    radius = np.full((s, H, W), 0.01, np.float32)
    color = np.full((s, 3, H, W), 100, np.uint8)
    ident = np.tile(np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]],
                             np.float32), (s, 1, 1))

    step = make_batched_step(params, mesh)
    state, total = step(state, jnp.asarray(depth), jnp.asarray(normals),
                        jnp.asarray(radius), jnp.asarray(color),
                        jnp.asarray(ident), jnp.asarray(ident),
                        jnp.int32(0))
    counts = np.asarray(state.surfel_count)
    assert counts.shape == (s,)
    assert np.all(counts == (H - 2) * (W - 2))
    assert int(total) == s * (H - 2) * (W - 2)
    # Surfel depths differ per sequence (shards actually computed separately).
    from surfelmeshing_tpu.ops.fusion import PZ
    z0 = float(state.pack[0, 0, PZ])
    z7 = float(state.pack[7, 0, PZ])
    assert abs((z0 + 0.1 * 7) - z7) < 0.2 and z0 != z7

    # Second step: supports, no duplicate explosion.
    state, total2 = step(state, jnp.asarray(depth), jnp.asarray(normals),
                         jnp.asarray(radius), jnp.asarray(color),
                         jnp.asarray(ident), jnp.asarray(ident),
                         jnp.int32(1))
    counts2 = np.asarray(state.surfel_count)
    assert np.all(counts2 <= counts * 1.1)


def test_multi_sequence_app(tmp_path):
    """Batched multi-sequence runner end-to-end on the CPU mesh."""
    from surfelmeshing_tpu.app.multi_sequence import run_batched
    from surfelmeshing_tpu.io.mesh_io import read_ply
    from surfelmeshing_tpu.io.synthetic import write_tum_dataset

    dirs = []
    for i in range(2):
        d = write_tum_dataset(str(tmp_path / f"seq{i}"), num_frames=5,
                              width=64, height=48)
        dirs.append(d)
    counts = run_batched(dirs, "groundtruth.txt", max_surfel_count=16384,
                         outlier_filtering_frame_count=2,
                         output_dir=str(tmp_path / "out"))
    assert len(counts) == 2
    assert all(c > 50 for c in counts)
    rec = read_ply(str(tmp_path / "out" / "seq0.ply"))
    assert len(rec) > 50
