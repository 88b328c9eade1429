"""Hostile-scene deviation A/B (VERDICT r2 #6): the TPU-native default
deviations must stay quality-neutral on adversarial geometry, not just the
friendly default scene.  The full matrix (4 scenes x 3 trajectories x 5
modes) runs via `python -m surfelmeshing_tpu.eval.ab_matrix` and is recorded
in PERF.md; this test bounds a hostile subset so a regressing deviation
fails CI."""

import numpy as np
import pytest

from surfelmeshing_tpu.eval.ab_matrix import (deviation_matrix,
                                              run_fusion_sequence,
                                              scene_error_mm)
from surfelmeshing_tpu.io.synthetic import SCENES, TRAJECTORIES


def test_scene_registry_complete():
    assert set(SCENES) >= {"default", "occlusion", "thin", "corner"}
    assert set(TRAJECTORIES) >= {"arc", "lookaway", "push"}


def test_hostile_scene_deviations_bounded():
    """tpu_defaults vs all-reference-exact on occlusion-edge and
    thin-structure scenes with the look-away trajectory: relative accuracy
    loss must stay under 5% (VERDICT r2 #6 criterion)."""
    # CI endpoints only (defaults vs everything-exact): each extra mode
    # costs a full XLA compile per scene; the per-deviation isolation runs
    # in the full matrix tool (PERF.md table; VERDICT r3 #8).
    from surfelmeshing_tpu.eval.ab_matrix import MODES
    endpoints = tuple(m for m in MODES if m[0] in ("tpu_defaults",
                                                   "exact_all"))
    matrix = deviation_matrix(
        frames=5, width=64, height=48, capacity=16384,
        scenes=("occlusion", "thin"), trajectories=("lookaway",),
        modes=endpoints)
    for key, row in matrix.items():
        exact = row["exact_all"]
        assert exact < 5.0, (key, row)              # sane reconstruction
        for mode, err in row.items():
            rel = abs(err - exact) / max(exact, 1e-9)
            assert rel <= 0.05, (key, mode, err, exact)


def test_lookaway_revisit_reconstructs():
    """The look-away trajectory leaves and re-enters the scene; fusion must
    keep a coherent map through the revisit (active-window re-entry)."""
    from surfelmeshing_tpu.ops.fusion import FusionParams

    params = FusionParams(
        width=64, height=48, fx=1.0, fy=1.0, cx=0.0, cy=0.0,
        depth_scaling=5000.0, do_blending=True,
        regularization_iterations=1)
    state, seq = run_fusion_sequence(params, 16384, frames=8, width=64,
                                     height=48, scene="corner",
                                     trajectory="lookaway")
    assert int(state.surfel_count) > 500
    assert scene_error_mm(state, seq) < 5.0
