"""Per-phase golden test: ops/fusion.py vs the independent NumPy oracle
(tests/golden_fusion.py) implementing the literal CUDA kernel semantics
(kernels.cu:741-1142, 1458-2410) with the repo's documented determinizations.

The fusion step runs eagerly (jax.disable_jit) with fusion._TAP enabled so
every phase boundary map is captured and compared.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from surfelmeshing_tpu.ops import fusion as F
from surfelmeshing_tpu.ops.fusion import (FusionParams, create_surfel_state,
                                          integrate_frame, plant_surfel)
from tests.golden_fusion import Oracle

H, W = 24, 32
FX = FY = 30.0
CX, CY = W / 2 + 0.5, H / 2 + 0.5
SCALE = 5000.0
IDENT = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]], np.float32)

PARAMS = FusionParams(
    width=W, height=H, fx=FX, fy=FY, cx=CX, cy=CY, depth_scaling=SCALE,
    do_blending=True, measurement_blending_radius=6,
    regularization_iterations=1)


def noisy_wall(seed=0, depth_m=2.0, hole=True):
    rng = np.random.default_rng(seed)
    depth = np.full((H, W), SCALE * depth_m, np.float64)
    depth *= 1.0 + 0.004 * rng.standard_normal((H, W))
    depth = depth.astype(np.uint16)
    if hole:
        depth[6:10, 8:14] = 0          # invalid region -> blending borders
    normals = np.zeros((2, H, W), np.float32)
    r = (depth_m / FX) * 1.5
    radius = np.full((H, W), r * r, np.float32)
    color = rng.integers(0, 255, (3, H, W)).astype(np.uint8)
    return depth, normals, radius, color


def run_tapped(state, depth, normals, radius, color, frame, params):
    """Run integrate_frame eagerly with taps; return (new_state, taps)."""
    F._TAP = {}
    try:
        with jax.disable_jit():
            out = integrate_frame(
                state, jnp.asarray(depth), jnp.asarray(normals),
                jnp.asarray(radius), jnp.asarray(color), jnp.asarray(IDENT),
                jnp.asarray(IDENT), jnp.int32(frame), params)
        taps = {k: np.asarray(v) for k, v in F._TAP.items()}
    finally:
        F._TAP = None
    return out, taps


def assert_pack_close(got, want, label):
    __tracebackhide__ = True
    int_cols = [F.STAMP, F.CREATION]
    for c in range(F.PACK_WIDTH):
        g, w_ = got[:, c], want[:, c]
        if c in int_cols:
            np.testing.assert_array_equal(
                g.view(np.int32), w_.view(np.int32),
                err_msg=f"{label} col {c} (int)")
        else:
            np.testing.assert_allclose(
                g, w_, rtol=3e-5, atol=3e-6, err_msg=f"{label} col {c}")


class TestGoldenFusion:
    def _compare_frame(self, state, inputs, frame, params):
        depth, normals, radius, color = inputs
        oracle = Oracle(np.array(state.pack),
                        np.array(state.neighbors).T,   # oracle is (N, 4)
                        int(state.surfel_count), int(state.merge_count),
                        nbr_dist=np.array(state.nbr_dist).T)
        new_state, taps = run_tapped(state, depth, normals, radius, color,
                                     frame, params)
        want = oracle.run_frame(depth, normals, radius, color,
                                IDENT, IDENT, frame, params)

        np.testing.assert_allclose(taps["first_depth"], want["first_depth"],
                                   rtol=1e-6)
        np.testing.assert_array_equal(taps["supporting_surfels"],
                                      want["supporting_surfels"])
        np.testing.assert_array_equal(taps["support_counts"],
                                      want["support_counts"])
        np.testing.assert_allclose(taps["support_depth_sums"],
                                   want["support_depth_sums"], rtol=1e-6)
        np.testing.assert_array_equal(taps["has_conflict"],
                                      want["has_conflict"])
        np.testing.assert_array_equal(taps["merge_mask"], want["merge_mask"])
        if params.do_blending:
            assert np.abs(taps["blended_depth"].astype(np.int64) -
                          want["blended_depth"].astype(np.int64)).max() <= 1
        assert_pack_close(taps["pack_after_integrate"],
                          want["pack_after_integrate"], "after_integrate")
        np.testing.assert_array_equal(taps["neighbors_after_update"].T,
                                      want["neighbors_after_update"])
        assert int(taps["surfel_count_after_create"]) == \
            want["surfel_count_after_create"]
        assert_pack_close(taps["pack_after_create"],
                          want["pack_after_create"], "after_create")
        np.testing.assert_array_equal(taps["neighbors_after_create"].T,
                                      want["neighbors_after_create"])
        assert_pack_close(np.asarray(new_state.pack), want["final_pack"],
                          "final")
        np.testing.assert_array_equal(np.asarray(new_state.neighbors).T,
                                      want["final_neighbors"])
        assert int(new_state.merge_count) == oracle.merge_count
        return new_state

    def test_two_frames_all_phases(self):
        """Creation frame, then a full second frame exercising association,
        support, blending, integration, neighbor update, creation leftovers
        and regularization — every tap must match the oracle."""
        state = create_surfel_state(4096)
        inputs0 = noisy_wall(seed=0)
        state = self._compare_frame(state, inputs0, 0, PARAMS)
        assert int(state.surfel_count) > 100
        inputs1 = noisy_wall(seed=1, hole=False)
        self._compare_frame(state, inputs1, 1, PARAMS)

    def test_conflict_and_merge_paths(self):
        """A floating surfel (conflict-zone decrement) and a near-duplicate
        (merge tombstone) must match the oracle decisions exactly."""
        state = create_surfel_state(4096)
        inputs = noisy_wall(seed=2, hole=False)
        state = self._compare_frame(state, inputs, 0, PARAMS)
        count = int(state.surfel_count)
        # Floating surfel in front of the wall center.
        state = plant_surfel(state, count, pos=[0, 0, 1.0],
                             normal=[0, 0, -1], confidence=1.0,
                             radius_sq=0.001, stamp=0)
        # Near-duplicate of an existing surfel.
        src = count // 2
        p = np.asarray(F.positions(state)[src]) + \
            np.array([1e-5, 0, 0], np.float32)
        state = plant_surfel(
            state, count + 1, pos=p,
            normal=np.asarray(F.normals(state)[src]),
            confidence=1.0, radius_sq=float(F.radii_sq(state)[src]),
            stamp=0)
        state = state._replace(surfel_count=jnp.int32(count + 2))
        state = self._compare_frame(state, inputs, 1, PARAMS)
        assert int(state.merge_count) >= 1

    def test_two_pixel_association_and_no_blending(self):
        """Off-center sub-pixel projection (side-pixel association) with
        blending disabled and 2 regularization iterations."""
        params = dataclasses.replace(PARAMS, do_blending=False,
                                     regularization_iterations=2)
        # A slanted wall makes projections land off pixel centers.
        rng = np.random.default_rng(5)
        ys = np.arange(H)[:, None]
        depth = (SCALE * (1.8 + 0.3 * ys / H) *
                 (1.0 + 0.003 * rng.standard_normal((H, W))))
        depth = depth.astype(np.uint16)
        ny = np.full((H, W), -0.28, np.float32)
        normals = np.stack([np.zeros((H, W), np.float32), ny])
        radius = np.full((H, W), 0.01, np.float32)
        color = rng.integers(0, 255, (3, H, W)).astype(np.uint8)
        inputs = (depth, normals, radius, color)
        state = create_surfel_state(4096)
        state = self._compare_frame(state, inputs, 0, params)
        self._compare_frame(state, inputs, 1, params)
