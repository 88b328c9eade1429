"""Tests for the native meshing engine, mirroring the reference's test
strategy (test_octree.cc: brute-force NN oracle; test_triangulation.cc:
synthetic surfels through the meshing path + state self-check oracle)."""

import numpy as np
import pytest

from surfelmeshing_tpu.meshing.engine import MeshingEngine


def plane_surfels(n=1000, seed=0, extent=1.0, z=0.0):
    rng = np.random.default_rng(seed)
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = rng.uniform(0, extent, n)
    pos[:, 1] = rng.uniform(0, extent, n)
    pos[:, 2] = z
    # Radius ~ local sample spacing for a uniform distribution.
    spacing = extent / np.sqrt(n)
    radius_sq = np.full(n, (2.0 * spacing) ** 2, np.float32)
    normals = np.tile(np.array([0, 0, -1], np.float32), (n, 1))
    stamps = np.zeros(n, np.uint32)
    return pos, radius_sq, normals, stamps


class TestNeighborSearch:
    def test_matches_brute_force(self):
        """Radius-limited kNN vs. brute force (test_octree.cc:116-143)."""
        pos, radius_sq, normals, stamps = plane_surfels(500, seed=1)
        # Perturb into 3D so the grid has depth structure.
        rng = np.random.default_rng(2)
        pos[:, 2] = rng.uniform(0, 0.3, len(pos)).astype(np.float32)
        eng = MeshingEngine()
        eng.integrate(0, pos, radius_sq, normals, stamps)

        for trial in range(50):
            q = rng.uniform(0, 1, 3).astype(np.float32)
            q[2] *= 0.3
            r_sq = float(rng.uniform(0.001, 0.05))
            dist, idx = eng.find_neighbors(q, r_sq, max_count=64)

            d_all = np.sum((pos - q) ** 2, axis=1)
            want = np.where(d_all <= r_sq)[0]
            want = want[np.argsort(d_all[want], kind="stable")][:64]
            assert len(idx) == len(want)
            # Same distances in the same order (indices may tie-swap).
            np.testing.assert_allclose(dist, d_all[want], rtol=1e-5)
            assert set(idx.tolist()) == set(want.tolist())

    def test_result_sorted(self):
        pos, radius_sq, normals, stamps = plane_surfels(200, seed=3)
        eng = MeshingEngine()
        eng.integrate(0, pos, radius_sq, normals, stamps)
        dist, idx = eng.find_neighbors(pos[0], 0.5, max_count=64)
        assert np.all(np.diff(dist) >= 0)


class TestTriangulation:
    def test_plane_triangulation(self):
        """1000 coplanar surfels triangulate into a consistent mesh
        (test_triangulation.cc:38-155)."""
        pos, radius_sq, normals, stamps = plane_surfels(1000, seed=0)
        eng = MeshingEngine()
        eng.integrate(0, pos, radius_sq, normals, stamps)
        eng.check_remeshing()
        eng.triangulate()

        assert eng.triangle_count > 500
        tris = eng.get_triangles()
        assert tris.shape[1] == 3
        assert tris.max() < 1000
        # No degenerate triangles.
        assert np.all(tris[:, 0] != tris[:, 1])
        assert np.all(tris[:, 1] != tris[:, 2])
        assert np.all(tris[:, 0] != tris[:, 2])

        # Most interior surfels participate in the mesh.
        states = np.array([eng.meshing_state(i) for i in range(1000)])
        assert (states != MeshingEngine.FREE).mean() > 0.8

        # Self-check oracle: stored state/front consistency per surfel.
        mismatches = sum(eng.check_surfel_state(i) for i in range(1000))
        assert mismatches <= 20  # small tolerance, like reference counters

    def test_triangle_orientation(self):
        """Triangles are CCW as seen against the normal direction."""
        pos, radius_sq, normals, stamps = plane_surfels(400, seed=5)
        eng = MeshingEngine()
        eng.integrate(0, pos, radius_sq, normals, stamps)
        eng.check_remeshing()
        eng.triangulate()
        tris = eng.get_triangles()
        a = pos[tris[:, 0]]
        b = pos[tris[:, 1]]
        c = pos[tris[:, 2]]
        cross_z = np.cross(b - a, c - a)[:, 2]
        # Surfel normal is (0,0,-1); CCW from the front side means the
        # triangle normal has negative z.
        frac_consistent = (cross_z < 0).mean()
        assert frac_consistent > 0.95

    def test_full_retriangulation(self):
        pos, radius_sq, normals, stamps = plane_surfels(500, seed=6)
        eng = MeshingEngine()
        eng.integrate(0, pos, radius_sq, normals, stamps)
        eng.check_remeshing()
        eng.triangulate()
        n1 = eng.triangle_count
        eng.full_retriangulation()
        n2 = eng.triangle_count
        assert n1 > 200 and n2 > 200


class TestIncremental:
    def test_moved_surfels_trigger_remesh(self):
        pos, radius_sq, normals, stamps = plane_surfels(600, seed=7)
        eng = MeshingEngine()
        eng.integrate(0, pos, radius_sq, normals, stamps)
        eng.check_remeshing()
        eng.triangulate()
        n1 = eng.triangle_count

        # Move a patch of surfels far off the plane -> long edges remeshed.
        pos2 = pos.copy()
        patch = (pos[:, 0] < 0.3) & (pos[:, 1] < 0.3)
        pos2[patch, 2] += 0.5
        stamps2 = np.full(len(pos), 1, np.uint32)
        eng.integrate(1, pos2, radius_sq, normals, stamps2)
        eng.check_remeshing()
        assert eng.deleted_triangle_count > 0
        eng.triangulate()
        # The mesh heals: still a large triangle count.
        assert eng.triangle_count > 0.5 * n1

    def test_merged_surfels_removed(self):
        pos, radius_sq, normals, stamps = plane_surfels(300, seed=8)
        eng = MeshingEngine()
        eng.integrate(0, pos, radius_sq, normals, stamps)
        eng.check_remeshing()
        eng.triangulate()

        radius2 = radius_sq.copy()
        radius2[:50] = -1.0  # tombstoned by fusion merge
        eng.integrate(1, pos, radius2, normals,
                      np.full(len(pos), 1, np.uint32))
        eng.check_remeshing()
        eng.triangulate()
        assert eng.merged_surfel_count == 50
        tris = eng.get_triangles()
        # No triangle references a merged surfel.
        assert not np.isin(tris, np.arange(50)).any()

    def test_new_surfels_appended(self):
        pos, radius_sq, normals, stamps = plane_surfels(300, seed=9)
        eng = MeshingEngine()
        eng.integrate(0, pos, radius_sq, normals, stamps)
        eng.check_remeshing()
        eng.triangulate()

        pos2, radius2, normals2, _ = plane_surfels(500, seed=9)
        stamps2 = np.full(500, 1, np.uint32)
        eng.integrate(1, pos2, radius2, normals2, stamps2)
        eng.check_remeshing()
        eng.triangulate()
        assert eng.surfel_count == 500
        tris = eng.get_triangles()
        # New surfels are meshed in.
        assert tris.max() >= 300


class TestAdversarial:
    def test_nasty_points(self):
        """Clustered, duplicated, and extreme points must not crash or
        corrupt state (test_octree.cc 'nasty points' pattern)."""
        rng = np.random.default_rng(4)
        pos = rng.uniform(0, 1, (300, 3)).astype(np.float32)
        pos[50:60] = pos[40]            # exact duplicates
        pos[60:70] = pos[40] + 1e-7     # near-duplicates
        pos[70] = [1e4, 1e4, 1e4]       # far outlier
        pos[71] = [-1e4, -1e4, -1e4]
        radius_sq = np.full(300, 0.02 ** 2, np.float32)
        normals = np.tile(np.array([0, 0, -1], np.float32), (300, 1))
        stamps = np.zeros(300, np.uint32)

        eng = MeshingEngine()
        eng.integrate(0, pos, radius_sq, normals, stamps)
        eng.check_remeshing()
        eng.triangulate()
        tris = eng.get_triangles()
        if len(tris):
            assert np.all(tris[:, 0] != tris[:, 1])
            assert np.all(tris[:, 1] != tris[:, 2])
        # Engine stays queryable.
        dist, idx = eng.find_neighbors(pos[40], 0.01, max_count=64)
        assert len(idx) >= 10

    def test_remove_all(self):
        """Tombstoning every surfel empties the mesh (remove-all pattern)."""
        pos, radius_sq, normals, stamps = plane_surfels(400, seed=12)
        eng = MeshingEngine()
        eng.integrate(0, pos, radius_sq, normals, stamps)
        eng.check_remeshing()
        eng.triangulate()
        assert eng.triangle_count > 100

        dead = np.full(400, -1.0, np.float32)
        eng.integrate(1, pos, dead, normals, np.full(400, 1, np.uint32))
        eng.check_remeshing()
        eng.triangulate()
        assert eng.triangle_count == 0
        assert eng.merged_surfel_count == 400
        dist, idx = eng.find_neighbors(pos[0], 1.0, max_count=64)
        assert len(idx) == 0

    def test_curved_surface(self):
        """Sphere-patch triangulation with varying normals."""
        rng = np.random.default_rng(13)
        n = 800
        theta = rng.uniform(0.2, 0.8, n)     # polar
        phi = rng.uniform(0, 1.2, n)
        r = 1.0
        pos = np.stack([r * np.sin(theta) * np.cos(phi),
                        r * np.sin(theta) * np.sin(phi),
                        r * np.cos(theta)], axis=1).astype(np.float32)
        normals = -pos / np.linalg.norm(pos, axis=1, keepdims=True)
        normals = normals.astype(np.float32)
        spacing = 1.2 / np.sqrt(n)
        radius_sq = np.full(n, (2.5 * spacing) ** 2, np.float32)
        stamps = np.zeros(n, np.uint32)

        eng = MeshingEngine()
        eng.integrate(0, pos, radius_sq, normals, stamps)
        eng.check_remeshing()
        eng.triangulate()
        assert eng.triangle_count > 400
        states = np.array([eng.meshing_state(i) for i in range(n)])
        assert (states != MeshingEngine.FREE).mean() > 0.7


class TestDebugTriangulationKeys:
    """The y/e per-surfel debug-triangulation keys (main.cc:1609-1627):
    y = QueueForRemesh + Triangulate(force_debug), e = RemeshTrianglesAt +
    Triangulate(force_debug)."""

    def _triangulated_plane(self):
        pos, radius_sq, normals, stamps = plane_surfels(600, seed=7)
        eng = MeshingEngine()
        eng.integrate(0, pos, radius_sq, normals, stamps)
        eng.check_remeshing()
        eng.triangulate()
        return eng

    def test_surfel_info(self):
        eng = self._triangulated_plane()
        info = eng.surfel_info(0)
        assert info is not None
        assert info["radius_sq"] > 0
        assert np.isfinite(info["position"]).all()
        assert info["state"] in (0, 1, 2)
        assert eng.surfel_info(10**6) is None

    def test_y_key_requeues_and_retriangulates(self):
        eng = self._triangulated_plane()
        # Pick a completed interior surfel.
        sel = next(i for i in range(600)
                   if eng.surfel_info(i)["state"] == 2)
        before = eng.triangle_count
        eng.queue_for_remesh(sel)
        eng.triangulate()
        assert eng.check_surfel_state(sel) == 0
        assert eng.triangle_count >= before - 5

    def test_e_key_remeshes_neighborhood(self):
        eng = self._triangulated_plane()
        sel = next(i for i in range(600)
                   if eng.surfel_info(i)["triangles"] > 2)
        before = eng.triangle_count
        eng.remesh_triangles_at(sel)
        # The reset frees the neighborhood's triangles...
        assert eng.triangle_count < before
        # ...and the queued debug triangulation rebuilds them.
        eng.triangulate()
        assert eng.triangle_count > 0.9 * before
        assert eng.check_surfel_state(sel) == 0

    def test_app_helper_and_viewer_actions(self):
        """debug_triangulate_surfel drives the engine through the same path
        the terminal/browser keys use, and the live viewer queues browser
        actions."""
        from surfelmeshing_tpu.app.main import debug_triangulate_surfel

        class _FakeMesher:
            def __init__(self, eng):
                self.engine = eng

            def drain(self):
                pass

        eng = self._triangulated_plane()
        assert debug_triangulate_surfel(_FakeMesher(eng), "y", 3)
        assert debug_triangulate_surfel(_FakeMesher(eng), "e", 3)
        assert not debug_triangulate_surfel(_FakeMesher(eng), "y", 10**7)

        from urllib.request import urlopen

        from surfelmeshing_tpu.viewer.live import LiveViewerServer
        viewer = LiveViewerServer(port=0)
        try:
            base = f"http://127.0.0.1:{viewer.port}"
            assert urlopen(f"{base}/select?i=5").read() == b"ok"
            assert viewer.selected_surfel == 5
            assert urlopen(f"{base}/action?k=e&i=5").read() == b"ok"
            assert viewer.poll_actions() == [("e", 5)]
            assert viewer.poll_actions() == []
            # The debug-line publish path used for neighborhood rendering.
            segs = np.zeros((4, 2, 3), np.float32)
            viewer.update_debug_lines([(segs, (255, 255, 0))])
            body = urlopen(f"{base}/debug").read()
            assert len(body) == 4 + 8 + 4 * 24
        finally:
            viewer.close()
