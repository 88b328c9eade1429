"""Tests for the mesh-accuracy evaluation (ICL-NUIM-style protocol)."""

import numpy as np

from surfelmeshing_tpu.eval.mesh_accuracy import (AccuracyResult,
                                                  evaluate_accuracy,
                                                  load_obj_vertices_triangles,
                                                  point_to_mesh_distance,
                                                  sample_mesh_surface)
from surfelmeshing_tpu.io.mesh_io import write_obj


def _ref_point_triangle(p, a, b, c):
    """Scalar closest-point-on-triangle (Ericson RTCD 5.1.5) oracle."""
    ab, ac, ap = b - a, c - a, p - a
    d1, d2 = ab @ ap, ac @ ap
    if d1 <= 0 and d2 <= 0:
        return np.linalg.norm(p - a)
    bp = p - b
    d3, d4 = ab @ bp, ac @ bp
    if d3 >= 0 and d4 <= d3:
        return np.linalg.norm(p - b)
    vc = d1 * d4 - d3 * d2
    if vc <= 0 and d1 >= 0 and d3 <= 0:
        return np.linalg.norm(p - (a + d1 / (d1 - d3) * ab))
    cp = p - c
    d5, d6 = ab @ cp, ac @ cp
    if d6 >= 0 and d5 <= d6:
        return np.linalg.norm(p - c)
    vb = d5 * d2 - d1 * d6
    if vb <= 0 and d2 >= 0 and d6 <= 0:
        return np.linalg.norm(p - (a + d2 / (d2 - d6) * ac))
    va = d3 * d6 - d5 * d4
    if va <= 0 and (d4 - d3) >= 0 and (d5 - d6) >= 0:
        t = (d4 - d3) / ((d4 - d3) + (d5 - d6))
        return np.linalg.norm(p - (b + t * (c - b)))
    denom = 1.0 / (va + vb + vc)
    return np.linalg.norm(p - (a + ab * (vb * denom) + ac * (vc * denom)))


def test_point_to_mesh_distance_exact():
    """Vectorized point->mesh distance must match the scalar Ericson
    closest-point oracle over every triangle (all 7 Voronoi regions hit by
    random geometry)."""
    rng = np.random.default_rng(3)
    v = rng.normal(0, 1, (25, 3))
    t = rng.integers(0, 25, (50, 3))
    t = t[(t[:, 0] != t[:, 1]) & (t[:, 1] != t[:, 2]) & (t[:, 0] != t[:, 2])]
    p = rng.normal(0, 1.5, (300, 3))
    got = point_to_mesh_distance(p, v, t, k=len(t))
    want = np.array([
        min(_ref_point_triangle(q, v[i], v[j], v[k]) for i, j, k in t)
        for q in p])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def unit_square_mesh():
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64)
    t = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return v, t


def test_surface_sampling_on_plane():
    v, t = unit_square_mesh()
    pts = sample_mesh_surface(v, t, max_samples=5000)
    assert len(pts) == 5000
    assert np.abs(pts[:, 2]).max() < 1e-12
    assert pts[:, 0].min() >= 0 and pts[:, 0].max() <= 1


def test_accuracy_perfect_and_offset():
    v, t = unit_square_mesh()
    gt = sample_mesh_surface(v, t, max_samples=20000)
    rng = np.random.default_rng(0)
    rec = rng.random((5000, 2))
    rec3 = np.concatenate([rec, np.zeros((5000, 1))], axis=1)

    # 5000 random points in a unit square -> NN spacing ~ 0.014, so use a
    # completeness tolerance comfortably above it.
    res = evaluate_accuracy(rec3, gt, completeness_tolerance=0.05)
    assert res.mean < 0.02
    assert res.completeness > 0.95

    rec_off = rec3 + np.array([0, 0, 0.05])
    res_off = evaluate_accuracy(rec_off, gt)
    assert 0.04 < res_off.mean < 0.06
    assert res_off.rms >= res_off.mean

    # NaN (merged) points are excluded.
    rec_nan = rec3.copy()
    rec_nan[:100, 0] = np.nan
    res_nan = evaluate_accuracy(rec_nan, gt)
    assert res_nan.n_points == 4900


def test_obj_roundtrip(tmp_path):
    v, t = unit_square_mesh()
    path = str(tmp_path / "gt.obj")
    write_obj(path, v.astype(np.float32), t)
    v2, t2 = load_obj_vertices_triangles(path)
    assert len(v2) == 4 and len(t2) == 2
    np.testing.assert_allclose(v2, v, atol=1e-6)


def test_evaluate_sequence_app(tmp_path):
    """End-to-end eval app: synthetic dataset vs. its known wall plane."""
    from surfelmeshing_tpu.app.evaluate import evaluate_sequence
    from surfelmeshing_tpu.io.synthetic import write_tum_dataset

    ds = write_tum_dataset(str(tmp_path / "ds"), num_frames=6,
                           width=64, height=48)
    # Ground truth: dense samples of the back wall + floor + sphere.
    rng = np.random.default_rng(0)
    wall = np.stack([rng.uniform(-2, 2, 60000), rng.uniform(-2, 0.8, 60000),
                     np.full(60000, 2.5)], axis=1)
    floor = np.stack([rng.uniform(-2, 2, 30000), np.full(30000, 0.8),
                      rng.uniform(0, 2.5, 30000)], axis=1)
    u = rng.normal(size=(20000, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    sphere = np.array([0.0, 0.3, 1.8]) + 0.35 * u
    gt = np.concatenate([wall, floor, sphere]).astype(np.float32)
    from surfelmeshing_tpu.io.mesh_io import write_ply
    gt_path = str(tmp_path / "gt.ply")
    write_ply(gt_path, gt)

    res = evaluate_sequence(ds, "groundtruth.txt", gt_path,
                            max_surfel_count=32768,
                            outlier_filtering_frame_count=2)
    assert res.n_points > 100
    assert res.median < 0.01   # reconstruction lies on the scene
