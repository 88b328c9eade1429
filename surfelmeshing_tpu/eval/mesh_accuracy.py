"""Mesh-accuracy evaluation against a ground-truth model.

Implements the ICL-NUIM-style accuracy metric (BASELINE config 4): mean /
median / RMS distance from reconstructed surface points to the ground-truth
surface, plus completeness (fraction of ground-truth samples within a
tolerance of the reconstruction).  The reference repo itself ships no
evaluation code; this reproduces the standard SurfelMeshing paper protocol.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class AccuracyResult:
    mean: float
    median: float
    rms: float
    max: float
    completeness: float        # fraction of GT samples covered
    n_points: int

    def as_dict(self):
        return dataclasses.asdict(self)


def sample_mesh_surface(vertices: np.ndarray, triangles: np.ndarray,
                        samples_per_area: float = 1e6,
                        max_samples: int = 2_000_000,
                        seed: int = 0) -> np.ndarray:
    """Uniformly sample points on a triangle mesh (area-weighted)."""
    v = np.asarray(vertices, np.float64)
    t = np.asarray(triangles, np.int64)
    a, b, c = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    total_area = areas.sum()
    n = int(min(max_samples, max(len(t), total_area * samples_per_area)))
    rng = np.random.default_rng(seed)
    tri_idx = rng.choice(len(t), size=n, p=areas / total_area)
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    w0 = 1.0 - r1
    w1 = r1 * (1.0 - r2)
    w2 = r1 * r2
    return (w0[:, None] * a[tri_idx] + w1[:, None] * b[tri_idx] +
            w2[:, None] * c[tri_idx])


def evaluate_accuracy(reconstructed_points: np.ndarray,
                      gt_points: np.ndarray,
                      completeness_tolerance: float = 0.01,
                      trim_percentile: Optional[float] = None
                      ) -> AccuracyResult:
    """Distances from reconstruction to ground truth + completeness.

    reconstructed_points: (N, 3) surfel/vertex positions.
    gt_points: (M, 3) dense samples of the ground-truth surface.
    """
    from scipy.spatial import cKDTree

    rec = np.asarray(reconstructed_points, np.float64)
    rec = rec[np.isfinite(rec).all(axis=1)]
    gt = np.asarray(gt_points, np.float64)

    gt_tree = cKDTree(gt)
    d_rec_to_gt, _ = gt_tree.query(rec, k=1)
    if trim_percentile is not None:
        cut = np.percentile(d_rec_to_gt, trim_percentile)
        d_rec_to_gt = d_rec_to_gt[d_rec_to_gt <= cut]

    rec_tree = cKDTree(rec)
    d_gt_to_rec, _ = rec_tree.query(gt, k=1)
    completeness = float((d_gt_to_rec <= completeness_tolerance).mean())

    return AccuracyResult(
        mean=float(d_rec_to_gt.mean()),
        median=float(np.median(d_rec_to_gt)),
        rms=float(np.sqrt((d_rec_to_gt ** 2).mean())),
        max=float(d_rec_to_gt.max()),
        completeness=completeness,
        n_points=int(len(rec)),
    )


def load_obj_vertices_triangles(path: str):
    """Minimal OBJ reader for ground-truth models (v / f lines)."""
    vertices = []
    triangles = []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                vertices.append([float(parts[1]), float(parts[2]),
                                 float(parts[3])])
            elif line.startswith("f "):
                idx = [int(p.split("/")[0]) - 1 for p in line.split()[1:]]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    triangles.append([idx[0], idx[k], idx[k + 1]])
    return (np.asarray(vertices, np.float64),
            np.asarray(triangles, np.int64))
