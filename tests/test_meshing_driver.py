"""Tests for the asynchronous meshing driver (double-buffered snapshot
protocol mirroring asynchronous_meshing.{h,cc})."""

import time

import numpy as np

from surfelmeshing_tpu.meshing.driver import MeshingDriver

from test_meshing import plane_surfels


def test_async_submit_and_output():
    driver = MeshingDriver()
    pos, radius_sq, normals, stamps = plane_surfels(800, seed=0)
    driver.submit(pos, radius_sq, normals, stamps, 800, frame_index=0)
    driver.drain()
    out = driver.get_output()
    assert out is not None
    frame_index, count, tris = out
    assert frame_index == 0
    assert count == 800
    assert len(tris) > 300
    # Output is consumed once (GetOutput semantics, main.cc:1312).
    assert driver.get_output() is None
    driver.finish()


def test_latest_snapshot_wins():
    """Rapid-fire snapshots are drained in one batch before triangulating:
    the mesher always ends an iteration on the freshest fusion state (the
    reference's double buffer keeps only the newest; the FIFO here must
    never drop one — delta snapshots are not replayable)."""
    driver = MeshingDriver()
    pos, radius_sq, normals, stamps = plane_surfels(1500, seed=1)
    # Rapid-fire 5 snapshots; intermediate ones may be dropped.
    for i in range(5):
        stamps2 = np.full(len(pos), i, np.uint32)
        driver.submit(pos, radius_sq, normals, stamps2, 1500, frame_index=i)
    driver.drain()
    out = driver.peek_output()
    assert out is not None
    assert out[0] >= 1  # a late snapshot was meshed
    driver.finish()


def test_idle_signalling():
    driver = MeshingDriver()
    assert driver.idle()
    pos, radius_sq, normals, stamps = plane_surfels(2000, seed=2)
    driver.submit(pos, radius_sq, normals, stamps, 2000, frame_index=0)
    driver.drain(timeout=60)
    assert driver.idle()
    driver.finish()


def test_incremental_updates_through_driver():
    driver = MeshingDriver()
    pos, radius_sq, normals, stamps = plane_surfels(600, seed=3)
    driver.submit(pos, radius_sq, normals, stamps, 600, 0)
    driver.drain()
    t1 = driver.engine.triangle_count

    # Grow the cloud.
    pos2, radius2, normals2, _ = plane_surfels(900, seed=3)
    driver.submit(pos2, radius2, normals2, np.full(900, 1, np.uint32), 900, 1)
    driver.drain()
    t2 = driver.engine.triangle_count
    assert t2 > t1
    assert driver.engine.surfel_count == 900
    driver.finish()


def test_delta_snapshots_match_full():
    """Feeding the engine changed-rows-only deltas (integrate_delta) must
    produce the same surfels and triangles as full snapshots — the delta
    producer (fusion.meshing_snapshot_delta) ships every row whose
    stamp/merge state could have changed, and the engine applies updates
    and dense appends identically either way."""
    from surfelmeshing_tpu.meshing.engine import MeshingEngine

    rng = np.random.default_rng(9)
    pos, radius_sq, normals, stamps = plane_surfels(1200, seed=3)

    full = MeshingEngine()
    delta = MeshingEngine()

    n0 = 700
    # Frame 0: initial population (delta path: all rows are "new").
    full.integrate(0, pos[:n0], radius_sq[:n0], normals[:n0], stamps[:n0])
    delta.integrate_delta(0, np.arange(n0, dtype=np.uint32), pos[:n0],
                          radius_sq[:n0], normals[:n0], stamps[:n0], n0)
    for eng in (full, delta):
        eng.check_remeshing()
        eng.triangulate()

    # Frame 1: move a random subset, merge a few, append the rest.
    moved = rng.choice(n0, 150, replace=False)
    pos2 = pos.copy()
    pos2[moved] += rng.normal(0, 1e-4, (150, 3)).astype(np.float32)
    rad2 = radius_sq.copy()
    merged = moved[:10]
    rad2[merged] = -1.0
    stamps2 = stamps.copy()
    stamps2[moved] = 1
    n1 = 1200

    full.integrate(1, pos2[:n1], rad2[:n1], normals[:n1], stamps2[:n1])
    dirty = np.concatenate([np.sort(moved), np.arange(n0, n1)]).astype(
        np.uint32)
    delta.integrate_delta(1, dirty, pos2[dirty], rad2[dirty], normals[dirty],
                          stamps2[dirty], n1)
    for eng in (full, delta):
        eng.check_remeshing()
        eng.triangulate()

    assert full.surfel_count == delta.surfel_count == n1
    assert full.merged_surfel_count == delta.merged_surfel_count
    tf = {tuple(t) for t in full.get_triangles()}
    td = {tuple(t) for t in delta.get_triangles()}
    assert tf == td
    assert len(tf) > 300
