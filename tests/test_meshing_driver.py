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
    """Pending snapshots are replaced, not queued: the mesher always works on
    the freshest fusion state (CUDASurfelsCPU double-buffer semantics)."""
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
