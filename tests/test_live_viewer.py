"""Live browser viewer: HTTP endpoints + binary snapshot protocol."""

import struct
import urllib.request

import numpy as np

from surfelmeshing_tpu.viewer.live import LiveViewerServer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return r.read()


def test_endpoints_and_snapshot_roundtrip():
    server = LiveViewerServer(port=0)
    try:
        html = _get(server.port, "/")
        assert b"webgl2" in html.lower()
        assert _get(server.port, "/version") == b"0"

        pos = np.arange(12, dtype=np.float32).reshape(4, 3)
        col = np.arange(12, dtype=np.uint8).reshape(4, 3)
        tris = np.array([[0, 1, 2], [1, 2, 3]], np.uint32)
        pose = np.arange(12, dtype=np.float32).reshape(3, 4)
        segs = np.arange(18, dtype=np.float32).reshape(3, 2, 3)
        server.update(pos, col, tris, mesh_surfel_count=3, pose=pose,
                      debug_lines=[(segs, (255, 0, 0))])

        assert _get(server.port, "/version") == b"1"
        # Follow-camera pose endpoint: 12 floats, row-major 3x4.
        got_pose = np.array(
            [float(v) for v in _get(server.port, "/pose").split()])
        np.testing.assert_allclose(got_pose.reshape(3, 4), pose)
        # Debug line endpoint: one red set of 3 segments.
        dbg = _get(server.port, "/debug")
        n_sets, = struct.unpack_from("<I", dbg, 0)
        assert n_sets == 1
        cnt, r, g, b, _pad = struct.unpack_from("<I4B", dbg, 4)
        assert (cnt, r, g, b) == (3, 255, 0, 0)
        got_segs = np.frombuffer(dbg, np.float32, 18, 12).reshape(3, 2, 3)
        np.testing.assert_array_equal(got_segs, segs)
        buf = _get(server.port, "/mesh")
        version, nv, nt, ms = struct.unpack_from("<4I", buf, 0)
        assert (version, nv, nt, ms) == (1, 4, 2, 3)
        off = 16
        got_pos = np.frombuffer(buf, np.float32, nv * 3, off).reshape(nv, 3)
        np.testing.assert_array_equal(got_pos, pos)
        off += nv * 12
        got_col = np.frombuffer(buf, np.uint8, nv * 3, off).reshape(nv, 3)
        np.testing.assert_array_equal(got_col, col)
        off += (nv * 3 + 3) & ~3
        got_tris = np.frombuffer(buf, np.uint32, nt * 3, off).reshape(nt, 3)
        np.testing.assert_array_equal(got_tris, tris)
    finally:
        server.close()


def test_app_flag_serves_viewer(tmp_path):
    """--live_viewer through the CLI serves during a run."""
    import threading

    from surfelmeshing_tpu.app.main import run
    from surfelmeshing_tpu.config import config_from_args
    from surfelmeshing_tpu.io.synthetic import write_tum_dataset

    ds = write_tum_dataset(str(tmp_path / "tum"), num_frames=6,
                           width=64, height=48)
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        cfg = config_from_args([
            "--max_surfel_count", "60000",
            "--outlier_filtering_frame_count", "2",
            "--depth_erosion_radius", "1",
            "--depth_valid_region_radius", "1000",
            "--restrict_fps_to", "0", "--exit_after_processing",
            "--live_viewer", "18931", ds, "groundtruth.txt"])
        probe = {}

        def prober():
            import time
            for _ in range(600):
                try:
                    probe["html"] = _get(18931, "/")
                    probe["mesh"] = _get(18931, "/mesh")
                    if struct.unpack_from("<4I", probe["mesh"], 0)[1] > 0:
                        return
                except Exception:
                    pass
                time.sleep(0.2)

        t = threading.Thread(target=prober)
        t.start()
        assert run(cfg) == 0
        t.join(timeout=30)
        assert b"canvas" in probe.get("html", b"")
        assert struct.unpack_from("<4I", probe["mesh"], 0)[1] > 0
    finally:
        os.chdir(cwd)
