"""Live browser viewer: interactive orbit navigation over the streaming
reconstruction.

The reference opens a Qt/OpenGL window with mouse orbit controls and live
cloud/mesh updates (surfel_meshing_render_window.{h,cc}:195-430).  This
machine is headless, so the equivalent capability is served to a browser: a
background HTTP server exposes a self-contained WebGL2 viewer page and a
binary snapshot endpoint the page polls; the app pushes new surfel/mesh
snapshots as reconstruction progresses.

Endpoints:
  /          the viewer page (vanilla WebGL2, no external assets)
  /mesh      latest snapshot: little-endian header
             [version u32, num_vertices u32, num_triangles u32,
              mesh_surfel_count u32]
             + positions f32[num_vertices,3] + colors u8[num_vertices,3]
             (padded to 4-byte alignment) + indices u32[num_triangles,3]
  /version   current snapshot version as text (cheap poll)
"""

from __future__ import annotations

import os
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_HTML_PATH = os.path.join(os.path.dirname(__file__), "live_viewer.html")


class LiveViewerServer:
    def __init__(self, port: int = 8890, host: str = "127.0.0.1"):
        self._lock = threading.Lock()
        self._payload = self._encode(np.zeros((0, 3), np.float32),
                                     np.zeros((0, 3), np.uint8),
                                     np.zeros((0, 3), np.uint32), 0, 0)
        self._version = 0

        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # silence request logging
                pass

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    with open(_HTML_PATH, "rb") as f:
                        body = f.read()
                    self._reply(200, "text/html", body)
                elif self.path == "/mesh":
                    with viewer._lock:
                        body = viewer._payload
                    self._reply(200, "application/octet-stream", body)
                elif self.path == "/version":
                    with viewer._lock:
                        body = str(viewer._version).encode()
                    self._reply(200, "text/plain", body)
                else:
                    self._reply(404, "text/plain", b"not found")

            def _reply(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()

    @staticmethod
    def _encode(positions, colors, triangles, mesh_surfel_count, version):
        positions = np.ascontiguousarray(positions, np.float32)
        colors = np.ascontiguousarray(colors, np.uint8)
        triangles = np.ascontiguousarray(triangles, np.uint32)
        n = len(positions)
        header = struct.pack("<4I", version, n, len(triangles),
                             mesh_surfel_count)
        col_bytes = colors.tobytes()
        pad = (-len(col_bytes)) % 4
        return b"".join([header, positions.tobytes(),
                         col_bytes, b"\0" * pad, triangles.tobytes()])

    def update(self, positions, colors, triangles,
               mesh_surfel_count: int) -> None:
        """Publish a new snapshot.  NaN vertices (merged surfels) are kept —
        the client skips non-finite splats and WebGL culls NaN triangles —
        so indices stay valid without remapping."""
        with self._lock:
            self._version += 1
            self._payload = self._encode(positions, colors, triangles,
                                         mesh_surfel_count, self._version)

    def close(self) -> None:
        self._server.shutdown()
        self._thread.join(timeout=10)
