"""Standalone map visualizer node.

TPU-native analogue of the reference's ``visualizer_node``
(reference: ros/open3d_slam_ros/src/visualizer_node.cpp:20-60 — loads a
PCD map and republishes it periodically for RViz).  Without ROS, the
"topic" is an HTTP endpoint: this node serves a map file or a live
visualization bundle directory (the output of
``SlamWrapper.start_visualization``) so any viewer or downstream tool can
poll the latest complete artifacts.  stdlib-only (http.server).

Usage:
    python -m open3d_slam_advanced_rss_2024_public_tpu.frontends.visualizer_node \
        --dir /path/to/viz_bundle --port 8008
    python -m ...visualizer_node --map map.pcd --port 8008
"""
from __future__ import annotations

import argparse
import functools
import html
import http.server
import os
import shutil
import sys
import tempfile
import threading


class _BundleHandler(http.server.SimpleHTTPRequestHandler):
    """Serves the bundle directory with a minimal auto-refreshing index."""

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            entries = sorted(os.listdir(self.directory))
            rows = "".join(
                f'<li><a href="/{html.escape(e)}">{html.escape(e)}</a> '
                f'({os.path.getsize(os.path.join(self.directory, e))} B)</li>'
                for e in entries if ".tmp" not in e)
            body = (f"<html><head><meta http-equiv=refresh content=2>"
                    f"<title>open3d_slam map</title></head><body>"
                    f"<h3>Live SLAM visualization bundle</h3>"
                    f"<ul>{rows}</ul></body></html>").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        super().do_GET()


def serve(directory: str, port: int = 8008, background: bool = False,
          host: str = "127.0.0.1"):
    """Serve ``directory`` on ``host:port``; returns the server (background
    mode) or blocks forever.  Binds loopback by default (ADVICE r4: the
    bundle exposes the live map — pass host="0.0.0.0" explicitly to serve
    other interfaces)."""
    handler = functools.partial(_BundleHandler, directory=directory)
    server = http.server.ThreadingHTTPServer((host, port), handler)
    if background:
        t = threading.Thread(target=server.serve_forever, daemon=True,
                             name="viz-http")
        t.start()
        return server
    print(f"serving {directory} on http://{host}:{port}", file=sys.stderr)
    server.serve_forever()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--dir", help="live visualization bundle directory")
    g.add_argument("--map", help="single map file (pcd/ply) to serve")
    ap.add_argument("--port", type=int, default=8008)
    ap.add_argument("--host", default="127.0.0.1",
                    help="bind address (default loopback; use 0.0.0.0 to "
                         "expose on all interfaces)")
    args = ap.parse_args(argv)
    if args.map:
        d = tempfile.mkdtemp(prefix="o3dslam_viz_")
        shutil.copy(args.map, os.path.join(d, os.path.basename(args.map)))
        serve(d, args.port, host=args.host)
    else:
        serve(args.dir, args.port, host=args.host)


if __name__ == "__main__":
    main()
