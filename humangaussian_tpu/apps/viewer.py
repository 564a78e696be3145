"""Browser live viewer for trained avatars (network-GUI analogue).

The reference ships two interactive viewers: a socket server the SIBR
binary connects to (gaussiansplatting/gaussian_renderer/network_gui.py)
and a dearpygui desktop app (animation.py:487-931). Both are
CUDA/desktop-bound; the TPU-native analogue is a dependency-free HTTP
viewer: a stdlib http.server thread serves a small orbit-controls page
and renders frames on demand through the tiled rasterizer (device-side),
so a browser pointed at the training host inspects the avatar live.

Usage:
    python -m humangaussian_tpu.apps.viewer --ply last.ply [--port 8600]
or programmatically: ViewerServer(scene).start() inside a train loop
(call `server.update_scene(state.scene)` between steps).
"""
from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html><html><head><title>humangaussian-tpu viewer</title>
<style>body{background:#111;color:#eee;font-family:monospace;text-align:center}
img{image-rendering:auto;border:1px solid #444}</style></head><body>
<h3>humangaussian-tpu live viewer</h3>
<div>azimuth <span id="az">0</span>&deg; elevation <span id="el">15</span>&deg;
 distance <span id="d">2.0</span> &mdash; arrows orbit, +/- zoom, r spins</div>
<img id="view" width="512" height="512"/>
<script>
let az=0, el=15, d=2.0, spin=false;
function refresh(){
  document.getElementById('az').textContent=az.toFixed(0);
  document.getElementById('el').textContent=el.toFixed(0);
  document.getElementById('d').textContent=d.toFixed(2);
  document.getElementById('view').src=
    `/render?azimuth=${az}&elevation=${el}&distance=${d}&t=${Date.now()}`;
}
document.addEventListener('keydown',e=>{
  if(e.key=='ArrowLeft')az-=10; if(e.key=='ArrowRight')az+=10;
  if(e.key=='ArrowUp')el=Math.min(el+5,89); if(e.key=='ArrowDown')el=Math.max(el-5,-89);
  if(e.key=='+')d=Math.max(d-0.1,0.3); if(e.key=='-')d+=0.1;
  if(e.key=='r')spin=!spin; refresh();});
setInterval(()=>{if(spin){az=(az+10)%360; refresh();}},250);
refresh();
</script></body></html>"""


class ViewerServer:
    """Serves / (controls page), /render (PNG frame), /info (JSON)."""

    def __init__(self, scene, port: int = 8600, size: int = 512,
                 sh_degree: int = 0):
        self.port = port
        self.size = size
        self.sh_degree = sh_degree
        self._scene = scene
        self._lock = threading.Lock()
        self._httpd = None
        self._render_fn = None

    def update_scene(self, scene):
        with self._lock:
            self._scene = scene

    # ---- rendering ----------------------------------------------------
    def _render(self, azimuth: float, elevation: float, distance: float):
        import jax.numpy as jnp

        from humangaussian_tpu.core.camera import camera_from_c2w
        from humangaussian_tpu.data.cameras import c2w_from_angles
        from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled

        with self._lock:
            scene = self._scene
        c2w = c2w_from_angles(
            jnp.asarray([elevation]), jnp.asarray([azimuth]),
            jnp.asarray([distance]),
        )[0]
        cam = camera_from_c2w(c2w, 0.8, self.size, self.size)
        out = rasterize_tiled(
            scene.means, scene.scales, scene.quats, scene.features,
            scene.opacities, scene.alive, cam,
            jnp.zeros((3,), jnp.float32), self.sh_degree,
        )
        return np.asarray(out["image"])

    def _png(self, img: np.ndarray) -> bytes:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)
        ).save(buf, "PNG")
        return buf.getvalue()

    # ---- http ---------------------------------------------------------
    def start(self, background: bool = True):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    self._send(200, "text/html", _PAGE.encode())
                elif u.path == "/info":
                    with viewer._lock:
                        n = int(np.asarray(viewer._scene.alive).sum())
                    self._send(200, "application/json",
                               json.dumps({"n_gaussians": n,
                                           "size": viewer.size}).encode())
                elif u.path == "/render":
                    q = parse_qs(u.query)

                    def f(name, default):
                        return float(q.get(name, [default])[0])

                    img = viewer._render(
                        f("azimuth", 0.0), f("elevation", 15.0),
                        f("distance", 2.0),
                    )
                    self._send(200, "image/png", viewer._png(img))
                else:
                    self._send(404, "text/plain", b"not found")

        self._httpd = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        self.port = self._httpd.server_address[1]
        if background:
            t = threading.Thread(target=self._httpd.serve_forever,
                                 daemon=True)
            t.start()
        else:
            self._httpd.serve_forever()
        return self

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ply", required=True)
    parser.add_argument("--port", type=int, default=8600)
    parser.add_argument("--size", type=int, default=512)
    args = parser.parse_args(argv)

    from humangaussian_tpu.io.ply import load_ply

    scene = load_ply(args.ply)
    server = ViewerServer(scene, port=args.port, size=args.size)
    print(f"viewer at http://localhost:{args.port}/ (ctrl-c to stop)")
    server.start(background=False)


if __name__ == "__main__":
    main()
