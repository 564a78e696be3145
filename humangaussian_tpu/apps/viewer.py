"""Browser live viewer for trained avatars (network-GUI analogue).

The reference ships two interactive viewers: a socket server the SIBR
binary connects to (gaussiansplatting/gaussian_renderer/network_gui.py)
and a dearpygui desktop app with SMPL-X pose sliders
(animation.py:487-931). Both are CUDA/desktop-bound; the TPU-native
analogue is a dependency-free HTTP viewer: a stdlib http.server thread
serves a small orbit-controls page and renders frames on demand through
the tiled rasterizer (device-side), so a browser pointed at the
training host inspects the avatar live.

With `--smplx_path` (or an `animator=` passed programmatically) the
viewer becomes a POSE EDITOR — the dearpygui parity feature: per-joint
axis-angle sliders for the 21 SMPL-X body joints plus global orient,
POSTed to /pose and re-posed through the one-time Gaussian<->mesh LBS
binding (animation.py pose sliders / skeleton dragging,
:609-676,700-931).

Usage:
    python -m humangaussian_tpu.apps.viewer --ply last.ply [--port 8600]
        [--smplx_path /path/to/smplx_models]
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

# SMPL-X body joints 1..21 (the 21 body_pose rows), reference order
BODY_JOINTS = (
    "left_hip", "right_hip", "spine1", "left_knee", "right_knee",
    "spine2", "left_ankle", "right_ankle", "spine3", "left_foot",
    "right_foot", "neck", "left_collar", "right_collar", "head",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist",
)

_PAGE = """<!doctype html><html><head><title>humangaussian-tpu viewer</title>
<style>body{background:#111;color:#eee;font-family:monospace;text-align:center}
img{image-rendering:auto;border:1px solid #444}
#pose{margin:8px auto;max-width:560px;display:none}
input[type=range]{width:110px}</style></head><body>
<h3>humangaussian-tpu live viewer</h3>
<div>azimuth <span id="az">0</span>&deg; elevation <span id="el">15</span>&deg;
 distance <span id="d">2.0</span> &mdash; arrows orbit, +/- zoom, r spins</div>
<img id="view" width="512" height="512"/>
<div id="pose">
 <select id="joint"></select>
 x <input type="range" id="rx" min="-1.6" max="1.6" step="0.05" value="0">
 y <input type="range" id="ry" min="-1.6" max="1.6" step="0.05" value="0">
 z <input type="range" id="rz" min="-1.6" max="1.6" step="0.05" value="0">
 <button id="reset">reset pose</button>
</div>
<script>
let az=0, el=15, d=2.0, spin=false, pose=null;
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
fetch('/pose').then(r=>r.ok?r.json():null).then(p=>{
  if(!p||!p.posable)return; pose=p;
  const sel=document.getElementById('joint');
  p.joints.forEach((n,i)=>{const o=document.createElement('option');
    o.value=i;o.textContent=n;sel.appendChild(o);});
  document.getElementById('pose').style.display='block';
  function load(){const j=+sel.value, v=pose.body_pose[j];
    ['rx','ry','rz'].forEach((id,a)=>
      document.getElementById(id).value=v[a]);}
  sel.onchange=load; load();
  function push(){
    const j=+sel.value;
    const v=['rx','ry','rz'].map(id=>+document.getElementById(id).value);
    pose.body_pose[j]=v;
    fetch('/pose',{method:'POST',body:JSON.stringify({joint:j,values:v})})
      .then(()=>refresh());}
  ['rx','ry','rz'].forEach(id=>
    document.getElementById(id).oninput=push);
  document.getElementById('reset').onclick=()=>{
    fetch('/pose',{method:'POST',body:JSON.stringify({reset:true})})
      .then(r=>r.json()).then(p2=>{pose=p2;load();refresh();});};
});
refresh();
</script></body></html>"""


class ViewerServer:
    """Serves / (controls page), /render (PNG frame), /info (JSON)."""

    def __init__(self, scene, port: int = 8600, size: int = 512,
                 sh_degree: int = 0, animator=None):
        self.port = port
        self.size = size
        self.sh_degree = sh_degree
        self._scene = scene
        self._lock = threading.Lock()
        self._httpd = None
        self._render_fn = None
        # pose editing (animation.AvatarAnimator): per-joint axis-angle
        # state mutated by POST /pose, applied through the LBS binding
        self.animator = animator
        self._body_pose = np.zeros((21, 3), np.float32)
        self._global_orient = np.zeros(3, np.float32)

    # ---- pose editing ---------------------------------------------------
    def pose_state(self) -> dict:
        with self._lock:
            return {
                "posable": self.animator is not None,
                "joints": list(BODY_JOINTS),
                "body_pose": self._body_pose.tolist(),
                "global_orient": self._global_orient.tolist(),
            }

    def set_pose(self, update: dict) -> dict:
        """Apply a POST /pose update: {"joint": i, "values": [x,y,z]} for
        one joint, {"body_pose": [[...]x21]} / {"global_orient": [...]} in
        bulk, or {"reset": true}."""
        with self._lock:
            if update.get("reset"):
                self._body_pose[:] = 0.0
                self._global_orient[:] = 0.0
            if "joint" in update:
                j = int(update["joint"])
                if not 0 <= j < 21:
                    raise ValueError(f"joint index {j} out of range [0,21)")
                self._body_pose[j] = np.asarray(
                    update["values"], np.float32
                ).reshape(3)
            if "body_pose" in update:
                self._body_pose[:] = np.asarray(
                    update["body_pose"], np.float32
                ).reshape(21, 3)
            if "global_orient" in update:
                self._global_orient[:] = np.asarray(
                    update["global_orient"], np.float32
                ).reshape(3)
        return self.pose_state()

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
            body_pose = self._body_pose.copy()
            orient = self._global_orient.copy()
        if self.animator is not None:
            from humangaussian_tpu.smplx.lbs import SMPLXPose

            pose = SMPLXPose.rest(
                body_pose=jnp.asarray(body_pose)
            )._replace(global_orient=jnp.asarray(orient))
            scene = self.animator.frame_scene(pose)
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
                elif u.path == "/pose":
                    self._send(200, "application/json",
                               json.dumps(viewer.pose_state()).encode())
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

            def do_POST(self):
                u = urlparse(self.path)
                if u.path != "/pose":
                    self._send(404, "text/plain", b"not found")
                    return
                if viewer.animator is None:
                    self._send(
                        400, "application/json",
                        b'{"error": "no animator: start the viewer with '
                        b'--smplx_path to enable pose editing"}',
                    )
                    return
                n = int(self.headers.get("Content-Length", "0"))
                try:
                    update = json.loads(self.rfile.read(n) or b"{}")
                    state = viewer.set_pose(update)
                except (ValueError, KeyError) as e:
                    self._send(400, "application/json",
                               json.dumps({"error": str(e)}).encode())
                    return
                self._send(200, "application/json",
                           json.dumps(state).encode())

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
    parser.add_argument(
        "--smplx_path", default=None,
        help="SMPL-X models dir: enables the pose-editor sliders",
    )
    parser.add_argument("--gender", default="neutral")
    args = parser.parse_args(argv)

    from humangaussian_tpu.io.ply import load_ply

    scene = load_ply(args.ply)
    animator = None
    if args.smplx_path:
        from humangaussian_tpu.animation import AvatarAnimator
        from humangaussian_tpu.smplx.model import load_smplx_npz

        model = load_smplx_npz(args.smplx_path, gender=args.gender)
        animator = AvatarAnimator(scene, model)
        print(f"pose editing on ({animator.n_gaussians} bound gaussians)")
    server = ViewerServer(scene, port=args.port, size=args.size,
                          animator=animator)
    print(f"viewer at http://localhost:{args.port}/ (ctrl-c to stop)")
    server.start(background=False)


if __name__ == "__main__":
    main()
