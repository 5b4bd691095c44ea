"""Interactive HTTP viewer — lightweight replacement for the reference's
viser/nerfview stack (runner.py:302-309, 880-900; disabled by default via
cfg.disable_viewer). Serves an orbit-controllable render of the current
gaussians from a plain http.server — no external dependencies, works over
any port-forward.

    python -m gs_init_tpu.viewer --ckpt results/garden/ckpts/ckpt_30000.npz \
        --data_dir data/360_v2/garden --port 8080

Endpoints:
  /            minimal HTML page with keyboard/mouse orbit controls
  /render?yaw=..&pitch=..&radius=..&w=..&h=..   JPEG render
"""
from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html><html><head><title>gs_init_tpu viewer</title>
<style>body{margin:0;background:#111;color:#eee;font-family:monospace}
#hud{position:fixed;top:8px;left:8px}</style></head>
<body><div id="hud">drag: orbit | wheel: zoom<span id="st"></span></div>
<img id="v" style="width:100vw;height:100vh;object-fit:contain">
<script>
let yaw=0,pitch=0,radius=3,busy=false,dirty=true;
const img=document.getElementById('v');
function refresh(){if(busy||!dirty)return;busy=true;dirty=false;
 img.onload=()=>{busy=false;refresh();};
 img.src=`/render?yaw=${yaw}&pitch=${pitch}&radius=${radius}&t=${Date.now()}`;}
let drag=false,lx=0,ly=0;
window.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;yaw+=(e.clientX-lx)*0.01;
 pitch=Math.max(-1.5,Math.min(1.5,pitch+(e.clientY-ly)*0.01));
 lx=e.clientX;ly=e.clientY;dirty=true;refresh();};
window.onwheel=e=>{radius*=Math.exp(e.deltaY*0.001);dirty=true;refresh();};
setInterval(refresh,100);refresh();
async function st(){try{const r=await(await fetch('/status')).json();
 if(r.step>=0){document.getElementById('st').textContent=
  ` | step ${r.step} | ${r.num_GS} GS`;dirty=true;}}catch(e){}}
setInterval(st,2000);st();
</script></body></html>"""


class ViewerServer:
    """Serve renders of a live Runner (or a loaded checkpoint).

    Live-attach parity with the reference's viser/nerfview thread
    (runner.py:302-309, 880-900): ``start()`` runs the HTTP server on a
    daemon thread so the Runner can keep training while views are served
    from whatever parameter snapshot is current. Because the train step
    donates its state buffers, a concurrent read can observe a deleted
    array — the handlers retry against the freshly rebound state (see
    render_view). Pass ``port=0`` to bind an ephemeral port (tests).
    """

    def __init__(self, runner, port: int = 8080, width: int = 640):
        self.runner = runner
        self.port = port
        self.width = width
        centers = np.stack(
            [im.camtoworld[:3, 3] for im in runner.parser.images]
        )
        self.center = centers.mean(axis=0) * 0.0  # scene is normalized
        self.radius0 = float(np.linalg.norm(centers, axis=1).mean())
        self._lock = threading.Lock()
        self._srv = None
        self._thread = None

    def start(self) -> int:
        """Serve on a daemon thread; returns the bound port."""
        self._srv = ThreadingHTTPServer(
            ("0.0.0.0", self.port), self._make_handler()
        )
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True, name="gs-viewer"
        )
        self._thread.start()
        print(f"viewer on http://localhost:{self.port}")
        return self.port

    def stop(self):
        if self._srv is not None:
            self._srv.shutdown()
            self._srv.server_close()
            self._srv = None

    def render_view(self, yaw: float, pitch: float, radius: float, w: int, h: int):
        from .datasets.synthetic import look_at

        r = radius * self.radius0
        eye = self.center + r * np.array(
            [
                np.cos(pitch) * np.sin(yaw),
                np.sin(pitch),
                np.cos(pitch) * np.cos(yaw),
            ]
        )
        c2w = look_at(eye, self.center)
        K = np.array(
            [[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]], np.float32
        )
        # The train step donates its state buffers, so a render dispatched
        # against runner.gstate can lose its inputs mid-flight ("Array has
        # been deleted") if a training step lands concurrently. Re-reading
        # runner.gstate picks up the freshly rebound state; retry a few
        # times rather than serializing the viewer against training.
        last_err = None
        for _ in range(8):
            try:
                with self._lock:
                    color, _, _ = self.runner.render(
                        c2w, K, w, h, render_mode="RGB"
                    )
                return (np.clip(color, 0, 1) * 255).astype(np.uint8)
            except RuntimeError as e:
                if "deleted" not in str(e):
                    raise
                last_err = e
                time.sleep(0.05)
        raise last_err

    def serve_forever(self):
        self._srv = ThreadingHTTPServer(
            ("0.0.0.0", self.port), self._make_handler()
        )
        self.port = self._srv.server_address[1]
        print(f"viewer on http://localhost:{self.port}")
        self._srv.serve_forever()

    def _make_handler(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if u.path == "/render":
                    q = parse_qs(u.query)
                    g = lambda k, d: float(q.get(k, [d])[0])
                    w = int(g("w", viewer.width))
                    h = int(g("h", int(viewer.width * 0.75)))
                    img = viewer.render_view(
                        g("yaw", 0.0), g("pitch", 0.0), g("radius", 1.0), w, h
                    )
                    import imageio.v2 as imageio

                    buf = io.BytesIO()
                    imageio.imwrite(buf, img, format="jpeg")
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.end_headers()
                    self.wfile.write(buf.getvalue())
                    return
                if u.path == "/status":
                    # Training progress for the HUD (nerfview shows
                    # step/num_GS on its overlay). Same donated-buffer race
                    # as /render: retry against the rebound state.
                    from .engine.params import num_alive

                    n_gs = -1
                    for _ in range(8):
                        try:
                            n_gs = int(num_alive(viewer.runner.gstate))
                            break
                        except RuntimeError as e:
                            if "deleted" not in str(e):
                                raise
                            time.sleep(0.05)
                    body = json.dumps(
                        {
                            "step": int(getattr(viewer.runner, "train_step", -1)),
                            "num_GS": n_gs,
                        }
                    ).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)
                    return
                self.send_response(404)
                self.end_headers()

        return Handler


def main(argv=None):
    import argparse

    from .config import Config, parse_cli
    from .engine.runner import Runner
    from .trainer import build_presets

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--data_factor", type=int, default=4)
    ap.add_argument("--max_gaussians", type=int, default=1_000_000)
    ns = ap.parse_args(argv)
    cfg = build_presets()["default"]
    cfg.data_dir = ns.data_dir
    cfg.data_factor = ns.data_factor
    cfg.max_gaussians = ns.max_gaussians
    cfg.result_dir = "/tmp/gs_viewer"
    runner = Runner(cfg)
    runner.load(ns.ckpt)
    ViewerServer(runner, port=ns.port).serve_forever()


if __name__ == "__main__":
    main()
