"""Interactive application host: live render loop + mouse camera + HUD.

The reference ships a browser page (web/app/page.tsx:149-293) whose canvas
is driven by pointer events (orbit/pan/zoom, camera.ts:169-357) with a
stats HUD (web/components/header.tsx:41-50). Headless TPU boxes have no
compositor, so the host is inverted: a stdlib HTTP server renders frames
on demand and a self-contained HTML page provides the canvas, the pointer
handlers (same drag semantics as camera.ts) and the HUD. Any browser —
including the sandbox's automation browser — becomes the display.

Usage:
    python examples/serve.py [--port 8321] [--size 480x360] [--no-anim]

Endpoints:
    /        the canvas + input + HUD page
    /frame   advance one step and return the frame as PNG
    /input   pointer deltas: ?orbit=dx,dy | ?pan=dx,dy | ?zoom=dy
    /stats   engine stats JSON (fps, frame ms, memory, overflow counters)
"""

import argparse
import io
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODEL = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"
VMD = "/root/reference/web/public/animations/pool.vmd"

PAGE = """<!doctype html>
<meta charset="utf-8"><title>reze-tpu live</title>
<style>
 body{margin:0;background:#111;color:#ddd;font:13px monospace;overflow:hidden}
 #hud{position:fixed;top:8px;left:8px;background:#000a;padding:6px 10px;
      border-radius:6px;white-space:pre;pointer-events:none}
 canvas{display:block;margin:0 auto;cursor:grab}
</style>
<canvas id=c width=%W% height=%H%></canvas>
<div id=hud>connecting…</div>
<script>
const c=document.getElementById('c'),x=c.getContext('2d'),hud=document.getElementById('hud');
let drag=null,btn=0,frames=0,t0=performance.now();
c.onpointerdown=e=>{drag=[e.clientX,e.clientY];btn=e.button;c.setPointerCapture(e.pointerId)};
c.onpointerup=()=>drag=null;
c.onpointermove=e=>{
  if(!drag)return;const dx=e.clientX-drag[0],dy=e.clientY-drag[1];drag=[e.clientX,e.clientY];
  const mode=(btn===2||e.shiftKey)?'pan':'orbit';
  fetch(`/input?${mode}=${dx},${dy}`);
};
c.oncontextmenu=e=>e.preventDefault();
c.onwheel=e=>{e.preventDefault();fetch(`/input?zoom=${e.deltaY}`)};
async function loop(){
  for(;;){
    const r=await fetch('/frame');const b=await r.blob();
    const img=await createImageBitmap(b);x.drawImage(img,0,0);frames++;
    if(frames%10===0){
      const s=await (await fetch('/stats')).json();
      const fps=frames/((performance.now()-t0)/1000);
      hud.textContent=`display ${fps.toFixed(1)} fps | engine ${s.fps.toFixed(1)} fps `+
        `(${s.frame_time.toFixed(1)} ms)\\nHBM ~${s.gpu_memory.toFixed(0)} MB | `+
        `pair ovf ${s.pair_overflow} | contact ovf ${s.contact_overflow}`;
    }
  }
}
loop();
</script>"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8321)
    ap.add_argument("--size", default="480x360")
    ap.add_argument("--no-anim", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the sandbox preregisters "
                         "the TPU plugin; the env var alone is not enough)")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from PIL import Image

    from reze_tpu.core.types import EngineConfig
    from reze_tpu.engine import Engine

    cfg = EngineConfig(width=w, height=h, camera_distance=13.5,
                       camera_target=(0.0, 17.1, 0.0),
                       max_tris_per_bin=4096)
    eng = Engine(cfg)
    eng.load_model(MODEL)
    if not args.no_anim:
        eng.load_animation(VMD)
        eng.play_animation()
    lock = threading.Lock()
    last = {"t": time.time()}
    print(f"warm-up render (first jit compile)…", flush=True)
    eng.render(0.0)
    print(f"serving on http://127.0.0.1:{args.port}", flush=True)

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            q = parse_qs(u.query)
            if u.path == "/":
                page = PAGE.replace("%W%", str(w)).replace("%H%", str(h))
                self._send(200, "text/html", page.encode())
            elif u.path == "/frame":
                with lock:
                    now = time.time()
                    dt = min(now - last["t"], 0.1)
                    last["t"] = now
                    frame = eng.render(dt)
                buf = io.BytesIO()
                Image.fromarray(np.asarray(frame)).save(buf, "PNG")
                self._send(200, "image/png", buf.getvalue())
            elif u.path == "/input":
                with lock:
                    cam = eng.camera
                    if "orbit" in q:
                        dx, dy = (float(v) for v in q["orbit"][0].split(","))
                        eng.camera = cam.orbit(dx, dy)
                    elif "pan" in q:
                        dx, dy = (float(v) for v in q["pan"][0].split(","))
                        eng.camera = cam.pan(dx, dy)
                    elif "zoom" in q:
                        eng.camera = cam.zoom(float(q["zoom"][0]))
                self._send(200, "text/plain", b"ok")
            elif u.path == "/stats":
                with lock:
                    s = eng.get_stats()
                self._send(200, "application/json", json.dumps({
                    "fps": s.fps, "frame_time": s.frame_time,
                    "gpu_memory": s.gpu_memory,
                    "pair_overflow": s.pair_overflow,
                    "contact_overflow": s.contact_overflow,
                }).encode())
            else:
                self._send(404, "text/plain", b"not found")

    ThreadingHTTPServer(("127.0.0.1", args.port), H).serve_forever()


if __name__ == "__main__":
    main()
