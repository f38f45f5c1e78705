"""HTTP serving front end for the SR pipeline.

Production-shaped single-binary server over ``real_esrgan_tpu.serve
.SRPipeline`` (shape-bucketed compiles for small inputs, overlap-tile
multi-chip decomposition for large ones — serve.py):

    python scripts/serve_http.py --weights results/<exp>/g_last --port 8080
    curl -s -X POST --data-binary @lr.png localhost:8080/upscale > sr.png
    curl -s localhost:8080/healthz

Endpoints:
  POST /upscale   image bytes (png/jpeg) in, ``x4`` PNG out
  GET  /healthz   JSON liveness + device + served-request counter
  GET  /stats     JSON latency stats (count/mean/p50/p95, seconds)

Inference is serialized behind a lock (one XLA program at a time keeps HBM
bounded); decode/encode run per-request in the handler threads.  The
reference has no serving story at all — its inference.py loads the model per
invocation (/root/reference/inference.py:24-58).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import statistics
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_app(weights: str = "", upscale_factor: int = 4, num_rrdb: int = 23,
              bfloat16: bool = True, warmup_size: int = 0):
    """Returns a BaseHTTPRequestHandler class bound to one loaded pipeline."""
    from collections import deque

    import numpy as np
    from PIL import Image

    from real_esrgan_tpu.serve import SRPipeline

    pipeline = SRPipeline(weights_path=weights, upscale_factor=upscale_factor,
                          num_rrdb=num_rrdb, bfloat16=bfloat16)
    lock = threading.Lock()
    latencies: deque = deque(maxlen=1024)  # stats window; bounds memory
    served = [0]

    if warmup_size:
        pipeline.upscale(np.zeros((warmup_size, warmup_size, 3), np.float32))

    class Handler(BaseHTTPRequestHandler):
        pipeline_ref = pipeline  # test hook

        def log_message(self, fmt, *args):  # quiet: stats live in /stats
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._json(200, {"status": "ok",
                                 "device": jax.devices()[0].platform,
                                 "served": served[0]})
            elif self.path == "/stats":
                with lock:
                    lat = sorted(latencies)
                stats = {"count": len(lat)}
                if lat:
                    stats.update(
                        mean_s=round(statistics.fmean(lat), 4),
                        p50_s=round(lat[len(lat) // 2], 4),
                        p95_s=round(lat[max(0, int(len(lat) * 0.95) - 1)], 4))
                self._json(200, stats)
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/upscale":
                self._json(404, {"error": "unknown path"})
                return
            try:
                size = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(size)
                img = Image.open(io.BytesIO(raw)).convert("RGB")
                lr = np.asarray(img, np.float32) / 255.0
            except Exception as exc:
                self._json(400, {"error": f"bad image: {exc}"})
                return
            t0 = time.perf_counter()
            try:
                with lock:
                    sr = pipeline.upscale(lr)
                    dt = time.perf_counter() - t0
                    latencies.append(dt)
                    served[0] += 1
            except Exception as exc:
                # an HTTP 500 beats a dropped connection (a degenerate-but-
                # decodable input, or device OOM on a huge upload, lands here)
                self._json(500, {"error": f"upscale failed: {exc}"})
                return
            out = Image.fromarray(
                (np.clip(sr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8))
            buf = io.BytesIO()
            out.save(buf, format="PNG")
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Latency-Seconds", f"{dt:.4f}")
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--weights", default="")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--upscale-factor", type=int, default=4)
    p.add_argument("--num-rrdb", type=int, default=23)
    p.add_argument("--no-bfloat16", action="store_true")
    p.add_argument("--warmup-size", type=int, default=256,
                   help="precompile this input bucket at startup (0 = off)")
    a = p.parse_args(argv)

    handler = build_app(a.weights, a.upscale_factor, a.num_rrdb,
                        not a.no_bfloat16, a.warmup_size)
    server = ThreadingHTTPServer((a.host, a.port), handler)
    print(f"serving x{a.upscale_factor} SR on http://{a.host}:{a.port} "
          f"(weights: {a.weights or 'random init'})", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
