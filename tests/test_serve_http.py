"""HTTP serving: upscale round trip, health, stats, error handling."""

import io
import json
import os
import socket
import sys
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import serve_http  # noqa: E402


@pytest.fixture(scope="module")
def server_url():
    handler = serve_http.build_app(weights="", num_rrdb=1, bfloat16=False,
                                   warmup_size=0)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _post(url, data, path="/upscale"):
    req = urllib.request.Request(url + path, data=data, method="POST")
    return urllib.request.urlopen(req, timeout=300)


def test_upscale_round_trip(server_url):
    rng = np.random.default_rng(0)
    img = Image.fromarray((rng.random((24, 32, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")

    resp = _post(server_url, buf.getvalue())
    assert resp.status == 200
    assert resp.headers["Content-Type"] == "image/png"
    assert float(resp.headers["X-Latency-Seconds"]) > 0
    out = Image.open(io.BytesIO(resp.read()))
    assert out.size == (32 * 4, 24 * 4)

    health = json.loads(urllib.request.urlopen(
        server_url + "/healthz", timeout=30).read())
    assert health["status"] == "ok" and health["served"] >= 1
    stats = json.loads(urllib.request.urlopen(
        server_url + "/stats", timeout=30).read())
    assert stats["count"] >= 1 and stats["mean_s"] > 0


def test_bad_image_is_400(server_url):
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server_url, b"this is not an image")
    assert err.value.code == 400


def test_unknown_path_is_404(server_url):
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server_url, b"x", path="/nope")
    assert err.value.code == 404
