"""Serving layer: drive the real HTTP surface end-to-end on CPU."""

import base64
import json
import threading
import urllib.request

import pytest

from optimaltextures_tpu import serve


@pytest.fixture(scope="module")
def server():
    srv = serve.serve(port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _style_b64():
    with open("/root/reference/style/graffiti.jpg", "rb") as f:
        return base64.b64encode(f.read()).decode()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["devices"]


def test_synthesize_endpoint(server):
    payload = {
        "config": {"size": 64, "passes": 1, "iters": 4, "no_multires": True,
                   "depth": 2, "seed": 0},
        "style_b64": [_style_b64()],
    }
    req = urllib.request.Request(f"{server}/v1/synthesize",
                                 data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"] == "image/png"
        png = r.read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_synthesize_bad_request(server):
    req = urllib.request.Request(f"{server}/v1/synthesize",
                                 data=json.dumps({"config": {}}).encode(),
                                 headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "style_b64" in json.loads(e.read())["error"]


def test_unknown_route(server):
    try:
        urllib.request.urlopen(f"{server}/nope")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_synthesize_with_content(server):
    with open("/root/reference/content/rocket.jpg", "rb") as f:
        content_b64 = base64.b64encode(f.read()).decode()
    payload = {
        "config": {"size": 64, "passes": 1, "iters": 4, "no_multires": True,
                   "depth": 2, "seed": 0, "content_strength": 0.3,
                   "color_transfer": "lum"},
        "style_b64": [_style_b64()],
        "content_b64": content_b64,
    }
    req = urllib.request.Request(f"{server}/v1/synthesize",
                                 data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        png = r.read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
