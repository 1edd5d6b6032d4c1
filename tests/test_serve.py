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


def _b64(path):
    with open(path, "rb") as f:
        return base64.b64encode(f.read()).decode()


def _style_b64():
    return _b64("/root/reference/style/graffiti.jpg")


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


def _post(server, payload):
    req = urllib.request.Request(f"{server}/v1/synthesize",
                                 data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return r.headers["Content-Type"], r.read()


def test_repeated_unseeded_requests_differ(server):
    """A synthesis service must not return byte-identical images for repeated
    no-seed requests (r1 VERDICT weak #2: the pooled Synthesizer reused its
    construction-time key)."""
    payload = {
        "config": {"size": 64, "passes": 1, "iters": 4, "no_multires": True,
                   "depth": 2},
        "style_b64": [_style_b64()],
    }
    _, a = _post(server, payload)
    _, b = _post(server, payload)
    assert a != b


def test_same_seed_requests_identical(server):
    payload = {
        "config": {"size": 64, "passes": 1, "iters": 4, "no_multires": True,
                   "depth": 2, "seed": 5},
        "style_b64": [_style_b64()],
    }
    _, a = _post(server, payload)
    _, b = _post(server, payload)
    assert a == b


def test_batch_request_returns_every_image(server):
    """batch > 1 must return ALL synthesized images (r1 ADVICE: the first was
    returned and the rest silently discarded)."""
    payload = {
        "config": {"size": 64, "passes": 1, "iters": 2, "no_multires": True,
                   "depth": 2, "seed": 1, "batch": 2},
        "style_b64": [_style_b64()],
    }
    ctype, body = _post(server, payload)
    assert ctype == "application/json"
    images = json.loads(body)["images_b64"]
    assert len(images) == 2
    for im in images:
        assert base64.b64decode(im)[:8] == b"\x89PNG\r\n\x1a\n"


def test_extended_config_fields_accepted(server):
    """pca_bucket / use_pallas / spatial_devices / compat_schedule_quirk are
    requestable over HTTP (r1 VERDICT weak #3)."""
    payload = {
        "config": {"size": 64, "passes": 1, "iters": 2, "no_multires": True,
                   "depth": 2, "seed": 1, "pca_bucket": 32,
                   "use_pallas": False, "compat_schedule_quirk": False},
        "style_b64": [_style_b64()],
    }
    ctype, body = _post(server, payload)
    assert ctype == "image/png" and body[:8] == b"\x89PNG\r\n\x1a\n"


def test_style_pack_persistence(tmp_path, monkeypatch):
    """With OPTEX_PACK_DIR set, the first request for a style exports a pack;
    a cold pool (fresh-process simulation) imports it and serves with ZERO
    style-prep dispatches, byte-identically for a fixed seed."""
    from optimaltextures_tpu import core

    monkeypatch.setenv("OPTEX_PACK_DIR", str(tmp_path))
    payload = {
        "config": {"size": 64, "passes": 1, "iters": 4, "no_multires": True,
                   "depth": 2, "seed": 3},
        "style_b64": [_style_b64()],
    }
    _, a = serve.handle_synthesize(serve.SynthesizerPool(), payload)
    packs = list(tmp_path.glob("pack_*.npz"))
    assert len(packs) == 1

    calls = []
    orig = core.Synthesizer._dispatch_style_prep
    monkeypatch.setattr(core.Synthesizer, "_dispatch_style_prep",
                        lambda self, *args: calls.append(1) or orig(self, *args))
    _, b = serve.handle_synthesize(serve.SynthesizerPool(), payload)
    assert calls == []           # warm-started entirely from the pack
    assert a == b                # seeded -> byte-identical across processes


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


def test_three_style_mixing_request(server):
    """N-style mixing over HTTP (extension): 3 styles + weights."""
    s = lambda n: _b64(f"/root/reference/style/{n}.jpg")
    payload = {
        "config": {"size": 64, "passes": 1, "iters": 4, "no_multires": True,
                   "depth": 2, "seed": 1,
                   "mixing_weights": [0.5, 0.3, 0.2]},
        "style_b64": [s("zebra"), s("pattern-small"), s("lava-small")],
    }
    req = urllib.request.Request(f"{server}/v1/synthesize",
                                 data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        png = r.read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    # 9 styles must be rejected, not crash
    payload["style_b64"] = [s("zebra")] * 9
    payload["config"].pop("mixing_weights")
    req = urllib.request.Request(f"{server}/v1/synthesize",
                                 data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_init_b64_request(server):
    """init_b64: start from an image; seeded requests stay byte-identical."""
    payload = {
        "config": {"size": 64, "passes": 1, "iters": 4, "no_multires": True,
                   "depth": 2, "seed": 0},
        "style_b64": [_style_b64()],
        "init_b64": _b64("/root/reference/content/rocket.jpg"),
    }
    def post():
        req = urllib.request.Request(f"{server}/v1/synthesize",
                                     data=json.dumps(payload).encode(),
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            return r.read()

    png1 = post()
    assert png1[:8] == b"\x89PNG\r\n\x1a\n"
    assert post() == png1

    # batch > 1 with init is rejected (identical outputs, wasted device work)
    payload["config"]["batch"] = 2
    try:
        post()
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_multi_worker_serving():
    """--workers N: requests rotate across per-device worker pools and can
    run concurrently (extension; exercised on the virtual CPU mesh)."""
    import concurrent.futures

    srv = serve.serve(port=0, workers=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        with urllib.request.urlopen(f"{url}/healthz") as r:
            assert json.loads(r.read())["workers"] == 2

        payload = {
            "config": {"size": 64, "passes": 1, "iters": 4,
                       "no_multires": True, "depth": 2, "seed": 0},
            "style_b64": [_style_b64()],
        }

        def post():
            req = urllib.request.Request(
                f"{url}/v1/synthesize", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                return r.headers["X-Optex-Worker"], r.read()

        # sequential requests rotate across the FIFO worker queue
        w1, png1 = post()
        w2, png2 = post()
        assert {w1, w2} == {"0", "1"}
        assert png1[:8] == b"\x89PNG\r\n\x1a\n" and png2[:8] == png1[:8]
        # seeded: both workers produce byte-identical images
        assert png1 == png2

        # concurrent requests both succeed
        with concurrent.futures.ThreadPoolExecutor(2) as ex:
            results = list(ex.map(lambda _: post(), range(2)))
        assert all(p[:8] == b"\x89PNG\r\n\x1a\n" for _, p in results)
    finally:
        srv.shutdown()


def test_config_defaults_applied_and_overridable():
    """Operator config defaults fill omitted fields; the request wins when
    it specifies one; unknown defaults are rejected at startup."""
    with pytest.raises(ValueError, match="unknown config defaults"):
        serve.serve(port=0, config_defaults={"nope": 1})

    srv = serve.serve(port=0, config_defaults={"pca_bucket": 8, "iters": 4})
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"

        def post(cfg):
            req = urllib.request.Request(
                f"{url}/v1/synthesize",
                data=json.dumps({"config": cfg,
                                 "style_b64": [_style_b64()]}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                return r.read()

        base = {"size": 64, "passes": 1, "no_multires": True, "depth": 2,
                "seed": 0}
        assert post(base)[:8] == b"\x89PNG\r\n\x1a\n"
        # the worker's pool cached a synthesizer with the defaults applied
        pool = [p for p in _pools(srv) if len(p)][0]
        cfgs = [s.cfg for s in pool._cache.values()]
        assert any(c.pca_bucket == 8 and c.iters == 4 for c in cfgs)
        # explicit request value overrides the default
        post({**base, "pca_bucket": 0})
        cfgs = [s.cfg for p in _pools(srv) for s in p._cache.values()]
        assert any(c.pca_bucket == 0 for c in cfgs)
    finally:
        srv.shutdown()


def _pools(srv):
    # the handler closure holds the WorkerSet; reach it via the class cell
    handler_cls = srv.RequestHandlerClass
    for cell in handler_cls.do_POST.__closure__ or []:
        if isinstance(cell.cell_contents, serve.WorkerSet):
            return cell.cell_contents.pools
    raise AssertionError("WorkerSet not found")


def test_oversized_request_rejected(server):
    req = urllib.request.Request(
        f"{server}/v1/synthesize", data=b"x",
        headers={"Content-Type": "application/json",
                 "Content-Length": str(serve._MAX_REQUEST_BYTES + 1)})
    try:
        urllib.request.urlopen(req)
        assert False, "expected 413"
    except urllib.error.HTTPError as e:
        assert e.code == 413


def test_metrics_endpoint(server):
    # generate one ok + one client_error, then scrape
    payload = {"config": {"size": 64, "passes": 1, "iters": 4,
                          "no_multires": True, "depth": 2, "seed": 0},
               "style_b64": [_style_b64()]}
    req = urllib.request.Request(f"{server}/v1/synthesize",
                                 data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    urllib.request.urlopen(req).read()
    try:
        urllib.request.urlopen(urllib.request.Request(
            f"{server}/v1/synthesize", data=json.dumps({}).encode(),
            headers={"Content-Type": "application/json"}))
    except urllib.error.HTTPError:
        pass
    with urllib.request.urlopen(f"{server}/metrics") as r:
        text = r.read().decode()
    assert 'optex_requests_total{outcome="ok"}' in text
    ok = int([l for l in text.splitlines()
              if l.startswith('optex_requests_total{outcome="ok"}')][0]
             .rsplit(" ", 1)[1])
    errs = int([l for l in text.splitlines()
                if 'outcome="client_error"' in l][0].rsplit(" ", 1)[1])
    assert ok >= 1 and errs >= 1
    assert "optex_request_seconds_sum" in text
    assert "optex_workers 1" in text


def test_concurrent_stress_two_workers():
    """8 concurrent requests against 2 workers: all succeed, both workers
    participate, metrics count every request."""
    import concurrent.futures

    srv = serve.serve(port=0, workers=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        payload = {
            "config": {"size": 64, "passes": 1, "iters": 2,
                       "no_multires": True, "depth": 1, "seed": 0},
            "style_b64": [_style_b64()],
        }

        def post(_):
            req = urllib.request.Request(
                f"{url}/v1/synthesize", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                return r.headers["X-Optex-Worker"], r.read()[:8]

        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            results = list(ex.map(post, range(8)))
        assert all(sig == b"\x89PNG\r\n\x1a\n" for _, sig in results)
        assert {w for w, _ in results} == {"0", "1"}
        with urllib.request.urlopen(f"{url}/metrics") as r:
            text = r.read().decode()
        ok = int([l for l in text.splitlines()
                  if l.startswith('optex_requests_total{outcome="ok"}')][0]
                 .rsplit(" ", 1)[1])
        assert ok == 8, text
    finally:
        srv.shutdown()


def test_weight_sweep_shares_one_synthesizer():
    """Different mixing_weights requests reuse ONE pooled Synthesizer (the
    weights are traced, not part of the pool signature) — and both produce
    valid, different images."""
    srv = serve.serve(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        styles = [_b64("/root/reference/style/zebra.jpg"),
                  _b64("/root/reference/style/pattern-small.jpg")]

        def post(wts):
            payload = {"config": {"size": 64, "passes": 1, "iters": 4,
                                  "no_multires": True, "depth": 2, "seed": 0,
                                  "mixing_weights": wts},
                       "style_b64": styles}
            req = urllib.request.Request(
                f"{url}/v1/synthesize", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                return r.read()

        a = post([0.9, 0.1])
        b = post([0.1, 0.9])
        assert a[:8] == b"\x89PNG\r\n\x1a\n" and a != b
        pool = [p for p in _pools(srv) if len(p)][0]
        assert len(pool) == 1, "weight sweep must not grow the pool"
    finally:
        srv.shutdown()


def test_style_parallel_request(server):
    """"style_parallel": true returns ONE image per style (no mixing),
    via the EP path with the pooled warm VGGBank (r3)."""
    import base64 as b64mod

    styles = [_b64("/root/reference/style/graffiti.jpg"),
              _b64("/root/reference/style/graffiti.jpg")]
    payload = {"config": {"size": 64, "passes": 1, "iters": 4,
                          "no_multires": True, "depth": 2, "seed": 0},
               "style_b64": styles, "style_parallel": True}
    ctype, body = _post(server, payload)
    assert ctype == "application/json"
    imgs = json.loads(body)["images_b64"]
    assert len(imgs) == 2
    for im in imgs:
        assert b64mod.b64decode(im)[:8] == b"\x89PNG\r\n\x1a\n"
    # synthesis-only: content rejected
    payload["content_b64"] = _b64("/root/reference/content/rocket.jpg")
    try:
        _post(server, payload)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_style_parallel_request_multichip(server):
    """style_parallel with num_devices=2: one style per device over the
    virtual mesh — must NOT trip Synthesizer's batch%num_devices guard
    (the bank comes from a single-device pool entry)."""
    styles = [_b64("/root/reference/style/graffiti.jpg"),
              _b64("/root/reference/style/graffiti.jpg")]
    payload = {"config": {"size": 64, "passes": 1, "iters": 4,
                          "no_multires": True, "depth": 2, "seed": 1,
                          "num_devices": 2},
               "style_b64": styles, "style_parallel": True}
    ctype, body = _post(server, payload)
    assert ctype == "application/json"
    assert len(json.loads(body)["images_b64"]) == 2


def test_stalled_body_read_times_out():
    """A client that sends headers but stalls mid-body must get a 408 and
    release its body-read semaphore slot instead of blocking other
    connections forever (review r3: slow-loris guard)."""
    import socket

    srv = serve.serve(port=0)
    srv.RequestHandlerClass.timeout = 1   # don't wait 120s in CI
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        s = socket.create_connection(("127.0.0.1", srv.server_address[1]),
                                     timeout=10)
        s.sendall(b"POST /v1/synthesize HTTP/1.1\r\n"
                  b"Host: x\r\nContent-Type: application/json\r\n"
                  b"Content-Length: 1000\r\n\r\n{")   # then stall
        s.settimeout(10)
        data = s.recv(4096)
        assert b"408" in data.split(b"\r\n", 1)[0], data[:80]
        s.close()
        # the server still answers normal requests afterwards
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.server_address[1]}/healthz",
                timeout=10) as r:
            assert r.status == 200
    finally:
        srv.RequestHandlerClass.timeout = 120
        srv.shutdown()


def test_seed_sweep_shares_one_synthesizer():
    """seed is NOT in the pool signature (clients sweeping seeds must not
    thrash the LRU with VGGBank copies); the pooled instance re-keys per
    request, so a fixed seed stays deterministic regardless of what other
    seeds ran in between (ADVICE r2)."""
    import jax
    import numpy as np

    from optimaltextures_tpu.config import OptexConfig

    pool = serve.SynthesizerPool()
    base = dict(size=64, passes=1, iters=4, no_multires=True, depth=1,
                style=["s"])
    s1 = pool.get(OptexConfig(seed=1, **base))
    s2 = pool.get(OptexConfig(seed=2, **base))
    assert s1 is s2 and len(pool) == 1, "seed sweep must not grow the pool"

    k1 = pool.get(OptexConfig(seed=1, **base)).next_run_key()
    pool.get(OptexConfig(seed=2, **base)).next_run_key()   # interleave
    k1b = pool.get(OptexConfig(seed=1, **base)).next_run_key()
    assert np.array_equal(np.asarray(jax.random.key_data(k1)),
                          np.asarray(jax.random.key_data(k1b)))
    # unseeded after seeded: fresh entropy, then the run counter advances
    ka = pool.get(OptexConfig(seed=None, **base)).next_run_key()
    kb = pool.get(OptexConfig(seed=None, **base)).next_run_key()
    assert not np.array_equal(np.asarray(jax.random.key_data(ka)),
                              np.asarray(jax.random.key_data(kb)))


def test_rejected_requests_counted_in_metrics(server):
    with urllib.request.urlopen(f"{server}/metrics") as r:
        before = r.read().decode()
    n0 = int([l for l in before.splitlines()
              if 'outcome="client_error"' in l][0].rsplit(" ", 1)[1])
    # oversized header -> 413, malformed json -> 400: both must count
    for data, headers in [(b"x", {"Content-Length":
                                  str(serve._MAX_REQUEST_BYTES + 1)}),
                          (b"{not json", {})]:
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"{server}/v1/synthesize", data=data,
                headers={"Content-Type": "application/json", **headers}))
        except urllib.error.HTTPError:
            pass
    with urllib.request.urlopen(f"{server}/metrics") as r:
        after = r.read().decode()
    n1 = int([l for l in after.splitlines()
              if 'outcome="client_error"' in l][0].rsplit(" ", 1)[1])
    assert n1 >= n0 + 2, (n0, n1)


def test_pool_lru_eviction():
    """The per-worker Synthesizer pool is an LRU capped at MAX_ENTRIES
    (each entry pins a VGGBank on device); the coldest entry evicts."""
    from optimaltextures_tpu.config import OptexConfig

    pool = serve.SynthesizerPool()
    cfgs = [OptexConfig(size=64, passes=1, iters=2 + i, no_multires=True,
                        depth=1, seed=0, style=["s"])
            for i in range(serve.SynthesizerPool.MAX_ENTRIES + 1)]
    synth0 = pool.get(cfgs[0])
    for c in cfgs[1:]:
        pool.get(c)
    assert len(pool) == serve.SynthesizerPool.MAX_ENTRIES
    # cfg[0] (the coldest) was evicted: a new instance comes back
    assert pool.get(cfgs[0]) is not synth0
    # and a re-request of a warm config returns the SAME instance
    warm = pool.get(cfgs[-1])
    assert pool.get(cfgs[-1]) is warm


def test_corrupt_style_pack_is_discarded(tmp_path, monkeypatch):
    """A corrupt on-disk pack must be deleted and the request still served."""
    monkeypatch.setenv("OPTEX_PACK_DIR", str(tmp_path))
    srv = serve.serve(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        payload = {"config": {"size": 64, "passes": 1, "iters": 2,
                              "no_multires": True, "depth": 1, "seed": 0},
                   "style_b64": [_style_b64()]}

        def post():
            req = urllib.request.Request(
                f"{url}/v1/synthesize", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                return r.read()

        png1 = post()                       # writes a pack
        packs = list(tmp_path.iterdir())
        assert len(packs) == 1
        packs[0].write_bytes(b"not an npz")  # corrupt it

        # a FRESH server (cold in-memory cache) must survive the corrupt
        # pack: discard, recompute, and still return the same seeded bytes
        srv2 = serve.serve(port=0)
        t2 = threading.Thread(target=srv2.serve_forever, daemon=True)
        t2.start()
        try:
            url2 = f"http://127.0.0.1:{srv2.server_address[1]}"
            req = urllib.request.Request(
                f"{url2}/v1/synthesize", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                assert r.read() == png1
        finally:
            srv2.shutdown()
    finally:
        srv.shutdown()


def test_config_fields_stay_in_sync_with_dataclass():
    """Every OptexConfig field except the I/O paths must be settable over
    HTTP; a new dataclass field that isn't added to _CONFIG_FIELDS (or
    explicitly to _IO_FIELDS) fails here instead of silently becoming
    un-exposable (VERDICT r3 weak #5: cov_propagation had gone missing)."""
    import dataclasses

    from optimaltextures_tpu.config import OptexConfig

    all_fields = {f.name for f in dataclasses.fields(OptexConfig)}
    assert serve._CONFIG_FIELDS | serve._IO_FIELDS == all_fields, (
        "drift: " + repr(all_fields ^ (serve._CONFIG_FIELDS
                                       | serve._IO_FIELDS)))
    assert not serve._CONFIG_FIELDS & serve._IO_FIELDS


def test_http_style_scale_matches_cli_load():
    """HTTP style decoding must apply style_scale at LOAD time exactly like
    utils.imageio.load_styles (the reference applies scale at both load and
    per-pass resize; serving used to skip the load half — VERDICT r3 weak
    #4)."""
    import numpy as np

    from optimaltextures_tpu.utils import imageio

    path = "/root/reference/style/graffiti.jpg"
    for scale in (0.5, 1.0, 2.0):
        want = imageio.load_image(path, 96, scale, oversize=True)
        got = serve._decode_image(_b64(path), 96, oversize=True, scale=scale)
        assert got.shape == want.shape, (scale, got.shape, want.shape)
        np.testing.assert_array_equal(got, want)


def test_http_style_scale_e2e_matches_library(server):
    """Seeded style_scale request over HTTP == library run with the same
    style file (full-path equality, not just the loader)."""
    import io as _io

    import numpy as np
    from PIL import Image

    from optimaltextures_tpu import core
    from optimaltextures_tpu.config import OptexConfig
    from optimaltextures_tpu.utils import imageio

    cfg_dict = {"size": 64, "passes": 1, "iters": 4, "no_multires": True,
                "depth": 2, "seed": 7, "style_scale": 0.5}
    ctype, body = _post(server, {"config": cfg_dict,
                                 "style_b64": [_style_b64()]})
    assert ctype == "image/png"
    got = np.asarray(Image.open(_io.BytesIO(body)))

    cfg = OptexConfig(style=["/root/reference/style/graffiti.jpg"],
                      **cfg_dict)
    styles = imageio.load_styles(cfg.style, cfg.size, cfg.style_scale)
    out, _ = core.synthesize(cfg, styles)
    want = np.clip(np.asarray(out)[0], 0.0, 1.0)
    want = (want * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_trickle_body_read_hits_total_deadline():
    """A client trickling bytes fast enough to dodge the per-recv socket
    timeout must still be cut off by the TOTAL body deadline (ADVICE r3:
    per-recv timeout alone lets 4 trickle clients starve all uploads)."""
    import time as _time

    class Trickle:
        def __init__(self):
            self.calls = 0

        def read1(self, n):
            self.calls += 1
            _time.sleep(0.01)  # each recv is fast -> no socket timeout
            return b"x"        # ...but only one byte of progress

    try:
        serve._read_body_deadline(Trickle(), 10_000, deadline_s=0.05)
        assert False, "expected TimeoutError"
    except TimeoutError:
        pass

    # and a well-behaved body still reads fully
    class Normal:
        def __init__(self, data):
            self.buf = data

        def read1(self, n):
            out, self.buf = self.buf[:n], self.buf[n:]
            return out

    assert serve._read_body_deadline(Normal(b"a" * 100), 100) == b"a" * 100


def test_response_formats(server):
    """format=jpeg|npy (r4): npy carries the exact uint8 pixels the PNG
    encodes; jpeg decodes close to them; bad format -> 400."""
    import io

    import numpy as np
    from PIL import Image

    base = {
        "config": {"size": 64, "passes": 1, "iters": 4, "no_multires": True,
                   "depth": 2, "seed": 5},
        "style_b64": [_style_b64()],
    }

    def post(extra):
        req = urllib.request.Request(
            f"{server}/v1/synthesize",
            data=json.dumps({**base, **extra}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            return r.headers["Content-Type"], r.read()

    ct_png, png = post({})
    ct_npy, npy = post({"format": "npy"})
    ct_jpg, jpg = post({"format": "jpeg"})
    assert (ct_png, ct_npy, ct_jpg) == (
        "image/png", "application/octet-stream", "image/jpeg")

    arr_npy = np.load(io.BytesIO(npy))
    assert arr_npy.dtype == np.uint8 and arr_npy.shape == (1, 64, 64, 3)
    arr_png = np.asarray(Image.open(io.BytesIO(png)))
    np.testing.assert_array_equal(arr_npy[0], arr_png)  # exact pixels

    assert jpg[:2] == b"\xff\xd8"          # JPEG SOI
    arr_jpg = np.asarray(Image.open(io.BytesIO(jpg))).astype(np.int16)
    # quality-92 JPEG of a 64px high-frequency texture: measured MAE ~14;
    # unrelated uint8 images differ by ~85 — assert same-image, not lossless
    assert np.abs(arr_jpg - arr_png.astype(np.int16)).mean() < 30.0

    try:
        post({"format": "webp"})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert b"png|jpeg|npy" in e.read()


def test_bake_packs_tool(tmp_path, monkeypatch):
    """tools/bake_packs.py writes exactly the pack the serving path would:
    a fresh pool's first request for the baked style serves with ZERO
    style-prep dispatches."""
    from optimaltextures_tpu import core
    from tools import bake_packs

    monkeypatch.setattr("sys.argv", [
        "bake_packs.py", "--styles", "/root/reference/style/graffiti.jpg",
        "--pack_dir", str(tmp_path),
        "--size", "64",
        "--config", "passes=1", "--config", "iters=4",
        "--config", "no_multires=true", "--config", "depth=2",
    ])
    bake_packs.main()
    packs = list(tmp_path.glob("pack_*.npz"))
    assert len(packs) == 1

    monkeypatch.setenv("OPTEX_PACK_DIR", str(tmp_path))
    calls = []
    orig = core.Synthesizer._dispatch_style_prep
    monkeypatch.setattr(core.Synthesizer, "_dispatch_style_prep",
                        lambda self, *args: calls.append(1) or orig(self, *args))
    serve.handle_synthesize(serve.SynthesizerPool(), {
        "config": {"size": 64, "passes": 1, "iters": 4, "no_multires": True,
                   "depth": 2, "seed": 3},
        "style_b64": [_style_b64()],
    })
    assert calls == []           # warm-started entirely from the baked pack


# ---------------------------------------------------------------------------
# Queue-time request coalescing (RequestCoalescer)


def _internals(srv):
    """Reach the WorkerSet + RequestCoalescer held by the handler closure."""
    ws = co = None
    for cell in srv.RequestHandlerClass.do_POST.__closure__ or []:
        v = cell.cell_contents
        if isinstance(v, serve.WorkerSet):
            ws = v
        if isinstance(v, serve.RequestCoalescer):
            co = v
    assert ws is not None
    return ws, co


def _batchable_payload(**cfg_extra):
    cfg = {"size": 64, "passes": 1, "iters": 2, "no_multires": True,
           "depth": 1}
    cfg.update(cfg_extra)
    return {"config": cfg, "style_b64": [_style_b64()]}


def test_pad_cohort():
    assert [serve._pad_cohort(n) for n in (1, 2, 3, 4, 5, 7, 8)] == \
        [1, 2, 4, 4, 8, 8, 8]


def test_batchable_eligibility():
    base = serve._parse_request(_batchable_payload())
    assert serve._batchable(base)
    for bad in ({"seed": 3}, {"batch": 2}, {"num_devices": 2, "batch": 2}):
        req = serve._parse_request(_batchable_payload(**bad))
        assert not serve._batchable(req), bad
    two = serve._parse_request({**_batchable_payload(),
                                "style_b64": [_style_b64(), _style_b64()]})
    assert not serve._batchable(two)
    withc = serve._parse_request({**_batchable_payload(),
                                  "content_b64": _style_b64()})
    assert not serve._batchable(withc)


def test_coalescer_merges_queued_requests(monkeypatch):
    """3 requests queued behind a busy worker run as ONE cohort: the stub
    runner sees a single call with all 3 members; every member gets its
    own (result, worker, cohort_n)."""
    import concurrent.futures

    ws = serve.WorkerSet(1)
    co = serve.RequestCoalescer(ws, max_batch=8)
    calls = []

    def fake_cohort(pool, members):
        calls.append(len(members))
        return [("image/png", f"img{i}".encode())
                for i in range(len(members))]

    monkeypatch.setattr(serve, "_execute_cohort", fake_cohort)
    req = serve._parse_request(_batchable_payload())

    hold = ws.checkout()          # make the single worker busy
    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        futs = [ex.submit(co.submit, req) for _ in range(3)]
        # wait until the leader is parked in checkout() and both followers
        # joined the open cohort
        import time as _t
        for _ in range(200):
            with co.lock:
                if co._open and len(next(iter(co._open.values()))) == 3:
                    break
            _t.sleep(0.01)
        ws.checkin(hold)          # release the worker -> cohort runs
        results = [f.result(timeout=30) for f in futs]

    assert calls == [3]
    assert sorted(body for _, body, _, _ in results) == \
        [b"img0", b"img1", b"img2"]
    assert all(n == 3 for _, _, _, n in results)
    assert co.coalesced_cohorts == 1 and co.coalesced_requests == 3


def test_coalescer_rollover_past_max_batch(monkeypatch):
    """max_batch=2 with 3 queued requests: one cohort of 2 + one of 1, all
    served; the full cohort's members are NOT orphaned by the rollover."""
    import concurrent.futures

    ws = serve.WorkerSet(1)
    co = serve.RequestCoalescer(ws, max_batch=2)
    calls = []

    def fake_cohort(pool, members):
        calls.append(len(members))
        return [("image/png", b"x")] * len(members)

    monkeypatch.setattr(serve, "_execute_cohort", fake_cohort)
    req = serve._parse_request(_batchable_payload())

    hold = ws.checkout()
    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        futs = [ex.submit(co.submit, req) for _ in range(3)]
        import time as _t
        for _ in range(200):
            with co.lock:
                total = sum(len(v) for v in co._open.values())
            if total == 3:
                break
            _t.sleep(0.01)
        ws.checkin(hold)
        results = [f.result(timeout=30) for f in futs]

    assert sorted(calls) == [1, 2]
    assert len(results) == 3
    assert co.coalesced_cohorts == 1 and co.coalesced_requests == 2


def test_coalescer_error_propagates_to_all_members(monkeypatch):
    """A failing cohort run must fail EVERY member (no hung followers)."""
    import concurrent.futures

    ws = serve.WorkerSet(1)
    co = serve.RequestCoalescer(ws, max_batch=8)

    def boom(pool, members):
        raise ValueError("bad cohort")

    monkeypatch.setattr(serve, "_execute_cohort", boom)
    req = serve._parse_request(_batchable_payload())

    hold = ws.checkout()
    with concurrent.futures.ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(co.submit, req) for _ in range(2)]
        import time as _t
        for _ in range(200):
            with co.lock:
                if co._open and len(next(iter(co._open.values()))) == 2:
                    break
            _t.sleep(0.01)
        ws.checkin(hold)
        errs = []
        for f in futs:
            with pytest.raises(ValueError, match="bad cohort"):
                f.result(timeout=30)
            errs.append(1)
    assert errs == [1, 1]
    # the worker must be back in the queue after a failed cohort
    idx = ws.checkout()
    ws.checkin(idx)


def test_coalesced_http_requests_end_to_end():
    """Real HTTP burst against one busy worker: queued unseeded same-style
    requests coalesce (X-Optex-Cohort), produce DISTINCT valid PNGs, and
    the metrics counters record the cohort."""
    import concurrent.futures

    srv = serve.serve(port=0, workers=1)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        ws, co = _internals(srv)
        assert co is not None

        payload = _batchable_payload()

        def post():
            req = urllib.request.Request(
                f"{url}/v1/synthesize", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.headers.get("X-Optex-Cohort"), r.read()

        hold = ws.checkout()      # park the only worker
        with concurrent.futures.ThreadPoolExecutor(3) as ex:
            futs = [ex.submit(post) for _ in range(3)]
            import time as _t
            for _ in range(500):
                with co.lock:
                    if co._open and \
                            len(next(iter(co._open.values()))) == 3:
                        break
                _t.sleep(0.01)
            ws.checkin(hold)
            results = [f.result(timeout=120) for f in futs]

        assert [c for c, _ in results] == ["3", "3", "3"]
        pngs = [b for _, b in results]
        assert all(p[:8] == b"\x89PNG\r\n\x1a\n" for p in pngs)
        assert len(set(pngs)) == 3, "cohort members must get DISTINCT images"

        with urllib.request.urlopen(f"{url}/metrics") as r:
            text = r.read().decode()
        assert "optex_coalesced_requests_total 3" in text
        assert "optex_coalesced_cohorts_total 1" in text

        # an idle-server request does NOT coalesce and has no cohort header
        c, png = post()
        assert c is None and png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        srv.shutdown()


def test_seeded_request_bypasses_coalescer():
    """A seeded request never joins a cohort (byte-identical rerun contract)
    even when it queues behind a busy worker alongside batchable traffic."""
    import concurrent.futures

    srv = serve.serve(port=0, workers=1)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        ws, co = _internals(srv)

        def post(payload):
            req = urllib.request.Request(
                f"{url}/v1/synthesize", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.headers.get("X-Optex-Cohort"), r.read()

        seeded = _batchable_payload(seed=11)
        _, solo = post(seeded)    # warm + reference bytes, idle server

        hold = ws.checkout()
        with concurrent.futures.ThreadPoolExecutor(3) as ex:
            fut_seeded = ex.submit(post, seeded)
            fut_a = ex.submit(post, _batchable_payload())
            fut_b = ex.submit(post, _batchable_payload())
            import time as _t
            _t.sleep(0.3)         # let all three park
            ws.checkin(hold)
            ch, seeded_bytes = fut_seeded.result(timeout=120)
            ra = fut_a.result(timeout=120)
            rb = fut_b.result(timeout=120)

        assert ch is None, "seeded request must not be coalesced"
        assert seeded_bytes == solo, "seeded bytes must not depend on load"
        assert all(r[1][:8] == b"\x89PNG\r\n\x1a\n" for r in (ra, rb))
    finally:
        srv.shutdown()


def test_execute_cohort_runs_real_batch():
    """_execute_cohort on a real pool: 3 members (padded batch 4) come back
    as 3 distinct single-image PNG responses."""
    pool = serve.SynthesizerPool()
    req = serve._parse_request(_batchable_payload())
    members = [serve._CohortMember(req) for _ in range(3)]
    bodies = serve._execute_cohort(pool, members)
    assert len(bodies) == 3
    assert all(ct == "image/png" for ct, _ in bodies)
    assert len({b for _, b in bodies}) == 3
