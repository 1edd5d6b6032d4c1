"""Live HTTP load test for the serving layer.

Starts serve.serve() in-process (one worker on the attached device), fires
``--clients`` concurrent unseeded synthesis requests until ``--requests``
total complete, and prints one JSON line: warm single-request latency,
sustained req/s, and the coalescing counters. This is the tool behind the
request-throughput and coalescing tables in docs/SERVING.md.

    # on the TPU host (ONE TPU process at a time — run nothing else):
    python tools/serve_loadtest.py --size 512 --clients 4 --requests 24
    python tools/serve_loadtest.py --size 512 --clients 4 --coalesce 1 ...

The workload is the full default schedule (5 passes / 500 iters) on the
graffiti style — the same shape as SERVING.md's r4 table.
"""

import argparse
import base64
import concurrent.futures
import json
import sys
import threading
import time
import urllib.request


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--requests", type=int, default=24,
                   help="total timed requests (after warmup)")
    p.add_argument("--coalesce", type=int, default=8,
                   help="max cohort size (1 = coalescing off)")
    p.add_argument("--config", action="append", default=[],
                   metavar="KEY=JSON", help="extra config fields")
    p.add_argument("--style", default="/root/reference/style/graffiti.jpg")
    args = p.parse_args()

    from optimaltextures_tpu import serve

    srv = serve.serve(port=0, workers=1, coalesce=args.coalesce)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    cfg = {"size": args.size, "conv_dtype": "bfloat16"}
    for kv in args.config:
        k, _, v = kv.partition("=")
        cfg[k] = json.loads(v)
    with open(args.style, "rb") as f:
        payload = json.dumps({
            "config": cfg,
            "style_b64": [base64.b64encode(f.read()).decode()],
        }).encode()

    def post():
        req = urllib.request.Request(
            f"{url}/v1/synthesize", data=payload,
            headers={"Content-Type": "application/json"})
        t0 = time.time()
        with urllib.request.urlopen(req, timeout=1200) as r:
            body = r.read()
            cohort = r.headers.get("X-Optex-Cohort")
        return time.time() - t0, cohort, len(body)

    # warmup: compile the batch sizes the cohorts will hit (1 and the
    # pow2 pad of the expected queue depth), then measure a warm single
    for _ in range(2):
        post()
    if args.coalesce > 1 and args.clients > 1:
        with concurrent.futures.ThreadPoolExecutor(args.clients) as ex:
            list(ex.map(lambda _: post(), range(args.clients * 2)))
    warm_single = min(post()[0] for _ in range(3))

    t0 = time.time()
    with concurrent.futures.ThreadPoolExecutor(args.clients) as ex:
        results = list(ex.map(lambda _: post(), range(args.requests)))
    wall = time.time() - t0

    with urllib.request.urlopen(f"{url}/metrics") as r:
        metrics = r.read().decode()
    counters = {ln.rsplit(" ", 1)[0]: float(ln.rsplit(" ", 1)[1])
                for ln in metrics.splitlines() if not ln.startswith("#")}
    cohorts = sorted({int(c) for _, c, _ in results if c is not None})
    print(json.dumps({
        "size": args.size, "clients": args.clients,
        "coalesce": args.coalesce, "requests": args.requests,
        "warm_single_latency_s": round(warm_single, 3),
        "wall_s": round(wall, 3),
        "req_per_s": round(args.requests / wall, 3),
        "mean_latency_s": round(sum(t for t, _, _ in results)
                                / len(results), 3),
        "cohort_sizes_seen": cohorts,
        "coalesced_requests_total":
            counters.get("optex_coalesced_requests_total", 0.0),
        "coalesced_cohorts_total":
            counters.get("optex_coalesced_cohorts_total", 0.0),
    }))
    srv.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
