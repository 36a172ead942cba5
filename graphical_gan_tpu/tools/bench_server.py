"""Load benchmark for the dynamic-batching HTTP server (``serve/server.py``).

``tools/bench_serving.py`` measures the bare sampler dispatch; this tool
measures the full deployment stack — HTTP front, request queue, dynamic
batcher, bucket padding, device dispatch, response serialization — under
concurrent open-loop clients on the current backend.  Reported per
configuration: client-observed latency percentiles, aggregate samples/s,
and the server's own batching-efficiency counters (fill ratio, rows per
batch), one JSON line each.

Usage::

    python -m graphical_gan_tpu.tools.bench_server \
        [--family gan_inference] [--request-sizes 1,8,64] \
        [--clients 16] [--requests-per-client 20] \
        [--buckets 8,64,256] [--max-wait-ms 5] [--quantize int8]
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np
import jax

from graphical_gan_tpu.serve.server import (
    BatchingSampler, input_kinds, make_http_server)
from graphical_gan_tpu.serve.export import make_sampler
from graphical_gan_tpu.tools.bench_serving import _build


def _make_batcher(family: str, buckets, max_wait_ms: float, quantize=None):
    model = _build(family)
    params = model.init(jax.random.PRNGKey(0))
    fn, example = make_sampler(family, model)
    if quantize == "int8":
        from graphical_gan_tpu.ops import quant
        from graphical_gan_tpu.serve.quantize import calibrate
        scales = calibrate(family, model, params, jax.random.PRNGKey(11),
                           n_batches=2)
        float_fn = fn

        def fn(params, key, *inputs):  # noqa: F811
            with quant.quantized(scales):
                return float_fn(params, key, *inputs)
    call = jax.jit(lambda key, *inp: fn(params, key, *inp))
    return BatchingSampler(call, input_kinds(family, model.cfg),
                           [a.shape for a in example],
                           buckets=buckets, max_wait_ms=max_wait_ms), model


def run_load(family: str, request_size: int, clients: int,
             requests_per_client: int, buckets, max_wait_ms: float,
             quantize=None) -> dict:
    batcher, model = _make_batcher(family, buckets, max_wait_ms, quantize)
    httpd = make_http_server(batcher, {"family": family}, port=0)
    server_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    server_thread.start()
    try:
        batcher.warmup()
        from graphical_gan_tpu.serve.client import SamplerClient
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        latencies: list = [None] * clients

        def client(i: int):
            cl = SamplerClient(url)
            lats = []
            for r in range(requests_per_client):
                t0 = time.perf_counter()
                out = cl.sample(n=request_size,
                                seed=i * requests_per_client + r)
                lats.append(time.perf_counter() - t0)
                assert out.shape[0] == request_size
            latencies[i] = lats

        # one untimed request primes HTTP keepalive/numpy paths
        SamplerClient(url).sample(n=request_size, seed=0)
        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

        flat = sorted(x for ls in latencies for x in ls)
        n_req = clients * requests_per_client
        s = batcher.snapshot()
        frames = getattr(model.cfg, "seq_len", 1)
        return {
            "metric": f"{family}_server_throughput",
            "quantize": quantize or "none",
            "request_size": request_size, "clients": clients,
            "requests": n_req,
            "samples_per_sec": round(n_req * request_size / wall, 1),
            **({"frames_per_sec":
                round(n_req * request_size * frames / wall, 1)}
               if frames > 1 else {}),
            "latency_ms_p50": round(flat[len(flat) // 2] * 1e3, 2),
            "latency_ms_p95": round(flat[int(len(flat) * 0.95)] * 1e3, 2),
            "fill_ratio": s.get("fill_ratio"),
            "rows_per_batch": s.get("rows_per_batch"),
            "batches": s["batches"],
            "buckets": list(batcher.buckets),
            "max_wait_ms": max_wait_ms,
            "device_kind": jax.devices()[0].device_kind,
        }
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--family", default="gan_inference")
    p.add_argument("--request-sizes", default="1,8,64")
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests-per-client", type=int, default=20)
    p.add_argument("--buckets", default="8,64,256")
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--quantize", default=None, choices=["none", "int8"])
    args = p.parse_args(argv)
    buckets = [int(b) for b in args.buckets.split(",")]
    for n in [int(x) for x in args.request_sizes.split(",")]:
        rec = run_load(args.family, n, args.clients,
                       args.requests_per_client, buckets,
                       args.max_wait_ms, quantize=args.quantize)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
