"""Dynamic-batching inference server for exported/trained samplers.

The reference stops at writing one end-of-run checkpoint
(``gan_inference_cifar10.py:498-499``); ``serve/export.py`` made the
sampler a deployable artifact, and this module is the deployment runtime
around it: a request queue, a dynamic batcher, and a stdlib HTTP front —
the piece that turns "a compiled program" into "a service".

TPU-shaped design decisions:

- **Fixed-shape buckets.** XLA compiles one program per input shape, so
  arbitrary request sizes would recompile constantly.  Incoming requests
  are coalesced and padded up to the smallest configured bucket batch
  size; every bucket is compiled once (warmable at startup via
  ``warmup()``), after which the server never recompiles.
- **Prior-draw padding.** Generators in this codebase use batch-stats
  batchnorm at sampling time (faithful to the reference, which always
  samples under training-mode BN — ``tflib/ops/batchnorm.py``), so a row's
  output depends on its co-batched rows.  Padding with zeros would skew
  the BN statistics; padding with **prior-distributed latents** keeps the
  dispatched batch exactly the distribution the model always samples
  under.  Consequence, stated honestly: in ``batched`` mode a response is
  a true generator sample but is NOT bit-reproducible across different
  coalescings.  ``exact`` mode dispatches each request alone, unpadded,
  with a key derived only from the request seed — bit-reproducible across
  server restarts — at the cost of one compile per distinct request size.
- **Pipelined dispatch.** The batcher thread dispatches asynchronously and
  a single completion thread fetches results in order, so device compute
  overlaps host I/O (same structure as the async checkpoint writer).

- **Inference entries.** Besides the generator sampler, the server deploys
  the INFERENCE networks (``--entry encoder|cluster|reconstructor`` —
  ``serve/export.ENTRIES``): x→z codes, q(k|x) cluster posteriors, and
  G(E(x)) reconstruction — the representation-learning surface the
  reference trains but never ships.  Image-input entries have no
  server-side prior, so they accept npz payloads only, and padding cycles
  the pending rows (keeps the dispatched batch data-distributed under
  batch-stats BN) instead of drawing latents.

Backends: a run directory (in-framework jit of the trained entry,
optionally through the int8 PTQ path — ``ops/quant.py``) or an export
directory (``<entry>.jaxexport`` + manifest; runs without rebuilding the
model).

CLI::

    python -m graphical_gan_tpu.serve.server --run-dir RUNS/... --port 8787
    python -m graphical_gan_tpu.serve.server --export-dir RUNS/.../export

HTTP surface (stdlib-only client friendly; see ``serve/client.py``):

- ``POST /sample`` — body either JSON ``{"n": int, "seed": int,
  "exact": bool}`` (server draws prior latents from the seed) or an
  ``.npz`` payload whose arrays ``input0, input1, ...`` are the sampler
  inputs in manifest order.  Response: ``.npz`` with ``images`` (and
  ``meta`` echoed in the ``X-GGAN-Meta`` header).
- ``GET /healthz`` — liveness + model identity.
- ``GET /stats`` — batching efficiency counters (requests, batches,
  rows, padded rows, per-bucket histogram, latency percentiles).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# prior input descriptions (what to draw for server-side latents / padding)

def input_kinds(family: str, cfg) -> List[str]:
    """Per-input prior kind, aligned with ``serve.export.make_sampler``:
    ``"normal"`` (N(0,1) latent) or ``"onehot"`` (uniform category)."""
    if family == "gan_inference":
        return ["normal"]
    if family == "gmgan":
        return ["onehot", "normal"]
    if family == "ssgan":
        kinds = ["normal", "normal"]
        if cfg.conditional:
            kinds.append("onehot")
        return kinds
    raise ValueError(f"unknown family {family!r}")


def _draw_prior(kinds: Sequence[str], shapes: Sequence[Tuple[int, ...]],
                n: int, key) -> Tuple[np.ndarray, ...]:
    """Prior-distributed input rows (host-side numpy: cheap vs the model)."""
    out = []
    for kind, shape in zip(kinds, shapes):
        key, sub = jax.random.split(key)
        if kind == "onehot":
            k = int(shape[1])
            idx = np.asarray(jax.random.randint(sub, (n,), 0, k))
            out.append(np.eye(k, dtype=np.float32)[idx])
        elif kind == "image":
            # data inputs have no server-side prior — the client must ship
            # the array (npz payload); only warmup() fabricates zeros here
            raise ValueError(
                "this entry takes image inputs; POST an npz payload "
                "(input0, ...) instead of a seeded JSON request")
        else:
            out.append(np.asarray(
                jax.random.normal(sub, (n,) + tuple(shape[1:]), jnp.float32)))
    return tuple(out)


# --------------------------------------------------------------------------
# batching core

@dataclass
class _Request:
    inputs: Tuple[np.ndarray, ...]
    n: int
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[BaseException] = None
    filled: int = 0
    parts: List[Tuple[int, np.ndarray]] = field(default_factory=list)
    t_enq: float = 0.0
    latency_ms: float = 0.0

    def wait(self, timeout: Optional[float] = None) -> np.ndarray:
        if not self.done.wait(timeout):
            raise TimeoutError("sampler request timed out")
        if self.error is not None:
            raise self.error
        return self.result


class BatchingSampler:
    """Coalesce concurrent sample requests into fixed-bucket device batches.

    ``call(key, *inputs) -> images`` is any sampler callable (in-framework
    jit or a deserialized ``jax.export`` artifact).  Requests may straddle
    dispatch boundaries: the batcher packs up to ``max(buckets)`` rows per
    dispatch, pads the remainder to the smallest fitting bucket with
    prior-drawn rows, and scatters output rows back to their requests.
    """

    def __init__(self, call, kinds: Sequence[str],
                 input_shapes: Sequence[Tuple[int, ...]],
                 buckets: Sequence[int] = (8, 64, 256),
                 max_wait_ms: float = 5.0,
                 base_key: Optional[jax.Array] = None,
                 dp_devices: int = 1):
        self.call = call
        self.kinds = list(kinds)
        self.input_shapes = [tuple(s) for s in input_shapes]
        self.buckets = sorted(set(int(b) for b in buckets))
        if not self.buckets:
            raise ValueError("need at least one bucket size")
        self.dp = max(int(dp_devices), 1)
        if any(b % self.dp for b in self.buckets):
            raise ValueError(
                f"every bucket must be divisible by dp_devices={self.dp} "
                f"(got {self.buckets}) — dispatched batches shard over the "
                "batch axis")
        self.max_wait = max_wait_ms / 1e3
        self.base_key = (base_key if base_key is not None
                         else jax.random.PRNGKey(0))
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._batch_counter = 0
        self._lock = threading.Lock()
        self.stats = {
            "requests": 0, "rows": 0, "batches": 0, "padded_rows": 0,
            "exact_requests": 0,
            "bucket_hist": {str(b): 0 for b in self.buckets},
        }
        self._latencies: List[float] = []
        self._exact_sizes: set = set()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="ggan-batcher")
        self._thread.start()

    # -- public API ---------------------------------------------------------

    def submit(self, inputs: Optional[Sequence[np.ndarray]] = None,
               n: Optional[int] = None, seed: int = 0) -> _Request:
        """Enqueue a request; returns a waitable ``_Request``.

        Either pass explicit ``inputs`` (arrays in manifest order, shared
        leading batch dim) or ``n`` + ``seed`` for server-drawn priors.
        """
        if inputs is None:
            if n is None:
                raise ValueError("pass inputs or n")
            inputs = _draw_prior(self.kinds, self.input_shapes, int(n),
                                 jax.random.PRNGKey(int(seed)))
        inputs = tuple(np.asarray(a, np.float32) for a in inputs)
        rows = inputs[0].shape[0]
        if rows == 0:
            raise ValueError("request has zero rows; send at least one")
        for a, shape in zip(inputs, self.input_shapes):
            if a.shape[0] != rows or a.shape[1:] != shape[1:]:
                raise ValueError(
                    f"input shape {a.shape} does not match sampler spec "
                    f"(batch, {shape[1:]})")
        if self._stop.is_set():
            raise RuntimeError("BatchingSampler is closed")
        req = _Request(inputs=inputs, n=rows, t_enq=time.perf_counter())
        with self._lock:
            self.stats["requests"] += 1
            self.stats["rows"] += rows
        self._q.put(req)
        return req

    def sample_exact(self, inputs: Optional[Sequence[np.ndarray]] = None,
                     n: Optional[int] = None, seed: int = 0) -> np.ndarray:
        """Bit-reproducible path: dispatch this request alone, unpadded,
        key = PRNGKey(seed).  One compile per distinct request size."""
        if inputs is None:
            if n is None:
                raise ValueError("pass inputs or n")
            inputs = _draw_prior(self.kinds, self.input_shapes, int(n),
                                 jax.random.PRNGKey(int(seed)))
        inputs = tuple(np.asarray(a, np.float32) for a in inputs)
        if inputs[0].shape[0] == 0:
            raise ValueError("request has zero rows; send at least one")
        if inputs[0].shape[0] % self.dp:
            raise ValueError(
                f"exact mode dispatches unpadded, so the request size must "
                f"be divisible by dp_devices={self.dp} "
                f"(got {inputs[0].shape[0]})")
        out = np.asarray(self.call(jax.random.PRNGKey(int(seed)),
                                   *[jnp.asarray(a) for a in inputs]))
        with self._lock:
            self.stats["exact_requests"] += 1
            self._exact_sizes.add(inputs[0].shape[0])
        return out

    def warmup(self) -> None:
        """Compile every bucket program before taking traffic."""
        for b in self.buckets:
            pad = self._warmup_inputs(b)
            np.asarray(self.call(jax.random.PRNGKey(1),
                                 *[jnp.asarray(a) for a in pad]))

    def _warmup_inputs(self, n: int) -> Tuple[np.ndarray, ...]:
        """Shape-correct inputs for compilation only: prior draws for latent
        kinds, zeros for image kinds (the values never reach a client)."""
        key = jax.random.PRNGKey(1)
        out = []
        for kind, shape in zip(self.kinds, self.input_shapes):
            if kind == "image":
                out.append(np.zeros((n,) + tuple(shape[1:]), np.float32))
            else:
                out.append(_draw_prior([kind], [shape], n, key)[0])
            key = jax.random.fold_in(key, 1)
        return tuple(out)

    def snapshot(self) -> Dict:
        with self._lock:
            lat = sorted(self._latencies[-4096:])
            s = dict(self.stats, bucket_hist=dict(self.stats["bucket_hist"]))
        if lat:
            s["latency_ms_p50"] = round(lat[len(lat) // 2], 3)
            s["latency_ms_p95"] = round(lat[int(len(lat) * 0.95)], 3)
        if s["batches"]:
            dispatched = s["rows"] + s["padded_rows"]
            s["fill_ratio"] = round(s["rows"] / max(dispatched, 1), 4)
            s["rows_per_batch"] = round(s["rows"] / s["batches"], 2)
        return s

    def close(self) -> None:
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=5)

    # -- batcher loop --------------------------------------------------------

    def _collect(self) -> List[_Request]:
        """Block for one request, then coalesce arrivals for max_wait or
        until a full max-bucket of rows is pending."""
        first = self._q.get()
        if first is None:
            return []
        batch, rows = [first], first.n
        deadline = time.perf_counter() + self.max_wait
        cap = self.buckets[-1]
        while rows < cap:
            remain = deadline - time.perf_counter()
            if remain <= 0:
                break
            try:
                req = self._q.get(timeout=remain)
            except queue.Empty:
                break
            if req is None:
                self._q.put(None)  # re-post the sentinel for shutdown
                break
            batch.append(req)
            rows += req.n
        return batch

    def _loop(self) -> None:
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                if self._stop.is_set():
                    break
                continue
            try:
                self._dispatch(batch)
            except BaseException as e:  # surface to every unfinished waiter
                for req in batch:
                    if not req.done.is_set():
                        req.error = e
                        req.done.set()

    def _dispatch(self, batch: List[_Request]) -> None:
        # flatten pending rows; requests may straddle device batches
        pending: List[Tuple[_Request, int, int]] = []  # (req, start, stop)
        for req in batch:
            pending.append((req, req.filled, req.n))
        i = 0
        while i < len(pending):
            chunk: List[Tuple[_Request, int, int]] = []
            rows = 0
            cap = self.buckets[-1]
            while i < len(pending) and rows < cap:
                req, start, stop = pending[i]
                take = min(stop - start, cap - rows)
                chunk.append((req, start, start + take))
                rows += take
                if start + take < stop:
                    pending[i] = (req, start + take, stop)
                else:
                    i += 1
            bucket = next(b for b in self.buckets if b >= rows)
            pad = bucket - rows
            with self._lock:
                self._batch_counter += 1
                counter = self._batch_counter
                self.stats["batches"] += 1
                self.stats["padded_rows"] += pad
                self.stats["bucket_hist"][str(bucket)] += 1
            parts = [np.concatenate(
                [req.inputs[j][a:b] for req, a, b in chunk], axis=0)
                for j in range(len(self.input_shapes))]
            if pad:
                if "image" in self.kinds:
                    # image entries: no prior to draw from, so pad by
                    # cycling the pending rows — the padded batch stays
                    # data-distributed (matters under batch-stats BN), and
                    # row tuples (e.g. video + label) stay consistent
                    wrap = np.arange(rows, bucket) % rows
                    parts = [np.concatenate([p, p[wrap]], axis=0)
                             for p in parts]
                else:
                    extra = _draw_prior(
                        self.kinds, self.input_shapes, pad,
                        jax.random.fold_in(self.base_key, counter))
                    parts = [np.concatenate([p, e], axis=0)
                             for p, e in zip(parts, extra)]
            key = jax.random.fold_in(self.base_key, counter)
            out = np.asarray(self.call(key, *[jnp.asarray(p) for p in parts]))
            off = 0
            now = time.perf_counter()
            for req, a, b in chunk:
                req.parts.append((a, out[off:off + (b - a)]))
                off += b - a
                req.filled += b - a
                if req.filled == req.n:
                    res = np.empty((req.n,) + out.shape[1:], out.dtype)
                    for start, arr in req.parts:
                        res[start:start + arr.shape[0]] = arr
                    req.result, req.parts = res, []
                    req.latency_ms = (now - req.t_enq) * 1e3
                    with self._lock:
                        self._latencies.append(req.latency_ms)
                        if len(self._latencies) > 8192:  # bound memory
                            del self._latencies[:4096]
                    req.done.set()


# --------------------------------------------------------------------------
# backends

def sampler_from_run_dir(run_dir: str, quantize: Optional[str] = None,
                         ckpt: Optional[str] = None,
                         entry: str = "sampler",
                         dp_devices: Optional[int] = None):
    """(call, kinds, input_shapes, identity) from a trained run directory.

    ``entry`` picks the served network (``serve.export.ENTRIES``): the
    generator sampler or the inference side (encoder / cluster /
    reconstructor — image-input entries, npz payloads only).

    ``dp_devices=N`` shards every dispatched batch over the first N local
    devices (1-D data mesh, params replicated): scale-out inference where
    one replica's buckets span chips over ICI.  GSPMD keeps the semantics
    global — batch-stats BN reduces across the whole dispatched batch, so
    outputs match single-device serving up to reduction order.  Bucket
    sizes must be divisible by N (the batcher enforces it), and exact-mode
    requests must be too, since they dispatch unpadded.
    """
    from graphical_gan_tpu.core import registry
    from graphical_gan_tpu.serve.export import make_entry
    from graphical_gan_tpu.tools.generate import rebuild, restore_params
    from graphical_gan_tpu.train import checkpoint as ckpt_lib

    family, cfg, model = rebuild(run_dir)
    path = ckpt or ckpt_lib.latest(run_dir)
    if path is None:
        raise FileNotFoundError(f"no ckpt_*.npz under {run_dir}")
    params, extra = restore_params(model, path)
    fn, example, kinds = make_entry(family, model, entry)

    if quantize == "int8":
        if entry != "sampler":
            raise ValueError("--quantize int8 calibrates on prior latents "
                             "and applies to the sampler entry only")
        from graphical_gan_tpu.ops import quant
        from graphical_gan_tpu.serve.quantize import calibrate
        scales = calibrate(family, model, params, jax.random.PRNGKey(11))
        float_fn = fn

        def fn(params, key, *inputs):  # noqa: F811 — quantized wrapper
            with quant.quantized(scales):
                return float_fn(params, key, *inputs)
    elif quantize not in (None, "none"):
        raise ValueError(f"unknown quantize mode {quantize!r}")

    from graphical_gan_tpu.serve.export import ENTRY_OUTPUT
    identity = {"family": family, "entry": entry, "backend": "run_dir",
                "output": ENTRY_OUTPUT.get(entry, "images"),
                "checkpoint": os.path.basename(path),
                "iteration": int(extra.get("iteration", -1)),
                "quantization": quantize or "none"}
    if dp_devices and dp_devices > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from graphical_gan_tpu.parallel.mesh import make_mesh, replicate
        mesh = make_mesh(dp_devices)
        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("data"))
        params = replicate(mesh, params)
        call = jax.jit(lambda key, *inp: fn(params, key, *inp),
                       in_shardings=(repl,) + (shard,) * len(example),
                       out_shardings=shard)
        identity["dp_devices"] = int(dp_devices)
    else:
        call = jax.jit(lambda key, *inp: fn(params, key, *inp))
    return call, kinds, [tuple(a.shape) for a in example], identity


def sampler_from_export(export_dir: str):
    """(call, kinds, input_shapes, identity) from an export directory.

    Uses only the artifact + manifest — the model never rebuilds, so this
    path works for artifacts produced elsewhere (incl. ``--quantize int8``
    exports, whose int8 program is baked into the blob)."""
    from graphical_gan_tpu.serve.export import load_sampler

    with open(os.path.join(export_dir, "manifest.json")) as f:
        manifest = json.load(f)
    call = load_sampler(os.path.join(
        export_dir, manifest.get("blob", "sampler.jaxexport")))
    kinds = [inp.get("prior", "normal") for inp in manifest["inputs"]]
    shapes = [tuple(inp["shape"]) for inp in manifest["inputs"]]
    identity = {"family": manifest["family"], "backend": "export",
                "entry": manifest.get("entry", "sampler"),
                "output": manifest.get("output", "images"),
                "iteration": manifest.get("iteration", -1),
                "quantization": manifest.get("quantization", "none"),
                "symbolic_batch": manifest.get("symbolic_batch", False)}
    return call, kinds, shapes, identity


# --------------------------------------------------------------------------
# HTTP front

def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def make_http_server(batcher: BatchingSampler, identity: Dict,
                     host: str = "127.0.0.1", port: int = 0,
                     request_timeout: float = 120.0) -> ThreadingHTTPServer:
    """A ``ThreadingHTTPServer`` wired to the batcher; caller runs
    ``serve_forever`` (CLI) or drives it from a thread (tests)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; stats live at /stats
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, **identity})
            elif self.path == "/stats":
                self._json(200, batcher.snapshot())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/sample":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                exact = False
                if "json" in ctype:
                    spec = json.loads(raw.decode())
                    exact = bool(spec.get("exact", False))
                    kw = dict(n=int(spec.get("n", 1)),
                              seed=int(spec.get("seed", 0)))
                else:  # npz payload: input0, input1, ... in manifest order
                    data = np.load(io.BytesIO(raw))
                    inputs = [data[f"input{i}"]
                              for i in range(len(batcher.input_shapes))]
                    exact = self.headers.get("X-GGAN-Exact", "") == "1"
                    kw = dict(
                        inputs=inputs,
                        seed=int(self.headers.get("X-GGAN-Seed", "0")))
                out_name = identity.get("output", "images")
                if exact:
                    images = batcher.sample_exact(**kw)
                    meta = {"mode": "exact", "output": out_name}
                else:
                    req = batcher.submit(**kw)
                    images = req.wait(timeout=request_timeout)
                    meta = {"mode": "batched", "output": out_name,
                            "latency_ms": round(req.latency_ms, 3)}
            except Exception as e:  # noqa: BLE001 — report to the client
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            # key the array by the entry's declared output; 'images' stays
            # as an alias so existing clients keep working
            arrays = {out_name: images}
            arrays.setdefault("images", images)
            body = _npz_bytes(**arrays)
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-GGAN-Meta", json.dumps(meta))
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--run-dir", help="trained run directory backend")
    src.add_argument("--export-dir",
                     help="serve a jax.export artifact directory")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--entry", default="sampler",
                   choices=["sampler", "encoder", "cluster", "reconstructor"],
                   help="which network to serve (run-dir backend; export "
                        "artifacts carry their own entry): the generator "
                        "sampler, or the inference side — encoder x->z, "
                        "cluster x->q(k|x), reconstructor x->G(E(x)). "
                        "Image-input entries take npz payloads only")
    p.add_argument("--quantize", default=None, choices=["none", "int8"],
                   help="int8 PTQ path (run-dir backend; export artifacts "
                        "carry their own quantization)")
    p.add_argument("--dp-devices", type=int, default=1,
                   help="shard dispatched batches over the first N local "
                        "devices (1-D data mesh, params replicated; "
                        "run-dir backend). Buckets must be divisible by N")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--buckets", default="8,64,256",
                   help="fixed batch buckets (each compiles once)")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="batching window after the first queued request")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip compiling every bucket before serving")
    p.add_argument("--compile-cache", default=None,
                   help="persistent XLA compilation cache dir (or "
                        "GGAN_COMPILE_CACHE) — restarts of a serving "
                        "replica warm their bucket programs from disk")
    args = p.parse_args(argv)
    from graphical_gan_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache(args.compile_cache)

    if args.run_dir:
        call, kinds, shapes, identity = sampler_from_run_dir(
            args.run_dir, quantize=args.quantize, ckpt=args.ckpt,
            entry=args.entry, dp_devices=args.dp_devices)
    else:
        if args.dp_devices > 1:
            raise SystemExit("--dp-devices applies to the run-dir backend "
                             "(export artifacts carry their own lowering)")
        call, kinds, shapes, identity = sampler_from_export(args.export_dir)

    batcher = BatchingSampler(
        call, kinds, shapes,
        buckets=[int(b) for b in args.buckets.split(",")],
        max_wait_ms=args.max_wait_ms, dp_devices=args.dp_devices)
    if not args.no_warmup:
        t0 = time.perf_counter()
        batcher.warmup()
        print(json.dumps({"warmup_s": round(time.perf_counter() - t0, 1),
                          "buckets": batcher.buckets}), flush=True)
    httpd = make_http_server(batcher, identity,
                             host=args.host, port=args.port)
    print(json.dumps({"serving": True, "host": args.host,
                      "port": httpd.server_address[1], **identity}),
          flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        batcher.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
