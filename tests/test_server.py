"""Dynamic-batching inference server (``serve/server.py``).

The reference ships no serving runtime at all (it writes one end-of-run
checkpoint, ``gan_inference_cifar10.py:498-499``); these tests pin the
deployment runtime's contracts:

- coalescing: concurrent requests share device batches; the stats
  counters account every row, pad row, and bucket dispatch;
- padding correctness: with batch-stats BN OFF (svhn config) a padded
  bucket dispatch returns bit-identical rows to a solo unpadded call —
  i.e. the pad/scatter plumbing adds nothing;
- straddling: one request larger than the max bucket spans multiple
  device batches and reassembles in order;
- exact mode: bit-reproducible given (inputs|seed) across calls;
- the HTTP front + stdlib client round-trip (JSON-seeded and explicit
  npz-input requests, health, stats, and the 400 error path);
- the export-dir backend (manifest ``prior`` kinds drive server-side
  latent draws).
"""

import json
import os
import threading
from dataclasses import asdict

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.core.config import gan_inference_defaults
from graphical_gan_tpu.models.gan_inference import GanInferenceModel
from graphical_gan_tpu.serve.export import make_sampler
from graphical_gan_tpu.serve.server import (
    BatchingSampler, input_kinds, make_http_server, sampler_from_export)

KEY = jax.random.PRNGKey(0)


def _tiny(dataset="svhn", mode="ali", **kw):
    """svhn default has bn=False -> sampler rows are co-batch independent,
    which is what makes padding bit-exactness assertable."""
    cfg = gan_inference_defaults(dataset, mode, dim=8, batch_size=8, **kw)
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    fn, example = make_sampler("gan_inference", model)
    call = jax.jit(lambda key, *inp: fn(params, key, *inp))
    return cfg, model, params, call, example


def _batcher(call, cfg, example, **kw):
    kw.setdefault("buckets", (4, 8))
    kw.setdefault("max_wait_ms", 40.0)
    return BatchingSampler(call, input_kinds("gan_inference", cfg),
                           [a.shape for a in example], **kw)


def test_coalescing_and_stats_accounting():
    cfg, model, params, call, example = _tiny()
    b = _batcher(call, cfg, example)
    try:
        b.warmup()
        reqs, results = [], {}

        def worker(i, n):
            r = b.submit(n=n, seed=i)
            results[i] = r.wait(timeout=120)

        sizes = [1, 2, 1, 3, 2, 1]
        threads = [threading.Thread(target=worker, args=(i, n))
                   for i, n in enumerate(sizes)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, n in enumerate(sizes):
            assert results[i].shape[0] == n
        s = b.snapshot()
        assert s["requests"] == len(sizes)
        assert s["rows"] == sum(sizes)
        # every dispatched bucket's rows are accounted: real + pad
        dispatched = sum(int(k) * v for k, v in s["bucket_hist"].items())
        assert dispatched == s["rows"] + s["padded_rows"]
        # concurrent submits under one 40 ms window must coalesce
        assert s["batches"] < s["requests"]
        assert 0 < s["fill_ratio"] <= 1
    finally:
        b.close()


def test_padding_bit_exact_when_rows_independent():
    cfg, model, params, call, example = _tiny()  # svhn: bn off
    b = _batcher(call, cfg, example)
    try:
        noise = np.random.RandomState(3).randn(3, cfg.dim_latent).astype(
            np.float32)
        out = b.submit(inputs=[noise]).wait(timeout=120)
        direct = np.asarray(registry.apply(
            lambda: model.sample(jnp.asarray(noise)), params, KEY))
        np.testing.assert_array_equal(out, direct)
        assert b.snapshot()["padded_rows"] == 1  # 3 rows -> bucket 4
    finally:
        b.close()


def test_request_straddles_device_batches():
    cfg, model, params, call, example = _tiny()
    b = _batcher(call, cfg, example)  # max bucket 8
    try:
        noise = np.random.RandomState(4).randn(11, cfg.dim_latent).astype(
            np.float32)
        out = b.submit(inputs=[noise]).wait(timeout=120)
        assert out.shape[0] == 11
        direct = np.asarray(registry.apply(
            lambda: model.sample(jnp.asarray(noise)), params, KEY))
        np.testing.assert_array_equal(out, direct)  # order preserved
        s = b.snapshot()
        assert s["batches"] == 2  # 8 + 3->4
        assert s["padded_rows"] == 1
    finally:
        b.close()


def test_exact_mode_bit_reproducible():
    cfg, model, params, call, example = _tiny()
    b = _batcher(call, cfg, example)
    try:
        a = b.sample_exact(n=5, seed=42)
        c = b.sample_exact(n=5, seed=42)
        np.testing.assert_array_equal(a, c)
        d = b.sample_exact(n=5, seed=43)
        assert not np.array_equal(a, d)  # seed actually drives the draw
        assert b.snapshot()["exact_requests"] == 3
    finally:
        b.close()


def test_bn_batch_stats_motivate_prior_padding():
    """Documents the design constraint: with BN ON (mnist config), a row's
    output depends on its co-batched rows — the reason batched mode pads
    with prior draws and exact mode exists (server.py module docstring)."""
    cfg, model, params, call, example = _tiny(dataset="mnist")
    assert cfg.bn
    noise = np.random.RandomState(0).randn(8, cfg.dim_latent).astype(
        np.float32)
    full = np.asarray(registry.apply(
        lambda: model.sample(jnp.asarray(noise)), params, KEY))
    sub = np.asarray(registry.apply(
        lambda: model.sample(jnp.asarray(noise[:3])), params, KEY))
    assert not np.allclose(full[:3], sub, atol=1e-5)


def test_http_roundtrip_and_error_path():
    from graphical_gan_tpu.serve.client import SamplerClient

    cfg, model, params, call, example = _tiny()
    b = _batcher(call, cfg, example)
    httpd = make_http_server(b, {"family": "gan_inference"}, port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        cl = SamplerClient(f"http://127.0.0.1:{httpd.server_address[1]}")
        h = cl.healthz()
        assert h["ok"] and h["family"] == "gan_inference"

        img = cl.sample(n=2, seed=7)
        assert img.shape[0] == 2

        noise = np.random.RandomState(5).randn(3, cfg.dim_latent).astype(
            np.float32)
        served = cl.sample(inputs=[noise])
        direct = np.asarray(registry.apply(
            lambda: model.sample(jnp.asarray(noise)), params, KEY))
        np.testing.assert_array_equal(served, direct)  # svhn: bn off

        # exact over HTTP is reproducible
        e1 = cl.sample(n=4, seed=9, exact=True)
        e2 = cl.sample(n=4, seed=9, exact=True)
        np.testing.assert_array_equal(e1, e2)

        s = cl.stats()
        assert s["requests"] >= 2 and s["exact_requests"] == 2

        # malformed request -> structured 400, not a dead connection
        import urllib.error
        import urllib.request
        bad = urllib.request.Request(
            cl.base + "/sample", data=b"{\"n\": \"x\"}", method="POST",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
        assert "error" in json.loads(ei.value.read().decode())
    finally:
        httpd.shutdown()
        httpd.server_close()
        b.close()


def test_export_dir_backend(tmp_path):
    from graphical_gan_tpu.serve.export import export_sampler
    from graphical_gan_tpu.train import checkpoint as ckpt_lib
    from graphical_gan_tpu.train.step import make_train_step

    cfg, model, params, call, example = _tiny()
    run_dir = tmp_path / "run"
    os.makedirs(run_dir)
    with open(run_dir / "config.json", "w") as f:
        json.dump(asdict(cfg), f, default=str)
    _, init_state = make_train_step(model, jit=False)
    ckpt_lib.save(str(run_dir / "ckpt_3.npz"), init_state(params),
                  {"iteration": 3})

    info = export_sampler(str(run_dir), platforms=("cpu",))
    assert info["inputs"][0]["prior"] == "normal"  # manifest kinds present

    ecall, kinds, shapes, identity = sampler_from_export(
        os.path.dirname(info["blob"]))
    assert identity["backend"] == "export"
    assert kinds == ["normal"]
    b = BatchingSampler(ecall, kinds, shapes, buckets=(4, 8),
                        max_wait_ms=20.0)
    try:
        noise = np.random.RandomState(6).randn(2, cfg.dim_latent).astype(
            np.float32)
        out = b.submit(inputs=[noise]).wait(timeout=120)
        # export params == the checkpointed init params used above
        direct = np.asarray(registry.apply(
            lambda: model.sample(jnp.asarray(noise)), params, KEY))
        np.testing.assert_allclose(out, direct, atol=1e-5)
        # seeded server-side draw works off manifest priors alone
        assert b.submit(n=3, seed=1).wait(timeout=120).shape[0] == 3
    finally:
        b.close()


def test_image_entry_batched_serving():
    """Inference-side serving: a reconstructor entry behind the dynamic
    batcher.  svhn/ali (bn off, TYPE_Q no_std) makes the forward
    deterministic and row-independent, so the row-cycling pad policy adds
    nothing beyond shape-dependent float noise (the extractor's convs
    reassociate across batch shapes — observed <=1e-6 abs, vs the
    generator-only sampler which is bit-exact); seeded JSON-style requests
    must be refused (there is no server-side prior over images)."""
    from graphical_gan_tpu.serve.export import make_entry

    cfg = gan_inference_defaults("svhn", "ali", dim=8, batch_size=8)
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    fn, example, kinds = make_entry("gan_inference", model, "reconstructor")
    assert kinds == ["image"]
    call = jax.jit(lambda key, *inp: fn(params, key, *inp))
    b = BatchingSampler(call, kinds, [a.shape for a in example],
                        buckets=(4, 8), max_wait_ms=20.0)
    try:
        b.warmup()  # zero-image warmup inputs compile every bucket
        raw = np.random.RandomState(0).randint(
            0, 256, size=(3, cfg.data.output_dim)).astype(np.float32)
        out = b.submit(inputs=[raw]).wait(timeout=120)
        direct = np.asarray(registry.apply(
            lambda: model.reconstruct(jnp.asarray(raw)), params, KEY))
        np.testing.assert_allclose(out, direct, atol=1e-5)
        assert b.snapshot()["padded_rows"] == 1

        # exact mode: key derives from the request seed alone
        e1 = b.sample_exact(inputs=[raw], seed=9)
        e2 = b.sample_exact(inputs=[raw], seed=9)
        np.testing.assert_array_equal(e1, e2)

        with pytest.raises(ValueError, match="npz payload"):
            b.submit(n=2, seed=0)
        with pytest.raises(ValueError, match="npz payload"):
            b.sample_exact(n=2, seed=0)
    finally:
        b.close()


def test_image_entry_export_dir_backend(tmp_path):
    """An encoder export round-trips through the export-dir server backend:
    manifest entry/blob/kinds drive the server with no model rebuild."""
    from graphical_gan_tpu.serve.export import export_sampler
    from graphical_gan_tpu.train import checkpoint as ckpt_lib
    from graphical_gan_tpu.train.step import make_train_step

    cfg = gan_inference_defaults("svhn", "ali", dim=8, batch_size=8)
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    run_dir = tmp_path / "run"
    os.makedirs(run_dir)
    with open(run_dir / "config.json", "w") as f:
        json.dump(asdict(cfg), f, default=str)
    _, init_state = make_train_step(model, jit=False)
    ckpt_lib.save(str(run_dir / "ckpt_3.npz"), init_state(params),
                  {"iteration": 3})

    info = export_sampler(str(run_dir), platforms=("cpu",), entry="encoder")
    ecall, kinds, shapes, identity = sampler_from_export(
        os.path.dirname(info["blob"]))
    assert identity["entry"] == "encoder"
    assert kinds == ["image"]
    b = BatchingSampler(ecall, kinds, shapes, buckets=(4,), max_wait_ms=20.0)
    try:
        raw = np.random.RandomState(7).randint(
            0, 256, size=(2, cfg.data.output_dim)).astype(np.float32)
        z = b.submit(inputs=[raw]).wait(timeout=120)
        direct = np.asarray(registry.apply(
            lambda: model.encode(jnp.asarray(raw)), params, KEY))
        np.testing.assert_allclose(z, direct, atol=1e-5)
    finally:
        b.close()


def test_dp_serving_matches_single_device(tmp_path):
    """Scale-out serving: dispatched batches shard over a 2-device data
    mesh (params replicated).  mnist/ali keeps BN ON, so GSPMD must reduce
    the batch statistics ACROSS devices for outputs to match the
    single-device server — which this asserts.  Divisibility contracts:
    buckets and exact-mode request sizes must split over the mesh."""
    from graphical_gan_tpu.serve.server import sampler_from_run_dir
    from graphical_gan_tpu.train import checkpoint as ckpt_lib
    from graphical_gan_tpu.train.step import make_train_step

    cfg = gan_inference_defaults("mnist", "ali", dim=8, batch_size=8)
    assert cfg.bn
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    run_dir = tmp_path / "run"
    os.makedirs(run_dir)
    with open(run_dir / "config.json", "w") as f:
        json.dump(asdict(cfg), f, default=str)
    _, init_state = make_train_step(model, jit=False)
    ckpt_lib.save(str(run_dir / "ckpt_1.npz"), init_state(params),
                  {"iteration": 1})

    single, kinds, shapes, ident1 = sampler_from_run_dir(str(run_dir))
    sharded, _, _, ident2 = sampler_from_run_dir(str(run_dir), dp_devices=2)
    assert "dp_devices" not in ident1 and ident2["dp_devices"] == 2

    noise = jnp.asarray(np.random.RandomState(0).randn(
        8, cfg.dim_latent), jnp.float32)
    key = jax.random.PRNGKey(5)
    np.testing.assert_allclose(np.asarray(sharded(key, noise)),
                               np.asarray(single(key, noise)), atol=1e-5)

    # divisibility contracts
    with pytest.raises(ValueError, match="divisible"):
        BatchingSampler(sharded, kinds, shapes, buckets=(3, 8), dp_devices=2)
    b = BatchingSampler(sharded, kinds, shapes, buckets=(4, 8),
                        max_wait_ms=20.0, dp_devices=2)
    try:
        with pytest.raises(ValueError, match="divisible"):
            b.sample_exact(n=3, seed=0)
        # an odd request pads to an even bucket and dispatches sharded
        out = b.submit(inputs=[np.asarray(noise[:3])]).wait(timeout=120)
        assert out.shape[0] == 3 and np.isfinite(out).all()
    finally:
        b.close()


def test_input_validation_surfaces_to_waiter():
    cfg, model, params, call, example = _tiny()
    b = _batcher(call, cfg, example)
    try:
        with pytest.raises(ValueError):
            b.submit(inputs=[np.zeros((2, cfg.dim_latent + 1), np.float32)])
        with pytest.raises(ValueError):
            b.submit()
        # zero-row requests are rejected up front (a 0-row image batch
        # would hit a divide-by-zero in the pad-cycling `% rows`)
        with pytest.raises(ValueError, match="zero rows"):
            b.submit(inputs=[np.zeros((0, cfg.dim_latent), np.float32)])
        with pytest.raises(ValueError, match="zero rows"):
            b.sample_exact(inputs=[np.zeros((0, cfg.dim_latent),
                                            np.float32)])
    finally:
        b.close()


def test_http_response_keyed_by_entry_output():
    """A non-image-output entry (encoder -> 'latents') keys the response
    array by the manifest output name, keeps 'images' as a client alias,
    and advertises the name in X-GGAN-Meta."""
    import io
    import urllib.request
    from graphical_gan_tpu.serve.export import ENTRY_OUTPUT, make_entry

    cfg = gan_inference_defaults("svhn", "ali", dim=8, batch_size=8)
    model = GanInferenceModel(cfg)
    params = model.init(KEY)
    fn, example, kinds = make_entry("gan_inference", model, "encoder")
    call = jax.jit(lambda key, *inp: fn(params, key, *inp))
    b = BatchingSampler(call, kinds, [a.shape for a in example],
                        buckets=(4, 8), max_wait_ms=20.0)
    identity = {"family": "gan_inference", "entry": "encoder",
                "output": ENTRY_OUTPUT["encoder"]}
    httpd = make_http_server(b, identity, port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        raw = np.random.RandomState(0).randint(
            0, 256, size=(2, cfg.data.output_dim)).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, input0=raw)
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_address[1]}/sample",
            data=buf.getvalue(), method="POST",
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=120) as r:
            meta = json.loads(r.headers["X-GGAN-Meta"])
            data = np.load(io.BytesIO(r.read()))
        assert meta["output"] == "latents"
        assert set(data.files) == {"latents", "images"}
        np.testing.assert_array_equal(data["latents"], data["images"])
        assert data["latents"].shape == (2, cfg.dim_latent)

        # the stdlib client resolves the output name transparently
        from graphical_gan_tpu.serve.client import SamplerClient
        cl = SamplerClient(f"http://127.0.0.1:{httpd.server_address[1]}")
        out = cl.sample(inputs=[raw])
        np.testing.assert_array_equal(out, data["latents"])
    finally:
        httpd.shutdown()
        httpd.server_close()
        b.close()
