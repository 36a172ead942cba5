"""Persistent XLA compilation cache (core/compile_cache.py).

The reference rebuilds its TF1 graph from Python on every launch; the
TPU-native analog of that startup cost is XLA compilation, which
``enable_compile_cache`` makes a pay-once cost per (HLO, device kind).
These tests pin: enablement semantics (flag/env/off), that a compile
writes persistent entries, and that an identical program compiled after
``jax.clear_caches()`` is served from the on-disk cache (observed via
JAX's own ``/jax/compilation_cache/cache_hits`` monitoring event) without
writing new entries.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from graphical_gan_tpu.core.compile_cache import enable_compile_cache


@pytest.fixture
def restore_cache_config():
    """Snapshot + restore the cache-related jax config around a test."""
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", old_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old_min)


def test_disabled_without_flag_or_env(restore_cache_config, monkeypatch):
    monkeypatch.delenv("GGAN_COMPILE_CACHE", raising=False)
    before = (jax.config.jax_compilation_cache_dir,
              jax.config.jax_persistent_cache_min_compile_time_secs)
    assert enable_compile_cache(None) is None
    # config untouched by the no-op path
    assert (jax.config.jax_compilation_cache_dir,
            jax.config.jax_persistent_cache_min_compile_time_secs) == before


def test_flag_wins_over_env(restore_cache_config, tmp_path, monkeypatch):
    monkeypatch.setenv("GGAN_COMPILE_CACHE", str(tmp_path / "env"))
    got = enable_compile_cache(str(tmp_path / "flag"))
    assert got == str(tmp_path / "flag")
    assert os.path.isdir(got)
    assert jax.config.jax_compilation_cache_dir == got


def test_env_fallback(restore_cache_config, tmp_path, monkeypatch):
    monkeypatch.setenv("GGAN_COMPILE_CACHE", str(tmp_path / "env"))
    got = enable_compile_cache(None)
    assert got == str(tmp_path / "env") and os.path.isdir(got)


def test_compile_writes_then_hits_without_new_entries(
        restore_cache_config, tmp_path):
    """Miss -> persistent entry; identical program after clear_caches()
    -> served from disk (cache_hits event), no new entries written."""
    cache = enable_compile_cache(str(tmp_path / "cc"))

    def prog(x):
        return jnp.tanh(x @ x.T).sum() * 3.0

    # a shape unlikely to collide with other tests' cached programs
    x = jnp.ones((37, 53), jnp.float32)
    first = jax.jit(prog)(x)
    first.block_until_ready()
    entries = sorted(os.listdir(cache))
    assert entries, "compile did not write a persistent cache entry"

    # drop jit/pjit in-memory caches so the backend compile re-runs and
    # consults the persistent cache
    jax.clear_caches()

    from jax._src import monitoring
    hits = []

    def listener(name, **kw):
        if name == "/jax/compilation_cache/cache_hits":
            hits.append(name)

    monitoring.register_event_listener(listener)
    try:
        second = jax.jit(prog)(x)
        second.block_until_ready()
    finally:
        monitoring.unregister_event_listener(listener)

    assert hits, "recompile of an identical program missed the disk cache"
    assert sorted(os.listdir(cache)) == entries, \
        "cache hit should not write new entries"
    assert first == second


def test_cli_mains_forward_compile_cache(monkeypatch):
    """--compile-cache reaches run() for all three entrypoints."""
    import graphical_gan_tpu.runs.gan_inference as gi
    import graphical_gan_tpu.runs.gmgan as gm
    import graphical_gan_tpu.runs.ssgan as ss

    calls = {}

    def fake(which):
        def run(dataset, mode, **kw):
            calls[which] = kw
        return run

    monkeypatch.setattr(gi, "run", fake("gi"))
    monkeypatch.setattr(gm, "run", fake("gm"))
    monkeypatch.setattr(ss, "run", fake("ss"))

    gi.main(["--dataset", "cifar10", "--compile-cache", "/tmp/cc1"])
    assert calls["gi"]["compile_cache"] == "/tmp/cc1"
    gm.main(["--dataset", "mnist", "--compile-cache", "/tmp/cc2"])
    assert calls["gm"]["compile_cache"] == "/tmp/cc2"
    ss.main(["--dataset", "moving_mnist", "--compile-cache", "/tmp/cc3"])
    assert calls["ss"]["compile_cache"] == "/tmp/cc3"
    # default stays off
    gi.main(["--dataset", "cifar10"])
    assert calls["gi"]["compile_cache"] is None


def test_serve_cli_forwards_compile_cache(monkeypatch):
    """ggan-serve enables the cache before building its backend, so a
    serving replica's bucket programs warm from disk on restart."""
    import graphical_gan_tpu.core.compile_cache as cc
    import graphical_gan_tpu.serve.server as srv

    seen = {}
    monkeypatch.setattr(cc, "enable_compile_cache",
                        lambda d=None: seen.setdefault("dir", d))
    # stop main right after the cache hookup (backend build not needed)
    monkeypatch.setattr(
        srv, "sampler_from_export",
        lambda d: (_ for _ in ()).throw(SystemExit(0)))
    try:
        srv.main(["--export-dir", "/nonexistent", "--compile-cache",
                  "/tmp/cc4"])
    except SystemExit:
        pass
    assert seen["dir"] == "/tmp/cc4"
