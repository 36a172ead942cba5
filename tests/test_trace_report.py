"""Trace-attribution tool: self-time accounting and end-to-end parsing of
a real profiler trace (CPU backend in CI; same format as TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graphical_gan_tpu.tools import trace_report as tr


def test_self_times_subtracts_children_exactly():
    # parent [0, 100] wrapping children [10, 30] and [40, 90], the second
    # with a grandchild [50, 80]
    evs = [
        {"name": "parent", "ts": 0.0, "dur": 100.0, "ph": "X"},
        {"name": "c1", "ts": 10.0, "dur": 20.0, "ph": "X"},
        {"name": "c2", "ts": 40.0, "dur": 50.0, "ph": "X"},
        {"name": "g", "ts": 50.0, "dur": 30.0, "ph": "X"},
    ]
    got = {e["name"]: s for e, s in tr.self_times(evs)}
    assert got == {"parent": 30.0, "c1": 20.0, "c2": 20.0, "g": 30.0}
    # total self time == outermost duration: nothing double-counted
    assert sum(got.values()) == 100.0


def test_self_times_sequential_siblings():
    evs = [
        {"name": "a", "ts": 0.0, "dur": 10.0, "ph": "X"},
        {"name": "b", "ts": 10.0, "dur": 5.0, "ph": "X"},
    ]
    got = {e["name"]: s for e, s in tr.self_times(evs)}
    assert got == {"a": 10.0, "b": 5.0}


def test_report_on_real_trace(tmp_path):
    f = jax.jit(lambda x: jnp.tanh(x @ x) @ x)
    x = jnp.ones((256, 256))
    np.asarray(f(x))  # compile outside the trace
    jax.profiler.start_trace(str(tmp_path))
    r = f(x)
    for _ in range(4):
        r = f(r)
    np.asarray(r)
    jax.profiler.stop_trace()

    rep = tr.report(str(tmp_path), iters=5)
    assert rep["busy_ms"] > 0
    assert rep["n_events"] > 0
    assert rep["iters"] == 5
    shares = [c["share"] for c in rep["categories"]]
    assert abs(sum(shares) - 1.0) < 0.01
    # the workload is two matmuls per call: a matmul-ish category dominates
    top = rep["categories"][0]["category"]
    assert top in ("matmul", "convolution", "other", "loop fusion",
                   "convolution fusion"), top
    assert rep["top_ops"][0]["ms"] > 0


def test_find_trace_raises_when_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        tr.find_trace(str(tmp_path))


def test_self_times_separates_concurrent_lanes():
    """Two lanes overlapping in time must NOT nest into each other
    (multi-chip traces): each lane's op keeps its full self time."""
    evs = [
        {"name": "opA", "ts": 0.0, "dur": 50.0, "ph": "X",
         "pid": 1, "tid": 3},
        {"name": "opB", "ts": 1.0, "dur": 50.0, "ph": "X",
         "pid": 2, "tid": 3},
    ]
    got = {e["name"]: s for e, s in tr.self_times(evs)}
    assert got == {"opA": 50.0, "opB": 50.0}  # not {50: 0} nesting
