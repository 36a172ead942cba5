"""Determinism / race audit (tools/determinism.py) runs clean on the CPU
backend, and its comparators actually catch injected nondeterminism."""

import numpy as np
import pytest

from graphical_gan_tpu.tools import determinism as det


@pytest.mark.slow
def test_audit_all_checks_pass_family1():
    results = det.run_all("gan", dim=8, batch_size=8, chunk_iters=3,
                          trainer_iters=4)
    assert [r["check"] for r in results] == [
        "step_replay", "chunk_replay", "loader_replay", "prefetch_order",
        "trainer_replay"]
    bad = [r for r in results if not r["ok"]]
    assert not bad, bad


@pytest.mark.slow
def test_audit_all_checks_pass_gmgan_ssgan():
    for family in ("gmgan", "ssgan"):
        results = det.run_all(family, dim=8, batch_size=8, chunk_iters=2,
                              trainer_iters=3)
        bad = [r for r in results if not r["ok"]]
        assert not bad, (family, bad)


def test_loader_replay_detects_seed_divergence(monkeypatch):
    """Instrument sensitivity: if same-seed replays were NOT byte-identical
    the check must say so — simulate by making the two factories disagree."""
    from graphical_gan_tpu.data import common

    orig = common.generator_factory
    calls = {"n": 0}

    def skewed(batch_size, *arrays, seed=None):
        calls["n"] += 1
        return orig(batch_size, *arrays,
                    seed=seed + (calls["n"] - 1))  # 2nd replay re-seeded

    monkeypatch.setattr(common, "generator_factory", skewed)
    r = det.check_loader_replay()
    assert not r["ok"]
    assert "differs" in r["detail"]


def test_prefetch_order_detects_reorder(monkeypatch):
    from graphical_gan_tpu.data import prefetch as pf

    orig = pf.prefetch_to_device

    def reordering(iterator, size=2, sharding=None):
        items = list(iterator)
        items[0], items[1] = items[1], items[0]
        return orig(iter(items), size=size, sharding=sharding)

    monkeypatch.setattr(pf, "prefetch_to_device", reordering)
    r = det.check_prefetch_order()
    assert not r["ok"]
    assert "out of order" in r["detail"]


def test_bit_equal_treats_nan_as_equal_and_shapes_strict():
    a = {"x": np.array([1.0, np.nan])}
    assert det._bit_equal(a, {"x": np.array([1.0, np.nan])})
    assert not det._bit_equal(a, {"x": np.array([1.0, 2.0])})
    assert not det._bit_equal(a, {"x": np.array([[1.0, np.nan]])})
