"""Divergence guard: non-finite training costs trigger rollback to the
latest checkpoint and a retry on a re-salted RNG stream.

The reference had no failure handling at all (SURVEY §5: one save at the
final iteration, no restore path) — a NaN at iteration N silently poisoned
every iteration after it.  ``Trainer(max_rollbacks=N)`` turns the drained
training costs into a watchdog: detection at the metric-drain boundaries,
recovery from the periodic checkpoints, and a per-rollback RNG salt so the
retry takes a different random trajectory instead of replaying the exact
keys that diverged.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graphical_gan_tpu.core.rng import KeyStream
from graphical_gan_tpu.train.trainer import DivergenceError

from tests.test_trainer import make_trainer


# -- KeyStream salt ----------------------------------------------------------

def test_keystream_salt_semantics():
    a, b = KeyStream(0), KeyStream(0)
    k0 = a.next()
    b.set_salt(0)                       # salt 0 keeps the original stream
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(b.next()))
    c = KeyStream(0)
    c.set_salt(1)
    assert not np.array_equal(np.asarray(c.next()), np.asarray(k0))
    c.set_salt(0)                       # and back
    c.restore(0)
    np.testing.assert_array_equal(np.asarray(c.next()), np.asarray(k0))
    assert c.salt == 0


def _inject_nan_step(tr, fire_on_call):
    """Wrap tr.step_fn to poison disc_cost ONCE, on the Nth call."""
    orig = tr.step_fn
    seen = {"n": 0, "fired": False}

    def step(state, raw, key, do_gen):
        state, m = orig(state, raw, key, do_gen)
        seen["n"] += 1
        if seen["n"] == fire_on_call and not seen["fired"]:
            seen["fired"] = True
            m = dict(m)
            m["disc_cost"] = m["disc_cost"] * jnp.nan
        return state, m

    tr.step_fn = step
    return seen


# -- host-fed path -----------------------------------------------------------

def test_guard_host_rollback_recovers(tmp_path):
    tr = make_trainer(tmp_path, checkpoint_every=3, max_rollbacks=2)
    _inject_nan_step(tr, fire_on_call=4)      # iteration 3
    metrics = tr.train(iters=7, resume=False)
    assert np.isfinite(metrics["disc_cost"])
    assert tr._rollbacks == 1
    assert tr.keys.salt == 1
    # pre-rollback steps 0-2 (ckpt_2 holds step=3), retry runs 3-6
    assert int(tr.state.step) == 7
    with open(os.path.join(str(tmp_path), "logfile.txt")) as f:
        log = f.read()
    assert "divergence guard" in log
    assert "iteration 3" in log


def test_guard_salt_survives_checkpoint_resume(tmp_path):
    tr = make_trainer(tmp_path, checkpoint_every=3, max_rollbacks=2)
    _inject_nan_step(tr, fire_on_call=4)
    tr.train(iters=7, resume=False)
    tr2 = make_trainer(tmp_path, checkpoint_every=3, max_rollbacks=2)
    tr2.train(iters=8)                        # resumes from ckpt_6
    assert tr2._start_iter == 7
    assert tr2.keys.salt == 1                 # salted stream continues


def test_guard_budget_exhausted_raises(tmp_path):
    tr = make_trainer(tmp_path, checkpoint_every=3, max_rollbacks=1)
    orig = tr.step_fn

    def always_nan(state, raw, key, do_gen):
        state, m = orig(state, raw, key, do_gen)
        m = dict(m)
        m["disc_cost"] = m["disc_cost"] * jnp.nan
        return state, m

    tr.step_fn = always_nan
    with pytest.raises(DivergenceError, match="budget exhausted"):
        tr.train(iters=7, resume=False)
    assert tr._rollbacks == 2                 # 1 allowed + the fatal one


def test_guard_anchor_checkpoint_covers_early_nan(tmp_path):
    """A NaN before the first periodic checkpoint rolls back to the
    pristine-init anchor (ckpt_-1) instead of failing unrecoverably."""
    tr = make_trainer(tmp_path, checkpoint_every=100, max_rollbacks=1)
    _inject_nan_step(tr, fire_on_call=1)      # iteration 0
    metrics = tr.train(iters=4, resume=False)
    assert np.isfinite(metrics["disc_cost"])
    assert os.path.isfile(os.path.join(str(tmp_path), "ckpt_-1.npz"))
    assert tr._rollbacks == 1
    assert int(tr.state.step) == 4


def test_guard_disabled_by_default(tmp_path):
    """max_rollbacks=0 (the default) preserves the old behavior: no anchor
    checkpoint, no detection — the NaN just flows into the logs."""
    tr = make_trainer(tmp_path, checkpoint_every=3)
    _inject_nan_step(tr, fire_on_call=2)
    tr.train(iters=4, resume=False)
    assert not os.path.isfile(os.path.join(str(tmp_path), "ckpt_-1.npz"))
    assert tr._rollbacks == 0
    with open(os.path.join(str(tmp_path), "logfile.txt")) as f:
        assert "divergence guard" not in f.read()


# -- resident path -----------------------------------------------------------

@pytest.mark.slow
def test_guard_resident_rollback_recovers(tmp_path):
    rng = np.random.RandomState(0)
    tr = make_trainer(tmp_path, checkpoint_every=3, max_rollbacks=2,
                      resident_data=rng.rand(64, 784).astype("float32"),
                      chunk_size=4)
    orig = tr._run_chunk
    fired = {}

    def rc(n, data):
        n2, (s, ms) = orig(n, data)
        # the first multi-iteration chunk is iters 6-7 (singles cover 0-5
        # via the early-flush + ckpt cadences); poison its first slot
        if n2 == 2 and "done" not in fired:
            fired["done"] = True
            ms = dict(ms)
            ms["disc_cost"] = ms["disc_cost"].at[0].set(jnp.nan)
        return n2, (s, ms)

    tr._run_chunk = rc
    metrics = tr.train(iters=8, resume=False)
    assert fired.get("done")
    assert np.isfinite(metrics["disc_cost"])
    assert tr._rollbacks == 1
    assert tr.keys.salt == 1
    # restored from ckpt_5 (step=6), retry runs iters 6-7
    assert int(tr.state.step) == 8
    with open(os.path.join(str(tmp_path), "logfile.txt")) as f:
        log = f.read()
    assert "divergence guard" in log
    assert "iteration 6" in log


# -- fault injection (chaos drill) --------------------------------------------

def test_fault_injection_host_drill(tmp_path, monkeypatch):
    """GGAN_FAULT_NAN_AT poisons one observed cost: the guard detects,
    rolls back, re-salts, and the retry completes (fires only once)."""
    monkeypatch.setenv("GGAN_FAULT_NAN_AT", "4")
    tr = make_trainer(tmp_path, checkpoint_every=3, max_rollbacks=2)
    metrics = tr.train(iters=8, resume=False)
    assert tr._fault_fired
    assert tr._rollbacks == 1
    assert tr.keys.salt == 1
    assert np.isfinite(metrics["disc_cost"])
    assert int(tr.state.step) == 8
    with open(os.path.join(str(tmp_path), "logfile.txt")) as f:
        assert "iteration 4" in f.read()


def test_fault_injection_resident_drill(tmp_path, monkeypatch):
    monkeypatch.setenv("GGAN_FAULT_NAN_AT", "6")
    rng = np.random.RandomState(0)
    tr = make_trainer(tmp_path, checkpoint_every=3, max_rollbacks=2,
                      resident_data=rng.rand(64, 784).astype("float32"),
                      chunk_size=4)
    metrics = tr.train(iters=9, resume=False)
    assert tr._fault_fired
    assert tr._rollbacks == 1
    assert np.isfinite(metrics["disc_cost"])
    assert int(tr.state.step) == 9


def test_fault_injection_inert_without_guard(tmp_path, monkeypatch):
    """Without max_rollbacks the drill only poisons the logged value —
    training itself is untouched and completes."""
    monkeypatch.setenv("GGAN_FAULT_NAN_AT", "2")
    tr = make_trainer(tmp_path, checkpoint_every=3)
    metrics = tr.train(iters=5, resume=False)
    assert tr._fault_fired
    assert tr._rollbacks == 0
    assert np.isfinite(metrics["disc_cost"])
    assert int(tr.state.step) == 5


@pytest.mark.slow
def test_guard_rollback_under_dp_mesh(tmp_path):
    """Rollback restores + re-places sharded state: the retry must keep
    training on the mesh (params re-sharded by _place on restore)."""
    import jax
    from jax.sharding import Mesh

    rng = np.random.RandomState(0)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    tr = make_trainer(tmp_path, checkpoint_every=3, max_rollbacks=2,
                      resident_data=rng.rand(64, 784).astype("float32"),
                      chunk_size=4, mesh=mesh, parallel="dp")
    orig = tr._run_chunk
    fired = {}

    def rc(n, data):
        n2, (s, ms) = orig(n, data)
        if n2 == 2 and "done" not in fired:
            fired["done"] = True
            ms = dict(ms)
            ms["disc_cost"] = ms["disc_cost"].at[0].set(jnp.nan)
        return n2, (s, ms)

    tr._run_chunk = rc
    metrics = tr.train(iters=8, resume=False)
    assert fired.get("done")
    assert tr._rollbacks == 1
    assert np.isfinite(metrics["disc_cost"])
    assert int(tr.state.step) == 8


def test_rollback_salt_is_monotonic_across_restart(tmp_path):
    """After a rollback to salt 1 and a resume, a SECOND divergence must
    take a salt never used before (2), not replay the failed salt 1."""
    tr = make_trainer(tmp_path, checkpoint_every=3, max_rollbacks=2)
    _inject_nan_step(tr, fire_on_call=4)
    tr.train(iters=7, resume=False)
    assert tr.keys.salt == 1

    tr2 = make_trainer(tmp_path, checkpoint_every=3, max_rollbacks=2)
    _inject_nan_step(tr2, fire_on_call=3)    # diverge again post-restart
    tr2.train(iters=10)
    assert tr2._rollbacks == 1
    assert tr2.keys.salt == 2                 # salt_high+1, not _rollbacks
    assert tr2._salt_high == 2


def test_preempt_after_nan_rolls_back_instead_of_checkpointing(tmp_path):
    """A preemption arriving after a NaN must not checkpoint the poisoned
    state: the preempt drain runs the finiteness check first."""
    tr = make_trainer(tmp_path, checkpoint_every=3, max_rollbacks=2)
    seen = _inject_nan_step(tr, fire_on_call=5)   # iteration 4 (not a
    # drain boundary: boundaries here are iters 0-4 early flush... use a
    # later, non-boundary iteration instead)
    tr.eval_hooks = {}
    orig = tr.step_fn

    def step(state, raw, key, do_gen):
        state, m = orig(state, raw, key, do_gen)
        if seen["fired"] and not tr._preempt.is_set():
            tr.request_preempt()              # preempt right after poison
        return state, m

    tr.step_fn = step
    metrics = tr.train(iters=12, resume=False)
    # the guard fired (rollback), and the retry then honored the pending
    # preemption from CLEAN restored state
    assert tr._rollbacks == 1
    assert tr.preempted
    assert np.isfinite(metrics["disc_cost"])
    import glob
    for p in glob.glob(os.path.join(str(tmp_path), "ckpt_*.npz")):
        from graphical_gan_tpu.train import checkpoint as ckpt_lib
        flat, _ = ckpt_lib.load_raw(p)
        assert all(np.isfinite(a).all() for a in flat.values()
                   if np.issubdtype(a.dtype, np.floating)), p


def test_guard_refuses_fresh_run_over_stale_checkpoints(tmp_path):
    t1 = make_trainer(tmp_path, checkpoint_every=2)
    t1.train(iters=4, resume=False)           # leaves ckpt_1, ckpt_3
    t2 = make_trainer(tmp_path, checkpoint_every=2, max_rollbacks=1)
    with pytest.raises(ValueError, match="already holds checkpoints"):
        t2.train(iters=6, resume=False)
