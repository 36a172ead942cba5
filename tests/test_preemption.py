"""Preemption-safe checkpointing: SIGTERM (or request_preempt) makes the
training loop stop at the next dispatch boundary, checkpoint, and return
cleanly, so a preempted TPU-VM job loses at most one dispatch window.

The reference saved once at the final iteration with no restore path
(SURVEY §5) — a preemption at iter 199,998 of 200,000 lost the entire run.
"""

import os
import signal

import numpy as np

from tests.test_trainer import make_trainer


def test_preempt_host_loop_saves_and_resumes(tmp_path):
    tr = make_trainer(tmp_path, checkpoint_every=100)
    tr.eval_hooks = {3: lambda t, i: t.request_preempt()}
    metrics = tr.train(iters=10, resume=False)
    assert tr.preempted
    assert int(tr.state.step) == 3            # stopped after iteration 2
    assert np.isfinite(metrics["disc_cost"])
    assert os.path.isfile(os.path.join(str(tmp_path), "ckpt_2.npz"))
    with open(os.path.join(str(tmp_path), "logfile.txt")) as f:
        log = f.read()
    assert "preempted: checkpoint saved at iteration 2" in log
    # the buffered device scalars were drained into the log before stopping
    assert "iter 2" in log

    tr2 = make_trainer(tmp_path, checkpoint_every=100)
    metrics = tr2.train(iters=10)
    assert tr2._start_iter == 3
    assert not tr2.preempted
    assert int(tr2.state.step) == 10
    assert np.isfinite(metrics["disc_cost"])


def test_preempt_resident_loop_stops_at_dispatch_boundary(tmp_path):
    rng = np.random.RandomState(0)
    tr = make_trainer(tmp_path, checkpoint_every=100,
                      resident_data=rng.rand(64, 784).astype("float32"),
                      chunk_size=4)
    tr.request_preempt()                       # pending before train()
    metrics = tr.train(iters=50, resume=False)
    assert tr.preempted
    # the pending request is honored after the FIRST chunk dispatch
    # (iteration<5 flush parity makes that a single-iteration chunk)
    assert int(tr.state.step) == 1
    assert os.path.isfile(os.path.join(str(tmp_path), "ckpt_0.npz"))
    assert np.isfinite(metrics["disc_cost"])

    tr2 = make_trainer(tmp_path, checkpoint_every=100,
                       resident_data=rng.rand(64, 784).astype("float32"),
                       chunk_size=4)
    tr2.train(iters=8)
    assert tr2._start_iter == 1
    assert int(tr2.state.step) == 8


def test_preempt_sigterm_end_to_end(tmp_path):
    """A real SIGTERM delivered mid-run lands in the installed handler,
    which requests preemption; the loop checkpoints and returns."""
    tr = make_trainer(tmp_path, checkpoint_every=100)
    prev = signal.getsignal(signal.SIGTERM)
    try:
        tr.install_preempt_handlers()
        tr.eval_hooks = {2: lambda t, i: os.kill(os.getpid(),
                                                 signal.SIGTERM)}
        tr.train(iters=10, resume=False)
        assert tr.preempted
        assert int(tr.state.step) == 2
        assert os.path.isfile(os.path.join(str(tmp_path), "ckpt_1.npz"))
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_preempt_handler_install_skipped_off_main_thread(tmp_path):
    import threading
    tr = make_trainer(tmp_path)
    prev = signal.getsignal(signal.SIGTERM)
    t = threading.Thread(target=tr.install_preempt_handlers)
    t.start()
    t.join()
    assert signal.getsignal(signal.SIGTERM) is prev  # no-op, no crash
