"""Host-side training driver.

Reproduces the reference's observational instruments and cadences
(``gan_inference_cifar10.py:420-499``):

- per-iteration train-cost metric + wall-clock 'time' metric,
- dev-set sweep every 100 iters (rec/reg decomposition when a reconstruction
  penalty exists, plain gen-cost otherwise),
- log flush at iters <5 and every 100,
- fixed-noise sample grid + fixed/random reconstruction grids every 5000
  (1000 for face),
- run-dir bookkeeping: config dump + settings log (the reference self-copied
  the entry script, ``gan_inference_mnist.py:85-86``; we dump the full config
  dict which captures the same information declaratively),

and improves on the reference where it was operationally broken:

- periodic checkpointing with full-state resume (the reference saved ONCE at
  the final iteration and had no restore path, SURVEY §5),
- the whole G+kD iteration is one donated jitted step with on-device batch
  slices (see ``train.step``) instead of (1+k) feed_dict round trips,
- an on-device **resident-dataset mode** (``resident_data=...``): the whole
  training set is uploaded to HBM once, each iteration's (1+k) batches are
  drawn by on-device random gather, multiple iterations are fused into one
  ``lax.scan`` dispatch, and metrics are fetched in bulk only at
  logging/eval boundaries — zero host work in the hot loop.  This is the
  production counterpart of ``bench.py``'s measurement loop.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, is_dataclass
from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from graphical_gan_tpu.core.rng import KeyStream
from graphical_gan_tpu.report.plot import MetricLogger
from graphical_gan_tpu.train import checkpoint as ckpt_lib
from graphical_gan_tpu.train.step import make_train_step


class DivergenceError(RuntimeError):
    """Training produced a non-finite cost and the guard could not recover
    (no checkpoint to roll back to, or the rollback budget is exhausted)."""


class _Diverged(Exception):
    """Internal control flow: non-finite cost detected at ``iteration``."""

    def __init__(self, iteration: int):
        super().__init__(iteration)
        self.iteration = int(iteration)


class _PreemptStop(Exception):
    """Internal control flow: a preemption request was honored after
    ``iteration`` completed; ``metrics`` is the last drained metric dict."""

    def __init__(self, iteration: int, metrics: Dict[str, float]):
        super().__init__(iteration)
        self.iteration = int(iteration)
        self.metrics = dict(metrics)


def make_run_dir(base: str, script: str, tags: Dict) -> str:
    parts = [script] + [f"{k}-{v}" for k, v in tags.items()] \
        + [str(int(time.time()))]
    outf = os.path.join(base, ".".join(parts))
    os.makedirs(outf, exist_ok=True)
    return outf


def dump_settings(outf: str, cfg, logfile: str) -> None:
    d = asdict(cfg) if is_dataclass(cfg) else dict(cfg)
    with open(os.path.join(outf, "config.json"), "w") as f:
        json.dump(d, f, indent=2, default=str)
    with open(logfile, "a") as f:
        for k in sorted(d):
            f.write(f"\t{k.upper()}: {d[k]}\n")


class Trainer:
    def __init__(self, model, train_gen_factory, dev_gen_factory=None,
                 outf: str = "result/run", seed: int = 0,
                 critic_iters: Optional[int] = None,
                 checkpoint_every: int = 5000,
                 checkpoints_to_keep: int = 3,
                 eval_hooks: Optional[Dict[int, Callable]] = None,
                 lr_scale=None,
                 resident_data=None, chunk_size: Optional[int] = None,
                 mesh=None, parallel: str = "dp",
                 render_curves: Optional[bool] = None,
                 batch_sampler: Optional[Callable] = None,
                 max_rollbacks: int = 0,
                 async_checkpoint: Optional[bool] = None,
                 checkpoint_backend: str = "npz"):
        self.model = model
        self.cfg = model.cfg
        self.train_gen_factory = train_gen_factory
        self.dev_gen_factory = dev_gen_factory
        self.outf = outf
        os.makedirs(outf, exist_ok=True)
        self.logfile = os.path.join(outf, "logfile.txt")
        dump_settings(outf, self.cfg, self.logfile)

        self.k = self.cfg.critic_iters if critic_iters is None \
            else critic_iters
        self._raw_step, self.init_state = make_train_step(
            model, critic_iters=self.k, lr_scale=lr_scale, jit=False)
        # mesh + parallel: training over a jax.sharding.Mesh with the named
        # strategy — 'dp' (1-D 'data' axis: batch sharded, params
        # replicated), 'tp' (2-D data x model: channel sharding rules),
        # 'sp' (2-D data x seq: the video frame axis sharded), 'ep'
        # (2-D data x expert: the gmgan mixture-component axis sharded),
        # 'pp' (1-D 'stage' axis: 2-stage parameter-partitioned GPipe
        # pipeline, family-1 ali/wali-gp + gmgan ali/local_ep), or
        # 'composed' (any subset of
        # data/seq/model axes present in the mesh).  XLA GSPMD inserts
        # every collective (parallel/*.py).  Works for both the host-fed
        # and the resident hot loops; the global batch size must divide
        # the data-axis size.
        self.mesh = mesh
        self.parallel = parallel if mesh is not None else "dp"
        # how to recover the name-keyed param dict from the training state
        # (eval hooks, dev sweeps, param counts).  Every strategy but pp
        # keeps a TrainState with .params; pp packs both stages' params
        # into a stage-sharded [2, P] buffer and unpacks on demand.
        self._read_params = lambda s: s.params
        if mesh is not None:
            if parallel == "dp":
                from graphical_gan_tpu.parallel.mesh import (
                    make_parallel_train_step as factory)
            elif parallel == "tp":
                from graphical_gan_tpu.parallel.sharding_rules import (
                    make_tp_train_step as factory)
            elif parallel == "sp":
                from graphical_gan_tpu.parallel.sequence import (
                    make_sp_train_step as factory)
            elif parallel == "ep":
                from graphical_gan_tpu.parallel.expert import (
                    make_ep_train_step as factory)
            elif parallel == "composed":
                from graphical_gan_tpu.parallel.composed import (
                    make_composed_train_step)

                def factory(model, mesh, critic_iters, lr_scale):
                    return make_composed_train_step(
                        model, mesh, critic_iters=critic_iters,
                        lr_scale=lr_scale,
                        data_axis="data" if "data" in mesh.shape else None,
                        seq_axis="seq" if "seq" in mesh.shape else None,
                        model_axis="model" if "model" in mesh.shape
                        else None)
            elif parallel == "pp":
                from graphical_gan_tpu.parallel.pipeline import (
                    make_pp_train_step)
                if lr_scale is not None:
                    raise NotImplementedError(
                        "pipeline parallelism does not support lr_scale")

                def factory(model, mesh, critic_iters, lr_scale):
                    step, pp_init, place, read = make_pp_train_step(
                        model, mesh, critic_iters=critic_iters)
                    return step, pp_init, place, read
            else:
                raise ValueError(f"unknown parallel strategy {parallel!r}")
            out = factory(model, mesh, critic_iters=self.k,
                          lr_scale=lr_scale)
            self.step_fn, self._place = out[0], out[2]
            if len(out) == 4:
                # pp: the state is the factory's own pytree (packed stage
                # rows + per-row Adam moments), not the standard TrainState
                self.init_state = out[1]
                self._read_params = out[3]
        else:
            self.step_fn = jax.jit(self._raw_step, donate_argnums=(0,))
            self._place = lambda s: s
        # resident mode: host array/pytree of the FULL train set; uploaded
        # once in train().  chunk_size = iterations fused per lax.scan
        # dispatch; None (default) = auto, fusing all iterations up to the
        # next host-side event boundary into ONE dispatch (the ever-present
        # 100-iteration dev/flush cadence bounds this at 100) — the scan
        # body compiles once regardless of trip count, and each extra
        # dispatch costs a host round trip (expensive on relayed backends).
        # If a relay rejects the scanned program, the loop falls back to
        # single-iteration dispatches.
        self.resident_data = resident_data
        # batch_sampler(data, key, n_batches, batch_size) -> raw pytree:
        # how resident-mode iterations draw their (1+k) batches on device.
        # Default = uniform gather from the resident arrays; an on-device
        # SYNTHESIZER (e.g. data/ondevice_moving_mnist.make_video_sampler)
        # generates fresh examples inside the compiled step instead.
        self.batch_sampler = batch_sampler
        self.chunk_size = chunk_size if chunk_size is None \
            else max(1, chunk_size)
        self._chunk_fns: Dict[int, Callable] = {}
        self._chunk_ok: set = set()
        # per-metric curve images re-rendered at every flush, like the
        # reference (tflib/plot.py:22-41).  GGAN_RENDER_CURVES=0 disables
        # (tests); explicit arg wins over env.
        if render_curves is None:
            render_curves = os.environ.get("GGAN_RENDER_CURVES", "1") != "0"
        self.render_curves = render_curves
        self.keys = KeyStream(seed)
        self.logger = MetricLogger()
        # a non-positive cadence means "disabled" (callers pass e.g.
        # eval_every=0) — drop it here so the `% every` checks never see 0
        self.checkpoint_every = max(0, checkpoint_every or 0)
        self.checkpoints_to_keep = checkpoints_to_keep
        # checkpoint backend: 'npz' (single-host atomic file; supports the
        # pp<->standard raw-format migration) or 'orbax' (each shard
        # written by its owning process/device — the multi-host & sharded
        # story; restore resharding comes from the `like` placement).
        # Both formats coexist in one run dir; resume dispatches on the
        # artifact itself, so a run may switch backends between restarts.
        if checkpoint_backend not in ("npz", "orbax"):
            raise ValueError(f"unknown checkpoint_backend "
                             f"{checkpoint_backend!r} (npz|orbax)")
        self.checkpoint_backend = checkpoint_backend
        self._ckpt_ext = "." + checkpoint_backend
        self.eval_hooks = {e: h for e, h in (eval_hooks or {}).items()
                           if e > 0}
        # divergence guard: max_rollbacks > 0 checks every drained training
        # cost for finiteness; on NaN/inf the run rolls back to the latest
        # checkpoint and retries on a re-salted RNG stream (up to the
        # budget), instead of silently training on poisoned state.  The
        # reference had nothing of the kind (SURVEY §5: end-only save, no
        # restore) — a NaN at iter N corrupted everything after it.
        self.max_rollbacks = max(0, max_rollbacks or 0)
        self._rollbacks = 0
        # highest RNG salt ever used by this run (persisted in checkpoints):
        # every rollback takes salt_high + 1, so a retry NEVER replays a
        # salt that already diverged — including after a process restart,
        # where a per-process counter would re-issue salt 1 and
        # deterministically replay the failed trajectory.
        self._salt_high = 0
        # fault injection (chaos drill): GGAN_FAULT_NAN_AT=<iter> poisons
        # the OBSERVED training cost at that iteration, once — exercising
        # the guard's detect -> restore -> re-salt -> retry machinery in a
        # real run without corrupting actual state.  Only meaningful with
        # max_rollbacks > 0.
        self._fault_nan_at = int(os.environ.get("GGAN_FAULT_NAN_AT", "-1"))
        self._fault_fired = False
        # preemption guard: request_preempt() (usually from a SIGTERM
        # handler, see install_preempt_handlers) asks the hot loop to stop
        # at the next dispatch boundary, checkpoint, and return cleanly —
        # the TPU-VM preemption story (maintenance events deliver SIGTERM
        # with a grace window; the reference would have lost the entire run,
        # SURVEY §5).  `trainer.preempted` tells the caller the run is
        # incomplete; a later --run-dir / try_resume continues it exactly.
        import threading
        self._preempt = threading.Event()
        self.preempted = False
        # async checkpointing: save() snapshots the state ON DEVICE (cheap
        # copy) and hands the device->host fetch + npz write to a single
        # ordered background thread (ckpt_lib.AsyncWriter) — on relayed
        # backends the fetch alone blocks the hot loop for hundreds of ms
        # per save.  Joined before any restore and at end of train(), so
        # readers never see a checkpoint mid-write (writes are atomic via
        # tmp+rename regardless).  Default off; GGAN_ASYNC_CKPT=1 or the
        # explicit arg enables.
        if async_checkpoint is None:
            async_checkpoint = os.environ.get("GGAN_ASYNC_CKPT") == "1"
        self._ckpt_writer = ckpt_lib.AsyncWriter() if async_checkpoint \
            else None
        # jitted identity-copy: ONE device dispatch, zero host bytes.  A
        # plain jnp.array() per leaf round-trips through the host on
        # relayed backends (measured 6.7-11 s for the 79 MB wali-gp state
        # vs 2-3 ms for this program).
        self._snapshot_fn = jax.jit(
            lambda t: jax.tree.map(lambda a: a.copy(), t))
        self.state = None
        self._start_iter = 0
        self._dev_fn = None
        self._dev_data = None

    # -- preemption -----------------------------------------------------------

    def request_preempt(self) -> None:
        """Ask the training loop to stop at the next dispatch boundary, save
        a checkpoint, and return.  Safe to call from signal handlers and
        other threads (it only sets an event; all work happens in the
        training thread, where JAX dispatch is legal)."""
        self._preempt.set()

    def install_preempt_handlers(self, signals=None) -> None:
        """Route termination signals into ``request_preempt``.

        Default: SIGTERM only — that is what TPU-VM/GCE preemptions and
        most job schedulers deliver, with a grace window this loop easily
        meets (one dispatch boundary + one checkpoint write).  SIGINT is
        left alone so Ctrl-C still hard-kills.  A previous FOREIGN handler
        is chained so outer supervisors keep observing the signal; a
        previous handler installed by an earlier Trainer is REPLACED (not
        chained), and ``self`` is held by weakref — otherwise a long-lived
        process calling run() repeatedly would build an unbounded handler
        chain pinning every past Trainer (and its device state) alive."""
        import signal as _signal
        import threading
        import weakref
        if threading.current_thread() is not threading.main_thread():
            return  # signal.signal is main-thread-only; callers in worker
            # threads (tests driving run() concurrently) just skip install
        if signals is None:
            signals = (_signal.SIGTERM,)
        for sig in signals:
            prev = _signal.getsignal(sig)
            if getattr(prev, "_ggan_preempt", False):
                prev = getattr(prev, "_ggan_chained_prev", None)
            ref = weakref.ref(self)

            def handler(signum, frame, _prev=prev, _ref=ref):
                tr = _ref()
                if tr is not None:
                    tr.request_preempt()
                if callable(_prev) and _prev not in (
                        _signal.SIG_IGN, _signal.SIG_DFL):
                    _prev(signum, frame)

            handler._ggan_preempt = True
            handler._ggan_chained_prev = prev
            _signal.signal(sig, handler)

    def _preempt_stop(self, iteration: int, metrics: Dict) -> None:
        """Honor a pending preemption request: checkpoint the completed
        ``iteration``, log, and unwind to train() via _PreemptStop."""
        self.save(iteration)
        msg = (f"preempted: checkpoint saved at iteration {iteration}; "
               "resume with --run-dir (or Trainer.try_resume)")
        print(msg)
        with open(self.logfile, "a") as f:
            f.write(msg + "\n")
        raise _PreemptStop(iteration,
                           {k: float(v) for k, v in metrics.items()})

    @property
    def params(self):
        """Name-keyed param dict of the current state, strategy-agnostic:
        every strategy but pp exposes ``state.params`` directly; pp unpacks
        its stage-sharded ``[2, P]`` rows.  Eval hooks and tools should use
        this instead of reaching into ``state``."""
        return self._read_params(self.state)

    # -- data ---------------------------------------------------------------

    def _inf_batches(self):
        while True:
            for batch in self.train_gen_factory():
                yield batch[0] if isinstance(batch, tuple) else batch

    def _stacked(self, gen):
        """Stack (1+k) consecutive batches along a new sub-update axis;
        batches may be arrays or pytrees (ssgan's {'x','y'} dicts)."""
        items = [next(gen) for _ in range(1 + self.k)]
        if isinstance(items[0], dict):
            return {kk: np.stack([it[kk] for it in items], axis=0)
                    for kk in items[0]}
        return np.stack(items, axis=0)

    # -- checkpoint ---------------------------------------------------------

    def save(self, iteration: int) -> str:
        path = os.path.join(self.outf, f"ckpt_{iteration}{self._ckpt_ext}")
        extra = {"iteration": iteration,
                 "rng_count": self.keys.state(),
                 "rng_salt": self.keys.salt,
                 "rng_salt_high": max(self._salt_high, self.keys.salt)}
        if self._ckpt_writer is not None:
            # on-device copy: the next step donates the live buffers, so
            # the background fetch must read an independent snapshot
            snapshot = self._snapshot_fn(self.state)
            self._ckpt_writer.submit(path, snapshot, extra,
                                     after=self._gc_checkpoints)
            return path
        out = ckpt_lib.save(path, self.state, extra=extra)
        self._gc_checkpoints()
        return out

    def _gc_checkpoints(self) -> None:
        # keep <= 0 (or None) means keep everything
        if not self.checkpoints_to_keep or self.checkpoints_to_keep <= 0:
            return
        for _, path in ckpt_lib.list_checkpoints(
                self.outf)[:-self.checkpoints_to_keep]:
            ckpt_lib.remove(path)

    def try_resume(self) -> bool:
        if self._ckpt_writer is not None:
            self._ckpt_writer.join()  # never restore a checkpoint mid-write
        path = ckpt_lib.latest(self.outf)
        if path is None:
            return False
        like = self.init_state(self.model.init(jax.random.PRNGKey(0)))
        try:
            self.state, extra = ckpt_lib.restore(path, like)
        except (KeyError, ValueError):
            # structure mismatch: checkpoints are strategy-portable (full
            # logical arrays), but pp packs its state differently — convert
            # pp <-> standard so a run migrates across strategies
            self.state, extra = self._restore_converted(path)
        self.state = self._place(self.state)
        self._start_iter = int(extra["iteration"]) + 1
        self.keys.restore(int(extra["rng_count"]))
        self.keys.set_salt(int(extra.get("rng_salt", 0)))
        self._salt_high = max(self._salt_high, self.keys.salt,
                              int(extra.get("rng_salt_high", 0)))
        # fast-forward the metric logger so post-resume logfile lines carry
        # the TRUE iteration (training already resumed correctly; only the
        # printed labels restarted at 0 before this)
        self.logger.restore(self._start_iter)
        return True

    def _restore_converted(self, path: str):
        """Bridge the pp <-> standard state-format gap: every non-pp
        strategy checkpoints the standard ``TrainState`` (full logical
        arrays, so dp/tp/sp/ep/single-device resume each other directly);
        pp checkpoints its stage-packed dict.  Convert whichever direction
        the current strategy needs (parallel/pipeline.py converters)."""
        from graphical_gan_tpu.parallel import pipeline as pp_lib

        is_pp_run = self.mesh is not None and self.parallel == "pp"
        ckpt_stages = None          # packed row count of a pp ckpt
        if ckpt_lib.is_orbax(path):
            # orbax restores by structure, so there is no cheap raw
            # inspection; the direction is already fixed by the CURRENT
            # strategy (a mismatched ckpt can only be the other format) —
            # a genuinely incompatible state surfaces orbax's own error.
            pass
        else:
            flat, _ = ckpt_lib.load_raw(path)
            is_pp_ckpt = "k:packed" in flat
            if is_pp_ckpt == is_pp_run:
                raise ValueError(
                    f"checkpoint {path!r} does not match the current model "
                    "state structure (and is not a pp<->standard format "
                    "difference)")
            if is_pp_ckpt:
                ckpt_stages = int(flat["k:packed"].shape[0])
        if is_pp_run:
            n_stages = int(self.mesh.shape["stage"])
            std_init = make_train_step(self.model, critic_iters=self.k,
                                       jit=False)[1]
            std_like = std_init(self.model.init(jax.random.PRNGKey(0)))
            ts, extra = ckpt_lib.restore(path, std_like)
            return pp_lib.pp_state_from_train_state(
                self.model, ts, n_stages=n_stages), extra
        if ckpt_stages is not None:
            pp_like = pp_lib.pp_state_like(self.model, ckpt_stages)
            pp_state, extra = ckpt_lib.restore(path, pp_like)
        else:
            # orbax pp ckpt of unknown stage count: try each supported one
            last = None
            for n in (2, 4):
                try:
                    pp_like = pp_lib.pp_state_like(self.model, n)
                    pp_state, extra = ckpt_lib.restore(path, pp_like)
                    break
                except Exception as e:  # noqa: BLE001 — try next count
                    last = e
            else:
                raise last
        return pp_lib.train_state_from_pp_state(
            self.model, pp_state, self.init_state), extra

    # -- loop ---------------------------------------------------------------

    def train(self, iters: Optional[int] = None,
              resume: bool = True) -> Dict[str, float]:
        iters = iters if iters is not None else self.cfg.iters
        fresh_init = False
        if self.state is None:
            if not (resume and self.try_resume()):
                params = self.model.init(self.keys.next())
                self.state = self._place(self.init_state(params))
                fresh_init = True

        # startup parameter-count logging (gan_inference_cifar10.py:425-428)
        total = sum(int(np.prod(p.shape))
                    for p in self._read_params(self.state).values())
        line = f"Total number of parameters {total}"
        print(line)
        with open(self.logfile, "a") as f:
            f.write(line + "\n")

        # optional device profiling: GGAN_PROFILE=<dir> traces iterations
        # [profile_start, profile_start+profile_steps)
        profile_dir = os.environ.get("GGAN_PROFILE")
        profile_start = int(os.environ.get("GGAN_PROFILE_START", "10"))
        profile_steps = int(os.environ.get("GGAN_PROFILE_STEPS", "10"))

        # divergence-guard anchor: with no checkpoint yet, an early NaN has
        # nothing to roll back to — save the pristine initial state so the
        # guard can always recover (ckpt_-1 resumes at iteration 0).  A
        # FRESH run (resume declined) over a dir that already holds
        # checkpoints is refused outright: a rollback would silently
        # restore the abandoned run's state.
        if self.max_rollbacks > 0:
            if fresh_init and ckpt_lib.latest(self.outf) is not None:
                raise ValueError(
                    "divergence guard: resume=False would train fresh in "
                    f"a directory that already holds checkpoints ({self.outf}"
                    "); a rollback would restore the old run's state. "
                    "Pass resume=True or use a clean run directory.")
            if ckpt_lib.latest(self.outf) is None:
                self.save(self._start_iter - 1)

        while True:
            try:
                if self.resident_data is not None:
                    out = self._train_resident(iters, profile_dir,
                                               profile_start, profile_steps)
                else:
                    out = self._run_host(iters, profile_dir, profile_start,
                                         profile_steps)
                break
            except _Diverged as e:
                self._rollback(e.iteration)
            except _PreemptStop as e:
                self.preempted = True
                out = e.metrics
                break
        if self._ckpt_writer is not None:
            self._ckpt_writer.join()  # the final save must be durable
        self._final_flush()
        return out

    def _run_host(self, iters, profile_dir, profile_start,
                  profile_steps) -> Dict[str, float]:
        # Host-fed hot loop.  The (1+k)-batch stack for iteration i+1 is
        # assembled and transferred on a background thread while iteration i
        # computes (data/prefetch.py) — synthesis-heavy loaders (moving-
        # MNIST) and slow host->device links otherwise serialize with the
        # step.  Batch ORDER is unchanged, so resume stays deterministic.
        # Mesh runs keep the direct path (the parallel step owns placement).
        gen = self._inf_batches()
        batches = None
        if self.mesh is None and os.environ.get("GGAN_PREFETCH", "1") != "0":
            from graphical_gan_tpu.data.prefetch import prefetch_to_device

            def stacked_iter():
                while True:
                    yield self._stacked(gen)

            batches = prefetch_to_device(stacked_iter(), size=2)
        last: Dict = {}
        pend_m = []  # [(iteration, metric name, device scalar)]
        try:
            self._host_loop(iters, last, pend_m, profile_dir,
                            profile_start, profile_steps, batches, gen)
        finally:
            if batches is not None:
                batches.close()  # release worker + queued device buffers
        return {k: float(v) for k, v in last.items()}

    def _rollback(self, iteration: int) -> None:
        """Recover from a non-finite training cost at ``iteration``: restore
        the latest checkpoint and retry on a fresh RNG salt (a different
        random trajectory, same restored state — ``salt_high + 1``, never a
        salt that already diverged, even across process restarts).  Raises
        ``DivergenceError`` when the budget is exhausted or there is nothing
        to restore.  The host-fed data stream restarts from the loader's
        first epoch, same as a process-restart resume; resident/on-device
        sampling is keyed, so its retry trajectory is fully determined by
        the new salt."""
        self._rollbacks += 1
        if self._ckpt_writer is not None:
            self._ckpt_writer.join()  # an in-flight write IS a checkpoint
        path = ckpt_lib.latest(self.outf)
        msg = (f"divergence guard: non-finite training cost at iteration "
               f"{iteration}; rollback {self._rollbacks}/{self.max_rollbacks}")
        if path is None:
            raise DivergenceError(msg + " — no checkpoint to restore")
        if self._rollbacks > self.max_rollbacks:
            raise DivergenceError(msg + " — rollback budget exhausted")
        print(msg)
        with open(self.logfile, "a") as f:
            f.write(msg + "\n")
        # detection raises BEFORE the poisoned window is plotted, so the
        # logger holds only valid earlier values — flush them out (the
        # retry re-logs the rolled-back span on the new salt, after the
        # rollback marker line) before dropping the buffer
        self._final_flush()
        self.logger = MetricLogger()
        if not self.try_resume():
            raise DivergenceError(msg + " — restore failed")
        if self._start_iter > iteration + 1:
            raise DivergenceError(
                msg + f" — latest checkpoint ({os.path.basename(path)}) is "
                "AHEAD of the divergence point; this run directory holds "
                "checkpoints from a different run, refusing to roll "
                "forward into them")
        self._salt_high += 1
        self.keys.set_salt(self._salt_high)

    def _final_flush(self):
        """Eval hooks fire AFTER the per-window flush, so values plotted at
        the run's last event boundary (e.g. a 'testing accuracy' computed
        at the final iteration) would otherwise never reach the logfile."""
        if self.logger.pending:
            self.logger.flush(self.outf, self.logfile,
                              render=self.render_curves)

    def _host_loop(self, iters, last, pend_m, profile_dir, profile_start,
                   profile_steps, batches, gen):
        trace_active = False
        for iteration in range(self._start_iter, iters):
            if profile_dir and iteration == profile_start:
                jax.profiler.start_trace(profile_dir)
                trace_active = True
            t0 = time.time()
            raw = next(batches) if batches is not None \
                else jax.tree.map(jnp.asarray, self._stacked(gen))
            self.state, metrics = self.step_fn(
                self.state, raw, self.keys.next(),
                jnp.asarray(iteration > 0))
            # buffer DEVICE scalars; drain with one stacked fetch at the
            # next flush/eval boundary — a per-iteration float() forces a
            # device round trip per step and serializes the pipeline
            if "disc_cost" in metrics:
                pend_m.append((iteration, "train disc cost",
                               metrics["disc_cost"]))
            elif iteration > 0:
                pend_m.append((iteration, "train gen cost",
                               metrics["gen_cost"]))
            self.logger.plot("time", time.time() - t0)
            last.clear()
            last.update(metrics)
            if trace_active and iteration >= profile_start + profile_steps:
                jax.tree.map(lambda a: a.block_until_ready(), self.state)
                jax.profiler.stop_trace()
                trace_active = False

            boundary = (iteration < 5 or iteration % 100 == 99
                        or iteration == iters - 1
                        or (self.checkpoint_every > 0
                            and iteration % self.checkpoint_every
                            == self.checkpoint_every - 1)
                        or any(iteration % e == e - 1
                               for e in self.eval_hooks))
            if boundary and pend_m:
                vals = np.asarray(jnp.stack([v for _, _, v in pend_m]))
                if not self._fault_fired and any(
                        it2 == self._fault_nan_at for it2, _, _ in pend_m):
                    self._fault_fired = True
                    vals = vals.copy()
                    vals[[i for i, (it2, _, _) in enumerate(pend_m)
                          if it2 == self._fault_nan_at][0]] = np.nan
                if self.max_rollbacks and not np.isfinite(vals).all():
                    bad = next(it2 for (it2, _, _), v2 in zip(pend_m, vals)
                               if not np.isfinite(v2))
                    raise _Diverged(bad)
                for (it2, name2, _), val in zip(pend_m, vals):
                    self.logger.plot_at(name2, float(val), it2)
                pend_m.clear()

            if iteration % 100 == 99 and self.dev_gen_factory is not None:
                self._dev_sweep()

            if iteration < 5 or iteration % 100 == 99:
                self.logger.flush(self.outf, self.logfile,
                                  render=self.render_curves)
            self.logger.tick()

            for every, hook in self.eval_hooks.items():
                if iteration % every == every - 1:
                    hook(self, iteration)

            if (self.checkpoint_every > 0
                    and iteration % self.checkpoint_every
                    == self.checkpoint_every - 1) or iteration == iters - 1:
                self.save(iteration)

            if self._preempt.is_set():
                if pend_m:  # drain buffered device scalars into the log —
                    # running the SAME finiteness check as the boundary
                    # drain first, so a preemption arriving after a NaN
                    # rolls back instead of checkpointing poisoned state
                    vals = np.asarray(jnp.stack([v for _, _, v in pend_m]))
                    if self.max_rollbacks and not np.isfinite(vals).all():
                        bad = next(it2 for (it2, _, _), v2
                                   in zip(pend_m, vals)
                                   if not np.isfinite(v2))
                        raise _Diverged(bad)
                    for (it2, name2, _), val in zip(pend_m, vals):
                        self.logger.plot_at(name2, float(val), it2)
                    pend_m.clear()
                self._preempt_stop(iteration, last)
        if trace_active:
            jax.profiler.stop_trace()

    # -- resident-data hot loop ----------------------------------------------

    def _chunk_fn(self, n: int) -> Callable:
        """Compiled program running ``n`` full train iterations: per
        iteration, draw (1+k) fresh batches from the resident dataset by
        on-device gather, then the fused G+kD step — all inside one
        ``lax.scan``.  The dataset is an ARGUMENT (never a closure constant)
        so it is not embedded in the HLO.  Cached per distinct ``n`` (only a
        handful of sizes occur: the chunk size, cadence remainders)."""
        if n in self._chunk_fns:
            return self._chunk_fns[n]
        from graphical_gan_tpu.data.ondevice import sample_batches_tree
        sampler = self.batch_sampler or sample_batches_tree
        raw_step, k, bs = self._raw_step, self.k, self.cfg.batch_size
        mesh, parallel = self.mesh, self.parallel
        has_seq = mesh is not None and parallel in ("sp", "composed") \
            and "seq" in mesh.shape
        has_expert = mesh is not None and parallel == "ep" \
            and "expert" in mesh.shape \
            and self.cfg.n_coms % mesh.shape["expert"] == 0
        is_pp = mesh is not None and parallel == "pp"
        # pp: the scanned body is the pipeline step itself (its shard_map
        # schedule traces fine inside lax.scan); state is the pp dict pytree
        pp_step = self.step_fn.raw_step if is_pp else None

        def constrain(raw):
            if mesh is None:
                return raw
            from jax.sharding import NamedSharding, PartitionSpec as P

            def c(x):  # [(1+k), B, ...] — shard the batch dim over 'data';
                # 4-D video leaves additionally shard LEN over 'seq'
                spec = [None] * x.ndim
                if "data" in mesh.shape:
                    spec[1] = "data"
                if has_seq and x.ndim == 4:
                    spec[2] = "seq"
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P(*spec)))

            return jax.tree.map(c, raw)

        def fold_constraint(h):
            # folded [B*LEN, ...] frame tensors partition over the
            # (data, seq) product pair — see parallel/sequence.py
            from jax.sharding import NamedSharding, PartitionSpec as P
            spec = [None] * h.ndim
            spec[0] = ("data", "seq") if "data" in mesh.shape else "seq"
            return jax.lax.with_sharding_constraint(
                h, NamedSharding(mesh, P(*spec)))

        def component_fold(h):
            # [..., n_coms]-last component tensors partition over
            # (data, expert) — see parallel/expert.py
            from jax.sharding import NamedSharding, PartitionSpec as P
            spec = [None] * h.ndim
            if "data" in mesh.shape:
                spec[0] = "data"
            spec[-1] = "expert"
            return jax.lax.with_sharding_constraint(
                h, NamedSharding(mesh, P(*spec)))

        def chunk(state, data, base_key):
            def body(st, kk):
                raw = sampler(data, jax.random.fold_in(kk, 7), 1 + k, bs)
                # skip the G update only at global iteration 0
                # (gan_inference_cifar10.py:433) — state.step is authoritative
                if is_pp:
                    return pp_step(st, raw, kk, st["step"] > 0)
                if has_seq:
                    from graphical_gan_tpu.core import shard_ctx
                    with shard_ctx.frame_constraint(fold_constraint):
                        return raw_step(st, constrain(raw), kk, st.step > 0)
                if has_expert:
                    from graphical_gan_tpu.core import shard_ctx
                    with shard_ctx.component_constraint(component_fold):
                        return raw_step(st, constrain(raw), kk, st.step > 0)
                return raw_step(st, constrain(raw), kk, st.step > 0)

            keys = jax.random.split(base_key, n)
            return jax.lax.scan(body, state, keys)

        if mesh is None:
            fn = jax.jit(chunk, donate_argnums=(0,))
        elif parallel in ("tp", "composed", "ep", "pp"):
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            # state arrives pre-placed by _place (params channel-sharded
            # under TP, mixture means expert-sharded under EP, stage rows
            # stage-sharded under PP) — leave its shardings inferred;
            # dataset + key replicated, sampled batch re-sharded by the
            # constraint
            fn = jax.jit(chunk, in_shardings=(None, repl, repl),
                         donate_argnums=(0,))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            # dataset + params replicated; the sampled batch is re-sharded
            # by the constraint inside the program (gather stays local)
            fn = jax.jit(chunk, in_shardings=(repl, repl, repl),
                         out_shardings=(repl, repl), donate_argnums=(0,))
        self._chunk_fns[n] = fn
        return fn

    def _next_event(self, done: int, iters: int) -> int:
        """First iteration boundary > ``done`` where any host-side action
        fires.  Boundary b means "after b iterations completed"; host-loop
        conditions of the form ``iteration % every == every - 1`` fire at
        multiples of ``every``."""
        cadences = [100, self.checkpoint_every, *self.eval_hooks.keys()]
        nxt = min((done // c + 1) * c for c in cadences if c > 0)
        for early in range(done + 1, 6):  # iteration<5 flush parity
            nxt = min(nxt, early)
            break
        return min(nxt, iters)

    def _run_chunk(self, n, data):
        """Dispatch one scanned chunk; on a compile rejection of a multi-
        iteration program (some remote-compile relays cap program size),
        fall back to single-iteration dispatches for the rest of the run.
        Compile failures raise before execution, so the donated state is
        still valid on the fallback path."""
        try:
            return n, self._chunk_fn(n)(self.state, data, self.keys.next())
        except Exception as e:  # noqa: BLE001 — backend-specific errors
            if n == 1 or n in self._chunk_ok:
                raise
            # Step DOWN through smaller chunk sizes before resorting to
            # one-iteration dispatches: program-size-capped relays that
            # reject a 100-iteration scan usually accept 20 (the historical
            # default), and chunk=1 is a ~20x dispatch-overhead regression.
            for smaller in (20, 5, 1):
                if smaller >= n:
                    continue
                print(f"resident chunk scan (n={n}) failed to compile "
                      f"({type(e).__name__}); trying chunk_size={smaller}")
                try:
                    out = self._chunk_fn(smaller)(self.state, data,
                                                  self.keys.next())
                except Exception:  # noqa: BLE001
                    if smaller == 1:
                        raise
                    continue
                self.chunk_size = smaller
                return smaller, out
            raise

    def _train_resident(self, iters, profile_dir, profile_start,
                        profile_steps) -> Dict[str, float]:
        if self.mesh is not None:
            from graphical_gan_tpu.parallel.mesh import replicate
            data = replicate(self.mesh, jax.tree.map(np.asarray,
                                                     self.resident_data))
        else:
            data = jax.tree.map(jnp.asarray, self.resident_data)
        last: Dict[str, float] = {}
        it = self._start_iter
        trace_active = False
        while it < iters:
            target = self._next_event(it, iters)
            pending = []  # [(n, HOST metrics dict of [n]-arrays)]
            in_flight = None  # (n, device metrics) — 1-deep pipeline
            t0 = time.time()
            while it < target:
                # auto mode fuses the whole inter-event window (<= 100, the
                # dev/flush cadence) into one dispatch
                cap = 100 if self.chunk_size is None else self.chunk_size
                n = min(cap, target - it)
                if profile_dir and not trace_active \
                        and it + n > profile_start >= it:
                    jax.profiler.start_trace(profile_dir)
                    trace_active = True
                n, (self.state, ms) = self._run_chunk(n, data)
                self._chunk_ok.add(n)
                # Keep exactly ONE dispatch in flight: materializing chunk
                # j-1 while chunk j computes overlaps the host fetch with
                # device work, and deep dispatch queues stall relayed
                # backends.  (Per-scalar fetches each cost a full round
                # trip — metrics come back as whole [n]-buffers.)
                if in_flight is not None:
                    pn, pm = in_flight
                    pending.append(
                        (pn, {kk: np.asarray(v) for kk, v in pm.items()}))
                in_flight = (n, ms)
                it += n
                if self._preempt.is_set():
                    # stop chunking at this dispatch boundary; the normal
                    # drain below logs the completed window, then
                    # _preempt_stop checkpoints iteration it-1 and unwinds
                    target = it
                if trace_active and it >= profile_start + profile_steps:
                    jax.tree.map(lambda a: a.block_until_ready(),
                                 self.state.params)
                    jax.profiler.stop_trace()
                    trace_active = False
            pn, pm = in_flight
            pending.append((pn, {kk: np.asarray(v) for kk, v in pm.items()}))

            names = list(pending[0][1].keys())
            cat = {kk: np.concatenate([ms[kk].reshape(-1)
                                       for _, ms in pending])
                   for kk in names}
            window = sum(n for n, _ in pending)
            if (not self._fault_fired
                    and target - window <= self._fault_nan_at < target):
                self._fault_fired = True
                cat[names[0]][self._fault_nan_at - (target - window)] \
                    = np.nan
            if self.max_rollbacks:
                bad = [int(np.flatnonzero(~np.isfinite(arr))[0])
                       for arr in cat.values()
                       if not np.isfinite(arr).all()]
                if bad:
                    raise _Diverged(target - window + min(bad))
            dt = (time.time() - t0) / window
            g_it = target - window
            for j in range(window):
                if "disc_cost" in cat:
                    self.logger.plot("train disc cost",
                                     float(cat["disc_cost"][j]))
                elif g_it > 0:
                    self.logger.plot("train gen cost",
                                     float(cat["gen_cost"][j]))
                self.logger.plot("time", dt)
                g_it += 1
                if g_it == target:
                    break  # boundary actions below, then tick
                self.logger.tick()
            last = {kk: float(v[-1]) for kk, v in cat.items()}

            iteration = target - 1  # host-loop naming: last completed iter
            if iteration % 100 == 99 and self.dev_gen_factory is not None:
                self._dev_sweep()
            if iteration < 5 or iteration % 100 == 99:
                self.logger.flush(self.outf, self.logfile,
                                  render=self.render_curves)
            self.logger.tick()
            for every, hook in self.eval_hooks.items():
                if iteration % every == every - 1:
                    hook(self, iteration)
            if (self.checkpoint_every > 0
                    and iteration % self.checkpoint_every
                    == self.checkpoint_every - 1) or iteration == iters - 1:
                self.save(iteration)
            if self._preempt.is_set():
                self._preempt_stop(iteration, last)
        if trace_active:
            jax.profiler.stop_trace()
        return last

    def _dev_sweep(self) -> None:
        """Dev-set loss sweep (reference cadence: every 100 iters,
        ``gan_inference_cifar10.py:456-477``).

        Default path: the dev set is materialized ONCE to device memory and
        the whole sweep is ONE scanned compiled program + one fetch — the
        per-batch alternative costs a dispatch round trip and a host->device
        upload per dev batch per sweep, which dominated production wall time
        on relayed backends (measured ~0.15 s/iter amortized at the 100-iter
        cadence).  Dev sets larger than GGAN_DEV_RESIDENT_MAX bytes (default
        512 MB) fall back to the per-batch path."""
        if self._dev_fn is None:
            self._build_dev_sweep()
        if self._dev_data is not None:
            outs = self._dev_fn(self._read_params(self.state),
                                self.keys.next(), self._dev_data)
            outs = {k: np.asarray(v) for k, v in outs.items()}
            gen_costs = outs["gen"]
            rec_costs = outs.get("rec", [])
        else:
            gen_costs, rec_costs = self._dev_sweep_per_batch()
        # rec/reg decomposition whenever the mode has a reconstruction term
        # (reference logs it whenever rec_penalty is not None)
        if len(rec_costs):
            self.logger.plot("dev rec cost", float(np.mean(rec_costs)))
            self.logger.plot("dev reg cost",
                             float(np.mean(gen_costs) - np.mean(rec_costs)))
        else:
            self.logger.plot("dev gen cost", float(np.mean(gen_costs)))

    def _build_dev_sweep(self) -> None:
        from graphical_gan_tpu.core import registry
        limit = int(os.environ.get("GGAN_DEV_RESIDENT_MAX",
                                   512 * 1024 * 1024))
        # collect with a running size check so an over-limit (or synthesized-
        # on-the-fly) dev set stops materializing at the cap.  An over-limit
        # dev set keeps the within-limit PREFIX as a fixed resident subset:
        # sweeping the full epoch per-batch costs a host synthesis + a
        # host->device upload + a dispatch round trip per batch per sweep —
        # measured ~2 min/sweep for moving-mnist's 2.6 GB dev epoch over the
        # relay (~3 s/iter amortized at the 100-iter cadence, 200x the
        # step itself).  GGAN_DEV_FULL_SWEEP=1 restores the reference-
        # faithful full-epoch sweep (gan_inference_cifar10.py:456-477).
        batches, seen, truncated = [], 0, False
        for b in self.dev_gen_factory():
            x = b[0] if isinstance(b, tuple) else b
            nb = sum(np.asarray(leaf).nbytes
                     for leaf in jax.tree.leaves(x))
            if seen + nb > limit:
                truncated = True
                if os.environ.get("GGAN_DEV_FULL_SWEEP"):
                    batches = None
                break
            batches.append(x)
            seen += nb
        if not batches:
            self._dev_data = None
            # one compiled program per dev batch (shapes are uniform —
            # loaders drop remainders), built once and reused every sweep
            self._dev_fn = registry.jit_apply(self.model.gen_loss)
            return
        if truncated:
            msg = (f"dev sweep: resident subset of {len(batches)} batches "
                   f"(~{seen >> 20} MiB cap; set GGAN_DEV_FULL_SWEEP=1 for "
                   f"the full per-batch epoch sweep)")
            print(msg)
            with open(self.logfile, "a") as f:
                f.write(msg + "\n")
        stacked = jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)
        if self.mesh is not None:
            from graphical_gan_tpu.parallel.mesh import replicate
            self._dev_data = replicate(self.mesh, stacked)
        else:
            self._dev_data = jax.device_put(stacked)
        gen_loss = self.model.gen_loss

        def sweep(params, key, data):
            n = jax.tree.leaves(data)[0].shape[0]

            def body(_, xk):
                x, kk = xk
                g, aux = registry.apply(lambda: gen_loss(x), params, kk)
                out = {"gen": g}
                if isinstance(aux, dict) and "rec_cost" in aux:
                    out["rec"] = aux["rec_cost"]
                return None, out

            _, outs = jax.lax.scan(body, None,
                                   (data, jax.random.split(key, n)))
            return outs

        self._dev_fn = jax.jit(sweep)

    def _dev_sweep_per_batch(self):
        gen_costs, rec_costs = [], []
        for batch in self.dev_gen_factory():
            x = batch[0] if isinstance(batch, tuple) else batch
            x = jax.tree.map(jnp.asarray, x)
            g, aux = self._dev_fn(self._read_params(self.state),
                                  self.keys.next(), x)
            gen_costs.append(g)
            if "rec_cost" in aux:
                rec_costs.append(aux["rec_cost"])
        # one stacked fetch per sweep (per-scalar fetches are a full relay
        # round trip each)
        gen_costs = np.asarray(jnp.stack(gen_costs)) if gen_costs else []
        rec_costs = np.asarray(jnp.stack(rec_costs)) if rec_costs else []
        return gen_costs, rec_costs
