"""Periodic checkpoint / resume.

The reference saved exactly once, at the final iteration, and had NO restore
path at all (``gan_inference_cifar10.py:498-499``; no ``saver.restore``
anywhere) — a crash at iter 199,998 lost everything.  Here checkpointing is
periodic and round-trips the FULL train state (params, both players'
optimizer states, step counter, host RNG position) bit-exactly.

Format: a single ``.npz`` of keypath-flattened arrays + a tiny JSON header —
no external checkpoint service needed, works on any filesystem the host
sees.  (Multi-host sharded checkpointing via orbax can layer on top; the
state is a pure pytree.)
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax

SEP = "|"


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = SEP.join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return f"k:{p.key}"
    if hasattr(p, "idx"):
        return f"i:{p.idx}"
    if hasattr(p, "name"):
        return f"n:{p.name}"
    return str(p)


def is_orbax(path: str) -> bool:
    """Orbax checkpoints are DIRECTORIES named ``*.orbax`` (npz ones are
    single files); both formats coexist in one run dir and every consumer
    (resume, rollback, serving, generate) dispatches through here."""
    return path.rstrip("/").endswith(".orbax")


def save(path: str, state: Any, extra: Optional[Dict] = None) -> str:
    """Atomically write ``state`` (any pytree) + JSON-able ``extra`` metadata.

    ``*.orbax`` paths dispatch to the orbax backend (multi-host / sharded
    states — each shard written by its owning process); anything else is
    the single-host npz format."""
    if is_orbax(path):
        from graphical_gan_tpu.train import checkpoint_orbax
        return checkpoint_orbax.save(path, state, extra)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(state)
    header = {"extra": extra or {}, "keys": sorted(flat)}
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)),
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, __header__=json.dumps(header), **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def restore(path: str, like: Any) -> Tuple[Any, Dict]:
    """Load a checkpoint into the structure of ``like`` (same treedef).

    Returns ``(state, extra)``.  ``*.orbax`` checkpoint directories restore
    through the orbax backend — pass a SHARDED ``like`` (e.g. the trainer's
    placed state) to restore each shard directly to its owning device.
    """
    if is_orbax(path):
        from graphical_gan_tpu.train import checkpoint_orbax
        return checkpoint_orbax.restore(path, like)
    flat, extra = load_raw(path)

    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path_t, leaf in paths_leaves:
        key = SEP.join(_path_str(p) for p in path_t)
        if key not in flat:
            raise KeyError(f"checkpoint {path!r} missing leaf {key!r}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key!r}: ckpt {arr.shape} vs "
                f"state {np.shape(leaf)}")
        leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves), extra


def load_raw(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Load a checkpoint as its flat ``{keypath: array}`` dict + extra
    metadata, without requiring a ``like`` structure — format inspection
    for cross-strategy conversion (``Trainer.try_resume``).  npz only:
    orbax checkpoints restore by structure, so the pp<->standard format
    bridge (which needs raw inspection) is an npz capability."""
    if is_orbax(path):
        raise ValueError(
            f"{path!r} is an orbax checkpoint; raw keypath inspection "
            "(pp<->standard migration) requires the npz format — "
            "checkpoint with backend='npz' when migrating across pp")
    with np.load(path, allow_pickle=False) as data:
        header = json.loads(str(data["__header__"]))
        flat = {k: data[k] for k in data.files if k != "__header__"}
    return flat, header["extra"]


class AsyncWriter:
    """Background checkpoint writer with strict ordering.

    ``submit`` is called with an ON-DEVICE snapshot (the caller copies the
    live state first, since the training step donates its buffers); the
    device→host fetch AND the npz write happen on one worker thread, so
    the hot loop resumes immediately — on relayed backends the fetch alone
    is hundreds of ms per save.  Depth is one: a new submit joins the
    previous write first, keeping at most one host copy alive and making
    completion order equal submission order.  Worker exceptions re-raise
    on the next ``submit``/``join``.
    """

    def __init__(self):
        self._thread = None
        self._exc: Optional[BaseException] = None

    def submit(self, path: str, state: Any, extra: Optional[Dict],
               after=None) -> None:
        import threading
        self.join()

        def work():
            try:
                save(path, state, extra)
                if after is not None:
                    after()
            except BaseException as e:  # noqa: BLE001 — surfaced on join
                self._exc = e

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


def list_checkpoints(dirpath: str, prefix: str = "ckpt_"):
    """Sorted [(step, path)] of well-formed ``<prefix><step>.npz`` files
    and ``<prefix><step>.orbax`` directories; names that don't parse
    (e.g. manual ``ckpt_best.npz`` copies) are ignored."""
    if not os.path.isdir(dirpath):
        return []
    out = []
    for fn in os.listdir(dirpath):
        if not fn.startswith(prefix):
            continue
        for ext in (".npz", ".orbax"):
            if fn.endswith(ext):
                try:
                    step = int(fn[len(prefix):-len(ext)])
                except ValueError:
                    break
                path = os.path.join(dirpath, fn)
                # an .orbax dir without its sidecar is an INTERRUPTED
                # save (the sidecar is written after the dir commits,
                # and save() always writes one): never resume from it —
                # trainer extras (iteration/RNG) would be missing
                if ext == ".orbax" and not os.path.exists(
                        path + ".extra.json"):
                    break
                out.append((step, path))
                break
    return sorted(out)


def remove(path: str) -> None:
    """Delete one checkpoint artifact: an npz file, or an orbax directory
    plus its sidecar ``.extra.json`` (checkpoint GC's unit of work).
    Concurrency-safe: in a multi-host run every process GCs the same
    shared dir, so a loser of the unlink race must not crash."""
    if is_orbax(path):
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        try:
            os.unlink(path.rstrip("/") + ".extra.json")
        except FileNotFoundError:
            pass
        return
    try:
        os.unlink(path)
    except FileNotFoundError:
        pass


def latest(dirpath: str, prefix: str = "ckpt_") -> Optional[str]:
    """Path of the highest-step checkpoint in ``dirpath`` (or None)."""
    ckpts = list_checkpoints(dirpath, prefix)
    return ckpts[-1][1] if ckpts else None
