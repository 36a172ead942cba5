"""Orbax-backed checkpointing (optional; multi-host / sharded states).

The default ``train/checkpoint.py`` npz format is single-host and
materializes the full state on the saving process — the right tool for the
reference-scale models (tens of MB).  For pod-scale sharded states (e.g.
tensor-parallel placements from ``parallel/sharding_rules``), Orbax writes
each shard from its owning host and restores with the target shardings.

API mirrors the npz module: ``save(path, state, extra)`` /
``restore(path, like)`` where ``like`` supplies structure, dtypes and (for
sharded restore) target shardings.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def _normalize(path: str) -> str:
    # remote URIs (gs://, s3://, ...) must pass through untouched — orbax's
    # epath layer handles them; only bare local paths get absolutized
    if "://" in path:
        return path
    return os.path.abspath(path)


def _extra_path(path: str) -> str:
    # sibling file, NOT inside the orbax directory: writing into a finalized
    # checkpoint dir would break orbax's atomic-commit property
    return path.rstrip("/") + ".extra.json"


def save(path: str, state: Any, extra: Optional[Dict] = None) -> str:
    """Write ``state`` (any pytree, possibly sharded) + JSON-able ``extra``.

    Multi-host safe: every process calls save() (orbax coordinates the shard
    writes); the extra metadata is written by process 0 only, atomically.
    """
    path = _normalize(path)
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    # ALWAYS write the sidecar (even for empty extra): consumers treat a
    # committed .orbax directory without its sidecar as an interrupted
    # save (checkpoint.list_checkpoints skips it), which is what makes
    # the two-step dir+sidecar write crash-safe end to end
    extra = extra or {}
    if jax.process_index() == 0:
        import json
        from etils import epath
        target = epath.Path(_extra_path(path))
        if "://" in path:
            # object stores have atomic single-object puts
            target.write_text(json.dumps(extra))
        else:
            tmp = _extra_path(path) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(extra, f)
            os.replace(tmp, _extra_path(path))
    return path


def restore(path: str, like: Any) -> Tuple[Any, Dict]:
    """Restore into the structure/shardings of ``like``."""
    import json
    from etils import epath
    path = _normalize(path)
    ckptr = _checkpointer()
    state = ckptr.restore(path, like)
    extra = {}
    ep = epath.Path(_extra_path(path))
    if ep.exists():
        extra = json.loads(ep.read_text())
    return state, extra
