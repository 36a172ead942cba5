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


def save(path: str, state: Any, extra: Optional[Dict] = None) -> str:
    """Write ``state`` (any pytree, possibly sharded) + JSON-able ``extra``."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if extra:
        import json
        with open(os.path.join(path, "extra.json"), "w") as f:
            json.dump(extra, f)
    return path


def restore(path: str, like: Any) -> Tuple[Any, Dict]:
    """Restore into the structure/shardings of ``like``."""
    import json
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    state = ckptr.restore(path, like)
    extra_path = os.path.join(path, "extra.json")
    extra = {}
    if os.path.isfile(extra_path):
        with open(extra_path) as f:
            extra = json.load(f)
    return state, extra
