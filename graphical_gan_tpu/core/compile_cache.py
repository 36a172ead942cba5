"""Persistent XLA compilation cache for fast (re)starts.

The reference has no equivalent surface: TF1 rebuilds its graph from
Python on every launch and pays the full graph-construction +
first-`session.run` cost each time (e.g. `gan_inference_cifar10.py:415-446`
reconstructs everything before the loop).  On TPU the analogous cost is
XLA compilation of the fused training step — 20-60 s for the published
configs (BASELINE.md records 57 s for the LEN=31 chairs program) — and it
is paid again on every restart.  In a preemptible-TPU deployment that cost
sits directly on the preempt -> resume critical path, right next to the
checkpoint restore this framework already optimizes.

JAX/XLA can serialize compiled executables to an on-disk cache keyed by
(HLO, compile options, device kind); with the cache enabled a restarted
run deserializes its step functions instead of recompiling them.  This
module is the one place that turns it on, so every entrypoint exposes the
same knob:

- CLI: ``--compile-cache DIR`` on `runs/gan_inference.py`, `runs/gmgan.py`,
  `runs/ssgan.py` (and the 10 reference-named aliases).
- Env: ``GGAN_COMPILE_CACHE=DIR`` — honored by any entrypoint (CLI flag
  wins when both are set).

Notes:
- The cache is shared and content-addressed: pointing many runs (or many
  hosts of a pod, via NFS/GCS-fuse) at one directory is safe; a run never
  reads a stale entry because the key covers the HLO and device kind.
- Entries compiled for one device kind are invisible to another (a v5e
  entry never loads on a v4); no invalidation step is needed on hardware
  changes.
- ``min_compile_time_secs=0`` caches every executable including the small
  host-side jits, which is what a run directory wants: the long tail of
  tiny programs still costs dispatch round-trips to recompile on a relay.
"""

import os
from typing import Optional

import jax

__all__ = ["enable_compile_cache"]


def enable_compile_cache(cache_dir: Optional[str] = None,
                         *, min_compile_time_secs: float = 0.0
                         ) -> Optional[str]:
    """Enable the persistent compilation cache at ``cache_dir``.

    ``cache_dir`` falls back to the ``GGAN_COMPILE_CACHE`` environment
    variable; if neither is set this is a no-op returning ``None`` (the
    cache stays off — JAX's default).  Returns the absolute cache path
    when enabled.  Safe to call at any point: the setting applies to all
    subsequent XLA compiles in the process.
    """
    cache_dir = cache_dir or os.environ.get("GGAN_COMPILE_CACHE")
    if not cache_dir:
        return None
    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    return cache_dir
