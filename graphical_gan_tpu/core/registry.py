"""Functional name-keyed parameter registry.

TPU-native replacement for the reference's global ``tf.Variable`` cache
(``/root/reference/tflib/__init__.py:9-47``).  The reference relied on three
load-bearing behaviors that this module reproduces functionally:

1. *create-or-share by name*: calling a model function twice builds two
   compute paths over ONE weight set (the reference invokes ``Extractor`` 3-4x
   per script; GMGAN shares ``'Generator.Hyper.Mu'`` across ``HyperGenerator``
   and ``HyperExtractor``).
2. *name-prefix player partition*: ``params_with_name('Generator')`` selects a
   player's trainable set by substring match
   (``tflib/__init__.py:35-36``).
3. *names determine the optimizer*: a variable is trained by player G/E/D
   purely because of its name prefix.

Design (functional, jit/pjit friendly):

- ``init(fn, key, *args)`` runs ``fn`` in *init* mode: every ``param(name,
  shape, init_fn)`` call materializes the parameter once (keyed by name) with
  a key derived deterministically from ``fold_in(base_key, crc32(name))`` so
  creation order never matters and shared names always agree.
- ``apply(fn, params, key, *args)`` runs ``fn`` in *apply* mode: ``param``
  becomes a pure dict lookup, so the whole model is a pure function of a flat
  ``{name: array}`` pytree — exactly what ``jax.grad``/``jax.jit``/``pjit``
  want.
- model-internal randomness (noise layers, priors, Gumbel, reparameterization)
  draws keys from a context RNG stream via ``next_rng_key()``.

No global mutable parameter state survives outside a trace; contexts are a
thread-local stack so nested ``init``/``apply`` calls compose.
"""

from __future__ import annotations

import threading
import zlib
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


class _Context:
    __slots__ = ("mode", "params", "key", "n_keys", "created", "aliases")

    def __init__(self, mode: str, params: Params, key: Optional[jax.Array],
                 aliases: Optional[Dict[str, str]] = None):
        assert mode in ("init", "apply")
        self.mode = mode
        self.params = params
        self.key = key
        self.n_keys = 0
        # insertion-ordered names created during an init trace
        self.created = []
        # name -> name redirection (reference alias_params,
        # tflib/__init__.py:42-47): lookups follow the chain
        self.aliases = dict(aliases or {})


_local = threading.local()


def _stack():
    if not hasattr(_local, "stack"):
        _local.stack = []
    return _local.stack


def current_context() -> _Context:
    stack = _stack()
    if not stack:
        raise RuntimeError(
            "No registry context. Model functions must run under "
            "registry.init(...) or registry.apply(...)."
        )
    return stack[-1]


def in_init() -> bool:
    return current_context().mode == "init"


def _name_key(base_key: jax.Array, name: str) -> jax.Array:
    """Deterministic per-name init key: order-independent, share-consistent."""
    return jax.random.fold_in(base_key, zlib.crc32(name.encode("utf-8")))


def param(name: str, init_fn: Callable[[jax.Array], jax.Array]) -> jax.Array:
    """Create-or-fetch a named parameter.

    In init mode, ``init_fn(key)`` materializes the value the first time the
    name is seen; later calls with the same name return the stored value
    (cross-call / cross-module weight sharing).  In apply mode this is a pure
    lookup into the params pytree.
    """
    ctx = current_context()
    name = _resolve_alias(ctx, name)
    if ctx.mode == "init":
        if name not in ctx.params:
            ctx.params[name] = init_fn(_name_key(ctx.key, name))
            ctx.created.append(name)
        return ctx.params[name]
    try:
        return ctx.params[name]
    except KeyError:
        raise KeyError(
            f"Parameter {name!r} not found in params passed to apply(). "
            f"Did the apply-time call path diverge from the init trace?"
        ) from None


def _resolve_alias(ctx: _Context, name: str) -> str:
    seen = set()
    while name in ctx.aliases:
        if name in seen:
            raise ValueError(f"alias cycle at {name!r}")
        seen.add(name)
        name = ctx.aliases[name]
    return name


def alias_params(replace: Dict[str, str]) -> None:
    """Redirect parameter names for the current trace
    (``tflib/__init__.py:42-47``): after ``alias_params({'A': 'B'})``, any
    ``param('A', ...)`` resolves to the parameter named 'B'.  Scoped to the
    active init/apply context (no global mutable state)."""
    current_context().aliases.update(replace)


def delete_param_aliases() -> None:
    """``tflib/__init__.py:46-47``."""
    current_context().aliases.clear()


def get_param_value(name: str) -> jax.Array:
    """Fetch an already-created parameter's current value (init or apply)."""
    return current_context().params[name]


def next_rng_key() -> jax.Array:
    """Draw a fresh key from the context RNG stream (model-internal noise)."""
    ctx = current_context()
    if ctx.key is None:
        raise RuntimeError(
            "This model draws randomness (noise layer / prior / Gumbel / "
            "reparameterization) but no key was passed to init()/apply()."
        )
    ctx.n_keys += 1
    return jax.random.fold_in(ctx.key, 0x5EED_0000 + ctx.n_keys)


def init(fn: Callable, key: jax.Array, *args, params: Optional[Params] = None,
         **kwargs) -> Tuple[Any, Params]:
    """Trace ``fn`` creating parameters; returns ``(out, params)``.

    ``params`` may carry pre-existing values (e.g. partial restore); only
    missing names are initialized.
    """
    ctx = _Context("init", dict(params or {}), key)
    _stack().append(ctx)
    try:
        out = fn(*args, **kwargs)
    finally:
        _stack().pop()
    return out, ctx.params


def apply(fn: Callable, params: Params, key: Optional[jax.Array], *args,
          **kwargs) -> Any:
    """Run ``fn`` as a pure function of ``params`` (and the RNG ``key``)."""
    ctx = _Context("apply", params, key)
    _stack().append(ctx)
    try:
        return fn(*args, **kwargs)
    finally:
        _stack().pop()


def jit_apply(fn: Callable) -> Callable:
    """Jitted forward closure: ``jit_apply(f)(params, key, *args)`` ==
    ``apply(lambda: f(*args), params, key)`` compiled once per shape.

    Eval paths (dev sweeps, sample/reconstruction/encode hooks) call model
    forwards repeatedly at fixed shapes; eager ``apply`` dispatches op by op,
    which is wasteful on an accelerator.  Build the closure ONCE and reuse it
    so each call is a single compiled program (no retraces at a fixed shape).
    """
    @jax.jit
    def wrapped(params: Params, key: Optional[jax.Array], *args):
        return apply(lambda: fn(*args), params, key)

    return wrapped


# ---------------------------------------------------------------------------
# Player partition — reference semantics: substring match over names
# (tflib/__init__.py:35-36; scripts always use it with a prefix word).
# ---------------------------------------------------------------------------

def params_with_name(params: Params, name: str) -> Params:
    """Sub-dict of params whose key contains ``name`` (reference semantics)."""
    return {n: p for n, p in params.items() if name in n}


def partition(params: Params, names: Sequence[str]) -> Tuple[Params, Params]:
    """Split params into (matching any of ``names``, rest)."""
    hit = {n: p for n, p in params.items() if any(s in n for s in names)}
    rest = {n: p for n, p in params.items() if n not in hit}
    return hit, rest


def merge(*parts: Params) -> Params:
    out: Params = {}
    for p in parts:
        out.update(p)
    return out


def param_count(params: Params) -> int:
    return sum(int(jnp.size(v)) for v in params.values())
