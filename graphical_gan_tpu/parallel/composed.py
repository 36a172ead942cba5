"""Composed parallelism: one step factory over an arbitrary mesh.

The reference is single-device (SURVEY §2.10/§2.11); this framework scales by
mesh axes.  ``parallel/mesh.py`` (DP), ``parallel/sharding_rules.py`` (TP) and
``parallel/sequence.py`` (SP, video family) each wire ONE pair of axes; this
module composes all three over a single ``jax.sharding.Mesh`` of up to three
named axes:

- ``data_axis``  — batch dim of every raw input sharded; grad psum via GSPMD,
- ``seq_axis``   — the video frame dim LEN sharded; the folded B*LEN frame
  networks partition over (data, seq) through the ``core.shard_ctx`` fold
  constraints (see ``parallel/sequence.py`` for why this is the right
  decomposition for family 3),
- ``model_axis`` — params channel-sharded by the name-pattern rules of
  ``parallel/sharding_rules.py``; XLA alternates all-gathers with sharded
  convs.

Any subset may be ``None``, so this factory subsumes the three specialized
ones: DP is ``(data,)``, TP is ``(data, model)``, SP is ``(data, seq)``, and
the full 3-D ``(data, seq, model)`` runs the video family with the frame
batch partitioned over data x seq AND every conv's channels over model — the
layout a pod slice would use for chairs-scale video (LEN=31) at large B.

No hand-written collectives anywhere: shardings enter as constraints on the
raw batch, fold points, and the param/optimizer trees; XLA GSPMD derives
every all-gather / reduce-scatter / psum.  Verified equal to the unsharded
program on a virtual 2x2x2 mesh (``tests/test_composed_parallel.py``).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphical_gan_tpu.core import shard_ctx
from graphical_gan_tpu.parallel.sharding_rules import tp_param_shardings


def make_composed_train_step(model, mesh: Mesh,
                             critic_iters: Optional[int] = None,
                             data_axis: Optional[str] = "data",
                             seq_axis: Optional[str] = None,
                             model_axis: Optional[str] = None,
                             donate: bool = True, lr_scale=None):
    """Jit the fused step over ``mesh`` with any of DP/SP/TP active.

    Every named axis must exist in ``mesh``; divisibility requirements are
    the union of the component strategies' (B % data, LEN % seq, channel
    dims % model — tiny/indivisible channels stay replicated by rule).

    Returns ``(step, init_state, place)`` like the specialized factories.
    """
    from graphical_gan_tpu.train.step import make_train_step

    for ax in (data_axis, seq_axis, model_axis):
        if ax is not None and ax not in mesh.shape:
            raise ValueError(f"mesh has axes {tuple(mesh.shape)}, "
                             f"missing {ax!r}")

    raw_step, init_state = make_train_step(model, critic_iters=critic_iters,
                                           lr_scale=lr_scale, jit=False)
    repl = NamedSharding(mesh, P())

    def batch_constraint(x):
        # stacked raw leaves: [(1+k), B, ...] — and for 4-D video leaves
        # [(1+k), B, LEN, D] the frame dim shards over seq (layouts:
        # parallel/sequence.py: video_batch_spec)
        spec = [None] * x.ndim
        if x.ndim >= 2:
            spec[1] = data_axis
        if seq_axis is not None and x.ndim == 4:
            spec[2] = seq_axis
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh,
                                                                 P(*spec)))

    def fold_constraint(h):
        # a folded [B*LEN, ...] frame tensor: leading dim is the row-major
        # (B, LEN) merge, so it partitions over the (data, seq) product pair
        spec = [None] * h.ndim
        spec[0] = (data_axis, seq_axis) if data_axis is not None else seq_axis
        return jax.lax.with_sharding_constraint(h, NamedSharding(mesh,
                                                                 P(*spec)))

    def step(state, raw_batches, key, do_gen):
        raw_batches = jax.tree.map(batch_constraint, raw_batches)
        if seq_axis is not None:
            with shard_ctx.frame_constraint(fold_constraint):
                return raw_step(state, raw_batches, key, do_gen)
        return raw_step(state, raw_batches, key, do_gen)

    jitted = jax.jit(step,
                     in_shardings=(None, None, repl, repl),
                     donate_argnums=(0,) if donate else ())

    def place(state):
        if model_axis is None:
            return jax.tree.map(lambda x: jax.device_put(x, repl), state)
        shardings = tp_param_shardings(state.params, mesh, model_axis)

        def put_opt(tree):
            # optimizer states: moment dicts mirror the param names; any
            # scalar leaves (t) replicate
            out = {}
            for kk, vv in tree.items():
                if isinstance(vv, dict):
                    out[kk] = {n: jax.device_put(p, shardings.get(n, repl))
                               for n, p in vv.items()}
                else:
                    out[kk] = jax.device_put(vv, repl)
            return out

        return type(state)(
            params={n: jax.device_put(p, shardings[n])
                    for n, p in state.params.items()},
            gen_opt=put_opt(state.gen_opt),
            disc_opt=put_opt(state.disc_opt) if state.disc_opt else (),
            step=jax.device_put(state.step, repl),
        )

    return jitted, init_state, place
