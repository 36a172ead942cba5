"""Tensor-parallel sharding rules for the DCGAN-style networks.

The reference has no model parallelism (SURVEY §2.10); for this framework TP
is a config: a name-pattern -> PartitionSpec rule set placed on the param
pytree, with XLA GSPMD deriving the collectives.  The DCGAN nets are
channel-dominated, so the natural TP axis is the channel dimension:

- conv kernels HWIO: shard O (the output-channel / lane dim),
- transpose-conv kernels (H, W, out, in): shard the out dim (axis 2),
- dense kernels (in, out): shard out,
- biases / BN offset-scale: shard their only (channel) dim when it belongs
  to a sharded layer output.

Sharding every layer's OUTPUT channels makes each layer's input channels
arrive replicated-after-all-gather; XLA alternates all-gathers with sharded
convs.  For the 64x64 CelebA nets (dim 8*32=256+ channels) this halves
per-chip HBM for weights and activations on a 2-way model axis.  Output
heads (channel dim 1/3) and tiny vectors stay replicated.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, jax.Array]

_MIN_SHARD = 8  # don't shard tiny channel dims


def _spec_for(name: str, shape, model_axis: str, mesh_size: int) -> P:
    ndim = len(shape)

    def ok(dim_size):
        return dim_size >= _MIN_SHARD and dim_size % mesh_size == 0

    if name.endswith(".Mu"):
        # gmgan's mixture means 'Generator.Hyper.Mu' [n_coms, dim_latent]:
        # read by BOTH the prior matmul (k @ Mu) and the posterior
        # squared-distance logits, <= 100x256 floats — deliberately
        # replicated (sharding either dim would all-gather it right back
        # for the pairwise-distance broadcast).
        return P()
    if name.endswith(".Filters") and ndim == 4:
        # Generator conv kernels are all transpose convs with layout
        # (H, W, out, in) — shard out (axis 2); everything else is a forward
        # conv HWIO — shard O (axis 3).
        if name.startswith("Generator."):
            if ok(shape[2]):
                return P(None, None, model_axis, None)
            return P()
        if ok(shape[3]):
            return P(None, None, None, model_axis)
        return P()
    if name.endswith(".Filters") and ndim == 5:  # conv3d DHWIO
        if ok(shape[4]):
            return P(None, None, None, None, model_axis)
        return P()
    if name.endswith(".W") and ndim == 2:
        if ok(shape[1]):
            return P(None, model_axis)
        return P()
    if ndim == 1 and ok(shape[0]):
        # biases / bn scale+offset over channels
        return P(model_axis)
    return P()


def tp_param_shardings(params: Params, mesh: Mesh,
                       model_axis: str = "model") -> Dict[str, NamedSharding]:
    """NamedSharding per param for channel-dim tensor parallelism."""
    size = mesh.shape[model_axis]
    return {
        n: NamedSharding(mesh, _spec_for(n, p.shape, model_axis, size))
        for n, p in params.items()
    }


def make_tp_train_step(model, mesh: Mesh, critic_iters: Optional[int] = None,
                       data_axis: str = "data", model_axis: str = "model",
                       donate: bool = True, lr_scale=None):
    """Jit the fused step over a 2-D (data, model) mesh: batch sharded over
    ``data``, params channel-sharded over ``model`` per
    ``tp_param_shardings``; XLA inserts both the DP psum and the TP
    all-gathers.

    Returns ``(step, init_state, place)`` like
    ``mesh.make_parallel_train_step``.
    """
    from graphical_gan_tpu.train.step import make_train_step

    raw_step, init_state = make_train_step(model, critic_iters=critic_iters,
                                           lr_scale=lr_scale, jit=False)
    repl = NamedSharding(mesh, P())

    def batch_constraint(x):
        spec = [None] * x.ndim
        spec[1] = data_axis
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh,
                                                                 P(*spec)))

    def step(state, raw_batches, key, do_gen):
        raw_batches = jax.tree.map(batch_constraint, raw_batches)
        return raw_step(state, raw_batches, key, do_gen)

    jitted = jax.jit(step, in_shardings=(None, None, repl, repl),
                     donate_argnums=(0,) if donate else ())

    def place(state):
        shardings = tp_param_shardings(state.params, mesh, model_axis)

        def put_opt(tree):
            # optimizer states are {"m": {name: arr}, "v": {...}, "t": t} /
            # {"ms": {...}} — moment dicts mirror the param names
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
