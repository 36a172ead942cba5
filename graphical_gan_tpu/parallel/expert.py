"""Expert parallelism for the mixture family (GMGAN).

The reference's GMGAN mixes N_COMS Gaussian components through one dense
means matrix ``'Generator.Hyper.Mu'`` (``gmgan_inference_mnist.py:142-165``;
N_COMS = 30 mnist/cifar10, 50 svhn, 100 face) — a dense mixture, not routed
experts, but the component axis IS the model's expert axis: every hyper
computation is embarrassingly parallel over components until the softmax /
argmax reductions.

This module shards that axis over a mesh axis ``'expert'``:

- ``Generator.Hyper.Mu [n_coms, dim_latent]`` shards on axis 0, and so do
  its optimizer moments — each chip owns ``n_coms / E`` components.
- The posterior's pairwise squared-distance broadcast
  ``[B, n_coms, dim_latent]`` — the one tensor that grows with N_COMS
  (face: 128 x 100 x 256 per application, four applications per iteration)
  — partitions over (data, expert), as do the component logits and k
  samples ``[B, n_coms]``.
- The prior matmul ``k @ Mu`` contracts the sharded axis: GSPMD turns it
  into a partial matmul + one psum over ``expert``; the softmax / argmax
  over components become sharded reductions with small cross-expert
  collectives.  No hand-written collective code.

Sharding enters in two places: the param/moment placement (``place``) and
one ``with_sharding_constraint`` on each ``[..., n_coms]`` tensor at its
creation point (``core/shard_ctx.constrain_components`` — needed because
the prior k descends from a replicated RNG draw, so input propagation alone
would leave the prior-side compute unsharded, mirroring the sequence-parallel
fold-point lesson).

Contrast with TP (``parallel/sharding_rules.py``), which deliberately
REPLICATES Mu — the right call when n_coms is small and the channel dims are
the big axes.  EP is the complementary regime: component count is the axis
that scales (the reference already runs 100), channels stay replicated.
Both compose with data parallelism as 2-D (data, expert) meshes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, jax.Array]


def ep_param_shardings(params: Params, mesh: Mesh,
                       expert_axis: str = "expert"
                       ) -> Dict[str, NamedSharding]:
    """NamedSharding per param: mixture means sharded over ``expert`` on the
    component axis, everything else replicated."""
    size = mesh.shape[expert_axis]
    out = {}
    for n, p in params.items():
        if n.endswith(".Mu") and p.ndim == 2 and p.shape[0] % size == 0:
            out[n] = NamedSharding(mesh, P(expert_axis, None))
        else:
            out[n] = NamedSharding(mesh, P())
    return out


def make_ep_train_step(model, mesh: Mesh,
                       critic_iters: Optional[int] = None,
                       data_axis: str = "data", expert_axis: str = "expert",
                       donate: bool = True, lr_scale=None):
    """Jit the fused gmgan step over a 2-D (data, expert) mesh.

    Batch dim sharded over ``data``, the mixture-component axis over
    ``expert`` (params via ``ep_param_shardings``, activations via the
    component-constraint hook); XLA inserts the DP psum plus the expert-axis
    collectives.  Returns ``(step, init_state, place)`` like
    ``mesh.make_parallel_train_step``.

    Divisibility: B % mesh['data'] == 0 and n_coms % mesh['expert'] == 0
    (every published config's N_COMS has small factors; a non-dividing
    n_coms falls back to replicated Mu and the constraint becomes the
    replicated spec on that axis).
    """
    from graphical_gan_tpu.core import shard_ctx
    from graphical_gan_tpu.train.step import make_train_step

    raw_step, init_state = make_train_step(model, critic_iters=critic_iters,
                                           lr_scale=lr_scale, jit=False)
    repl = NamedSharding(mesh, P())
    expert_size = mesh.shape[expert_axis]
    n_coms = model.cfg.n_coms
    shard_components = n_coms % expert_size == 0

    def batch_constraint(x):
        spec = [None] * x.ndim
        spec[1] = data_axis  # stacked raw batches [(1+k), B, ...]
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec)))

    def component_fold(h):
        # [..., n_coms]-last tensors (logits, k samples, the sq-distance
        # broadcast carries it at axis -2 via propagation): batch on data,
        # components on expert
        spec = [None] * h.ndim
        spec[0] = data_axis
        if shard_components:
            spec[-1] = expert_axis
        return jax.lax.with_sharding_constraint(
            h, NamedSharding(mesh, P(*spec)))

    def step(state, raw_batches, key, do_gen):
        raw_batches = jax.tree.map(batch_constraint, raw_batches)
        with shard_ctx.component_constraint(component_fold):
            return raw_step(state, raw_batches, key, do_gen)

    jitted = jax.jit(step, in_shardings=(None, None, repl, repl),
                     donate_argnums=(0,) if donate else ())

    def place(state):
        shardings = ep_param_shardings(state.params, mesh, expert_axis)

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
