"""The fused alternating train step.

The reference's hot loop (``gan_inference_cifar10.py:431-446``) was: per
iteration, one ``session.run`` for the G player and ``CRITIC_ITERS`` more for
the D player, each feeding a fresh host batch through ``feed_dict`` — i.e.
(1+k) host->device round trips + (1+k) graph launches per iteration.

Here the WHOLE iteration is one donated, jitted XLA program:

- raw batches for all (1+k) sub-updates arrive as ONE stacked on-device array
  (or are sliced from an on-device resident dataset — see ``data.ondevice``),
- G update: ``jax.grad`` w.r.t. the Generator+Extractor player only (the
  Discriminator sub-tree is a frozen argument, so no dead D-gradients are
  computed — mirroring ``var_list=gen_params+ext_params``),
- then k D updates (python-unrolled: k<=5 static, letting XLA software-
  pipeline them), each with fresh RNG and its own batch slice,
- both players' optimizer states update in-place (donated buffers),
- WGAN weight clipping / double-backward gradient penalties run inside the
  same program.

Under data parallelism the same step function is jitted with sharded batch /
replicated params (see ``parallel.mesh``); XLA inserts the psum for the grad
all-reduce automatically.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.optim import clip_params, make_optimizer

Params = Dict[str, jax.Array]


def accumulate_value_and_grad(loss_fn, accum: int):
    """Microbatched ``value_and_grad``: grad accumulation inside the step.

    The reference trains at small published batches (50-128); on TPU the
    batch-512 headroom row (BASELINE.md) shows larger batches lift MFU, and
    grad accumulation makes large EFFECTIVE batches fit bounded HBM: the raw
    [B, ...] batch splits into ``accum`` microbatches scanned sequentially —
    ``lax.scan`` keeps only one microbatch's activations live at a time — and
    the optimizer applies ONE update with the averaged gradient.

    Semantics: exact for the mean-over-samples losses (every gan_inference /
    gmgan / ssgan objective, including the per-sample gradient penalties);
    batch-COUPLED terms (batchnorm batch stats, the dormant MMD kernel,
    MiniBatchLayer) see microbatch statistics — the standard accumulation
    trade-off, documented in docs/scaling.md.  Each microbatch draws its own
    RNG (``fold_in(key, j)``), matching how the reference would see
    ``accum`` independently-sampled half-batches.

    Gradients accumulate in f32 regardless of param dtype (bf16 partial sums
    would lose low-order bits across microbatches) and are cast back to each
    leaf's gradient dtype for the optimizer.

    Returns ``fn(player_params, rest, key, raw) -> ((loss, aux), grads)``
    with ``aux=None`` (the fused step discards aux).
    """
    base = jax.value_and_grad(loss_fn, has_aux=True)

    def run(player_params, rest, key, raw):
        def split(a):
            if a.shape[0] % accum:
                raise ValueError(
                    f"batch dim {a.shape[0]} not divisible by "
                    f"accum_steps={accum}")
            return a.reshape((accum, a.shape[0] // accum) + a.shape[1:])

        micro = jax.tree.map(split, raw)
        keys = jax.vmap(lambda j: jax.random.fold_in(key, j))(
            jnp.arange(accum))

        def body(carry, inp):
            raw_j, key_j = inp
            (loss, _), grads = base(player_params, rest, key_j, raw_j)
            loss_sum, grad_sum = carry
            grad_sum = jax.tree.map(
                lambda s, g: s + g.astype(jnp.float32), grad_sum, grads)
            return (loss_sum + loss.astype(jnp.float32), grad_sum), None

        zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                             player_params)
        (loss_sum, grad_sum), _ = jax.lax.scan(
            body, (jnp.float32(0.0), zeros), (micro, keys))
        inv = jnp.float32(1.0 / accum)
        grads = jax.tree.map(
            lambda g, p: (g * inv).astype(p.dtype), grad_sum, player_params)
        return (loss_sum * inv, None), grads

    return run


class TrainState(NamedTuple):
    params: Params
    gen_opt: Any
    disc_opt: Any
    step: jax.Array           # int32 scalar


def make_train_step(model, critic_iters: Optional[int] = None,
                    lr_scale: Optional[Callable] = None,
                    jit: bool = True,
                    donate: bool = True):
    """Build ``step(state, raw_batches, key, do_gen) -> (state, metrics)``.

    ``raw_batches``: [1 + critic_iters, B, ...] stacked raw inputs (slice 0
    feeds the G update; slices 1.. feed the D updates), matching the
    reference's independently drawn batches per sub-update.
    ``do_gen``: bool scalar — the reference skips the G update at iteration 0
    (``gan_inference_cifar10.py:433``).
    """
    cfg = model.cfg
    k = cfg.critic_iters if critic_iters is None else critic_iters
    gen_spec, disc_spec = model.opt_specs()
    # Low-byte training (HBM-roofline reduction): with param_dtype=bfloat16
    # the LIVE params are stored at 2 bytes (halving every fwd/bwd weight
    # read across the 1+k sub-updates) and the optimizer keeps f32 masters;
    # moment_dtype=bfloat16 additionally halves the Adam m/v read+write.
    param_dtype = jnp.dtype(getattr(cfg, "param_dtype", "float32"))
    low_byte = param_dtype != jnp.float32
    moment_dtype = jnp.dtype(getattr(cfg, "moment_dtype", "float32"))
    opt_kw = dict(
        lr_scale=lr_scale,
        master_weights=low_byte,
        moment_dtype=None if moment_dtype == jnp.float32 else moment_dtype,
    )
    gen_opt = make_optimizer(gen_spec, **opt_kw)
    disc_opt = make_optimizer(disc_spec, **opt_kw) \
        if disc_spec is not None else None
    has_disc = disc_spec is not None

    gen_names = model.GEN_PLAYER
    disc_names = model.DISC_PLAYER

    def init_state(params: Params) -> TrainState:
        if low_byte:
            params = {n: p.astype(param_dtype) if jnp.issubdtype(
                p.dtype, jnp.floating) else p for n, p in params.items()}
        gen_params, _ = registry.partition(params, gen_names)
        disc_params, _ = registry.partition(params, disc_names)
        return TrainState(
            params=params,
            gen_opt=gen_opt.init(gen_params),
            disc_opt=disc_opt.init(disc_params) if has_disc else (),
            step=jnp.zeros((), jnp.int32),
        )

    def gen_loss_fn(gen_params: Params, rest: Params, key, raw):
        params = registry.merge(gen_params, rest)
        loss, aux = registry.apply(lambda: model.gen_loss(raw), params, key)
        return loss, aux

    def disc_loss_fn(disc_params: Params, rest: Params, key, raw):
        params = registry.merge(disc_params, rest)
        loss, aux = registry.apply(lambda: model.disc_loss(raw), params, key)
        return loss, aux

    accum = int(getattr(cfg, "accum_steps", 1) or 1)
    if accum > 1 and cfg.batch_size % accum != 0:
        raise ValueError(f"batch_size={cfg.batch_size} not divisible by "
                         f"accum_steps={accum}")

    if getattr(cfg, "remat", False):
        # Full rematerialization: the bwd pass recomputes the fwd instead of
        # reading stored intermediates from HBM.  The published step is
        # bandwidth-bound at 25-31% MFU, so the extra FLOPs are free and the
        # dropped activation write+read traffic lowers the byte roofline.
        gen_loss_fn = jax.checkpoint(gen_loss_fn)
        disc_loss_fn = jax.checkpoint(disc_loss_fn)

    if accum > 1:
        gen_vag = accumulate_value_and_grad(gen_loss_fn, accum)
        disc_vag = accumulate_value_and_grad(disc_loss_fn, accum) \
            if has_disc else None
    else:
        gen_vag = jax.value_and_grad(gen_loss_fn, has_aux=True)
        disc_vag = jax.value_and_grad(disc_loss_fn, has_aux=True) \
            if has_disc else None

    def slice_batch(raw_batches, i):
        # raw_batches is [(1+k), B, ...] — possibly a pytree (e.g. ssgan's
        # {x, y}); slice the stacked sub-update axis on every leaf
        return jax.tree.map(lambda a: a[i], raw_batches)

    def step(state: TrainState, raw_batches, key, do_gen) -> Tuple[TrainState, Dict]:
        metrics: Dict[str, jax.Array] = {}
        params = state.params
        gen_opt_state = state.gen_opt
        disc_opt_state = state.disc_opt

        # ---- G player update -------------------------------------------
        gen_params, rest_g = registry.partition(params, gen_names)
        g_key = jax.random.fold_in(key, 0)

        def do_g(_):
            (loss, aux), grads = gen_vag(gen_params, rest_g, g_key,
                                         slice_batch(raw_batches, 0))
            new_gen, new_opt = gen_opt.update(grads, gen_opt_state, gen_params)
            return new_gen, new_opt, loss

        def skip_g(_):
            loss, _ = gen_loss_fn(gen_params, rest_g, g_key, slice_batch(raw_batches, 0))
            if accum > 1:
                # the accumulated branch carries its loss in f32; match it
                loss = loss.astype(jnp.float32)
            return gen_params, gen_opt_state, loss

        new_gen, gen_opt_state, gen_cost = jax.lax.cond(do_gen, do_g, skip_g,
                                                        None)
        params = registry.merge(params, new_gen)
        metrics["gen_cost"] = gen_cost

        # ---- D player updates x k --------------------------------------
        if has_disc and k > 0:
            disc_cost = jnp.float32(0.0)
            for i in range(k):
                disc_params, rest_d = registry.partition(params, disc_names)
                d_key = jax.random.fold_in(key, 1 + i)
                (loss, aux), grads = disc_vag(
                    disc_params, rest_d, d_key, slice_batch(raw_batches, 1 + i))
                new_disc, disc_opt_state = disc_opt.update(
                    grads, disc_opt_state, disc_params)
                if disc_spec.weight_clip is not None:
                    # wali/wgan: clip all Discriminator params post-update
                    # (tflib/objs/gan_inference.py:15-24)
                    new_disc = clip_params(new_disc, disc_spec.weight_clip,
                                           "Discriminator")
                    if low_byte:
                        # masters must track the clip, or they drift outside
                        # the box and every later update re-escapes it
                        disc_opt_state = dict(
                            disc_opt_state,
                            master=clip_params(disc_opt_state["master"],
                                               disc_spec.weight_clip,
                                               "Discriminator"))
                params = registry.merge(params, new_disc)
                disc_cost = loss
            metrics["disc_cost"] = disc_cost

        new_state = TrainState(params=params, gen_opt=gen_opt_state,
                               disc_opt=disc_opt_state, step=state.step + 1)
        return new_state, metrics

    if jit:
        step = jax.jit(step, donate_argnums=(0,) if donate else ())
    return step, init_state
