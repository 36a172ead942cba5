"""Pipeline parallelism (GPipe-style) over a ``'stage'`` mesh axis.

The reference has no pipeline parallelism (SURVEY §2.10 — single device,
one session).  The adversarial-inference graph has a natural linear stage
cut that also happens to be the PLAYER cut (``gan_inference_cifar10.py:
285-291``): everything the generator player owns runs before everything the
discriminator player owns —

    stage 0  (Generator.* + Extractor.*):  real_x -> q_z = E(real_x);
                                           p_z ~ N(0,I); fake_x = G(p_z)
    stage 1  (Discriminator.*):            D(real_x, q_z), D(fake_x, p_z)
                                           -> per-microbatch (gen, disc) CE

so a 2-stage pipeline partitions the PARAMETERS (and their optimizer
moments) disjointly by stage — real model-memory partitioning, not just
compute splitting.  The schedule is the TPU-native formulation:

- each stage's param dict is flattened into one f32 vector, padded to the
  max stage size, and stacked to ``[n_stages, P]`` sharded over ``'stage'``
  — the only SPMD-expressible way to give heterogeneous stages their own
  per-device weights (GSPMD shards axes, it cannot "place" whole tensors);
- the microbatch schedule is ONE ``lax.scan`` over ``M + S - 1`` ticks
  inside ``jax.shard_map``: at each tick every device runs ITS stage
  (``lax.switch`` on ``axis_index('stage')``) on the activation it
  currently holds, then the packed activation buffer moves one stage right
  via ``lax.ppermute`` — the standard scan+ppermute SPMD pipeline;
- the BACKWARD pipeline is not hand-written: ``jax.grad`` through the
  scan/switch/ppermute program yields the reverse schedule automatically
  (the transpose of ``ppermute`` is the reversed permutation);
- bubbles are the usual GPipe ``(S-1)/(M+S-1)`` fraction: bubble ticks
  compute on garbage and their loss contributions are masked to zero, so
  they cost wall-clock but never touch the math.

Semantics: with ``M`` microbatches every mean-over-batch CE loss is the
exact full-batch loss (equal microbatches); batch-coupled ops (mnist's
batch-stat BN) see microbatch statistics — the same documented trade-off as
gradient accumulation (``train/step.py: accumulate_value_and_grad``).  The
generator player's Adam state updates only on G steps and the
discriminator's only on D steps, exactly as the unsharded alternating step
(per-row masked TF1-Adam, bias-correction counters per stage row).

Scope: family 1 with the ali objective (the reference's default MODE and
the only celebA/face mode, ``gan_inference_face.py:33``) and wali-gp (the
benchmark flagship — its gradient penalty is stage-1-local, so the double
backward never crosses the pipeline boundary); family 2 (gmgan) with ali
and local_ep (the published gmgan mode), all MODE_K paths — see
``build_gmgan_stages``.  These train graphs never
execute rec_x/rec_z (TF runs only fetched subgraphs; the reconstruction ops
are eval-only), so stage 0 computes exactly the fetched forward.  Scales:
``make_pp_train_step`` is where deeper cuts (intra-network stage splits)
slot in when a model family outgrows one chip's HBM.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.core.registry import next_rng_key

Params = Dict[str, jax.Array]

N_STAGES = 2


# ---------------------------------------------------------------------------
# Param packing: name-keyed dict <-> one flat f32 vector per stage
# ---------------------------------------------------------------------------

class StageTemplate:
    """Fixed (name, shape, dtype, offset) layout of one stage's params."""

    def __init__(self, params: Params, names: List[str]):
        self.entries = []
        off = 0
        for n in sorted(names):
            p = params[n]
            size = int(np.prod(p.shape)) if p.ndim else 1
            self.entries.append((n, tuple(p.shape), p.dtype, off, size))
            off += size
        self.size = off

    def pack(self, params: Params) -> jax.Array:
        parts = [params[n].astype(jnp.float32).reshape(-1)
                 for n, _, _, _, _ in self.entries]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), jnp.float32)

    def unpack(self, flat: jax.Array) -> Params:
        out = {}
        for n, shape, dtype, off, size in self.entries:
            out[n] = jax.lax.dynamic_slice_in_dim(flat, off, size).reshape(
                shape).astype(dtype)
        return out


def _player_stage_names(model) -> Tuple[List[str], List[str]]:
    params = model.init(jax.random.PRNGKey(0))
    s0 = [n for n in params
          if any(s in n for s in model.GEN_PLAYER)]
    s1 = [n for n in params
          if any(s in n for s in model.DISC_PLAYER)]
    leftover = set(params) - set(s0) - set(s1)
    if leftover:
        raise ValueError(f"params outside the player partition: {leftover}")
    return s0, s1


# ---------------------------------------------------------------------------
# Family-1 ali stage functions
# ---------------------------------------------------------------------------

def build_family1_stages(model):
    """(templates, stage0_fn, stage1_fn, act_width) for the ali graph.

    ``stage0_fn(params0, x_mb, key) -> [mb, C]`` packed activations
    ``stage1_fn(params1, buf, key) -> (gen_ce, disc_ce)`` microbatch means
    """
    from graphical_gan_tpu.models import networks
    from graphical_gan_tpu.objectives import gan_inference as objs
    from graphical_gan_tpu.objectives import penalties

    cfg = model.cfg
    if cfg.mode not in ("ali", "wali-gp"):
        raise NotImplementedError(
            "pipeline parallelism supports modes 'ali' and 'wali-gp' "
            f"(got {cfg.mode!r})")
    if jnp.dtype(getattr(cfg, "param_dtype", "float32")) != jnp.float32:
        raise NotImplementedError("pipeline parallelism keeps f32 params "
                                  "(packed stage buffers)")

    names0, names1 = _player_stage_names(model)
    params = model.init(jax.random.PRNGKey(0))
    tmpl0, tmpl1 = StageTemplate(params, names0), StageTemplate(params, names1)

    d_x = cfg.data.output_dim
    d_z = cfg.dim_latent
    splits = np.cumsum([d_x, d_z, d_x])  # real_x | q_z | fake_x | p_z
    act_width = 2 * d_x + 2 * d_z
    cdt = model.compute_dtype

    def stage0_fn(params0: Params, x_mb: jax.Array, key) -> jax.Array:
        def fwd():
            real_x = model.normalize(x_mb)
            q_z, _, _ = networks.extractor(cfg, real_x)
            p_z = jax.random.normal(next_rng_key(),
                                    (x_mb.shape[0], d_z), dtype=cdt)
            fake_x, _, _ = networks.generator(cfg, p_z)
            return jnp.concatenate(
                [a.astype(jnp.float32) for a in (real_x, q_z, fake_x, p_z)],
                axis=1)

        return registry.apply(fwd, params0, key)

    def stage1_fn(params1: Params, buf: jax.Array, key):
        real_x, q_z, fake_x, p_z = [a.astype(cdt)
                                    for a in jnp.split(buf, splits, axis=1)]

        def fwd():
            disc_real = networks.discriminator_xz(cfg, real_x, q_z)
            disc_fake = networks.discriminator_xz(cfg, fake_x, p_z)
            if cfg.mode == "wali-gp":
                # the gradient penalty is stage-1-local: the (x, z)
                # interpolates are built from the stage-0 activations and
                # the inner jax.grad closes over only Discriminator params,
                # so the double backward never crosses the pipeline boundary
                gp = penalties.gradient_penalty_xz(
                    lambda x, z: networks.discriminator_xz(cfg, x, z),
                    real_x, fake_x, q_z, p_z, next_rng_key(), cfg.gp_lambda)
                return objs.wali_gp(disc_fake, disc_real, gp)
            return objs.ali(disc_fake, disc_real)

        return registry.apply(fwd, params1, key)

    return (tmpl0, tmpl1), stage0_fn, stage1_fn, act_width


# ---------------------------------------------------------------------------
# Family-2 (gmgan) stage functions
# ---------------------------------------------------------------------------

def build_gmgan_stages(model):
    """(templates, stage0_fn, stage1_fn, act_width) for the gmgan graph.

    Same player cut as family 1 (``gmgan_inference_mnist.py:374-381``):
    stage 0 owns Generator.* (incl. the shared mixture means
    ``Generator.Hyper.Mu``) + Extractor.*, stage 1 the discriminators.
    Modes: ali (joint D(x,z,k)) and local_ep (the published gmgan mode —
    latent D(z,k) + data D(x,z) lists).  All MODE_K paths pipeline: the
    REINFORCE surrogate needs stage-0's q_k posterior max AND stage-1's
    latent-D output, so ``max q_k_probs`` rides the activation buffer and
    the score-function gradient flows back across the ppermute boundary
    like any other activation gradient.
    """
    from graphical_gan_tpu.models import networks
    from graphical_gan_tpu.objectives import discrete
    from graphical_gan_tpu.objectives import gan_inference as objs

    cfg = model.cfg
    if cfg.mode not in ("ali", "local_ep"):
        raise NotImplementedError(
            "gmgan pipeline parallelism supports modes 'ali' and "
            f"'local_ep' (got {cfg.mode!r})")
    if jnp.dtype(getattr(cfg, "param_dtype", "float32")) != jnp.float32:
        raise NotImplementedError("pipeline parallelism keeps f32 params "
                                  "(packed stage buffers)")

    names0, names1 = _player_stage_names(model)
    params = model.init(jax.random.PRNGKey(0))
    tmpl0, tmpl1 = StageTemplate(params, names0), StageTemplate(params, names1)

    d_x = cfg.data.output_dim
    d_z = cfg.dim_latent
    n_k = cfg.n_coms
    # real_x | q_z | q_k | fake_x | p_z | hyper_p_k | q_k_prob_max
    widths = [d_x, d_z, n_k, d_x, d_z, n_k, 1]
    splits = np.cumsum(widths)[:-1]
    act_width = int(sum(widths))
    cdt = model.compute_dtype

    def stage0_fn(params0: Params, x_mb: jax.Array, key) -> jax.Array:
        def fwd():
            real_x = model.normalize(x_mb)
            q_z, _, _ = networks.extractor(cfg, real_x)
            q_k_logits, q_k = model.hyper_extractor(q_z)
            q_k_prob_max = jnp.max(jax.nn.softmax(q_k_logits),
                                   axis=1, keepdims=True)
            b = x_mb.shape[0]
            hyper_p_z = jax.random.normal(next_rng_key(), (b, d_z))
            prior_idx = jax.random.randint(next_rng_key(), (b,), 0, n_k)
            hyper_p_k = jax.nn.one_hot(prior_idx, n_k)
            p_z = model.hyper_generator(hyper_p_k, hyper_p_z).astype(cdt)
            fake_x, _, _ = networks.generator(cfg, p_z)
            return jnp.concatenate(
                [a.astype(jnp.float32) for a in
                 (real_x, q_z, q_k, fake_x, p_z, hyper_p_k, q_k_prob_max)],
                axis=1)

        return registry.apply(fwd, params0, key)

    def stage1_fn(params1: Params, buf: jax.Array, key):
        parts = jnp.split(buf, splits, axis=1)
        real_x, q_z, q_k, fake_x, p_z, hyper_p_k = [
            a.astype(cdt) for a in parts[:6]]
        q_k_prob_max = parts[6][:, 0].astype(jnp.float32)

        def fwd():
            if cfg.mode == "local_ep":
                disc_fake = [model.hyper_discriminator(p_z, hyper_p_k),
                             model.discriminator_xz(fake_x, p_z)]
                disc_real = [model.hyper_discriminator(q_z, q_k),
                             model.discriminator_xz(real_x, q_z)]
                f_k = disc_real[0]
            else:  # ali
                disc_real = model.discriminator_xzk(real_x, q_z, q_k)
                disc_fake = model.discriminator_xzk(fake_x, p_z, hyper_p_k)
                f_k = disc_real
            s_f = None
            if cfg.mode_k == "REINFORCE":
                s_f = jnp.mean(discrete.score_function(
                    f_k, q_k_prob_max, cfg.control_variate))
            if cfg.mode == "local_ep":
                return objs.local_ep(disc_fake, disc_real, s_f=s_f)
            return objs.ali(disc_fake, disc_real, s_f=s_f)

        return registry.apply(fwd, params1, key)

    return (tmpl0, tmpl1), stage0_fn, stage1_fn, act_width


def build_stages(model):
    """Family dispatch: the pipeline scheduler is family-agnostic; only the
    two stage closures differ."""
    from graphical_gan_tpu.models.gmgan import GMGanModel
    if isinstance(model, GMGanModel):
        return build_gmgan_stages(model)
    return build_family1_stages(model)


def pack_stacked(model, params: Params, templates) -> jax.Array:
    """Stack both stages' packed params into ``[2, Pmax]`` (zero-padded)."""
    tmpl0, tmpl1 = templates
    pmax = max(tmpl0.size, tmpl1.size)
    rows = []
    for t in (tmpl0, tmpl1):
        flat = t.pack(params)
        rows.append(jnp.pad(flat, (0, pmax - t.size)))
    return jnp.stack(rows)


def unpack_stacked(stacked: jax.Array, templates) -> Params:
    tmpl0, tmpl1 = templates
    out = tmpl0.unpack(stacked[0])
    out.update(tmpl1.unpack(stacked[1]))
    return out


# ---------------------------------------------------------------------------
# Cross-strategy checkpoint conversion (elastic strategy migration)
# ---------------------------------------------------------------------------

def pp_state_like(model):
    """A zero pp-state pytree with the right shapes/dtypes — the ``like``
    structure for restoring a pp checkpoint without needing a mesh."""
    templates, *_ = build_stages(model)
    packed = pack_stacked(model, model.init(jax.random.PRNGKey(0)),
                          templates)
    return dict(packed=packed,
                m=jnp.zeros_like(packed), v=jnp.zeros_like(packed),
                t=jnp.zeros((N_STAGES,), jnp.int32),
                step=jnp.zeros((), jnp.int32))


def pp_state_from_train_state(model, ts):
    """Convert a standard ``TrainState`` (dp/tp/sp/ep/single-device) into
    the pp packed representation, so a run trained under any other strategy
    resumes under pipeline parallelism with its optimizer state intact.
    Requires the pp-supported configuration: Adam for both players, f32
    params (no bf16 masters)."""
    templates, *_ = build_stages(model)
    tmpl0, tmpl1 = templates
    for opt in (ts.gen_opt, ts.disc_opt):
        if not isinstance(opt, dict) or "m" not in opt:
            raise NotImplementedError(
                "pp checkpoint conversion requires Adam optimizer state "
                "for both players")
        if "master" in opt:
            raise NotImplementedError(
                "pp checkpoint conversion does not support bf16 "
                "master-weight (low-byte) states")
    packed = pack_stacked(model, dict(ts.params), templates)
    pmax = packed.shape[1]

    def pack_rows(field):
        r0 = tmpl0.pack(dict(ts.gen_opt[field]))
        r1 = tmpl1.pack(dict(ts.disc_opt[field]))
        return jnp.stack([jnp.pad(r0, (0, pmax - r0.shape[0])),
                          jnp.pad(r1, (0, pmax - r1.shape[0]))])

    t = jnp.stack([jnp.asarray(ts.gen_opt["t"], jnp.int32),
                   jnp.asarray(ts.disc_opt["t"], jnp.int32)])
    return dict(packed=packed, m=pack_rows("m"), v=pack_rows("v"), t=t,
                step=jnp.asarray(ts.step, jnp.int32))


def train_state_from_pp_state(model, pp_state, std_init_state):
    """Inverse of ``pp_state_from_train_state``: unpack a pp checkpoint into
    the standard ``TrainState`` so a pipeline run resumes under any other
    strategy.  ``std_init_state`` is the standard ``make_train_step`` init
    (builds the optimizer pytrees whose m/v we fill from the packed rows)."""
    templates, *_ = build_stages(model)
    tmpl0, tmpl1 = templates
    params = unpack_stacked(pp_state["packed"], templates)
    like = std_init_state(params)
    for opt in (like.gen_opt, like.disc_opt):
        if not isinstance(opt, dict) or "m" not in opt or "master" in opt:
            raise NotImplementedError(
                "pp checkpoint conversion requires the plain-Adam f32 "
                "configuration on the restoring side too")
    gen_opt = dict(like.gen_opt)
    disc_opt = dict(like.disc_opt)
    for field in ("m", "v"):
        gen_opt[field] = tmpl0.unpack(pp_state[field][0])
        disc_opt[field] = tmpl1.unpack(pp_state[field][1])
    gen_opt["t"] = jnp.asarray(pp_state["t"][0], jnp.int32)
    disc_opt["t"] = jnp.asarray(pp_state["t"][1], jnp.int32)
    return like._replace(params=params, gen_opt=gen_opt, disc_opt=disc_opt,
                         step=jnp.asarray(pp_state["step"], jnp.int32))


# ---------------------------------------------------------------------------
# Sequential staged reference (no mesh) — the equality target for tests
# ---------------------------------------------------------------------------

def sequential_staged_losses(model, params: Params, raw: jax.Array, key,
                             microbatches: int):
    """The same staged math as the pipeline, run stage-by-stage on one
    device: per microbatch j, stage0 then stage1; losses averaged over M."""
    templates, stage0_fn, stage1_fn, _ = build_stages(model)
    names0 = [e[0] for e in templates[0].entries]
    p0 = {n: params[n] for n in names0}
    p1 = {n: params[n] for n in params if n not in p0}
    b = raw.shape[0]
    mb = b // microbatches
    g_tot = jnp.float32(0.0)
    d_tot = jnp.float32(0.0)
    for j in range(microbatches):
        x = raw[j * mb:(j + 1) * mb]
        k0 = jax.random.fold_in(key, j)
        k1 = jax.random.fold_in(jax.random.fold_in(key, 0x51A6E), j)
        buf = stage0_fn(p0, x, k0)
        g, d = stage1_fn(p1, buf, k1)
        g_tot, d_tot = g_tot + g, d_tot + d
    inv = jnp.float32(1.0 / microbatches)
    return g_tot * inv, d_tot * inv


# ---------------------------------------------------------------------------
# The pipelined program
# ---------------------------------------------------------------------------

def _make_pipeline_losses(model, mesh: Mesh, microbatches: int,
                          stage_axis: str):
    """Build ``losses(stacked [2,P], raw [B,...], key) -> (gen, disc)`` as a
    scan+ppermute pipeline under shard_map over ``stage_axis``."""
    templates, stage0_fn, stage1_fn, act_width = build_stages(model)
    m_count = microbatches
    b = model.cfg.batch_size
    if b % m_count:
        raise ValueError(f"batch_size={b} not divisible by "
                         f"microbatches={m_count}")
    mb = b // m_count
    tmpl0, tmpl1 = templates

    def pipelined(stacked_local, raw_mb, key):
        # stacked_local: [1, Pmax] — this device's stage params
        flat = stacked_local[0]
        sidx = jax.lax.axis_index(stage_axis)

        def varying(x):
            # the switch branches and the scan carry mix device-varying
            # values (everything descending from the stage-local params)
            # with literal zeros; tag the zeros as varying over the stage
            # axis so the manual-axes types line up
            return jax.lax.pcast(x, stage_axis, to="varying")

        zero_buf = varying(jnp.zeros((mb, act_width), jnp.float32))
        zero = varying(jnp.float32(0.0))

        def tick(carry, t):
            buf, gacc, dacc = carry
            j0 = jnp.clip(t, 0, m_count - 1)          # stage0's microbatch
            j1 = jnp.clip(t - 1, 0, m_count - 1)      # stage1's microbatch
            x_t = jax.lax.dynamic_index_in_dim(raw_mb, j0, keepdims=False)
            k0 = jax.random.fold_in(key, j0)
            k1 = jax.random.fold_in(jax.random.fold_in(key, 0x51A6E), j1)

            def br0(_):
                out = stage0_fn(tmpl0.unpack(flat), x_t, k0)
                return out, zero, zero

            def br1(_):
                g, d = stage1_fn(tmpl1.unpack(flat), buf, k1)
                return zero_buf, g.astype(jnp.float32), d.astype(jnp.float32)

            out, g, d = jax.lax.switch(sidx, [br0, br1], None)
            # the last stage's contribution is valid while it holds a real
            # microbatch: 0 <= t - (S-1) < M.  SELECT (jnp.where), never
            # multiply by a 0/1 mask: a bubble tick computes on the garbage
            # init buffer, and e.g. REINFORCE's log(q_k_prob_max) there is
            # log(0) = -inf, so mask * loss would be 0 * inf = NaN.  The
            # where keeps the forward finite; the log's backward NaN drains
            # into the constant init carry, never into params.
            valid = ((t - (N_STAGES - 1)) >= 0) & ((t - (N_STAGES - 1))
                                                   < m_count)
            buf_next = jax.lax.ppermute(
                out, stage_axis, [(s, s + 1) for s in range(N_STAGES - 1)])
            return (buf_next,
                    gacc + jnp.where(valid, g, jnp.float32(0.0)),
                    dacc + jnp.where(valid, d, jnp.float32(0.0))), None

        ticks = jnp.arange(m_count + N_STAGES - 1)
        (_, gacc, dacc), _ = jax.lax.scan(tick, (zero_buf, zero, zero),
                                          ticks)
        inv = jnp.float32(1.0 / m_count)
        # only the last stage accumulated anything; psum replicates the
        # totals so the out_spec can be P()
        return (jax.lax.psum(gacc, stage_axis) * inv,
                jax.lax.psum(dacc, stage_axis) * inv)

    smapped = jax.shard_map(
        pipelined, mesh=mesh,
        in_specs=(P(stage_axis, None), P(), P()),
        out_specs=(P(), P()),
    )

    def losses(stacked, raw, key):
        raw_mb = raw.reshape((m_count, mb) + raw.shape[1:])
        return smapped(stacked, raw_mb, key)

    return losses, templates


def make_pp_train_step(model, mesh: Mesh, microbatches: int = 4,
                       critic_iters: Optional[int] = None,
                       stage_axis: str = "stage", donate: bool = True):
    """Jit the alternating G/D step as a 2-stage parameter-partitioned
    pipeline over ``mesh[stage_axis]``.

    Returns ``(step, init_state, place, read_params)`` —
    ``step(state, raw_batches, key, do_gen)`` as elsewhere;
    ``read_params(state)`` recovers the name-keyed param dict (for eval /
    checkpoint interop).  ``state`` is a dict pytree:
    ``{packed [2,P], m [2,P], v [2,P], t [2], step}`` — params AND both
    players' Adam moments live stage-sharded.
    """
    cfg = model.cfg
    if mesh.shape[stage_axis] != N_STAGES:
        raise ValueError(f"mesh[{stage_axis!r}] must be {N_STAGES}")
    k = cfg.critic_iters if critic_iters is None else critic_iters
    gen_spec, disc_spec = model.opt_specs()
    for spec in (gen_spec, disc_spec):
        if spec.kind != "adam" or spec.weight_clip is not None:
            raise NotImplementedError(
                "pipeline step implements the Adam players "
                "(ali / wali-gp / gmgan local_ep presets)")

    losses, templates = _make_pipeline_losses(model, mesh, microbatches,
                                              stage_axis)

    # per-stage-row Adam hyperparams (row 0 = gen player, row 1 = disc)
    lr = jnp.asarray([gen_spec.lr, disc_spec.lr], jnp.float32)[:, None]
    b1 = jnp.asarray([gen_spec.beta1, disc_spec.beta1], jnp.float32)[:, None]
    b2 = jnp.asarray([gen_spec.beta2, disc_spec.beta2], jnp.float32)[:, None]
    eps = jnp.asarray([gen_spec.eps, disc_spec.eps], jnp.float32)[:, None]

    def masked_adam(stacked, m, v, t, grads, row: int):
        """TF1-Adam on the packed rows, updating only ``row`` (the moments,
        counters and params of the other stage pass through untouched)."""
        mask = jax.nn.one_hot(row, N_STAGES, dtype=jnp.float32)[:, None]
        t_new = t + mask[:, 0].astype(t.dtype)
        # clamp the bias-correction exponent: the row NOT being updated may
        # still have t=0, whose correction is 0/0 = NaN — and 0 * NaN = NaN
        # would leak through the mask
        tf_ = jnp.maximum(t_new.astype(jnp.float32), 1.0)[:, None]
        lr_t = lr * jnp.sqrt(1.0 - b2 ** tf_) / (1.0 - b1 ** tf_)
        m_new = b1 * m + (1 - b1) * grads
        v_new = b2 * v + (1 - b2) * jnp.square(grads)
        upd = lr_t * m_new / (jnp.sqrt(v_new) + eps)
        return (stacked - mask * upd,
                jnp.where(mask > 0, m_new, m),
                jnp.where(mask > 0, v_new, v),
                t_new)

    gen_vag = jax.value_and_grad(lambda p, raw, key: losses(p, raw, key)[0])
    disc_vag = jax.value_and_grad(lambda p, raw, key: losses(p, raw, key)[1])

    def slice_batch(raw_batches, i):
        return jax.tree.map(lambda a: a[i], raw_batches)

    def step(state, raw_batches, key, do_gen):
        packed, m, v, t = state["packed"], state["m"], state["v"], state["t"]
        g_key = jax.random.fold_in(key, 0)
        raw0 = slice_batch(raw_batches, 0)

        def do_g(args):
            packed, m, v, t = args
            loss, grads = gen_vag(packed, raw0, g_key)
            packed, m, v, t = masked_adam(packed, m, v, t, grads, 0)
            return packed, m, v, t, loss

        def skip_g(args):
            packed, m, v, t = args
            loss = losses(packed, raw0, g_key)[0]
            return packed, m, v, t, loss

        packed, m, v, t, gen_cost = jax.lax.cond(
            do_gen, do_g, skip_g, (packed, m, v, t))
        metrics = {"gen_cost": gen_cost}

        disc_cost = jnp.float32(0.0)
        for i in range(k):
            d_key = jax.random.fold_in(key, 1 + i)
            disc_cost, grads = disc_vag(packed, slice_batch(raw_batches,
                                                            1 + i), d_key)
            packed, m, v, t = masked_adam(packed, m, v, t, grads, 1)
        if k > 0:
            metrics["disc_cost"] = disc_cost

        new_state = dict(packed=packed, m=m, v=v, t=t,
                         step=state["step"] + 1)
        return new_state, metrics

    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())
    # the unjitted step, for embedding in larger programs (the Trainer's
    # resident hot loop traces it inside its scanned multi-iteration chunk)
    jitted.raw_step = step

    def init_state(params: Params):
        packed = pack_stacked(model, params, templates)
        return dict(packed=packed,
                    m=jnp.zeros_like(packed), v=jnp.zeros_like(packed),
                    t=jnp.zeros((N_STAGES,), jnp.int32),
                    step=jnp.zeros((), jnp.int32))

    stage_sh = NamedSharding(mesh, P(stage_axis, None))
    repl = NamedSharding(mesh, P())

    def place(state):
        return dict(
            packed=jax.device_put(state["packed"], stage_sh),
            m=jax.device_put(state["m"], stage_sh),
            v=jax.device_put(state["v"], stage_sh),
            t=jax.device_put(state["t"], repl),
            step=jax.device_put(state["step"], repl),
        )

    def read_params(state) -> Params:
        return unpack_stacked(state["packed"], templates)

    return jitted, init_state, place, read_params
