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
are eval-only), so stage 0 computes exactly the fetched forward.

Deeper cuts: ``build_family1_stages4`` splits the conv trunks INSIDE the
networks into a 4-stage cut (Extractor trunk | Extractor tail + Generator |
Discriminator trunk | Discriminator tail) for cifar10/svhn ali; the
scheduler, masked player-Adam and state layout are stage-count-generic
(``make_pp_train_step(n_stages=...)``, defaulting to the mesh's stage-axis
size, so ``--parallel pp --mesh-shape 4`` selects it from the CLI).
Exactness vs the sequential staged math is pinned in
tests/test_pipeline_parallel.py (losses and gradients through three
ppermute boundaries).  Cross-strategy checkpoint migration
(pp<->standard) remains a 2-stage npz capability; 4-stage runs resume
4-stage checkpoints directly.
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


# ---------------------------------------------------------------------------
# Deeper cut: 4-stage family-1 ali (intra-network conv-trunk splits)
# ---------------------------------------------------------------------------

def build_family1_stages4(model):
    """(templates[4], stage_fns[4], act_width, gen_rows) — the 4-stage
    family-1 ali cut, splitting the conv trunks across the player boundary:

        stage 0  Extractor convs 1-2 (+BN2):   real_x -> e_feat
        stage 1  Extractor tail + Generator:   e_feat -> q_z;
                                               p_z ~ N(0,I) -> fake_x
        stage 2  Discriminator conv trunk:     (real_x, fake_x) -> d_feats
        stage 3  Discriminator (x, z) tail:    -> (gen_ce, disc_ce)

    Stages 0-1 are the generator player (rows updated on G steps), 2-3 the
    discriminator player — so the player-masked Adam semantics of the
    2-stage cut carry over unchanged.  cifar10/svhn ali only: mnist reuses
    the name 'Discriminator.2' for both a conv and a linear (the reference's
    own scope collision, ``gan_inference_mnist.py:238``), which a prefix
    partition cannot split; wali-gp's gradient penalty differentiates
    through the FULL discriminator, which would cross the 2/3 boundary.
    """
    from graphical_gan_tpu.models import networks
    from graphical_gan_tpu.objectives import gan_inference as objs
    from graphical_gan_tpu.ops.layout import unflatten_image

    cfg = model.cfg
    if cfg.mode != "ali" or cfg.dataset not in ("cifar10", "svhn"):
        raise NotImplementedError(
            "the 4-stage pipeline cut supports cifar10/svhn ali "
            f"(got {cfg.dataset!r} {cfg.mode!r})")
    if jnp.dtype(getattr(cfg, "param_dtype", "float32")) != jnp.float32:
        raise NotImplementedError("pipeline parallelism keeps f32 params")

    params = model.init(jax.random.PRNGKey(0))
    pre0 = ("Extractor.1.", "Extractor.2.", "Extractor.BN2.")
    pre2 = ("Discriminator.1.", "Discriminator.2.", "Discriminator.3.")
    names0 = [n for n in params if n.startswith(pre0)]
    names2 = [n for n in params if n.startswith(pre2)]
    names1 = [n for n in params
              if (n.startswith(("Extractor.", "Generator."))
                  and n not in names0)]
    names3 = [n for n in params
              if n.startswith("Discriminator.") and n not in names2]
    cover = set(names0) | set(names1) | set(names2) | set(names3)
    if cover != set(params):
        raise ValueError(f"params outside the 4-stage partition: "
                         f"{set(params) - cover}")
    templates = [StageTemplate(params, ns)
                 for ns in (names0, names1, names2, names3)]

    h_img, w_img = cfg.data.image_hw
    ch = cfg.data.channels
    dim = cfg.dim
    d_x = cfg.data.output_dim
    d_z = cfg.dim_latent
    eh, ew = h_img // 4, w_img // 4          # after two stride-2 convs
    e_feat = eh * ew * 2 * dim
    d_feat = 4 * 4 * 4 * dim
    widths = [d_x + e_feat,                  # 0 -> 1
              2 * d_x + 2 * d_z,             # 1 -> 2
              2 * d_feat + 2 * d_z]          # 2 -> 3
    act_width = max(widths)
    cdt = model.compute_dtype

    def _pad(buf):
        return jnp.pad(buf, ((0, 0), (0, act_width - buf.shape[1])))

    def stage0_fn(p0: Params, x_mb: jax.Array, key) -> jax.Array:
        def fwd():
            real_x = model.normalize(x_mb)
            h = networks.extractor_front(
                cfg, unflatten_image(real_x.astype(cdt), ch, h_img, w_img))
            return _pad(jnp.concatenate(
                [real_x.astype(jnp.float32),
                 h.reshape(h.shape[0], -1).astype(jnp.float32)], axis=1))

        return registry.apply(fwd, p0, key)

    def stage1_fn(p1: Params, buf: jax.Array, key) -> jax.Array:
        real_x = buf[:, :d_x]
        h = buf[:, d_x:d_x + e_feat].astype(cdt).reshape(
            -1, eh, ew, 2 * dim)

        def fwd():
            b = buf.shape[0]
            q_z, _, _ = networks.extractor_back(cfg, h, batch=b)
            p_z = jax.random.normal(next_rng_key(), (b, d_z), dtype=cdt)
            fake_x, _, _ = networks.generator(cfg, p_z)
            return _pad(jnp.concatenate(
                [a.astype(jnp.float32)
                 for a in (real_x, q_z, fake_x, p_z)], axis=1))

        return registry.apply(fwd, p1, key)

    def stage2_fn(p2: Params, buf: jax.Array, key) -> jax.Array:
        real_x, q_z, fake_x, p_z = (
            buf[:, :d_x], buf[:, d_x:d_x + d_z],
            buf[:, d_x + d_z:2 * d_x + d_z],
            buf[:, 2 * d_x + d_z:2 * d_x + 2 * d_z])

        def fwd():
            h_real = networks.discriminator_x_trunk(
                cfg, unflatten_image(real_x.astype(cdt), ch, h_img, w_img))
            h_fake = networks.discriminator_x_trunk(
                cfg, unflatten_image(fake_x.astype(cdt), ch, h_img, w_img))
            return _pad(jnp.concatenate(
                [a.astype(jnp.float32)
                 for a in (h_real, h_fake, q_z, p_z)], axis=1))

        return registry.apply(fwd, p2, key)

    def stage3_fn(p3: Params, buf: jax.Array, key):
        h_real = buf[:, :d_feat].astype(cdt)
        h_fake = buf[:, d_feat:2 * d_feat].astype(cdt)
        q_z = buf[:, 2 * d_feat:2 * d_feat + d_z].astype(cdt)
        p_z = buf[:, 2 * d_feat + d_z:2 * d_feat + 2 * d_z].astype(cdt)

        def fwd():
            disc_real = networks.discriminator_xz_head(cfg, h_real, q_z)
            disc_fake = networks.discriminator_xz_head(cfg, h_fake, p_z)
            return objs.ali(disc_fake, disc_real)

        return registry.apply(fwd, p3, key)

    return (templates, [stage0_fn, stage1_fn, stage2_fn, stage3_fn],
            act_width, [0, 1])


def _normalized_stages(model, n_stages: int):
    """(templates list, stage_fns list, act_width, gen_rows) for any
    supported stage count — 2 (player cut, all families) or 4 (family-1
    ali conv-trunk cut)."""
    if n_stages == 2:
        templates, s0, s1, w = build_stages(model)
        return list(templates), [s0, s1], w, [0]
    if n_stages == 4:
        return build_family1_stages4(model)
    raise ValueError(f"unsupported pipeline stage count {n_stages} (2|4)")


def pack_stacked(model, params: Params, templates) -> jax.Array:
    """Stack the stages' packed params into ``[S, Pmax]`` (zero-padded)."""
    pmax = max(t.size for t in templates)
    rows = []
    for t in templates:
        flat = t.pack(params)
        rows.append(jnp.pad(flat, (0, pmax - t.size)))
    return jnp.stack(rows)


def unpack_stacked(stacked: jax.Array, templates) -> Params:
    out = {}
    for i, t in enumerate(templates):
        out.update(t.unpack(stacked[i]))
    return out


# ---------------------------------------------------------------------------
# Cross-strategy checkpoint conversion (elastic strategy migration)
# ---------------------------------------------------------------------------

def pp_state_like(model, n_stages: int = N_STAGES):
    """A zero pp-state pytree with the right shapes/dtypes — the ``like``
    structure for restoring a pp checkpoint without needing a mesh."""
    templates, _, _, _ = _normalized_stages(model, n_stages)
    packed = pack_stacked(model, model.init(jax.random.PRNGKey(0)),
                          templates)
    return dict(packed=packed,
                m=jnp.zeros_like(packed), v=jnp.zeros_like(packed),
                t=jnp.zeros((len(templates),), jnp.int32),
                step=jnp.zeros((), jnp.int32))


def pp_state_from_train_state(model, ts, n_stages: int = N_STAGES):
    """Convert a standard ``TrainState`` (dp/tp/sp/ep/single-device) into
    the pp packed representation (any supported stage count), so a run
    trained under any other strategy resumes under pipeline parallelism
    with its optimizer state intact.  Requires the pp-supported
    configuration: Adam for both players, f32 params (no bf16 masters)."""
    templates, _, _, gen_rows = _normalized_stages(model, n_stages)
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
    opt_of = [ts.gen_opt if s in gen_rows else ts.disc_opt
              for s in range(len(templates))]

    def pack_rows(field):
        rows = [t.pack(dict(opt[field]))
                for t, opt in zip(templates, opt_of)]
        return jnp.stack([jnp.pad(r, (0, pmax - r.shape[0]))
                          for r in rows])

    t = jnp.stack([jnp.asarray(opt["t"], jnp.int32) for opt in opt_of])
    return dict(packed=packed, m=pack_rows("m"), v=pack_rows("v"), t=t,
                step=jnp.asarray(ts.step, jnp.int32))


def train_state_from_pp_state(model, pp_state, std_init_state):
    """Inverse of ``pp_state_from_train_state``: unpack a pp checkpoint
    (stage count read from the packed rows) into the standard
    ``TrainState`` so a pipeline run resumes under any other strategy.
    ``std_init_state`` is the standard ``make_train_step`` init (builds
    the optimizer pytrees whose m/v we fill from the packed rows)."""
    n_stages = int(pp_state["packed"].shape[0])
    templates, _, _, gen_rows = _normalized_stages(model, n_stages)
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
        g, d = {}, {}
        for s, tmpl in enumerate(templates):
            (g if s in gen_rows else d).update(
                tmpl.unpack(pp_state[field][s]))
        gen_opt[field], disc_opt[field] = g, d
    g_row = gen_rows[0]
    d_row = next(s for s in range(n_stages) if s not in gen_rows)
    gen_opt["t"] = jnp.asarray(pp_state["t"][g_row], jnp.int32)
    disc_opt["t"] = jnp.asarray(pp_state["t"][d_row], jnp.int32)
    return like._replace(params=params, gen_opt=gen_opt, disc_opt=disc_opt,
                         step=jnp.asarray(pp_state["step"], jnp.int32))


def restore_pp_params(model, ckpt_path):
    """(name-keyed params, extra) from a pipeline-parallel checkpoint of
    ANY supported stage count, in either format — THE helper every
    pp-checkpoint consumer (generate/serving/export/scoring) goes
    through.  npz reads the stored row count; orbax (structure-restoring)
    tries each supported count."""
    from graphical_gan_tpu.train import checkpoint as ckpt_lib
    if ckpt_lib.is_orbax(ckpt_path):
        last = None
        for n in (N_STAGES, 4):
            try:
                like = pp_state_like(model, n)
            except (NotImplementedError, ValueError):
                continue
            try:
                state, extra = ckpt_lib.restore(ckpt_path, like)
                return unpack_stacked(
                    state["packed"],
                    _normalized_stages(model, n)[0]), extra
            except Exception as e:  # noqa: BLE001 — try the other count
                last = e
        raise last if last is not None else ValueError(ckpt_path)
    flat, _ = ckpt_lib.load_raw(ckpt_path)
    n = int(flat["k:packed"].shape[0])
    like = pp_state_like(model, n)
    state, extra = ckpt_lib.restore(ckpt_path, like)
    return unpack_stacked(state["packed"],
                          _normalized_stages(model, n)[0]), extra


# ---------------------------------------------------------------------------
# Sequential staged reference (no mesh) — the equality target for tests
# ---------------------------------------------------------------------------

def _stage_key(key, s: int, j):
    """Per-(stage, microbatch) RNG key — identical derivation in the
    pipelined program and the sequential reference (s=0 keeps the original
    2-stage derivation so existing checkpoints replay exactly)."""
    if s == 0:
        return jax.random.fold_in(key, j)
    return jax.random.fold_in(jax.random.fold_in(key, s * 0x51A6E), j)


def sequential_staged_losses(model, params: Params, raw: jax.Array, key,
                             microbatches: int, n_stages: int = 2):
    """The same staged math as the pipeline, run stage-by-stage on one
    device: per microbatch j, every stage in order; losses averaged over
    M — the equality target for the pipeline tests."""
    templates, stage_fns, _, _ = _normalized_stages(model, n_stages)
    stage_params = [{e[0]: params[e[0]] for e in t.entries}
                    for t in templates]
    b = raw.shape[0]
    mb = b // microbatches
    g_tot = jnp.float32(0.0)
    d_tot = jnp.float32(0.0)
    for j in range(microbatches):
        carry = raw[j * mb:(j + 1) * mb]
        for s in range(n_stages - 1):
            carry = stage_fns[s](stage_params[s], carry, _stage_key(key, s, j))
        g, d = stage_fns[-1](stage_params[-1], carry,
                             _stage_key(key, n_stages - 1, j))
        g_tot, d_tot = g_tot + g, d_tot + d
    inv = jnp.float32(1.0 / microbatches)
    return g_tot * inv, d_tot * inv


# ---------------------------------------------------------------------------
# The pipelined program
# ---------------------------------------------------------------------------

def _make_pipeline_losses(model, mesh: Mesh, microbatches: int,
                          stage_axis: str, n_stages: int = N_STAGES):
    """Build ``losses(stacked [S,P], raw [B,...], key) -> (gen, disc)`` as a
    scan+ppermute pipeline under shard_map over ``stage_axis``."""
    templates, stage_fns, act_width, gen_rows = _normalized_stages(
        model, n_stages)
    m_count = microbatches
    b = model.cfg.batch_size
    if b % m_count:
        raise ValueError(f"batch_size={b} not divisible by "
                         f"microbatches={m_count}")
    mb = b // m_count
    n_s = len(templates)

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
            # stage s works on microbatch t - s (clipped; bubbles masked).
            # keys are derived OUTSIDE the switch branches: grad's partial
            # eval requires every branch's known-computation outputs to
            # typematch, so per-branch key derivations must be hoisted
            js = [jnp.clip(t - s, 0, m_count - 1) for s in range(n_s)]
            ks = [_stage_key(key, s, js[s]) for s in range(n_s)]
            x_t = jax.lax.dynamic_index_in_dim(raw_mb, js[0], keepdims=False)

            def make_branch(s):
                def br(_):
                    p_s = templates[s].unpack(flat)
                    k_s = ks[s]
                    inp = x_t if s == 0 else buf
                    if s == n_s - 1:
                        g, d = stage_fns[s](p_s, inp, k_s)
                        return (zero_buf, g.astype(jnp.float32),
                                d.astype(jnp.float32))
                    out = stage_fns[s](p_s, inp, k_s)
                    # 2-stage fns emit exactly act_width; deeper cuts pad
                    # inside the stage fn, so out is always [mb, act_width]
                    return out, zero, zero
                return br

            out, g, d = jax.lax.switch(sidx,
                                       [make_branch(s) for s in range(n_s)],
                                       None)
            # the last stage's contribution is valid while it holds a real
            # microbatch: 0 <= t - (S-1) < M.  SELECT (jnp.where), never
            # multiply by a 0/1 mask: a bubble tick computes on the garbage
            # init buffer, and e.g. REINFORCE's log(q_k_prob_max) there is
            # log(0) = -inf, so mask * loss would be 0 * inf = NaN.  The
            # where keeps the forward finite; the log's backward NaN drains
            # into the constant init carry, never into params.
            valid = ((t - (n_s - 1)) >= 0) & ((t - (n_s - 1)) < m_count)
            buf_next = jax.lax.ppermute(
                out, stage_axis, [(s, s + 1) for s in range(n_s - 1)])
            return (buf_next,
                    gacc + jnp.where(valid, g, jnp.float32(0.0)),
                    dacc + jnp.where(valid, d, jnp.float32(0.0))), None

        ticks = jnp.arange(m_count + n_s - 1)
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

    return losses, templates, gen_rows


def make_pp_train_step(model, mesh: Mesh, microbatches: int = 4,
                       critic_iters: Optional[int] = None,
                       stage_axis: str = "stage", donate: bool = True,
                       n_stages: Optional[int] = None):
    """Jit the alternating G/D step as a parameter-partitioned pipeline
    over ``mesh[stage_axis]`` — 2 stages (player cut, all pp families) or
    4 (family-1 ali conv-trunk cut); the count defaults to the mesh's
    stage-axis size, so ``--parallel pp --mesh-shape 4`` selects the
    deeper cut from the CLI.

    Returns ``(step, init_state, place, read_params)`` —
    ``step(state, raw_batches, key, do_gen)`` as elsewhere;
    ``read_params(state)`` recovers the name-keyed param dict (for eval /
    checkpoint interop).  ``state`` is a dict pytree:
    ``{packed [S,P], m [S,P], v [S,P], t [S], step}`` — params AND both
    players' Adam moments live stage-sharded.
    """
    cfg = model.cfg
    if n_stages is None:
        n_stages = int(mesh.shape[stage_axis])
    if mesh.shape[stage_axis] != n_stages:
        raise ValueError(f"mesh[{stage_axis!r}] must be {n_stages}")
    k = cfg.critic_iters if critic_iters is None else critic_iters
    gen_spec, disc_spec = model.opt_specs()
    for spec in (gen_spec, disc_spec):
        if spec.kind != "adam" or spec.weight_clip is not None:
            raise NotImplementedError(
                "pipeline step implements the Adam players "
                "(ali / wali-gp / gmgan local_ep presets)")

    losses, templates, gen_rows = _make_pipeline_losses(
        model, mesh, microbatches, stage_axis, n_stages=n_stages)
    n_s = len(templates)
    disc_rows = [r for r in range(n_s) if r not in gen_rows]

    # per-stage-row Adam hyperparams (rows in gen_rows = gen player)
    def row_arr(field):
        return jnp.asarray([getattr(gen_spec if r in gen_rows else disc_spec,
                                    field) for r in range(n_s)],
                           jnp.float32)[:, None]

    lr, b1, b2, eps = (row_arr(f) for f in ("lr", "beta1", "beta2", "eps"))

    def masked_adam(stacked, m, v, t, grads, rows):
        """TF1-Adam on the packed rows, updating only the player's
        ``rows`` (the moments, counters and params of the other player's
        stages pass through untouched)."""
        mask = sum(jax.nn.one_hot(r, n_s, dtype=jnp.float32)
                   for r in rows)[:, None]
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
            packed, m, v, t = masked_adam(packed, m, v, t, grads,
                                          gen_rows)
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
            packed, m, v, t = masked_adam(packed, m, v, t, grads,
                                          disc_rows)
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
                    t=jnp.zeros((n_s,), jnp.int32),
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
