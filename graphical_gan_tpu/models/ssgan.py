"""Model family 3 — SSGAN (state-space GAN over video).

Rebuild of ``ssgan_inference_{moving_mnist,chairs}.py``.  The reference
unrolled the latent chain host-side into LEN-1 weight-shared graph copies
(``ssgan_inference_moving_mnist.py:134-141``); here the chains are
``lax.scan``s (one compiled body, shardable carry) and all per-frame /
per-pair networks run at the folded B*LEN (or B*(LEN-1)) batch so the MXU
sees one large matmul instead of LEN small ones.

Reproduced semantics (moving_mnist line refs; chairs is the unconditional,
3-channel, res_w variant):

- **ImplicitOperator** (``:98-114``): 3-layer MLP over concat(z, eps) with a
  residual ('res') or learned-skip ('res_w') connection.
- **DynamicGenerator** (``:134-141``): z_{t+1} = Op(z_t, eps) unrolled LEN-1
  steps with ONE shared parameter set 'Generator.Dynamic' AND — reference
  quirk kept for behavioral parity — eps drawn ONCE and reused at every step.
- **DynamicExtractor** (``:143-168``): posterior over per-frame pre-codes,
  POS_MODE in {naive_mean_field (identity), inverse (backward ConcatOperator
  chain), forward_inverse, gsp (backward then forward smoothing)}.
- **Frame nets** (``:170-262``): Generator tiles z_g over time and runs a
  4-deconv DCGAN at B*LEN; Extractor is a per-frame conv stack -> z_l_pre;
  G_Extractor consumes the whole video as a (C*LEN)-channel image -> z_g.
- **Discriminators** (``:264-349``, assembled ``:527-535``): local_ep =
  (LEN-1) x DynamicDiscrminator(z_t, z_{t+1}) [weight-shared; computed here
  as ONE batched MLP over all pairs] + ZGDiscrminator(z_g) + per-frame joint
  Discriminator(x, z_g, z_l, y), weighted by ratio = normalize([1]*(LEN-1) +
  [1, LEN]) via weighted_local_epce.  ALI baselines: one monolithic video
  discriminator with ALI_MODE in {concat_x (frames as channels), concat_z
  (per-frame conv then concat), 3dcnn (Conv3D stack)}.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.core.config import SSGanConfig
from graphical_gan_tpu.core.shard_ctx import constrain_frames
from graphical_gan_tpu.core.registry import next_rng_key
from graphical_gan_tpu.models.common import normalize_input
from graphical_gan_tpu.objectives import gan_inference as objs
from graphical_gan_tpu.objectives import penalties
from graphical_gan_tpu.objectives.common import OptSpec, optimizer_for
from graphical_gan_tpu.ops import (
    batchnorm, conv2d, conv3d, deconv2d, dropout, leaky_relu, linear, relu,
)
from graphical_gan_tpu.ops.layout import flatten_image, unflatten_image

Params = Dict[str, jax.Array]


from graphical_gan_tpu.models.common import bn_act as _bn_act


class SSGanModel:
    GEN_PLAYER = ("Generator", "Extractor")
    DISC_PLAYER = ("Discriminator",)

    def __init__(self, cfg: SSGanConfig):
        self.cfg = cfg

    @property
    def compute_dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    def normalize(self, raw: jax.Array) -> jax.Array:
        return normalize_input(self.cfg, raw, self.compute_dtype)

    def _expand_labels(self, labels: Optional[jax.Array]) -> Optional[jax.Array]:
        """[B, N_C] -> [B*LEN, N_C] (``:91-93``)."""
        if labels is None:
            return None
        cfg = self.cfg
        return jnp.tile(labels[:, None, :], (1, cfg.seq_len, 1)).reshape(
            -1, cfg.n_classes)

    # -- latent-chain operators ---------------------------------------------

    def implicit_operator(self, z_l: jax.Array, epsilon: jax.Array,
                          name: str) -> jax.Array:
        """``:98-114``."""
        cfg = self.cfg
        h = jnp.concatenate([z_l, epsilon], axis=1)
        h = leaky_relu(linear(name + ".Input",
                              cfg.dim_latent_l + cfg.dim_latent_t,
                              cfg.dim_op, h))
        h = leaky_relu(linear(name + ".1", cfg.dim_op, cfg.dim_op, h))
        out = linear(name + ".Output", cfg.dim_op, cfg.dim_latent_l, h)
        if cfg.op_dyn_mode == "res":
            return out + z_l
        if cfg.op_dyn_mode == "res_w":
            return out + linear(name + ".ZW", cfg.dim_latent_l,
                                cfg.dim_latent_l, z_l)
        raise ValueError(cfg.op_dyn_mode)

    def concat_operator(self, z_l_0: jax.Array, z_l_1_pre: jax.Array,
                        name: str) -> jax.Array:
        """``:116-132``."""
        cfg = self.cfg
        h = jnp.concatenate([z_l_0, z_l_1_pre], axis=1)
        h = leaky_relu(linear(name + ".Input", cfg.dim_latent_l * 2,
                              cfg.dim_op, h))
        h = leaky_relu(linear(name + ".1", cfg.dim_op, cfg.dim_op, h))
        out = linear(name + ".Output", cfg.dim_op, cfg.dim_latent_l, h)
        if cfg.op_dyn_mode == "res":
            return z_l_0 + out
        if cfg.op_dyn_mode == "res_w":
            return out + linear(name + ".ZW", cfg.dim_latent_l,
                                cfg.dim_latent_l, z_l_0)
        raise ValueError(cfg.op_dyn_mode)

    def dynamic_generator(self, z_l_0: jax.Array) -> jax.Array:
        """Generative latent chain; shared-eps quirk preserved (``:134-141``).
        Returns [B, LEN, DIM_LATENT_L]."""
        cfg = self.cfg
        b = z_l_0.shape[0]
        epsilon = jax.random.normal(next_rng_key(), (b, cfg.dim_latent_t),
                                    dtype=z_l_0.dtype)
        # prime params eagerly (shared 'Generator.Dynamic' weight set), then
        # scan with the weights as closure constants
        z1 = self.implicit_operator(z_l_0, epsilon, "Generator.Dynamic")

        def body(z_t, _):
            z_next = self.implicit_operator(z_t, epsilon, "Generator.Dynamic")
            return z_next, z_next

        if cfg.seq_len == 1:
            return z_l_0[:, None, :]
        # unroll=True: LEN <= 31 tiny (B, dim_l) MLP steps — rolled-loop
        # dispatch overhead dwarfs the ~7 MFLOP body, and unrolling lets XLA
        # software-pipeline the chain against the big frame convs (the ssgan
        # roofline-gap fix, BASELINE.md r3)
        _, rest = jax.lax.scan(body, z1, None, length=cfg.seq_len - 2,
                               unroll=True)
        # rest: [LEN-2, B, dl]
        chain = jnp.concatenate(
            [z_l_0[None], z1[None], rest], axis=0) if cfg.seq_len > 2 \
            else jnp.stack([z_l_0, z1], axis=0)
        return jnp.transpose(chain, (1, 0, 2))

    def dynamic_extractor(self, z_l_pre: jax.Array) -> jax.Array:
        """Posterior chain per POS_MODE (``:143-168``).
        z_l_pre: [B, LEN, dl] -> [B, LEN, dl]."""
        cfg = self.cfg
        mode = cfg.pos_mode
        if mode == "naive_mean_field":
            return z_l_pre
        pre_t = jnp.transpose(z_l_pre, (1, 0, 2))  # [LEN, B, dl]

        def backward_chain(pre):
            # z_t = CO(z_{t+1}, pre_t, 'Backward'), t = LEN-2 .. 0
            init = pre[-1]
            self.concat_operator(init, pre[-2], "Extractor.Dynamic.Backward")

            def body(z_next, pre_t_):
                z_t = self.concat_operator(z_next, pre_t_,
                                           "Extractor.Dynamic.Backward")
                return z_t, z_t

            _, zs = jax.lax.scan(body, init, pre[:-1], reverse=True,
                                 unroll=True)
            return jnp.concatenate([zs, init[None]], axis=0)  # [LEN, B, dl]

        def forward_chain(pre):
            init = pre[0]
            self.concat_operator(init, pre[1], "Extractor.Dynamic.Forward")

            def body(z_t, pre_t_):
                z_next = self.concat_operator(z_t, pre_t_,
                                              "Extractor.Dynamic.Forward")
                return z_next, z_next

            _, zs = jax.lax.scan(body, init, pre[1:], unroll=True)
            return jnp.concatenate([init[None], zs], axis=0)

        if mode == "inverse":
            out = backward_chain(pre_t)
        elif mode == "forward_inverse":
            out = forward_chain(pre_t)
        elif mode == "gsp":
            out = forward_chain(backward_chain(pre_t))
        else:
            raise ValueError(mode)
        return jnp.transpose(out, (1, 0, 2))

    # -- frame networks ------------------------------------------------------

    def frame_generator(self, z_g: jax.Array, z_l: jax.Array,
                        labels: Optional[jax.Array]) -> jax.Array:
        """``:170-205``; returns [B, LEN, OUTPUT_DIM] in tanh range."""
        cfg = self.cfg
        b = z_g.shape[0]
        L = cfg.seq_len
        zg = jnp.tile(z_g[:, None, :], (1, L, 1))
        parts = [zg, z_l.reshape(b, L, cfg.dim_latent_l)]
        in_dim = cfg.dim_latent_g + cfg.dim_latent_l
        if cfg.conditional:
            lab = jnp.tile(labels[:, None, :], (1, L, 1))
            parts.append(lab.astype(zg.dtype))
            in_dim += cfg.n_classes
        z = constrain_frames(
            jnp.concatenate(parts, axis=-1).reshape(b * L, in_dim))

        dim = cfg.dim
        h = linear("Generator.Input", in_dim, 4 * 4 * 8 * dim, z)
        h = _bn_act(cfg.bn, "Generator.BN1", h, "relu", axes=[0])
        h = h.reshape(b * L, 4, 4, 8 * dim)
        for i, (ci, co) in enumerate(
                [(8 * dim, 4 * dim), (4 * dim, 2 * dim), (2 * dim, dim)],
                start=2):
            h = deconv2d(f"Generator.{i}", ci, co, 5, h)
            h = _bn_act(cfg.bn, f"Generator.BN{i}", h, "relu")
        h = jnp.tanh(deconv2d("Generator.5", dim, cfg.channels, 5, h))
        return flatten_image(h).reshape(b, L, cfg.output_dim)

    def frame_extractor(self, x: jax.Array,
                        labels: Optional[jax.Array]) -> jax.Array:
        """Per-frame conv stack -> z_l_pre (``:207-235``)."""
        cfg = self.cfg
        b, L = x.shape[0], cfg.seq_len
        hgt, wdt = cfg.image_hw
        h = constrain_frames(
            unflatten_image(x.reshape(b * L, cfg.output_dim), cfg.channels,
                            hgt, wdt))
        dim = cfg.dim
        h = conv2d("Extractor.1", cfg.channels, dim, 5, h,
                              stride=2, act="leaky_relu")
        for i, (ci, co) in enumerate(
                [(dim, 2 * dim), (2 * dim, 4 * dim), (4 * dim, 8 * dim)],
                start=2):
            h = conv2d(f"Extractor.{i}", ci, co, 5, h, stride=2)
            h = _bn_act(cfg.bn, f"Extractor.BN{i}", h, "leaky_relu")
        feat = 4 * 4 * 8 * dim
        h = h.reshape(b * L, feat)
        in_dim = feat
        if cfg.conditional:
            h = jnp.concatenate(
                [h, self._expand_labels(labels).astype(h.dtype)], axis=1)
            in_dim += cfg.n_classes
        out = linear("Extractor.Output", in_dim, cfg.dim_latent_l, h)
        return out.reshape(b, L, cfg.dim_latent_l)

    def g_extractor(self, x: jax.Array,
                    labels: Optional[jax.Array]) -> jax.Array:
        """Whole video as a (C*LEN)-channel image -> z_g (``:237-262``;
        chairs ``:232-256`` uses 3*LEN channels)."""
        cfg = self.cfg
        b = x.shape[0]
        hgt, wdt = cfg.image_hw
        cl = cfg.channels * cfg.seq_len
        h = unflatten_image(x.reshape(b, cl * hgt * wdt), cl, hgt, wdt)
        dim = cfg.dim
        h = conv2d("Extractor.G.1", cl, dim, 5, h, stride=2, act="leaky_relu")
        for i, (ci, co) in enumerate(
                [(dim, 2 * dim), (2 * dim, 4 * dim), (4 * dim, 8 * dim)],
                start=2):
            h = conv2d(f"Extractor.G.{i}", ci, co, 5, h, stride=2)
            h = _bn_act(cfg.bn, f"Extractor.G.BN{i}", h, "leaky_relu")
        feat = 4 * 4 * 8 * dim
        h = h.reshape(b, feat)
        in_dim = feat
        if cfg.conditional:
            h = jnp.concatenate([h, labels.astype(h.dtype)], axis=1)
            in_dim += cfg.n_classes
        return linear("Extractor.G.Output", in_dim, cfg.dim_latent_g, h)

    # -- discriminators ------------------------------------------------------

    def frame_discriminator(self, x, z_g, z_l, labels) -> jax.Array:
        """Per-frame joint D(x, z_g, z_l, y) at B*LEN (``:265-311``)."""
        cfg = self.cfg
        b, L = x.shape[0], cfg.seq_len
        hgt, wdt = cfg.image_hw
        dr = cfg.dropout_rate
        h = constrain_frames(
            unflatten_image(x.reshape(b * L, cfg.output_dim), cfg.channels,
                            hgt, wdt))
        dim = cfg.dim

        zg = jnp.tile(z_g[:, None, :], (1, L, 1))
        parts = [zg, z_l.reshape(b, L, cfg.dim_latent_l)]
        zdim = cfg.dim_latent_g + cfg.dim_latent_l
        if cfg.conditional:
            lab3 = jnp.tile(labels[:, None, :], (1, L, 1)).astype(zg.dtype)
            parts.append(lab3)
            zdim += cfg.n_classes
        z = constrain_frames(
            jnp.concatenate(parts, axis=-1).reshape(b * L, zdim))

        h = conv2d("Discriminator.1", cfg.channels, dim, 5, h,
                              stride=2, act="leaky_relu")
        h = dropout(h, dr)
        for i, (ci, co) in enumerate(
                [(dim, 2 * dim), (2 * dim, 4 * dim), (4 * dim, 8 * dim)],
                start=2):
            h = conv2d(f"Discriminator.{i}", ci, co, 5, h, stride=2)
            h = _bn_act(cfg.bn, f"Discriminator.BN{i}", h, "leaky_relu")
            h = dropout(h, dr)
        feat = 4 * 4 * 8 * dim
        h = h.reshape(b * L, feat)

        hz = leaky_relu(linear("Discriminator.z1", zdim, 512, z))
        hz = dropout(hz, dr)

        cat = [h, hz]
        in_dim = feat + 512
        if cfg.conditional:
            lab2 = lab3.reshape(b * L, cfg.n_classes)
            cat.append(lab2)
            in_dim += cfg.n_classes
        h = jnp.concatenate(cat, axis=1)
        h = leaky_relu(linear("Discriminator.zx1", in_dim, 512, h))
        h = dropout(h, dr)
        return linear("Discriminator.Output", 512, 1, h).reshape(b * L)

    def dynamic_discriminator_pairs(self, z_l: jax.Array) -> List[jax.Array]:
        """All (z_t, z_{t+1}) pairs through the weight-shared MLP
        (``:313-331``) as ONE batched call; returns LEN-1 logits vectors."""
        cfg = self.cfg
        b, L = z_l.shape[0], z_l.shape[1]
        dr = cfg.dropout_rate
        pairs = jnp.concatenate([z_l[:, :-1, :], z_l[:, 1:, :]], axis=-1)
        h = pairs.reshape(b * (L - 1), cfg.dim_latent_l * 2)
        h = leaky_relu(linear("Discriminator.Dynamic.Input",
                              cfg.dim_latent_l * 2, 512, h))
        h = dropout(h, dr)
        h = leaky_relu(linear("Discriminator.Dynamic.2", 512, 512, h))
        h = dropout(h, dr)
        h = leaky_relu(linear("Discriminator.Dynamic.3", 512, 512, h))
        h = dropout(h, dr)
        out = linear("Discriminator.Dynamic.Output", 512, 1, h)
        out = out.reshape(b, L - 1)
        return [out[:, t] for t in range(L - 1)]

    def zg_discriminator(self, z_g: jax.Array) -> jax.Array:
        """``:333-349``."""
        cfg = self.cfg
        dr = cfg.dropout_rate
        h = leaky_relu(linear("Discriminator.ZG.Input", cfg.dim_latent_g,
                              512, z_g))
        h = dropout(h, dr)
        h = leaky_relu(linear("Discriminator.ZG.2", 512, 512, h))
        h = dropout(h, dr)
        h = leaky_relu(linear("Discriminator.ZG.3", 512, 512, h))
        h = dropout(h, dr)
        return linear("Discriminator.ZG.Output", 512, 1, h).reshape(-1)

    def ali_discriminator(self, x, z_g, z_l, labels) -> jax.Array:
        """Monolithic video discriminator per ALI_MODE (``:352-498``)."""
        cfg = self.cfg
        b, L = x.shape[0], cfg.seq_len
        hgt, wdt = cfg.image_hw
        dim = cfg.dim
        dr = cfg.dropout_rate
        zl_flat = z_l.reshape(b, L * cfg.dim_latent_l)
        parts = [z_g, zl_flat]
        zdim = cfg.dim_latent_g + L * cfg.dim_latent_l
        if cfg.conditional:
            parts.append(labels.astype(z_g.dtype))
            zdim += cfg.n_classes
        z = jnp.concatenate(parts, axis=-1)

        if cfg.ali_mode == "concat_x":
            # frames as channels (``:406-450``)
            cl = cfg.channels * L
            h = unflatten_image(x.reshape(b, cl * hgt * wdt), cl, hgt, wdt)
            h = conv2d("Discriminator.1", cl, dim, 5, h, stride=2, act="leaky_relu")
            h = dropout(h, dr)
            for i, (ci, co) in enumerate(
                    [(dim, 2 * dim), (2 * dim, 4 * dim), (4 * dim, 8 * dim)],
                    start=2):
                h = conv2d(f"Discriminator.{i}", ci, co, 5, h, stride=2)
                h = _bn_act(cfg.bn, f"Discriminator.BN{i}", h, "leaky_relu")
                h = dropout(h, dr)
            feat = 4 * 4 * 8 * dim
            h = h.reshape(b, feat)
        elif cfg.ali_mode == "concat_z":
            # per-frame conv then concat (``:452-498``)
            h = constrain_frames(
                unflatten_image(x.reshape(b * L, cfg.output_dim),
                                cfg.channels, hgt, wdt))
            h = conv2d("Discriminator.1", cfg.channels, dim, 5, h,
                                  stride=2, act="leaky_relu")
            h = dropout(h, dr)
            for i, (ci, co) in enumerate(
                    [(dim, 2 * dim), (2 * dim, 4 * dim), (4 * dim, 8 * dim)],
                    start=2):
                h = conv2d(f"Discriminator.{i}", ci, co, 5, h, stride=2)
                h = _bn_act(cfg.bn, f"Discriminator.BN{i}", h, "leaky_relu")
                h = dropout(h, dr)
            h = conv2d("Discriminator.5", 8 * dim, cfg.dim_latent_g, 4, h,
                       stride=1, padding="VALID")
            feat = L * cfg.dim_latent_g
            h = h.reshape(b, feat)
        elif cfg.ali_mode == "3dcnn":
            # Conv3D stack (``:352-404``); NDHWC internal
            h = x.reshape(b, L, cfg.channels, hgt, wdt)
            h = jnp.transpose(h, (0, 1, 3, 4, 2))  # N,L,H,W,C
            h = leaky_relu(conv3d("Discriminator.1", 4, cfg.channels, dim, 4,
                                  h, stride=2, stride_len=2))
            h = dropout(h, dr)
            sl2 = 1 if L == 4 else 2
            h = conv3d("Discriminator.2", 4, dim, 2 * dim, 4, h, stride=2,
                       stride_len=sl2)
            h = _bn_act(cfg.bn, "Discriminator.BN2", h, "leaky_relu")
            h = dropout(h, dr)
            h = conv3d("Discriminator.3", 4, 2 * dim, 4 * dim, 4, h, stride=2,
                       stride_len=2)
            h = _bn_act(cfg.bn, "Discriminator.BN3", h, "leaky_relu")
            h = dropout(h, dr)
            sl4 = 1 if L == 4 else 2
            h = conv3d("Discriminator.4", 4, 4 * dim, 8 * dim, 4, h, stride=2,
                       stride_len=sl4)
            h = _bn_act(cfg.bn, "Discriminator.BN4", h, "leaky_relu")
            h = dropout(h, dr)
            h = h.reshape(b, -1)
            feat = h.shape[1]  # varies with seq_len (temporal stride config)
        else:
            raise ValueError(cfg.ali_mode)

        hz = leaky_relu(linear("Discriminator.z1", zdim, 512, z))
        hz = dropout(hz, dr)
        cat = [h, hz]
        in_dim = feat + 512
        if cfg.ali_mode == "concat_z" and cfg.conditional:
            cat.append(labels.astype(h.dtype))
            in_dim += cfg.n_classes
        h = jnp.concatenate(cat, axis=1)
        h = leaky_relu(linear("Discriminator.zx1", in_dim, 512, h))
        h = dropout(h, dr)
        return linear("Discriminator.Output", 512, 1, h).reshape(b)

    # -- graph ----------------------------------------------------------------

    def _graph(self, raw_x: jax.Array,
               labels: Optional[jax.Array]) -> Dict[str, jax.Array]:
        """``ssgan_inference_moving_mnist.py:513-539``."""
        cfg = self.cfg
        b = raw_x.shape[0]
        real_x = self.normalize(raw_x)

        q_z_l_pre = self.frame_extractor(real_x, labels)
        q_z_g = self.g_extractor(real_x, labels)
        q_z_l = self.dynamic_extractor(q_z_l_pre)
        rec_x = self.frame_generator(q_z_g, q_z_l, labels)

        p_z_l_0 = jax.random.normal(next_rng_key(), (b, cfg.dim_latent_l),
                                    dtype=self.compute_dtype)
        p_z_l = self.dynamic_generator(p_z_l_0)
        p_z_g = jax.random.normal(next_rng_key(), (b, cfg.dim_latent_g),
                                  dtype=self.compute_dtype)
        if cfg.conditional:
            p_y = jax.nn.one_hot(
                jax.random.randint(next_rng_key(), (b,), 0, cfg.n_classes),
                cfg.n_classes)
        else:
            p_y = None
        fake_x = self.frame_generator(p_z_g, p_z_l, p_y)

        t = dict(real_x=real_x, q_z_l=q_z_l, q_z_g=q_z_g, rec_x=rec_x,
                 p_z_l=p_z_l, p_z_g=p_z_g, p_y=p_y, fake_x=fake_x)

        if cfg.mode in ("local_ep", "local_epce-z"):
            t["disc_fake_list"] = (
                self.dynamic_discriminator_pairs(p_z_l)
                + [self.zg_discriminator(p_z_g),
                   self.frame_discriminator(fake_x, p_z_g, p_z_l, p_y)])
            t["disc_real_list"] = (
                self.dynamic_discriminator_pairs(q_z_l)
                + [self.zg_discriminator(q_z_g),
                   self.frame_discriminator(real_x, q_z_g, q_z_l, labels)])
        elif cfg.mode in ("ali", "alice-z"):
            t["disc_real"] = self.ali_discriminator(real_x, q_z_g, q_z_l,
                                                    labels)
            t["disc_fake"] = self.ali_discriminator(fake_x, p_z_g, p_z_l, p_y)
        else:
            raise NotImplementedError(cfg.mode)
        return t

    def _costs(self, t):
        cfg = self.cfg
        mode = cfg.mode
        rec = None
        if mode in ("local_epce-z", "alice-z"):
            rec = cfg.lambda_ * penalties.distance(t["real_x"], t["rec_x"],
                                                   "l2")
        if mode in ("local_ep", "local_epce-z"):
            g, d, _, _ = objs.weighted_local_epce(
                t["disc_fake_list"], t["disc_real_list"], cfg.ratio,
                rec_penalty=rec)
        elif mode == "ali":
            g, d = objs.ali(t["disc_fake"], t["disc_real"])
        elif mode == "alice-z":
            g, d = objs.alice(t["disc_fake"], t["disc_real"], rec)
        else:
            raise NotImplementedError(mode)
        return g, d, rec

    # -- public API -----------------------------------------------------------

    def _split_batch(self, raw):
        if self.cfg.conditional:
            return raw["x"], raw["y"]
        if isinstance(raw, dict):
            return raw["x"], None
        return raw, None

    def gen_loss(self, raw):
        x, y = self._split_batch(raw)
        t = self._graph(x, y)
        g, _, rec = self._costs(t)
        aux = {"gen_cost": g}
        if rec is not None:
            aux["rec_cost"] = rec
        return g, aux

    def disc_loss(self, raw):
        x, y = self._split_batch(raw)
        t = self._graph(x, y)
        _, d, _ = self._costs(t)
        return d, {"disc_cost": d}

    def sample(self, z_l_0, z_g, labels) -> jax.Array:
        """Fixed-noise video generation (``:579-583``)."""
        z_l = self.dynamic_generator(z_l_0.astype(self.compute_dtype))
        return self.frame_generator(z_g.astype(self.compute_dtype), z_l,
                                    labels)

    def reconstruct(self, raw_x, labels) -> jax.Array:
        x = self.normalize(raw_x)
        q_z_l = self.dynamic_extractor(self.frame_extractor(x, labels))
        q_z_g = self.g_extractor(x, labels)
        return self.frame_generator(q_z_g, q_z_l, labels)

    def disentangle(self, raw_x, labels, dis_g, dis_y) -> jax.Array:
        """Regenerate inferred motion under fixed content (``:604-618``)."""
        x = self.normalize(raw_x)
        q_z_l = self.dynamic_extractor(self.frame_extractor(x, labels))
        return self.frame_generator(dis_g.astype(self.compute_dtype), q_z_l,
                                    dis_y)

    def init(self, key: jax.Array) -> Params:
        cfg = self.cfg
        raw_x = jnp.zeros((cfg.batch_size, cfg.seq_len, cfg.output_dim),
                          jnp.float32)
        labels = (jnp.zeros((cfg.batch_size, cfg.n_classes), jnp.float32)
                  if cfg.conditional else None)

        def build():
            t = self._graph(raw_x, labels)
            self._costs(t)
            return None

        _, params = registry.init(build, key)
        return params

    def opt_specs(self) -> Tuple[OptSpec, Optional[OptSpec]]:
        cfg = self.cfg
        # weighted_local_epce / alice use Adam(lr, beta1); ali passes beta2
        # (ssgan...py:547-559)
        if cfg.mode == "ali":
            spec = optimizer_for("ali", lr=cfg.lr, beta1=cfg.beta1,
                                 beta2=cfg.beta2)
        else:
            spec = optimizer_for(cfg.mode, lr=cfg.lr, beta1=cfg.beta1)
        return spec, spec
