"""Model family 2 — GMGAN (Gaussian-mixture prior over a discrete component).

Rebuild of ``gmgan_inference_{mnist,svhn,cifar10,face}.py``.  On top of the
family-1 chain, a discrete component k is drawn from a uniform Categorical
prior and mapped through a shared mixture-means matrix:

- **HyperGenerator** (``gmgan_inference_mnist.py:142-145``):
  ``p_z = k @ Mu + eps`` with ``Mu = 'Generator.Hyper.Mu'`` — one dense
  matmul against the means (N_COMS <= 100), ideal MXU shape.
- **HyperExtractor** (``:148-165``): squared-distance logits to the SAME
  shared ``Mu`` plus the log prior; the posterior sample k is drawn per
  ``MODE_K``: CONCRETE (Gumbel-softmax at TEMP), STRAIGHT_THROUGHT[_CONCRETE]
  (hard one-hot + straight-through estimator), REINFORCE (argmax one-hot +
  score-function surrogate added to the generator loss, ``:355-372``).
- ``Mu`` is deliberately named ``Generator.*`` so it is trained by the
  generator player only, despite being read by the extractor-side posterior
  — the cross-module sharing the param registry exists to support.

Discriminator topologies per mode (``:247-330``):
- local_ep / local_epce: 2-element list [HyperDiscriminator(z,k) on the
  latent layer, Discriminator(x,z) on the data layer];
- ali / alice: one joint Discriminator(x,z,k);
- vegan: code-space Discriminator(z,k) only.

Known reference quirk handled differently: in REINFORCE mode the reference
adds the per-example surrogate VECTOR to the scalar cost, which (because TF
sums a non-scalar loss before differentiating) silently multiplies the rest
of the generator gradient by BATCH_SIZE.  We add ``mean(surrogate)`` instead
— same estimator, sane scaling; CONCRETE (the default everywhere) is
unaffected.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from graphical_gan_tpu.core import registry, shard_ctx
from graphical_gan_tpu.core.config import GMGanConfig
from graphical_gan_tpu.core.registry import next_rng_key, param
from graphical_gan_tpu.models import networks
from graphical_gan_tpu.objectives import gan_inference as objs
from graphical_gan_tpu.objectives import discrete, penalties
from graphical_gan_tpu.objectives.common import OptSpec, optimizer_for
from graphical_gan_tpu.ops import dropout, leaky_relu, linear, unflatten_image
from graphical_gan_tpu.ops import initializers as inits
from graphical_gan_tpu.ops.activations import sample_gumbel
from graphical_gan_tpu.ops.conv import conv2d

Params = Dict[str, jax.Array]


class GMGanModel:
    GEN_PLAYER = ("Generator", "Extractor")
    DISC_PLAYER = ("Discriminator",)

    def __init__(self, cfg: GMGanConfig):
        self.cfg = cfg

    @property
    def compute_dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    def normalize(self, raw: jax.Array) -> jax.Array:
        from graphical_gan_tpu.models.common import normalize_input
        return normalize_input(self.cfg, raw, self.compute_dtype)

    # -- mixture components --------------------------------------------------

    def _mu(self) -> jax.Array:
        cfg = self.cfg
        return param("Generator.Hyper.Mu",
                     inits.normal((cfg.n_coms, cfg.dim_latent)))

    def hyper_generator(self, k: jax.Array, noise: jax.Array) -> jax.Array:
        """``p_z = k @ Mu + eps`` (gmgan_inference_mnist.py:142-145)."""
        mu = self._mu()
        return jnp.dot(k.astype(jnp.float32), mu) + noise

    def hyper_extractor(self, z: jax.Array
                        ) -> Tuple[jax.Array, jax.Array]:
        """(com_logits, k-sample) per MODE_K (``:148-165``)."""
        cfg = self.cfg
        mu = self._mu()
        log_pi = math.log(1.0 / cfg.n_coms)
        sq = jnp.sum(jnp.square(z[:, None, :].astype(jnp.float32)
                                - mu[None, :, :]), axis=-1)
        # expert-parallel fold point: component logits [B, n_coms] (identity
        # unless tracing under parallel.expert.make_ep_train_step)
        logits = shard_ctx.constrain_components(-0.5 * sq + log_pi)

        mk = cfg.mode_k
        if mk == "REINFORCE":
            k = jax.nn.one_hot(jnp.argmax(logits, axis=-1), cfg.n_coms)
        elif mk == "CONCRETE":
            g = sample_gumbel(next_rng_key(), logits.shape)
            k = jax.nn.softmax((logits + g) / cfg.temp)
        elif mk == "STRAIGHT_THROUGHT_CONCRETE":
            g = sample_gumbel(next_rng_key(), logits.shape)
            k = jax.nn.softmax((logits + g) / cfg.temp)
            k_hard = jax.nn.one_hot(jnp.argmax(k, axis=-1), cfg.n_coms)
            k = jax.lax.stop_gradient(k_hard - k) + k
        elif mk == "STRAIGHT_THROUGHT":
            k_hard = jax.nn.one_hot(jnp.argmax(logits, axis=-1), cfg.n_coms)
            k = jax.lax.stop_gradient(k_hard - logits) + logits
        else:
            raise ValueError(mk)
        return logits, shard_ctx.constrain_components(k)

    # -- discriminators ------------------------------------------------------

    def hyper_discriminator(self, z: jax.Array, k: jax.Array) -> jax.Array:
        """Latent-layer MLP D(z,k) (``gmgan_inference_mnist.py:249-265``);
        also the vegan-family code discriminator (``:229-245`` — same
        architecture, 'HyperInput/Hyper2/Hyper3/HyperOutput' names)."""
        cfg = self.cfg
        dr = cfg.dropout_rate
        h = jnp.concatenate([z, k.astype(z.dtype)], axis=1)
        h = leaky_relu(linear("Discriminator.HyperInput",
                              cfg.dim_latent + cfg.n_coms, 512, h))
        h = dropout(h, dr)
        h = leaky_relu(linear("Discriminator.Hyper2", 512, 512, h))
        h = dropout(h, dr)
        h = leaky_relu(linear("Discriminator.Hyper3", 512, 512, h))
        h = dropout(h, dr)
        return linear("Discriminator.HyperOutput", 512, 1, h).reshape(-1)

    def _conv_trunk(self, x_flat: jax.Array, prefix: str) -> Tuple[jax.Array, int]:
        """Dropout conv stack (no BN) shared by the gmgan data-layer Ds."""
        cfg = self.cfg
        h_, w_ = cfg.data.image_hw
        ch = cfg.data.channels
        dr = cfg.dropout_rate
        x = unflatten_image(x_flat, ch, h_, w_)
        if cfg.dataset == "celeba":
            dim = cfg.dim_d or cfg.dim
            chans = [ch, dim, 2 * dim, 4 * dim, 8 * dim]
            feat = 4 * 4 * 8 * dim
        else:
            dim = cfg.dim
            chans = [ch, dim, 2 * dim, 4 * dim]
            feat = 4 * 4 * 4 * dim
        h = x
        for i in range(len(chans) - 1):
            h = conv2d(f"{prefix}{i + 1}", chans[i], chans[i + 1],
                                  5, h, stride=2, act="leaky_relu")
            h = dropout(h, dr)
        return h.reshape(-1, feat), feat

    def discriminator_xz(self, x_flat: jax.Array, z: jax.Array) -> jax.Array:
        """local_ep data-layer D(x,z) (``gmgan_inference_mnist.py:267-295``)."""
        cfg = self.cfg
        dr = cfg.dropout_rate
        h, feat = self._conv_trunk(x_flat, "Discriminator.")
        hz = leaky_relu(linear("Discriminator.z1", cfg.dim_latent, 512, z))
        hz = dropout(hz, dr)
        h = jnp.concatenate([h, hz], axis=1)
        h = leaky_relu(linear("Discriminator.zx1", feat + 512, 512, h))
        h = dropout(h, dr)
        return linear("Discriminator.Output", 512, 1, h).reshape(-1)

    def discriminator_xzk(self, x_flat: jax.Array, z: jax.Array,
                          k: jax.Array) -> jax.Array:
        """ali/alice joint D(x,z,k) (``gmgan_inference_mnist.py:301-330``)."""
        cfg = self.cfg
        dr = cfg.dropout_rate
        h, feat = self._conv_trunk(x_flat, "Discriminator.x")
        hzk = jnp.concatenate([z, k.astype(z.dtype)], axis=1)
        hzk = leaky_relu(linear("Discriminator.zk1",
                                cfg.dim_latent + cfg.n_coms, 512, hzk))
        hzk = dropout(hzk, dr)
        h = jnp.concatenate([h, hzk], axis=1)
        h = leaky_relu(linear("Discriminator.zkx1", feat + 512, 512, h))
        h = dropout(h, dr)
        return linear("Discriminator.Output", 512, 1, h).reshape(-1)

    # -- graph ----------------------------------------------------------------

    def _graph(self, raw_x: jax.Array) -> Dict[str, jax.Array]:
        """``gmgan_inference_mnist.py:335-372``."""
        cfg = self.cfg
        real_x = self.normalize(raw_x)
        b = raw_x.shape[0]

        q_z, q_z_mean, q_z_std = networks.extractor(cfg, real_x)
        q_k_logits, q_k = self.hyper_extractor(q_z)
        q_k_probs = jax.nn.softmax(q_k_logits)
        rec_x, _, _ = networks.generator(cfg, q_z)

        hyper_p_z = jax.random.normal(next_rng_key(), (b, cfg.dim_latent))
        prior_idx = jax.random.randint(next_rng_key(), (b,), 0, cfg.n_coms)
        # expert-parallel fold point: the prior k descends from a replicated
        # RNG draw, so propagation alone would leave the prior side unsharded
        hyper_p_k = shard_ctx.constrain_components(
            jax.nn.one_hot(prior_idx, cfg.n_coms))
        p_z = self.hyper_generator(hyper_p_k, hyper_p_z).astype(
            self.compute_dtype)
        fake_x, _, _ = networks.generator(cfg, p_z)
        rec_z, _, _ = networks.extractor(cfg, fake_x)
        rec_q_k_logits, rec_q_k = self.hyper_extractor(rec_z)

        t = dict(real_x=real_x, q_z=q_z, q_k_logits=q_k_logits, q_k=q_k,
                 q_k_probs=q_k_probs, rec_x=rec_x, hyper_p_k=hyper_p_k,
                 p_z=p_z, fake_x=fake_x, rec_z=rec_z)

        mode = cfg.mode
        if mode == "vegan":
            t["disc_fake"] = self.hyper_discriminator(p_z, hyper_p_k)
            t["disc_real"] = self.hyper_discriminator(q_z, q_k)
        elif mode in ("local_ep", "local_epce"):
            t["disc_fake_list"] = [
                self.hyper_discriminator(p_z, hyper_p_k),
                self.discriminator_xz(fake_x, p_z),
            ]
            t["disc_real_list"] = [
                self.hyper_discriminator(q_z, q_k),
                self.discriminator_xz(real_x, q_z),
            ]
        else:  # ali / alice
            t["disc_real"] = self.discriminator_xzk(real_x, q_z, q_k)
            t["disc_fake"] = self.discriminator_xzk(fake_x, p_z, hyper_p_k)
        return t

    def _score_fn(self, t) -> Optional[jax.Array]:
        if self.cfg.mode_k != "REINFORCE":
            return None
        q_k_prob_max = jnp.max(t["q_k_probs"], axis=1)
        f_k = t["disc_real_list"][0] if "disc_real_list" in t else t["disc_real"]
        return jnp.mean(discrete.score_function(
            f_k, q_k_prob_max, self.cfg.control_variate))

    def _costs(self, t):
        cfg = self.cfg
        mode = cfg.mode
        s_f = self._score_fn(t)
        rec = None
        if mode in ("alice", "local_epce", "vegan"):
            rec = penalties.distance(t["real_x"], t["rec_x"], cfg.distance_x)

        if mode == "ali":
            g, d = objs.ali(t["disc_fake"], t["disc_real"], s_f=s_f)
        elif mode == "alice":
            g, d = objs.alice(t["disc_fake"], t["disc_real"], rec, s_f=s_f)
        elif mode == "local_ep":
            g, d = objs.local_ep(t["disc_fake_list"], t["disc_real_list"],
                                 s_f=s_f)
        elif mode == "local_epce":
            g, d = objs.local_epce(t["disc_fake_list"], t["disc_real_list"],
                                   rec, s_f=s_f)
        elif mode == "vegan":
            g, d = objs.vegan(t["disc_fake"], t["disc_real"], rec,
                              cfg.lambda_, s_f=s_f)
        else:
            raise NotImplementedError(mode)
        return g, d, rec

    # -- public API -----------------------------------------------------------

    def gen_loss(self, raw_x: jax.Array):
        t = self._graph(raw_x)
        g, _, rec = self._costs(t)
        aux = {"gen_cost": g}
        if rec is not None:
            aux["rec_cost"] = rec
        return g, aux

    def disc_loss(self, raw_x: jax.Array):
        t = self._graph(raw_x)
        _, d, _ = self._costs(t)
        return d, {"disc_cost": d}

    def sample(self, k_onehot: jax.Array, noise: jax.Array) -> jax.Array:
        """Per-component sample grids (``gmgan_inference_mnist.py:405-419``)."""
        z = self.hyper_generator(k_onehot, noise).astype(self.compute_dtype)
        x, _, _ = networks.generator(self.cfg, z)
        return x

    def reconstruct(self, raw_x: jax.Array) -> jax.Array:
        real_x = self.normalize(raw_x)
        q_z, _, _ = networks.extractor(self.cfg, real_x)
        rec_x, _, _ = networks.generator(self.cfg, q_z)
        return rec_x

    def encode(self, raw_x: jax.Array) -> jax.Array:
        """q(z|x) codes (same posterior the TSNE eval embeds,
        ``gmgan_inference_mnist.py:534-545``)."""
        real_x = self.normalize(raw_x)
        q_z, _, _ = networks.extractor(self.cfg, real_x)
        return q_z

    def cluster_probs(self, raw_x: jax.Array) -> jax.Array:
        """q(k|x) posteriors for the clustering-accuracy eval (``:513-531``)."""
        real_x = self.normalize(raw_x)
        q_z, _, _ = networks.extractor(self.cfg, real_x)
        q_k_logits, _ = self.hyper_extractor(q_z)
        return jax.nn.softmax(q_k_logits)

    def init(self, key: jax.Array) -> Params:
        cfg = self.cfg
        raw = jnp.zeros((cfg.batch_size, cfg.data.output_dim), jnp.float32)

        def build():
            t = self._graph(raw)
            self._costs(t)
            return None

        _, params = registry.init(build, key)
        return params

    def opt_specs(self) -> Tuple[OptSpec, Optional[OptSpec]]:
        cfg = self.cfg
        # all gmgan modes use Adam(lr, beta1[, beta2]) per the objs presets
        spec = optimizer_for(cfg.mode, lr=cfg.lr, beta1=cfg.beta1,
                             beta2=cfg.beta2 if cfg.mode in
                             ("ali", "local_ep") else None)
        return spec, spec
