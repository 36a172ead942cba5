"""Model family 1 — GAN inference (ALI / ALICE / VEGAN / WALI / VAE).

Rebuild of the graph wiring shared by ``gan_inference_{mnist,cifar10,svhn,
face}.py``: the canonical chain (``gan_inference_cifar10.py:261-287``)

    q_z   = Extractor(real_x);        rec_x = Generator(q_z)
    p_z   ~ N(0, I);                  fake_x = Generator(p_z)
    rec_z = Extractor(fake_x)
    disc_real = D(real_x, q_z);       disc_fake = D(fake_x, p_z)
    (vegan family discriminates codes only: D(q_z) vs D(p_z), :277-278)

with the 13-way MODE dispatch (``:289-368``), the in-script gradient
penalties (wali-gp interpolates x AND z with one alpha,
``gan_inference_mnist.py:346-361``; vegan-wgan-gp interpolates z only,
``gan_inference_cifar10.py:311-325``), and per-dataset input normalization.

TPU-first structure: ``gen_loss``/``disc_loss`` are pure functions of
``(params, key, raw_batch)`` designed to be called inside ONE donated jitted
step (see ``train.step``), with the player partition done by name prefix
('Generator'+'Extractor' vs 'Discriminator') exactly as the reference's
``params_with_name`` (``gan_inference_cifar10.py:285-291``).

Known reference defect, made functional here: the reference's ``vae`` mode
passes ``rec_x_mean=None`` into the Gaussian NLL (its Generator never
implements TYPE_P, ``gan_inference_mnist.py:144,340``) and would crash; we
use mean=rec_x, std=cfg.std instead.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.core.config import GanInferenceConfig
from graphical_gan_tpu.core.registry import next_rng_key
from graphical_gan_tpu.models import networks
from graphical_gan_tpu.objectives import (
    gan_inference as objs, kl, kl_aggregated, mmd, penalties,
)
from graphical_gan_tpu.objectives.common import OptSpec, optimizer_for

Params = Dict[str, jax.Array]


class GanInferenceModel:
    GEN_PLAYER = ("Generator", "Extractor")
    DISC_PLAYER = ("Discriminator",)

    def __init__(self, cfg: GanInferenceConfig):
        self.cfg = cfg

    # -- input normalization (per-dataset, on device, in-step) --------------

    @property
    def compute_dtype(self):
        """bfloat16 feeds the MXU at 2x; params/stats/losses stay f32."""
        return jnp.dtype(self.cfg.compute_dtype)

    def normalize(self, raw: jax.Array) -> jax.Array:
        from graphical_gan_tpu.models.common import normalize_input
        return normalize_input(self.cfg, raw, self.compute_dtype)

    # -- graph --------------------------------------------------------------

    def _graph(self, raw_x: jax.Array) -> Dict[str, jax.Array]:
        cfg = self.cfg
        real_x = self.normalize(raw_x)
        q_z, q_z_mean, q_z_std = networks.extractor(cfg, real_x)
        rec_x, _, _ = networks.generator(cfg, q_z)
        p_z = jax.random.normal(next_rng_key(),
                                (raw_x.shape[0], cfg.dim_latent),
                                dtype=self.compute_dtype)
        fake_x, _, _ = networks.generator(cfg, p_z)
        rec_z, _, _ = networks.extractor(cfg, fake_x)

        t = dict(real_x=real_x, q_z=q_z, q_z_mean=q_z_mean, q_z_std=q_z_std,
                 rec_x=rec_x, p_z=p_z, fake_x=fake_x, rec_z=rec_z)

        mode = cfg.mode
        if mode in ("vegan", "vegan-wgan-gp"):
            t["disc_real"] = networks.discriminator_z(cfg, p_z)
            t["disc_fake"] = networks.discriminator_z(cfg, q_z)
        elif mode == "wali-gp" and getattr(cfg, "fused_gp", False) \
                and self._rowwise_disc():
            # OPT-IN fused path: ONE batched D apply over [real; fake;
            # interp] with a shared VJP (exact for a row-wise D) — see
            # penalties.wali_gp_fused.  Honest A/B on a clean v5e session
            # (BASELINE.md r3): 5.03-5.11 ms/iter vs 3.72-3.81 unfused —
            # 35% SLOWER, because tripling the batch evicts the B=64
            # VMEM-resident activations into HBM.  Kept as a measured
            # negative result; default OFF.
            t["disc_real"], t["disc_fake"], t["gp"] = penalties.wali_gp_fused(
                lambda x, z: networks.discriminator_xz(cfg, x, z),
                real_x, fake_x, q_z, p_z, next_rng_key(), cfg.gp_lambda)
        elif cfg.has_discriminator:
            t["disc_real"] = networks.discriminator_xz(cfg, real_x, q_z)
            t["disc_fake"] = networks.discriminator_xz(cfg, fake_x, p_z)
        return t

    def _rowwise_disc(self) -> bool:
        """True when the joint D has no batch-coupled ops (dropout is
        identity; no BN in the cifar10/svhn/celeba D stacks), so batching
        [real; fake; interp] through one apply is exact per row.  The mnist
        D uses batch-stat BN (``gan_inference_mnist.py:217-252``) and must
        keep separate 64-row applications."""
        return self.cfg.dataset in ("cifar10", "svhn", "celeba")

    def _rec_penalty(self, t) -> Optional[jax.Array]:
        cfg = self.cfg
        d = cfg.distance_x
        mode = cfg.mode
        if mode in ("alice-z", "alice", "vegan", "vegan-wgan-gp", "vegan-mmd",
                    "vegan-kl", "vegan-ikl", "vegan-jsd"):
            rec = penalties.distance(t["real_x"], t["rec_x"], d)
            if mode == "alice":
                rec = rec + penalties.distance(t["p_z"], t["rec_z"], d)
            return rec
        if mode == "alice-x":
            return penalties.distance(t["p_z"], t["rec_z"], d)
        return None

    def _costs(self, t) -> Tuple[jax.Array, Optional[jax.Array],
                                 Optional[jax.Array]]:
        """(gen_cost, disc_cost, rec_penalty) for the current mode."""
        cfg = self.cfg
        mode = cfg.mode
        rec = self._rec_penalty(t)

        if mode == "ali":
            g, d = objs.ali(t["disc_fake"], t["disc_real"])
        elif mode in ("alice", "alice-z", "alice-x"):
            g, d = objs.alice(t["disc_fake"], t["disc_real"], rec)
        elif mode == "vegan":
            g, d = objs.vegan(t["disc_fake"], t["disc_real"], rec,
                              cfg.lambda_)
        elif mode == "vegan-wgan-gp":
            gp = penalties.gradient_penalty_z(
                lambda z: networks.discriminator_z(cfg, z),
                t["q_z"], t["p_z"], next_rng_key(), cfg.gp_lambda)
            g, d = objs.vegan_wgan_gp(t["disc_fake"], t["disc_real"], rec,
                                      gp, cfg.lambda_)
        elif mode == "wali":
            g, d = objs.wali(t["disc_fake"], t["disc_real"])
        elif mode == "wali-gp":
            if "gp" in t:          # fused row-wise path (built in _graph)
                gp = t["gp"]
            else:
                gp = penalties.gradient_penalty_xz(
                    lambda x, z: networks.discriminator_xz(cfg, x, z),
                    t["real_x"], t["fake_x"], t["q_z"], t["p_z"],
                    next_rng_key(), cfg.gp_lambda)
            g, d = objs.wali_gp(t["disc_fake"], t["disc_real"], gp)
        elif mode == "vegan-mmd":
            g = mmd.vegan_mmd(t["q_z"], t["p_z"], rec, cfg.lambda_)
            d = None
        elif mode in ("vegan-kl", "vegan-ikl", "vegan-jsd"):
            # prior moments are Z_SAMPLES-shaped (gan_inference_mnist.py:264-265)
            p_mean = jnp.zeros((cfg.z_samples, cfg.dim_latent))
            p_std = jnp.ones((cfg.z_samples, cfg.dim_latent))
            key = next_rng_key()
            # batch size from the runtime shape (== cfg.batch_size in the
            # published path; the per-microbatch size under accum_steps>1)
            b = t["q_z_mean"].shape[0]
            if mode == "vegan-kl":
                g = kl_aggregated.vegan_kl(
                    key, t["q_z_mean"], t["q_z_std"], p_mean, p_std, rec,
                    cfg.z_samples, b, cfg.dim_latent, cfg.lambda_)
            elif mode == "vegan-ikl":
                g = kl_aggregated.vegan_ikl(
                    key, t["q_z_mean"], t["q_z_std"], p_mean, p_std, rec,
                    cfg.z_samples, cfg.dim_latent, cfg.lambda_)
            else:
                g = kl_aggregated.vegan_jsd(
                    key, t["q_z_mean"], t["q_z_std"], p_mean, p_std, rec,
                    cfg.z_samples, b, cfg.dim_latent, cfg.lambda_)
            d = None
        elif mode == "vae":
            p_z_mean = jnp.zeros_like(t["q_z_mean"])
            p_z_std = jnp.ones_like(t["q_z_std"])
            p_x_mean = t["rec_x"]
            p_x_std = jnp.full_like(t["rec_x"], cfg.std)
            g = kl.vae(t["real_x"], p_x_mean, p_x_std,
                       t["q_z_mean"], t["q_z_std"], p_z_mean, p_z_std)
            d = None
        else:
            raise NotImplementedError(mode)
        return g, d, rec

    # -- public loss API (call under registry.apply) -------------------------

    def gen_loss(self, raw_x: jax.Array) -> Tuple[jax.Array, Dict]:
        t = self._graph(raw_x)
        g, _, rec = self._costs(t)
        aux = {"gen_cost": g}
        if rec is not None:
            aux["rec_cost"] = rec
        return g, aux

    def disc_loss(self, raw_x: jax.Array) -> Tuple[jax.Array, Dict]:
        t = self._graph(raw_x)
        _, d, _ = self._costs(t)
        assert d is not None, f"mode {self.cfg.mode} has no discriminator"
        return d, {"disc_cost": d}

    # -- eval forwards -------------------------------------------------------

    def sample(self, noise: jax.Array) -> jax.Array:
        """Generator forward from given codes (fixed-noise sample grids)."""
        x, _, _ = networks.generator(self.cfg, noise)
        return x

    def reconstruct(self, raw_x: jax.Array) -> jax.Array:
        real_x = self.normalize(raw_x)
        q_z, _, _ = networks.extractor(self.cfg, real_x)
        rec_x, _, _ = networks.generator(self.cfg, q_z)
        return rec_x

    def encode(self, raw_x: jax.Array) -> jax.Array:
        real_x = self.normalize(raw_x)
        q_z, _, _ = networks.extractor(self.cfg, real_x)
        return q_z

    # -- init ---------------------------------------------------------------

    def init(self, key: jax.Array) -> Params:
        cfg = self.cfg
        raw = jnp.zeros((cfg.batch_size, cfg.data.output_dim), jnp.float32)

        def build():
            t = self._graph(raw)
            self._costs(t)  # ensure GP-path params (none new) are traced
            return None

        _, params = registry.init(build, key)
        return params

    # -- optimizer presets ---------------------------------------------------

    def opt_specs(self) -> Tuple[OptSpec, Optional[OptSpec]]:
        cfg = self.cfg
        mode = cfg.mode
        if mode in ("wali", "wali-gp"):
            spec = optimizer_for(mode.replace("-", "_"))
            return spec, spec
        gen = optimizer_for(mode, lr=cfg.lr, beta1=cfg.beta1)
        if not cfg.has_discriminator:
            return gen, None
        # ali passes beta2 explicitly (gan_inference_mnist.py:286)
        if mode == "ali":
            gen = optimizer_for(mode, lr=cfg.lr, beta1=cfg.beta1,
                                beta2=cfg.beta2)
        return gen, gen
