"""Adversarial-inference losses over (data, code) pairs.

Pure-function rebuild of ``tflib/objs/gan_inference.py`` (the reference's
loss+optimizer factories).  Every function returns ``(gen_cost, disc_cost)``
scalars; optimizer choice lives in ``objectives.common.optimizer_for`` and the
update itself in ``optim``.

Label conventions (load-bearing, easy to get wrong): for all sigmoid-CE
losses the *generator* player is trained with flipped labels on BOTH terms
(fake->1 AND real->0) — a symmetric non-saturating loss
(``gan_inference.py:48-55``) — while the discriminator uses fake->0, real->1.

``s_f`` is the optional REINFORCE surrogate added to the generator cost
(``gan_inference.py:65-66``; built by ``objectives.discrete.score_function``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from graphical_gan_tpu.objectives.common import sigmoid_ce

Scalar = jax.Array


def wali(disc_fake: jax.Array, disc_real: jax.Array
         ) -> Tuple[Scalar, Scalar]:
    """Wasserstein ALI (``gan_inference.py:4-26``).

    NOTE the reference's generator cost is ``-E[f] - E[r]`` (sic, both
    negative) — reproduced exactly.  Train with RMSProp 5e-5 + weight clip
    0.01 on Discriminator params (see ``optimizer_for('wali')``).
    """
    gen_cost = -jnp.mean(disc_fake) - jnp.mean(disc_real)
    disc_cost = jnp.mean(disc_fake) - jnp.mean(disc_real)
    return gen_cost, disc_cost


def wali_gp(disc_fake: jax.Array, disc_real: jax.Array,
            gradient_penalty: Scalar) -> Tuple[Scalar, Scalar]:
    """Wasserstein ALI + gradient penalty (``gan_inference.py:28-45``)."""
    gen_cost = -jnp.mean(disc_fake) + jnp.mean(disc_real)
    disc_cost = jnp.mean(disc_fake) - jnp.mean(disc_real) + gradient_penalty
    return gen_cost, disc_cost


def ali(disc_fake: jax.Array, disc_real: jax.Array,
        s_f: Optional[Scalar] = None) -> Tuple[Scalar, Scalar]:
    """Sigmoid-CE ALI with one joint discriminator (``gan_inference.py:47-79``)."""
    gen_cost = sigmoid_ce(disc_fake, 1.0) + sigmoid_ce(disc_real, 0.0)
    disc_cost = sigmoid_ce(disc_fake, 0.0) + sigmoid_ce(disc_real, 1.0)
    if s_f is not None:
        gen_cost = gen_cost + s_f
    return gen_cost, disc_cost


def local_ep(disc_fake_list: Sequence[jax.Array],
             disc_real_list: Sequence[jax.Array],
             s_f: Optional[Scalar] = None) -> Tuple[Scalar, Scalar]:
    """The paper's method: CE averaged over local discriminators
    (``gan_inference.py:81-119``).  NOTE the reference adds ``s_f`` BEFORE
    dividing by the list length (``:102-106``) — reproduced exactly.
    """
    gen_cost = jnp.float32(0.0)
    disc_cost = jnp.float32(0.0)
    for df, dr in zip(disc_fake_list, disc_real_list):
        gen_cost = gen_cost + sigmoid_ce(df, 1.0) + sigmoid_ce(dr, 0.0)
        disc_cost = disc_cost + sigmoid_ce(df, 0.0) + sigmoid_ce(dr, 1.0)
    if s_f is not None:
        gen_cost = gen_cost + s_f
    n = len(disc_fake_list)
    return gen_cost / n, disc_cost / n


def local_epce(disc_fake_list: Sequence[jax.Array],
               disc_real_list: Sequence[jax.Array],
               rec_penalty: Scalar,
               s_f: Optional[Scalar] = None) -> Tuple[Scalar, Scalar]:
    """local_ep + reconstruction penalty on the generator
    (``gan_inference.py:121-159``); rec_penalty added AFTER the division.
    """
    gen_cost, disc_cost = local_ep(disc_fake_list, disc_real_list, s_f)
    return gen_cost + rec_penalty, disc_cost


def alice(disc_fake: jax.Array, disc_real: jax.Array, rec_penalty: Scalar,
          s_f: Optional[Scalar] = None) -> Tuple[Scalar, Scalar]:
    """ALI + reconstruction penalty (``gan_inference.py:161-192``)."""
    gen_cost = sigmoid_ce(disc_fake, 1.0) + sigmoid_ce(disc_real, 0.0)
    if s_f is not None:
        gen_cost = gen_cost + s_f
    gen_cost = gen_cost + rec_penalty
    disc_cost = sigmoid_ce(disc_fake, 0.0) + sigmoid_ce(disc_real, 1.0)
    return gen_cost, disc_cost


def vegan(disc_fake: jax.Array, disc_real: jax.Array, rec_penalty: Scalar,
          lamb: float, s_f: Optional[Scalar] = None) -> Tuple[Scalar, Scalar]:
    """VEEGAN-style code-space objective (``gan_inference.py:194-223``):
    gen = lamb*(CE(fake->1) [+ s_f]) + rec;  disc = (lamb/2)*(CE both).
    """
    gen_cost = sigmoid_ce(disc_fake, 1.0)
    if s_f is not None:
        gen_cost = gen_cost + s_f
    gen_cost = gen_cost * lamb + rec_penalty
    disc_cost = (sigmoid_ce(disc_fake, 0.0) + sigmoid_ce(disc_real, 1.0)) * (
        lamb / 2.0)
    return gen_cost, disc_cost


def vegan_wgan_gp(disc_fake: jax.Array, disc_real: jax.Array,
                  rec_penalty: Scalar, gradient_penalty: Scalar,
                  lamb: float) -> Tuple[Scalar, Scalar]:
    """Wasserstein vegan + GP (``gan_inference.py:225-244``)."""
    gen_cost = (-jnp.mean(disc_fake) + jnp.mean(disc_real)) * lamb + rec_penalty
    disc_cost = (jnp.mean(disc_fake) - jnp.mean(disc_real)) * lamb \
        + gradient_penalty
    return gen_cost, disc_cost


def local_ep_dynamic(disc_fake_zz: Sequence[jax.Array],
                     disc_real_zz: Sequence[jax.Array],
                     disc_fake_xz: jax.Array, disc_real_xz: jax.Array,
                     rec_penalty: Optional[Scalar] = None
                     ) -> Tuple[Scalar, Scalar]:
    """zz-pair discriminator list + one xz discriminator
    (``gan_inference.py:246-304``): the zz sum is normalized by len+1, the xz
    terms are added un-normalized afterwards — reproduced exactly.
    """
    gen_cost = jnp.float32(0.0)
    disc_cost = jnp.float32(0.0)
    for df, dr in zip(disc_fake_zz, disc_real_zz):
        gen_cost = gen_cost + sigmoid_ce(df, 1.0) + sigmoid_ce(dr, 0.0)
        disc_cost = disc_cost + sigmoid_ce(df, 0.0) + sigmoid_ce(dr, 1.0)
    if len(disc_fake_zz) > 0:
        gen_cost = gen_cost / (len(disc_fake_zz) + 1)
        disc_cost = disc_cost / (len(disc_fake_zz) + 1)
    gen_cost = gen_cost + sigmoid_ce(disc_fake_xz, 1.0) \
        + sigmoid_ce(disc_real_xz, 0.0)
    disc_cost = disc_cost + sigmoid_ce(disc_fake_xz, 0.0) \
        + sigmoid_ce(disc_real_xz, 1.0)
    if rec_penalty is not None:
        gen_cost = gen_cost + rec_penalty
    return gen_cost, disc_cost


def weighted_local_epce(disc_fake_list: Sequence[jax.Array],
                        disc_real_list: Sequence[jax.Array],
                        ratio_list,
                        rec_penalty: Optional[Scalar] = None
                        ) -> Tuple[Scalar, Scalar, List[Scalar], List[Scalar]]:
    """Per-discriminator weighted CE, used by SSGAN
    (``gan_inference.py:307-358``).  Returns (gen, disc, gen_debug, disc_debug)
    where the debug lists carry each discriminator's weighted contribution.
    """
    assert len(disc_fake_list) == len(ratio_list)
    gen_cost = jnp.float32(0.0)
    disc_cost = jnp.float32(0.0)
    gen_debug, disc_debug = [], []
    for df, dr, ratio in zip(disc_fake_list, disc_real_list, ratio_list):
        ratio = jnp.float32(ratio)
        g = ratio * sigmoid_ce(df, 1.0) + ratio * sigmoid_ce(dr, 0.0)
        d = ratio * sigmoid_ce(df, 0.0) + ratio * sigmoid_ce(dr, 1.0)
        gen_cost = gen_cost + g
        disc_cost = disc_cost + d
        gen_debug.append(g)
        disc_debug.append(d)
    if rec_penalty is not None:
        gen_cost = gen_cost + rec_penalty
    return gen_cost, disc_cost, gen_debug, disc_debug
