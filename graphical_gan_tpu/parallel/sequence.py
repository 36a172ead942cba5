"""Sequence parallelism for the video family (SSGAN).

The reference's only sequence axis is SSGAN's LEN (<= 31 frames), handled by
an unrolled host-side Python loop (``ssgan_inference_moving_mnist.py:134-141``)
— SURVEY §5 requires the rebuild to "keep the scan axis shardable".  This
module is that capability: a 2-D ``(data, seq)`` mesh where

- the batch axis B of every raw video is sharded over ``data``,
- the frame axis LEN is sharded over ``seq``,
- params + optimizer states stay replicated.

Why this is the right TPU decomposition for family 3: the device timeline
(BASELINE.md round 3) attributes **91.5%** of ssgan step time to the frame
conv/deconv stacks, which all run at the folded ``B*LEN`` frame batch
(``models/ssgan.py: frame_generator/frame_extractor/frame_discriminator``).
Folding a ``('data'-sharded B, 'seq'-sharded LEN)`` pair of dims merges their
shardings, so GSPMD runs every frame network fully partitioned over BOTH mesh
axes — sequence sharding buys the same per-chip frame-batch reduction as data
sharding, but without requiring B >= n_devices (B=50 published; chairs LEN=31
with LEN-1=30 pair terms).  The sequential parts (the latent chains, scanned
over LEN with a [B, dim_l] carry) are inherently order-dependent and tiny
(3.7% of device time): GSPMD gathers the frame codes over ``seq`` and runs
the chains data-sharded, which costs one small all-gather per chain instead
of serializing the 91.5%.

No hand-written collectives: the sharding enters at the raw-batch
constraint, plus one ``with_sharding_constraint`` per frame-network fold
point (``core/shard_ctx.constrain_frames`` — required because the
generator-side frame batch descends from replicated RNG draws, so input
propagation alone leaves the fake-frame convs only data-sharded; measured on
the virtual 2x4 mesh).  XLA GSPMD derives every collective (verified by
``tests/test_sequence_parallel.py``, which checks the compiled HLO actually
partitions the frame convs over both axes AND that the step's numbers match
the unsharded program).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def video_batch_spec(ndim: int, data_axis: str = "data",
                     seq_axis: str = "seq") -> P:
    """PartitionSpec for a stacked raw-video leaf.

    Layouts (see ``runs/ssgan.py``): videos ``[(1+k), B, LEN, D]`` -> shard B
    over ``data`` and LEN over ``seq``; per-video labels ``[(1+k), B, N_C]``
    -> shard B only.
    """
    if ndim == 4:
        return P(None, data_axis, seq_axis, None)
    spec = [None] * ndim
    if ndim >= 2:
        spec[1] = data_axis
    return P(*spec)


def make_sp_train_step(model, mesh: Mesh,
                       critic_iters: Optional[int] = None,
                       data_axis: str = "data", seq_axis: str = "seq",
                       donate: bool = True, lr_scale=None):
    """Jit the fused ssgan step over a 2-D (data, seq) mesh.

    Batch dim sharded over ``data``, frame dim over ``seq``, params
    replicated; XLA partitions the folded B*LEN frame networks over both
    axes and inserts the DP psum plus the small seq-axis gathers around the
    latent chains.  Returns ``(step, init_state, place)`` like
    ``mesh.make_parallel_train_step``.

    Divisibility: B % mesh['data'] == 0 and LEN % mesh['seq'] == 0 (the
    LEN-1 pair terms and (LEN-2)-step chains reshard internally — GSPMD
    handles the ragged intermediate dims).
    """
    from graphical_gan_tpu.core import shard_ctx
    from graphical_gan_tpu.parallel.mesh import replicate
    from graphical_gan_tpu.train.step import make_train_step

    raw_step, init_state = make_train_step(model, critic_iters=critic_iters,
                                           lr_scale=lr_scale, jit=False)
    repl = NamedSharding(mesh, P())

    def batch_constraint(x):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh,
                             video_batch_spec(x.ndim, data_axis, seq_axis)))

    def fold_constraint(h):
        # a folded [B*LEN, ...] frame tensor: the leading dim is the
        # row-major merge of (data-sharded B, seq-sharded LEN), so its
        # partitioning is the product axis pair, major-to-minor
        spec = [None] * h.ndim
        spec[0] = (data_axis, seq_axis)
        return jax.lax.with_sharding_constraint(
            h, NamedSharding(mesh, P(*spec)))

    def step(state, raw_batches, key, do_gen):
        raw_batches = jax.tree.map(batch_constraint, raw_batches)
        with shard_ctx.frame_constraint(fold_constraint):
            return raw_step(state, raw_batches, key, do_gen)

    jitted = jax.jit(step, in_shardings=(repl, None, repl, repl),
                     out_shardings=(repl, repl),
                     donate_argnums=(0,) if donate else ())

    def place(state):
        return replicate(mesh, state)

    return jitted, init_state, place
