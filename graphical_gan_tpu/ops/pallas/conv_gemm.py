"""Shape-specialized Pallas implicit-GEMM conv for the flagship D-stack.

Second, deeper attack on the conv plateau (BENCH_r04: 27.6% MFU, 89.4% of
device time in XLA conv fusions at ~37% kernel efficiency; reference hot op
``tflib/ops/conv2d.py:106-123``).  The first kernel
(``ops/pallas/fused_conv.py``) lost to XLA by 1-8%; its grid put ONE BATCH
ITEM per program, so every MXU dot was ``[OH*OW=64, Cin] @ [Cin, Nblk]`` —
an M=64 sliver that leaves the 128x128 systolic array mostly idle and
repeats the weight fetch per item.

This kernel restructures the GEMM geometry:

- **M = B*OH*OW** (4096 at the flagship discriminator shapes) — the whole
  batch rides the M axis of ONE accumulation, so the MXU sees full tiles
  and each weight tap is fetched once per Cout block, not once per item.
- stride-2 is handled by the same *phase decomposition* as before (a tap
  (kh, kw) addresses phase (kh%2, kw%2) at static offset (kh//2, kw//2) —
  strided access becomes static slicing), but the phases are stacked
  ``[4, B, OH2, OW2, C]`` so one BlockSpec stages ALL input pixels in VMEM
  once per Cout block.
- the 25 taps accumulate into a single f32 VMEM scratch ``[M, Nblk]``;
  bias + LeakyReLU fuse into the single output write (bf16).
- weights arrive pre-blocked ``[KH, KW, C, Nblk]`` per grid step; with the
  default Nblk=128 the N axis matches the MXU tile exactly.

Everything is bf16 in, f32 accumulation, bf16 out — the training step's
compute dtype.  VMEM budget at the largest flagship shape
(conv2: x-phases 6.4 MB + w 1.6 MB + acc 2 MB + out 1 MB) fits the ~16 MB
budget with double-buffering headroom.

Correctness: tests/test_conv_gemm.py (vs ``lax.conv_general_dilated`` at
the three flagship shapes + odd shapes, f32 and bf16).  Performance:
``tools/bench_conv_kernel.py`` (hard-fetch timed A/B vs XLA's identically
fused conv on the real chip); results recorded in BASELINE.md.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _same_pads(size: int, k: int, s: int):
    out = -(-size // s)
    pad = max(0, (out - 1) * s + k - size)
    return pad // 2, pad - pad // 2


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def phase_stack(x: jax.Array, k: int, s: int) -> jax.Array:
    """[B,H,W,C] -> [s*s, B, OH2, OW2, C]: SAME-pad, then split the padded
    image by pixel parity so tap (kh, kw) reads phase (kh%s, kw%s) at
    static offset (kh//s, kw//s).  OH2 = ceil((Hp - ph)/s) covers every
    offset's window (cdiv(k, s) - 1 + OH rows)."""
    b, h, w, c = x.shape
    pt, pb = _same_pads(h, k, s)
    plf, pr = _same_pads(w, k, s)
    oh = -(-h // s)
    ow = -(-w // s)
    span = (k - 1) // s + oh          # rows needed to cover all tap offsets
    # pad so every phase slab has exactly `span` rows/cols
    hp_need = (span - 1) * s + s      # phase p takes rows p, p+s, ...
    xpad = jnp.pad(x, ((0, 0), (pt, max(pb, hp_need - h - pt)),
                       (plf, max(pr, hp_need - w - plf)), (0, 0)))
    slabs = []
    for ph in range(s):
        for pw in range(s):
            slabs.append(xpad[:, ph::s, pw::s, :][:, :span, :span, :])
    return jnp.stack(slabs)


def _kernel(xp_ref, w_ref, b_ref, y_ref, acc_ref, *,
            k: int, s: int, b: int, oh: int, ow: int, cin: int,
            leak: Optional[float]):
    m = b * oh * ow
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for kh in range(k):
        for kw in range(k):
            ph, pw = kh % s, kw % s
            oh0, ow0 = kh // s, kw // s
            window = xp_ref[ph * s + pw, :, oh0:oh0 + oh, ow0:ow0 + ow, :]
            a2 = window.reshape(m, cin)
            acc_ref[:] += jnp.dot(a2, w_ref[kh, kw],
                                  preferred_element_type=jnp.float32)
    y = acc_ref[:] + b_ref[0].astype(jnp.float32)
    if leak is not None:
        y = jnp.where(y >= 0, y, leak * y)
    y_ref[:] = y.reshape(b, oh, ow, -1).astype(y_ref.dtype)


def _kernel_im2col(xp_ref, w_ref, b_ref, y_ref, col_ref, *,
                   k: int, s: int, b: int, oh: int, ow: int, cin: int,
                   leak: Optional[float]):
    """im2col variant: stage all K*K windows into one wide VMEM buffer,
    then ONE MXU dot with K = k*k*cin — trades the 25 thin (K=cin) dots
    (each under-filling the 128-deep systolic array and paying its own
    pipeline ramp) for a single full-depth contraction; the window copies
    are identical in both variants."""
    m = b * oh * ow
    for kh in range(k):
        for kw in range(k):
            ph, pw = kh % s, kw % s
            oh0, ow0 = kh // s, kw // s
            t = kh * k + kw
            window = xp_ref[ph * s + pw, :, oh0:oh0 + oh, ow0:ow0 + ow, :]
            col_ref[:, t * cin:(t + 1) * cin] = window.reshape(m, cin)
    y = jnp.dot(col_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y = y + b_ref[0].astype(jnp.float32)
    if leak is not None:
        y = jnp.where(y >= 0, y, leak * y)
    y_ref[:] = y.reshape(b, oh, ow, -1).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("stride", "leak", "n_block",
                                             "b_block", "variant"))
def conv_gemm(x: jax.Array, w: jax.Array, bias: jax.Array,
              stride: int = 2, leak: Optional[float] = 0.2,
              n_block: int = 128, b_block: int = 64,
              variant: str = "taps") -> jax.Array:
    """SAME conv + bias (+ LeakyReLU when ``leak`` is set), NHWC/HWIO.

    Shape-specialized for the k5s2 discriminator stack: a whole batch
    block rides the implicit-GEMM M axis, taps accumulate in one f32 VMEM
    scratch.  Grid = (Cout blocks, batch blocks), batch innermost so each
    weight block stays VMEM-resident across the batch sweep.
    """
    b, h, wdt, cin = x.shape
    k = w.shape[0]
    cout = w.shape[3]
    s = stride
    oh = -(-h // s)
    ow = -(-wdt // s)
    span = (k - 1) // s + oh
    nb = min(n_block, cout)

    def _largest_divisor_leq(n: int, cap: int) -> int:
        return max(d for d in range(1, min(n, cap) + 1) if n % d == 0)

    bb = _largest_divisor_leq(b, b_block)
    if b > bb:
        # multi-block batch grids get their input/output blocks
        # double-buffered by Mosaic; shrink the block so the pipeline
        # buffers + per-tap window temporaries stay inside scoped VMEM
        # (measured: bb=64 with 8 batch blocks at disc2 shapes = 22 MB
        # scoped > the 16 MB limit; bb=32 fits).  Always a divisor of b.
        bb = _largest_divisor_leq(b, min(bb, 32))
    if variant == "im2col":
        # the staged col buffer is m x (k*k*cin) of the input dtype —
        # shrink the batch block until buffers fit scoped VMEM (measured
        # 20.6 MB > 16 MB at bb=64, disc2)
        ib = x.dtype.itemsize
        span_ = (k - 1) // s + oh

        def est(bb_):
            m_ = bb_ * oh * ow
            return (m_ * k * k * cin * ib            # col scratch
                    + 2 * s * s * bb_ * span_ * span_ * cin * ib   # xp 2x
                    + 2 * m_ * nb * ib               # out 2x
                    + k * k * cin * nb * ib          # weights
                    # Mosaic stack-allocates each unrolled tap's window
                    # temporary (measured: 17.5 MB scoped at bb=32/disc2
                    # with the naive estimate at 11 MB)
                    + k * k * m_ * cin * ib)

        while bb > 8 and est(bb) > 12 * 2 ** 20:
            bb = _largest_divisor_leq(b, bb // 2)
    assert cout % nb == 0, (cout, nb)
    assert b % bb == 0, (b, bb)
    m = bb * oh * ow

    xp = phase_stack(x, k, s)
    grid = (cout // nb, b // bb)
    if variant == "im2col":
        # weights tap-major [k*k*cin, cout] to match the col buffer layout
        w2 = w.reshape(k * k * cin, cout)
        return pl.pallas_call(
            functools.partial(_kernel_im2col, k=k, s=s, b=bb, oh=oh, ow=ow,
                              cin=cin, leak=leak),
            grid=grid,
            in_specs=[
                pl.BlockSpec((s * s, bb, span, span, cin),
                             lambda j, i: (0, i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k * k * cin, nb), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bb, oh, ow, nb),
                                   lambda j, i: (i, 0, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, oh, ow, cout), x.dtype),
            scratch_shapes=[pltpu.VMEM((m, k * k * cin), x.dtype)],
            interpret=_interpret(),
        )(xp, w2, bias.reshape(1, cout))
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, s=s, b=bb, oh=oh, ow=ow, cin=cin,
                          leak=leak),
        grid=grid,
        in_specs=[
            pl.BlockSpec((s * s, bb, span, span, cin),
                         lambda j, i: (0, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, cin, nb), lambda j, i: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, oh, ow, nb),
                               lambda j, i: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, nb), jnp.float32)],
        interpret=_interpret(),
    )(xp, w, bias.reshape(1, cout))
    return out


def conv_gemm_reference(x, w, bias, stride=2, leak=0.2):
    """XLA oracle with the identical epilogue (the A/B comparison arm)."""
    y = lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + bias.astype(jnp.float32)
    if leak is not None:
        y = jnp.where(y >= 0, y, leak * y)
    return y.astype(x.dtype)
