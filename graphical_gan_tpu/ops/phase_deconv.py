"""Phase-decomposed (subpixel) stride-2 transposed convolution.

Motivation (round-3 perf finding, BASELINE.md): both the wali-gp and ssgan
steps plateau on XLA conv-kernel efficiency.  A transposed conv with stride
2 is lowered by XLA as an input-dilated convolution — the kernel slides
over an input with zeros inserted between every pixel, so up to 3/4 of the
MXU MACs multiply structural zeros.  The same lowering appears in the
BACKWARD pass of every stride-2 forward conv (the input-gradient is a
transposed conv), i.e. in the discriminator/extractor grads too.

This module computes the identical linear map as an exact rewrite with NO
dilated operand: split the kernel into the 2x2 output-phase sub-kernels
(the taps that actually align with real input pixels for each output
parity), run ONE stride-1 convolution producing all four phases as channel
groups, and interleave them spatially (depth-to-space).  For the k=5
kernels used throughout the reference this does H*W*(3*3)*4*Cin*Cout MACs
instead of the dilated form's (2H)*(2W)*(5*5)*Cin*Cout — 2.8x fewer, all
of them useful — and the stride-1 conv at doubled channel count is a
better MXU shape besides.

Derivation (1-D, per spatial axis; 2-D is the outer product).  The
transposed conv is the adjoint of a stride-2 SAME conv on length-2H input:
``out[i] = sum_d in[2i + d - pad_lo] K[d]`` with ``pad_lo = (k-2)//2``.
The adjoint scatters ``y[m] = sum_{2i+d-pad_lo=m} x[i] K[d]``; writing
``m = 2u + a`` for output phase ``a in {0,1}`` and tap offset ``t``:
``y[2u+a] = sum_t x[u+t] K[-2t + a + pad_lo]``  — a stride-1 correlation
whose taps are the parity-``a`` entries of K, reversed.  All phases fit a
common window ``t in [t_min, t_max]`` with out-of-range taps zeroed.

Used by ``ops.conv.deconv2d`` when ``phase_deconv`` is enabled (see
``use_phase_deconv``).  Exactness vs ``lax.conv_transpose`` (itself
tf-oracle-tested, ``tests/test_tf_parity.py``) is pinned by
``tests/test_phase_deconv.py``.  Reference op being rebuilt:
``tflib/ops/deconv2d.py:91-116`` (tf.nn.conv2d_transpose, stride 2).
"""

from __future__ import annotations

import math
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax

_DN2D = ("NHWC", "HWIO", "NHWC")


@lru_cache(maxsize=None)
def _phase_plan(k: int):
    """Static tap plan for one spatial axis at stride 2.

    Returns (pl, pr, T, taps) where taps[a] is a list of (j, d): window
    position j reads original-kernel tap d for output phase a."""
    pad_lo = (k - 2) // 2
    t_rng = {}
    for a in (0, 1):
        # valid t where 0 <= -2t + a + pad_lo <= k-1
        t_lo = math.ceil((a + pad_lo - (k - 1)) / 2)
        t_hi = math.floor((a + pad_lo) / 2)
        t_rng[a] = (t_lo, t_hi)
    t_min = min(r[0] for r in t_rng.values())
    t_max = max(r[1] for r in t_rng.values())
    pl, pr = -t_min, t_max
    T = t_max - t_min + 1
    taps = {}
    for a in (0, 1):
        lst = []
        for j in range(T):
            d = -2 * (j - pl) + a + pad_lo
            if 0 <= d < k:
                lst.append((j, d))
        taps[a] = tuple(lst)
    return pl, pr, T, (taps[0], taps[1])


def _phase_kernel(w_oi: jax.Array, k: int):
    """Build the (T, T, I, 4*O) stride-1 kernel from the TF-layout
    (k, k, O, I) transpose-conv kernel.  Channel group g = 2*a + b holds
    output phase (row parity a, col parity b)."""
    pl, pr, T, taps = _phase_plan(k)
    ko = w_oi.shape[2]
    ki = w_oi.shape[3]
    # forward-conv orientation: (h, w, I, O)
    k_fwd = jnp.transpose(w_oi, (0, 1, 3, 2))
    big = jnp.zeros((T, T, ki, 4 * ko), dtype=w_oi.dtype)
    for a in (0, 1):
        for b in (0, 1):
            g = 2 * a + b
            for (jh, dh) in taps[a]:
                for (jw, dw) in taps[b]:
                    big = big.at[jh, jw, :, g * ko:(g + 1) * ko].set(
                        k_fwd[dh, dw])
    return big, (pl, pr)


def conv_transpose_phase(x: jax.Array, w_oi: jax.Array) -> jax.Array:
    """Exact equivalent of ``lax.conv_transpose(x, w, strides=(2,2),
    padding='SAME', dimension_numbers=(NHWC,HWIO,NHWC),
    transpose_kernel=True)`` with kernel layout (k, k, O, I), computed as
    one stride-1 conv + depth-to-space."""
    k = int(w_oi.shape[0])
    assert w_oi.shape[0] == w_oi.shape[1], "square kernels only"
    out_dim = int(w_oi.shape[2])
    big, (pl, pr) = _phase_kernel(w_oi, k)
    out4 = lax.conv_general_dilated(
        x, big.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(pl, pr), (pl, pr)],
        dimension_numbers=_DN2D,
    )
    b, h, ww = out4.shape[0], out4.shape[1], out4.shape[2]
    out = out4.reshape(b, h, ww, 2, 2, out_dim)
    out = out.transpose(0, 1, 3, 2, 4, 5)  # (B, H, a, W, b, O)
    return out.reshape(b, 2 * h, 2 * ww, out_dim)


def use_phase_deconv() -> bool:
    """Opt-in/out gate, env-overridable like the Pallas gates."""
    v = os.environ.get("GGAN_PHASE_DECONV")
    if v is not None:
        return v not in ("0", "false", "")
    return _DEFAULT_ON


# MEASURED (tools/bench_phase_deconv.py, v5e, bf16, scanned-reps hard-fetch
# timing): the rewrite LOSES — 0.88-0.98x forward and 0.62-0.82x fwd+bwd at
# the large ssgan shapes, ~parity at the small ones.  XLA:TPU's dilated
# transposed-conv lowering evidently does not pay for the structural zeros
# (the premise of the 2.8x-fewer-MACs estimate was false), and the phase
# form adds the interleave/reshape plus a 4x-output-channel conv whose own
# backward is more expensive.  Kept opt-in as a recorded negative result,
# like the Pallas conv and fused-GP experiments (BASELINE.md).
_DEFAULT_ON = False
