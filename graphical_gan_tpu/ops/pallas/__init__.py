"""Pallas TPU kernels + the shared enablement gate.

Gate semantics (``use_pallas()``):

- ``GGAN_PALLAS=1`` / ``=0`` forces the paths on/off;
- unset: OFF.  Both kernels are strictly opt-in: honest (hard-fetch-timed,
  see BASELINE.md "measurement honesty") A/Bs measured the fused BN+act
  kernel at 0.71x the PRODUCTION jnp path (``ops/norm.py`` math: jnp.mean +
  jnp.var + normalize + act; 5.24 vs 7.37 ms at the 0.5 GB shape) and
  0.72x an ideal one-pass-moments formulation — XLA compiles both jnp
  variants to near-identical code — with ~1.0x at the model-family shapes
  (``tools/bench_pallas.py`` times all three sides).  The fused conv
  measured 0.92-0.99x.  XLA's own fusion of these epilogues is already at
  or past this implementation; an earlier 1.23x result for the BN kernel
  was an artifact of ``block_until_ready``-based timing and is retracted.
  The kernels remain maintained + tested (custom VJPs, interpret-mode
  parity) as the framework's Pallas integration seam.
- ``enable_pallas(flag)`` overrides programmatically (used by tests).
"""

from __future__ import annotations

import os
from typing import Optional

_FORCED: Optional[bool] = None


def enable_pallas(flag: bool = True) -> None:
    global _FORCED
    _FORCED = flag


def use_pallas() -> bool:
    if _FORCED is not None:
        return _FORCED
    return os.environ.get("GGAN_PALLAS") == "1"


def use_pallas_conv() -> bool:
    """The fused conv kernel measured at parity with XLA's conv (which
    already fuses the bias+act epilogue) — 0.92-0.99x on a v5e — so it is
    strictly opt-in via GGAN_PALLAS_CONV=1 / enable_pallas(True), never
    auto-enabled."""
    if _FORCED is not None:
        return _FORCED
    return os.environ.get("GGAN_PALLAS_CONV") == "1"


from graphical_gan_tpu.ops.pallas.fused_norm import fused_batchnorm_act  # noqa: E402
from graphical_gan_tpu.ops.pallas.fused_conv import fused_conv2d_bias_act  # noqa: E402
