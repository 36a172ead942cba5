"""Pallas TPU kernels + the shared enablement gate.

Gate semantics (``use_pallas()``):

- ``GGAN_PALLAS=1`` / ``=0`` forces the paths on/off;
- unset: auto-enable on a DIRECT TPU backend — remote-compile relays
  (``PALLAS_AXON_REMOTE_COMPILE``) cap program size and compile custom-VJP
  kernels in minutes, so they stay on the XLA paths; CPU runs use interpret
  mode only in tests.
- ``enable_pallas(flag)`` overrides programmatically (used by tests).

The decision is evaluated lazily (first use) because it needs the backend,
and importing this package must not initialize one.
"""

from __future__ import annotations

import os
from typing import Optional

_FORCED: Optional[bool] = None
_AUTO: Optional[bool] = None


def enable_pallas(flag: bool = True) -> None:
    global _FORCED
    _FORCED = flag


def use_pallas() -> bool:
    global _AUTO
    if _FORCED is not None:
        return _FORCED
    env = os.environ.get("GGAN_PALLAS")
    if env is not None:
        return env == "1"
    if _AUTO is None:
        import jax
        _AUTO = (jax.default_backend() == "tpu"
                 and not os.environ.get("PALLAS_AXON_REMOTE_COMPILE"))
    return _AUTO


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
