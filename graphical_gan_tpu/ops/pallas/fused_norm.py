"""Pallas TPU kernel: fused batch-norm + activation with custom VJP.

Every conv block in all three model families is ``conv -> batchnorm(batch
stats) -> (leaky_)relu`` (e.g. ``gan_inference_mnist.py:152-160``).  XLA
fuses the elementwise tail but still materializes the normalized tensor
between the two reduction passes; this kernel does the whole
stats+normalize+activate pipeline with the rows streamed through VMEM:

- forward: one grid pass accumulating per-channel sum/sum-of-squares in a
  VMEM scratch accumulator (TPU grids execute sequentially, so accumulation
  across steps is safe), then a second grid pass applying
  ``act((x - mean) * rsqrt(var + eps) * scale + offset)``.
- backward (standard BN gradient, stats recomputed — remat trades FLOPs for
  HBM): reduces ``dy`` and ``dy * xhat`` per channel, then one elementwise
  pass.

Layout contract: input is channels-last, reshaped to ``[R, C]`` with
``R = prod(leading dims)``; C rides the 128-wide lane dimension.  Row blocks
are padded to the f32 sublane tile (8).

Enabled via ``GGAN_PALLAS=1`` / ``ops.norm.enable_pallas()`` — numerics
match the jnp reference path to f32 roundoff (see tests/test_pallas.py);
falls back to interpret mode off TPU.

Measured on one TPU v5e chip with hard-fetch-bounded timing
(``tools/bench_pallas.py``, which times the PRODUCTION jnp path of
``ops/norm.py`` — jnp.mean + jnp.var + normalize + act — an ideal
one-pass-moments formulation, and this kernel): at the 0.5 GB
[64*64*64, 512] f32 shape the kernel runs 0.71x the production path
(7.37 vs 5.24 ms/application; the ideal variant is within 2% of
production, so XLA already compiles the two-pass jnp code optimally), and
~1.0x at the model-family shapes — hence strictly OPT-IN
(``GGAN_PALLAS=1``).  An earlier 1.23x result was an artifact of
``block_until_ready``-based timing on the relay backend (see BASELINE.md
"measurement honesty") and is retracted.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_rows(n_rows: int) -> int:
    # stream rows through VMEM in sublane-aligned blocks
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8):
        if n_rows % cand == 0:
            return cand
    return n_rows


from graphical_gan_tpu.ops.activations import LEAKY_ALPHA, activation as _act_fn


def _act_grad(act: Optional[str], y):
    """d act(u)/du expressed from the OUTPUT y (monotone activations)."""
    if act is None:
        return jnp.ones_like(y)
    if act == "relu":
        return (y > 0).astype(y.dtype)
    if act == "leaky_relu":
        return jnp.where(y > 0, 1.0, LEAKY_ALPHA).astype(y.dtype)
    raise ValueError(act)


# -- kernels ----------------------------------------------------------------

def _stats_kernel(x_ref, out_ref, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:].astype(jnp.float32)
    acc[0, :] += jnp.sum(x, axis=0)
    acc[1, :] += jnp.sum(x * x, axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:]


def _apply_kernel(x_ref, mean_ref, inv_ref, scale_ref, offset_ref, y_ref, *,
                  act):
    x = x_ref[:].astype(jnp.float32)
    xhat = (x - mean_ref[0, :]) * inv_ref[0, :]
    y = xhat * scale_ref[0, :] + offset_ref[0, :]
    y_ref[:] = _act_fn(act)(y).astype(y_ref.dtype)


def _bwd_reduce_kernel(g_ref, x_ref, mean_ref, inv_ref, scale_ref,
                       offset_ref, out_ref, acc, *, act):
    """Accumulate per-channel [sum(g*act'), sum(g*act'*xhat)]."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    xhat = (x - mean_ref[0, :]) * inv_ref[0, :]
    y = xhat * scale_ref[0, :] + offset_ref[0, :]
    gz = g * _act_grad(act, y)
    acc[0, :] += jnp.sum(gz, axis=0)
    acc[1, :] += jnp.sum(gz * xhat, axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:]


def _bwd_apply_kernel(g_ref, x_ref, mean_ref, inv_ref, scale_ref, offset_ref,
                      red_ref, dx_ref, *, act, n_rows):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    xhat = (x - mean_ref[0, :]) * inv_ref[0, :]
    y = xhat * scale_ref[0, :] + offset_ref[0, :]
    gz = g * _act_grad(act, y)
    mean_gz = red_ref[0, :] / n_rows
    mean_gz_xhat = red_ref[1, :] / n_rows
    dx = (gz - mean_gz - xhat * mean_gz_xhat) * inv_ref[0, :] * scale_ref[0, :]
    dx_ref[:] = dx.astype(dx_ref.dtype)


# -- host-side plumbing -----------------------------------------------------

def _stats(x2d: jax.Array) -> Tuple[jax.Array, jax.Array]:
    r, c = x2d.shape
    br = _block_rows(r)
    out = pl.pallas_call(
        _stats_kernel,
        grid=(r // br,),
        in_specs=[pl.BlockSpec((br, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=_interpret(),
    )(x2d)
    mean = out[0] / r
    var = out[1] / r - mean * mean
    return mean, var


def _row1(v):
    return v.reshape(1, -1).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_batchnorm_act(x: jax.Array, scale: jax.Array, offset: jax.Array,
                        act: Optional[str] = None,
                        eps: float = _EPS) -> jax.Array:
    """act(batchnorm(x)) over channels-last x, batch statistics.

    x: [..., C]; scale/offset: [C].  Matches
    ``act(ops.norm.batchnorm(...))`` to f32 roundoff.
    """
    y, _ = _fwd(x, scale, offset, act, eps)
    return y


def _fwd(x, scale, offset, act, eps):
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    r = x2d.shape[0]
    mean, var = _stats(x2d)
    inv = jax.lax.rsqrt(var + eps)
    br = _block_rows(r)
    y2d = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        interpret=_interpret(),
    )(x2d, _row1(mean), _row1(inv), _row1(scale), _row1(offset))
    return y2d.reshape(shape), (x, scale, offset, mean, inv)


def _bwd(act, eps, residuals, g):
    x, scale, offset, mean, inv = residuals
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    g2d = g.reshape(-1, c)
    r = x2d.shape[0]
    br = _block_rows(r)

    args = (g2d, x2d, _row1(mean), _row1(inv), _row1(scale), _row1(offset))
    row_spec = pl.BlockSpec((br, c), lambda i: (i, 0))
    chan_spec = pl.BlockSpec((1, c), lambda i: (0, 0))

    red = pl.pallas_call(
        functools.partial(_bwd_reduce_kernel, act=act),
        grid=(r // br,),
        in_specs=[row_spec, row_spec, chan_spec, chan_spec, chan_spec,
                  chan_spec],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=_interpret(),
    )(*args)

    dx2d = pl.pallas_call(
        functools.partial(_bwd_apply_kernel, act=act, n_rows=float(r)),
        grid=(r // br,),
        in_specs=[row_spec, row_spec, chan_spec, chan_spec, chan_spec,
                  chan_spec, pl.BlockSpec((2, c), lambda i: (0, 0))],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        interpret=_interpret(),
    )(*args, red)

    # dscale = sum(gz * xhat) == red[1]; doffset = sum(gz) == red[0]
    dscale = red[1].astype(scale.dtype)
    doffset = red[0].astype(offset.dtype)
    return dx2d.reshape(shape), dscale, doffset


fused_batchnorm_act.defvjp(
    lambda x, s, o, act, eps: _fwd(x, s, o, act, eps),
    _bwd,
)
