"""Frozen Inception-2015 GraphDef → JAX forward, for exact IS parity.

The reference's inception score (``tflib/inception_score.py:56-97``) loads
the frozen ``classify_image_graph_def.pb``, feeds image batches into
``ExpandDims:0``, runs to ``pool_3``, and rebuilds a bias-free softmax from
the ``softmax/logits/MatMul`` weight; scoring is the 10-split exp-mean-KL
(``:25-53``, reproduced in ``metrics.inception``).

This module replays the SAME protocol natively: ``metrics.graphdef`` parses
the proto (no TF dependency) and ``GraphInterpreter`` evaluates the node ops
as JAX — covering the op set a frozen inference graph of that era uses
(Conv2D, BatchNormWithGlobalNormalization, pools, concat, the legacy
ResizeBilinear sampling, …).  Weights are passed as a pytree argument so the
jitted program doesn't embed ~100 MB of constants in the HLO.

The weights file itself is not fetchable on a zero-egress cluster; wherever
``classify_image_graph_def.pb`` exists locally,
``FrozenInceptionClassifier(path)`` plugs straight into
``metrics.inception.get_inception_score`` and IS-within-0.1 is measurable.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from graphical_gan_tpu.metrics.graphdef import (
    Node, dtype_to_numpy, load_graphdef, parse_graphdef)


def _pad_str(node: Node) -> str:
    return node.attr("padding", b"SAME").decode()


def _resize_bilinear_legacy(x: jax.Array, out_h: int, out_w: int
                            ) -> jax.Array:
    """TF1 ResizeBilinear with align_corners=False, half_pixel_centers=False
    (the 2015 graph's attrs): source coordinate = dest * (in/out), edge
    clamped — NOT the half-pixel-centers sampling of jax.image.resize."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    x = x.astype(jnp.float32)

    def axis_weights(n_in: int, n_out: int):
        src = jnp.arange(n_out, dtype=jnp.float32) * (n_in / n_out)
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.minimum(lo + 1, n_in - 1)
        frac = src - lo.astype(jnp.float32)
        return lo, hi, frac

    y0, y1, fy = axis_weights(h, out_h)
    x0, x1, fx = axis_weights(w, out_w)
    top = jnp.take(x, y0, axis=1)
    bot = jnp.take(x, y1, axis=1)
    rows = top + (bot - top) * fy[None, :, None, None]
    left = jnp.take(rows, x0, axis=2)
    right = jnp.take(rows, x1, axis=2)
    out = left + (right - left) * fx[None, None, :, None]
    return out.astype(dtype)


def _avg_pool(x, ksize, strides, padding):
    """TF AvgPool: with SAME padding the mean divides by the number of
    VALID (non-padding) elements in each window."""
    window = tuple(ksize)
    stride = tuple(strides)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, stride,
                                   padding)
    if padding == "VALID":
        return summed / float(np.prod(ksize))
    counts = jax.lax.reduce_window(jnp.ones_like(x), 0.0, jax.lax.add,
                                   window, stride, padding)
    return summed / counts


class GraphInterpreter:
    """Evaluate a frozen GraphDef's ops as JAX, feeding one tensor."""

    def __init__(self, nodes: List[Node]):
        self.nodes: Dict[str, Node] = {n.name: n for n in nodes}
        self.consts: Dict[str, np.ndarray] = {
            n.name: n.attr("value") for n in nodes if n.op == "Const"}

    def make_fn(self, feed_name: str, fetches: Sequence[str]
                ) -> Callable[[Dict[str, jax.Array], jax.Array], list]:
        """Returns ``fn(consts, feed) -> [fetched arrays]`` — jittable; the
        Const store is an argument so weights stay out of the HLO text."""
        nodes = self.nodes

        def fn(consts: Dict[str, jax.Array], feed: jax.Array) -> list:
            memo: Dict[str, tuple] = {feed_name: (feed,)}

            def ref(tname: str):
                if tname.startswith("^"):  # control input — no value
                    return None
                name, _, idx = tname.partition(":")
                return outputs(name)[int(idx) if idx else 0]

            def outputs(name: str) -> tuple:
                if name not in memo:
                    memo[name] = self._eval_node(nodes[name], ref, consts)
                return memo[name]

            return [ref(t) for t in fetches]

        return fn

    def _static_value(self, tname: str) -> np.ndarray:
        """Shape-like operands (Reshape shapes, resize sizes, concat axes,
        pad amounts) must be compile-time constants — resolve them from the
        host-side Const store even when the graph runs under jit (where the
        weights dict is traced)."""
        name, _, _ = tname.partition(":")
        node = self.nodes[name]
        if node.op == "Const":
            return np.asarray(self.consts[name])
        if node.op in ("Identity", "CheckNumerics", "StopGradient"):
            return self._static_value(node.inputs[0])
        raise ValueError(
            f"'{tname}' feeds a shape operand but is not a constant "
            f"(op {node.op})")

    # -- op table -----------------------------------------------------------

    def _eval_node(self, node: Node, ref, consts) -> tuple:
        op = node.op
        ins = [ref(t) for t in node.inputs if not t.startswith("^")]
        data_inputs = [t for t in node.inputs if not t.startswith("^")]

        def static(i: int) -> np.ndarray:
            return self._static_value(data_inputs[i])

        if op == "Const":
            return (consts[node.name],)
        if op in ("Identity", "CheckNumerics", "StopGradient", "PreventGradient"):
            return (ins[0],)
        if op == "Placeholder":
            raise ValueError(
                f"placeholder '{node.name}' reached — feed it instead")
        if op == "Conv2D":
            sh, sw = node.attr("strides")[1:3]
            return (jax.lax.conv_general_dilated(
                ins[0], ins[1], window_strides=(int(sh), int(sw)),
                padding=_pad_str(node),
                dimension_numbers=("NHWC", "HWIO", "NHWC")),)
        if op == "BatchNormWithGlobalNormalization":
            t, m, v, beta, gamma = ins
            eps = node.attr("variance_epsilon", 1e-3)
            inv = jax.lax.rsqrt(v + eps)
            if node.attr("scale_after_normalization", False):
                inv = inv * gamma
            return ((t - m) * inv + beta,)
        if op == "Relu":
            return (jnp.maximum(ins[0], 0),)
        if op == "Relu6":
            return (jnp.clip(ins[0], 0, 6),)
        if op == "MaxPool":
            return (jax.lax.reduce_window(
                ins[0], -jnp.inf, jax.lax.max, tuple(node.attr("ksize")),
                tuple(node.attr("strides")), _pad_str(node)),)
        if op == "AvgPool":
            return (_avg_pool(ins[0], node.attr("ksize"),
                              node.attr("strides"), _pad_str(node)),)
        if op == "Concat":      # axis is input 0
            return (jnp.concatenate(ins[1:], axis=int(static(0))),)
        if op == "ConcatV2":    # axis is the last input
            return (jnp.concatenate(ins[:-1],
                                    axis=int(static(len(ins) - 1))),)
        if op == "Reshape":
            return (jnp.reshape(ins[0], [int(d) for d in static(1)]),)
        if op == "Squeeze":
            dims = node.attr("squeeze_dims") or node.attr("axis")
            if dims:
                return (jnp.squeeze(ins[0], axis=tuple(int(d)
                                                       for d in dims)),)
            return (jnp.squeeze(ins[0]),)
        if op == "ExpandDims":
            return (jnp.expand_dims(ins[0], int(static(1))),)
        if op == "MatMul":
            a = ins[0].T if node.attr("transpose_a", False) else ins[0]
            b = ins[1].T if node.attr("transpose_b", False) else ins[1]
            return (a @ b,)
        if op == "BiasAdd":
            return (ins[0] + ins[1],)
        if op in ("Add", "AddV2"):
            return (ins[0] + ins[1],)
        if op == "Sub":
            return (ins[0] - ins[1],)
        if op == "Mul":
            return (ins[0] * ins[1],)
        if op == "RealDiv":
            return (ins[0] / ins[1],)
        if op == "Maximum":
            return (jnp.maximum(ins[0], ins[1]),)
        if op == "Softmax":
            return (jax.nn.softmax(ins[0], axis=-1),)
        if op == "Cast":
            return (ins[0].astype(dtype_to_numpy(node.attr("DstT"))),)
        if op == "ResizeBilinear":
            out_h, out_w = [int(d) for d in static(1)]
            return (_resize_bilinear_legacy(ins[0], out_h, out_w),)
        if op == "Pad":
            return (jnp.pad(ins[0],
                            [(int(a), int(b)) for a, b in static(1)]),)
        if op == "Shape":
            return (jnp.asarray(ins[0].shape, jnp.int32),)
        raise NotImplementedError(
            f"GraphDef op '{op}' (node '{node.name}') not supported")


class FrozenInceptionClassifier:
    """The reference's exact scorer head over a local frozen GraphDef.

    ``images [B,H,W,3] float 0-255 -> probs [B,1008]`` via
    feed ExpandDims:0 → pool_3 → squeeze → @ softmax/logits/MatMul weight →
    softmax (``tflib/inception_score.py:92-94`` — note: NO logits bias).
    Plugs into ``metrics.inception.get_inception_score``.
    """

    FEED = "ExpandDims"
    POOL = "pool_3"
    LOGITS_MATMUL = "softmax/logits/MatMul"

    def __init__(self, graphdef: Union[str, bytes, List[Node]]):
        if isinstance(graphdef, str):
            nodes = load_graphdef(graphdef)
        elif isinstance(graphdef, bytes):
            nodes = parse_graphdef(graphdef)
        else:
            nodes = graphdef
        self.interp = GraphInterpreter(nodes)
        w_ref = self.interp.nodes[self.LOGITS_MATMUL].inputs[1]
        pool_fn = self.interp.make_fn(self.FEED, [self.POOL, w_ref])

        def fwd(consts, x):
            pool3, w = pool_fn(consts, x)
            logits = jnp.squeeze(pool3, axis=(1, 2)) @ w
            return jax.nn.softmax(logits, axis=-1)

        self._fn = jax.jit(fwd)
        # device-resident weight store, passed (not embedded) per call
        self._consts = {k: jnp.asarray(v)
                        for k, v in self.interp.consts.items()
                        if v is not None and v.dtype != object}

    def __call__(self, images: np.ndarray) -> np.ndarray:
        x = jnp.asarray(np.ascontiguousarray(images, dtype=np.float32))
        return np.asarray(self._fn(self._consts, x))
