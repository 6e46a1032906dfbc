"""ONNX graph -> JAX function: the op subset detector CNNs use.

Executes a ``tools.onnx_lite.Model`` as a jit-able JAX function in ONNX's
native NCHW layout. Covers the ops in insightface's SCRFD family
(buffalo_sc ``det_500m.onnx`` — reference face_detector.py:10): Conv (incl.
group/depthwise), BatchNormalization, Relu/LeakyRelu/PRelu/Sigmoid, Add,
Mul, Concat, MaxPool/AveragePool/GlobalAveragePool, Resize/Upsample
(nearest), Reshape, Transpose, Flatten, Gemm/MatMul, Softmax, Exp, Clip,
Identity, Slice, Shape/Gather/Unsqueeze (constant-folded).

Shape-dependent ops (Shape -> Gather -> ... -> Reshape chains) fold at
trace time from concrete shapes, which is exactly how detector graphs use
them.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from livecc_tpu.tools.onnx_lite import Model, Node


def _pair(v, default):
    if v is None:
        return (default, default)
    v = tuple(int(x) for x in v)
    return v if len(v) == 2 else (v[0], v[0])


def _conv_padding(node: Node, strides, kernel_hw, dilations=(1, 1)):
    auto = node.attr("auto_pad", b"NOTSET")
    auto = auto.decode() if isinstance(auto, bytes) else auto
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        return "SAME"
    pads = node.attr("pads")
    if not pads:
        return [(0, 0), (0, 0)]
    pads = tuple(int(p) for p in pads)   # [t, l, b, r]
    return [(pads[0], pads[2]), (pads[1], pads[3])]


def _op_conv(node: Node, x, w, b=None):
    group = int(node.attr("group", 1))
    strides = _pair(node.attr("strides"), 1)
    dil = _pair(node.attr("dilations"), 1)
    pad = _conv_padding(node, strides, w.shape[2:], dil)
    out = lax.conv_general_dilated(
        x, w, strides, pad, rhs_dilation=dil,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=group,
    )
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    return out


def _op_pool(node: Node, x, reducer, init, mean=False):
    k = _pair(node.attr("kernel_shape"), 1)
    strides = _pair(node.attr("strides"), 1)
    pad = _conv_padding(node, strides, k)
    if pad == "SAME":
        pad_cfg = "SAME"
    else:
        pad_cfg = [(0, 0), (0, 0)] + list(pad)
    out = lax.reduce_window(
        x, init, reducer, (1, 1) + k, (1, 1) + strides, pad_cfg,
    )
    if mean:
        ones = jnp.ones_like(x)
        cnt = lax.reduce_window(ones, 0.0, lax.add, (1, 1) + k, (1, 1) + strides, pad_cfg)
        out = out / cnt
    return out


def _const_int_list(v) -> list[int]:
    arr = np.asarray(v)
    return [int(x) for x in arr.reshape(-1)]


def build_fn(model: Model) -> Callable[..., list]:
    """Returns ``fn(*inputs) -> [outputs]`` executing the graph (jit-able)."""

    def fn(*inputs):
        env: dict[str, Any] = {}
        for name, arr in model.initializers.items():
            env[name] = arr
        if len(inputs) != len(model.inputs):
            raise ValueError(f"expected {len(model.inputs)} inputs, got {len(inputs)}")
        for name, value in zip(model.inputs, inputs):
            env[name] = value

        for node in model.nodes:
            args = [env[i] if i else None for i in node.inputs]
            op = node.op_type
            if op == "Conv":
                out = _op_conv(node, *args)
            elif op == "BatchNormalization":
                x, scale, bias, mean, var = args[:5]
                eps = float(node.attr("epsilon", 1e-5))
                inv = scale / np.sqrt(np.asarray(var, np.float64) + eps).astype(np.float32) \
                    if isinstance(var, np.ndarray) else scale * lax.rsqrt(var + eps)
                out = x * inv.reshape(1, -1, 1, 1) + (
                    bias - mean * inv).reshape(1, -1, 1, 1)
            elif op == "Relu":
                out = jax.nn.relu(args[0])
            elif op == "LeakyRelu":
                out = jax.nn.leaky_relu(args[0], float(node.attr("alpha", 0.01)))
            elif op == "PRelu":
                slope = args[1]
                s = jnp.asarray(slope).reshape(1, -1, 1, 1) if np.asarray(slope).ndim in (1, 3) \
                    else jnp.asarray(slope)
                x = args[0]
                out = jnp.where(x >= 0, x, x * s)
            elif op == "Sigmoid":
                out = jax.nn.sigmoid(args[0])
            elif op == "Softmax":
                out = jax.nn.softmax(args[0], axis=int(node.attr("axis", -1)))
            elif op == "Exp":
                out = jnp.exp(args[0])
            elif op == "Clip":
                lo = args[1] if len(args) > 1 and args[1] is not None else node.attr("min", -np.inf)
                hi = args[2] if len(args) > 2 and args[2] is not None else node.attr("max", np.inf)
                out = jnp.clip(args[0], jnp.asarray(lo), jnp.asarray(hi))
            elif op == "Add":
                out = args[0] + args[1]
            elif op == "Sub":
                out = args[0] - args[1]
            elif op == "Mul":
                out = args[0] * args[1]
            elif op == "Div":
                out = args[0] / args[1]
            elif op == "Concat":
                out = jnp.concatenate([a for a in args], axis=int(node.attr("axis", 0)))
            elif op == "MaxPool":
                out = _op_pool(node, args[0], lax.max, -jnp.inf)
            elif op == "AveragePool":
                out = _op_pool(node, args[0], lax.add, 0.0, mean=True)
            elif op == "GlobalAveragePool":
                out = jnp.mean(args[0], axis=(2, 3), keepdims=True)
            elif op in ("Resize", "Upsample"):
                x = args[0]
                mode = node.attr("mode", b"nearest")
                mode = mode.decode() if isinstance(mode, bytes) else mode
                if op == "Resize":
                    # inputs: X, roi, scales, sizes (opset 11+)
                    sizes = args[3] if len(args) > 3 and args[3] is not None else None
                    scales = args[2] if len(args) > 2 and args[2] is not None else None
                else:
                    sizes, scales = None, args[1]
                if sizes is not None and np.asarray(sizes).size:
                    shape = tuple(_const_int_list(sizes))
                else:
                    sc = np.asarray(scales).reshape(-1)
                    shape = tuple(int(round(d * s)) for d, s in zip(x.shape, sc))
                method = {"nearest": "nearest", "linear": "bilinear",
                          "cubic": "bicubic"}[mode]
                out = jax.image.resize(x, shape, method)
            elif op == "Reshape":
                shape = _const_int_list(args[1])
                x = args[0]
                # resolve a single -1 against the concrete input size
                out = jnp.reshape(x, tuple(shape))
            elif op == "Flatten":
                ax = int(node.attr("axis", 1))
                x = args[0]
                lead = int(np.prod(x.shape[:ax])) if ax else 1
                out = jnp.reshape(x, (lead, -1))
            elif op == "Transpose":
                perm = node.attr("perm")
                out = jnp.transpose(args[0], axes=tuple(perm) if perm else None)
            elif op == "Gemm":
                a, b = args[0], args[1]
                if int(node.attr("transA", 0)):
                    a = a.T
                if int(node.attr("transB", 0)):
                    b = b.T
                out = float(node.attr("alpha", 1.0)) * (a @ b)
                if len(args) > 2 and args[2] is not None:
                    out = out + float(node.attr("beta", 1.0)) * args[2]
            elif op == "MatMul":
                out = args[0] @ args[1]
            elif op == "Shape":
                out = np.asarray(jnp.shape(args[0]), np.int64)
            elif op == "Gather":
                ax = int(node.attr("axis", 0))
                out = jnp.take(jnp.asarray(args[0]), jnp.asarray(args[1]), axis=ax) \
                    if not isinstance(args[0], np.ndarray) \
                    else np.take(args[0], np.asarray(args[1]), axis=ax)
            elif op == "Unsqueeze":
                axes = node.attr("axes") or _const_int_list(args[1])
                x = args[0]
                for ax in sorted(axes):
                    x = (np.expand_dims(x, ax) if isinstance(x, np.ndarray)
                         else jnp.expand_dims(x, ax))
                out = x
            elif op == "Squeeze":
                axes = node.attr("axes") or (
                    _const_int_list(args[1]) if len(args) > 1 and args[1] is not None else None)
                out = jnp.squeeze(args[0], axis=tuple(axes) if axes else None)
            elif op == "Slice":
                x = args[0]
                starts = _const_int_list(args[1]) if len(args) > 1 else node.attr("starts")
                ends = _const_int_list(args[2]) if len(args) > 2 else node.attr("ends")
                axes = (_const_int_list(args[3]) if len(args) > 3 and args[3] is not None
                        else node.attr("axes") or list(range(len(starts))))
                steps = (_const_int_list(args[4]) if len(args) > 4 and args[4] is not None
                         else node.attr("steps"))
                if steps and any(st != 1 for st in steps):
                    raise NotImplementedError(f"Slice steps={steps} (only 1 supported)")
                idx = [slice(None)] * jnp.ndim(x)
                for s, e, a in zip(starts, ends, axes):
                    idx[a] = slice(s, None if e >= 2**31 - 1 else e)
                out = x[tuple(idx)]
            elif op == "Identity":
                out = args[0]
            elif op == "Constant":
                out = node.attr("value")
            else:
                raise NotImplementedError(f"ONNX op {op} (node {node.name!r})")
            outs = out if isinstance(out, tuple) else (out,)
            for name, value in zip(node.outputs, outs):
                if name:
                    env[name] = value
        return [env[o] for o in model.outputs]

    return fn
