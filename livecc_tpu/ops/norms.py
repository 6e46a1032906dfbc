"""Normalization ops (XLA-fused reference implementations).

RMSNorm matches Qwen2RMSNorm semantics: variance in float32, scale applied in
the input dtype. A fused Pallas kernel (N3-equivalent of the reference's Liger
RMSNorm) plugs in behind the same signature in ops/pallas/.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * lax.rsqrt(var + eps)
    return (weight * xf.astype(dtype)).astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * (var + eps) ** -0.5
    return (xf.astype(dtype) * weight + bias).astype(dtype)
