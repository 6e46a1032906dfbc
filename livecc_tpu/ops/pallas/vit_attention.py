"""Pallas TPU attention for the ViT's per-temporal-group (segment) blocks.

N2-equivalent of the reference's flash-attn-2-in-the-ViT (the reference
monkey-patches flash attention into Qwen2VisionTransformer everywhere:
train.py imports and demo/infer.py load with attn_implementation
"flash_attention_2"). This was the last hot path on XLA ``mha`` — measured
at 0.63x the calibrated MXU ceiling (PERF.md r4 MFU table) because the
[groups, heads, g, g] score tensor round-trips HBM twice per layer.

Design (TPU-first, not a flash-attn translation):
  * Qwen2-VL ViT attention is block-diagonal over temporal groups of
    g = grid_h * grid_w patches (cu_seqlens semantics). Uniform groups are
    the universal single-video layout, so the kernel treats GROUPS as the
    batch/grid dimension — no masks, no cu_seqlens scan.
  * g is small (hundreds — a 2-frame 448p chunk is ~784, the training clips
    ~544), so one (group, head) block fits VMEM whole: grid (NG, H), one
    fused qk^T -> softmax -> pv per program. Scores live ONLY in VMEM/
    registers; HBM sees q, k, v, o exactly once. No online-softmax
    bookkeeping is needed at these sizes — that machinery only pays off
    when a row's keys exceed VMEM (the KV-cache kernels in attention.py).
  * head_dim is 80 (non-128 lane width): blocks keep the true [g, 80]
    shape and Mosaic pads lanes internally; padding to 128 in HBM would
    cost +60% qkv traffic for zero MXU benefit (the contraction is
    80-deep either way).
  * fp32 scores/softmax, model-dtype (bf16) probs for the pv matmul with
    fp32 accumulation — the exact contract of ops.attention.mha, so the
    XLA path stays the numerical reference.

The public entry is differentiable: a custom VJP recomputes the backward
through the XLA reference implementation (same math), so an UNFROZEN ViT
still trains; the default LiveCC recipe freezes the tower (train/step.py)
and never takes that path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One (group, head) block must hold q/k/v [g, 80] + fp32 scores [g, g] in
# VMEM (~16 MB). g=1024: 4 MB scores + <1 MB operands, comfortable with
# double-buffered inputs; beyond that the caller falls back to the XLA
# path (unseen in practice — a group is one frame pair's patch grid).
MAX_GROUP = 1024


def _vit_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]                              # [g, D]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                    # [g, g] fp32, VMEM-only
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _vit_attention_bhsd(q, k, v, *, interpret: bool = False):
    """[NG, H, g, D] -> [NG, H, g, D], full attention within each (NG, H)."""
    ng, h, g, d = q.shape
    spec = pl.BlockSpec((1, 1, g, d), lambda i, j: (i, j, 0, 0))
    return pl.pallas_call(
        functools.partial(_vit_attn_kernel, scale=d ** -0.5),
        grid=(ng, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


def _forward(q, k, v, interpret):
    # [NG, g, H, D] -> BHSD for contiguous per-(group, head) DMA blocks;
    # XLA fuses these transposes into the producing/consuming elementwise
    # ops where it can, and even materialized they are linear in qkv —
    # the quadratic score traffic this kernel deletes dominated.
    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    out = _vit_attention_bhsd(qt, kt, vt, interpret=interpret)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def vit_group_attention(q, k, v, interpret: bool = False):
    """Full (bidirectional) attention within uniform ViT temporal groups.

    q, k, v: [NG, g, H, D] — NG groups of g patches each. Returns the same
    layout. Requires g <= MAX_GROUP (caller falls back to the XLA path).
    """
    return _forward(q, k, v, interpret)


def _vjp_fwd(q, k, v, interpret):
    return _forward(q, k, v, interpret), (q, k, v)


def _vjp_bwd(interpret, res, grad):
    # Backward through the XLA reference (identical math: fp32 softmax,
    # model-dtype probs). Only reachable when the ViT is unfrozen, which
    # the LiveCC recipe never does — correctness over speed here.
    from livecc_tpu.ops.attention import mha

    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: mha(q_, k_, v_), q, k, v)
    return vjp(grad)


vit_group_attention.defvjp(_vjp_fwd, _vjp_bwd)
