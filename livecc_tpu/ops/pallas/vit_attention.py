"""Pallas TPU attention for the ViT's per-temporal-group (segment) blocks.

N2-equivalent of the reference's flash-attn-2-in-the-ViT (the reference
monkey-patches flash attention into Qwen2VisionTransformer everywhere:
train.py imports it and demo/infer.py loads with attn_implementation
"flash_attention_2"). This was the last hot path on XLA ``mha`` — measured
at 0.63x the calibrated MXU ceiling (PERF.md r4 MFU table) because the
[groups, heads, g, g] score tensor round-trips HBM twice per layer.

Design (TPU-first; iterated on-chip, r5):
  * Qwen2-VL ViT attention is block-diagonal over temporal groups of
    g = grid_h * grid_w patches (cu_seqlens semantics). Uniform groups are
    the universal single-video layout, so the kernel treats GROUPS as the
    grid dimension — no masks, no cu_seqlens scan.
  * g is small (544 at the training shape, 880 at the 720p serving
    budget), so a whole group fits VMEM: one fused qk^T -> softmax -> pv
    per (group, head-block) program. Scores live ONLY in VMEM; HBM sees
    q, k, v, o exactly once. No online-softmax bookkeeping — that
    machinery only pays when a row's keys exceed VMEM (the KV-cache
    kernels in attention.py).
  * A first cut ran one program per (group, head): 384 programs/layer of
    ~47 MFLOP each — per-program overhead dominated (measured ~38 ms of
    attention against ~5 ms of matmul at the train shape). Heads are now
    blocked HEAD_BLOCK=8 per program (48 programs/layer, ~0.4-2 GFLOP
    each) with the head loop unrolled in-kernel. 8 is also the smallest
    legal sublane block: Mosaic requires the second-to-last block dim be
    divisible by 8 (or equal the array dim).
  * Blocks are head-major [NG, H, g, D] (one swapaxes per operand in the
    wrapper): Mosaic can squeeze LEADING block axes (ref[0, h] -> [g, D])
    but an interior singleton (ref[0, :, h, :]) is an unsupported layout
    cast — and the [g, hb*D] strided alternative DMAs 640 B runs. The
    transposes are linear-size; the deleted quadratic score traffic
    dominated.
  * head_dim is 80 (non-128 lane width): blocks keep the true [g, 80]
    shape and Mosaic pads lanes internally; padding to 128 in HBM would
    cost +60% qkv traffic for zero MXU benefit (the contraction is
    80-deep either way).
  * fp32 scores/softmax, model-dtype (bf16) probs for the pv matmul with
    fp32 accumulation — the exact contract of ops.attention.mha, so the
    XLA path stays the numerical reference.

Measured honestly (v5e, train shape N=13056 g=544, 16-layer fwd): the
kernel matches or slightly beats the r4 bf16-scores XLA fast path
(~0.119-0.129 s vs 0.124-0.132 s across sessions) while keeping FULL fp32
scores — the r4 path paid bf16 score rounding for its speed. The bigger
r4 attribution lesson: a noattn ablation puts the ViT's non-attention
matmuls at ~0.9x the calibrated ceiling, and the attention residual is
dominated by the VPU softmax (g^2 exps/head/layer), which no memory
layout removes — the "ViT at 0.63x" gap was score traffic + softmax VPU
time, not MXU underutilization. At the 720p serving shape (g=880) the
deleted per-layer score tensor is 25 MB/stream — the serve-tick win is
larger there (bench_serving measures it end-to-end).

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

# One program holds q/k/v head-blocks [g, HEAD_BLOCK, 80] plus one fp32
# [g, g] score buffer in VMEM (~16 MB). g=1024: 4.2 MB scores + ~4 MB
# double-buffered operands — comfortable; beyond that the caller falls
# back to the XLA path (unseen in practice — a group is one frame pair's
# patch grid under the pixel budget).
MAX_GROUP = 1024

HEAD_BLOCK = 8


def _vit_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, hb: int):
    # fori_loop (NOT a static unroll) over the head block: an unrolled loop
    # lets the scheduler keep every head's [g, g] fp32 score buffer live to
    # pipeline across heads — 8 x ~2 MB blew the 16 MB VMEM stack at the
    # train shape. Serializing holds one head's buffers at a time.
    def body(h, _):
        q = q_ref[0, h]                          # [g, D]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                # [g, g] fp32, VMEM-only
        # softmax normalization deferred past the pv matmul: dividing the
        # [g, D] output instead of the [g, g] probabilities drops one full
        # [g, g] VPU pass — the kernel is VPU-bound (exp over g^2 elements
        # per head), not MXU- or HBM-bound, at these shapes (measured).
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = (o / l).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hb, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _vit_attention_call(q, k, v, *, interpret: bool = False):
    """[NG, g, H, D] -> [NG, g, H, D], full attention within each group."""
    ng, g, h, d = q.shape
    hb = HEAD_BLOCK if h % HEAD_BLOCK == 0 else h
    spec = pl.BlockSpec((1, hb, g, d), lambda i, j: (i, j, 0, 0))
    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))  # [NG, H, g, D]
    out = pl.pallas_call(
        functools.partial(_vit_attn_kernel, scale=d ** -0.5, hb=hb),
        grid=(ng, h // hb),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        interpret=interpret,
    )(qt, kt, vt)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def vit_group_attention(q, k, v, interpret: bool = False):
    """Full (bidirectional) attention within uniform ViT temporal groups.

    q, k, v: [NG, g, H, D] — NG groups of g patches each. Returns the same
    layout. Requires g <= MAX_GROUP (caller falls back to the XLA path).
    """
    return _vit_attention_call(q, k, v, interpret=interpret)


def _vjp_fwd(q, k, v, interpret):
    return _vit_attention_call(q, k, v, interpret=interpret), (q, k, v)


def _vjp_bwd(interpret, res, grad):
    # Backward through the XLA reference (identical math: fp32 softmax,
    # model-dtype probs). Only reachable when the ViT is unfrozen, which
    # the LiveCC recipe never does — correctness over speed here.
    from livecc_tpu.ops.attention import mha

    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: mha(q_, k_, v_), q, k, v)
    return vjp(grad)


vit_group_attention.defvjp(_vjp_fwd, _vjp_bwd)
