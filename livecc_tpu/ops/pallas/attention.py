"""Pallas TPU flash attention for the streaming KV-cache path.

N2-equivalent of the reference's flash-attn 2 CUDA dependency (SURVEY.md
§2b): online-softmax attention that never materializes [Sq, Skv] scores.

Layout: BHSD — q [B, Hq, Sq, D]; cache k/v [B, Hk, Smax, D], or the whole
stacked-layer cache [L, B, Hk, Smax, D] plus a ``layer_index`` scalar (the
scanned-transformer hot path: the index map selects the layer so no
per-layer slice is ever materialized).

Both kernels are **batch-native with per-row scalars**: ``offset`` /
``kv_limit`` may be [B] arrays (continuous batching — every stream sits at
its own cache depth). Scalars arrive via PrefetchScalarGridSpec and are read
per batch-grid-index in the index maps, so each row's DMA is clamped to its
own causal/valid frontier.

  * ``flash_prefill`` — chunk queries appended at ``offset``; causal over
    the cache. Grid (B, Hq, nq, nkv), kv innermost, running (m, l, acc)
    in VMEM scratch; beyond-frontier kv blocks are skipped (no FLOPs, no
    HBM traffic via index-map clamping).
  * ``flash_decode`` — single-token step; q-heads grouped per KV head
    ([G, D] x [bk, D] contractions), grid (B, Hk, nkv).

fp32 softmax/accumulation, model-dtype inputs/outputs — matching the XLA
reference path (ops/attention.mha_bhsd) to fp32 tolerance; parity is tested
in interpreter mode on CPU and exercised compiled on TPU by bench.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _as_row_scalars(x, b: int) -> jnp.ndarray:
    """Scalar or [B] array -> int32 [B]."""
    x = jnp.asarray(x, jnp.int32)
    return jnp.broadcast_to(x, (b,))


# ---------------------------------------------------------------------------
# prefill
# ---------------------------------------------------------------------------

def _prefill_kernel(s_ref, q_ref, k_ref, v_ref, *rest,
                    bq: int, bk: int, scale: float, nkv: int, layered: bool,
                    quantized: bool):
    if quantized:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    bi = pl.program_id(0)
    iq = pl.program_id(2)
    j = pl.program_id(3)
    offset = s_ref[0, bi]
    kv_limit = s_ref[1, bi]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_hi = offset + iq * bq + bq - 1            # last global q position in block
    block_needed = (j * bk <= q_hi) & (j * bk < kv_limit)

    @pl.when(block_needed)
    def _compute():
        q = q_ref[0, 0]                          # [bq, D]
        k = k_ref[0, 0, 0] if layered else k_ref[0, 0]      # [bk, D]
        v = v_ref[0, 0, 0] if layered else v_ref[0, 0]
        if quantized:
            k = k.astype(q.dtype)                # int8 -> model dtype; scores
            v = v.astype(jnp.float32)            # rescale per KEY column below
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                # [bq, bk]
        if quantized:
            # lane-major scales: block [.., 1, bk] -> [bk] along lanes
            ks = (ks_ref[0, 0, 0, 0] if layered else ks_ref[0, 0, 0]).astype(jnp.float32)
            s = s * ks.reshape(1, bk)            # per-key dequant of scores
        qpos = offset + iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        allowed = (kpos <= qpos) & (kpos < kv_limit)
        s = jnp.where(allowed, s, NEG_INF)
        m_prev = m_scr[:]                        # [bq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                   # [bq, bk]
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if quantized:
            vs = (vs_ref[0, 0, 0, 0] if layered else vs_ref[0, 0, 0]).astype(jnp.float32)
            p = p * vs.reshape(1, bk)            # fold v's dequant into probes
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new

    @pl.when(j == nkv - 1)
    def _finalize():
        l = l_scr[:]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0, 0] = (acc_scr[:] / safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "bk", "interpret"))
def flash_prefill(
    q: jnp.ndarray,            # [B, Hq, Sq, D]
    k: jnp.ndarray,            # [B, Hk, Smax, D] or [L, B, Hk, Smax, D] (layer_index)
    v: jnp.ndarray,
    offset: jnp.ndarray,       # int32 scalar or [B] — queries start here (per row)
    kv_limit: jnp.ndarray,     # int32 scalar or [B] — keys < kv_limit valid (per row)
    layer_index: jnp.ndarray | None = None,  # int32 scalar into a 5D cache
    k_scale: jnp.ndarray | None = None,      # int8 cache: [..., 1, Smax] lane-major scales
    v_scale: jnp.ndarray | None = None,
    *,
    bq: int = 128,
    bk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    b, hq, sq, d = q.shape
    layered = k.ndim == 5
    quantized = k_scale is not None
    hk, smax = k.shape[-3], k.shape[-2]
    g = hq // hk
    bq = min(bq, sq)
    bk = min(bk, smax)
    nq = pl.cdiv(sq, bq)
    nkv = pl.cdiv(smax, bk)
    scale = d ** -0.5
    li = jnp.zeros((b,), jnp.int32) if layer_index is None else _as_row_scalars(layer_index, b)
    scalars = jnp.stack([_as_row_scalars(offset, b), _as_row_scalars(kv_limit, b), li])

    def q_map(bi, h, iq, j, s_ref):
        return (bi, h, iq, 0)

    def _clamped_j(bi, iq, j, s_ref):
        # Clamp to the last block this (row, iq, j) sweep can need: avoids HBM
        # traffic for the unused cache tail and beyond-causal blocks.
        q_hi = s_ref[0, bi] + iq * bq + bq - 1
        last_needed = jnp.minimum(
            jnp.maximum(jnp.minimum(q_hi, s_ref[1, bi] - 1), 0) // bk, nkv - 1
        )
        return jnp.minimum(j, last_needed)

    def kv_map(bi, h, iq, j, s_ref):
        idx = (bi, h // g, _clamped_j(bi, iq, j, s_ref), 0)
        return (s_ref[2, bi],) + idx if layered else idx

    def sc_map(bi, h, iq, j, s_ref):
        # Same frontier clamp as kv_map, but positions ride the LAST axis.
        idx = (bi, h // g, 0, _clamped_j(bi, iq, j, s_ref))
        return (s_ref[2, bi],) + idx if layered else idx

    kv_block = (1, 1, 1, bk, d) if layered else (1, 1, bk, d)
    sc_block = (1, 1, 1, 1, bk) if layered else (1, 1, 1, bk)
    in_specs = [
        pl.BlockSpec((1, 1, bq, d), q_map),
        pl.BlockSpec(kv_block, kv_map),
        pl.BlockSpec(kv_block, kv_map),
    ]
    operands = [q, k, v]
    if quantized:
        in_specs += [pl.BlockSpec(sc_block, sc_map), pl.BlockSpec(sc_block, sc_map)]
        operands += [k_scale, v_scale]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hq, nq, nkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d), q_map),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_prefill_kernel, bq=bq, bk=bk, scale=scale, nkv=nkv,
                               layered=layered, quantized=quantized)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(scalars, *operands)


# ---------------------------------------------------------------------------
# decode (single query token)
# ---------------------------------------------------------------------------

def _decode_kernel(s_ref, q_ref, k_ref, v_ref, *rest,
                   bk: int, scale: float, nkv: int, layered: bool,
                   quantized: bool):
    if quantized:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    bi = pl.program_id(0)
    j = pl.program_id(2)
    kv_limit = s_ref[0, bi]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(j * bk < kv_limit)
    def _compute():
        q = q_ref[0, 0]                          # [G, D]
        k = k_ref[0, 0, 0] if layered else k_ref[0, 0]      # [bk, D]
        v = v_ref[0, 0, 0] if layered else v_ref[0, 0]
        if quantized:
            k = k.astype(q.dtype)
            v = v.astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                # [G, bk]
        if quantized:
            ks = (ks_ref[0, 0, 0, 0] if layered else ks_ref[0, 0, 0]).astype(jnp.float32)
            s = s * ks.reshape(1, bk)
        kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kpos < kv_limit, s, NEG_INF)
        m_prev = m_scr[:]                        # [G, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if quantized:
            vs = (vs_ref[0, 0, 0, 0] if layered else vs_ref[0, 0, 0]).astype(jnp.float32)
            p = p * vs.reshape(1, bk)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new

    @pl.when(j == nkv - 1)
    def _finalize():
        l = l_scr[:]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0, 0] = (acc_scr[:] / safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bk", "interpret"))
def flash_decode(
    q: jnp.ndarray,            # [B, Hq, 1, D]
    k: jnp.ndarray,            # [B, Hk, Smax, D] or [L, B, Hk, Smax, D] (layer_index)
    v: jnp.ndarray,
    kv_limit: jnp.ndarray,     # int32 scalar or [B] — keys < kv_limit valid (per row)
    layer_index: jnp.ndarray | None = None,  # int32 scalar into a 5D cache
    k_scale: jnp.ndarray | None = None,      # int8 cache: [..., 1, Smax] lane-major scales
    v_scale: jnp.ndarray | None = None,
    *,
    bk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    b, hq, sq, d = q.shape
    assert sq == 1
    layered = k.ndim == 5
    quantized = k_scale is not None
    hk, smax = k.shape[-3], k.shape[-2]
    g = hq // hk
    bk = min(bk, smax)
    nkv = pl.cdiv(smax, bk)
    scale = d ** -0.5
    # [B, Hq, 1, D] -> [B, Hk, G, D]: group q heads by their KV head.
    qg = q.reshape(b, hk, g, d)
    li = jnp.zeros((b,), jnp.int32) if layer_index is None else _as_row_scalars(layer_index, b)
    scalars = jnp.stack([_as_row_scalars(kv_limit, b), li])

    def q_map(bi, h, j, s_ref):
        return (bi, h, 0, 0)

    def _clamped_j(bi, j, s_ref):
        last_needed = jnp.minimum(jnp.maximum(s_ref[0, bi] - 1, 0) // bk, nkv - 1)
        return jnp.minimum(j, last_needed)

    def kv_map(bi, h, j, s_ref):
        idx = (bi, h, _clamped_j(bi, j, s_ref), 0)
        return (s_ref[1, bi],) + idx if layered else idx

    def sc_map(bi, h, j, s_ref):
        idx = (bi, h, 0, _clamped_j(bi, j, s_ref))
        return (s_ref[1, bi],) + idx if layered else idx

    kv_block = (1, 1, 1, bk, d) if layered else (1, 1, bk, d)
    sc_block = (1, 1, 1, 1, bk) if layered else (1, 1, 1, bk)
    in_specs = [
        pl.BlockSpec((1, 1, g, d), q_map),
        pl.BlockSpec(kv_block, kv_map),
        pl.BlockSpec(kv_block, kv_map),
    ]
    operands = [qg, k, v]
    if quantized:
        in_specs += [pl.BlockSpec(sc_block, sc_map), pl.BlockSpec(sc_block, sc_map)]
        operands += [k_scale, v_scale]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hk, nkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, g, d), q_map),
        scratch_shapes=[
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_decode_kernel, bk=bk, scale=scale, nkv=nkv,
                               layered=layered, quantized=quantized)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qg.shape, q.dtype),
        interpret=interpret,
    )(scalars, *operands)
    return out.reshape(b, hq, 1, d)
