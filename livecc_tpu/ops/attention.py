"""Attention ops: XLA reference implementation + dispatch to Pallas kernels.

Replaces the reference's flash-attn 2 CUDA dependency (SURVEY.md §2b N2):
  * ``mha`` — full multi-head attention with optional boolean mask and GQA,
    fp32 softmax (matches HF eager/flash numerics at the op contract level).
  * causal masks with KV-cache semantics (`kv_cache_mask`) for decode.
  * block-diagonal masks (`segment_mask`) for the ViT's per-temporal-group
    attention (cu_seqlens semantics of Qwen2VisionTransformer.forward).

On TPU the same signatures are served by Pallas flash-attention kernels
(ops/pallas/flash_attention.py); this XLA path is the CPU/test fallback and
the numerical reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


# Tile edge for the training flash kernel (q and k blocks, fwd and bwd).
# 512 measured 2.15x faster than the stock 128 default at the 8k training
# shape; overridable for experiments.
TRAIN_FLASH_BLOCK = 512


def train_flash_attention(
    q: jnp.ndarray,                 # [B, Sq, Hq, D]
    k: jnp.ndarray,                 # [B, Skv, Hk, D]
    v: jnp.ndarray,                 # [B, Skv, Hk, D]
    attention_mask: jnp.ndarray | None = None,  # bool [B, Skv]; True = valid
    causal: bool = True,
) -> jnp.ndarray:
    """TRAINING attention on TPU: Pallas flash kernel with a backward pass
    (jax.experimental.pallas.ops.tpu.flash_attention) — no [S, S]
    probabilities ever materialize, forward or backward. GQA via KV-head
    repetition; right-padding is isolated with segment ids (pad tokens
    attend only among themselves; their loss is label-masked).

    Same [B, S, H, D] layout/contract as ``mha`` (the CPU/test reference).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention as _flash,
    )

    b, sq, hq, d = q.shape
    hk = k.shape[2]
    if hq != hk:
        rep = hq // hk
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    seg = None
    if attention_mask is not None:
        ids = attention_mask.astype(jnp.int32)
        seg = SegmentIds(q=ids, kv=ids)
    # 512-blocks throughout: 2.15x faster fwd+bwd than the stock all-128
    # default at [1, 12, 8192, 128] on v5e (measured in-session, PERF.md
    # round 2b) — bigger tiles amortize the online-softmax bookkeeping.
    bq = min(TRAIN_FLASH_BLOCK, sq)
    bk = min(TRAIN_FLASH_BLOCK, k.shape[1])
    blocks = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    out = _flash(qt, kt, vt, segment_ids=seg, causal=causal, sm_scale=d ** -0.5,
                 block_sizes=blocks)
    return jnp.swapaxes(out, 1, 2)


def mha(
    q: jnp.ndarray,                 # [B, Sq, Hq, D]
    k: jnp.ndarray,                 # [B, Skv, Hk, D]
    v: jnp.ndarray,                 # [B, Skv, Hk, D]
    mask: jnp.ndarray | None = None,  # bool, broadcastable to [B, Hq, Sq, Skv]; True = attend
    scale: float | None = None,
) -> jnp.ndarray:
    """Reference attention: fp32 logits+softmax, GQA via head repetition."""
    b, sq, hq, d = q.shape
    hk = k.shape[2]
    if hq != hk:
        rep = hq // hk
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = d ** -0.5 if scale is None else scale
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def mha_bhsd(
    q: jnp.ndarray,                 # [B, Hq, Sq, D]
    k: jnp.ndarray,                 # [B, Hk, Skv, D]
    v: jnp.ndarray,                 # [B, Hk, Skv, D]
    mask: jnp.ndarray | None = None,  # bool, broadcastable to [B, Hq, Sq, Skv]
    scale: float | None = None,
) -> jnp.ndarray:
    """BHSD-layout reference attention (cache-friendly layout on TPU)."""
    b, hq, sq, d = q.shape
    hk = k.shape[1]
    if hq != hk:
        rep = hq // hk
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    scale = d ** -0.5 if scale is None else scale
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def causal_mask(sq: int, skv: int | None = None) -> jnp.ndarray:
    """[Sq, Skv] lower-triangular mask (queries aligned to the cache tail)."""
    skv = sq if skv is None else skv
    qi = jnp.arange(sq)[:, None] + (skv - sq)
    ki = jnp.arange(skv)[None, :]
    return ki <= qi


def kv_cache_mask(sq: int, cache_len: int, offset: jnp.ndarray) -> jnp.ndarray:
    """Causal mask for queries appended at ``offset`` into a static cache.

    Query i (global position offset+i) may attend cache slots [0, offset+i].
    ``offset`` may be a scalar (returns bool [Sq, cache_len]) or a [B] array
    of per-row cache depths (returns bool [B, 1, Sq, cache_len]).
    """
    offset = jnp.asarray(offset)
    kpos = jnp.arange(cache_len)
    if offset.ndim == 0:
        qpos = offset + jnp.arange(sq)[:, None]
        return kpos[None, :] <= qpos
    qpos = offset[:, None] + jnp.arange(sq)[None, :]          # [B, Sq]
    return kpos[None, None, None, :] <= qpos[:, None, :, None]


def segment_mask(seg_ids: jnp.ndarray) -> jnp.ndarray:
    """Block-diagonal [N, N] mask: attend only within the same segment.

    ViT semantics: cu_seqlens from repeat_interleave(h*w, t).cumsum — each
    temporal patch group of each video is one segment.
    """
    return seg_ids[:, None] == seg_ids[None, :]
