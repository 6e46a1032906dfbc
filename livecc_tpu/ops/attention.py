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

import functools

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


# Tile edge for the training flash kernels (q and k blocks, fwd and bwd).
# 512 measured 2.15x faster than the stock 128 default at the 8k training
# shape; overridable for experiments.
TRAIN_FLASH_BLOCK = 512

# Training-attention kernel choice: "splash" (native GQA — q heads grouped
# per KV head, no K/V repetition, fused dq/dkv backward) or "flash" (the
# stock kernel, GQA via KV-head repeat). Splash is the default on TPU;
# env TRAIN_ATTN overrides for experiments (tools/exp_mfu.py A/Bs them).
import os as _os

TRAIN_ATTN_IMPL = _os.environ.get("TRAIN_ATTN", "splash")


def train_flash_attention(
    q: jnp.ndarray,                 # [B, Sq, Hq, D]
    k: jnp.ndarray,                 # [B, Skv, Hk, D]
    v: jnp.ndarray,                 # [B, Skv, Hk, D]
    attention_mask: jnp.ndarray | None = None,  # bool [B, Skv]; True = valid
    causal: bool = True,
    impl: str | None = None,
) -> jnp.ndarray:
    """TRAINING attention on TPU: Pallas kernels with a backward pass — no
    [S, S] probabilities ever materialize, forward or backward.

    Default impl is **splash** (jax...tpu.splash_attention): GQA-native —
    queries are grouped per KV head so K/V are never head-repeated (the
    stock flash path multiplies K/V HBM traffic by Hq/Hk, 7x on the 7B, in
    forward AND backward; VERDICT r2 weak #1). Right-padding is isolated
    with segment ids (pad tokens attend only among themselves; their loss
    is label-masked).

    Same [B, S, H, D] layout/contract as ``mha`` (the CPU/test reference).
    """
    impl = TRAIN_ATTN_IMPL if impl is None else impl
    if impl == "splash":
        return _train_splash(q, k, v, attention_mask, causal)
    return _train_flash_stock(q, k, v, attention_mask, causal)


def _train_flash_stock(q, k, v, attention_mask=None, causal=True):
    """Stock flash kernel path (GQA via KV-head repeat) — kept as the
    fallback/experiment baseline."""
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


@functools.lru_cache(maxsize=64)
def _splash_kernel(groups: int, sq: int, skv: int, causal: bool, block: int,
                   interpret: bool):
    """Build (and cache) a splash MQA kernel for one (G, Sq, Skv) shape.

    Mask-info preprocessing is host-side numpy over the block grid (16x16
    blocks at 8k/512) — cheap, but worth caching per shape."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm,
    )

    if causal:
        head_mask = sm.CausalMask((sq, skv))
    else:
        head_mask = sm.FullMask((sq, skv))
    mask = sm.MultiHeadMask([head_mask] * groups)
    bq = min(block, sq)
    bkv = min(block, skv)
    sizes = sk.BlockSizes(
        block_q=bq, block_kv=bkv, block_kv_compute=bkv,
        block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
        use_fused_bwd_kernel=True,
    )
    return sk.make_splash_mqa_single_device(
        mask=mask, block_sizes=sizes, interpret=interpret
    )


def _train_splash(q, k, v, attention_mask=None, causal=True, interpret=False):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
    )

    b, sq, hq, d = q.shape
    hk, skv = k.shape[2], k.shape[1]
    g = hq // hk
    # kernel construction materializes mask-info arrays; inside a trace
    # (scan/remat body) they would be staged as tracers and leak out of the
    # lru_cache on the next trace — force eager construction
    with jax.ensure_compile_time_eval():
        kernel = _splash_kernel(g, sq, skv, causal, TRAIN_FLASH_BLOCK, interpret)
    # splash takes pre-scaled q; layout [Hkv, G, Sq, D] vs kv [Hkv, Skv, D]
    qs = (q * (d ** -0.5)).astype(q.dtype)
    qg = jnp.swapaxes(qs, 1, 2).reshape(b, hk, g, sq, d)
    kt = jnp.swapaxes(k, 1, 2)                     # [B, Hk, Skv, D]
    vt = jnp.swapaxes(v, 1, 2)
    if attention_mask is not None:
        ids = attention_mask.astype(jnp.int32)
        seg = sk.SegmentIds(q=ids, kv=ids)
        seg_axes = sk.SegmentIds(q=0, kv=0)
    else:
        seg = None
        seg_axes = None
    fn = jax.vmap(                                  # over batch
        jax.vmap(kernel, in_axes=(0, 0, 0, None)),  # over KV heads
        in_axes=(0, 0, 0, seg_axes),
    )
    out = fn(qg, kt, vt, seg)                       # [B, Hk, G, Sq, D]
    return jnp.swapaxes(out.reshape(b, hq, sq, d), 1, 2)


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
