"""Qwen2 LLM tower (GQA + SwiGLU + RMSNorm + M-RoPE) in functional JAX.

Behavioral contract: transformers Qwen2VLTextModel. Layer params are stacked
on a leading ``num_hidden_layers`` axis and run under ``lax.scan``; the KV
cache ([L, B, Hk, Smax, D], per-row offsets) rides in the scan carry and is
updated in place via layer-indexed dynamic_update_slice (donated by the
engine for zero-copy streaming).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

from livecc_tpu.core.config import TextConfig
from livecc_tpu.ops.attention import causal_mask, kv_cache_mask, mha, mha_bhsd
from livecc_tpu.ops.norms import rms_norm
from livecc_tpu.ops.pallas.attention import flash_decode, flash_prefill
from livecc_tpu.ops.quant import dense, vocab_kernel
from livecc_tpu.ops.rope import apply_mrope, mrope_cos_sin

Params = dict[str, Any]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Static-size KV cache in attention layout with PER-ROW offsets.

    Layout [L, B, Hk, Smax, D] keeps the sequence dimension second-to-last so
    Pallas kernels tile it directly (TPU blocks must tile the trailing two
    dims) and cache updates/attention reads need no transposes. ``offset``
    is [B]: every row (stream) sits at its own depth — the continuous-
    batching substrate (serve/).

    ``dtype=jnp.int8`` stores a QUANTIZED cache: symmetric per-(position,
    head) int8 with bf16 scales — halves KV HBM vs bf16, tripling stream
    capacity at a ~0.4% dequantization error (keys scale attention scores
    per column; values scale the probe weights). Scales are LANE-MAJOR
    ([L, B, Hk, 1, Smax]): positions ride the TPU lane dimension, so the
    Pallas kernels tile them as ordinary [1, bk] blocks — a [bk, 1] layout
    (positions in sublanes) is a degenerate tile that Mosaic compiles
    pathologically slowly (~350 s vs ~25 s for the pool program)."""

    k: jnp.ndarray         # [L, B, Hk, Smax, D]
    v: jnp.ndarray         # [L, B, Hk, Smax, D]
    offset: jnp.ndarray    # int32 [B]
    k_scale: Optional[jnp.ndarray] = None   # [L, B, Hk, 1, Smax] bf16 (int8 cache)
    v_scale: Optional[jnp.ndarray] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[-2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @staticmethod
    def zeros(cfg: TextConfig, batch: int, max_len: int, dtype=jnp.float32) -> "KVCache":
        shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
        offset = jnp.zeros((batch,), jnp.int32)
        if dtype == jnp.int8:
            sshape = shape[:-2] + (1, max_len)
            return KVCache(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8), offset,
                           jnp.zeros(sshape, jnp.bfloat16), jnp.zeros(sshape, jnp.bfloat16))
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), offset)


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., D] -> (int8 [..., D], bf16 scale [..., 1]); symmetric per row."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def init_text_params(cfg: TextConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    h, l, i = cfg.hidden_size, cfg.num_hidden_layers, cfg.intermediate_size
    kvh, hd = cfg.num_key_value_heads, cfg.head_dim
    ks = jax.random.split(key, 8)
    init = lambda k, shape, fan_in: (jax.random.normal(k, shape, jnp.float32) * fan_in**-0.5).astype(dtype)
    params = {
        "embed": {"weight": init(ks[0], (cfg.vocab_size, h), h)},
        "layers": {
            "input_ln": jnp.ones((l, h), dtype),
            "post_ln": jnp.ones((l, h), dtype),
            "q_kernel": init(ks[1], (l, h, h), h), "q_bias": jnp.zeros((l, h), dtype),
            "k_kernel": init(ks[2], (l, h, kvh * hd), h), "k_bias": jnp.zeros((l, kvh * hd), dtype),
            "v_kernel": init(ks[3], (l, h, kvh * hd), h), "v_bias": jnp.zeros((l, kvh * hd), dtype),
            "o_kernel": init(ks[4], (l, h, h), h),
            "gate_kernel": init(ks[5], (l, h, i), h),
            "up_kernel": init(ks[6], (l, h, i), h),
            "down_kernel": init(ks[7], (l, i, h), i),
        },
        "final_ln": jnp.ones((h,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": init(jax.random.fold_in(key, 99), (h, cfg.vocab_size), h)}
    return params


def _write_rows(cache_all: jnp.ndarray, li: jnp.ndarray, rows: jnp.ndarray,
                offsets: jnp.ndarray, pos_axis: int) -> jnp.ndarray:
    """Write per-row slabs at per-row depths into a [L, B, ...] cache.

    ``pos_axis`` names the cache axis that carries positions (3 for the
    [L, B, Hk, Smax, D] K/V layout, 4 for the lane-major [L, B, Hk, 1,
    Smax] scale layout). B == 1 takes the fast dynamic_update_slice path;
    B > 1 statically unrolls one update per row (XLA keeps these in place;
    a gather/scatter formulation was ~4x slower — continuous batching puts
    every row at its own depth)."""
    b = rows.shape[0]
    start = lambda row_idx, off: tuple(
        off if ax == pos_axis else idx
        for ax, idx in enumerate((li, row_idx, 0, 0, 0))
    )
    if b == 1:
        return lax.dynamic_update_slice(cache_all, rows[None], start(0, offsets[0]))
    for i in range(b):
        cache_all = lax.dynamic_update_slice(
            cache_all, rows[i][None, None], start(i, offsets[i])
        )
    return cache_all


def _write_kv(cache_all, li, kt, offsets):
    """[B, Hk, s, D] -> [L, B, Hk, Smax, D] cache at per-row depths."""
    return _write_rows(cache_all, li, kt, offsets, pos_axis=3)


def _write_scale(scale_all, li, st, offsets):
    """[B, Hk, 1, s] lane-major scales -> [L, B, Hk, 1, Smax] at per-row
    depths (positions live on the LAST axis)."""
    return _write_rows(scale_all, li, st, offsets, pos_axis=4)


def remat_policy(remat: bool | str):
    """Checkpoint policy for a truthy ``remat`` value — the ONE mapping
    shared by text_forward and the pipeline stage runner (a mismatch
    between decoder_block's name tags and the applied policy is the
    documented SIGABRT combination on the mesh path).

    remat=True -> full recompute. Named policies trade residual HBM for
    skipping matmul re-runs in the backward (the splash attention fwd
    always re-runs: its logsumexp residual lives inside the library
    custom_vjp and cannot be name-saved):
      "names"     — save qkv/o/down projection outputs (~83 MB/layer bf16
                    at seq 8k; skips ~1/3 of the recompute matmul FLOPs)
      "names_mlp" — additionally save the silu(gate)*up product
                    (+140 MB/layer; ~80% of recompute matmuls skipped)
      "dots"      — XLA's save-all-matmul-outputs policy (reproducibly
                    crashed the relay's remote compiler at the 8k training
                    shape; kept for directly-attached chips)
    Both named policies measured NEGATIVE on the v5e relay chip (the step
    is HBM-bound; PERF.md round 3) — True stays the default."""
    if remat == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if remat == "names":
        return jax.checkpoint_policies.save_only_these_names(
            "remat_qkv", "remat_o", "remat_down")
    if remat == "names_mlp":
        return jax.checkpoint_policies.save_only_these_names(
            "remat_qkv", "remat_o", "remat_down", "remat_mlp")
    return jax.checkpoint_policies.nothing_saveable


def decoder_block(x, layer, attend, *, cfg: TextConfig, cos, sin, remat=False):
    """One decoder layer: (pre-norm attention + residual, pre-norm SwiGLU
    MLP + residual). ``attend`` supplies the attention implementation
    (cached flash / train splash / XLA reference) — shared by text_forward
    and the pipeline-parallel stage runner (parallel/pipeline.py).

    ``remat``="names"/"names_mlp" tags the projection outputs for the
    named-save checkpoint policies; tags are inserted ONLY then (name_p
    markers perturb XLA's partitioner on the mesh path otherwise —
    observed SIGABRT in the CPU mesh trainer test under remat=True)."""
    b, s, h = x.shape
    hq, hk, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    if remat in ("names", "names_mlp"):
        from jax.ad_checkpoint import checkpoint_name as _tag
    else:
        _tag = lambda v, _n: v

    # dense() accepts plain or int8-quantized kernels (ops/quant.py)
    y = rms_norm(x, layer["input_ln"], cfg.rms_norm_eps)
    q = (dense(y, layer["q_kernel"]) + layer["q_bias"]).reshape(b, s, hq, hd)
    k = (dense(y, layer["k_kernel"]) + layer["k_bias"]).reshape(b, s, hk, hd)
    v = (dense(y, layer["v_kernel"]) + layer["v_bias"]).reshape(b, s, hk, hd)
    q = _tag(q, "remat_qkv")
    k = _tag(k, "remat_qkv")
    v = _tag(v, "remat_qkv")
    q, k = apply_mrope(q, k, cos, sin)
    attn = attend(q, k, v)
    x = x + _tag(dense(attn.reshape(b, s, h), layer["o_kernel"]), "remat_o")
    y = rms_norm(x, layer["post_ln"], cfg.rms_norm_eps)
    y = _tag(
        jax.nn.silu(dense(y, layer["gate_kernel"])) * dense(y, layer["up_kernel"]),
        "remat_mlp")
    y = _tag(dense(y, layer["down_kernel"]), "remat_down")
    return x + y


def text_forward(
    params: Params,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,        # [B, S, H]
    position_ids: jnp.ndarray,         # [3, B, S] int32
    cache: Optional[KVCache] = None,
    attention_mask: Optional[jnp.ndarray] = None,  # bool [B, S] (current tokens) or [B, Smax] (cache mode)
    kv_limit: Optional[jnp.ndarray] = None,        # int32 scalar: keys < kv_limit valid (cache mode)
    use_flash: bool = False,
    remat: bool = False,
    seq_shard: bool = False,
) -> tuple[jnp.ndarray, Optional[KVCache]]:
    """Returns (final hidden states [B, S, H], updated cache or None).

    ``use_flash`` routes cached attention through the Pallas flash kernels
    (ops/pallas/attention.py) — the TPU serving path; the XLA path is the
    CPU/test reference. ``kv_limit`` bounds valid cache keys (defaults to
    offset + S); in flash mode it replaces ``attention_mask``.
    ``remat`` checkpoints each layer (training): backward recomputes the
    layer forward instead of saving per-layer attention probabilities —
    without it a 28-layer 8k-token step stores an
    [L, B, Hq, S, S] residual (~90 GB, N9-equivalent of the reference's
    --gradient_checkpointing, scripts/pt_local.sh:21).

    ``seq_shard`` (training under a TP mesh): megatron-style SEQUENCE
    PARALLELISM expressed as GSPMD constraints — the residual stream is
    sharded [data, model, -] along the sequence axis at every layer
    boundary, so norms/elementwise regions hold 1/TP of the activations
    per chip and XLA replaces the TP all-reduces after o/down projections
    with reduce-scatters (+ all-gathers before qkv/gate). Numerics are
    identical to the unsharded step (tested); requires an active mesh
    with a "model" axis.
    """
    b, s, h = inputs_embeds.shape
    hq, hk, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    cos, sin = mrope_cos_sin(position_ids, hd, cfg.rope_theta, cfg.mrope_section)
    cos = cos.astype(inputs_embeds.dtype)
    sin = sin.astype(inputs_embeds.dtype)

    flash = use_flash and cache is not None
    flash_train = use_flash and cache is None   # Pallas fwd+bwd kernel
    mask = None
    if not flash and not flash_train:
        if cache is not None:
            mask = kv_cache_mask(s, cache.max_len, cache.offset)   # [B,1,S,Smax]
        else:
            mask = causal_mask(s)[None, None]                      # [1,1,S,S]
        if attention_mask is not None:
            if attention_mask.dtype == jnp.bool_:
                mask = mask & attention_mask[:, None, None, :]
            else:
                # int32 SEGMENT ids (sequence packing, train/data.py
                # collate_packed): attend only within the same segment;
                # id 0 = padding. The splash/flash training kernels get the
                # same ids natively (SegmentIds); this is the XLA/test path.
                seg = attention_mask
                pair = (seg[:, None, :, None] == seg[:, None, None, :]) & (
                    seg > 0)[:, None, None, :]
                mask = mask & pair
    if cache is not None and kv_limit is None:
        kv_limit = cache.offset + s

    attn_mlp = functools.partial(decoder_block, cfg=cfg, cos=cos, sin=sin,
                                 remat=remat)

    if cache is not None:
        # The whole cache rides in the scan CARRY and is updated with
        # layer-indexed dynamic_update_slice — XLA aliases this in place.
        # (Emitting per-layer caches as scan ys rewrote the full cache every
        # call: +10 ms per decode step at an 8 GB-class cache. See PERF.md.)
        quant = cache.quantized

        def block(carry, xs):
            x, ck_all, cv_all, scales = carry
            layer, li = xs

            def attend(q, k, v):
                kt = jnp.swapaxes(k, 1, 2)                    # [B, Hk, s, D]
                vt = jnp.swapaxes(v, 1, 2)
                if quant:
                    cks, cvs = scales
                    kt, ks = quantize_kv(kt)
                    vt, vs = quantize_kv(vt)
                    # [B, Hk, s, 1] -> lane-major [B, Hk, 1, s]
                    ks = jnp.swapaxes(ks, -1, -2)
                    vs = jnp.swapaxes(vs, -1, -2)
                    new_scales = (_write_scale(cks, li, ks, cache.offset),
                                  _write_scale(cvs, li, vs, cache.offset))
                else:
                    kt = kt.astype(ck_all.dtype)
                    vt = vt.astype(cv_all.dtype)
                    new_scales = scales
                nonlocal_k = _write_kv(ck_all, li, kt, cache.offset)
                nonlocal_v = _write_kv(cv_all, li, vt, cache.offset)
                qt = jnp.swapaxes(q, 1, 2)                    # [B, Hq, s, D]
                ksc = new_scales[0] if quant else None
                vsc = new_scales[1] if quant else None
                if flash and s == 1:
                    # layer-indexed 5D cache: no per-layer slice materialized
                    attn = flash_decode(qt, nonlocal_k, nonlocal_v, kv_limit, li,
                                        k_scale=ksc, v_scale=vsc)
                elif flash:
                    attn = flash_prefill(qt, nonlocal_k, nonlocal_v,
                                         cache.offset, kv_limit, li,
                                         k_scale=ksc, v_scale=vsc)
                else:
                    ck = lax.dynamic_index_in_dim(nonlocal_k, li, 0, keepdims=False)
                    cv = lax.dynamic_index_in_dim(nonlocal_v, li, 0, keepdims=False)
                    ck = ck.astype(q.dtype)
                    cv = cv.astype(q.dtype)
                    if quant:
                        # lane-major [B, Hk, 1, Smax] -> per-position [B, Hk, Smax, 1]
                        ck = ck * jnp.swapaxes(
                            lax.dynamic_index_in_dim(ksc, li, 0, keepdims=False), -1, -2
                        ).astype(q.dtype)
                        cv = cv * jnp.swapaxes(
                            lax.dynamic_index_in_dim(vsc, li, 0, keepdims=False), -1, -2
                        ).astype(q.dtype)
                    attn = mha_bhsd(qt, ck, cv, mask=mask)
                attend.updated = (nonlocal_k, nonlocal_v, new_scales)
                return jnp.swapaxes(attn, 1, 2)               # [B, s, Hq, D]

            x = attn_mlp(x, layer, attend)
            ck_all, cv_all, scales = attend.updated
            return (x, ck_all, cv_all, scales), None

        init_scales = (cache.k_scale, cache.v_scale) if quant else ()
        (x, new_k, new_v, new_scales), _ = lax.scan(
            block, (inputs_embeds, cache.k, cache.v, init_scales),
            (params["layers"], jnp.arange(cfg.num_hidden_layers)),
        )
        new_cache = KVCache(new_k, new_v, cache.offset + s,
                            *(new_scales if quant else (None, None)))
    else:
        if flash_train:
            from livecc_tpu.ops.attention import train_flash_attention
            attend = lambda q, k, v: train_flash_attention(q, k, v, attention_mask)
        else:
            attend = lambda q, k, v: mha(q, k, v, mask=mask)

        if seq_shard:
            from jax.sharding import PartitionSpec as _P

            from livecc_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

            _sp = lambda x: jax.lax.with_sharding_constraint(
                x, _P(DATA_AXIS, MODEL_AXIS, None))
        else:
            _sp = lambda x: x

        def block(x, layer):
            return _sp(attn_mlp(_sp(x), layer, attend)), None

        if remat:
            block = jax.checkpoint(block, policy=remat_policy(remat))
        x, _ = lax.scan(block, inputs_embeds, params["layers"])
        new_cache = None

    return rms_norm(x, params["final_ln"], cfg.rms_norm_eps), new_cache


def lm_logits(params: Params, cfg: TextConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """[B, S, H] -> [B, S, V] in float32."""
    if cfg.tie_word_embeddings:
        kernel, scale = vocab_kernel(params["embed"]["weight"], transpose=True)
    else:
        kernel, scale = vocab_kernel(params["lm_head"]["kernel"], transpose=False)
    if scale is not None:  # int8 kernel: the convert fuses into the matmul read
        kernel = kernel.astype(hidden.dtype)
    out = jnp.einsum("bsh,hv->bsv", hidden, kernel, preferred_element_type=jnp.float32)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    return out
