"""Bucketed prefill + fused decode for streaming generation.

Replaces the reference's HF ``generate(past_key_values=...)`` per-chunk loop
(demo/infer.py:165-174) with two jit programs over static shape buckets:

  * ``prefill``      — run a (padded) chunk of prompt tokens through the model,
    writing KV at the cache tail; returns logits at the last valid token.
  * ``decode_chunk`` — a fused ``lax.scan`` that samples up to
    ``max_new_tokens`` tokens fully on device (greedy / temperature / top-k /
    top-p), with HF-parity repetition penalty and the streaming
    ThresholdLogitsProcessor (demo/infer.py:10-23).

Semantics pinned to the reference stack:
  * Positions: the first prefill uses full 3D M-RoPE positions
    (get_rope_index); every later chunk/decode step uses flat
    ``offset + rope_delta`` positions on all three axes — this mirrors
    Qwen2VLModel.forward's cached-``rope_deltas`` branch, which is what
    the reference's generation_patch.py:34-35 routes streaming through.
  * The final sampled token of each chunk is NOT forwarded (its KV never
    enters the cache) — mirrors ``past_ids = sequences[:, :-1]``
    (demo/infer.py:174): history continues from all but the last token.
  * Repetition penalty applies over prompt+generated presence
    (HF RepetitionPenaltyLogitsProcessor semantics).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.models.qwen2_vl.model import VisionInputs, forward
from livecc_tpu.models.qwen2_vl.text import KVCache

Params = dict[str, Any]
_NEG_INF = jnp.float32(jnp.finfo(jnp.float32).min)


@dataclasses.dataclass(frozen=True)
class GenerationParams:
    """Static generation settings (one jit specialization per distinct value)."""

    max_new_tokens: int = 16
    eos_token_id: int = 151645            # <|im_end|>
    pad_token_id: int = 151643
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0                        # 0 = disabled
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    # ThresholdLogitsProcessor (reference demo/infer.py:10-23); -1 disables.
    streaming_eos_token_id: int = -1
    streaming_threshold_base: float = -1.0
    streaming_threshold_step: float = 0.0


def apply_repetition_penalty(logits: jnp.ndarray, presence: jnp.ndarray, penalty: float) -> jnp.ndarray:
    """HF semantics: seen tokens' scores divided (if >0) or multiplied (if <0)."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(presence, penalized, logits)


def adjust_logits(logits: jnp.ndarray, counts: jnp.ndarray,
                  gen: "GenerationParams", step_index) -> jnp.ndarray:
    """Repetition penalty + streaming ThresholdLogitsProcessor
    (demo/infer.py:10-23) — the ONE implementation shared by the fused
    decode loop and the speculative verify paths
    (engine/speculative.py:_accept_scan), so their greedy parity holds by
    construction. ``step_index`` is the count of tokens already emitted
    this chunk: a scalar (fused decode) or per-row [B] (verify windows)."""
    logits = apply_repetition_penalty(logits, counts > 0, gen.repetition_penalty)
    if gen.streaming_threshold_base >= 0 and gen.streaming_eos_token_id >= 0:
        threshold = (gen.streaming_threshold_base
                     + gen.streaming_threshold_step * step_index)
        prob = jax.nn.softmax(logits, axis=-1)[:, gen.streaming_eos_token_id]
        low = prob <= threshold
        logits = logits.at[:, gen.streaming_eos_token_id].set(
            jnp.where(low, _NEG_INF, logits[:, gen.streaming_eos_token_id])
        )
    return logits


def select_token(
    logits: jnp.ndarray,                   # [B, V] fp32
    gen: GenerationParams,
    key: Optional[jax.Array],
) -> jnp.ndarray:
    """Greedy or (temperature, top-k, top-p) sampling. Returns [B] int32."""
    if not gen.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(gen.temperature, 1e-6)
    if gen.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -gen.top_k][:, None]
        logits = jnp.where(logits < kth, _NEG_INF, logits)
    if gen.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < gen.top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, _NEG_INF, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def presence_from_ids(ids: jnp.ndarray, valid_len: jnp.ndarray, vocab_size: int) -> jnp.ndarray:
    """[B, S] ids -> [B, V] bool presence (only the first valid_len count)."""
    b, s = ids.shape
    valid = jnp.arange(s)[None, :] < valid_len
    onehot = jax.nn.one_hot(ids, vocab_size, dtype=jnp.bool_)
    return jnp.any(onehot & valid[..., None], axis=1)


def update_counts(
    counts: jnp.ndarray,       # [B, V] int32 token-occurrence counts
    ids: jnp.ndarray,          # [B, Sb]
    valid_len: jnp.ndarray,    # int32 scalar or [B]
    remove_token: jnp.ndarray, # int32 scalar or [B]; -1 = nothing to remove
) -> jnp.ndarray:
    """Incremental repetition-penalty presence: add this chunk's tokens,
    drop the previous chunk's final sampled token (it never entered the
    history — reference past_ids = sequences[:, :-1] semantics).
    Device-resident so streaming never rebuilds vocab-sized one-hots with
    growing (recompiling) history shapes."""
    b, sb = ids.shape
    valid_len = jnp.broadcast_to(jnp.asarray(valid_len), (b,))
    valid = (jnp.arange(sb)[None, :] < valid_len[:, None]).astype(jnp.int32)
    counts = counts.at[jnp.arange(b)[:, None], ids].add(valid)
    remove_token = jnp.broadcast_to(jnp.asarray(remove_token), (b,))
    rm = jnp.clip(remove_token, 0, counts.shape[1] - 1)
    dec = jnp.where(remove_token >= 0, 1, 0)
    return counts.at[jnp.arange(b), rm].add(-dec)


@functools.partial(
    jax.jit, static_argnames=("cfg", "use_flash"), donate_argnames=("cache", "counts")
)
def prefill(
    params: Params,
    cfg: ModelConfig,
    ids: jnp.ndarray,            # [B, Sb] (right-padded to bucket)
    position_ids: jnp.ndarray,   # [3, B, Sb]
    valid_len: jnp.ndarray,      # int32 scalar or [B] — real tokens per row
    cache: KVCache,
    vision: Optional[VisionInputs] = None,
    counts: Optional[jnp.ndarray] = None,       # [B, V] presence counts
    remove_token: jnp.ndarray | None = None,    # int32 scalar or [B], -1 = none
    use_flash: bool = False,
) -> tuple[jnp.ndarray, KVCache, Optional[jnp.ndarray]]:
    """Write a chunk into the cache; return fp32 logits at the last valid
    token of each row. Rows may sit at different cache depths (continuous
    batching); a row with valid_len 0 is a no-op (offset unchanged, nothing
    attended by later chunks)."""
    b = ids.shape[0]
    valid_len = jnp.broadcast_to(jnp.asarray(valid_len, jnp.int32), (b,))
    kv_limit = cache.offset + valid_len                              # [B]
    key_valid = None
    if not use_flash:
        key_valid = jnp.arange(cache.max_len)[None, :] < kv_limit[:, None]
    hidden, new_cache = forward(
        params, cfg, ids, position_ids, vision=vision, cache=cache,
        attention_mask=key_valid, kv_limit=kv_limit, use_flash=use_flash,
        compute_logits=False,
    )
    # Project ONLY the last valid position per row: full-bucket logits would
    # materialize [B, S, 152k] fp32 (20 GB at a 32k long-video bucket).
    from livecc_tpu.models.qwen2_vl.text import lm_logits
    last_hidden = hidden[jnp.arange(b), jnp.maximum(valid_len - 1, 0)]  # [B, H]
    last = lm_logits(params["text"], cfg.text, last_hidden[:, None, :])[:, 0]  # [B, V]
    new_cache = dataclasses.replace(new_cache, offset=cache.offset + valid_len)
    if counts is not None:
        counts = update_counts(counts, ids, valid_len,
                               jnp.int32(-1) if remove_token is None else remove_token)
    return last, new_cache, counts


@functools.partial(
    jax.jit, static_argnames=("cfg", "gen", "use_flash"), donate_argnames=("cache", "counts")
)
def decode_chunk(
    params: Params,
    cfg: ModelConfig,
    gen: GenerationParams,
    logits0: jnp.ndarray,        # [B, V] fp32 logits at the last prompt token
    cache: KVCache,
    counts: jnp.ndarray,         # [B, V] int32 — token counts seen so far
    rope_delta: jnp.ndarray,     # int32 [B, 1]
    rng: jax.Array,
    use_flash: bool = False,
    active: jnp.ndarray | None = None,   # bool scalar; False = no-op slot
) -> tuple[jnp.ndarray, jnp.ndarray, KVCache, jnp.ndarray]:
    """Fused on-device decode of up to max_new_tokens.

    Returns (tokens [B, max_new] — pad after stop, n_generated [B],
    cache — offset advanced by the number of forwarded tokens, counts).
    The last sampled token is sampled but never forwarded (reference
    ``past_ids`` semantics); its KV is absent from the cache.
    """
    assert gen.max_new_tokens >= 1, "decode_chunk requires max_new_tokens >= 1"
    b = logits0.shape[0]

    def sample(logits, counts, stopped, key, i):
        """Shared per-step sampling: penalty, threshold, token, counts."""
        logits = adjust_logits(logits, counts, gen, i)
        token = select_token(logits, gen, key)                      # [B]
        token_out = jnp.where(stopped, gen.pad_token_id, token)
        counts = counts.at[jnp.arange(counts.shape[0]), token].add(
            jnp.where(stopped, 0, 1)
        )
        return token, token_out, counts

    def step(carry, i):
        logits, cache, stopped, counts, key = carry
        key, sub = jax.random.split(key)
        token, token_out, counts = sample(logits, counts, stopped, sub, i)
        now_stopped = stopped | (token == gen.eos_token_id)
        # Forward the sampled token unless generation has ended. When ended we
        # still execute the forward (static graph) but freeze that row's
        # offset, so the write lands on the free slot and is overwritten.
        pos = continuation_pos(cache.offset, rope_delta, b)
        step_logits, new_cache = forward(
            params, cfg, token[:, None], pos, cache=cache,
            kv_limit=cache.offset + 1, use_flash=use_flash, compute_logits=True,
        )
        advance = jnp.where(now_stopped, 0, 1)                      # [B]
        new_cache = dataclasses.replace(new_cache, offset=cache.offset + advance)
        return (step_logits[:, -1], new_cache, now_stopped, counts, key), (token_out, ~stopped)

    stopped0 = jnp.zeros((b,), jnp.bool_) if active is None else jnp.broadcast_to(~active, (b,))
    # Only the first max_new_tokens - 1 sampled tokens are ever forwarded
    # (the final one's KV never enters history — reference past_ids =
    # sequences[:, :-1], demo/infer.py:174); the last token comes from a
    # sample-only epilogue. The loop EXITS EARLY once every row has
    # stopped: real commentary chunks are typically a few words + ' ...'
    # (threshold processor), so production ticks skip most of the
    # max_new_tokens-1 forwards — output-identical to the full loop
    # (stopped rows only ever emit pad).
    n_steps = gen.max_new_tokens - 1
    tokens_buf = jnp.full((b, gen.max_new_tokens), gen.pad_token_id, jnp.int32)
    emitted_buf = jnp.zeros((b, gen.max_new_tokens), jnp.bool_)

    def cond(carry):
        i, logits, cache, stopped, counts, key, tokens_buf, emitted_buf = carry
        return (i < n_steps) & ~jnp.all(stopped)

    def body(carry):
        i, logits, cache, stopped, counts, key, tokens_buf, emitted_buf = carry
        (logits, cache, now_stopped, counts, key), (token_out, emit) = step(
            (logits, cache, stopped, counts, key), i
        )
        tokens_buf = lax.dynamic_update_slice(tokens_buf, token_out[:, None], (0, i))
        emitted_buf = lax.dynamic_update_slice(emitted_buf, emit[:, None], (0, i))
        return (i + 1, logits, cache, now_stopped, counts, key, tokens_buf, emitted_buf)

    (_, logits_f, cache, stopped_f, counts, key_f, tokens_buf, emitted_buf) = lax.while_loop(
        cond, body,
        (jnp.int32(0), logits0, cache, stopped0, counts, rng, tokens_buf, emitted_buf),
    )
    _, sub = jax.random.split(key_f)
    _, last_out, counts = sample(logits_f, counts, stopped_f, sub,
                                 jnp.int32(n_steps))
    # The epilogue token lands right after each row's emitted prefix (all
    # rows stop at the same iteration count or earlier; emitted prefixes
    # are contiguous, pads follow) — placing it at the LAST column kept
    # the old fixed-length layout; with early exit it must follow the
    # prefix, i.e. at the first un-emitted column of still-active rows.
    n_prefix = jnp.sum(emitted_buf, axis=-1).astype(jnp.int32)       # [B]
    rows = jnp.arange(b)
    tokens = tokens_buf.at[rows, n_prefix].set(
        jnp.where(stopped_f, tokens_buf[rows, n_prefix], last_out)
    )
    emitted_last = ~stopped_f
    n_gen = n_prefix + emitted_last.astype(jnp.int32)
    return tokens, n_gen, cache, counts


def continuation_pos(offset: jnp.ndarray, rope_delta: jnp.ndarray, batch: int) -> jnp.ndarray:
    """[3, B, 1] flat positions for a single decode step (per-row offsets)."""
    pos = (offset[:, None] + rope_delta).astype(jnp.int32)          # [B, 1]
    return jnp.broadcast_to(pos[None], (3, batch, 1))
