"""Speculative decoding: draft-token verification in one forward pass.

Decode at small batch is weight-HBM-bound (~17 ms/step at 2B bf16 — see
PERF.md "Decode step analysis"): every generated token re-reads the full
weights for one token of work. Verifying K proposed tokens costs ONE such
pass (the K-token matmuls are negligible next to the weight read), so when
a draft source predicts the model's own output well, tokens/dispatch rises
by the acceptance length. Commentary is repetitive by nature (team names,
score phrases), which is exactly where n-gram lookup drafts shine.

Beyond the reference: the reference stack (HF ``generate``) has no
speculative path. This implementation is *lossless for greedy decoding*:
the emitted tokens are bit-identical to ``decode_chunk``'s for ANY draft
source (tested property, tests/test_speculative.py) because acceptance
compares the target model's own selection against the draft, position by
position, with the exact penalty/threshold semantics of
engine/generation.py:
  * HF repetition penalty over prompt+generated presence, updated
    incrementally within the verify window;
  * ThresholdLogitsProcessor with per-row step indices
    (reference demo/infer.py:10-23);
  * the chunk's final emitted token is never forwarded into the cache
    (reference ``past_ids = sequences[:, :-1]``, demo/infer.py:174).

KV bookkeeping: the verify forward writes all W window tokens' KV at the
row's offset; the offset then advances only past the ACCEPTED prefix, so
rejected drafts' KV sits beyond every later kv_limit and is overwritten by
the next window — the same frontier discipline the serving pool uses for
stopped rows (serve/scheduler.py).

Sampling mode uses per-position ``fold_in`` keys: self-consistent, but not
bit-identical to ``decode_chunk``'s sequential key chain (greedy — the
serving default — is the parity mode).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.engine.generation import (
    GenerationParams,
    _NEG_INF,
    apply_repetition_penalty,
    select_token,
)
from livecc_tpu.models.qwen2_vl.model import forward
from livecc_tpu.models.qwen2_vl.text import KVCache, lm_logits

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SpecConfig:
    """Speculative decoding settings (host-side; K is a jit shape)."""

    k_draft: int = 8          # drafted tokens per verify window
    max_ngram: int = 3        # longest suffix n-gram tried by the lookup


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "gen", "use_flash", "first"),
    donate_argnames=("cache", "counts"),
)
def verify_window(
    params: Params,
    cfg: ModelConfig,
    gen: GenerationParams,
    tokens_in: jnp.ndarray,       # [B, W] int32 — (committed +) draft tokens
    logits_in: jnp.ndarray,       # [B, V] fp32 — frontier logits (used iff first)
    cache: KVCache,
    counts: jnp.ndarray,          # [B, V] int32 presence counts
    rope_delta: jnp.ndarray,      # [B, 1] int32
    step_idx: jnp.ndarray,        # [B] int32 — tokens emitted so far this chunk
    stopped: jnp.ndarray,         # [B] bool — row already ended its chunk
    rng: jax.Array,
    use_flash: bool = False,
    first: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, KVCache, jnp.ndarray, jnp.ndarray]:
    """One speculative window: forward W tokens, accept the matching prefix.

    ``first=True``: ``tokens_in`` is the draft alone (W == K) and the
    candidate chain starts from ``logits_in`` (the prefill's frontier
    logits). Otherwise ``tokens_in[:, 0]`` is the previous window's bonus
    token — already emitted, pre-accepted, forwarded here — and the chain
    starts from the logits after it (W == K + 1).

    Returns ``(tokens [B, K+1] — emitted, pad after; n_emitted [B];
    cache — offset advanced past accepted history; counts; stopped)``.
    Per row, the last emitted token of the window is never forwarded
    (it is the next window's committed token, or the chunk's final token).
    """
    b, w = tokens_in.shape
    k_draft = w if first else w - 1

    pos = (cache.offset[:, None] + rope_delta
           + jnp.arange(w)[None, :]).astype(jnp.int32)           # [B, W]... rope
    pos = jnp.broadcast_to(pos[None], (3, b, w))
    kv_limit = cache.offset + w
    key_valid = None
    if not use_flash:
        key_valid = jnp.arange(cache.max_len)[None, :] < kv_limit[:, None]
    hidden, new_cache = forward(
        params, cfg, tokens_in, pos, cache=cache,
        attention_mask=key_valid, kv_limit=kv_limit, use_flash=use_flash,
        compute_logits=False,
    )
    logits_all = lm_logits(params["text"], cfg.text, hidden)     # [B, W, V] fp32

    # Candidate-source chain: srcs[:, j] predicts emitted token j.
    if first:
        srcs = jnp.concatenate([logits_in[:, None], logits_all], axis=1)
        draft = tokens_in
    else:
        srcs = logits_all
        draft = tokens_in[:, 1:]
    # srcs [B, K+1, V]; draft padded to K+1 (slot K never matches: j < K).
    draft = jnp.concatenate(
        [draft, jnp.full((b, 1), -1, jnp.int32)], axis=1)        # [B, K+1]

    def body(carry, xs):
        counts, accepting, stopped, emitted = carry
        logits, d_j, j = xs                                      # [B,V], [B], scalar
        logits = apply_repetition_penalty(logits, counts > 0, gen.repetition_penalty)
        if gen.streaming_threshold_base >= 0 and gen.streaming_eos_token_id >= 0:
            thr = (gen.streaming_threshold_base
                   + gen.streaming_threshold_step * (step_idx + j))  # [B]
            prob = jax.nn.softmax(logits, axis=-1)[:, gen.streaming_eos_token_id]
            low = prob <= thr
            logits = logits.at[:, gen.streaming_eos_token_id].set(
                jnp.where(low, _NEG_INF, logits[:, gen.streaming_eos_token_id])
            )
        cand = select_token(logits, gen, jax.random.fold_in(rng, j))  # [B]
        emit = accepting & ~stopped
        token_out = jnp.where(emit, cand, gen.pad_token_id)
        counts = counts.at[jnp.arange(b), cand].add(emit.astype(jnp.int32))
        is_eos = cand == gen.eos_token_id
        may_continue = (step_idx + j + 1) < gen.max_new_tokens
        accepting = emit & (j < k_draft) & (cand == d_j) & ~is_eos & may_continue
        stopped = stopped | (emit & is_eos)
        emitted = emitted + emit.astype(jnp.int32)
        return (counts, accepting, stopped, emitted), token_out

    xs = (
        jnp.moveaxis(srcs, 1, 0),                                # [K+1, B, V]
        jnp.moveaxis(draft, 1, 0),                               # [K+1, B]
        jnp.arange(k_draft + 1),
    )
    (counts, _, stopped_f, emitted), tokens_out = jax.lax.scan(
        body, (counts, jnp.ones((b,), bool), stopped, jnp.zeros((b,), jnp.int32)), xs
    )
    tokens_out = jnp.moveaxis(tokens_out, 0, 1)                  # [B, K+1]

    # Forwarded history this window: the committed token (non-first) plus
    # every emitted token except the window's last (the pending bonus /
    # chunk-final / eos token — its KV stays beyond the frontier).
    if first:
        advance = jnp.maximum(emitted - 1, 0)
    else:
        advance = jnp.where(emitted > 0, emitted, 0)
    new_cache = dataclasses.replace(new_cache, offset=cache.offset + advance)
    return tokens_out, emitted, new_cache, counts, stopped_f


class NGramDraftSource:
    """Prompt-lookup drafting (draft-model-free): match the longest suffix
    n-gram of the context earlier in the context and propose the tokens
    that followed it. Zero model cost; a miss costs nothing extra — the
    verify window is weight-bound, so unaccepted drafts ride along free."""

    def __init__(self, max_ngram: int = 3, k: int = 8):
        self.max_ngram = max_ngram
        self.k = k

    def propose(self, ids: list[int], pad_token_id: int = 0) -> list[int]:
        k = self.k
        n_ids = len(ids)
        for n in range(min(self.max_ngram, max(n_ids - 1, 0)), 0, -1):
            pat = ids[-n:]
            # rightmost earlier occurrence (recent phrasing wins)
            for i in range(n_ids - n - 1, -1, -1):
                if ids[i:i + n] == pat:
                    out = ids[i + n:i + n + k]
                    if out:
                        return out + [pad_token_id] * (k - len(out))
        return [pad_token_id] * k


def speculative_decode_chunk(
    engine,                        # LiveCCEngine (duck-typed to avoid a cycle)
    state,                         # StreamState — cache/counts mutated in place
    logits0: jnp.ndarray,          # [1, V] — the chunk prefill's frontier logits
    gen: GenerationParams,
    spec: SpecConfig,
    context_ids: list[int],
    draft_source: Optional[NGramDraftSource] = None,
) -> list[int]:
    """Host loop replacing ``decode_chunk`` for one solo-stream chunk.

    Each window syncs the emitted tokens to the host (they are needed for
    the next n-gram proposal — and for the product's streamed text anyway)
    and dispatches the next verify window. Returns the emitted token ids;
    the caller applies the usual past_ids/length/last_token bookkeeping.
    """
    draft_source = draft_source or NGramDraftSource(spec.max_ngram, spec.k_draft)
    ctx = list(context_ids)
    generated: list[int] = []
    engine._rng, sub = jax.random.split(engine._rng)
    first = True
    committed: int | None = None
    stopped = jnp.zeros((1,), bool)
    while len(generated) < gen.max_new_tokens:
        draft = draft_source.propose(ctx, gen.pad_token_id)
        if first:
            tokens_in = np.asarray([draft], np.int32)
        else:
            tokens_in = np.asarray([[committed] + draft], np.int32)
        rng_w = jax.random.fold_in(sub, len(generated))
        tokens, n_emit, state.cache, state.counts, stopped = verify_window(
            engine.params, engine.cfg, gen, jnp.asarray(tokens_in), logits0,
            state.cache, state.counts,
            jnp.asarray([[state.rope_delta]], jnp.int32),
            jnp.asarray([len(generated)], jnp.int32), stopped, rng_w,
            use_flash=engine.use_flash, first=first,
        )
        n = int(np.asarray(n_emit)[0])
        emitted = np.asarray(tokens)[0, :n].tolist()
        generated.extend(emitted)
        ctx.extend(emitted)
        engine.metrics.record("spec_accepted_per_window", float(max(n - 1, 0)))
        if n == 0 or bool(np.asarray(stopped)[0]) or len(generated) >= gen.max_new_tokens:
            break
        committed = emitted[-1]
        first = False
    return generated
