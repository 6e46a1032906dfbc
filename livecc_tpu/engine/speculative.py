"""Speculative decoding: draft-token verification in one forward pass.

Decode at small batch is weight-HBM-bound (~6-17 ms/step at 2B bf16 — see
PERF.md "Decode step analysis"): every generated token re-reads the full
weights for one token of work. Verifying K proposed tokens costs ONE such
pass (measured 8.4 ms for a K=7 window vs 6.3 ms for one decode step, same
cache depth), so when a draft source predicts the model's own output well,
tokens per weight-read rise by the acceptance length. Commentary is
repetitive by nature (team names, score phrases) — exactly where n-gram
lookup drafts shine.

Two drivers over one verification core:

  * ``decode_chunk_lookahead`` — the TPU-native path: ONE dispatch per
    chunk; n-gram drafting, verification, acceptance and the token-history
    update all run on device inside a ``lax.while_loop``. The token history
    is an id-shadow of the KV cache (``hist[b, p]`` = token id at cache
    position p), so per-row offsets, growth and sink+window compaction
    carry over unchanged (engine/compact.py:compact_token_row).
  * ``speculative_decode_chunk`` — host-drafted loop with a pluggable
    ``DraftSource`` (n-gram lookup built in; a distilled draft model plugs
    in the same way). One dispatch + one host sync per window: on a
    relay-attached chip each sync costs ~60 ms (PERF.md probe), so this
    path exists for pluggability, not speed, in this environment.

Beyond the reference: the reference stack (HF ``generate``) has no
speculative path. Both drivers are *lossless for greedy decoding*: emitted
tokens are bit-identical to ``decode_chunk``'s for ANY draft source
(tests/test_speculative.py) because acceptance compares the target model's
own selection against the draft position by position with the exact
penalty/threshold semantics of engine/generation.py:
  * HF repetition penalty over prompt+generated presence, updated
    incrementally within the verify window;
  * ThresholdLogitsProcessor with per-row step indices
    (reference demo/infer.py:10-23);
  * the chunk's final emitted token is never forwarded into the cache
    (reference ``past_ids = sequences[:, :-1]``, demo/infer.py:174).

KV bookkeeping: a verify forward writes all W window tokens' KV at the
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
from jax import lax

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.engine.generation import (
    GenerationParams,
    adjust_logits,
    select_token,
)
from livecc_tpu.models.qwen2_vl.model import forward
from livecc_tpu.models.qwen2_vl.text import KVCache, lm_logits

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SpecConfig:
    """Speculative decoding settings (static; part of the jit key).

    ``fused=True`` (the production default) runs the WHOLE chunk as one
    dispatch via ``decode_chunk_lookahead``. ``fused=False`` is the
    host-drafted window loop (pluggable draft sources, one host sync per
    window — ~60 ms each through the axon relay).
    """

    k_draft: int = 8          # drafted tokens per verify window
    max_ngram: int = 3        # longest suffix n-gram tried by the lookup
    fused: bool = True
    # Host-side adaptive controller (SpecController below, shared by the
    # solo engine and the serving pool): EMA-compares MEASURED wall per
    # emitted token between lookahead and plain dispatches and runs the
    # faster mode, probing the slower one every probe_every dispatches.
    # (A fixed cost-model threshold was tried and falsified: at B=8 the
    # pool verify window costs ~3.5 decode steps, not the B=1-derived
    # 1.45x — PERF.md r4 "Pool lookahead A/B".)
    adaptive: bool = True
    ema: float = 0.3          # EMA smoothing for the per-mode cost estimates
    probe_every: int = 16


class SpecController:
    """Adaptive lookahead switch driven by MEASURED wall per emitted token.

    A cost-model switch ("lookahead wins when tokens/window > the window's
    fixed premium") is wrong at pool batch: the r4 interleaved A/B at B=8
    measured lookahead 20% SLOWER than plain decode at 2.7-3.2 accepted
    tokens/window (PERF.md r4 "Pool lookahead A/B") — the pool-wide verify
    window costs ~3.5 decode steps there, not the B=1-derived 1.45x. So
    this controller assumes nothing: it EMA-tracks realized
    seconds-per-emitted-token for EACH mode from the dispatch walls the
    host already observes (the async collection sync in the pool, the
    chunk-token fetch in the solo engine — zero added round-trips), runs
    whichever mode measures faster, and probes the slower mode once every
    ``probe_every`` dispatches so regime shifts (acceptance or chip state)
    flip the decision. Bootstrap order: lookahead first, then one plain
    dispatch, then data rules. A 3x-of-EMA clip keeps one relay stall from
    poisoning an estimate."""

    def __init__(self, spec):
        self.spec = spec
        self.spt: dict[bool, float | None] = {True: None, False: None}
        self.ema: float | None = None        # accepted tokens/window (metric)
        self._dispatch_n = 0
        self.force: bool | None = None       # experiment hook: pin the decision
        self.last_choice: bool = True

    @property
    def enabled(self) -> bool:
        """Current steady-state decision (ignoring probe ticks)."""
        s, p = self.spt[True], self.spt[False]
        if s is None or p is None:
            return True
        return s < p

    def use_spec(self) -> bool:
        if self.spec is None:
            return False
        if self.force is not None:
            self.last_choice = self.force
            return self.force
        if not self.spec.adaptive:
            self.last_choice = True
            return True
        self._dispatch_n += 1
        s, p = self.spt[True], self.spt[False]
        if s is None:
            choice = True                    # bootstrap: measure lookahead
        elif p is None:
            choice = False                   # then measure plain once
        elif self._dispatch_n % self.spec.probe_every == 0:
            choice = not (s < p)             # keep the loser's estimate fresh
        else:
            choice = s < p
        self.last_choice = choice
        return choice

    def observe_wall(self, used_spec: bool, wall_s: float, tokens: int) -> None:
        """Feed one dispatch's realized wall + emitted tokens."""
        if self.spec is None or not self.spec.adaptive or tokens <= 0 or wall_s <= 0:
            return
        v = wall_s / tokens
        cur = self.spt[used_spec]
        if cur is not None:
            v = min(v, 3.0 * cur)            # relay-stall clip
        a = self.spec.ema
        self.spt[used_spec] = v if cur is None else (1 - a) * cur + a * v

    def observe(self, tokens_total: int, n_rows: int, n_iters: int) -> None:
        """Acceptance diagnostics (tokens/window EMA — reporting only)."""
        if self.spec is None or n_rows == 0 or n_iters <= 0:
            return
        tpw = tokens_total / (n_rows * n_iters)
        a = self.spec.ema
        self.ema = tpw if self.ema is None else (1 - a) * self.ema + a * tpw


def _accept_scan(gen: GenerationParams, k_draft: int, srcs: jnp.ndarray,
                 draft: jnp.ndarray, counts: jnp.ndarray, step_idx: jnp.ndarray,
                 stopped: jnp.ndarray, rng: jax.Array):
    """Shared verification core: emit the accepted prefix + one bonus token.

    ``srcs`` [B, K+1, V] — srcs[:, j] predicts emitted token j;
    ``draft`` [B, K+1] — proposals (slot K is never matched: bonus slot).
    Returns ``(tokens_out [B, K+1] — pad after the window's last emission,
    emitted [B], counts, stopped)``. Token j is emitted while the row is
    accepting; acceptance continues only when the selection equals the
    draft, is not eos, and the per-chunk cap has room.
    """
    b = srcs.shape[0]

    def body(carry, xs):
        counts, accepting, stopped, emitted = carry
        logits, d_j, j = xs                                      # [B,V], [B], scalar
        # the SAME penalty+threshold core decode_chunk samples with —
        # greedy parity between the paths holds by construction
        logits = adjust_logits(logits, counts, gen, step_idx + j)
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
    (counts, _, stopped_f, emitted), tokens_out = lax.scan(
        body, (counts, jnp.ones((b,), bool), stopped, jnp.zeros((b,), jnp.int32)), xs
    )
    return jnp.moveaxis(tokens_out, 0, 1), emitted, counts, stopped_f


def _window_forward(params, cfg, tokens_in, cache, rope_delta, use_flash):
    """Causal forward of one verify window against the cache; returns
    fp32 logits at every window position + the cache with W KVs written
    (offset NOT advanced — the caller advances past the accepted prefix)."""
    b, w = tokens_in.shape
    pos = (cache.offset[:, None] + rope_delta
           + jnp.arange(w)[None, :]).astype(jnp.int32)           # [B, W]
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
    return lm_logits(params["text"], cfg.text, hidden), new_cache  # [B, W, V]


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
    """One host-driven speculative window (see module docstring).

    ``first=True``: ``tokens_in`` is the draft alone (W == K) and the
    candidate chain starts from ``logits_in`` (the prefill's frontier
    logits). Otherwise ``tokens_in[:, 0]`` is the previous window's bonus
    token — already emitted, pre-accepted, forwarded here — and the chain
    starts from the logits after it (W == K + 1).
    """
    b, w = tokens_in.shape
    k_draft = w if first else w - 1
    logits_all, new_cache = _window_forward(params, cfg, tokens_in, cache,
                                            rope_delta, use_flash)
    if first:
        srcs = jnp.concatenate([logits_in[:, None], logits_all], axis=1)
        draft = tokens_in
    else:
        srcs = logits_all
        draft = tokens_in[:, 1:]
    draft = jnp.concatenate(
        [draft, jnp.full((b, 1), -1, jnp.int32)], axis=1)        # [B, K+1]

    tokens_out, emitted, counts, stopped_f = _accept_scan(
        gen, k_draft, srcs, draft, counts, step_idx, stopped, rng)

    # Forwarded history this window: the committed token (non-first) plus
    # every emitted token except the window's last (the pending bonus /
    # chunk-final / eos token — its KV stays beyond the frontier).
    if first:
        advance = jnp.maximum(emitted - 1, 0)
    else:
        advance = emitted
    new_cache = dataclasses.replace(new_cache, offset=cache.offset + advance)
    return tokens_out, emitted, new_cache, counts, stopped_f


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "gen", "spec", "use_flash"),
    donate_argnames=("cache", "hist", "counts"),
)
def decode_chunk_lookahead(
    params: Params,
    cfg: ModelConfig,
    gen: GenerationParams,
    spec: SpecConfig,
    prompt_ids: jnp.ndarray,      # [B, Sb] — this chunk's (padded) prompt tokens
    prompt_valid: jnp.ndarray,    # [B] int32 — real prompt tokens per row
    logits0: jnp.ndarray,         # [B, V] fp32 — prefill frontier logits
    cache: KVCache,               # offset already past the prompt
    hist: jnp.ndarray,            # [B, Hcap] int32 — id-shadow of the cache
    counts: jnp.ndarray,          # [B, V] int32 presence counts
    rope_delta: jnp.ndarray,      # [B, 1] int32
    rng: jax.Array,
    use_flash: bool = False,
    active: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, KVCache, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused lookahead decode: the whole chunk in ONE dispatch.

    Each ``while_loop`` iteration drafts K tokens by n-gram lookup over the
    device-resident token history (longest suffix n-gram, rightmost match —
    identical semantics to ``NGramDraftSource.propose``), verifies them in
    one forward, and commits the accepted prefix. Output-identical to
    ``decode_chunk`` for greedy decoding; cost per iteration ≈ one decode
    step, tokens per iteration = 1 + acceptance.

    Returns ``(tokens [B, max_new], n_generated [B], cache, hist, counts,
    n_iters)`` — ``n_iters`` (scalar int32) counts verify-window forwards,
    the observable the host-side adaptive controller (SpecController,
    this module) uses to measure realized
    tokens-per-dispatch and self-disable lookahead when a pool's
    correlated acceptance can't pay the window premium.
    """
    b = logits0.shape[0]
    k, m = spec.k_draft, spec.max_ngram
    hcap = hist.shape[-1]
    rows = jnp.arange(b)
    max_new = gen.max_new_tokens

    # 1. record the prompt into the history shadow at [offset - valid, offset)
    sb = prompt_ids.shape[1]
    start = cache.offset - prompt_valid
    pidx = start[:, None] + jnp.arange(sb)[None, :]
    pidx = jnp.where(jnp.arange(sb)[None, :] < prompt_valid[:, None], pidx, hcap)
    hist = hist.at[rows[:, None], pidx].set(prompt_ids, mode="drop")

    # 2. seed token from the prefill logits (chunk step index 0)
    active_b = jnp.ones((b,), bool) if active is None else jnp.broadcast_to(active, (b,))
    rng, sub = jax.random.split(rng)
    tok0, emit0, counts, stopped = _accept_scan(
        gen, 0, logits0[:, None], jnp.full((b, 1), -1, jnp.int32), counts,
        jnp.zeros((b,), jnp.int32), ~active_b, sub)
    buf = jnp.full((b, max_new), gen.pad_token_id, jnp.int32)
    buf = buf.at[:, 0].set(tok0[:, 0])
    pending = tok0[:, 0]
    n_emit = emit0

    def cond(carry):
        cache, hist, counts, pending, stopped, n_emit, key, buf, n_iters = carry
        return jnp.any(~stopped & (n_emit < max_new))

    def body(carry):
        cache, hist, counts, pending, stopped, n_emit, key, buf, n_iters = carry
        off = cache.offset
        # pending sits at position `off` (not yet forwarded) so the n-gram
        # pattern includes it — same context the host drafter sees.
        hist = hist.at[rows, jnp.clip(off, 0, hcap - 1)].set(pending)

        # --- device n-gram lookup: longest suffix n-gram, rightmost match
        pat_idx = off[:, None] - (m - 1) + jnp.arange(m)[None, :]
        pat = jnp.where(
            pat_idx >= 0, hist[rows[:, None], jnp.clip(pat_idx, 0, hcap - 1)], -1)
        pos_i = jnp.arange(hcap)
        best_i = jnp.full((b,), -1, jnp.int32)
        best_n = jnp.zeros((b,), jnp.int32)
        for n in range(m, 0, -1):                       # static, longest first
            match = jnp.ones((b, hcap), bool)
            for j in range(n):
                col = hist if j == 0 else jnp.concatenate(
                    [hist[:, j:], jnp.full((b, j), -1, hist.dtype)], axis=1)
                match = match & (col == pat[:, m - n + j][:, None])
            pat_real = (off - (n - 1)) >= 0
            match = match & (pos_i[None, :] + n <= off[:, None]) & pat_real[:, None]
            cand_i = jnp.max(jnp.where(match, pos_i[None, :], -1), axis=1)
            take = (best_i < 0) & (cand_i >= 0)
            best_i = jnp.where(take, cand_i, best_i)
            best_n = jnp.where(take, n, best_n)
        dstart = best_i + best_n
        didx = dstart[:, None] + jnp.arange(k)[None, :]
        in_hist = (didx <= off[:, None]) & (best_i >= 0)[:, None]
        draft = jnp.where(
            in_hist, hist[rows[:, None], jnp.clip(didx, 0, hcap - 1)],
            gen.pad_token_id).astype(jnp.int32)

        # --- verify window (committed = pending)
        tokens_in = jnp.concatenate([pending[:, None], draft], axis=1)
        logits_all, cache = _window_forward(params, cfg, tokens_in, cache,
                                            rope_delta, use_flash)
        key, sub = jax.random.split(key)
        loop_stopped = stopped | (n_emit >= max_new)
        draft_pad = jnp.concatenate(
            [draft, jnp.full((b, 1), -1, jnp.int32)], axis=1)
        tokens_out, emitted, counts, stopped = _accept_scan(
            gen, k, logits_all, draft_pad, counts, n_emit, loop_stopped, sub)

        # forwarded ids become history at [off, off + advance)
        widx = off[:, None] + jnp.arange(1 + k)[None, :]
        hist = hist.at[rows[:, None], jnp.where(widx < hcap, widx, hcap)].set(
            tokens_in, mode="drop")
        cache = dataclasses.replace(cache, offset=off + emitted)

        out_pos = n_emit[:, None] + jnp.arange(k + 1)[None, :]
        emit_mask = jnp.arange(k + 1)[None, :] < emitted[:, None]
        oidx = jnp.where(emit_mask, jnp.clip(out_pos, 0, max_new - 1), max_new)
        buf = buf.at[rows[:, None], oidx].set(tokens_out, mode="drop")
        pending = jnp.where(
            emitted > 0, tokens_out[rows, jnp.clip(emitted - 1, 0, k)], pending)
        n_emit = n_emit + emitted
        return (cache, hist, counts, pending, stopped, n_emit, key, buf, n_iters + 1)

    n_iters = jnp.int32(0)
    if max_new > 1:
        (cache, hist, counts, pending, stopped, n_emit, rng, buf, n_iters) = lax.while_loop(
            cond, body,
            (cache, hist, counts, pending, stopped, n_emit, rng, buf, n_iters))
    return buf, n_emit, cache, hist, counts, n_iters


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
