"""KV-cache compaction: bounded attended window over an unbounded session.

StreamingLLM-style eviction shared by the single-stream engine and the
serving pool (serve/scheduler.py): retain the ``sink`` prefix (system +
query + init turn — the attention sink) plus the most recent ``keep``
tokens of one cache row; drop the middle. Keys keep their original
absolute rotary encoding, so retained history attends unchanged; the
caller folds the dropped length into the stream's rope_delta so NEW
tokens' positions continue globally (``offset + delta`` is invariant).

This is the streaming equivalent of the reference's 24,576-visual-token
offline cap (video_process_patch.py:11-14). Presence counts (repetition
penalty) deliberately keep counting evicted tokens — the reference
penalizes over the full growing history too (past_ids grows unboundedly,
demo/infer.py:159-174).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from livecc_tpu.models.qwen2_vl.text import KVCache


def plan_compaction(old_off: int, sink_cap: int, keep_cap: int,
                    max_len: int) -> tuple[int, int, int]:
    """Host-side window choice shared by the solo engine and the pool:
    ``(sink, keep, new_off)`` for a row whose device depth is ``old_off``.
    ``new_off >= old_off`` means nothing to evict. Callers must fold
    ``old_off - new_off`` into the stream's rope_delta (the ``offset +
    delta`` invariant above)."""
    sink = min(sink_cap, old_off)
    keep = min(keep_cap, max_len)
    return sink, keep, min(old_off, sink + keep)


def _evict_index_map(off, sink, keep, n: int):
    """Position gather map for sink+window eviction — the ONE map shared by
    the KV compaction and the token-history (lookahead) compaction, so
    hist[row, p] stays the id of cache position p by construction.
    i < sink -> i ; else -> off - keep + (i - sink); exact no-op (identity)
    when the window already covers the whole history."""
    noop = off <= sink + keep
    i = jnp.arange(n)
    idx = jnp.where(i < sink, i, off - keep + (i - sink))
    return jnp.where(noop, i, jnp.clip(idx, 0, n - 1))


@functools.partial(jax.jit, donate_argnames=("cache",))
def compact_cache_row(cache: KVCache, row, sink, keep) -> KVCache:
    """Evict the middle of row ``row``: keep ``[0, sink)`` + the last
    ``keep`` positions before its offset; set the row's offset to
    ``min(offset, sink + keep)``. ``row``/``sink``/``keep`` are traced
    scalars — one compiled program serves every row and window choice.
    Other rows are untouched.
    """
    off = cache.offset[row]
    new_off = jnp.minimum(off, sink + keep)
    smax = cache.max_len

    def gather_positions(arr, axis):
        r = jax.lax.dynamic_index_in_dim(arr, row, axis=1, keepdims=False)
        new_r = jnp.take(r, _evict_index_map(off, sink, keep, smax), axis=axis)
        return jax.lax.dynamic_update_index_in_dim(arr, new_r, row, axis=1)

    g_kv = lambda a: None if a is None else gather_positions(a, axis=-2)
    g_sc = lambda a: None if a is None else gather_positions(a, axis=-1)
    return KVCache(
        g_kv(cache.k), g_kv(cache.v),
        cache.offset.at[row].set(new_off),
        g_sc(cache.k_scale), g_sc(cache.v_scale),
    )


@functools.partial(jax.jit, donate_argnames=("hist",))
def compact_token_row(hist: jnp.ndarray, off, row, sink, keep) -> jnp.ndarray:
    """Apply the same sink+window eviction to a row of the token-history
    buffer (the id-shadow of the KV cache used by fused lookahead decoding,
    engine/speculative.py): hist[row, p] stays the id of cache position p
    after compaction — guaranteed by sharing _evict_index_map with
    compact_cache_row. ``off`` is the row's pre-compaction offset."""
    hcap = hist.shape[-1]
    idx = _evict_index_map(off, sink, keep, hcap)
    return hist.at[row].set(jnp.take(hist[row], idx))
