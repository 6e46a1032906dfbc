"""Engine tests: greedy-generate parity vs HF goldens + streaming invariants.

The decisive checks for the reference's bit-parity requirement (BASELINE.md):
  * chunk prefill + fused decode reproduces HF ``generate`` token-for-token
    (multimodal and text-only prompts);
  * KV-cache continuation (flat rope_delta positions) matches HF's cached
    forward logits;
  * bucketed (padded) prefill is numerically invariant to padding.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import tiny_config
from livecc_tpu.engine.generation import GenerationParams, decode_chunk, prefill
from livecc_tpu.models import qwen2_vl as m
from livecc_tpu.models.qwen2_vl.text import KVCache

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "hf_tiny.npz")


@pytest.fixture(scope="module")
def setup():
    g = np.load(GOLDEN)
    cfg = tiny_config()
    state = {k[len("state::"):]: g[k] for k in g.files if k.startswith("state::")}
    params = m.convert_state_dict(state, cfg)
    return g, params, cfg


def run_prefill(params, cfg, ids, grid=None, patches=None, cache_len=128, bucket=32):
    n = ids.shape[1]
    pos, delta = m.get_rope_index(cfg, ids, video_grid_thw=grid)
    ids_p = np.zeros((1, bucket), np.int32)
    ids_p[0, :n] = ids[0]
    pos_p = np.zeros((3, 1, bucket), np.int32)
    pos_p[:, :, :n] = pos
    pos_p[:, :, n:] = pos[:, :, -1:] + np.arange(1, bucket - n + 1)
    vis = None
    if patches is not None:
        vis = m.prepare_vision_inputs(cfg, patches, [tuple(x) for x in grid])
    cache = KVCache.zeros(cfg.text, 1, cache_len)
    counts = jnp.zeros((1, cfg.text.vocab_size), jnp.int32)
    logits0, cache, counts = prefill(
        params, cfg, jnp.asarray(ids_p), jnp.asarray(pos_p), jnp.int32(n), cache,
        vision=vis, counts=counts,
    )
    return logits0, cache, int(delta[0, 0]), counts


def greedy_gen(params, cfg, logits0, cache, counts, delta, max_new):
    gen = GenerationParams(max_new_tokens=max_new, eos_token_id=cfg.eos_token_id,
                           pad_token_id=cfg.pad_token_id)
    tokens, n_gen, cache, _ = decode_chunk(
        params, cfg, gen, logits0, cache, counts,
        jnp.asarray([[delta]], jnp.int32), jax.random.PRNGKey(0),
    )
    return np.asarray(tokens)[0][: int(n_gen[0])], cache


def test_greedy_generate_multimodal_parity(setup):
    g, params, cfg = setup
    ids, patches, grid = g["mm_ids"], g["mm_patches"], g["mm_grid"]
    logits0, cache, delta, counts = run_prefill(params, cfg, ids, grid, patches)
    generated, _ = greedy_gen(params, cfg, logits0, cache, counts, delta, max_new=12)
    hf_tail = g["gen_ids"][0, ids.shape[1]:]
    np.testing.assert_array_equal(generated, hf_tail)


def test_greedy_generate_text_parity(setup):
    g, params, cfg = setup
    ids = g["text_ids"]
    logits0, cache, delta, counts = run_prefill(params, cfg, ids)
    generated, _ = greedy_gen(params, cfg, logits0, cache, counts, delta, max_new=12)
    hf_tail = g["gen_text_ids"][0, ids.shape[1]:]
    np.testing.assert_array_equal(generated, hf_tail)


def test_cache_continuation_logits_parity(setup):
    """Chunk-2 prefill over the cache matches HF's cached forward exactly."""
    g, params, cfg = setup
    ids, patches, grid = g["mm_ids"], g["mm_patches"], g["mm_grid"]
    _, cache, delta, _ = run_prefill(params, cfg, ids, grid, patches)
    ids2 = g["cont_ids2"]
    suffix = ids2[:, ids.shape[1]:]
    s = suffix.shape[1]
    off = int(cache.offset[0])
    # flat continuation positions (cached rope_deltas branch)
    pos = np.broadcast_to((np.arange(s) + off + delta)[None, None], (3, 1, s)).astype(np.int32)
    key_valid = (jnp.arange(cache.max_len) < off + s)[None, :]
    logits, _ = m.forward(params, cfg, jnp.asarray(suffix), jnp.asarray(pos),
                          cache=cache, attention_mask=key_valid)
    np.testing.assert_allclose(np.asarray(logits), g["cont_logits2"], atol=5e-4, rtol=1e-3)


def test_chunked_prefill_equals_full(setup):
    """Feeding the prompt in two chunks gives the same next-token logits as
    one full prefill (text-only continuation after a multimodal first chunk,
    where flat positions coincide with get_rope_index)."""
    g, params, cfg = setup
    ids, patches, grid = g["mm_ids"], g["mm_patches"], g["mm_grid"]
    extra = np.arange(40, 48)[None]
    full = np.concatenate([ids, extra], axis=1)

    # full prefill
    logits_full, _, _, _ = run_prefill(params, cfg, full, grid, patches, bucket=32)

    # chunked: mm chunk then text chunk
    _, cache, delta, _ = run_prefill(params, cfg, ids, grid, patches, bucket=32)
    off = int(cache.offset[0])
    s = extra.shape[1]
    bucket = 32
    ids_p = np.zeros((1, bucket), np.int32)
    ids_p[0, :s] = extra[0]
    pos_p = np.broadcast_to((np.arange(bucket) + off + delta)[None, None], (3, 1, bucket)).astype(np.int32)
    logits_chunk, cache, _ = prefill(
        params, cfg, jnp.asarray(ids_p), jnp.asarray(np.ascontiguousarray(pos_p)),
        jnp.int32(s), cache,
    )
    np.testing.assert_allclose(np.asarray(logits_chunk), np.asarray(logits_full), atol=2e-4, rtol=1e-3)
    assert int(cache.offset[0]) == full.shape[1]


def test_prefill_padding_invariance(setup):
    g, params, cfg = setup
    ids = g["text_ids"]
    l32 = run_prefill(params, cfg, ids, bucket=32)[0]
    l64 = run_prefill(params, cfg, ids, bucket=64)[0]
    np.testing.assert_allclose(np.asarray(l32), np.asarray(l64), atol=1e-5, rtol=1e-5)


def test_repetition_penalty_and_threshold():
    from livecc_tpu.engine.generation import apply_repetition_penalty
    logits = jnp.asarray([[2.0, -2.0, 1.0, 0.5]])
    presence = jnp.asarray([[True, True, False, False]])
    out = np.asarray(apply_repetition_penalty(logits, presence, 2.0))
    np.testing.assert_allclose(out, [[1.0, -4.0, 1.0, 0.5]])


def test_sampling_modes(setup):
    """top_k=1 sampling == greedy; tiny top_p == greedy; sampling is seeded."""
    g, params, cfg = setup
    ids = g["text_ids"]
    logits0, cache, delta, counts = run_prefill(params, cfg, ids)

    def gen_with(**kw):
        return GenerationParams(max_new_tokens=4, eos_token_id=cfg.eos_token_id,
                                pad_token_id=cfg.pad_token_id, **kw)

    def run(gen, c, cnt, seed=0):
        tokens, n, _, _ = decode_chunk(
            params, cfg, gen, logits0, c, cnt,
            jnp.asarray([[delta]], jnp.int32), jax.random.PRNGKey(seed),
        )
        return np.asarray(tokens)[0][: int(n[0])].tolist()

    import copy
    fresh = lambda: run_prefill(params, cfg, ids)[1:4:2]  # (cache, counts)
    c, cnt = fresh(); greedy = run(gen_with(), c, cnt)
    c, cnt = fresh(); topk1 = run(gen_with(do_sample=True, top_k=1), c, cnt)
    assert topk1 == greedy
    c, cnt = fresh(); topp = run(gen_with(do_sample=True, top_p=1e-6), c, cnt)
    assert topp == greedy
    # seeded sampling is reproducible
    c, cnt = fresh(); s1 = run(gen_with(do_sample=True, temperature=2.0), c, cnt, seed=7)
    c, cnt = fresh(); s2 = run(gen_with(do_sample=True, temperature=2.0), c, cnt, seed=7)
    assert s1 == s2


def test_threshold_processor_suppresses_marker(setup):
    """The streaming eos marker is masked while its probability is below the
    ramping threshold (reference ThresholdLogitsProcessor, demo/infer.py:10-23)."""
    g, params, cfg = setup
    ids = g["text_ids"]
    logits0, cache, delta, counts = run_prefill(params, cfg, ids)
    # pick the greedy token as the 'marker': with threshold base 1.0 (never
    # reached), it must never be emitted.
    marker = int(np.argmax(np.asarray(logits0)[0]))
    gen = GenerationParams(
        max_new_tokens=4, eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
        streaming_eos_token_id=marker, streaming_threshold_base=1.0,
        streaming_threshold_step=0.0,
    )
    tokens, n, _, _ = decode_chunk(
        params, cfg, gen, logits0, cache, counts,
        jnp.asarray([[delta]], jnp.int32), jax.random.PRNGKey(0),
    )
    out = np.asarray(tokens)[0][: int(n[0])]
    assert marker not in out[:1]  # first step cannot be the suppressed marker


def test_decode_single_token_and_prefix_consistency(setup):
    """max_new_tokens=1 (zero-length forward scan + sample-only epilogue)
    emits exactly the first token of a longer greedy decode, and a
    max_new=k decode is a prefix of a max_new=k+4 decode (the sample-only
    final token never perturbs history)."""
    g, params, cfg = setup
    ids = g["text_ids"]
    out = {}
    for max_new in (1, 5, 9):
        logits0, cache, delta, counts = run_prefill(params, cfg, ids, None, None)
        toks, _ = greedy_gen(params, cfg, logits0, cache, counts, delta, max_new=max_new)
        out[max_new] = list(toks)
    assert len(out[1]) == 1
    assert out[5][:1] == out[1]
    assert out[9][:5] == out[5]


def test_decode_early_stop_semantics():
    """Rows stopping at different steps: emitted prefixes are contiguous,
    pads follow, n_gen counts prefix(+epilogue), and the cache offset
    advances by the forwarded tokens only — the early-exit while_loop must
    be output-identical to the fixed-length loop it replaced."""
    import jax
    import jax.numpy as jnp
    from livecc_tpu.engine.generation import GenerationParams, decode_chunk
    from livecc_tpu.models.qwen2_vl.text import KVCache
    from livecc_tpu.models.qwen2_vl.model import init_params

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    b, v = 3, cfg.text.vocab_size
    base = np.zeros((b, v), np.float32)
    # row 0 greedily emits token 42 forever; row 1 emits eos IMMEDIATELY;
    # row 2 inactive
    base[0, 42] = 10.0
    base[1, cfg.eos_token_id] = 10.0
    base[2, 7] = 10.0
    gen = GenerationParams(max_new_tokens=5, eos_token_id=cfg.eos_token_id,
                           pad_token_id=cfg.pad_token_id)
    import dataclasses

    cache = KVCache.zeros(cfg.text, b, 64)
    cache = dataclasses.replace(cache, offset=jnp.asarray([8, 8, 8], jnp.int32))
    counts = jnp.zeros((b, v), jnp.int32)
    delta = jnp.zeros((b, 1), jnp.int32)
    active = jnp.asarray([True, True, False])
    tokens, n_gen, cache2, counts2 = decode_chunk(
        params, cfg, gen, jnp.asarray(base), cache, counts, delta,
        jax.random.PRNGKey(0), active=active,
    )
    tokens = np.asarray(tokens)
    n_gen = np.asarray(n_gen)
    # row 1: emits exactly the eos then stops
    assert n_gen[1] == 1 and tokens[1, 0] == cfg.eos_token_id
    assert (tokens[1, 1:] == gen.pad_token_id).all()
    # row 2 inactive: nothing
    assert n_gen[2] == 0 and (tokens[2] == gen.pad_token_id).all()
    # row 0: ran to max_new (model-driven continuation)
    assert n_gen[0] == gen.max_new_tokens
    # cache offsets: row advances by forwarded tokens = n_gen-1 (last token
    # never forwarded), stopped/inactive rows by their forwarded count
    off = np.asarray(cache2.offset)
    assert off[0] == 8 + gen.max_new_tokens - 1
    assert off[1] == 8            # eos sampled first -> nothing forwarded
    assert off[2] == 8
