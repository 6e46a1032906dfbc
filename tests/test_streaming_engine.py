"""End-to-end streaming engine test on the tiny model + byte tokenizer.

Mirrors the reference's offline streaming path (live_cc_once_for_evaluation,
demo/infer.py:244-310): whole clip -> 6-frame init + 2-frame chunks ->
per-chunk prefill+decode over one growing KV cache.
"""

import os

import numpy as np
import pytest

from livecc_tpu.core.config import tiny_config
from livecc_tpu.data.tokenizer import ByteTokenizer
from livecc_tpu.engine import GenerationParams, LiveCCEngine
from livecc_tpu.models import qwen2_vl as m

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "hf_tiny.npz")


@pytest.fixture(scope="module")
def engine():
    g = np.load(GOLDEN)
    cfg = tiny_config()
    state = {k[len("state::"):]: g[k] for k in g.files if k.startswith("state::")}
    params = m.convert_state_dict(state, cfg)
    return LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=512)


def synth_frames(n, h=28, w=28, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, size=(n, h, w, 3), dtype=np.uint8)


def test_offline_streaming_commentary(engine):
    frames = synth_frames(8)  # 4 s at 2 fps -> init(6) + one 2-frame chunk
    out = engine.live_cc_once_for_evaluation("describe", frames, max_new_tokens=4)
    assert len(out) == 2
    (a0, a1, txt1), (b0, b1, txt2) = out
    assert (a0, a1) == (0.0, 3.0)
    assert (b0, b1) == (3.0, 4.0)
    assert isinstance(txt1, str) and isinstance(txt2, str)


def test_odd_frame_count_chunk(engine):
    # 5-frame init chunk from a short clip: device_patchify pads T 5 -> 6, so
    # grid_t must be ceil(5/2)=3, not floor (shape-mismatch crash otherwise).
    out = engine.live_cc_once_for_evaluation("describe", synth_frames(5), max_new_tokens=4)
    assert len(out) == 1
    assert isinstance(out[0][2], str)


def test_streaming_state_progression(engine):
    gen = GenerationParams(max_new_tokens=4, eos_token_id=engine.cfg.eos_token_id,
                           pad_token_id=engine.cfg.pad_token_id)
    state = engine.new_stream()
    engine.chunk_step(state, synth_frames(6), 0.0, 3.0, "q", gen)
    off1 = int(state.cache.offset[0])
    assert state.rope_delta is not None
    assert off1 == len(state.past_ids)  # cache holds exactly the history
    engine.chunk_step(state, synth_frames(2, seed=1), 3.0, 4.0, None, gen)
    off2 = int(state.cache.offset[0])
    assert off2 > off1
    assert off2 == len(state.past_ids)


def test_cache_growth(engine):
    gen = GenerationParams(max_new_tokens=4, eos_token_id=engine.cfg.eos_token_id,
                           pad_token_id=engine.cfg.pad_token_id)
    state = engine.new_stream()
    state.cache = state.cache.__class__.zeros(engine.cfg.text, 1, 64)  # tiny cache
    engine.chunk_step(state, synth_frames(6), 0.0, 3.0, "q", gen)
    assert state.cache.max_len >= 128  # grew beyond the initial 64


def test_solo_cache_compaction_at_ceiling():
    """At the engine cache ceiling the solo stream COMPACTS (sink + recent
    window) instead of growing: unbounded session on a bounded cache, with
    positions staying globally continuous (offset+delta invariant)."""
    g = np.load(GOLDEN)
    cfg = tiny_config()
    state_d = {k[len("state::"):]: g[k] for k in g.files if k.startswith("state::")}
    params = m.convert_state_dict(state_d, cfg)
    eng = LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=256,
                       compact_keep=96, compact_sink_cap=64)
    gen = GenerationParams(max_new_tokens=4, eos_token_id=cfg.eos_token_id,
                           pad_token_id=cfg.pad_token_id)
    st = eng.new_stream()
    eng.chunk_step(st, synth_frames(6), 0.0, 3.0, "q", gen)
    t = 3.0
    for i in range(20):                   # would need ~1000+ tokens unbounded
        eng.chunk_step(st, synth_frames(2, seed=i + 1), t, t + 1.0, None, gen)
        t += 1.0
        # device offset mirrors host length exactly on the solo path
        assert st.length == int(np.asarray(st.cache.offset[0]))
    assert eng.metrics.summary("cache_compaction_dropped_tokens").get("n", 0) >= 1
    assert st.cache.max_len == 256        # never grew past the ceiling
    # global stream position advanced far beyond the physical cache
    assert st.length + st.rope_delta > 600
