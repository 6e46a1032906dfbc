"""Data-production pipeline: word split, clip segmentation, filters, packaging."""

import json
import os

import numpy as np
import pytest

from livecc_tpu.core.config import tiny_config
from livecc_tpu.data.lmm_dataset import read_last_line
from livecc_tpu.data.tokenizer import ByteTokenizer
from livecc_tpu.tools import production as prod
from livecc_tpu.tools.filters import lm_loss_keep, lm_loss_scores
from livecc_tpu.models import qwen2_vl as m

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "hf_tiny.npz")


def test_split_subtitles_to_words():
    subs = [
        {"start": 0.0, "end": 2.0, "text": "hello big world"},
        {"start": 2.0, "end": 3.0, "text": "[Music] again"},
        {"start": 3.0, "end": 4.0, "text": "again more"},  # 'again' duplicated at boundary
    ]
    words = prod.split_subtitles_to_words(subs)
    texts = [w for _, _, w in words]
    assert texts == ["hello", "big", "world", "again", "more"]
    # uniform division: 3 words over 2 s
    assert words[0][:2] == (0.0, pytest.approx(0.667, abs=1e-3))


def make_words(n, wps=2.0, gap_at=None, gap=5.0):
    words, t = [], 0.0
    for i in range(n):
        words.append((round(t, 2), round(t + 1 / wps * 0.8, 2), f"w{i}"))
        t += 1 / wps
        if gap_at is not None and i == gap_at:
            t += gap
    return words


def test_clips_for_pretrain_segmentation():
    # 200 s of words with a 5 s gap at word 80 (t=40 s)
    words = make_words(400, wps=2.0, gap_at=80)
    clips = prod.clips_for_pretrain(words)
    assert clips, "expected at least one clip"
    first = clips[0]
    # ends at the gap (>=30 s, <=240 s)
    assert 30.0 <= first["end"] - first["start"] <= 240.0
    assert first["end"] == words[80][1]
    assert first["previous"] == ""
    if len(clips) > 1:
        assert clips[1]["previous"].startswith("w0")
    assert all(prod.words_per_second_ok(c) for c in clips)


def test_wps_filter():
    dense = {"start": 0, "end": 10, "words": [(i, i + 0.1, "x") for i in range(60)]}
    assert not prod.words_per_second_ok(dense)  # 6 wps
    ok = {"start": 0, "end": 10, "words": [(i, i + 0.4, "x") for i in range(20)]}
    assert prod.words_per_second_ok(ok)


def test_to_conversation_and_corpus(tmp_path):
    words = make_words(100, wps=2.0)
    clip = {"start": 0.0, "end": 50.0, "words": words, "previous": ""}
    row = prod.to_conversation("v.mp4", clip, "what's happening?", title="T")
    assert row[0]["content"][0]["video_start"] == 0.0
    assert row[1]["content"][0]["text_stream"][0][2] == "w0"
    path = str(tmp_path / "c.jsonl")
    prod.write_corpus([row, row], path)
    seeks = json.loads(read_last_line(path))
    assert len(seeks) == 2


def test_make_prompt_and_language():
    llm = lambda p: "What is shown in the clip?\nYES"
    clip = {"words": [(0, 1, "goal"), (1, 2, "scored")]}
    query, keep = prod.make_prompt(llm, clip, title="Match")
    assert "?" in query and keep
    llm_no = lambda p: "query\nNO"
    assert prod.make_prompt(llm_no, clip)[1] is False
    assert prod.detect_language("this is english text")
    assert not prod.detect_language("это русский текст полностью")


def test_lm_loss_filter_scores():
    g = np.load(GOLDEN)
    cfg = tiny_config()
    state = {k[len("state::"):]: g[k] for k in g.files if k.startswith("state::")}
    params = m.convert_state_dict(state, cfg)
    samples = [
        {"title": "t", "transcript": "hello world this is a test"},
        {"previous": "earlier words", "transcript": "more words follow here"},
    ]
    scores = lm_loss_scores(params, cfg, ByteTokenizer(), samples)
    assert scores.shape == (2,) and np.isfinite(scores).all() and (scores > 0).all()
    keep = lm_loss_keep(np.asarray([1.0, 3.0, 7.0]))
    assert list(keep) == [False, True, False]


def test_corpus_stats_and_filter(tmp_path):
    from livecc_tpu.tools import corpus_stats as cs
    from livecc_tpu.tools import production as prod

    words = make_words(100, wps=2.0)
    clip = {"start": 0.0, "end": 50.0, "words": words, "previous": ""}
    rows = [prod.to_conversation("a.mp4", clip, "q?"),
            prod.to_conversation("b.mp4", clip, "q?")]
    path = str(tmp_path / "c.jsonl")
    prod.write_corpus(rows, path)
    stats = cs.corpus_stats(path)
    assert stats["total"] == 2
    assert stats["duration_s"]["all"] == pytest.approx(100.0)
    assert stats["stream_words"]["all"] == 200
    out = str(tmp_path / "f.jsonl")
    n = cs.filter_corpus(path, out, keep=lambda row: row[0]["content"][0]["video"] == "a.mp4")
    assert n == 1
    assert cs.corpus_stats(out)["total"] == 1
