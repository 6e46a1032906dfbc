"""Real-time live_cc + video_qa over an actual encoded video (native decode)."""

import json
import os

import numpy as np
import pytest

from livecc_tpu.vision_io import video_reader as vr

pytestmark = pytest.mark.skipif(not vr.is_available(), reason="native decoder unavailable")

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "hf_tiny.npz")


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("live") / "clip.mp4")
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, size=(80, 56, 56, 3), dtype=np.uint8)  # 8 s at 10 fps
    vr.encode_test_video(path, frames, fps=10)
    return path


@pytest.fixture(scope="module")
def engine():
    from livecc_tpu.core.config import tiny_config
    from livecc_tpu.data.tokenizer import ByteTokenizer
    from livecc_tpu.engine import LiveCCEngine
    from livecc_tpu.models import qwen2_vl as m

    g = np.load(GOLDEN)
    cfg = tiny_config()
    state = {k[len("state::"):]: g[k] for k in g.files if k.startswith("state::")}
    params = m.convert_state_dict(state, cfg)
    return LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=1024)


def test_live_cc_wall_clock(engine, video):
    from livecc_tpu.engine import GenerationParams
    from livecc_tpu.engine.live import LiveCC

    gen = GenerationParams(max_new_tokens=4, eos_token_id=engine.cfg.eos_token_id,
                           pad_token_id=engine.cfg.pad_token_id)
    live = LiveCC(engine)
    session = live.open(video)
    outs = []
    for t in range(9):
        outs.extend(list(live.live_cc(session, float(t), query="q", gen=gen)))
        if session.video_end:
            break
    assert session.video_end or len(outs) > 0
    spans = [span for span, _ in outs]
    # first chunk covers the 3 s init window; chunks are contiguous
    assert spans[0][0] == pytest.approx(0.0, abs=0.3)
    assert spans[0][1] >= 2.5
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert b0 == pytest.approx(a1, abs=0.101)
    # cursor never rewinds; cache grew monotonically
    assert session.last_pts_index > 0


def test_video_qa_multiturn(engine, video):
    from livecc_tpu.engine import GenerationParams
    from livecc_tpu.engine.live import LiveCC

    gen = GenerationParams(max_new_tokens=4, eos_token_id=engine.cfg.eos_token_id,
                           pad_token_id=engine.cfg.pad_token_id)
    live = LiveCC(engine)
    session = live.open(video)
    a1 = live.video_qa(session, "what is shown?", gen=gen)
    off1 = int(session.stream.cache.offset[0])
    a2 = live.video_qa(session, "and then?", gen=gen)
    off2 = int(session.stream.cache.offset[0])
    assert isinstance(a1, str) and isinstance(a2, str)
    assert off2 > off1  # second turn continued the same cache


def test_cli_smoke(engine, video, tmp_path, monkeypatch):
    from livecc_tpu.demo import cli

    out = tmp_path / "out.json"
    monkeypatch.setattr(cli, "build_engine", lambda *a, **k: engine)
    result = cli.main(["--video", video, "--seconds", "5", "--max-new-tokens", "4",
                       "--output", str(out), "--streaming-eos-base-threshold", "-1"])
    assert result["commentaries"]
    assert json.loads(out.read_text())["video_path"] == video


def test_live_video_shorter_than_init_window(engine, tmp_path):
    """A clip shorter than the 3 s init window still produces one chunk and
    then flags video_end (reference end-of-video guard, demo/infer.py:99-101)."""
    from livecc_tpu.engine import GenerationParams
    from livecc_tpu.engine.live import LiveCC

    path = str(tmp_path / "short.mp4")
    rng = np.random.RandomState(0)
    vr.encode_test_video(path, rng.randint(0, 255, (20, 56, 56, 3), dtype=np.uint8), fps=10)
    gen = GenerationParams(max_new_tokens=4, eos_token_id=engine.cfg.eos_token_id,
                           pad_token_id=engine.cfg.pad_token_id)
    live = LiveCC(engine)
    session = live.open(path)   # 2 s video
    outs = []
    for t in range(4):
        outs.extend(list(live.live_cc(session, float(t), query="q", gen=gen)))
        if session.video_end:
            break
    assert session.video_end
    assert len(outs) >= 1


def test_cli_speculative_smoke(video, tmp_path):
    """--speculative builds a lookahead engine and produces the same JSON
    shape (tiny random model; greedy parity is covered in test_speculative)."""
    from livecc_tpu.demo import cli

    out = tmp_path / "spec.json"
    result = cli.main(["--video", video, "--seconds", "4", "--max-new-tokens", "4",
                       "--output", str(out), "--streaming-eos-base-threshold", "-1",
                       "--speculative"])
    assert result["commentaries"]
