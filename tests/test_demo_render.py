"""Render pipeline + web demo server (driven over real HTTP)."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from livecc_tpu.vision_io import video_reader as vr

pytestmark = pytest.mark.skipif(not vr.is_available(), reason="native decoder unavailable")

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "hf_tiny.npz")


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("demo") / "clip.mp4")
    rng = np.random.RandomState(0)
    vr.encode_test_video(path, rng.randint(0, 255, (60, 96, 128, 3), dtype=np.uint8), fps=10)
    return path


def test_render_commentary_video(video, tmp_path):
    from livecc_tpu.demo.render import render_commentary_video

    result = {
        "video_path": video,
        "query": "what happens in this clip?",
        "commentaries": [[0.0, 3.0, "things begin"], [3.0, 4.0, "things continue happening now"]],
    }
    rj = tmp_path / "result.json"
    rj.write_text(json.dumps(result))
    out = str(tmp_path / "rendered.mp4")
    # 0.5 s 440 Hz tone per commentary -> muxed AAC track, clip at t=3.0 s
    tone = (0.4 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)).astype(np.float32)
    fake_tts = lambda text: (tone, 16000)
    render_commentary_video(str(rj), out, fps=5, max_seconds=4.0, tts=fake_tts)
    r = vr.VideoReader(out)
    assert len(r) == 21  # 4 s at 5 fps + frame at t=0
    # audio is MUXED into the mp4 (reference render/video.py:186-200), not a
    # sidecar: decode it back and find the tone at the commentary timestamps
    track = vr.load_audio(out, 16000)
    assert len(track) >= 4 * 16000
    seg = track[3 * 16000 : 3 * 16000 + 8000]          # clip placed at t=3.0
    freq = np.fft.rfftfreq(len(seg), 1 / 16000)[np.abs(np.fft.rfft(seg)).argmax()]
    assert abs(freq - 440.0) < 5, freq
    silent = track[2 * 16000 : int(2.9 * 16000)]        # between clips: silence
    assert np.abs(silent).max() < 0.02
    # bubbles visibly changed pixels vs the source
    src = vr.VideoReader(video).get_batch([0], out_hw=(96, 128))[0]
    ren = r.get_batch([0])[0]
    assert np.abs(src.astype(int) - ren.astype(int)).mean() > 1


def test_demo_http_server(video, monkeypatch):
    import livecc_tpu.demo.app as app
    import livecc_tpu.demo.cli as cli
    from http.server import ThreadingHTTPServer

    from livecc_tpu.core.config import tiny_config
    from livecc_tpu.data.tokenizer import ByteTokenizer
    from livecc_tpu.engine import LiveCCEngine
    from livecc_tpu.models import qwen2_vl as m

    g = np.load(GOLDEN)
    cfg = tiny_config()
    state = {k[len("state::"):]: g[k] for k in g.files if k.startswith("state::")}
    params = m.convert_state_dict(state, cfg)
    engine = LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=1024)
    monkeypatch.setattr(cli, "build_engine", lambda *a, **k: engine)

    server = app.DemoServer(video, None, "describe")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), app.make_handler(server))
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        page = urllib.request.urlopen(f"http://127.0.0.1:{port}/").read().decode()
        assert "<video" in page
        vid = urllib.request.urlopen(f"http://127.0.0.1:{port}/video").read()
        assert len(vid) == os.path.getsize(video)
        ticks = json.loads(urllib.request.urlopen(f"http://127.0.0.1:{port}/tick?t=4.0").read())
        assert ticks and ticks[0][0][0] == pytest.approx(0.0, abs=0.3)
        answer = urllib.request.urlopen(
            urllib.request.Request(f"http://127.0.0.1:{port}/qa", data=b"what?", method="POST")
        ).read().decode()
        assert isinstance(answer, str)
    finally:
        httpd.shutdown()


def test_builtin_tts_synthesis():
    """The built-in formant TTS honors the tts(text)->(samples, rate)
    contract: audible, bounded, deterministic, longer for longer text."""
    from livecc_tpu.audio.tts import synthesize, text_to_phonemes

    wav, rate = synthesize("and the striker scores a goal")
    assert rate == 16000
    assert wav.dtype == np.float32
    assert 0.2 < np.max(np.abs(wav)) <= 0.8       # normalized, non-silent
    assert len(wav) > rate // 2                   # > 0.5 s of speech
    wav2, _ = synthesize("and the striker scores a goal")
    np.testing.assert_array_equal(wav, wav2)      # deterministic
    short, _ = synthesize("go")
    assert len(short) < len(wav)
    # numbers and punctuation are speakable
    assert text_to_phonemes("Time 3 to 4!")
    w3, _ = synthesize("Time=3.0-4.0s")
    assert len(w3) > 0
    # silent-e words whose vowel matches a DIGRAPH rule ('ou' in "house",
    # 'ai' in "praise") must not hit the single-char long-vowel flip
    for word in ("house", "mouse", "praise", "raise", "aide", "game"):
        w, _ = synthesize(word)
        assert len(w) > 0, word
