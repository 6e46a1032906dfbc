"""Native video decoder: PTS index, random access, scaling, streaming cursor."""

import os

import numpy as np
import pytest

from livecc_tpu.vision_io import video_reader as vr

pytestmark = pytest.mark.skipif(not vr.is_available(), reason="native decoder unavailable")


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    """10 s, 10 fps, 64x96 synthetic video whose frames encode their index
    as a solid gray level (quantization-tolerant)."""
    path = str(tmp_path_factory.mktemp("vids") / "test.mp4")
    t, h, w = 100, 64, 96
    frames = np.zeros((t, h, w, 3), np.uint8)
    for i in range(t):
        frames[i] = 20 + i * 2  # distinct gray per frame
    vr.encode_test_video(path, frames, fps=10)
    return path, frames


def gray_to_index(frame):
    return int(round((float(frame.mean()) - 20) / 2))


def test_open_and_index(clip):
    path, frames = clip
    r = vr.VideoReader(path)
    assert len(r) == 100
    assert abs(r.avg_fps - 10.0) < 0.2
    pts = r.pts_seconds
    assert len(pts) == 100
    assert np.all(np.diff(pts) > 0)
    assert abs((pts[-1] - pts[0]) - 9.9) < 0.2


def test_get_batch_random_access(clip):
    path, frames = clip
    r = vr.VideoReader(path)
    for idxs in ([0, 5, 50, 99], [99, 0, 42], [7, 7, 7, 8]):
        out = r.get_batch(idxs)
        assert out.shape == (len(idxs), 64, 96, 3)
        for got, want in zip(out, idxs):
            assert abs(gray_to_index(got) - want) <= 1, (gray_to_index(got), want)


def test_get_batch_scaled(clip):
    path, _ = clip
    r = vr.VideoReader(path)
    out = r.get_batch([10, 20], out_hw=(32, 48))
    assert out.shape == (2, 32, 48, 3)
    assert abs(gray_to_index(out[0]) - 10) <= 1


def test_streaming_cursor_reads(clip):
    """Monotonic 2-frame chunk reads (the live_cc pattern) decode correctly."""
    path, _ = clip
    r = vr.VideoReader(path)
    for start in range(0, 40, 2):
        out = r.get_batch([start, start + 1])
        assert abs(gray_to_index(out[0]) - start) <= 1


def test_open_from_bytes(clip):
    """Bytes / remote-loader sources decode identically to path opens
    (reference video_process_patch.py:39-44 remote_loader semantics)."""
    path, frames = clip
    with open(path, "rb") as f:
        blob = f.read()
    r_path = vr.VideoReader(path)
    r_bytes = vr.VideoReader(blob)
    assert len(r_bytes) == len(r_path)
    np.testing.assert_allclose(r_bytes.pts_seconds, r_path.pts_seconds)
    idx = [0, 7, 55, 99]
    np.testing.assert_array_equal(r_bytes.get_batch(idx), r_path.get_batch(idx))
    # callable loader (the reference's remote_loader hook shape)
    r_loader = vr.VideoReader(lambda: blob)
    assert len(r_loader) == len(r_path)
    assert gray_to_index(r_loader.get_batch([42])[0]) == 42


def test_audio_decode_and_resample():
    """Native audio path (decord AudioReader equivalent): decode a WAV to
    mono float at the requested rate; downsampling halves the length."""
    import tempfile
    sr = 16000
    t = np.arange(sr * 2) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/tone.wav"
        vr.encode_test_audio(path, sig, sr)
        out = vr.load_audio(path, sr)
        assert len(out) == len(sig)
        assert np.corrcoef(out, sig)[0, 1] > 0.999
        out8 = vr.load_audio(path, 8000)
        assert abs(len(out8) - sr) < 64


def test_audio_missing_stream(clip):
    path, _ = clip
    with pytest.raises(IOError):
        vr.load_audio(path)   # test clips are video-only


def test_open_bad_bytes():
    with pytest.raises(IOError):
        vr.VideoReader(b"not a video at all" * 10)


def test_bad_file(tmp_path):
    p = tmp_path / "junk.mp4"
    p.write_bytes(b"not a video")
    with pytest.raises(IOError):
        vr.VideoReader(str(p))
