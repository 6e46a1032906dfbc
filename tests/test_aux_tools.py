"""Aux pipeline: ASD tracking/windowing, ASR sharding, subtitles, captions, metrics."""

import json
import os

import numpy as np
import pytest

from livecc_tpu.tools import asd, asr
from livecc_tpu.eval import subtitles


def test_box_iou_and_nms():
    a = np.asarray([[0, 0, 10, 10]], float)
    b = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], float)
    ious = asd.box_iou(a, b)[0]
    assert ious[0] == pytest.approx(1.0)
    assert ious[1] == pytest.approx(25 / 175)
    assert ious[2] == 0.0
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], float)
    keep = asd.nms(boxes, np.asarray([0.9, 0.8, 0.7]))
    assert list(keep) == [0, 2]


def test_face_tracker_association():
    tr = asd.FaceTracker(iou_threshold=0.3)
    # two faces moving slowly; one disappears
    for i in range(5):
        boxes = [[0 + i, 0, 10 + i, 10], [50, 50, 60, 60]]
        if i >= 3:
            boxes = boxes[:1]
        tr.update(i, np.asarray(boxes, float))
    lens = sorted(len(t.frames) for t in tr.tracks)
    assert len(tr.tracks) == 2 and lens == [3, 5]


def test_windowing_and_ratio():
    assert asd.window_indices(2000) == [(0, 150), (750, 900), (1500, 1650)]
    frames = np.zeros((300, 16, 16, 3), np.uint8)
    # a single steady face that the scorer calls 'talking'
    detect = lambda f: (np.asarray([[2, 2, 10, 10]], float), np.asarray([0.9]))
    ratio = asd.talking_ratio(frames, detect, lambda t, f: 0.9, window=100, stride=150)
    assert ratio == 1.0
    assert not asd.keep_clip(ratio)
    ratio2 = asd.talking_ratio(frames, detect, lambda t, f: 0.1, window=100, stride=150)
    assert ratio2 == 0.0 and asd.keep_clip(ratio2)


def test_mfcc_shape():
    audio = np.sin(np.linspace(0, 1000, 16000)).astype(np.float32)
    feats = asd.mfcc(audio)
    assert feats.shape[1] == 13 and np.isfinite(feats).all()


def test_asr_sharding_and_resume(tmp_path):
    # node-level contiguous chunks, worker stride within
    idx = asr.node_worker_shard(10, worker=0, num_workers=2, node=0, num_nodes=2)
    assert idx == [0, 2, 4]
    idx = asr.node_worker_shard(10, worker=1, num_workers=2, node=1, num_nodes=2)
    assert idx == [6, 8]
    calls = []
    fake = lambda p: (calls.append(p) or [(0.0, 0.5, "hi")])
    vids = [f"v{i}.mp4" for i in range(4)]
    outs = asr.transcribe_corpus(vids, fake, str(tmp_path), worker=0, num_workers=1)
    assert len(outs) == 4 and len(calls) == 4
    # resume: nothing re-transcribed
    calls.clear()
    asr.transcribe_corpus(vids, fake, str(tmp_path))
    assert calls == []
    words = json.load(open(outs[0]))
    assert words == [[0.0, 0.5, "hi"]]


def test_srt_parse_and_merge(tmp_path):
    srt = tmp_path / "vid1.srt"
    srt.write_text(
        "1\n00:00:01,000 --> 00:00:02,500\nHello <i>world</i>\n\n"
        "2\n00:00:03,000 --> 00:00:04,000\nsecond line\n"
    )
    entries = subtitles.parse_srt(str(srt))
    assert entries[0]["start"] == 1.0 and entries[0]["text"] == "Hello world"
    bench = tmp_path / "b.jsonl"
    bench.write_text(json.dumps({"video_id": "vid1", "question": "q"}) + "\n" +
                     json.dumps({"video_id": "vid2", "question": "q"}) + "\n")
    out = tmp_path / "b_sub.jsonl"
    n = subtitles.add_subtitles(str(bench), str(tmp_path), str(out))
    assert n == 1
    rows = [json.loads(l) for l in open(out)]
    assert "Hello world" in rows[0]["subtitles"] and "subtitles" not in rows[1]


def test_caption_generation(tmp_path):
    from livecc_tpu.core.config import tiny_config
    from livecc_tpu.data.tokenizer import ByteTokenizer
    from livecc_tpu.engine import LiveCCEngine
    from livecc_tpu.eval.captions import generate_captions
    from livecc_tpu.models import qwen2_vl as m

    g = np.load(os.path.join(os.path.dirname(__file__), "goldens", "hf_tiny.npz"))
    cfg = tiny_config()
    state = {k[len("state::"):]: g[k] for k in g.files if k.startswith("state::")}
    params = m.convert_state_dict(state, cfg)
    engine = LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=512)
    events = [{"video_id": "v", "event_id": "e0"}]
    read_clip = lambda e: np.random.RandomState(0).randint(0, 255, (4, 28, 28, 3), dtype=np.uint8)
    merged = generate_captions(engine, events, str(tmp_path), read_clip=read_clip,
                               max_new_tokens=4)
    assert merged
    row = json.loads(open(merged).readline())
    assert row["event_id"] == "e0" and isinstance(row["caption"], str)


def test_latency_tracker():
    from livecc_tpu.utils.metrics import LatencyTracker

    tr = LatencyTracker()
    for v in (0.1, 0.2, 0.3):
        tr.record("x", v)
    with tr.measure("y"):
        pass
    s = tr.summary()
    assert s["x"]["n"] == 3 and abs(s["x"]["p50"] - 0.2) < 1e-6
    assert "y" in s


def test_lightasd_scores():
    import jax

    from livecc_tpu.tools.lightasd import init_lightasd_params, lightasd_scores, track_score

    params = init_lightasd_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    faces = rng.rand(1, 12, 112, 112).astype(np.float32)
    audio = np.sin(np.linspace(0, 500, 12 * 640)).astype(np.float32)
    feats = asd.mfcc(audio)[: 4 * 12]
    logits = lightasd_scores(params, faces, feats[None])
    assert logits.shape == (1, 12) and np.isfinite(np.asarray(logits)).all()
    p = track_score(params, faces[0], feats)
    assert 0.0 <= p <= 1.0


def test_scrfd_shapes_and_decode(tmp_path):
    """SCRFD forward emits per-stride anchor grids; decode matches the
    reference's center -+ distance*stride construction (face_detector.py:52-55)."""
    import jax
    from livecc_tpu.tools import scrfd

    cfg = scrfd.ScrfdConfig(score_threshold=0.0)
    params = scrfd.init_scrfd_params(cfg, jax.random.PRNGKey(0))
    h, w = 160, 288                      # reference detection resolution
    frames = np.random.RandomState(0).randint(0, 255, (2, h, w, 3), np.uint8)
    outs = scrfd.scrfd_forward(params, cfg, frames)
    assert len(outs) == len(cfg.strides)
    for (score, bbox), stride in zip(outs, cfg.strides):
        n = (h // stride) * (w // stride) * cfg.num_anchors
        assert score.shape == (2, n) and bbox.shape == (2, n, 4)
        assert float(np.min(np.asarray(score))) >= 0.0
        assert float(np.max(np.asarray(score))) <= 1.0

    # decode: a hand-built single detection at a known anchor
    level_outputs = []
    for (score, bbox), stride in zip(outs, cfg.strides):
        s = np.zeros(score.shape[1], np.float32)
        b = np.zeros((score.shape[1], 4), np.float32)
        level_outputs.append((s, b))
    # put one hit on stride-8 anchor index 5 with distances (1, 2, 3, 4)
    level_outputs[0][0][5] = 0.9
    level_outputs[0][1][5] = [1, 2, 3, 4]
    cfg_t = scrfd.ScrfdConfig(score_threshold=0.5)
    boxes, scores = scrfd.decode_detections(cfg_t, level_outputs, h, w)
    centers = scrfd.anchor_centers(h, w, 8, cfg.num_anchors)
    cx, cy = centers[5]
    assert boxes.shape == (1, 4) and scores.shape == (1,)
    np.testing.assert_allclose(
        boxes[0], [cx - 8, cy - 16, cx + 24, cy + 32], atol=1e-5
    )

    # anchor construction parity with the reference formula
    ref = np.stack(np.mgrid[: h // 16, : w // 16][::-1], axis=-1).astype(np.float32)
    ref = (ref * 16).reshape(-1, 2)
    ref = np.stack([ref] * cfg.num_anchors, axis=1).reshape(-1, 2)
    np.testing.assert_array_equal(scrfd.anchor_centers(h, w, 16, cfg.num_anchors), ref)


def test_scrfd_decode_non_stride_multiple_frame():
    """Frames whose H/W is not a multiple of 32: the SAME-padded conv chain
    emits ceil-sized feature maps, so the anchor grid must be ceil-sized too
    (ADVICE r2: floor-divided anchors made boxes[keep] raise IndexError)."""
    import jax
    from livecc_tpu.tools import scrfd

    cfg = scrfd.ScrfdConfig(score_threshold=0.0)
    params = scrfd.init_scrfd_params(cfg, jax.random.PRNGKey(0))
    h, w = 150, 250                       # not multiples of any stride
    frame = np.random.RandomState(0).randint(0, 255, (1, h, w, 3), np.uint8)
    outs = scrfd.scrfd_forward(params, cfg, frame)
    for (score, bbox), stride in zip(outs, cfg.strides):
        n = -(-h // stride) * (-(-w // stride)) * cfg.num_anchors
        assert score.shape == (1, n)
        centers = scrfd.anchor_centers(h, w, stride, cfg.num_anchors)
        assert centers.shape == (n, 2)
    level_outputs = [(np.asarray(s[0]), np.asarray(b[0])) for s, b in outs]
    boxes, scores = scrfd.decode_detections(cfg, level_outputs, h, w)
    assert boxes.shape[0] == scores.shape[0]     # no IndexError, aligned


def test_scrfd_detector_pipeline_roundtrip(tmp_path):
    """make_detector feeds talking_ratio end-to-end; weights round-trip npz."""
    import jax
    from livecc_tpu.tools import scrfd

    cfg = scrfd.ScrfdConfig(score_threshold=0.0, nms_threshold=0.4)
    params = scrfd.init_scrfd_params(cfg, jax.random.PRNGKey(1))
    path = str(tmp_path / "scrfd.npz")
    scrfd.save_npz(path, params)
    loaded = scrfd.load_npz(path, cfg)
    for (ka, va), (kb, vb) in zip(scrfd._iter_leaves(params), scrfd._iter_leaves(loaded)):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    detect = scrfd.make_detector(loaded, cfg)
    frames = np.random.RandomState(2).randint(0, 255, (6, 64, 96, 3), np.uint8)
    boxes, scores = detect(frames[0])
    assert boxes.ndim == 2 and boxes.shape[1] == 4 and len(boxes) == len(scores)
    # threshold 0 keeps everything pre-NMS; NMS must have pruned overlaps
    total = sum((64 // s) * (96 // s) * cfg.num_anchors for s in cfg.strides)
    assert 0 < len(boxes) <= total

    ratio = asd.talking_ratio(
        frames, detect, score_track=lambda track, fr: 0.0,
        window=3, stride=3, min_track_len=1,
    )
    assert ratio == 0.0


def test_full_asd_chain_scrfd_tracker_lightasd():
    """The complete ASD filter chain exactly as the reference composes it
    (main.py:39-66): SCRFD detection -> IoU tracking -> grayscale face
    tubes + MFCC -> Light-ASD scoring -> talking ratio -> keep decision."""
    import jax
    from livecc_tpu.tools import scrfd
    from livecc_tpu.tools.lightasd import init_lightasd_params, track_score

    det_cfg = scrfd.ScrfdConfig(score_threshold=0.4)
    det_params = scrfd.init_scrfd_params(det_cfg, jax.random.PRNGKey(0))
    detect = scrfd.make_detector(det_params, det_cfg)
    asd_params = init_lightasd_params(jax.random.PRNGKey(1))

    rng = np.random.RandomState(5)
    frames = rng.randint(0, 255, (8, 64, 96, 3), np.uint8)
    audio = np.sin(np.linspace(0, 900, 8 * 640)).astype(np.float32)
    feats = asd.mfcc(audio)

    def score_track(track, all_frames):
        # grayscale 112x112 face tube from the track's boxes (main.py:39-47)
        tube = []
        for fi, box in zip(track.frames, track.boxes):
            x1, y1, x2, y2 = [int(v) for v in box]
            h_f, w_f = all_frames.shape[1], all_frames.shape[2]
            x1 = min(max(x1, 0), w_f - 1)
            y1 = min(max(y1, 0), h_f - 1)
            x2 = min(max(x2, x1 + 1), w_f)
            y2 = min(max(y2, y1 + 1), h_f)
            crop = all_frames[fi, y1:y2, x1:x2].mean(axis=-1) / 255.0
            yy = np.clip((np.linspace(0, crop.shape[0] - 1, 112)).astype(int), 0, crop.shape[0] - 1)
            xx = np.clip((np.linspace(0, crop.shape[1] - 1, 112)).astype(int), 0, crop.shape[1] - 1)
            tube.append(crop[np.ix_(yy, xx)])
        faces = np.stack(tube).astype(np.float32)
        n = min(len(faces) * 4, len(feats))
        return track_score(asd_params, faces, feats[:n])

    ratio = asd.talking_ratio(frames, detect, score_track,
                              window=4, stride=4, min_track_len=1)
    assert 0.0 <= ratio <= 1.0
    assert asd.keep_clip(ratio) in (True, False)
