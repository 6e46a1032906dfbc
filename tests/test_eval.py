"""Eval harnesses: MCQ single-forward scoring, benchmark drivers, judge."""

import json
import os

import numpy as np
import pytest

from livecc_tpu.core.config import tiny_config
from livecc_tpu.data.tokenizer import ByteTokenizer
from livecc_tpu.eval import MCQItem, MCQPredictor, letter_token_ids
from livecc_tpu.eval import livesports3kcc, mvbench, ovobench, videomme
from livecc_tpu.models import qwen2_vl as m
from livecc_tpu.vision_io import video_reader as vr

pytestmark = pytest.mark.skipif(not vr.is_available(), reason="native decoder unavailable")

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "hf_tiny.npz")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval")
    vids = []
    for i in range(2):
        path = str(root / f"v{i}.mp4")
        rng = np.random.RandomState(i)
        vr.encode_test_video(path, rng.randint(0, 255, (40, 56, 56, 3), dtype=np.uint8), fps=10)
        vids.append(path)
    g = np.load(GOLDEN)
    cfg = tiny_config()
    state = {k[len("state::"):]: g[k] for k in g.files if k.startswith("state::")}
    params = m.convert_state_dict(state, cfg)
    predictor = MCQPredictor(params, cfg, ByteTokenizer(), max_frames=4)
    return predictor, vids, str(root)


def test_letter_ids_and_prediction(setup):
    predictor, vids, _ = setup
    tok = ByteTokenizer()
    lids = letter_token_ids(tok, ("A", "B", "C", "D"))
    assert lids == [tok.encode(x)[-1] for x in ("A", "B", "C", "D")]
    items = [
        MCQItem(video=vids[0], question="What?", options=["A. x", "B. y", "C. z", "D. w"]),
        MCQItem(video=vids[1], question="Which?", options=["A. 1", "B. 2", "C. 3", "D. 4"]),
    ]
    preds = predictor.predict(items)
    assert len(preds) == 2 and all(p in "ABCD" for p in preds)
    # determinism
    assert predictor.predict(items) == preds


def test_videomme_roundtrip(setup):
    predictor, vids, root = setup
    rows = [
        {"video": vids[i % 2], "question": f"q{i}", "options": ["A. a", "B. b", "C. c", "D. d"],
         "answer": "A", "duration": ["short", "medium", "long"][i % 3],
         "domain": "Sports Competition", "sub_category": "Basketball",
         "task_type": "Action Recognition",
         "video_id": f"vid{i}", "question_id": str(i)}
        for i in range(4)
    ]
    bench = os.path.join(root, "videomme.jsonl")
    with open(bench, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    # two workers, stride-sharded, idempotent merge
    out = os.path.join(root, "vm_out")
    assert videomme.run(predictor, bench, out, worker=0, num_workers=2) is None
    report = videomme.run(predictor, bench, out, worker=1, num_workers=2)
    assert report is not None and "overall" in report and report["n"] == 4
    assert set(report["duration"]) <= {"short", "medium", "long"}
    # official artifacts written alongside
    txt = open(os.path.join(out, "results_no_subtitles.txt")).read()
    assert "Evaluation on the entire dataset" in txt
    assert txt.splitlines()[-1].startswith("Overall: ")
    grouped = json.load(open(os.path.join(out, "results_no_subtitles.json")))
    assert {g["video_id"] for g in grouped} == {f"vid{i}" for i in range(4)}


def test_videomme_letter_extraction():
    f = videomme.extract_letter
    assert f("A") == "A"
    assert f("(B)") == "B"
    assert f("C.") == "C"
    assert f("The answer is: D") == "D"
    assert f("Answer: A because ...") == "A"
    assert f("I think B is right") == "B"
    assert f("") is None


def test_mvbench_roundtrip(setup):
    predictor, vids, root = setup
    rows = [
        {"video": vids[0], "question": "which?", "candidates": ["cat", "dog", "fox"],
         "answer": "dog", "task_type": "Action"},
        {"video": vids[1], "question": "what?", "candidates": ["red", "blue"],
         "answer": "red", "task_type": "Object"},
    ]
    bench = os.path.join(root, "mvbench.jsonl")
    with open(bench, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    report = mvbench.run(predictor, bench, os.path.join(root, "mv_out"))
    assert report and set(report["task_type"]) == {"Action", "Object"}


def test_ovobench_flatten_and_score():
    rows = [
        {"task": "REC", "video": "v.mp4", "test_info": [
            {"question": "count?", "answer": "3", "realtime": 5.0},
            {"question": "count?", "answer": "4", "realtime": 8.0},
        ]},
        {"task": "STU", "video": "v.mp4", "question": "now?", "answer": "Yes", "realtime": 2.0},
    ]
    flat = ovobench.flatten_annotations(rows)
    assert len(flat) == 3
    assert flat[0]["video_end"] == 5.0 and flat[2]["task"] == "STU"
    items = [MCQItem(video="v", question="q", options=[], answer=a, meta={"task": t})
             for a, t in [("3", "REC"), ("4", "REC"), ("Yes", "STU")]]
    report = ovobench.score(items, ["3", "0", "Yes"])
    assert report["task"]["REC"] == 50.0
    assert report["realtime"] == 100.0
    assert report["forward"] == 50.0


def test_degenerate_videos_survive(setup, tmp_path):
    """OVOBench corpora contain <2-frame and sub-FPS clips; the reader must
    inflate frame counts instead of raising (reference
    evaluation/ovobench/distributed_evaluate_ovobench.py:49-56)."""
    predictor, _, _ = setup
    rng = np.random.RandomState(7)
    one = str(tmp_path / "one_frame.mp4")
    vr.encode_test_video(one, rng.randint(0, 255, (1, 56, 56, 3), dtype=np.uint8), fps=10)
    subfps = str(tmp_path / "subfps.mp4")  # 1 fps < budget fps 2
    vr.encode_test_video(subfps, rng.randint(0, 255, (6, 56, 56, 3), dtype=np.uint8), fps=1)
    opts = ["A. x", "B. y", "C. z", "D. w"]
    items = [
        MCQItem(video=one, question="q", options=opts),
        MCQItem(video=subfps, question="q", options=opts),
        # window clamp: start beyond last PTS, end < start (reference :38-42)
        MCQItem(video=subfps, question="q", options=opts, video_start=99.0, video_end=1.0),
        # sub-FPS with a real window
        MCQItem(video=subfps, question="q", options=opts, video_start=0.0, video_end=3.0),
    ]
    for item in items:
        frames = predictor._read_video(item)
        assert frames.ndim == 4 and frames.shape[0] >= 2
    preds = predictor.predict(items)
    assert len(preds) == 4 and all(p in "ABCD" for p in preds)

    # 1-frame window of a 1.2-fps video: the raw-count inflation the
    # reference uses (ovobench :52) degenerates to int(1*2/1.2)=1 and
    # crashes smart_nframes; ours inflates from the clamped count.
    class FractionalFps:
        def __init__(self, inner):
            self._inner = inner
            self.avg_fps = 1.2

        def __getattr__(self, name):
            return getattr(self._inner, name)

    orig_loader = predictor.video_loader
    predictor.video_loader = lambda p: FractionalFps(orig_loader(p))
    try:
        item = MCQItem(video=subfps, question="q", options=opts,
                       video_start=0.9, video_end=1.9)
        frames = predictor._read_video(item)
        assert frames.ndim == 4 and frames.shape[0] >= 2
    finally:
        predictor.video_loader = orig_loader


def test_livesports_cc_generation_and_judge(setup, tmp_path):
    from livecc_tpu.engine import LiveCCEngine

    predictor, vids, root = setup
    engine = LiveCCEngine(predictor.params, predictor.cfg, ByteTokenizer(), cache_len=512)
    events = [
        {"video_id": "v0", "event_id": "e0", "begin": 0.0, "end": 4.0,
         "title": "Game", "preASR": "previously...", "video": vids[0]},
    ]

    def read_clip(event):
        rng = np.random.RandomState(0)
        return rng.randint(0, 255, (8, 28, 28, 3), dtype=np.uint8)

    merged = livesports3kcc.generate(engine, events, str(tmp_path), read_clip=read_clip,
                                     max_new_tokens=4)
    assert merged and os.path.exists(merged)
    rows = [json.loads(l) for l in open(merged)]
    assert rows[0]["event_id"] == "e0" and isinstance(rows[0]["pred"], str)
    # resume: second call does no work but returns the merged file
    assert livesports3kcc.generate(engine, events, str(tmp_path), read_clip=read_clip) == merged

    # judge with a deterministic fake LLM preferring the longer commentary
    llm = lambda prompt: "A" if len(prompt.split("Commentary A: ")[1].split("\n")[0]) >= \
        len(prompt.split("Commentary B: ")[1].split("\n")[0]) else "B"
    rate = livesports3kcc.win_rate(
        llm, {"e0": "long detailed commentary"}, {"e0": "short"}, {"e0": "ground truth"}
    )
    assert rate == 1.0


def test_eval_cli_videomme_and_cc(setup, tmp_path):
    """The per-benchmark CLI (reference: torchrun scripts) end to end with
    the tiny random model."""
    from livecc_tpu.eval import cli as ecli

    predictor, vids, root = setup
    rows = [
        {"video": vids[i % 2], "question": f"q{i}", "options": ["A. a", "B. b", "C. c", "D. d"],
         "answer": "A", "duration": "short", "domain": "Sports Competition",
         "sub_category": "Basketball", "task_type": "Action Recognition",
         "video_id": f"v{i}", "question_id": str(i)}
        for i in range(2)
    ]
    bench = str(tmp_path / "vm.jsonl")
    with open(bench, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    report = ecli.main(["videomme", "--benchmark", bench,
                        "--output_dir", str(tmp_path / "vm_out"), "--max_frames", "4"])
    assert report and "overall" in report

    events = [{"video_id": "v0", "event_id": "e0", "begin": 0.0, "end": 2.0,
               "title": "Game", "preASR": "so far...", "video": vids[0]}]
    epath = str(tmp_path / "events.jsonl")
    with open(epath, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    merged = ecli.main(["livesports3kcc", "--events", epath,
                        "--output_dir", str(tmp_path / "cc_out"),
                        "--max_new_tokens", "4"])
    assert merged and os.path.exists(merged)


def test_prompt_and_join():
    q = livesports3kcc.build_commentary_query("Match", "he shoots", instruct=True)
    assert "Match" in q and "he shoots" in q and "commentator" in q
    joined = livesports3kcc.join_commentary([[0, 1, "hello ..."], [1, 2, " ..."], [2, 3, "world"]])
    assert joined == "hello world"


def test_mvbench_frame_directory(setup, tmp_path):
    from PIL import Image

    predictor, _, _ = setup
    frame_dir = tmp_path / "frames"
    frame_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(10):
        Image.fromarray(rng.randint(0, 255, (56, 56, 3), dtype=np.uint8)).save(
            frame_dir / f"{i:03d}.jpg")
    item = MCQItem(video=str(frame_dir), question="q",
                   options=["A. a", "B. b", "C. c", "D. d"])
    preds = predictor.predict([item])
    assert preds[0] in "ABCD"


def test_mcq_batched_forward_matches_single(setup):
    predictor, vids, _ = setup
    items = [
        MCQItem(video=vids[0], question="What?", options=["A. x", "B. y", "C. z", "D. w"]),
        MCQItem(video=vids[1], question="Which?", options=["A. 1", "B. 2", "C. 3", "D. 4"]),
    ]
    single = predictor.predict(items, batch_size=1)
    batched = predictor.predict(items, batch_size=2)
    assert batched == single


def test_livesports3kqa_roundtrip(setup, tmp_path):
    """C15: QA harness end-to-end — sharded predict, merge, per-q_type + OCR
    report (reference distributed_evaluate_livesports3kqa.py:7-28)."""
    from livecc_tpu.eval import livesports3kqa

    predictor, vids, _ = setup
    bench = str(tmp_path / "ls3kqa.jsonl")
    rows = [
        {"video": vids[i % 2], "question": f"q{i}",
         "options": ["A. a", "B. b", "C. c", "D. d"], "answer": "A",
         "q_type": ["Event", "Entity"][i % 2], "ocr": i % 3 == 0,
         "begin": 0.0, "end": 2.0}
        for i in range(4)
    ]
    with open(bench, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = str(tmp_path / "out")
    # worker 1 first: partial shards return None (resume semantics)
    assert livesports3kqa.run(predictor, bench, out, worker=1, num_workers=2) is None
    report = livesports3kqa.run(predictor, bench, out, worker=0, num_workers=2)
    assert report is not None
    assert set(report["q_type"]) == {"Event", "Entity"}
    assert report["n"] == 4 and 0.0 <= report["overall"] <= 100.0
    assert 0.0 <= report["ocr_subset"] <= 100.0
    # idempotent resume: rerun merges existing shards without predicting
    report2 = livesports3kqa.run(predictor, bench, out, worker=0, num_workers=2)
    assert report2 == report


REF_JUDGES = "/root/reference/evaluation/livesports3kcc/judges"


@pytest.mark.skipif(not os.path.isdir(REF_JUDGES), reason="reference judges absent")
def test_livesports3kcc_win_rate_parity_vs_committed():
    """Our win-rate tally reproduces the reference's committed judge logs
    byte-for-byte (judges/log.txt: 47.24% Instruct, 47.21% Base) from its
    committed per-event winner records — the cheapest end-to-end parity
    evidence for the CC judging stack."""
    from livecc_tpu.eval import livesports3kcc

    expected = open(os.path.join(REF_JUDGES, "log.txt")).read().splitlines()
    for model_id, line in [("LiveCC-7B-Instruct", expected[0]), ("LiveCC-7B-Base", expected[1])]:
        path = os.path.join(REF_JUDGES, f"GPT-4o_{model_id}.jsonl")
        records = [json.loads(l) for l in open(path) if l.strip()]
        got = livesports3kcc.win_rate_log_line(records, model_id, "GPT-4o")
        assert got == line, (got, line)
