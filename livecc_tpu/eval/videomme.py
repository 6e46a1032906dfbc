"""VideoMME benchmark harness + scorer.

Reference: evaluation/videomme/distributed_evaluate_videomme.py (driver) and
evaluation/videomme/eval_your_results.py (official scorer semantics): letter
extraction from free-form answers, accuracy overall and by duration
(short/medium/long), domain, sub-category and task type.

Benchmark rows (JSONL): {video_id, duration, domain, sub_category, videoID,
task_type, question_id, question, options: ["A. ...", ...], answer,
video (local path), subtitles (optional)}.
"""

from __future__ import annotations

import json
import os
import re
from collections import defaultdict
from typing import Optional, Sequence

from livecc_tpu.eval.mcq import MCQItem, MCQPredictor, shard_indices

LETTERS = ("A", "B", "C", "D")


def load_items(path: str, with_subtitles: bool = False) -> list[MCQItem]:
    items = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            items.append(MCQItem(
                video=row["video"],
                question=row["question"],
                options=row["options"],
                answer=row.get("answer"),
                subtitles=row.get("subtitles") if with_subtitles else None,
                meta={k: row.get(k) for k in
                      ("video_id", "duration", "domain", "sub_category", "task_type", "question_id")},
            ))
    return items


def extract_letter(response: str, letters: Sequence[str] = LETTERS) -> str | None:
    """Official scorer's robust letter extraction (eval_your_results.py:66-90
    behavior): accept 'A', 'A.', '(A)', 'Answer: A', ... first match wins."""
    if not response:
        return None
    response = response.strip()
    group = "".join(letters)
    for pattern in (
        rf"^\(?([{group}])\)?[.:,)]?$",
        rf"[Aa]nswer\s*(?:is)?\s*:?\s*\(?([{group}])\)?",
        rf"^\(?([{group}])\)?[.:,)]",
        rf"\b([{group}])\b",
    ):
        m = re.search(pattern, response)
        if m:
            return m.group(1)
    return None


def score(items: list[MCQItem], predictions: list[str]) -> dict:
    """Accuracy report grouped the way the official scorer reports."""
    overall = defaultdict(lambda: [0, 0])
    groups = {"duration": defaultdict(lambda: [0, 0]),
              "domain": defaultdict(lambda: [0, 0]),
              "sub_category": defaultdict(lambda: [0, 0]),
              "task_type": defaultdict(lambda: [0, 0])}
    for item, pred in zip(items, predictions):
        letter = extract_letter(pred) or ""
        correct = int(letter == item.answer)
        overall["all"][0] += correct
        overall["all"][1] += 1
        for key, table in groups.items():
            val = item.meta.get(key)
            if val is not None:
                table[val][0] += correct
                table[val][1] += 1
    def pct(c, n):
        return round(100.0 * c / n, 1) if n else 0.0
    report = {"overall": pct(*overall["all"]), "n": overall["all"][1]}
    for key, table in groups.items():
        report[key] = {k: pct(c, n) for k, (c, n) in sorted(table.items())}
    return report


def run(
    predictor: MCQPredictor,
    benchmark_path: str,
    output_dir: str,
    *,
    with_subtitles: bool = False,
    worker: int = 0,
    num_workers: int = 1,
    batch_size: int = 1,
) -> Optional[dict]:
    """Shard-predict-merge-score. Returns the report on worker 0 once all
    shards exist (idempotent resume via per-shard files, the reference's
    per-idx output pattern)."""
    os.makedirs(output_dir, exist_ok=True)
    items = load_items(benchmark_path, with_subtitles)
    idxs = shard_indices(len(items), worker, num_workers)
    shard_file = os.path.join(output_dir, f"videomme_shard{worker}.json")
    if not os.path.exists(shard_file):
        preds = predictor.predict([items[i] for i in idxs], letters=LETTERS, batch_size=batch_size)
        with open(shard_file, "w") as f:
            json.dump({str(i): p for i, p in zip(idxs, preds)}, f)
    merged: dict[int, str] = {}
    for w in range(num_workers):
        path = os.path.join(output_dir, f"videomme_shard{w}.json")
        if not os.path.exists(path):
            return None  # other shards still running
        with open(path) as f:
            merged.update({int(k): v for k, v in json.load(f).items()})
    predictions = [merged[i] for i in range(len(items))]
    report = score(items, predictions)
    tag = "with_subtitles" if with_subtitles else "no_subtitles"
    with open(os.path.join(output_dir, f"videomme_{tag}.json"), "w") as f:
        json.dump({"report": report, "predictions": predictions}, f, indent=2)
    return report
