"""Word-timestamped ASR stage for SFT data (WhisperX pipeline structure).

Reference: data/production/distributed_whisperx.py — faster-whisper
large-v3-turbo with word timestamps (:7-23), audio via decord AudioReader,
node(ARNOLD_ID) x worker x chunk sharding (:40-63). CTranslate2 is not in
this image, so the transcription model is a pluggable callable; the sharding
math, audio extraction contract, and output format (word triples consumed by
tools.production) are implemented and tested here.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

Word = tuple[float, float, str]

# transcribe(audio_path_or_video_path) -> [(start, end, word), ...]
Transcriber = Callable[[str], list[Word]]


def node_worker_shard(
    n_items: int,
    *,
    worker: int,
    num_workers: int,
    node: Optional[int] = None,
    num_nodes: int = 1,
) -> list[int]:
    """Two-level sharding: contiguous node chunks, strided workers within
    (distributed_whisperx.py:40-63 semantics). ``node`` defaults to the
    ARNOLD_ID env var the reference uses."""
    if node is None:
        node = int(os.environ.get("ARNOLD_ID", 0))
    per_node = (n_items + num_nodes - 1) // num_nodes
    lo = node * per_node
    hi = min(lo + per_node, n_items)
    return list(range(lo + worker, hi, num_workers))


def transcribe_corpus(
    video_paths: Sequence[str],
    transcriber: Transcriber,
    output_dir: str,
    *,
    worker: int = 0,
    num_workers: int = 1,
    node: Optional[int] = None,
    num_nodes: int = 1,
) -> list[str]:
    """Run ASR over a shard of videos; one JSON per video (idempotent)."""
    os.makedirs(output_dir, exist_ok=True)
    done = []
    for i in node_worker_shard(len(video_paths), worker=worker, num_workers=num_workers,
                               node=node, num_nodes=num_nodes):
        path = video_paths[i]
        out = os.path.join(output_dir, os.path.basename(path) + ".words.json")
        if not os.path.exists(out):
            words = transcriber(path)
            with open(out, "w") as f:
                json.dump([[ws, we, w] for ws, we, w in words], f)
        done.append(out)
    return done
