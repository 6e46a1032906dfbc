"""Model-based corpus filters (LM perplexity + LMM talking-head).

Reference:
  * data/production/lm_loss.py — a small causal LM scores each sample's
    ``title(+previous) -> transcript`` conversation with a PER-SAMPLE mean
    CE (:38-52, explicitly not a batch-mean); keep loss in [1.5, 5] (:94-111)
    to drop both trivial and garbage ASR.
  * data/production/distributed_lmm4asd.py — a small Qwen2-VL is asked
    whether the clip is a talking head; the answer probability is read as
    the softmax of the 'Yes' token at the last position (:61-62).

Both run on the TPU stack's own models (any ModelConfig + converted params);
workers shard by stride like every other offline job.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.data import chat
from livecc_tpu.data.tokenizer import Tokenizer
from livecc_tpu.models.qwen2_vl.model import VisionInputs, forward, get_rope_index

Params = dict[str, Any]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _per_sample_ce(params, cfg, ids, labels, pos, mask):
    """Mean CE per sample (not per batch) — lm_loss.py:38-52 semantics."""
    logits, _ = forward(params, cfg, ids, pos, attention_mask=mask)
    shifted = jnp.concatenate([labels[:, 1:], jnp.full_like(labels[:, :1], -100)], axis=1)
    valid = shifted != -100
    safe = jnp.where(valid, shifted, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, logz - gold, 0.0)
    return jnp.sum(ce, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)


def lm_loss_scores(
    params: Params,
    cfg: ModelConfig,
    tokenizer: Tokenizer,
    samples: Sequence[dict],
    *,
    max_len: int = 2048,
) -> np.ndarray:
    """Per-sample CE of transcript given title/previous context.

    ``samples`` rows: {"title": ..., "previous": ..., "transcript": ...}.
    """
    out = []
    for sample in samples:
        context = sample.get("title", "")
        if sample.get("previous"):
            context = sample["previous"]
        turns = [
            {"role": "user", "content": [{"type": "text", "text": context}]},
            {"role": "assistant", "content": [{"type": "text", "text": sample["transcript"]}]},
        ]
        text = chat.render_chat(turns)
        ids = np.asarray(tokenizer.encode(text), np.int32)[:max_len][None]
        labels = np.full_like(ids, -100)
        prefix = np.asarray(tokenizer.encode("assistant\n"), np.int32)
        starts = np.where(ids[0] == cfg.im_start_token_id)[0]
        ends = np.where(ids[0] == cfg.im_end_token_id)[0]
        for st, en in zip(starts, ends):
            span = ids[0, st + 1: st + 1 + len(prefix)]
            if len(span) == len(prefix) and np.array_equal(span, prefix):
                labels[0, st + 1 + len(prefix): en + 1] = ids[0, st + 1 + len(prefix): en + 1]
        s = 1 << (ids.shape[1] - 1).bit_length()
        pad = s - ids.shape[1]
        ids_p = np.pad(ids, ((0, 0), (0, pad)))
        labels_p = np.pad(labels, ((0, 0), (0, pad)), constant_values=-100)
        mask = np.pad(np.ones_like(ids, bool), ((0, 0), (0, pad)))
        pos, _ = get_rope_index(cfg, ids_p)
        loss = _per_sample_ce(params, cfg, jnp.asarray(ids_p), jnp.asarray(labels_p),
                              jnp.asarray(pos), jnp.asarray(mask))
        out.append(float(loss[0]))
    return np.asarray(out)


def lm_loss_keep(scores: np.ndarray, lo: float = 1.5, hi: float = 5.0) -> np.ndarray:
    """Keep mask (lm_loss.py:94-111): drop trivial (<1.5) and garbage (>5)."""
    return (scores >= lo) & (scores <= hi)


def talking_head_prob(
    params: Params,
    cfg: ModelConfig,
    tokenizer: Tokenizer,
    vision: VisionInputs,
    grid: tuple[int, int, int],
    *,
    question: str = "Are the visible people always talking heads? Answer Yes or No.",
) -> float:
    """P('Yes') at the last position (distributed_lmm4asd.py:20-62)."""
    content = [{"type": "video", "video": None}, {"type": "text", "text": question}]
    text = chat.render_chat([{"role": "user", "content": content}], add_generation_prompt=True)
    text = chat.expand_vision_placeholders(text, video_grid_thw=[grid])
    ids = np.asarray(tokenizer.encode(text), np.int32)[None]
    pos, _ = get_rope_index(cfg, ids, video_grid_thw=np.asarray([grid]))
    logits, _ = forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos), vision=vision)
    probs = jax.nn.softmax(logits[0, -1])
    yes_id = tokenizer.encode("Yes")[0]
    return float(probs[yes_id])
