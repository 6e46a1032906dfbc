"""On-chip speculative-decoding measurement (2B, one stream, flash path).

Times the full engine chunk (prefill + decode) under:
  * plain     — the fused decode_chunk (the shipping default);
  * oracle    — speculative with drafts replayed from the plain run
                (acceptance ceiling);
  * ngram     — speculative with the built-in prompt-lookup drafter
                (random weights -> near-zero acceptance; the floor for
                real checkpoints is between ngram and oracle);
  * adversarial — speculative with always-wrong drafts (worst case:
                one dispatch per token, measures per-window overhead).

Text agreement with the plain path is REPORTED, not asserted: the verify
window rides flash_prefill while plain decode rides flash_decode, and with
random weights the near-uniform logits flip argmax on the kernels' ~1e-3
bf16 differences (same class as the int8-weights B=8 caveat in PERF.md and
the reference's own kernel-choice warning, README.md:108). The LOGIC is
exact — proven bit-identical on the fp32 XLA path by
tests/test_speculative.py; trained checkpoints have real logit margins.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_COMPILATION_CACHE_DIR=/tmp/tpu_cache python tools/exp_spec.py
Env: EXP_K (draft length, default 7), EXP_CHUNKS (default 8),
     EXP_MAX_NEW (default 16), EXP_KV (bf16|int8, default bf16).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.data import chat
from livecc_tpu.data.tokenizer import ByteTokenizer
from livecc_tpu.engine import GenerationParams, LiveCCEngine, SpecConfig
from livecc_tpu.models.qwen2_vl.model import init_params
from livecc_tpu.vision_io.patchify import grid_for_frames

K = int(os.environ.get("EXP_K", 7))
N_CHUNKS = int(os.environ.get("EXP_CHUNKS", 8))
MAX_NEW = int(os.environ.get("EXP_MAX_NEW", 16))
KV = {"int8": jnp.int8, "bf16": jnp.bfloat16}[os.environ.get("EXP_KV", "bf16")]
FRAME_HW = (308, 560)


def emit(o):
    print(json.dumps(o), flush=True)


class ReplayDraft:
    """Replays a recorded per-chunk token sequence (oracle acceptance)."""

    def __init__(self, k):
        self.k = k
        self.expected: list[int] = []
        self.base = 0

    def begin_chunk(self, expected, base):
        self.expected, self.base = expected, base

    def propose(self, ids, pad_token_id=0):
        done = len(ids) - self.base
        out = self.expected[done:done + self.k]
        return out + [pad_token_id] * (self.k - len(out))


class WrongDraft:
    def __init__(self, k):
        self.k = k

    def propose(self, ids, pad_token_id=0):
        return [7] * self.k             # ByteTokenizer id 7: never the argmax chain


def chunk_frames(i, rng):
    n = 6 if i == 0 else 2
    h, w = FRAME_HW
    return rng.randint(0, 255, size=(n, h, w, 3), dtype=np.uint8)


def prompt_len(engine, i, t0, t1, q, grid):
    content = [{"type": "text", "text": f"Time={t0:.1f}-{t1:.1f}s"},
               {"type": "video", "video": None}]
    if q is not None:
        content.append({"type": "text", "text": q})
    text = chat.render_chat([{"role": "user", "content": content}],
                            add_generation_prompt=True)
    if i > 0:
        text = chat.strip_system_for_continuation(text, engine.sys_offset)
    text = chat.expand_vision_placeholders(text, video_grid_thw=[grid])
    return len(engine.tokenizer.encode(text))


def run(engine, gen, oracle=None, ref_chunks=None):
    rng = np.random.RandomState(0)
    st = engine.new_stream()
    texts, walls = [], []
    t = 0.0
    chunk_tokens = []          # per-chunk generated ids (for oracle replay)
    for i in range(N_CHUNKS):
        frames = chunk_frames(i, rng)
        t0, t1 = (0.0, 3.0) if i == 0 else (t, t + 1.0)
        q = "Please describe the video." if i == 0 else None
        if oracle is not None:
            grid = grid_for_frames(*frames.shape[:3], engine.cfg.vision)
            npr = prompt_len(engine, i, t0, t1, q, grid)
            oracle.begin_chunk(ref_chunks[i], len(st.past_ids) + npr)
        before = len(st.past_ids)
        w0 = time.perf_counter()
        texts.append(engine.chunk_step(st, frames, t0, t1, q, gen))
        walls.append(time.perf_counter() - w0)
        # recover generated ids: past_ids delta minus prompt + last_token
        grid = grid_for_frames(*frames.shape[:3], engine.cfg.vision)
        npr = prompt_len(engine, i, t0, t1, q, grid)
        gen_ids = st.past_ids[before + npr:] + (
            [st.last_token] if st.last_token >= 0 else [])
        chunk_tokens.append(gen_ids)
        t = t1
    return texts, walls, chunk_tokens


def main():
    assert jax.default_backend() == "tpu"
    cfg = ModelConfig.qwen2_vl_2b()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = jax.block_until_ready(params)
    tok = ByteTokenizer.for_config(cfg)
    gen = GenerationParams(max_new_tokens=MAX_NEW, eos_token_id=cfg.eos_token_id,
                           pad_token_id=cfg.pad_token_id, repetition_penalty=1.05)

    from livecc_tpu.utils.calibrate import calibrate_matmul
    emit({"probe": "cal", **{k: round(v, 1) if isinstance(v, float) else v
                             for k, v in calibrate_matmul().items()}})

    def steady(walls):
        return float(np.median(walls[2:]))

    plain = LiveCCEngine(params, cfg, tok, cache_len=8192, cache_dtype=KV)
    texts_ref, walls, ref_chunks = run(plain, gen)
    # second pass = warm steady state
    texts_ref, walls, ref_chunks = run(plain, gen)
    emit({"probe": "plain_fused", "chunk_walls": [round(w, 4) for w in walls],
          "steady_median_s": round(steady(walls), 4)})

    # High-acceptance regime: repetition_penalty < 1 BOOSTS seen tokens, so
    # greedy chains lock into repeated phrases — the statistical shape of
    # trained commentary (team names, score calls) — and the n-gram drafter
    # predicts them. Honest ceiling demo for the fused path at 2B.
    if os.environ.get("EXP_LOOP_REGIME", "1") == "1":
        gen_loop = GenerationParams(
            max_new_tokens=MAX_NEW, eos_token_id=cfg.eos_token_id,
            pad_token_id=cfg.pad_token_id, repetition_penalty=0.9)
        plain_l = LiveCCEngine(params, cfg, tok, cache_len=8192, cache_dtype=KV)
        _, walls, _ = run(plain_l, gen_loop)
        _, walls, _ = run(plain_l, gen_loop)
        emit({"probe": "plain_loop_regime", "steady_median_s": round(steady(walls), 4)})
        eng_l = LiveCCEngine(params, cfg, tok, cache_len=8192, cache_dtype=KV,
                             spec=SpecConfig(k_draft=K))
        _, walls, _ = run(eng_l, gen_loop)
        _, walls, _ = run(eng_l, gen_loop)
        emit({"probe": "fused_loop_regime", "steady_median_s": round(steady(walls), 4)})

    for name, src in [("fused", None), ("oracle", ReplayDraft(K)),
                      ("ngram", None), ("adversarial", WrongDraft(K))]:
        eng = LiveCCEngine(params, cfg, tok, cache_len=8192, cache_dtype=KV,
                           spec=SpecConfig(k_draft=K, fused=name == "fused"))
        eng.spec_draft_source = src
        oracle = src if name == "oracle" else None
        texts, walls, _ = run(eng, gen, oracle=oracle, ref_chunks=ref_chunks)
        texts, walls, _ = run(eng, gen, oracle=oracle, ref_chunks=ref_chunks)
        acc = eng.metrics.summary("spec_accepted_per_window")
        agree = sum(a == b for a, b in zip(texts, texts_ref))
        emit({"probe": f"spec_{name}", "k": K,
              "chunk_walls": [round(w, 4) for w in walls],
              "steady_median_s": round(steady(walls), 4),
              "windows": acc.get("n"), "accepted_per_window": round(acc.get("mean", 0.0), 2),
              "chunks_matching_plain": f"{agree}/{len(texts)}"})


if __name__ == "__main__":
    main()
