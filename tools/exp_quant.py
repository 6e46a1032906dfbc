"""On-chip A/B: weight-only int8 vs bf16 weights on the decode hot path.

Decode at small batch is weight-HBM-bound (the whole LLM streams through
the MXU per step); int8 weights halve that traffic (ops/quant.py). This
times the fused 16-token decode_chunk at B in {1, 8} for both weight
formats in ONE session (the chip is time-shared; only same-session A/Bs
are valid, CLAUDE.md) and checks the argmax chains agree.

Usage: PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/tpu_cache \
       python tools/exp_quant.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.engine.generation import GenerationParams, decode_chunk
from livecc_tpu.models.qwen2_vl.model import init_params
from livecc_tpu.models.qwen2_vl.text import KVCache
from livecc_tpu.ops.quant import quantize_model_params


def main():
    cfg = ModelConfig.qwen2_vl_2b()
    v = cfg.text.vocab_size
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = quantize_model_params(params)
    params, qparams = jax.block_until_ready((params, qparams))
    gen = GenerationParams(max_new_tokens=16, eos_token_id=cfg.eos_token_id,
                           pad_token_id=cfg.pad_token_id, repetition_penalty=1.05)
    use_flash = jax.default_backend() == "tpu"
    rng = np.random.RandomState(0)
    results = {}
    toks_by = {}
    for b in (1, 8):
        logits = rng.randn(b, v).astype(np.float32)
        logits[:, cfg.eos_token_id] = -100.0              # decode all 16 steps

        def run(p):
            cache = KVCache.zeros(cfg.text, b, 2048, jnp.int8)
            counts = jnp.zeros((b, v), jnp.int32)
            toks, *_ = decode_chunk(
                p, cfg, gen, jnp.asarray(logits), cache, counts,
                jnp.zeros((b, 1), jnp.int32), jax.random.PRNGKey(1),
                use_flash=use_flash,
            )
            return np.asarray(toks)

        for name, p in [("bf16", params), ("int8", qparams)]:
            toks_by[name] = run(p)                         # compile+warm
            walls = []
            for _ in range(7):
                t0 = time.perf_counter()
                run(p)
                walls.append(time.perf_counter() - t0)
            results[f"decode16_B{b}_{name}_s"] = round(float(np.median(walls)), 4)
        agree = float((toks_by["bf16"] == toks_by["int8"]).mean())
        results[f"B{b}_token_agreement"] = round(agree, 3)

    # Engine-level tick (ViT prefill + LLM prefill + fused decode) — the
    # ViT weights are quantized too, so the tick A/B captures prefill.
    # Reuse ONE param tree and drop the other format first: two 2B bf16
    # trees + one int8 tree + caches exceed the 16 GiB chip.
    from livecc_tpu.data.tokenizer import ByteTokenizer
    from livecc_tpu.engine import LiveCCEngine

    del qparams
    frames = rng.randint(0, 255, size=(2, 448, 448, 3), dtype=np.uint8)
    for name, quant in [("bf16", False), ("int8", True)]:
        eng = LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=8192,
                           cache_dtype=jnp.int8, quantize_weights=quant)
        st = eng.new_stream()
        eng.chunk_step(st, frames, 0.0, 2.0, "describe", gen)  # compile+warm
        walls = []
        for i in range(6):
            t0 = time.perf_counter()
            eng.chunk_step(st, frames, 2.0 * (i + 1), 2.0 * (i + 2), None, gen)
            walls.append(time.perf_counter() - t0)
        results[f"tick_{name}_s"] = round(float(np.median(walls)), 4)
        del eng, st
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
