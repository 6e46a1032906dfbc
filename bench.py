"""Streaming-commentary benchmark: p50 per-2-frame chunk latency.

Measures the reference's north-star serving metric (BASELINE.md: p50
per-2-frame commentary chunk latency < 2 s on v5e): one full interleave step
— host tokenize + patchify, 2 new 720p-budget frames prefilled into the
growing KV cache, 16 tokens decoded on device — on a random-init Qwen2-VL-2B
in bf16 (the largest family member that fits one chip; the 7B path is the
same program under model-axis sharding).

Prints ONE JSON line:
  {"metric": ..., "value": p50 seconds, "unit": "s", "vs_baseline": 2.0/p50}
(vs_baseline > 1 means faster than the 2 s budget.)

Run on TPU (default env) or CPU (reduced-depth config, for smoke).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    from livecc_tpu.core.config import ModelConfig, tiny_config
    from livecc_tpu.data.tokenizer import ByteTokenizer
    from livecc_tpu.engine import GenerationParams, LiveCCEngine
    from livecc_tpu.models.qwen2_vl.model import init_params

    if on_tpu:
        cfg = ModelConfig.qwen2_vl_2b()
        n_timed = 20
        frame_hw = (308, 560)    # 720p after the live max_pixels budget
    else:  # tiny config for CPU smoke runs (this host is 1 throttled vCPU)
        cfg = tiny_config()
        n_timed = 3
        frame_hw = (56, 56)

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = jax.block_until_ready(params)
    engine = LiveCCEngine(
        params, cfg, ByteTokenizer.for_config(cfg), cache_len=8192, cache_dtype=jnp.bfloat16
    )
    gen = GenerationParams(
        max_new_tokens=16,
        eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id,
        repetition_penalty=1.05,
    )

    # 720p stream at the reference live budget (max_pixels=384*28*28,
    # demo/infer.py:66): 1280x720 -> 560x308 resized -> 2-frame chunk of
    # (1, 22, 40) grid = 880 patches = 220 LLM tokens.
    rng = np.random.RandomState(0)
    h, w = frame_hw
    frames = lambda n, s: rng.randint(0, 255, size=(n, h, w, 3), dtype=np.uint8)

    state = engine.new_stream()
    # initial 3 s chunk (6 frames) + query — also warms the init-bucket compile
    engine.chunk_step(state, frames(6, 0), 0.0, 3.0, "Please describe the video.", gen)
    # warm the steady-state chunk shapes
    for i in range(2):
        t0 = 3.0 + i
        engine.chunk_step(state, frames(2, i + 1), t0, t0 + 1.0, None, gen)

    lat = []
    t_base = 5.0
    for i in range(n_timed):
        clip = frames(2, 100 + i)
        t0 = time.perf_counter()
        text = engine.chunk_step(state, clip, t_base + i, t_base + i + 1.0, None, gen)
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat, 50))
    result = {
        "metric": f"p50_per_2frame_chunk_latency_{cfg.name}_{backend}",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(2.0 / p50, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
