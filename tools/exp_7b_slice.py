"""Depth-reduced TRUE-7B-width serving cost on the single chip.

The product model is the 7B (reference demo/infer.py:43-47); this image has
one v5e chip, so full-depth 7B serving rides the TP=4 plan
(parallel/memory.py:serving_plan). Everything TP-shardable scales ~1/TP,
but the analytic projection was budget arithmetic only (VERDICT r3 weak
#6). This module measures the real per-layer cost at width — hidden 3584,
28 q / 4 kv heads (head_dim 128), intermediate 18944, vocab 152064 — on a
depth-2 slice that fits the chip, so the 28-layer projection is
measurement-derived. Used by bench.py:bench_7b_slice; results in PERF.md.

All timed programs are FUSED single dispatches (decode_chunk runs its
whole token loop on device) — per-dispatch relay RTT here is ~1.8 ms,
which would swamp a per-token measurement.

Standalone: PYTHONPATH=/root/repo:/root/.axon_site \
            JAX_COMPILATION_CACHE_DIR=/tmp/tpu_cache python tools/exp_7b_slice.py
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.engine.generation import GenerationParams, decode_chunk, prefill
from livecc_tpu.models.qwen2_vl.text import KVCache


def width7b(depth: int) -> ModelConfig:
    """True 7B layer widths, depth-reduced (1 ViT block keeps init cheap —
    the ViT is not what these probes time)."""
    full = ModelConfig.qwen2_vl_7b()
    return dataclasses.replace(
        full,
        vision=dataclasses.replace(full.vision, depth=1),
        text=dataclasses.replace(full.text, num_hidden_layers=depth),
        name=f"qwen2-vl-7b-w-d{depth}",
    )


def _gen(steps: int, cfg: ModelConfig) -> GenerationParams:
    # eos that never fires: the fused loop runs all `steps` forwards
    return GenerationParams(max_new_tokens=steps + 1, eos_token_id=-1,
                            pad_token_id=cfg.pad_token_id)


def _mid_cache(cfg: ModelConfig, batch: int, cache_len: int, kv_depth: int,
               dtype=jnp.bfloat16) -> KVCache:
    """Cache seated at a realistic serving depth (attention spans kv_depth)."""
    cache = KVCache.zeros(cfg.text, batch, cache_len, dtype)
    return dataclasses.replace(
        cache, offset=jnp.full((batch,), kv_depth, jnp.int32))


def time_decode(params, cfg: ModelConfig, cache_len: int, batch: int,
                steps: int, kv_depth: int = 4096, use_flash: bool = True) -> float:
    """Seconds per decoded token at `batch` streams (fused loop, greedy)."""
    v = cfg.text.vocab_size
    gen = _gen(steps, cfg)
    rng = jax.random.PRNGKey(0)

    def run():
        cache = _mid_cache(cfg, batch, cache_len, kv_depth)
        counts = jnp.zeros((batch, v), jnp.int32)
        logits0 = jnp.zeros((batch, v), jnp.float32)
        delta = jnp.zeros((batch, 1), jnp.int32)
        tokens, n, _, _ = decode_chunk(params, cfg, gen, logits0, cache, counts,
                                       delta, rng, use_flash=use_flash)
        return np.asarray(tokens)

    run()  # compile
    run()  # post-compile transient (see PERF.md r3: first execution ~slow)
    t0 = time.perf_counter()
    run()
    return (time.perf_counter() - t0) / steps


def time_prefill(params, cfg: ModelConfig, cache_len: int, prefill_len: int,
                 reps: int, kv_depth: int = 4096, use_flash: bool = True) -> float:
    """Seconds per text-chunk prefill of `prefill_len` tokens at B=1."""
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(8, 10000, size=(1, prefill_len)), jnp.int32)
    pos = jnp.broadcast_to(
        kv_depth + jnp.arange(prefill_len)[None, None], (3, 1, prefill_len)
    ).astype(jnp.int32)
    jprefill = jax.jit(prefill, static_argnames=("cfg", "use_flash"))

    def run():
        cache = _mid_cache(cfg, 1, cache_len, kv_depth)
        logits, _, _ = jprefill(params, cfg, ids, pos, jnp.int32(prefill_len),
                                cache, use_flash=use_flash)
        return np.asarray(logits)

    run()
    run()
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        walls.append(time.perf_counter() - t0)
    return float(np.median(walls))


if __name__ == "__main__":
    import json
    import os

    from livecc_tpu.models.qwen2_vl.model import init_params
    from livecc_tpu.utils.compile_cache import enable_machine_scoped_cache

    enable_machine_scoped_cache()
    depth = int(os.environ.get("EXP_DEPTH", 2))
    cfg = width7b(depth)
    params = jax.block_until_ready(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16))
    if os.environ.get("EXP_QUANT", "0") == "1":
        # int8 weight-only serving variant (ops/quant.py): halves the
        # per-layer decode weight read — the lever behind the 7B TP=2 plan
        from livecc_tpu.ops.quant import quantize_model_params

        params = jax.block_until_ready(quantize_model_params(params))
        print(json.dumps({"probe": "quantized_weights", "mode": "int8w"}))
    steps = int(os.environ.get("EXP_STEPS", 24))
    for b in (1, 8):
        d = time_decode(params, cfg, 8192, b, steps)
        print(json.dumps({"probe": f"decode_b{b}", "per_token_ms": round(d * 1e3, 3)}))
    p = time_prefill(params, cfg, 8192, 256, max(steps // 4, 4))
    print(json.dumps({"probe": "prefill256", "ms": round(p * 1e3, 3)}))
