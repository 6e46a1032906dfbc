"""On-chip check: the early-exit fused decode is data-dependent in cost.

Same compiled decode_chunk program, two inputs at B=8: logits forcing an
immediate eos on every row (realistic: commentary chunks end after a few
words + ' ...') vs logits that never stop (the bench's random-weights
regime). The wall-clock gap is the production win of the while_loop exit.

Usage: PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/tpu_cache \
       python tools/exp_early_exit.py
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


def main():
    cfg = ModelConfig.qwen2_vl_2b()
    v = cfg.text.vocab_size
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = jax.block_until_ready(params)
    gen = GenerationParams(max_new_tokens=16, eos_token_id=cfg.eos_token_id,
                           pad_token_id=cfg.pad_token_id, repetition_penalty=1.05)
    b = 8
    rng = np.random.RandomState(0)

    stop_now = np.full((b, v), -10.0, np.float32)
    stop_now[:, cfg.eos_token_id] = 10.0                  # eos sampled at step 0
    never = rng.randn(b, v).astype(np.float32)
    never[:, cfg.eos_token_id] = -100.0                   # eos unreachable

    use_flash = jax.default_backend() == "tpu"
    results = {}
    for name, logits in [("all_stop_step0", stop_now), ("never_stop", never)]:
        def run():
            cache = KVCache.zeros(cfg.text, b, 2048, jnp.bfloat16)
            counts = jnp.zeros((b, v), jnp.int32)
            toks, n_gen, *_ = decode_chunk(
                params, cfg, gen, jnp.asarray(logits), cache, counts,
                jnp.zeros((b, 1), jnp.int32), jax.random.PRNGKey(1),
                use_flash=use_flash,
            )
            return np.asarray(toks), np.asarray(n_gen)

        toks, n_gen = run()                                # compile+warm
        walls = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            walls.append(time.perf_counter() - t0)
        results[name] = {"median_s": round(float(np.median(walls)), 4),
                         "n_gen": n_gen.tolist()}
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
