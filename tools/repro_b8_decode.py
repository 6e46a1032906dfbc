"""Minimal repro/bisect for the standalone-B=8 decode_chunk INVALID_ARGUMENT
(CLAUDE.md 'unresolved oddity', VERDICT r3 #7).

Observed r2: ``decode_chunk`` invoked STANDALONE at B=8 on the real chip
failed with INVALID_ARGUMENT at the first transfer, while the same code
fused behind ``prefill`` (the pool step) and solo B=1 ran fine. This script
bisects: raw host->device transfers of each input shape, then decode_chunk
across B in {1, 2, 4, 8} x {flash, xla} x {bf16, int8} caches.

Usage: PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/tpu_cache \
       python tools/repro_b8_decode.py
"""

from __future__ import annotations

import json
import traceback

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.engine.generation import GenerationParams, decode_chunk
from livecc_tpu.models.qwen2_vl.model import init_params
from livecc_tpu.models.qwen2_vl.text import KVCache


def emit(obj):
    print(json.dumps(obj), flush=True)


def try_case(name, fn):
    try:
        fn()
        emit({"case": name, "ok": True})
        return True
    except Exception as e:
        emit({"case": name, "ok": False,
              "error": f"{type(e).__name__}: {e}"[:400]})
        return False


def main():
    emit({"backend": jax.default_backend()})
    cfg = ModelConfig.qwen2_vl_2b()
    v = cfg.text.vocab_size
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = jax.block_until_ready(params)
    gen = GenerationParams(max_new_tokens=4, eos_token_id=cfg.eos_token_id,
                           pad_token_id=cfg.pad_token_id, repetition_penalty=1.05)

    # --- phase 1: raw transfers of each standalone input shape at B=8
    rng = np.random.RandomState(0)
    for name, arr in [
        ("transfer_logits0_f32_8xV", rng.randn(8, v).astype(np.float32)),
        ("transfer_counts_i32_8xV", np.zeros((8, v), np.int32)),
        ("transfer_delta_8x1", np.zeros((8, 1), np.int32)),
    ]:
        try_case(name, lambda a=arr: np.asarray(jnp.asarray(a)[0, :8]))

    # --- phase 2: decode_chunk standalone across the matrix
    for b in (1, 2, 4, 8):
        for flash in (True, False):
            for dtype_name, dtype in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
                def run(b=b, flash=flash, dtype=dtype):
                    cache = KVCache.zeros(cfg.text, b, 2048, dtype)
                    cache = jax.tree_util.tree_map(
                        lambda x: x if x is None else jax.block_until_ready(x), cache)
                    logits0 = jnp.asarray(rng.randn(b, v).astype(np.float32))
                    counts = jnp.zeros((b, v), jnp.int32)
                    delta = jnp.zeros((b, 1), jnp.int32)
                    toks, n_gen, cache2, counts2 = decode_chunk(
                        params, cfg, gen, logits0, cache, counts, delta,
                        jax.random.PRNGKey(1), use_flash=flash,
                    )
                    np.asarray(toks)
                try_case(f"decode_b{b}_{'flash' if flash else 'xla'}_{dtype_name}", run)

    emit({"done": True})


if __name__ == "__main__":
    main()
