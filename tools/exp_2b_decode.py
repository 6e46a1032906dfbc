"""Where the 2B pool decode step's time goes (two-depth difference at 2B width).

The serve bench's fused B=8 decode measures ~17 ms/step while the
weights-read floor is ~4.5 ms (PERF.md "Decode step analysis") — a 3-4x
gap that the 7B-width slice does NOT show (its per-layer decode runs at
98% of HBM bandwidth). This probe applies the same two-depth differencing
(tools/exp_7b_slice.py) at TRUE 2B width to split the gap into per-layer
cost (kernel/bandwidth efficiency at hidden 1536) vs the depth-independent
remainder (152k head + sampling + fused-loop overhead), at the serve
bench's cache geometry (16384 cache, int8 and bf16 KV).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_COMPILATION_CACHE_DIR=/tmp/tpu_cache python tools/exp_2b_decode.py
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.models.qwen2_vl.model import init_params
from livecc_tpu.utils.compile_cache import enable_machine_scoped_cache
from tools.exp_7b_slice import time_decode


def width2b(depth: int) -> ModelConfig:
    full = ModelConfig.qwen2_vl_2b()
    return dataclasses.replace(
        full,
        vision=dataclasses.replace(full.vision, depth=1),
        text=dataclasses.replace(full.text, num_hidden_layers=depth),
        name=f"qwen2-vl-2b-w-d{depth}",
    )


def layer_weight_bytes(cfg: ModelConfig) -> int:
    t = cfg.text
    d, i = t.hidden_size, t.intermediate_size
    hq, hk, hd = t.num_attention_heads, t.num_key_value_heads, t.head_dim
    attn = d * hq * hd + 2 * d * hk * hd + hq * hd * d
    mlp = 3 * d * i
    return 2 * (attn + mlp)


def main() -> None:
    enable_machine_scoped_cache()
    steps = int(os.environ.get("EXP_STEPS", 24))
    cache_len = int(os.environ.get("EXP_CACHE_LEN", 8192))
    meas = {}
    for depth in (2, 4):
        cfg = width2b(depth)
        params = jax.block_until_ready(
            init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16))
        meas[depth] = {
            b: time_decode(params, cfg, cache_len, b, steps) for b in (1, 8)
        }
        del params
    cfg = width2b(2)
    lw = layer_weight_bytes(cfg)
    for b in (1, 8):
        per_layer = (meas[4][b] - meas[2][b]) / 2
        remainder = meas[2][b] - 2 * per_layer
        floor = lw / 819e9
        print(json.dumps({
            "batch": b,
            "per_layer_ms": round(per_layer * 1e3, 3),
            "remainder_ms": round(remainder * 1e3, 3),
            "layer_weight_mb": round(lw / 1e6, 1),
            "layer_floor_ms_819gbps": round(floor * 1e3, 3),
            "layer_bandwidth_eff": round(floor / per_layer, 3) if per_layer > 0 else None,
            "proj28_ms": round((remainder + 28 * per_layer) * 1e3, 2),
        }))


if __name__ == "__main__":
    main()
