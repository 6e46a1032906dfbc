"""Quantization drift at TRUE 7B width vs the fp32 midsize golden.

VERDICT r3 weak #3 asked for kernel-class divergence measured at realistic
width; VERDICT r4 weak #5 extends it to int8: the serving default and the
7B TP=2 plan (int8 weights halve the decode weight read AND the per-chip
HBM footprint) need a quality measurement, not a flag. Variants:

  bf16        bf16 params + activations (the r4 baseline measurement)
  int8w       int8 per-channel weights (ops/quant.quantize_model_params),
              bf16 activations — the --quantize-weights serving path
  int8w+kv    int8 weights AND int8 KV cache, measured on the streaming
              continuation leg (chunk 2 against chunk 1's cache)

Each reports max/mean |Δlogit| vs the fp32 torch golden plus argmax
agreement bucketed by the golden's own top-1/top-2 margin (a flip at a
near-tie is rounding noise; a flip at a decided position would be a real
parity break). Results land in PERF.md "Real-checkpoint parity".

Usage: python tools/exp_bf16_width.py   (CPU, ~10 min; needs hf_midsize.npz)
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from livecc_tpu.core.config import ModelConfig  # noqa: E402
from livecc_tpu.models import qwen2_vl as m  # noqa: E402
from livecc_tpu.ops.quant import quantize_model_params  # noqa: E402
from livecc_tpu.utils.param_recipe import recipe_tensor  # noqa: E402

g = np.load(os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                         "hf_midsize.npz"))
full = ModelConfig.qwen2_vl_7b()
cfg = dataclasses.replace(
    full,
    vision=dataclasses.replace(full.vision, depth=4),
    text=dataclasses.replace(full.text, num_hidden_layers=4))
names = [str(n) for n in g["manifest_names"]]
shapes = g["manifest_shapes"]
state = {n: recipe_tensor(n, tuple(int(d) for d in shapes[i] if d))
         for i, n in enumerate(names)}
params_bf16 = m.convert_state_dict(state, cfg, dtype=jnp.bfloat16)
del state

ids, patches, grid = g["mm_ids"], g["mm_patches"], g["mm_grid"]
pos, delta = m.get_rope_index(cfg, ids, video_grid_thw=grid)
vis = m.prepare_vision_inputs(cfg, patches, [tuple(x) for x in grid])


def report(tag, lg, prefix):
    tail_ref = g[f"{prefix}_tail"]
    am_ref = g[f"{prefix}_argmax"]
    margin = g[f"{prefix}_margin"]
    d = np.abs(lg[-4:] - tail_ref)
    agree = lg.argmax(-1) == am_ref
    row = {"variant": tag, "seq": prefix,
           "max_abs_d": round(float(d.max()), 4),
           "mean_abs_d": round(float(d.mean()), 5),
           "flips_total": int((~agree).sum()), "n_pos": int(len(agree))}
    for eps in (5e-3, 2e-2, 5e-2):
        dec = margin > eps
        row[f"agree_margin_gt_{eps}"] = round(float(agree[dec].mean()), 4)
        row[f"flips_margin_gt_{eps}"] = int((~agree[dec]).sum())
    print(json.dumps(row), flush=True)


def mm_forward(params):
    logits, _ = m.forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos), vision=vis)
    return np.asarray(logits[0], np.float32)


def cont_forward(params, cache_dtype):
    from livecc_tpu.engine.generation import prefill
    from livecc_tpu.models.qwen2_vl.text import KVCache

    cont = g["cont_ids"]
    n1, n2 = ids.shape[1], cont.shape[1]
    cache = KVCache.zeros(cfg.text, 1, 128, dtype=cache_dtype)
    _, cache, _ = prefill(params, cfg, jnp.asarray(ids), jnp.asarray(pos),
                          jnp.int32(n1), cache, vision=vis)
    pos2 = (np.arange(n1, n1 + n2)[None, None, :] + np.asarray(g["mm_delta"])[None]
            ).astype(np.int32)
    pos2 = np.broadcast_to(pos2, (3, 1, n2))
    kv_limit = cache.offset + n2
    key_valid = np.arange(cache.max_len)[None, :] < np.asarray(kv_limit)[:, None]
    logits, _ = m.forward(params, cfg, jnp.asarray(cont),
                          jnp.asarray(np.ascontiguousarray(pos2)), cache=cache,
                          attention_mask=jnp.asarray(key_valid), kv_limit=kv_limit)
    return np.asarray(logits[0], np.float32)


report("bf16", mm_forward(params_bf16), "mm")
report("bf16+kv_bf16", cont_forward(params_bf16, jnp.bfloat16), "cont")

params_int8 = quantize_model_params(params_bf16)
report("int8w", mm_forward(params_int8), "mm")
report("int8w+kv_bf16", cont_forward(params_int8, jnp.bfloat16), "cont")
report("int8w+kv_int8", cont_forward(params_int8, jnp.int8), "cont")
