"""Search a midsize-golden input seed whose pinned positions ALL clear the
argmax margin threshold (VERDICT r4 next #8).

Near-tie logit positions are a statistical property of random inputs (the
top-2 gap of ~152k near-Gaussian logits is Exp-distributed, mean ~sigma/4.9
~= 0.14 here, so each position lands under ARGMAX_EPS=5e-3 with ~3-8%
probability; the committed seed-0 golden pins only ~85% of mm positions).
The fix is not a different weight recipe — relative margins are
scale-invariant — but input selection: draw candidate seeds, evaluate ALL
pinned margins on the JAX side (cheap relative to the torch generator),
and hand the winning seed to tools/gen_hf_midsize_goldens.py, which
records it in the golden.

Usage:  JAX_PLATFORMS=cpu python tools/search_midsize_seed.py [start] [count]
Prints one JSON line per seed; the best seed is the one with the largest
min-margin over {text, mm, cont} positions (target: > 3x ARGMAX_EPS so
torch-vs-JAX noise cannot move a position under the threshold).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from livecc_tpu.models import qwen2_vl as m  # noqa: E402
from livecc_tpu.utils.param_recipe import make_midsize_inputs, recipe_tensor  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                      "hf_midsize.npz")
ARGMAX_EPS = 5e-3


def build_params_and_cfg():
    import dataclasses

    from livecc_tpu.core.config import ModelConfig
    from livecc_tpu.utils.param_recipe import MIDSIZE_TEXT, MIDSIZE_VISION

    full = ModelConfig.qwen2_vl_7b()
    cfg = dataclasses.replace(
        full,
        vision=dataclasses.replace(full.vision, depth=MIDSIZE_VISION["depth"]),
        text=dataclasses.replace(full.text,
                                 num_hidden_layers=MIDSIZE_TEXT["num_hidden_layers"]),
    )
    g = np.load(GOLDEN)
    names = [str(n) for n in g["manifest_names"]]
    shapes = g["manifest_shapes"]
    state = {n: recipe_tensor(n, tuple(int(d) for d in shapes[i] if d))
             for i, n in enumerate(names)}
    return m.convert_state_dict(state, cfg), cfg


def margins(logits: np.ndarray) -> np.ndarray:
    part = np.partition(logits, -2, axis=-1)
    return part[..., -1] - part[..., -2]


def eval_seed(params, cfg, seed: int) -> dict:
    inp = make_midsize_inputs(seed)
    out = {"seed": seed}

    ids = inp["text_ids"]
    pos, _ = m.get_rope_index(cfg, ids)
    logits, _ = m.forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos))
    out["text_min"] = float(margins(np.asarray(logits[0], np.float32)).min())

    ids, patches, grid = inp["mm_ids"], inp["mm_patches"], inp["mm_grid"]
    pos, delta = m.get_rope_index(cfg, ids, video_grid_thw=grid)
    vis = m.prepare_vision_inputs(cfg, patches, [tuple(g) for g in grid])
    logits, _ = m.forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos), vision=vis)
    out["mm_min"] = float(margins(np.asarray(logits[0], np.float32)).min())

    from livecc_tpu.engine.generation import prefill
    from livecc_tpu.models.qwen2_vl.text import KVCache

    cont = inp["cont_ids"]
    n1, n2 = ids.shape[1], cont.shape[1]
    cache = KVCache.zeros(cfg.text, 1, 128)
    _, cache, _ = prefill(params, cfg, jnp.asarray(ids), jnp.asarray(pos),
                          jnp.int32(n1), cache, vision=vis)
    pos2 = (np.arange(n1, n1 + n2)[None, None, :] + np.asarray(delta)[None]
            ).astype(np.int32)
    pos2 = np.broadcast_to(pos2, (3, 1, n2))
    kv_limit = cache.offset + n2
    key_valid = np.arange(cache.max_len)[None, :] < np.asarray(kv_limit)[:, None]
    logits, _ = m.forward(params, cfg, jnp.asarray(cont),
                          jnp.asarray(np.ascontiguousarray(pos2)), cache=cache,
                          attention_mask=jnp.asarray(key_valid), kv_limit=kv_limit)
    out["cont_min"] = float(margins(np.asarray(logits[0], np.float32)).min())

    out["min_margin"] = min(out["text_min"], out["mm_min"], out["cont_min"])
    out["clears_3x"] = out["min_margin"] > 3 * ARGMAX_EPS
    return out


def main():
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    params, cfg = build_params_and_cfg()
    best = None
    for seed in range(start, start + count):
        t0 = time.time()
        r = eval_seed(params, cfg, seed)
        r["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(r), flush=True)
        if best is None or r["min_margin"] > best["min_margin"]:
            best = r
        if r["clears_3x"]:
            break
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
