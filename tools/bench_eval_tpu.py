"""One-off TPU measurement: MCQ batched single-forward eval throughput.

VideoMME-style item: ~64 frames / 16k-token bucket, one forward, letter
argmax at the last position (eval/mcq.py semantics; reference runs the same
under torchrun Trainer.predict across 8x80G in ~40 min for 2700 questions,
README.md:211). Prints per-item wall and the implied 2700-question
wall-clock on one chip. Usage:  python tools/bench_eval_tpu.py [batch]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.engine.generation import prefill
from livecc_tpu.models.qwen2_vl.model import init_params, prepare_vision_inputs
from livecc_tpu.models.qwen2_vl.text import KVCache


def main(batch: int = 4) -> None:
    cfg = ModelConfig.qwen2_vl_2b()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    # 64 frames at the eval budget -> grid (32, 18, 32); 4608 video tokens/item
    grid = (32, 18, 32)
    n_patches = grid[0] * grid[1] * grid[2]
    n_vid = n_patches // 4
    bucket = 8192
    rng = np.random.RandomState(0)
    patches = rng.randn(batch, n_patches, cfg.vision.patch_dim).astype(np.float32)
    vis = prepare_vision_inputs(cfg, patches[0], [grid])
    import dataclasses
    vis = dataclasses.replace(vis, patches=jnp.asarray(patches))  # [B, N, pd]

    ids = np.full((batch, bucket), cfg.pad_token_id, np.int32)
    ids[:, 0] = cfg.vision_start_token_id
    ids[:, 1:1 + n_vid] = cfg.video_token_id
    ids[:, 1 + n_vid] = cfg.vision_end_token_id
    n_valid = 1 + n_vid + 64            # question + options tail
    pos = np.broadcast_to(np.arange(bucket)[None, None], (3, batch, bucket)).astype(np.int32)
    cache = KVCache.zeros(cfg.text, batch, bucket, jnp.bfloat16)
    use_flash = jax.default_backend() == "tpu"

    @jax.jit
    def run(params, ids, pos, cache, vis):
        logits, cache, _ = prefill(params, cfg, ids, pos, jnp.int32(n_valid),
                                   cache, vision=vis, use_flash=use_flash)
        return jnp.argmax(logits, -1)

    args = (params, jnp.asarray(ids), jnp.asarray(np.ascontiguousarray(pos)), cache, vis)
    t0 = time.perf_counter()
    out = np.asarray(run(*args))
    compile_s = time.perf_counter() - t0
    cache = KVCache.zeros(cfg.text, batch, bucket, jnp.bfloat16)
    args = (params, jnp.asarray(ids), jnp.asarray(np.ascontiguousarray(pos)), cache, vis)
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = np.asarray(run(*args))
    wall = (time.perf_counter() - t0) / n_iter
    per_item = wall / batch
    print(f"batch={batch} bucket={bucket} video_tokens={n_vid} "
          f"compile={compile_s:.1f}s wall/batch={wall:.3f}s per_item={per_item:.3f}s "
          f"videomme_2700q_est={per_item * 2700 / 60:.1f}min/chip")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
