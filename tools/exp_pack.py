"""On-chip sequence-packing measurement + splash segment-id sanity.

Compares effective training throughput (real supervised tokens/s) at the
driver bench shape for a realistic variable-length corpus:
  * padded  — one sample per row, right-padded to the 8k bucket (the
    reference's HF-Trainer layout, per-device batch 1);
  * packed  — the same samples packed into 8k rows with segment-id
    attention (train/data.py:pack_samples).

Both run the SAME compiled step (depth-reduced 2B, flash/splash attention,
remat, compacted CE); the packed window simply carries more real tokens.
Also asserts the splash kernel's multi-segment path against the XLA
reference on a small packed batch (the CPU tests cover the XLA path; this
is the compiled-kernel check).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_COMPILATION_CACHE_DIR=/tmp/tpu_cache python tools/exp_pack.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.models.qwen2_vl.model import init_params
from livecc_tpu.train import Batch, TrainConfig, make_optimizer, make_train_step, split_frozen
from livecc_tpu.train.data import collate, collate_packed_rows, pack_samples

SEQ = int(os.environ.get("EXP_SEQ", 8192))
DEPTH = int(os.environ.get("EXP_DEPTH", 12))
ACCUM = int(os.environ.get("EXP_ACCUM", 4))


def emit(o):
    print(json.dumps(o), flush=True)


def make_text_sample(cfg, n, rng):
    ids = rng.randint(8, cfg.text.vocab_size, size=(1, n)).astype(np.int32)
    labels = ids.copy()
    labels[:, : n // 3] = -100            # ~2/3 supervised (SFT-like)
    pos = np.broadcast_to(np.arange(n)[None, None], (3, 1, n)).astype(np.int32)
    return {"input_ids": ids, "labels": labels,
            "position_ids": np.ascontiguousarray(pos),
            "pixel_patches": None, "video_grid_thw": None,
            "image_patches": None, "image_grid_thw": None}


def splash_segment_sanity(cfg_tiny_like):
    """Compiled splash vs XLA on a packed 2-segment batch."""
    from livecc_tpu.models.qwen2_vl.text import text_forward

    full = ModelConfig.qwen2_vl_2b()
    cfg = dataclasses.replace(
        full, text=dataclasses.replace(full.text, num_hidden_layers=2))
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)["text"]
    rng = np.random.RandomState(0)
    s = 1024
    embeds = jnp.asarray(rng.randn(1, s, cfg.text.hidden_size), jnp.bfloat16)
    pos = np.concatenate([np.arange(600), np.arange(s - 600)])
    pos = jnp.broadcast_to(jnp.asarray(pos)[None, None], (3, 1, s)).astype(jnp.int32)
    seg = jnp.asarray(np.concatenate([np.ones(600), np.full(s - 600, 2)])[None],
                      jnp.int32)

    run = jax.jit(lambda use_flash: text_forward(
        params, cfg.text, embeds, pos, attention_mask=seg, use_flash=use_flash,
    )[0], static_argnums=0)
    a = np.asarray(run(True), np.float32)
    b = np.asarray(run(False), np.float32)
    err = float(np.max(np.abs(a - b)))
    emit({"probe": "splash_segment_vs_xla_max_abs_err", "v": round(err, 5)})
    assert err < 0.1, err                # bf16 kernel-difference scale


def main():
    assert jax.default_backend() == "tpu"
    splash_segment_sanity(None)

    full = ModelConfig.qwen2_vl_2b()
    cfg = dataclasses.replace(
        full,
        vision=dataclasses.replace(full.vision, depth=16),
        text=dataclasses.replace(full.text, num_hidden_layers=DEPTH),
    )
    rng = np.random.RandomState(0)
    # realistic SFT length spread: 30-240 s clips at ~2.5 tok/word + visual
    # context land mostly in 1-5k tokens (reference clips4pretrain 30-240 s)
    lens = rng.randint(800, 5200, size=64).tolist()

    tcfg = TrainConfig(total_steps=100, ce_chunk_size=1024, ce_sup_bucket=8192,
                       adam_mu_dtype=jnp.bfloat16)
    opt = make_optimizer(tcfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    opt_state = opt.init(split_frozen(params, tcfg.freeze_modules)[0])
    step = jax.jit(make_train_step(cfg, tcfg, opt), donate_argnums=(0, 1))

    from livecc_tpu.utils.calibrate import calibrate_matmul
    emit({"probe": "cal", "achieved_tflops": calibrate_matmul()["achieved_tflops"]})

    def run_mode(name, batches, total_sup):
        """Warm every bucket (compiles + the slow first executions), then
        time one full pass; throughput = total supervised tokens / wall."""
        nonlocal params, opt_state
        t0 = time.perf_counter()
        for _ in range(2):
            for b in batches:
                params, opt_state, m = step(params, opt_state, b)
                float(np.asarray(m["loss"]))
        warm_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for b in batches:
            params, opt_state, m = step(params, opt_state, b)
            float(np.asarray(m["loss"]))
        wall = time.perf_counter() - t0
        emit({"probe": name, "pass_wall_s": round(wall, 3),
              "warm_s": round(warm_s, 1), "n_steps": len(batches),
              "supervised_tokens_total": total_sup,
              "supervised_tokens_per_s": round(total_sup / wall, 1)})
        return total_sup / wall

    def sup_count(batch):
        return int(np.asarray((batch.labels != -100).sum()))

    # padded: one sample per row, ACCUM rows per step -> ACCUM samples/step
    # (the reference layout); buckets form naturally per window
    samples = [make_text_sample(cfg, n, rng) for n in lens]
    padded_batches = [collate(samples[i:i + ACCUM], cfg, rows=1)
                      for i in range(0, len(samples), ACCUM)]
    padded_sup = sum(sup_count(b) for b in padded_batches)
    tp_pad = run_mode("padded", padded_batches, padded_sup)

    # packed: the SAME samples packed into SEQ-token rows
    packed_rows, left = pack_samples(samples, SEQ)
    while len(packed_rows) % ACCUM:
        packed_rows, left = packed_rows[:-1], left  # trim to full windows
    packed_batches = [collate_packed_rows(packed_rows[i:i + ACCUM], cfg,
                                          rows=1, accum=ACCUM)
                      for i in range(0, len(packed_rows), ACCUM)]
    packed_sup = sum(sup_count(b) for b in packed_batches)
    tp_pack = run_mode("packed", packed_batches, packed_sup)

    emit({"probe": "packing_speedup", "v": round(tp_pack / tp_pad, 2),
          "note": "effective supervised tokens/s, same length distribution"})


if __name__ == "__main__":
    main()
