"""Training-MFU attribution experiment (run on the TPU, background).

VERDICT r3 item #1: raise driver-visible train MFU from 0.19 to >=0.30.
This script A/Bs the levers within ONE session (the chip is time-shared;
cross-session walls are not comparable — CLAUDE.md) and prints a JSON line
per configuration:

  * calibration: fixed 8k^3 bf16 matmul — the chip-speed scale factor that
    makes cross-session numbers comparable (VERDICT weak #6).
  * stock flash attention (GQA via KV-head repeat)  [round-2 shipping]
  * splash attention (native GQA, fused bwd)
  * splash + remat="dots" (save matmul outputs; backward skips re-forward)
  * attribution variants at the best config: no-ViT and no-CE steps.

Usage:  JAX_COMPILATION_CACHE_DIR=/tmp/tpu_cache python tools/exp_mfu.py
Env:    EXP_SEQ (8192), EXP_DEPTH (12), EXP_ACCUM (4), EXP_CONFIGS (csv)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.models.qwen2_vl.model import init_params, prepare_vision_inputs
from livecc_tpu.train import (Batch, TrainConfig, make_optimizer,
                              make_train_step, split_frozen)
from livecc_tpu.utils.flops import train_step_flops

PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))
SEQ = int(os.environ.get("EXP_SEQ", 8192))
DEPTH = int(os.environ.get("EXP_DEPTH", 12))
ACCUM = int(os.environ.get("EXP_ACCUM", 4))
N_STEPS = int(os.environ.get("EXP_STEPS", 3))


def emit(obj):
    print(json.dumps(obj), flush=True)


def calibrate() -> float:
    """Time a fixed bf16 matmul chain; returns achieved TFLOP/s."""
    n = 8192
    x = jnp.ones((n, n), jnp.bfloat16)
    w = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def prog(x, w):
        for _ in range(8):
            x = (x @ w) * (1.0 / n)
        return jnp.sum(x)            # scalar out: don't time a 128 MB relay pull

    np.asarray(prog(x, w))                       # compile + warm
    t0 = time.perf_counter()
    np.asarray(prog(x, w))
    wall = time.perf_counter() - t0
    tflops = 8 * 2 * n**3 / wall / 1e12
    emit({"config": "calibration_matmul", "wall_s": round(wall, 4),
          "achieved_tflops": round(tflops, 1),
          "frac_peak": round(tflops / PEAK_TFLOPS, 3)})
    return tflops


def build(cfg: ModelConfig, grid, with_vision=True):
    n_patches = grid[0] * grid[1] * grid[2]
    n_vid = n_patches // 4
    rng = np.random.RandomState(0)
    ids = rng.randint(8, cfg.text.vocab_size, size=(ACCUM, 1, SEQ)).astype(np.int32)
    if with_vision:
        ids[:, :, 4] = cfg.vision_start_token_id
        ids[:, :, 5:5 + n_vid] = cfg.video_token_id
        ids[:, :, 5 + n_vid] = cfg.vision_end_token_id
        sup_start = 5 + n_vid + 1
    else:
        sup_start = 5
    labels = ids.copy()
    labels[:, :, :sup_start] = -100
    pos = np.broadcast_to(np.arange(SEQ)[None, None, None], (ACCUM, 3, 1, SEQ)).astype(np.int32)
    kw = {}
    if with_vision:
        vis = prepare_vision_inputs(
            cfg, rng.randn(n_patches, cfg.vision.patch_dim).astype(np.float32), [grid]
        )
        bcast = lambda x: jnp.broadcast_to(x, (ACCUM,) + x.shape)
        kw = dict(vision_patches=bcast(vis.patches), vision_cos=bcast(vis.cos),
                  vision_sin=bcast(vis.sin), vision_seg_ids=bcast(vis.seg_ids),
                  vision_group=grid[1] * grid[2])
    batch = Batch(
        input_ids=jnp.asarray(ids), labels=jnp.asarray(labels),
        position_ids=jnp.asarray(np.ascontiguousarray(pos)),
        attention_mask=jnp.ones((ACCUM, 1, SEQ), bool), **kw,
    )
    return batch, SEQ - sup_start, n_patches


def run_config(name, cfg, tcfg, batch, sup_tokens, n_patches, grid, cal_tflops,
               sup_bucketed=True):
    try:
        return _run_config(name, cfg, tcfg, batch, sup_tokens, n_patches, grid,
                           cal_tflops)
    except Exception as e:  # OOM in one config must not kill the rest
        emit({"config": name, "error": f"{type(e).__name__}: {e}"[:500]})
        return None


def _run_config(name, cfg, tcfg, batch, sup_tokens, n_patches, grid, cal_tflops):
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    opt = make_optimizer(tcfg)
    opt_state = opt.init(split_frozen(params, tcfg.freeze_modules)[0])
    step = jax.jit(make_train_step(cfg, tcfg, opt), donate_argnums=(0, 1))
    t0 = time.perf_counter()
    params, opt_state, metrics = step(params, opt_state, batch)
    loss = float(np.asarray(metrics["loss"]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        params, opt_state, metrics = step(params, opt_state, batch)
        loss = float(np.asarray(metrics["loss"]))
    wall = (time.perf_counter() - t0) / N_STEPS
    flops = train_step_flops(cfg, seq_len=SEQ, sup_tokens=sup_tokens,
                             n_patches=n_patches, vit_group=grid[1] * grid[2],
                             accum=ACCUM, vit_frozen=True)
    mfu = flops / wall / (PEAK_TFLOPS * 1e12)
    emit({"config": name, "wall_s": round(wall, 4), "compile_s": round(compile_s, 1),
          "tokens_per_s": round(ACCUM * SEQ / wall, 1), "mfu": round(mfu, 4),
          "mfu_vs_calibrated": round(flops / wall / (cal_tflops * 1e12), 4),
          "loss": round(loss, 4)})
    del params, opt_state
    return wall


def main():
    assert jax.default_backend() == "tpu", "run on the TPU"
    full = ModelConfig.qwen2_vl_2b()
    cfg = dataclasses.replace(
        full,
        vision=dataclasses.replace(full.vision, depth=16),
        text=dataclasses.replace(full.text, num_hidden_layers=DEPTH),
        name=f"{full.name}-d{DEPTH}",
    )
    grid = (24, 16, 34)
    batch, sup_tokens, n_patches = build(cfg, grid)
    cal = calibrate()

    base = dict(total_steps=1000, ce_chunk_size=1024, ce_sup_bucket=5120,
                adam_mu_dtype=jnp.bfloat16)
    configs = os.environ.get(
        "EXP_CONFIGS",
        "flash,splash,splash_dots,novit,noce").split(",")

    import livecc_tpu.ops.attention as attn_mod
    walls = {}
    if "flash" in configs:
        attn_mod.TRAIN_ATTN_IMPL = "flash"
        walls["flash"] = run_config("stock_flash_repeatKV", cfg, TrainConfig(**base),
                                    batch, sup_tokens, n_patches, grid, cal)
    if "splash" in configs:
        attn_mod.TRAIN_ATTN_IMPL = "splash"
        walls["splash"] = run_config("splash_gqa", cfg, TrainConfig(**base),
                                     batch, sup_tokens, n_patches, grid, cal)
    if "splash_dots" in configs:
        attn_mod.TRAIN_ATTN_IMPL = "splash"
        walls["splash_dots"] = run_config(
            "splash_gqa_remat_dots", cfg, TrainConfig(**base, remat="dots"),
            batch, sup_tokens, n_patches, grid, cal)
    # attribution at the splash config
    if "novit" in configs:
        attn_mod.TRAIN_ATTN_IMPL = "splash"
        b2, sup2, _ = build(cfg, grid, with_vision=False)
        run_config("splash_no_vit", cfg, TrainConfig(**base), b2, sup2, 0, grid, cal)
    if "noce" in configs:
        attn_mod.TRAIN_ATTN_IMPL = "splash"
        tc = TrainConfig(**{**base, "ce_sup_bucket": 128})
        run_config("splash_tiny_ce", cfg, tc, batch, sup_tokens, n_patches, grid, cal)
    cal2 = calibrate()
    emit({"config": "done",
          "walls": {k: (round(v, 3) if v else None) for k, v in walls.items()}})


if __name__ == "__main__":
    main()
