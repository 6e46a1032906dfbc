"""End-to-end training smoke on the real chip: dataset -> decode -> step.

The bench times the compiled step on synthetic tensors; this drives the
FULL training product path (C1+C3): seek-indexed JSONL corpus -> native
FFmpeg strict-fps decode -> streaming interleave + label masking ->
bucketed collate -> compiled train step with grad accumulation, via
``train.Trainer`` (threaded batch prefetch). Reports tokens/s end-to-end
and the data-stall fraction (this host has ONE throttled vCPU; the
reference assumes 16 dataloader workers, lmm_dataset.py:214).

Env: E2E_STEPS=4 E2E_ACCUM=2 E2E_DEPTH=4 E2E_CLIP_S=24
Usage: PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/tpu_cache \
       python tools/train_e2e_tpu.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

STEPS = int(os.environ.get("E2E_STEPS", 4))
ACCUM = int(os.environ.get("E2E_ACCUM", 2))
DEPTH = int(os.environ.get("E2E_DEPTH", 4))
CLIP_S = int(os.environ.get("E2E_CLIP_S", 24))
CLIP_DIR = os.environ.get("E2E_CLIP_DIR", "/tmp/soak_clips")


def ensure_corpus(tmp: str, n_clips: int = 4) -> str:
    """Streaming-commentary JSONL over encoded 720p clips (reuses the soak
    clips when present)."""
    from livecc_tpu.data.lmm_dataset import write_seek_index
    from livecc_tpu.vision_io.video_reader import encode_test_video
    from tools.soak_serve import synth_clip

    os.makedirs(CLIP_DIR, exist_ok=True)
    os.makedirs(tmp, exist_ok=True)
    rows = []
    for i in range(n_clips):
        path = os.path.join(CLIP_DIR, f"clip_{i}_60s.mp4")
        if not os.path.exists(path):
            encode_test_video(path, synth_clip(i, 60), fps=2)
        words = [[t * 0.5, t * 0.5 + 0.45, f"word{t % 23}"]
                 for t in range(2 * CLIP_S)]
        rows.append([
            {"role": "user", "content": [
                {"type": "video", "video": path,
                 "video_start": 0.0, "video_end": float(CLIP_S)},
                {"type": "text", "text": "Please commentate on the video."},
            ]},
            {"role": "assistant", "content": [
                {"type": "text", "text_stream": words}]},
        ])
    ann = os.path.join(tmp, "anns.jsonl")
    with open(ann, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    write_seek_index(ann)
    return ann


def main() -> None:
    import jax
    import jax.numpy as jnp

    from livecc_tpu.core.config import ModelConfig, tiny_config
    from livecc_tpu.data.lmm_dataset import LMMDataset
    from livecc_tpu.data.tokenizer import ByteTokenizer
    from livecc_tpu.models.qwen2_vl.model import init_params
    from livecc_tpu.train import TrainConfig
    from livecc_tpu.train.trainer import Trainer, TrainerConfig

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        full = ModelConfig.qwen2_vl_2b()
        cfg = dataclasses.replace(
            full,
            vision=dataclasses.replace(full.vision, depth=8),
            text=dataclasses.replace(full.text, num_hidden_layers=DEPTH),
            name=f"{full.name}-d{DEPTH}",
        )
    else:
        cfg = tiny_config()

    tmp = "/tmp/train_e2e"
    os.makedirs(tmp, exist_ok=True)
    ann = ensure_corpus(tmp)
    # Cap the visual budget for the smoke: the full LiveCC training budget
    # gives a short clip ~25k visual tokens (a 32k bucket / ~98k-patch ViT
    # program — the relay's compile helper crashes on it); 96*28*28 per
    # frame yields the serving-class shape instead (~110 tokens/frame).
    from livecc_tpu.vision_io.budget import VisionBudget

    budget = VisionBudget(video_max_pixels=96 * 28 * 28,
                          video_total_pixels=96 * 28 * 28 * 2 * CLIP_S)
    ds = LMMDataset(annotation_paths=[ann], tokenizer=ByteTokenizer.for_config(cfg),
                    cfg=cfg, budget=budget)

    params = init_params(cfg, jax.random.PRNGKey(0),
                         dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    tcfg = TrainConfig(total_steps=STEPS, ce_chunk_size=1024 if on_tpu else 64,
                       adam_mu_dtype=jnp.bfloat16 if on_tpu else None)
    run = TrainerConfig(output_dir=os.path.join(tmp, "out"), total_steps=STEPS,
                        accum_steps=ACCUM, log_steps=1, save_steps=10**9,
                        resume=False)
    trainer = Trainer(params, cfg, tcfg, run, ds)

    # time one sample load alone (host decode+interleave+tokenize cost)
    t0 = time.perf_counter()
    _ = ds[0]
    sample_load_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    last = trainer.train()
    wall = time.perf_counter() - t0
    tokens = last.get("tokens", 0) * STEPS        # per-step supervised tokens
    out = {
        "metric": f"train_e2e_{cfg.name}_{jax.default_backend()}",
        "steps": STEPS, "accum": ACCUM,
        "wall_s_per_step": round(wall / STEPS, 3),
        "sample_load_s": round(sample_load_s, 3),
        "supervised_tokens_per_step": int(last.get("tokens", 0)),
        "loss": round(float(last.get("loss", 0.0)), 4),
        "log": last,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
