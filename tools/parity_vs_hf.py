"""One-command real-checkpoint greedy parity: JAX engine vs HF reference.

The reference's product is chenjoya/LiveCC-7B-Instruct run through the
offline streaming loop (reference demo/infer.py:244-310). Given a LOCAL
checkpoint directory (config.json + *.safetensors + tokenizer files), this
tool:

  1. builds the JAX model via ``config_from_hf_json`` +
     ``load_safetensors_dir`` and runs the streaming engine's
     ``live_cc_once_for_evaluation`` greedy on a clip;
  2. when torch+transformers can build Qwen2VLForConditionalGeneration from
     the same directory, replays the EXACT reference chunk protocol —
     6-frame init + 2-frame chunks, ``Time=a-b s`` turns, system prompt
     stripped on continuation, ``past_ids = sequences[:, :-1]``, pixels
     only at prefill (the generation-patch semantics, reference
     livecc-utils/generation_patch.py:2-41) — through torch
     ``model.generate``;
  3. diffs the full final token history token-for-token and per-chunk texts.

Both sides consume the SAME decoded frames and the SAME tokenizer-rendered
prompts (chat template + placeholder expansion are separately golden-tested
against HF byte-for-byte), so a mismatch isolates model/engine numerics.

Usage (once real weights are on disk; none ship in this image):

  python tools/parity_vs_hf.py --checkpoint /ckpts/LiveCC-7B-Instruct \
      --video demo/sources/howto_fix_laptop_mute_1080p.mp4 \
      --query "Please describe the video." --max-new-tokens 16

Exit code 0 iff token histories are identical. ``--skip-hf`` runs only the
JAX side (smoke / timing). ``--dtype fp32`` loads fp32 weights for
numerics isolation (default bf16, the deployment dtype).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_strict_fps_clip(video: str, video_start: float | None = None,
                         video_end: float | None = None, budget=None) -> np.ndarray:
    """Whole-clip strict-fps read + spatial budget resize — the reference's
    `_read_video_decord_plus` + `_spatial_resize_video` composition
    (video_process_patch.py:24-107)."""
    from livecc_tpu.vision_io.budget import VisionBudget, strict_fps_sample
    from livecc_tpu.vision_io.video_reader import VideoReader

    budget = budget or VisionBudget()
    reader = VideoReader(video)
    pts = reader.pts_seconds
    keep = np.arange(len(pts))
    if video_start is not None or video_end is not None:
        lo = pts[0] if video_start is None else video_start
        hi = pts[-1] if video_end is None else video_end
        keep = np.where((pts >= lo) & (pts <= hi))[0]
    idxs, _ = strict_fps_sample(pts[keep], budget=budget)
    idxs = keep[idxs]
    h, w = reader.frame_size
    rh, rw = budget.spatial_target(h, w, nframes=len(idxs))
    return reader.get_batch(idxs, out_hw=(rh, rw))


def make_tokenizer(checkpoint: str, kind: str):
    if kind == "byte":
        from livecc_tpu.data.tokenizer import ByteTokenizer
        return ByteTokenizer()
    from livecc_tpu.data.tokenizer import HFTokenizer
    return HFTokenizer(checkpoint)


def run_jax(checkpoint: str, frames: np.ndarray, query: str, *,
            tokenizer, dtype: str = "bf16", max_new_tokens: int = 32,
            repetition_penalty: float = 1.05, cache_len: int = 32768,
            use_flash: bool | None = None):
    """JAX side: converted checkpoint through the streaming engine.

    Returns (per-chunk [t0, t1, text], full past_ids token history)."""
    import jax
    import jax.numpy as jnp

    from livecc_tpu.engine import GenerationParams, LiveCCEngine
    from livecc_tpu.models.qwen2_vl.convert import config_from_hf_json, load_safetensors_dir

    if dtype == "fp32":
        # numerics-isolation mode: true fp32 matmuls (XLA:CPU's default
        # reduced-precision path breaks exact parity vs torch fp32)
        jax.config.update("jax_default_matmul_precision", "highest")
    cfg = config_from_hf_json(checkpoint)
    params = load_safetensors_dir(
        checkpoint, cfg, dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32)
    if use_flash is None and dtype == "fp32":
        use_flash = False      # Pallas kernels are the bf16 deployment path
    kw = {} if use_flash is None else {"use_flash": use_flash}
    # parity demands exact weights: never the int8 TPU serving default
    engine = LiveCCEngine(params, cfg, tokenizer, cache_len=cache_len,
                          quantize_weights=False, **kw)
    gen = GenerationParams(max_new_tokens=max_new_tokens,
                           eos_token_id=cfg.eos_token_id,
                           pad_token_id=cfg.pad_token_id,
                           repetition_penalty=repetition_penalty)
    state = engine.new_stream()
    out = []
    t1 = 0.0
    chunks = [frames[: engine.initial_fps_frames]]
    rest = frames[engine.initial_fps_frames:]
    chunks += [rest[i:i + engine.streaming_fps_frames]
               for i in range(0, len(rest), engine.streaming_fps_frames)]
    for i, clip in enumerate(chunks):
        if len(clip) == 0:
            continue
        t0, t1 = ((0.0, engine.initial_fps_frames / engine.fps) if i == 0
                  else (t1, t1 + engine.streaming_fps_frames / engine.fps))
        text = engine.chunk_step(state, clip, t0, t1, query if i == 0 else None, gen)
        out.append([t0, t1, text])
    return out, list(state.past_ids)


def patch_multiturn_generation(model, video_token_id: int, image_token_id: int):
    """Reference generation-patch semantics on a stock HF model
    (livecc-utils/generation_patch.py:2-41, re-derived): recompute M-RoPE
    positions from cached rope_deltas (position_ids=None) and forward pixels
    whenever the new window still contains vision tokens.

    The reference pinned a transformers where the BASE prepare kept pixel
    kwargs on continuation prefills, so its patch only needed to DROP them
    for text-only windows (generation_patch.py:37-39). Modern transformers'
    base prepare nulls pixels whenever ``cache_position[0] != 0`` — replaying
    the reference protocol on it therefore must RESTORE the pixel kwargs for
    continuation windows that do contain vision tokens (without this, the
    chunk-2+ prefills run on raw video-placeholder embeddings and greedy
    output silently diverges from both the reference and our engine)."""

    orig = model.prepare_inputs_for_generation

    def patched(*args, **kwargs):
        inputs = orig(*args, **kwargs)
        inputs["position_ids"] = None
        cache_position = inputs.get("cache_position")
        if cache_position is not None and int(cache_position[0]) != 0:
            ids = inputs.get("input_ids")
            has_vision = ids is not None and bool(
                ((ids == video_token_id) | (ids == image_token_id)).any())
            if has_vision:
                for k in ("pixel_values", "pixel_values_videos",
                          "image_grid_thw", "video_grid_thw"):
                    if inputs.get(k) is None and kwargs.get(k) is not None:
                        inputs[k] = kwargs[k]
            else:
                inputs.pop("pixel_values", None)
                inputs.pop("pixel_values_videos", None)
        return inputs

    model.prepare_inputs_for_generation = patched
    return model


def run_hf(checkpoint: str, frames: np.ndarray, query: str, *,
           tokenizer, dtype: str = "bf16", max_new_tokens: int = 32,
           repetition_penalty: float = 1.05, torch_model=None):
    """Torch side: the reference offline streaming protocol
    (demo/infer.py:244-310) on the same frames/prompts.

    Returns (per-chunk [t0, t1, text], full past_ids token history)."""
    import torch

    from livecc_tpu.data import chat
    from livecc_tpu.models.qwen2_vl.convert import config_from_hf_json
    from livecc_tpu.vision_io.patchify import patchify_video

    cfg = config_from_hf_json(checkpoint)
    if torch_model is None:
        from transformers import Qwen2VLForConditionalGeneration
        torch_model = Qwen2VLForConditionalGeneration.from_pretrained(
            checkpoint, torch_dtype=torch.bfloat16 if dtype == "bf16" else torch.float32,
            attn_implementation="eager")
    model = patch_multiturn_generation(torch_model.eval(), cfg.video_token_id,
                                       cfg.image_token_id)

    fps, init_frames, stream_frames = 2.0, 6, 2
    sys_offset = chat.system_prompt_offset()
    chunks = [frames[:init_frames]]
    rest = frames[init_frames:]
    chunks += [rest[i:i + stream_frames] for i in range(0, len(rest), stream_frames)]

    past_key_values = None
    past_ids = None
    out = []
    t1 = 0.0
    with torch.inference_mode():
        for i, clip in enumerate(chunks):
            if len(clip) == 0:
                continue
            t0, t1 = ((0.0, init_frames / fps) if i == 0
                      else (t1, t1 + stream_frames / fps))
            content = [{"type": "text", "text": f"Time={t0:.1f}-{t1:.1f}s"},
                       {"type": "video", "video": None}]
            if past_key_values is None:
                content.append({"type": "text", "text": query})
            text = chat.render_chat([{"role": "user", "content": content}],
                                    add_generation_prompt=True)
            if past_key_values is not None:
                text = chat.strip_system_for_continuation(text, sys_offset)
            patches, grid = patchify_video(np.transpose(clip, (0, 3, 1, 2)))
            text = chat.expand_vision_placeholders(text, video_grid_thw=[grid])
            ids = torch.tensor([tokenizer.encode(text)], dtype=torch.long)
            if past_ids is not None:
                ids = torch.cat([past_ids, ids], dim=1)
            outputs = model.generate(
                input_ids=ids,
                attention_mask=torch.ones_like(ids),
                pixel_values_videos=torch.from_numpy(patches).to(model.dtype),
                video_grid_thw=torch.tensor([grid]),
                past_key_values=past_key_values,
                return_dict_in_generate=True,
                max_new_tokens=max_new_tokens,
                repetition_penalty=repetition_penalty,
                do_sample=False,
                pad_token_id=cfg.eos_token_id,
            )
            past_key_values = outputs.past_key_values
            new = outputs.sequences[0, ids.shape[1]:]
            past_ids = outputs.sequences[:, :-1]
            out.append([t0, t1, tokenizer.decode(new.tolist(), skip_special_tokens=True)])
    return out, past_ids[0].tolist()


def compare(jax_out, jax_ids, hf_out, hf_ids) -> dict:
    n = min(len(jax_ids), len(hf_ids))
    first_diff = next((i for i in range(n) if jax_ids[i] != hf_ids[i]), None)
    if first_diff is None and len(jax_ids) != len(hf_ids):
        first_diff = n
    chunk_text_match = [a[2] == b[2] for a, b in zip(jax_out, hf_out)]
    return {
        "token_match": first_diff is None,
        "first_token_diff": first_diff,
        "n_tokens_jax": len(jax_ids),
        "n_tokens_hf": len(hf_ids),
        "chunks_jax": len(jax_out),
        "chunks_hf": len(hf_out),
        "chunk_text_match": chunk_text_match,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", required=True, help="local HF checkpoint dir")
    ap.add_argument("--video", default=None, help="mp4 clip (default: synthesized)")
    ap.add_argument("--video-start", type=float, default=None)
    ap.add_argument("--video-end", type=float, default=None)
    ap.add_argument("--query", default="Please describe the video.")
    ap.add_argument("--max-new-tokens", type=int, default=32)
    ap.add_argument("--repetition-penalty", type=float, default=1.05)
    ap.add_argument("--dtype", choices=("bf16", "fp32"), default="bf16")
    ap.add_argument("--tokenizer", choices=("hf", "byte"), default="hf",
                    help="'byte' only for tokenizer-less test checkpoints")
    ap.add_argument("--skip-hf", action="store_true", help="JAX side only")
    ap.add_argument("--platform", choices=("ambient", "cpu"), default="ambient",
                    help="cpu forces the JAX side off the TPU (the axon env "
                         "ignores JAX_PLATFORMS; only the config API works)")
    ap.add_argument("--out", default=None, help="write the JSON report here")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.video is None:
        from livecc_tpu.vision_io.video_reader import encode_test_video
        args.video = "/tmp/parity_clip.mp4"
        rng = np.random.RandomState(0)
        encode_test_video(args.video,
                          rng.randint(0, 255, (20, 112, 112, 3), dtype=np.uint8), fps=4)
        print(f"[parity] synthesized test clip at {args.video}")

    tokenizer = make_tokenizer(args.checkpoint, args.tokenizer)
    frames = read_strict_fps_clip(args.video, args.video_start, args.video_end)
    print(f"[parity] clip: {frames.shape[0]} frames @ {frames.shape[1]}x{frames.shape[2]}")

    jax_out, jax_ids = run_jax(
        args.checkpoint, frames, args.query, tokenizer=tokenizer, dtype=args.dtype,
        max_new_tokens=args.max_new_tokens, repetition_penalty=args.repetition_penalty)
    print(f"[parity] JAX: {len(jax_out)} chunks, {len(jax_ids)} history tokens")
    for t0, t1, text in jax_out:
        print(f"  [{t0:5.1f}-{t1:5.1f}s] {text!r}")

    if args.skip_hf:
        return 0

    hf_out, hf_ids = run_hf(
        args.checkpoint, frames, args.query, tokenizer=tokenizer, dtype=args.dtype,
        max_new_tokens=args.max_new_tokens, repetition_penalty=args.repetition_penalty)
    report = compare(jax_out, jax_ids, hf_out, hf_ids)
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"report": report, "jax": jax_out, "hf": hf_out}, f, indent=2)
    if not report["token_match"]:
        i = report["first_token_diff"]
        lo = max(0, i - 6)
        print(f"[parity] FIRST DIFF at token {i}: "
              f"jax {jax_ids[lo:i + 3]} vs hf {hf_ids[lo:i + 3]}")
        return 1
    print("[parity] PASS: token-for-token identical")
    return 0


if __name__ == "__main__":
    sys.exit(main())
