"""CLI streaming-commentary demo (reference demo/cli.py equivalent).

Simulates wall-clock playback: every simulated second, the live engine is
told the new playback position and emits commentary for any newly-available
2-frame chunks; results dump to JSON ({video_path, query, commentaries}).

Usage:
  python -m livecc_tpu.demo.cli --video clip.mp4 --query "..." \
      [--model /path/to/hf_checkpoint] [--seconds 30] [--output out.json]

Without --model, a tiny random-init config + byte tokenizer run the full
pipeline (smoke mode; output is gibberish by construction).
"""

from __future__ import annotations

import argparse
import json


def build_engine(model_path: str | None, cache_len: int = 8192,
                 quantize_weights: bool | None = None, speculative: bool = False):
    import jax
    import jax.numpy as jnp

    from livecc_tpu.core.config import tiny_config
    from livecc_tpu.data.tokenizer import ByteTokenizer, HFTokenizer
    from livecc_tpu.engine import LiveCCEngine
    from livecc_tpu.models.qwen2_vl.convert import config_from_hf_json, load_safetensors_dir
    from livecc_tpu.models.qwen2_vl.model import init_params

    if model_path:
        cfg = config_from_hf_json(model_path)
        params = load_safetensors_dir(model_path, cfg, dtype=jnp.bfloat16)
        tokenizer = HFTokenizer(model_path)
        cache_dtype = jnp.bfloat16
    else:
        cfg = tiny_config()
        params = init_params(cfg, jax.random.PRNGKey(0))
        tokenizer = ByteTokenizer()
        cache_dtype = jnp.float32
    spec = None
    if speculative:
        from livecc_tpu.engine import SpecConfig
        spec = SpecConfig()
    return LiveCCEngine(params, cfg, tokenizer, cache_len=cache_len,
                        cache_dtype=cache_dtype, quantize_weights=quantize_weights,
                        spec=spec)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--video", required=True)
    parser.add_argument("--query", default="Please describe the video.")
    parser.add_argument("--model", default=None, help="HF checkpoint dir (safetensors + tokenizer.json)")
    parser.add_argument("--seconds", type=int, default=30)
    parser.add_argument("--max-new-tokens", type=int, default=16)
    parser.add_argument("--output", default=None)
    parser.add_argument("--streaming-eos-base-threshold", type=float, default=0.0)
    parser.add_argument("--streaming-eos-threshold-step", type=float, default=0.0)
    parser.add_argument("--quantize-weights", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="weight-only int8 LLM weights (half the HBM; "
                             "ops/quant.py). Default: on for TPU serving "
                             "(PERF.md r5 soak A/B), off elsewhere")
    parser.add_argument("--speculative", action="store_true",
                        help="fused on-device lookahead decoding (n-gram "
                             "drafts verified in one forward; "
                             "engine/speculative.py)")
    args = parser.parse_args(argv)

    from livecc_tpu.engine import GenerationParams
    from livecc_tpu.engine.live import LiveCC

    engine = build_engine(args.model, quantize_weights=args.quantize_weights,
                          speculative=args.speculative)
    gen = GenerationParams(
        max_new_tokens=args.max_new_tokens,
        eos_token_id=engine.cfg.eos_token_id,
        pad_token_id=engine.cfg.pad_token_id,
        repetition_penalty=1.05,
        streaming_eos_token_id=(
            engine.streaming_eos_token_id if args.streaming_eos_base_threshold >= 0 else -1
        ),
        streaming_threshold_base=args.streaming_eos_base_threshold,
        streaming_threshold_step=args.streaming_eos_threshold_step,
    )
    live = LiveCC(engine)
    session = live.open(args.video)
    commentaries = []
    for t in range(args.seconds + 1):
        for (t0, t1), text in live.live_cc(session, float(t), query=args.query, gen=gen):
            commentaries.append([t0, t1, text])
            print(f"[{t0:5.1f}-{t1:5.1f}s] {text}")
        if session.video_end:
            break
    result = {"video_path": args.video, "query": args.query, "commentaries": commentaries}
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {args.output}")
    return result


if __name__ == "__main__":
    main()
