"""End-to-end parity-tool test: JAX engine vs HF torch streaming replay.

Exercises the full ``tools/parity_vs_hf.py`` pipeline on a freshly-built
random-weight checkpoint saved through ``save_pretrained`` (the REAL
checkpoint-directory layout: nested ``text_config``, safetensors shards),
proving the one-command parity claim end-to-end:

  * ``config_from_hf_json`` parses a modern nested-text_config config.json;
  * ``load_safetensors_dir`` converts real safetensors;
  * the streaming engine's chunked greedy output is token-for-token
    identical to the reference protocol replayed through HF ``generate``
    (reference demo/infer.py:244-310 + generation_patch.py semantics),
    INCLUDING continuation prefills that carry new video tokens — the one
    path tiny npz goldens never covered (tests/goldens item 6 is text-only
    continuation), and where modern transformers' base
    ``prepare_inputs_for_generation`` silently drops pixel kwargs.

Skipped when torch/transformers are unavailable. ~2-4 min on this host
(torch model build + two full streaming replays); runs on the CPU backend
with fp32 matmuls (conftest), the exact-parity regime.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "parity_vs_hf", os.path.join(_TOOLS, "parity_vs_hf.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """Tiny random Qwen2-VL saved with save_pretrained (nested text_config)."""
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    text = dict(
        vocab_size=1024, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-6, rope_theta=1e6, max_position_embeddings=2048,
        tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        bos_token_id=0, eos_token_id=3, pad_token_id=0,
    )
    vision = dict(depth=2, embed_dim=64, num_heads=4, hidden_size=64,
                  patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
                  in_channels=3)
    cfg = Qwen2VLConfig(text_config=text, vision_config=vision,
                        image_token_id=6, video_token_id=7,
                        vision_start_token_id=4, vision_end_token_id=5)
    torch.manual_seed(0)
    model = Qwen2VLForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("ckpt") / "tiny"
    model.save_pretrained(str(path))
    return str(path), model


def test_parity_tool_end_to_end(checkpoint, tmp_path):
    path, torch_model = checkpoint
    tool = _load_tool()

    from livecc_tpu.vision_io.video_reader import encode_test_video

    clip = str(tmp_path / "clip.mp4")
    rng = np.random.RandomState(0)
    # 8 frames @ 4 fps -> strict-fps resample to 2 fps -> 6-frame init chunk
    # + one 2-frame continuation chunk WITH video tokens (the critical path).
    encode_test_video(clip, rng.randint(0, 255, (16, 112, 112, 3), np.uint8), fps=4)

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")

    tokenizer = tool.make_tokenizer(path, "byte")
    frames = tool.read_strict_fps_clip(clip)
    assert len(frames) >= 8, "need at least one continuation chunk"

    query = "Please describe the video."
    jax_out, jax_ids = tool.run_jax(
        path, frames, query, tokenizer=tokenizer, dtype="fp32",
        max_new_tokens=6, repetition_penalty=1.05)
    hf_out, hf_ids = tool.run_hf(
        path, frames, query, tokenizer=tokenizer, dtype="fp32",
        max_new_tokens=6, repetition_penalty=1.05, torch_model=torch_model)

    report = tool.compare(jax_out, jax_ids, hf_out, hf_ids)
    assert report["chunks_jax"] >= 2
    assert report["token_match"], report


def test_config_from_hf_json_nested(checkpoint):
    """Nested text_config checkpoints parse to the same ModelConfig fields."""
    path, _ = checkpoint
    from livecc_tpu.models.qwen2_vl.convert import config_from_hf_json

    cfg = config_from_hf_json(path)
    assert cfg.text.hidden_size == 64
    assert cfg.text.num_key_value_heads == 2
    assert cfg.text.mrope_section == (2, 3, 3)
    assert cfg.video_token_id == 7
    assert cfg.vision_start_token_id == 4
    assert cfg.vision.spatial_merge_size == 2
