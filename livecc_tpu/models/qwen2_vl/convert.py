"""HF checkpoint -> livecc_tpu param pytree.

Accepts either an in-memory torch ``state_dict`` (tests convert tiny
random-init HF models for logits-parity checks) or a directory of
``*.safetensors`` shards (the pinned LiveCC-7B-Instruct / Qwen2-VL hub
checkpoints the reference loads at train.py:13-16 and demo/infer.py:43-47).

Handles both hub-era key names (``visual.*``, ``model.layers.*``) and
transformers>=4.52 names (``model.visual.*``, ``model.language_model.*``).
Linear weights are transposed to (in, out) for x @ W; per-layer tensors are
stacked on a leading layer axis for lax.scan.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable, Mapping

import numpy as np

import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig

Params = dict[str, Any]


def _canonicalize(key: str) -> str:
    key = re.sub(r"^model\.visual\.", "visual.", key)
    key = re.sub(r"^model\.language_model\.", "llm.", key)
    key = re.sub(r"^model\.", "llm.", key)          # hub-era "model.layers.*"
    key = re.sub(r"^language_model\.", "llm.", key)
    return key


def convert_state_dict(state: Mapping[str, np.ndarray], cfg: ModelConfig, dtype=jnp.float32) -> Params:
    """Convert an HF Qwen2VLForConditionalGeneration state dict."""
    sd = {_canonicalize(k): np.asarray(v) for k, v in state.items()}
    tc, vc = cfg.text, cfg.vision

    def t(name):  # transposed linear weight
        return jnp.asarray(sd[name].T, dtype)

    def a(name):
        return jnp.asarray(sd[name], dtype)

    def stack(fmt: str, n: int, fn: Callable[[str], jnp.ndarray]):
        return jnp.stack([fn(fmt.format(i)) for i in range(n)])

    visual = {
        "patch_embed": {
            "kernel": jnp.asarray(sd["visual.patch_embed.proj.weight"].reshape(vc.embed_dim, -1).T, dtype)
        },
        "blocks": {
            "norm1_scale": stack("visual.blocks.{}.norm1.weight", vc.depth, a),
            "norm1_bias": stack("visual.blocks.{}.norm1.bias", vc.depth, a),
            "norm2_scale": stack("visual.blocks.{}.norm2.weight", vc.depth, a),
            "norm2_bias": stack("visual.blocks.{}.norm2.bias", vc.depth, a),
            "qkv_kernel": stack("visual.blocks.{}.attn.qkv.weight", vc.depth, t),
            "qkv_bias": stack("visual.blocks.{}.attn.qkv.bias", vc.depth, a),
            "proj_kernel": stack("visual.blocks.{}.attn.proj.weight", vc.depth, t),
            "proj_bias": stack("visual.blocks.{}.attn.proj.bias", vc.depth, a),
            "fc1_kernel": stack("visual.blocks.{}.mlp.fc1.weight", vc.depth, t),
            "fc1_bias": stack("visual.blocks.{}.mlp.fc1.bias", vc.depth, a),
            "fc2_kernel": stack("visual.blocks.{}.mlp.fc2.weight", vc.depth, t),
            "fc2_bias": stack("visual.blocks.{}.mlp.fc2.bias", vc.depth, a),
        },
        "merger": {
            "ln_q_scale": a("visual.merger.ln_q.weight"),
            "ln_q_bias": a("visual.merger.ln_q.bias"),
            "fc1_kernel": t("visual.merger.mlp.0.weight"),
            "fc1_bias": a("visual.merger.mlp.0.bias"),
            "fc2_kernel": t("visual.merger.mlp.2.weight"),
            "fc2_bias": a("visual.merger.mlp.2.bias"),
        },
    }

    n = tc.num_hidden_layers
    text = {
        "embed": {"weight": a("llm.embed_tokens.weight")},
        "layers": {
            "input_ln": stack("llm.layers.{}.input_layernorm.weight", n, a),
            "post_ln": stack("llm.layers.{}.post_attention_layernorm.weight", n, a),
            "q_kernel": stack("llm.layers.{}.self_attn.q_proj.weight", n, t),
            "q_bias": stack("llm.layers.{}.self_attn.q_proj.bias", n, a),
            "k_kernel": stack("llm.layers.{}.self_attn.k_proj.weight", n, t),
            "k_bias": stack("llm.layers.{}.self_attn.k_proj.bias", n, a),
            "v_kernel": stack("llm.layers.{}.self_attn.v_proj.weight", n, t),
            "v_bias": stack("llm.layers.{}.self_attn.v_proj.bias", n, a),
            "o_kernel": stack("llm.layers.{}.self_attn.o_proj.weight", n, t),
            "gate_kernel": stack("llm.layers.{}.mlp.gate_proj.weight", n, t),
            "up_kernel": stack("llm.layers.{}.mlp.up_proj.weight", n, t),
            "down_kernel": stack("llm.layers.{}.mlp.down_proj.weight", n, t),
        },
        "final_ln": a("llm.norm.weight"),
    }
    if not tc.tie_word_embeddings:
        text["lm_head"] = {"kernel": t("lm_head.weight")}
    return {"visual": visual, "text": text}


def convert_torch_model(model, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    """Convert a live torch Qwen2VLForConditionalGeneration (tests)."""
    state = {k: v.detach().to("cpu").float().numpy() for k, v in model.state_dict().items()}
    return convert_state_dict(state, cfg, dtype)


def load_safetensors_dir(path: str, cfg: ModelConfig, dtype=jnp.bfloat16) -> Params:
    """Load an HF checkpoint directory of safetensors shards."""
    from safetensors import safe_open  # ships with transformers

    state: dict[str, np.ndarray] = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors in {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
    return convert_state_dict(state, cfg, dtype)


def config_from_hf_json(path: str) -> ModelConfig:
    """Build a ModelConfig from an HF config.json (checkpoint directory).

    Handles both layouts: hub-era Qwen2-VL / LiveCC checkpoints keep text
    fields at the top level; transformers>=4.52 saves them nested under
    ``text_config``."""
    from livecc_tpu.core.config import TextConfig, VisionConfig

    with open(os.path.join(path, "config.json")) as f:
        full = json.load(f)
    hf = full.get("text_config", full)
    v = full.get("vision_config", {})
    rope_scaling = hf.get("rope_scaling") or full.get("rope_scaling") or {}
    return ModelConfig(
        vision=VisionConfig(
            depth=v.get("depth", 32),
            embed_dim=v.get("embed_dim", 1280),
            num_heads=v.get("num_heads", 16),
            mlp_ratio=v.get("mlp_ratio", 4.0),
            in_channels=v.get("in_channels", 3),
            patch_size=v.get("patch_size", 14),
            temporal_patch_size=v.get("temporal_patch_size", 2),
            spatial_merge_size=v.get("spatial_merge_size", 2),
            hidden_size=v.get("hidden_size", hf["hidden_size"]),
        ),
        text=TextConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            num_key_value_heads=hf["num_key_value_heads"],
            rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
            rope_theta=hf.get("rope_theta", 1e6),
            mrope_section=tuple(rope_scaling.get("mrope_section", (16, 24, 24))),
            max_position_embeddings=hf.get("max_position_embeddings", 32768),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
        ),
        bos_token_id=full.get("bos_token_id", hf.get("bos_token_id", 151643)),
        eos_token_id=full.get("eos_token_id", hf.get("eos_token_id", 151645)),
        vision_start_token_id=full.get("vision_start_token_id",
                                       hf.get("vision_start_token_id", 151652)),
        vision_end_token_id=full.get("vision_end_token_id",
                                     hf.get("vision_end_token_id", 151653)),
        image_token_id=full.get("image_token_id", hf.get("image_token_id", 151655)),
        video_token_id=full.get("video_token_id", hf.get("video_token_id", 151656)),
        name=os.path.basename(os.path.normpath(path)),
    )
