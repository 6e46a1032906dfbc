"""HF Whisper checkpoint -> livecc_tpu whisper param pytree.

Mirrors models/qwen2_vl/convert.py: in-memory torch state dicts (tiny
random-init parity tests) or a safetensors checkpoint directory. Linear
weights transpose to (in, out); per-layer tensors stack on a leading layer
axis for lax.scan; conv1d weights [out, in, k] -> [k, in, out].
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Mapping

import numpy as np

import jax.numpy as jnp

from livecc_tpu.models.whisper.model import WhisperConfig

Params = dict[str, Any]


def convert_state_dict(state: Mapping[str, np.ndarray], cfg: WhisperConfig,
                       dtype=jnp.float32) -> Params:
    sd = {k.removeprefix("model."): np.asarray(v) for k, v in state.items()}

    def t(name):
        return jnp.asarray(sd[name].T, dtype)

    def a(name):
        return jnp.asarray(sd[name], dtype)

    def conv(name):   # [out, in, k] -> [k, in, out]
        return jnp.asarray(np.transpose(sd[name], (2, 1, 0)), dtype)

    def stack(fmt: str, n: int, fn: Callable[[str], jnp.ndarray]):
        return jnp.stack([fn(fmt.format(i)) for i in range(n)])

    def attn(side: str, n: int, hf: str, out: dict, pfx: str):
        out[f"{pfx}q_w"] = stack(f"{side}.layers.{{}}.{hf}.q_proj.weight", n, t)
        out[f"{pfx}q_b"] = stack(f"{side}.layers.{{}}.{hf}.q_proj.bias", n, a)
        out[f"{pfx}k_w"] = stack(f"{side}.layers.{{}}.{hf}.k_proj.weight", n, t)
        out[f"{pfx}v_w"] = stack(f"{side}.layers.{{}}.{hf}.v_proj.weight", n, t)
        out[f"{pfx}v_b"] = stack(f"{side}.layers.{{}}.{hf}.v_proj.bias", n, a)
        out[f"{pfx}o_w"] = stack(f"{side}.layers.{{}}.{hf}.out_proj.weight", n, t)
        out[f"{pfx}o_b"] = stack(f"{side}.layers.{{}}.{hf}.out_proj.bias", n, a)

    ne, nd = cfg.encoder_layers, cfg.decoder_layers
    enc_layers: dict = {
        "ln1_w": stack("encoder.layers.{}.self_attn_layer_norm.weight", ne, a),
        "ln1_b": stack("encoder.layers.{}.self_attn_layer_norm.bias", ne, a),
        "ln2_w": stack("encoder.layers.{}.final_layer_norm.weight", ne, a),
        "ln2_b": stack("encoder.layers.{}.final_layer_norm.bias", ne, a),
        "fc1_w": stack("encoder.layers.{}.fc1.weight", ne, t),
        "fc1_b": stack("encoder.layers.{}.fc1.bias", ne, a),
        "fc2_w": stack("encoder.layers.{}.fc2.weight", ne, t),
        "fc2_b": stack("encoder.layers.{}.fc2.bias", ne, a),
    }
    attn("encoder", ne, "self_attn", enc_layers, "")

    dec_layers: dict = {
        "ln1_w": stack("decoder.layers.{}.self_attn_layer_norm.weight", nd, a),
        "ln1_b": stack("decoder.layers.{}.self_attn_layer_norm.bias", nd, a),
        "ln2_w": stack("decoder.layers.{}.encoder_attn_layer_norm.weight", nd, a),
        "ln2_b": stack("decoder.layers.{}.encoder_attn_layer_norm.bias", nd, a),
        "ln3_w": stack("decoder.layers.{}.final_layer_norm.weight", nd, a),
        "ln3_b": stack("decoder.layers.{}.final_layer_norm.bias", nd, a),
        "fc1_w": stack("decoder.layers.{}.fc1.weight", nd, t),
        "fc1_b": stack("decoder.layers.{}.fc1.bias", nd, a),
        "fc2_w": stack("decoder.layers.{}.fc2.weight", nd, t),
        "fc2_b": stack("decoder.layers.{}.fc2.bias", nd, a),
    }
    attn("decoder", nd, "self_attn", dec_layers, "")
    attn("decoder", nd, "encoder_attn", dec_layers, "x")

    return {
        "encoder": {
            "conv1_w": conv("encoder.conv1.weight"),
            "conv1_b": a("encoder.conv1.bias"),
            "conv2_w": conv("encoder.conv2.weight"),
            "conv2_b": a("encoder.conv2.bias"),
            "pos": a("encoder.embed_positions.weight"),
            "layers": enc_layers,
            "final_ln_w": a("encoder.layer_norm.weight"),
            "final_ln_b": a("encoder.layer_norm.bias"),
        },
        "decoder": {
            "embed": a("decoder.embed_tokens.weight"),
            "pos": a("decoder.embed_positions.weight"),
            "layers": dec_layers,
            "final_ln_w": a("decoder.layer_norm.weight"),
            "final_ln_b": a("decoder.layer_norm.bias"),
        },
    }


def convert_torch_model(model, cfg: WhisperConfig, dtype=jnp.float32) -> Params:
    state = {k: v.detach().to("cpu").float().numpy() for k, v in model.state_dict().items()}
    return convert_state_dict(state, cfg, dtype)


def config_from_hf_json(path: str) -> WhisperConfig:
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    return WhisperConfig(
        num_mel_bins=hf["num_mel_bins"],
        d_model=hf["d_model"],
        encoder_layers=hf["encoder_layers"],
        decoder_layers=hf["decoder_layers"],
        num_heads=hf["encoder_attention_heads"],
        ffn_dim=hf["encoder_ffn_dim"],
        vocab_size=hf["vocab_size"],
        max_source_positions=hf.get("max_source_positions", 1500),
        max_target_positions=hf.get("max_target_positions", 448),
        decoder_start_token_id=hf.get("decoder_start_token_id", 50258),
        eos_token_id=hf.get("eos_token_id", 50257),
    )


def load_safetensors_dir(path: str, cfg: WhisperConfig, dtype=jnp.bfloat16) -> Params:
    from safetensors import safe_open

    state: dict[str, np.ndarray] = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors in {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
    return convert_state_dict(state, cfg, dtype)
