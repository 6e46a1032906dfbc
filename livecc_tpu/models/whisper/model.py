"""Whisper encoder-decoder in functional JAX (N8-equivalent).

The reference's ASR stage runs faster-whisper (CTranslate2) over YouTube
audio (data/production/distributed_whisperx.py:7-23); this is the TPU-native
model behind tools/asr.py. Behavioral contract: transformers
WhisperForConditionalGeneration — pre-LN blocks, q scaled by head_dim^-0.5,
k_proj without bias, sinusoidal (stored) encoder positions, learned decoder
positions, tied lm_head. Layer params stack on a leading axis and run under
``lax.scan``; greedy decode keeps a static self-attn KV cache and
precomputed cross-attention K/V.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    """Shapes mirror HF WhisperConfig; defaults = large-v3-turbo."""

    num_mel_bins: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    decoder_layers: int = 4
    num_heads: int = 20
    ffn_dim: int = 5120
    vocab_size: int = 51866
    max_source_positions: int = 1500
    max_target_positions: int = 448
    # special ids (large-v3 tokenizer)
    decoder_start_token_id: int = 50258   # <|startoftranscript|>
    eos_token_id: int = 50257             # <|endoftext|>
    no_timestamps_token_id: int = 50364
    timestamp_begin: int = 50365          # <|0.00|>

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


def tiny_whisper_config(vocab_size: int = 256) -> WhisperConfig:
    return WhisperConfig(
        num_mel_bins=16, d_model=32, encoder_layers=2, decoder_layers=2,
        num_heads=4, ffn_dim=64, vocab_size=vocab_size,
        max_source_positions=32, max_target_positions=32,
        decoder_start_token_id=1, eos_token_id=2,
        no_timestamps_token_id=10, timestamp_begin=11,
    )


def _layer_norm(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * w + b


def _mha(q, k, v, num_heads, causal=False):
    """[B, Sq, D] x [B, Sk, D] -> [B, Sq, D]; q pre-scaled by caller."""
    b, sq, d = q.shape
    sk = k.shape[1]
    hd = d // num_heads
    qh = q.reshape(b, sq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, sk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, sk, num_heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    if causal:
        mask = jnp.tril(jnp.ones((sq, sk), bool), k=sk - sq)
        s = jnp.where(mask[None, None], s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, sq, d)


def whisper_encode(params: Params, cfg: WhisperConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """[B, n_mels, 3000] -> [B, 1500, D] encoder states."""
    enc = params["encoder"]
    x = jnp.transpose(mel, (0, 2, 1)).astype(enc["conv1_w"].dtype)  # [B, T, n_mels]
    # conv1: k3 s1 p1; conv2: k3 s2 p1 (HF Conv1d semantics)
    x = lax.conv_general_dilated(
        x, enc["conv1_w"], window_strides=(1,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + enc["conv1_b"]
    x = jax.nn.gelu(x, approximate=False)
    x = lax.conv_general_dilated(
        x, enc["conv2_w"], window_strides=(2,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + enc["conv2_b"]
    x = jax.nn.gelu(x, approximate=False)                  # [B, 1500, D]
    x = x + enc["pos"][None, : x.shape[1]]

    scale = cfg.head_dim ** -0.5

    def block(x, layer):
        y = _layer_norm(x, layer["ln1_w"], layer["ln1_b"])
        q = (y @ layer["q_w"] + layer["q_b"]) * scale
        k = y @ layer["k_w"]
        v = y @ layer["v_w"] + layer["v_b"]
        a = _mha(q, k, v, cfg.num_heads)
        x = x + a @ layer["o_w"] + layer["o_b"]
        y = _layer_norm(x, layer["ln2_w"], layer["ln2_b"])
        y = jax.nn.gelu(y @ layer["fc1_w"] + layer["fc1_b"], approximate=False)
        return x + y @ layer["fc2_w"] + layer["fc2_b"], None

    x, _ = lax.scan(block, x, enc["layers"])
    return _layer_norm(x, enc["final_ln_w"], enc["final_ln_b"])


def whisper_decode(
    params: Params,
    cfg: WhisperConfig,
    ids: jnp.ndarray,            # [B, S]
    encoder_states: jnp.ndarray, # [B, Se, D]
    position_offset: int | jnp.ndarray = 0,
) -> jnp.ndarray:
    """Full-prefix decoder forward -> logits [B, S, V] (no cache; parity and
    short offline segments — a segment is <= 448 tokens)."""
    dec = params["decoder"]
    b, s = ids.shape
    pos = jnp.arange(s) + position_offset
    x = dec["embed"][ids] + dec["pos"][pos][None]
    scale = cfg.head_dim ** -0.5

    def block(x, layer):
        y = _layer_norm(x, layer["ln1_w"], layer["ln1_b"])
        q = (y @ layer["q_w"] + layer["q_b"]) * scale
        k = y @ layer["k_w"]
        v = y @ layer["v_w"] + layer["v_b"]
        x = x + _mha(q, k, v, cfg.num_heads, causal=True) @ layer["o_w"] + layer["o_b"]
        y = _layer_norm(x, layer["ln2_w"], layer["ln2_b"])
        q = (y @ layer["xq_w"] + layer["xq_b"]) * scale
        k = encoder_states @ layer["xk_w"]
        v = encoder_states @ layer["xv_w"] + layer["xv_b"]
        x = x + _mha(q, k, v, cfg.num_heads) @ layer["xo_w"] + layer["xo_b"]
        y = _layer_norm(x, layer["ln3_w"], layer["ln3_b"])
        y = jax.nn.gelu(y @ layer["fc1_w"] + layer["fc1_b"], approximate=False)
        return x + y @ layer["fc2_w"] + layer["fc2_b"], None

    x, _ = lax.scan(block, x, dec["layers"])
    x = _layer_norm(x, dec["final_ln_w"], dec["final_ln_b"])
    return (x @ dec["embed"].T).astype(jnp.float32)


def greedy_transcribe_tokens(
    params: Params,
    cfg: WhisperConfig,
    mel: np.ndarray,                       # [n_mels, 3000] one 30 s segment
    prompt_ids: list[int],
    max_new_tokens: int | None = None,
) -> list[int]:
    """Greedy token ids for one segment (host loop over a jitted step).

    The decoder prefix recomputes each step — segments are short (<=448) and
    this tool is offline (reference runs it as a batch corpus job)."""
    # clamp to the position-table capacity: a caller-supplied max_new_tokens
    # past max_target_positions - len(prompt_ids) would grow ids past the
    # pad bucket (buf[0, :len(ids)] raises) and overflow the learned
    # position embedding
    max_new = max_new_tokens or cfg.max_target_positions
    max_new = min(max_new, cfg.max_target_positions - len(prompt_ids))
    enc = jax.jit(whisper_encode, static_argnums=1)(params, cfg, jnp.asarray(mel)[None])

    @functools.partial(jax.jit, static_argnums=2)
    def step(params, ids, cfg, enc, pos):
        logits = whisper_decode(params, cfg, ids, enc)
        return jnp.argmax(logits[0, pos])

    ids = list(prompt_ids)
    for _ in range(max_new):
        # pad the prefix to a power-of-two bucket: one compile per bucket,
        # not one per length (causality makes the tail padding inert)
        bucket = 8
        while bucket < len(ids):
            bucket *= 2
        bucket = min(bucket, cfg.max_target_positions)
        buf = np.zeros((1, bucket), np.int32)
        buf[0, : len(ids)] = ids
        nxt = int(step(params, jnp.asarray(buf), cfg, enc, len(ids) - 1))
        ids.append(nxt)
        if nxt == cfg.eos_token_id:
            break
    return ids[len(prompt_ids):]
