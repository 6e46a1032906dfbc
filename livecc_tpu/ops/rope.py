"""Rotary position embeddings: 1D (vision) and 3-section M-RoPE (text).

Behavioral contracts (transformers modeling_qwen2_vl.py):
  * VisionRotaryEmbedding + rot_pos_emb — per-patch (h, w) rotary freqs laid
    out in the 2x2-merge-friendly order; applied in float32.
  * Qwen2VLRotaryEmbedding + apply_multimodal_rotary_pos_emb — cos/sin of
    shape [3, B, S, head_dim] computed in float32 from 3D position ids, then
    interleaved across head-dim channels by mrope_section (t/h/w sections
    repeat over both rotary halves).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


# ---------------------------------------------------------------------------
# Vision (1D rotary over an (h, w) patch grid, merge-order layout)
# ---------------------------------------------------------------------------

def vision_rot_pos_ids(grid_thw: list[tuple[int, int, int]], spatial_merge_size: int = 2) -> np.ndarray:
    """Per-patch (h_pos, w_pos) ids in the ViT's 2x2-merge scan order.

    Host-side (numpy): depends only on the static patch grid. Matches
    Qwen2VisionTransformer.rot_pos_emb.
    """
    out = []
    m = spatial_merge_size
    for t, h, w in grid_thw:
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hpos = hpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wpos = wpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        ids = np.stack([hpos, wpos], axis=-1)          # [h*w, 2]
        out.append(np.tile(ids, (t, 1)))               # repeat over temporal groups
    return np.concatenate(out, axis=0)                  # [sum t*h*w, 2]


def vision_rotary_cos_sin(
    grid_thw: list[tuple[int, int, int]],
    head_dim: int,
    theta: float = 10000.0,
    spatial_merge_size: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of shape [N, head_dim] for the ViT, float32, host-side."""
    dim = head_dim // 2  # rotary dim per (h, w) component
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    pos = vision_rot_pos_ids(grid_thw, spatial_merge_size)          # [N, 2]
    max_grid = int(max(max(h, w) for _, h, w in grid_thw))
    freqs_full = np.outer(np.arange(max_grid, dtype=np.float64), inv_freq)  # [G, dim/2]
    freqs = freqs_full[pos].reshape(pos.shape[0], -1)               # [N, dim] (h then w)
    emb = np.concatenate([freqs, freqs], axis=-1)                   # [N, head_dim]
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def apply_rotary_vision(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """q, k: [N, heads, head_dim]; cos/sin: [N, head_dim]. Float32 math."""
    dtype = q.dtype
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    c = cos[:, None, :].astype(jnp.float32)
    s = sin[:, None, :].astype(jnp.float32)
    q_out = qf * c + rotate_half(qf) * s
    k_out = kf * c + rotate_half(kf) * s
    return q_out.astype(dtype), k_out.astype(dtype)


# ---------------------------------------------------------------------------
# Text (M-RoPE)
# ---------------------------------------------------------------------------

def mrope_cos_sin(
    position_ids: jnp.ndarray,       # [3, B, S] int
    head_dim: int,
    rope_theta: float,
    mrope_section: tuple[int, int, int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token cos/sin [B, S, head_dim] with mrope sections already selected.

    Fuses Qwen2VLRotaryEmbedding.forward (cos/sin over all 3 position rows)
    with the section-select of apply_multimodal_rotary_pos_emb, so downstream
    attention only sees one [B, S, head_dim] pair. Float32 throughout.
    """
    inv_freq = 1.0 / (rope_theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    # freqs: [3, B, S, head_dim/2]
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)       # [3, B, S, head_dim]
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    # Section select: channels [0:s0] from t, [s0:s0+s1] from h, [s0+s1:half]
    # from w — repeated for the second rotary half (mrope_section * 2).
    sections = list(mrope_section) * 2
    starts = np.cumsum([0] + sections[:-1])
    cos_parts = [cos[i % 3, :, :, st:st + ln] for i, (st, ln) in enumerate(zip(starts, sections))]
    sin_parts = [sin[i % 3, :, :, st:st + ln] for i, (st, ln) in enumerate(zip(starts, sections))]
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_mrope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """q: [B, S, Hq, D], k: [B, S, Hk, D]; cos/sin: [B, S, D] (pre-selected)."""
    dtype = q.dtype
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    cf, sf = c.astype(jnp.float32), s.astype(jnp.float32)
    q_out = qf * cf + rotate_half(qf) * sf
    k_out = kf * cf + rotate_half(kf) * sf
    return q_out.astype(dtype), k_out.astype(dtype)
