"""Qwen2-VL combined multimodal model (ViT + LLM + M-RoPE glue).

Behavioral contracts (transformers modeling_qwen2_vl.py):
  * ``get_rope_index`` — per-token 3D (t, h, w) positions from interleaved
    text/vision layout + ``rope_deltas`` for cache continuation. Host-side
    numpy: it depends only on token ids, which the host already owns; the
    device program receives ready position_ids (no data-dependent control
    flow under jit).
  * video embedding scatter — ``inputs_embeds[ids == video_token] = embeds``
    expressed as a mask-gather (static shapes).
  * decode continuation — positions = cache offset + rope_delta
    (Qwen2VLModel.forward position-ids branch; what the reference's
    generation_patch.py relies on).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.models.qwen2_vl.text import KVCache, init_text_params, lm_logits, text_forward
from livecc_tpu.ops.quant import embed_lookup
from livecc_tpu.models.qwen2_vl.vision import init_vision_params, vision_forward
from livecc_tpu.ops.rope import vision_rotary_cos_sin

Params = dict[str, Any]

# ViT attention impl on the TPU path: "flash" (Pallas per-group kernel,
# ops/pallas/vit_attention.py) or "xla" (bf16-scores einsum blocks). Env
# override for A/B experiments, mirroring TRAIN_ATTN in ops/attention.py.
import os as _os

_VIT_ATTN_IMPL = _os.environ.get("VIT_ATTN", "flash")


def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    kv, kt = jax.random.split(key)
    return {
        "visual": init_vision_params(cfg.vision, kv, dtype),
        "text": init_text_params(cfg.text, kt, dtype),
    }


# ---------------------------------------------------------------------------
# Host-side vision auxiliaries (static per patch-grid)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VisionInputs:
    """Device-ready ViT inputs for one forward (all arrays, static shapes).

    ``group`` (static) is the per-temporal-group patch count (grid h*w) when
    uniform — enables the O(N) blocked ViT attention path."""

    patches: jnp.ndarray    # [N, patch_dim]
    cos: jnp.ndarray        # [N, head_dim]
    sin: jnp.ndarray        # [N, head_dim]
    seg_ids: jnp.ndarray    # [N] int32 (pad patches < 0)
    group: int | None = dataclasses.field(default=None, metadata=dict(static=True))


def prepare_vision_inputs(cfg: ModelConfig, patches, grid_thw: list[tuple[int, int, int]]) -> VisionInputs:
    """Build rotary tables + segment ids for a set of clips (host-side).

    When every clip shares one (h, w), the static ``group`` is set and the
    ViT uses the blocked O(N) attention path."""
    cos, sin = vision_rotary_cos_sin(
        grid_thw, cfg.vision.head_dim, spatial_merge_size=cfg.vision.spatial_merge_size
    )
    seg_ids = np.concatenate(
        [np.repeat(np.arange(t) + 10**6 * i, h * w) for i, (t, h, w) in enumerate(grid_thw)]
    ).astype(np.int32)
    hws = {(h, w) for _, h, w in grid_thw}
    group = (grid_thw[0][1] * grid_thw[0][2]) if len(hws) == 1 else None
    return VisionInputs(
        patches=jnp.asarray(patches),
        cos=jnp.asarray(cos),
        sin=jnp.asarray(sin),
        seg_ids=jnp.asarray(seg_ids),
        group=group,
    )


# ---------------------------------------------------------------------------
# get_rope_index (host, numpy) — HF Qwen2VLModel.get_rope_index parity
# ---------------------------------------------------------------------------

def get_rope_index(
    cfg: ModelConfig,
    input_ids: np.ndarray,                     # [B, S]
    image_grid_thw: Optional[np.ndarray] = None,   # [n_img, 3]
    video_grid_thw: Optional[np.ndarray] = None,   # [n_vid, 3]
    attention_mask: Optional[np.ndarray] = None,   # [B, S] 1/0
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (position_ids [3, B, S] int32, rope_deltas [B, 1] int32)."""
    input_ids = np.asarray(input_ids)
    b, s = input_ids.shape
    merge = cfg.vision.spatial_merge_size
    if image_grid_thw is None and video_grid_thw is None:
        if attention_mask is not None:
            pos = np.cumsum(attention_mask, axis=-1) - 1
            pos[attention_mask == 0] = 1
            position_ids = np.broadcast_to(pos[None], (3, b, s)).astype(np.int32)
            deltas = (pos.max(-1, keepdims=True) + 1 - s).astype(np.int32)
        else:
            position_ids = np.broadcast_to(np.arange(s)[None, None], (3, b, s)).astype(np.int32)
            deltas = np.zeros((b, 1), np.int32)
        return np.ascontiguousarray(position_ids), deltas

    if attention_mask is None:
        attention_mask = np.ones_like(input_ids)
    position_ids = np.ones((3, b, s), dtype=np.int64)
    image_index = video_index = 0
    deltas = []
    for i in range(b):
        ids = input_ids[i][attention_mask[i] == 1]
        vision_starts = np.where(ids == cfg.vision_start_token_id)[0]
        vision_tokens = ids[vision_starts + 1] if len(vision_starts) else np.array([], ids.dtype)
        image_nums = int((vision_tokens == cfg.image_token_id).sum())
        video_nums = int((vision_tokens == cfg.video_token_id).sum())
        tokens = ids.tolist()
        pos_list: list[np.ndarray] = []
        st = 0
        remain_images, remain_videos = image_nums, video_nums
        for _ in range(image_nums + video_nums):
            ed_image = tokens.index(cfg.image_token_id, st) if (cfg.image_token_id in tokens[st:] and remain_images > 0) else len(tokens) + 1
            ed_video = tokens.index(cfg.video_token_id, st) if (cfg.video_token_id in tokens[st:] and remain_videos > 0) else len(tokens) + 1
            if ed_image < ed_video:
                t, h, w = image_grid_thw[image_index]
                image_index += 1
                remain_images -= 1
                ed = ed_image
            else:
                t, h, w = video_grid_thw[video_index]
                video_index += 1
                remain_videos -= 1
                ed = ed_video
            gt, gh, gw = int(t), int(h) // merge, int(w) // merge
            text_len = ed - st
            st_idx = int(pos_list[-1].max()) + 1 if pos_list else 0
            pos_list.append(np.broadcast_to(np.arange(text_len), (3, text_len)) + st_idx)
            t_idx = np.repeat(np.arange(gt), gh * gw)
            h_idx = np.tile(np.repeat(np.arange(gh), gw), gt)
            w_idx = np.tile(np.arange(gw), gt * gh)
            pos_list.append(np.stack([t_idx, h_idx, w_idx]) + text_len + st_idx)
            st = ed + gt * gh * gw
        if st < len(tokens):
            st_idx = int(pos_list[-1].max()) + 1 if pos_list else 0
            text_len = len(tokens) - st
            pos_list.append(np.broadcast_to(np.arange(text_len), (3, text_len)) + st_idx)
        pos = np.concatenate(pos_list, axis=1)
        position_ids[:, i, attention_mask[i] == 1] = pos
        deltas.append(int(pos.max()) + 1 - int(s))
    return position_ids.astype(np.int32), np.asarray(deltas, np.int32)[:, None]


def continuation_position_ids(offset: jnp.ndarray, rope_delta: jnp.ndarray, batch: int, seq: int) -> jnp.ndarray:
    """Decode-time positions: cache offset + rope_delta, same on all 3 axes.

    ``offset`` is the per-row [B] cache depth; ``rope_delta`` is [B, 1].
    Reference: Qwen2VLModel.forward else-branch (delta = cache_position[0] +
    rope_deltas) — the piece generation_patch.py:34-35 forces by nulling
    position_ids.
    """
    pos = jnp.arange(seq)[None, None, :] + offset.reshape(1, batch, 1) + rope_delta[None]
    return jnp.broadcast_to(pos, (3, batch, seq)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def scatter_video_embeds(
    cfg: ModelConfig,
    token_embeds: jnp.ndarray,   # [B, S, H]
    input_ids: jnp.ndarray,      # [B, S]
    video_embeds: jnp.ndarray,   # [Nv, H] (all videos concatenated, B==1 or aligned order)
    token_id: int | None = None, # defaults to video_token_id; pass image_token_id for images
) -> jnp.ndarray:
    """Place visual embeddings at placeholder slots (order-preserving)."""
    b, s, h = token_embeds.shape
    token_id = cfg.video_token_id if token_id is None else token_id
    mask = (input_ids == token_id).reshape(-1)
    idx = jnp.cumsum(mask) - 1
    gathered = video_embeds.astype(token_embeds.dtype)[jnp.clip(idx, 0, video_embeds.shape[0] - 1)]
    flat = jnp.where(mask[:, None], gathered, token_embeds.reshape(-1, h))
    return flat.reshape(b, s, h)


def forward(
    params: Params,
    cfg: ModelConfig,
    input_ids: jnp.ndarray,                    # [B, S]
    position_ids: jnp.ndarray,                 # [3, B, S]
    vision: Optional[VisionInputs] = None,
    cache: Optional[KVCache] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    kv_limit: Optional[jnp.ndarray] = None,
    use_flash: bool = False,
    compute_logits: bool = True,
    vision_images: Optional[VisionInputs] = None,   # image clips -> image_token_id slots
    remat: bool = False,
    seq_shard: bool = False,
) -> tuple[jnp.ndarray, Optional[KVCache]]:
    """Full multimodal forward. Returns (logits [B,S,V] fp32 or hidden, cache)."""
    embeds = embed_lookup(params["text"]["embed"]["weight"], input_ids)
    # ViT hot path rides the same switch as the text Pallas kernels: the
    # per-group Pallas kernel on TPU (VIT_ATTN=xla A/Bs back to the bf16-
    # scores XLA path), fp32 XLA on the CPU parity path.
    vit_flash = use_flash and _VIT_ATTN_IMPL == "flash"
    vit_score_dtype = jnp.bfloat16 if use_flash else None
    if vision is not None:
        if vision.patches.ndim == 3:
            # batched serving: per-row clips [B, Np, pd] with shared rotary/
            # segment tables; ViT runs per row, scatter stays row-local
            video_embeds = jax.vmap(
                lambda patches: vision_forward(
                    params["visual"], cfg.vision, patches,
                    vision.cos, vision.sin, vision.seg_ids, vision.group,
                    score_dtype=vit_score_dtype, use_flash=vit_flash,
                )
            )(vision.patches)                                   # [B, Nv, H]
            embeds = jax.vmap(
                lambda e, ids, ve: scatter_video_embeds(cfg, e[None], ids[None], ve)[0]
            )(embeds, input_ids, video_embeds)
        else:
            video_embeds = vision_forward(
                params["visual"], cfg.vision, vision.patches, vision.cos, vision.sin,
                vision.seg_ids, vision.group, score_dtype=vit_score_dtype,
                use_flash=vit_flash,
            )
            embeds = scatter_video_embeds(cfg, embeds, input_ids, video_embeds)
    if vision_images is not None:
        image_embeds = vision_forward(
            params["visual"], cfg.vision, vision_images.patches, vision_images.cos,
            vision_images.sin, vision_images.seg_ids, vision_images.group,
            score_dtype=vit_score_dtype, use_flash=vit_flash,
        )
        embeds = scatter_video_embeds(cfg, embeds, input_ids, image_embeds,
                                      token_id=cfg.image_token_id)
    hidden, new_cache = text_forward(
        params["text"], cfg.text, embeds, position_ids, cache=cache,
        attention_mask=attention_mask, kv_limit=kv_limit, use_flash=use_flash,
        remat=remat, seq_shard=seq_shard,
    )
    if not compute_logits:
        return hidden, new_cache
    return lm_logits(params["text"], cfg.text, hidden), new_cache
