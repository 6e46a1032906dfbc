"""Frames -> Qwen2-VL patch sequence (normalize + 3D patchify), host and device.

Behavioral contract: transformers Qwen2VLImageProcessor._preprocess — per-frame
rescale(1/255) + CLIP-normalize, temporal stacking by temporal_patch_size=2,
and the exact 9-D transpose that flattens a clip to
``[grid_t*grid_h*grid_w, C*tps*ps*ps]`` alongside ``grid_thw = (t, h, w)``.
The LLM sees ``t*h*w / merge_size**2`` video tokens after the ViT's 2x2 merge.

Two paths are provided:
  * numpy (`patchify_video`) for the host data pipeline (training dataset);
  * jax (`device_preprocess`) — resize + normalize + patchify fused under jit
    for the streaming engine, so raw decoded frames can be shipped to device
    and prepared there (the reference does all of this on CPU via torchvision;
    on TPU we keep the HBM-bound work on device).
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

# CLIP normalization constants (Qwen2VLImageProcessor defaults).
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)

PATCH_SIZE = 14
TEMPORAL_PATCH_SIZE = 2
MERGE_SIZE = 2


def normalize_frames(frames: Any, xp=np) -> Any:
    """uint8/float frames in [0,255], (T, C, H, W) -> CLIP-normalized float32."""
    mean = xp.asarray(IMAGE_MEAN, dtype=xp.float32).reshape(1, 3, 1, 1)
    std = xp.asarray(IMAGE_STD, dtype=xp.float32).reshape(1, 3, 1, 1)
    frames = frames.astype(xp.float32) * (1.0 / 255.0)
    return (frames - mean) / std


def _patchify(frames: Any, xp, patch_size: int, temporal_patch_size: int, merge_size: int):
    t, c, h, w = frames.shape
    if t % temporal_patch_size != 0:
        reps = temporal_patch_size - t % temporal_patch_size
        frames = xp.concatenate([frames] + [frames[-1:]] * reps, axis=0)
        t = frames.shape[0]
    grid_t = t // temporal_patch_size
    grid_h, grid_w = h // patch_size, w // patch_size
    patches = frames.reshape(
        grid_t,
        temporal_patch_size,
        c,
        grid_h // merge_size,
        merge_size,
        patch_size,
        grid_w // merge_size,
        merge_size,
        patch_size,
    )
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = patches.reshape(grid_t * grid_h * grid_w, c * temporal_patch_size * patch_size * patch_size)
    return flat, (grid_t, grid_h, grid_w)


def patchify_video(
    frames: np.ndarray,
    *,
    patch_size: int = PATCH_SIZE,
    temporal_patch_size: int = TEMPORAL_PATCH_SIZE,
    merge_size: int = MERGE_SIZE,
    normalize: bool = True,
) -> tuple[np.ndarray, tuple[int, int, int]]:
    """Host path: (T, C, H, W) frames -> (flatten_patches, grid_thw)."""
    frames = np.asarray(frames)
    if normalize:
        frames = normalize_frames(frames, xp=np)
    return _patchify(frames, np, patch_size, temporal_patch_size, merge_size)


def grid_for_frames(t: int, h: int, w: int, cfg) -> tuple[int, int, int]:
    """grid_thw for a [t, h, w] clip as ``device_patchify`` lays it out:
    CEIL on the temporal axis (patchify right-pads T to a
    temporal_patch_size multiple, so an odd T counts the padded group —
    HF computes grid after padding). Single source of truth for every
    host-side token-count/rotary-table computation."""
    return (max(-(-t // cfg.temporal_patch_size), 1),
            h // cfg.patch_size, w // cfg.patch_size)


@functools.partial(jax.jit, static_argnames=("n_pad", "patch_size", "temporal_patch_size", "merge_size"))
def device_patchify(
    frames: jax.Array,         # [T, H, W, C] uint8 (native decoder layout, pre-scaled)
    *,
    n_pad: int = 0,
    patch_size: int = PATCH_SIZE,
    temporal_patch_size: int = TEMPORAL_PATCH_SIZE,
    merge_size: int = MERGE_SIZE,
) -> jax.Array:
    """Device path for streaming: normalize + patchify pre-scaled frames.

    Ships uint8 frames to the device (4x less transfer than fp32 patches)
    and keeps the bandwidth-bound normalize/patchify on the TPU. ``n_pad``
    zero rows pad the output to the engine's static patch bucket.
    """
    x = jnp.transpose(frames, (0, 3, 1, 2)).astype(jnp.float32)  # TCHW
    x = normalize_frames(x, xp=jnp)
    flat, _ = _patchify(x, jnp, patch_size, temporal_patch_size, merge_size)
    if n_pad:
        flat = jnp.pad(flat, ((0, n_pad), (0, 0)))
    return flat


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "patch_size", "temporal_patch_size", "merge_size"))
def device_preprocess(
    frames: jax.Array,
    *,
    out_h: int,
    out_w: int,
    patch_size: int = PATCH_SIZE,
    temporal_patch_size: int = TEMPORAL_PATCH_SIZE,
    merge_size: int = MERGE_SIZE,
) -> jax.Array:
    """Device path: raw (T, H, W, C) uint8 frames -> flatten_patches.

    Fuses bicubic antialiased resize (torchvision-equivalent, N6 in SURVEY.md
    §2b), CLIP normalization and 3D patchify in one jit program. T must be a
    multiple of temporal_patch_size (the streaming engine guarantees this via
    FRAME_FACTOR padding).
    """
    t = frames.shape[0]
    x = frames.astype(jnp.float32)
    x = jax.image.resize(x, (t, out_h, out_w, x.shape[-1]), method="bicubic", antialias=True)
    x = jnp.transpose(x, (0, 3, 1, 2))  # TCHW
    x = normalize_frames(x, xp=jnp)
    flat, _ = _patchify(x, jnp, patch_size, temporal_patch_size, merge_size)
    return flat
