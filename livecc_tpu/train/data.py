"""Host collation: processed samples -> static-shape training Batch.

The reference trains at per-device batch 1 with 64-step gradient accumulation
(scripts/pt_local.sh:17-18); here the accumulation window is one stacked
Batch ([A, B, S]) consumed by a single compiled step. Sequence lengths and
patch counts are padded to power-of-two buckets so the corpus's length
spread maps to a handful of compiled programs.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.ops.rope import vision_rotary_cos_sin
from livecc_tpu.train.step import Batch

SEQ_BUCKETS = (256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
PATCH_BUCKETS = (512, 1024, 2048, 4096, 8192, 16384, 32768, 65536, 131072)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"{n} exceeds largest bucket {buckets[-1]}")


def collate(samples: list[dict[str, Any]], cfg: ModelConfig) -> Batch:
    """Stack A processed samples (train step's accumulation window)."""
    a = len(samples)
    s_max = _bucket(max(x["input_ids"].shape[1] for x in samples), SEQ_BUCKETS)
    n_max = _bucket(
        max((x["pixel_patches"].shape[0] if x["pixel_patches"] is not None else 1) for x in samples),
        PATCH_BUCKETS,
    )
    hd = cfg.vision.head_dim
    pd = cfg.vision.patch_dim

    ids = np.zeros((a, 1, s_max), np.int32)
    labels = np.full((a, 1, s_max), -100, np.int32)
    pos = np.zeros((a, 3, 1, s_max), np.int32)
    mask = np.zeros((a, 1, s_max), bool)
    patches = np.zeros((a, n_max, pd), np.float32)
    cos = np.ones((a, n_max, hd), np.float32)
    sin = np.zeros((a, n_max, hd), np.float32)
    seg = np.full((a, n_max), -1, np.int32)
    has_images = any(x.get("image_patches") is not None for x in samples)
    ni_max = _bucket(
        max((x["image_patches"].shape[0] if x.get("image_patches") is not None else 1)
            for x in samples),
        PATCH_BUCKETS,
    ) if has_images else 0
    ipatches = np.zeros((a, ni_max, pd), np.float32)
    icos = np.ones((a, ni_max, hd), np.float32)
    isin = np.zeros((a, ni_max, hd), np.float32)
    iseg = np.full((a, ni_max), -1, np.int32)

    for i, x in enumerate(samples):
        n = x["input_ids"].shape[1]
        ids[i, 0, :n] = x["input_ids"][0]
        labels[i, 0, :n] = x["labels"][0]
        pos[i, :, 0, :n] = x["position_ids"][:, 0]
        pos[i, :, 0, n:] = pos[i, :, 0, n - 1: n] + np.arange(1, s_max - n + 1)
        mask[i, 0, :n] = True
        if has_images and x.get("image_patches") is not None:
            p = x["image_patches"]
            ipatches[i, : p.shape[0]] = p
            igrids = [tuple(g) for g in x["image_grid_thw"]]
            c, sn = vision_rotary_cos_sin(igrids, hd, spatial_merge_size=cfg.vision.spatial_merge_size)
            icos[i, : c.shape[0]] = c
            isin[i, : sn.shape[0]] = sn
            iseg[i, : p.shape[0]] = np.concatenate(
                [np.repeat(np.arange(t) + 10**6 * j, h * w) for j, (t, h, w) in enumerate(igrids)]
            )
        if x["pixel_patches"] is not None:
            p = x["pixel_patches"]
            patches[i, : p.shape[0]] = p
            grids = [tuple(g) for g in x["video_grid_thw"]]
            c, sn = vision_rotary_cos_sin(grids, hd, spatial_merge_size=cfg.vision.spatial_merge_size)
            cos[i, : c.shape[0]] = c
            sin[i, : sn.shape[0]] = sn
            seg[i, : p.shape[0]] = np.concatenate(
                [np.repeat(np.arange(t) + 10**6 * j, h * w) for j, (t, h, w) in enumerate(grids)]
            )

    return Batch(
        input_ids=jnp.asarray(ids),
        labels=jnp.asarray(labels),
        position_ids=jnp.asarray(pos),
        attention_mask=jnp.asarray(mask),
        vision_patches=jnp.asarray(patches),
        vision_cos=jnp.asarray(cos),
        vision_sin=jnp.asarray(sin),
        vision_seg_ids=jnp.asarray(seg),
        image_patches=jnp.asarray(ipatches) if has_images else None,
        image_cos=jnp.asarray(icos) if has_images else None,
        image_sin=jnp.asarray(isin) if has_images else None,
        image_seg_ids=jnp.asarray(iseg) if has_images else None,
    )
