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


def collate(samples: list[dict[str, Any]], cfg: ModelConfig, rows: int = 1) -> Batch:
    """Stack processed samples into one accumulation-window Batch.

    ``rows`` > 1 packs consecutive samples into the batch (B) dimension for
    data parallelism: micro-step ``a`` holds ``samples[a*rows:(a+1)*rows]``,
    one per data-axis rank (the reference's per-GPU batch 1,
    scripts/pt_local.sh:17). Each micro-step's video patches are concatenated
    in row order — `scatter_video_embeds` places them by global token order,
    so the layout matches the row-major flattened input ids.
    """
    assert len(samples) % rows == 0, (len(samples), rows)
    a = len(samples) // rows
    window = [samples[i * rows:(i + 1) * rows] for i in range(a)]
    s_max = _bucket(max(x["input_ids"].shape[1] for x in samples), SEQ_BUCKETS)
    n_max = _bucket(
        max(sum(x["pixel_patches"].shape[0] if x["pixel_patches"] is not None else 1
                for x in row_samples)
            for row_samples in window),
        PATCH_BUCKETS,
    )
    # Uniform spatial grid across the window -> blocked O(N) ViT attention
    # (one shape per (bucket, group)); mixed resolutions fall back to the
    # seg-mask path.
    hws = {(int(g[1]), int(g[2]))
           for x in samples if x["pixel_patches"] is not None
           for g in x["video_grid_thw"]}
    vision_group = None
    if len(hws) == 1:
        (gh, gw), = hws
        vision_group = gh * gw
        n_max = -(-n_max // vision_group) * vision_group
    hd = cfg.vision.head_dim
    pd = cfg.vision.patch_dim

    ids = np.zeros((a, rows, s_max), np.int32)
    labels = np.full((a, rows, s_max), -100, np.int32)
    pos = np.zeros((a, 3, rows, s_max), np.int32)
    mask = np.zeros((a, rows, s_max), bool)
    patches = np.zeros((a, n_max, pd), np.float32)
    cos = np.ones((a, n_max, hd), np.float32)
    sin = np.zeros((a, n_max, hd), np.float32)
    seg = np.full((a, n_max), -1, np.int32)
    has_images = any(x.get("image_patches") is not None for x in samples)
    ni_max = _bucket(
        max(sum(x["image_patches"].shape[0] if x.get("image_patches") is not None else 1
                for x in row_samples)
            for row_samples in window),
        PATCH_BUCKETS,
    ) if has_images else 0
    ipatches = np.zeros((a, ni_max, pd), np.float32)
    icos = np.ones((a, ni_max, hd), np.float32)
    isin = np.zeros((a, ni_max, hd), np.float32)
    iseg = np.full((a, ni_max), -1, np.int32)

    def _append_clips(dst_p, dst_c, dst_s, dst_seg, i, off, clip_idx, p, grids):
        c, sn = vision_rotary_cos_sin(grids, hd, spatial_merge_size=cfg.vision.spatial_merge_size)
        dst_p[i, off: off + p.shape[0]] = p
        dst_c[i, off: off + c.shape[0]] = c
        dst_s[i, off: off + sn.shape[0]] = sn
        dst_seg[i, off: off + p.shape[0]] = np.concatenate(
            [np.repeat(np.arange(t) + 10**6 * (clip_idx + j), h * w)
             for j, (t, h, w) in enumerate(grids)]
        )
        return off + p.shape[0], clip_idx + len(grids)

    for i, row_samples in enumerate(window):
        v_off = i_off = v_clip = i_clip = 0
        for b, x in enumerate(row_samples):
            n = x["input_ids"].shape[1]
            ids[i, b, :n] = x["input_ids"][0]
            labels[i, b, :n] = x["labels"][0]
            pos[i, :, b, :n] = x["position_ids"][:, 0]
            pos[i, :, b, n:] = pos[i, :, b, n - 1: n] + np.arange(1, s_max - n + 1)
            mask[i, b, :n] = True
            if has_images and x.get("image_patches") is not None:
                i_off, i_clip = _append_clips(
                    ipatches, icos, isin, iseg, i, i_off, i_clip,
                    x["image_patches"], [tuple(g) for g in x["image_grid_thw"]],
                )
            if x["pixel_patches"] is not None:
                v_off, v_clip = _append_clips(
                    patches, cos, sin, seg, i, v_off, v_clip,
                    x["pixel_patches"], [tuple(g) for g in x["video_grid_thw"]],
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
        vision_group=vision_group,
    )


def pack_samples(samples: list[dict[str, Any]], seq_len: int,
                 max_rows: int | None = None
                 ) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Greedily merge processed samples into packed pseudo-samples of at
    most ``seq_len`` tokens each (first-fit in arrival order, no reordering
    — preserves the sampler's distribution).

    Sequence packing is a beyond-reference throughput feature: the
    reference trains per-device batch 1 with right-padding to the longest
    sample (HF Trainer), so a 2k-token clip in an 8k bucket wastes 75% of
    the step's FLOPs. Packed rows carry int32 SEGMENT ids (1..n per sample,
    0 = pad): attention is blocked per sample (splash segment ids on TPU;
    pairwise mask on the XLA path), positions restart per sample, and each
    sample's first-token label is forced -100 so the next-token shift never
    crosses a boundary.

    Returns ``(packed, leftovers)`` — ``leftovers`` are the samples NOT
    included in any returned row, in their original order (the Trainer's
    packing buffer carries them to the next window). Samples that do not
    fit ``seq_len`` alone are dropped with a warning (the dataset's token
    budgeting makes them rare at the reference's 24,576-visual-token cap).
    ``max_rows`` stops once that many rows are CLOSED.
    """
    packed: list[dict[str, Any]] = []
    cur: dict[str, Any] | None = None
    cur_members: list[dict[str, Any]] = []
    leftovers: list[dict[str, Any]] = []

    def close():
        nonlocal cur
        if cur is not None:
            packed.append(cur)
            cur = None
            cur_members.clear()

    for si, x in enumerate(samples):
        if max_rows is not None and len(packed) >= max_rows:
            leftovers.extend(cur_members)
            cur = None
            leftovers.extend(samples[si:])
            return packed, leftovers
        n = x["input_ids"].shape[1]
        if n > seq_len:
            import warnings

            warnings.warn(f"pack_samples: dropping a {n}-token sample > seq_len {seq_len}")
            continue
        if cur is not None and cur["input_ids"].shape[1] + n > seq_len:
            close()
        if cur is None:
            seg = np.ones((1, n), np.int32)
            labels = x["labels"].copy()
            labels[0, 0] = -100
            cur = {
                "input_ids": x["input_ids"].copy(),
                "labels": labels,
                "position_ids": x["position_ids"].copy(),
                "segments": seg,
                "pixel_patches": x["pixel_patches"],
                "video_grid_thw": x["video_grid_thw"],
                "image_patches": x.get("image_patches"),
                "image_grid_thw": x.get("image_grid_thw"),
                "n_samples": 1,
            }
        else:
            k = cur["n_samples"] + 1
            labels = x["labels"].copy()
            labels[0, 0] = -100
            cur["input_ids"] = np.concatenate([cur["input_ids"], x["input_ids"]], axis=1)
            cur["labels"] = np.concatenate([cur["labels"], labels], axis=1)
            cur["position_ids"] = np.concatenate(
                [cur["position_ids"], x["position_ids"]], axis=2)
            cur["segments"] = np.concatenate(
                [cur["segments"], np.full((1, n), k, np.int32)], axis=1)
            for pk, gk in (("pixel_patches", "video_grid_thw"),
                           ("image_patches", "image_grid_thw")):
                if x.get(pk) is not None:
                    cur[pk] = (x[pk] if cur.get(pk) is None
                               else np.concatenate([cur[pk], x[pk]]))
                    cur[gk] = (x[gk] if cur.get(gk) is None
                               else np.concatenate([cur[gk], x[gk]]))
            cur["n_samples"] = k
        cur_members.append(x)
    if max_rows is None:
        close()
    elif len(packed) < max_rows:
        close()
    else:
        leftovers.extend(cur_members)
    return packed, leftovers


def collate_packed(samples: list[dict[str, Any]], cfg: ModelConfig, *,
                   rows: int = 1, seq_len: int = 8192) -> Batch:
    """``pack_samples`` + ``collate``; the Batch's attention_mask carries
    int32 segment ids instead of a bool validity mask (0 = pad)."""
    packed, _ = pack_samples(samples, seq_len)
    return collate_packed_rows(packed, cfg, rows=rows)


def collate_packed_rows(packed: list[dict[str, Any]], cfg: ModelConfig, *,
                        rows: int = 1, accum: int | None = None) -> Batch:
    """Collate ALREADY-packed rows (``pack_samples`` output). ``accum``
    forces the accumulation depth: missing rows are padded with empty
    (all-pad, zero-supervised) rows so every step compiles to one shape."""
    packed = list(packed)
    target = None if accum is None else accum * rows
    if target is not None:
        assert len(packed) <= target, (len(packed), target)
    # pad the pack count to a full accumulation window: an empty row is all
    # pad (segment 0, zero supervised tokens) and contributes nothing
    while (len(packed) % rows) or (target is not None and len(packed) < target):
        packed.append({
            "input_ids": np.full((1, 1), 0, np.int32),
            "labels": np.full((1, 1), -100, np.int32),
            "position_ids": np.zeros((3, 1, 1), np.int32),
            "segments": np.zeros((1, 1), np.int32),
            "pixel_patches": None, "video_grid_thw": None,
            "image_patches": None, "image_grid_thw": None,
            "n_samples": 0,
        })
    batch = collate(packed, cfg, rows=rows)
    # replace the bool validity mask with the packed segment ids
    a = len(packed) // rows
    s_max = batch.input_ids.shape[-1]
    seg = np.zeros((a, rows, s_max), np.int32)
    for i in range(a):
        for b in range(rows):
            x = packed[i * rows + b]
            n = x["segments"].shape[1]
            seg[i, b, :n] = x["segments"][0]
    import dataclasses as _dc

    return _dc.replace(batch, attention_mask=jnp.asarray(seg))
