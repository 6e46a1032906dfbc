"""Generate committed HF golden outputs for parity tests (run once, offline).

Builds a tiny random-init torch Qwen2VLForConditionalGeneration (seeded), and
dumps its state dict + reference outputs to tests/goldens/hf_tiny.npz so the
routine test suite never needs to import torch/transformers (a full HF
build+forward costs minutes on this CPU).

Regenerate with:  python tools/gen_hf_goldens.py
"""

import os

import numpy as np
import torch

from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens", "hf_tiny.npz")

# Mirrors livecc_tpu.core.config.tiny_config().
TEXT = dict(
    vocab_size=1024, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, rms_norm_eps=1e-6, rope_theta=1e6,
    max_position_embeddings=2048, tie_word_embeddings=False,
    rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
    bos_token_id=0, eos_token_id=3, pad_token_id=0,
)
VISION = dict(
    depth=2, embed_dim=64, num_heads=4, hidden_size=64, patch_size=14,
    temporal_patch_size=2, spatial_merge_size=2, in_channels=3,
)


def make_sample(cfg, grid=(2, 4, 4), n_text=7, seed=0):
    rng = np.random.RandomState(seed)
    t, h, w = grid
    n_patches = t * h * w
    n_vid = n_patches // 4
    text_ids = rng.randint(8, TEXT["vocab_size"], size=n_text)
    ids = np.concatenate([
        text_ids[:3], [cfg.vision_start_token_id], [cfg.video_token_id] * n_vid,
        [cfg.vision_end_token_id], text_ids[3:],
    ])[None].astype(np.int64)
    patches = rng.randn(n_patches, 3 * 2 * 14 * 14).astype(np.float32)
    return ids, patches, np.array([grid])


def main():
    cfg = Qwen2VLConfig(
        text_config=TEXT, vision_config=VISION,
        image_token_id=6, video_token_id=7,
        vision_start_token_id=4, vision_end_token_id=5,
    )
    torch.manual_seed(0)
    model = Qwen2VLForConditionalGeneration(cfg).eval()

    out: dict[str, np.ndarray] = {}
    for k, v in model.state_dict().items():
        out[f"state::{k}"] = v.float().numpy()

    # 1. text-only logits
    text_ids = np.arange(10, 30)[None]
    with torch.no_grad():
        out["text_ids"] = text_ids
        out["text_logits"] = model(input_ids=torch.from_numpy(text_ids)).logits.numpy()

    # 2. multimodal logits + rope index
    ids, patches, grid = make_sample(cfg)
    with torch.no_grad():
        mm = model(
            input_ids=torch.from_numpy(ids),
            pixel_values_videos=torch.from_numpy(patches),
            video_grid_thw=torch.from_numpy(grid),
        )
    pos, delta = model.model.get_rope_index(
        torch.from_numpy(ids), video_grid_thw=torch.from_numpy(grid)
    )
    out.update(mm_ids=ids, mm_patches=patches, mm_grid=grid,
               mm_logits=mm.logits.numpy(), mm_pos=pos.numpy(), mm_delta=delta.numpy())

    # 3. vision tower (two clips)
    rng = np.random.RandomState(3)
    vgrid = np.array([[2, 4, 4], [1, 2, 6]])
    n = int((vgrid[:, 0] * vgrid[:, 1] * vgrid[:, 2]).sum())
    vpatches = rng.randn(n, 3 * 2 * 14 * 14).astype(np.float32)
    with torch.no_grad():
        vout = model.model.visual(torch.from_numpy(vpatches), grid_thw=torch.from_numpy(vgrid))
    out.update(v_grid=vgrid, v_patches=vpatches, v_out=vout.numpy())

    # 4. greedy generate from the multimodal prompt (engine parity target)
    with torch.no_grad():
        gen = model.generate(
            input_ids=torch.from_numpy(ids),
            pixel_values_videos=torch.from_numpy(patches),
            video_grid_thw=torch.from_numpy(grid),
            do_sample=False, max_new_tokens=12, pad_token_id=0,
        )
    out["gen_ids"] = gen.numpy()

    # 5. greedy generate, text-only prompt
    with torch.no_grad():
        gen_t = model.generate(
            input_ids=torch.from_numpy(text_ids), do_sample=False,
            max_new_tokens=12, pad_token_id=0,
        )
    out["gen_text_ids"] = gen_t.numpy()

    # 6. multiturn continuation with KV cache reuse (streaming semantics):
    #    prefill chunk A (with video), then feed chunk B continuing the
    #    sequence, reading logits at B's last position. Mirrors the
    #    reference's per-chunk generate-with-past_key_values loop
    #    (demo/infer.py:159-174 + generation_patch.py cache continuation).
    ids2 = np.concatenate([ids, np.arange(30, 38)[None]], axis=1)
    with torch.no_grad():
        step1 = model(
            input_ids=torch.from_numpy(ids),
            pixel_values_videos=torch.from_numpy(patches),
            video_grid_thw=torch.from_numpy(grid),
            use_cache=True,
        )
        step2 = model(
            input_ids=torch.from_numpy(ids2[:, ids.shape[1]:]),
            past_key_values=step1.past_key_values,
            cache_position=torch.arange(ids.shape[1], ids2.shape[1]),
            use_cache=True,
        )
    out.update(cont_ids2=ids2, cont_logits2=step2.logits.numpy())

    # 7. rope index for multi-video + left padding
    rng = np.random.RandomState(1)
    g1, g2 = (1, 4, 4), (2, 2, 2)
    vt = lambda g: (g[0] * g[1] * g[2]) // 4
    mids = np.concatenate([
        rng.randint(8, 100, size=2),
        [cfg.vision_start_token_id], [cfg.video_token_id] * vt(g1), [cfg.vision_end_token_id],
        rng.randint(8, 100, size=3),
        [cfg.vision_start_token_id], [cfg.video_token_id] * vt(g2), [cfg.vision_end_token_id],
        rng.randint(8, 100, size=2),
    ])[None]
    pad = 4
    mids_p = np.concatenate([np.zeros((1, pad), np.int64), mids], axis=1)
    mmask = np.concatenate([np.zeros((1, pad), np.int64), np.ones_like(mids)], axis=1)
    mgrid = np.array([g1, g2])
    mpos, mdelta = model.model.get_rope_index(
        torch.from_numpy(mids_p), video_grid_thw=torch.from_numpy(mgrid),
        attention_mask=torch.from_numpy(mmask),
    )
    # text-only rope
    tpos, tdelta = model.model.get_rope_index(torch.from_numpy(text_ids))
    out.update(mv_ids=mids_p, mv_mask=mmask, mv_grid=mgrid,
               mv_pos=mpos.numpy(), mv_delta=mdelta.numpy(),
               t_pos=tpos.numpy(), t_delta=tdelta.numpy())

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.1f} MB, {len(out)} arrays)")


if __name__ == "__main__":
    main()
