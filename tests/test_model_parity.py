"""Numerical parity of the JAX Qwen2-VL tower vs HF golden outputs.

Goldens (tests/goldens/hf_tiny.npz) are produced once by
tools/gen_hf_goldens.py from a tiny random-init torch
Qwen2VLForConditionalGeneration; the routine suite never imports torch. This
is the no-network equivalent of the reference's greedy-parity requirement
(BASELINE.md): if the tiny model matches on interleaved multimodal input, a
converted 7B checkpoint computes the same function.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import tiny_config
from livecc_tpu.models import qwen2_vl as m

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "hf_tiny.npz")


@pytest.fixture(scope="session")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="session")
def params_and_cfg(golden):
    cfg = tiny_config()
    state = {k[len("state::"):]: golden[k] for k in golden.files if k.startswith("state::")}
    return m.convert_state_dict(state, cfg), cfg


def test_rope_index_parity(golden, params_and_cfg):
    _, cfg = params_and_cfg
    pos, delta = m.get_rope_index(cfg, golden["mm_ids"], video_grid_thw=golden["mm_grid"])
    np.testing.assert_array_equal(pos, golden["mm_pos"])
    np.testing.assert_array_equal(delta, golden["mm_delta"])


def test_rope_index_text_only(golden, params_and_cfg):
    _, cfg = params_and_cfg
    pos, delta = m.get_rope_index(cfg, golden["text_ids"])
    np.testing.assert_array_equal(pos, golden["t_pos"])
    np.testing.assert_array_equal(delta, golden["t_delta"])


def test_rope_index_multi_video_and_padding(golden, params_and_cfg):
    _, cfg = params_and_cfg
    pos, delta = m.get_rope_index(
        cfg, golden["mv_ids"], video_grid_thw=golden["mv_grid"], attention_mask=golden["mv_mask"]
    )
    np.testing.assert_array_equal(pos, golden["mv_pos"])
    np.testing.assert_array_equal(delta, golden["mv_delta"])


def test_text_only_logits_parity(golden, params_and_cfg):
    params, cfg = params_and_cfg
    ids = golden["text_ids"]
    pos, _ = m.get_rope_index(cfg, ids)
    logits, _ = m.forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(logits), golden["text_logits"], atol=2e-4, rtol=1e-3)


def test_multimodal_logits_parity(golden, params_and_cfg):
    params, cfg = params_and_cfg
    ids, patches, grid = golden["mm_ids"], golden["mm_patches"], golden["mm_grid"]
    pos, _ = m.get_rope_index(cfg, ids, video_grid_thw=grid)
    vis = m.prepare_vision_inputs(cfg, patches, [tuple(g) for g in grid])
    logits, _ = m.forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos), vision=vis)
    np.testing.assert_allclose(np.asarray(logits), golden["mm_logits"], atol=5e-4, rtol=1e-3)


def test_vision_tower_parity(golden, params_and_cfg):
    params, cfg = params_and_cfg
    grid, patches = golden["v_grid"], golden["v_patches"]
    vis = m.prepare_vision_inputs(cfg, patches, [tuple(g) for g in grid])
    out = m.vision_forward(params["visual"], cfg.vision, vis.patches, vis.cos, vis.sin, vis.seg_ids)
    np.testing.assert_allclose(np.asarray(out), golden["v_out"], atol=2e-4, rtol=1e-3)


def test_safetensors_checkpoint_roundtrip(golden, params_and_cfg, tmp_path):
    """HF checkpoint-directory loading (safetensors shards + config.json)
    produces the same params as the in-memory converter."""
    import json

    from safetensors.numpy import save_file

    from livecc_tpu.models.qwen2_vl.convert import config_from_hf_json, load_safetensors_dir

    params_ref, cfg = params_and_cfg
    state = {k[len("state::"):]: golden[k] for k in golden.files if k.startswith("state::")}
    # shard the state dict across two files like HF does
    keys = sorted(state)
    half = len(keys) // 2
    save_file({k: state[k] for k in keys[:half]}, str(tmp_path / "model-00001.safetensors"))
    save_file({k: state[k] for k in keys[half:]}, str(tmp_path / "model-00002.safetensors"))
    hf_config = {
        "vision_config": {"depth": cfg.vision.depth, "embed_dim": cfg.vision.embed_dim,
                          "num_heads": cfg.vision.num_heads, "hidden_size": cfg.vision.hidden_size},
        "vocab_size": cfg.text.vocab_size, "hidden_size": cfg.text.hidden_size,
        "intermediate_size": cfg.text.intermediate_size,
        "num_hidden_layers": cfg.text.num_hidden_layers,
        "num_attention_heads": cfg.text.num_attention_heads,
        "num_key_value_heads": cfg.text.num_key_value_heads,
        "rope_scaling": {"type": "mrope", "mrope_section": list(cfg.text.mrope_section)},
        "tie_word_embeddings": cfg.text.tie_word_embeddings,
        "bos_token_id": cfg.bos_token_id, "eos_token_id": cfg.eos_token_id,
        "vision_start_token_id": cfg.vision_start_token_id,
        "vision_end_token_id": cfg.vision_end_token_id,
        "image_token_id": cfg.image_token_id, "video_token_id": cfg.video_token_id,
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_config))

    loaded_cfg = config_from_hf_json(str(tmp_path))
    assert loaded_cfg.text.num_hidden_layers == cfg.text.num_hidden_layers
    assert loaded_cfg.text.mrope_section == cfg.text.mrope_section
    assert loaded_cfg.video_token_id == cfg.video_token_id

    import jax.numpy as jnp
    params = load_safetensors_dir(str(tmp_path), loaded_cfg, dtype=jnp.float32)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(params_ref)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_tied_embeddings_parity():
    """Tied-word-embedding configs (the 2B family) match HF logits and
    greedy generate — exercises the embed.T lm_head path."""
    import dataclasses

    import jax.random

    from livecc_tpu.engine.generation import GenerationParams, decode_chunk, prefill
    from livecc_tpu.models.qwen2_vl.text import KVCache

    g2 = np.load(os.path.join(os.path.dirname(__file__), "goldens", "hf_tiny_tied.npz"))
    base = tiny_config()
    cfg = dataclasses.replace(base, text=dataclasses.replace(base.text, tie_word_embeddings=True))
    state = {k[len("state::"):]: g2[k] for k in g2.files if k.startswith("state::")}
    params = m.convert_state_dict(state, cfg)
    assert "lm_head" not in params["text"]

    ids = g2["text_ids"]
    pos, delta = m.get_rope_index(cfg, ids)
    logits, _ = m.forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(logits), g2["text_logits"], atol=2e-4, rtol=1e-3)

    # greedy generate parity
    n = ids.shape[1]
    bucket = 32
    ids_p = np.zeros((1, bucket), np.int32)
    ids_p[0, :n] = ids[0]
    pos_p = np.zeros((3, 1, bucket), np.int32)
    pos_p[:, :, :n] = pos
    pos_p[:, :, n:] = pos[:, :, -1:] + np.arange(1, bucket - n + 1)
    cache = KVCache.zeros(cfg.text, 1, 128)
    counts = jnp.zeros((1, cfg.text.vocab_size), jnp.int32)
    logits0, cache, counts = prefill(params, cfg, jnp.asarray(ids_p), jnp.asarray(pos_p),
                                     jnp.int32(n), cache, counts=counts)
    gen = GenerationParams(max_new_tokens=8, eos_token_id=cfg.eos_token_id,
                           pad_token_id=cfg.pad_token_id)
    tokens, n_gen, _, _ = decode_chunk(params, cfg, gen, logits0, cache, counts,
                                       jnp.asarray([[int(delta[0, 0])]], jnp.int32),
                                       jax.random.PRNGKey(0))
    generated = np.asarray(tokens)[0][: int(n_gen[0])]
    np.testing.assert_array_equal(generated, g2["gen_text_ids"][0, n:])
