"""Weight-only int8 serving quantization (ops/quant.py).

The reference has no quantization story (it inherits 80 GB GPUs,
SURVEY.md §6); here int8 weights halve decode-path HBM traffic and turn
the 7B v5e serving plan from TP=4 into TP=2. These tests pin the
numerics (per-output-channel symmetric, ~0.2% relative error), the full
forward, the engine path, and TP sharding of quantized trees.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import tiny_config
from livecc_tpu.models.qwen2_vl.model import forward, init_params
from livecc_tpu.models.qwen2_vl.text import init_text_params, lm_logits
from livecc_tpu.ops.quant import (
    dense, embed_lookup, is_quantized, quantize_model_params, quantize_weight,
)


def test_dense_per_column_error_small():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 48).astype(np.float32)
    x = rng.randn(4, 64).astype(np.float32)
    exact = x @ w
    got = np.asarray(dense(jnp.asarray(x), quantize_weight(jnp.asarray(w))))
    rel = np.abs(got - exact).max() / np.abs(exact).max()
    assert rel < 0.02, rel


def test_stacked_kernel_and_embed_lookup():
    rng = np.random.RandomState(1)
    w = rng.randn(3, 32, 16).astype(np.float32) * rng.rand(3, 1, 16)  # per-col ranges
    q = quantize_weight(jnp.asarray(w))
    assert q["q"].shape == w.shape and q["scale"].shape == (3, 1, 16)
    back = np.asarray(q["q"], np.float32) * np.asarray(q["scale"], np.float32)
    assert np.abs(back - w).max() < np.abs(w).max() * 0.02

    emb = rng.randn(100, 16).astype(np.float32)
    qe = quantize_weight(jnp.asarray(emb), scale_axis=-1)
    ids = jnp.asarray([[0, 5, 99]])
    got = np.asarray(embed_lookup(qe, ids), np.float32)
    assert np.abs(got - emb[np.asarray(ids)]).max() < 0.02 * np.abs(emb).max()


def _tiny_inputs(cfg, b=1, s=12, seed=2):
    rng = np.random.RandomState(seed)
    ids = rng.randint(5, cfg.text.vocab_size, size=(b, s)).astype(np.int32)
    pos = np.broadcast_to(np.arange(s)[None, None], (3, b, s)).astype(np.int32)
    return jnp.asarray(ids), jnp.asarray(np.ascontiguousarray(pos))


def test_model_forward_quantized_close():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_model_params(params)
    assert is_quantized(qparams["text"]["layers"]["q_kernel"])
    assert is_quantized(qparams["text"]["embed"]["weight"])
    ids, pos = _tiny_inputs(cfg)
    ref, _ = forward(params, cfg, ids, pos)
    got, _ = forward(qparams, cfg, ids, pos)
    ref, got = np.asarray(ref), np.asarray(got)
    # logits track within a few percent of the logit scale; greedy argmax
    # agrees on the vast majority of positions for a random tiny net
    assert np.abs(got - ref).max() < 0.05 * np.abs(ref).max()
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree >= 0.9, agree


def test_vision_forward_quantized_close():
    from livecc_tpu.models.qwen2_vl.vision import init_vision_params, vision_forward
    from livecc_tpu.ops.rope import vision_rotary_cos_sin

    cfg = tiny_config()
    params = init_vision_params(cfg.vision, jax.random.PRNGKey(9))
    qvis = quantize_model_params({"text": init_params(cfg, jax.random.PRNGKey(0))["text"],
                                  "visual": params})["visual"]
    assert is_quantized(qvis["blocks"]["qkv_kernel"])
    assert is_quantized(qvis["merger"]["fc2_kernel"])
    assert not is_quantized(qvis["patch_embed"]["kernel"])

    grid = (1, 4, 4)
    n = grid[0] * grid[1] * grid[2]
    patches = jnp.asarray(np.random.RandomState(10).randn(n, cfg.vision.patch_dim),
                          jnp.float32)
    cos, sin = vision_rotary_cos_sin([grid], cfg.vision.head_dim)
    seg = jnp.zeros((n,), jnp.int32)
    ref = np.asarray(vision_forward(params, cfg.vision, patches, cos, sin, seg))
    got = np.asarray(vision_forward(qvis, cfg.vision, patches, cos, sin, seg))
    assert np.abs(got - ref).max() < 0.05 * np.abs(ref).max()


def test_lm_logits_tied_quantized():
    cfg = dataclasses.replace(tiny_config().text, tie_word_embeddings=True)
    params = init_text_params(cfg, jax.random.PRNGKey(3))
    assert "lm_head" not in params
    hidden = jnp.asarray(np.random.RandomState(4).randn(1, 5, cfg.hidden_size),
                         jnp.float32)
    ref = np.asarray(lm_logits(params, cfg, hidden))
    qtext = quantize_model_params({"text": params})["text"]
    got = np.asarray(lm_logits(qtext, cfg, hidden))
    assert np.abs(got - ref).max() < 0.05 * np.abs(ref).max()


def test_engine_quantized_smoke():
    from livecc_tpu.data.tokenizer import ByteTokenizer
    from livecc_tpu.engine import LiveCCEngine

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(5))
    eng = LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=512,
                       quantize_weights=True)
    assert is_quantized(eng.params["text"]["layers"]["down_kernel"])
    frames = np.random.RandomState(6).randint(
        0, 255, size=(8, 28, 28, 3), dtype=np.uint8)
    out = eng.live_cc_once_for_evaluation("describe", frames, max_new_tokens=4)
    assert len(out) == 2 and all(isinstance(t[2], str) for t in out)


def test_engine_quantize_default_resolution():
    """quantize_weights=None resolves per backend: int8 is the TPU serving
    DEFAULT (r5 soak A/B, PERF.md), but CPU — the parity/test path — must
    stay unquantized, and an explicit False must win on any backend."""
    from livecc_tpu.data.tokenizer import ByteTokenizer
    from livecc_tpu.engine import LiveCCEngine

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(5))
    assert jax.default_backend() == "cpu"     # conftest pins the test path
    eng_default = LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=512)
    assert not is_quantized(eng_default.params["text"]["layers"]["down_kernel"])
    eng_off = LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=512,
                           quantize_weights=False)
    assert not is_quantized(eng_off.params["text"]["layers"]["down_kernel"])
    eng_on = LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=512,
                          quantize_weights=True)
    assert is_quantized(eng_on.params["text"]["layers"]["down_kernel"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_sharded_quantized_forward_matches():
    """param_pspecs assigns valid TP specs to {"q","scale"} sub-leaves; the
    sharded quantized forward matches the unsharded quantized forward."""
    from livecc_tpu.core.mesh import make_mesh
    from livecc_tpu.parallel.sharding import shard_params

    cfg = tiny_config()
    qparams = quantize_model_params(init_params(cfg, jax.random.PRNGKey(7)))
    ids, pos = _tiny_inputs(cfg, s=8, seed=8)
    ref, _ = forward(qparams, cfg, ids, pos)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = shard_params(qparams, mesh)
    with jax.set_mesh(mesh):
        got, _ = jax.jit(lambda p: forward(p, cfg, ids, pos))(sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)
