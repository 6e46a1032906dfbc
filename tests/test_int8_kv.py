"""int8 KV cache: quantized kernels match the dequantized reference, and the
full engine/server stack runs with cache_dtype=int8 (PERF.md capacity lever:
half the KV HBM -> ~3x stream capacity at 32k cache, parallel/memory.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import tiny_config
from livecc_tpu.data.tokenizer import ByteTokenizer
from livecc_tpu.engine import GenerationParams, LiveCCEngine
from livecc_tpu.models import qwen2_vl as m
from livecc_tpu.models.qwen2_vl.text import KVCache, quantize_kv
from livecc_tpu.ops.attention import kv_cache_mask, mha_bhsd
from livecc_tpu.ops.pallas.attention import flash_decode, flash_prefill

import os

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "hf_tiny.npz")


def test_quantize_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 16, 64).astype(np.float32) * 5.0)
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 3, 16, 1)
    recon = q.astype(np.float32) * np.asarray(s, np.float32)
    err = np.abs(recon - np.asarray(x)) / (np.abs(np.asarray(x)).max())
    assert err.max() < 0.01   # ~half an int8 step of the rowmax + bf16 scale


def _quant_case(seed, b=1, smax=256, hq=4, hk=2, d=64, sq=64, offset=64):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, hq, sq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, hk, smax, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, hk, smax, d).astype(np.float32))
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    # kernels take lane-major scales [..., 1, Smax]
    ks = jnp.swapaxes(ks, -1, -2)
    vs = jnp.swapaxes(vs, -1, -2)
    return q, k, v, kq, ks, vq, vs, jnp.int32(offset), jnp.int32(offset + sq)


def test_flash_prefill_quantized_matches_dequantized():
    q, k, v, kq, ks, vq, vs, off, limit = _quant_case(0)
    out = flash_prefill(q, kq, vq, off, limit, k_scale=ks, v_scale=vs,
                        bq=32, bk=64, interpret=True)
    # reference: run the fp kernel on the DEQUANTIZED cache — identical math
    kd = kq.astype(jnp.float32) * jnp.swapaxes(ks, -1, -2).astype(jnp.float32)
    vd = vq.astype(jnp.float32) * jnp.swapaxes(vs, -1, -2).astype(jnp.float32)
    ref = flash_prefill(q, kd, vd, off, limit, bq=32, bk=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)
    # and close to the unquantized attention (quantization error only)
    smax = k.shape[2]
    mask = kv_cache_mask(64, smax, off)[None, None] & (jnp.arange(smax) < limit)[None, None, None, :]
    full = mha_bhsd(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=0.05, rtol=0.1)


def test_flash_decode_quantized_matches_dequantized():
    rng = np.random.RandomState(1)
    b, smax, hq, hk, d = 2, 256, 4, 2, 64
    q = jnp.asarray(rng.randn(b, hq, 1, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, hk, smax, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, hk, smax, d).astype(np.float32))
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    kd = kq.astype(jnp.float32) * ks.astype(jnp.float32)
    vd = vq.astype(jnp.float32) * vs.astype(jnp.float32)
    ks = jnp.swapaxes(ks, -1, -2)        # kernels take lane-major scales
    vs = jnp.swapaxes(vs, -1, -2)
    limit = jnp.asarray([100, 7], jnp.int32)
    out = flash_decode(q, kq, vq, limit, k_scale=ks, v_scale=vs, bk=128, interpret=True)
    ref = flash_decode(q, kd, vd, limit, bk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def _build_engine(dtype):
    g = np.load(GOLDEN)
    cfg = tiny_config()
    state = {k[len("state::"):]: g[k] for k in g.files if k.startswith("state::")}
    params = m.convert_state_dict(state, cfg)
    return LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=256, cache_dtype=dtype)


def frames(seed, n=2):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, size=(n, 28, 28, 3), dtype=np.uint8)


def test_int8_engine_end_to_end():
    eng = _build_engine(jnp.int8)
    gen = GenerationParams(max_new_tokens=4, eos_token_id=eng.cfg.eos_token_id,
                           pad_token_id=eng.cfg.pad_token_id)
    st = eng.new_stream()
    assert st.cache.k.dtype == jnp.int8 and st.cache.quantized
    t1 = eng.chunk_step(st, frames(0, 6), 0.0, 3.0, "q", gen)
    t2 = eng.chunk_step(st, frames(1), 3.0, 4.0, None, gen)
    assert isinstance(t1, str) and isinstance(t2, str)
    # cache growth path with quantized scales
    st2 = eng.new_stream()
    st2.cache = KVCache.zeros(eng.cfg.text, 1, 64, jnp.int8)
    eng.chunk_step(st2, frames(2, 6), 0.0, 3.0, "q", gen)
    assert st2.cache.max_len >= 128 and st2.cache.quantized


def test_int8_server_matches_int8_engine():
    eng_a = _build_engine(jnp.int8)
    gen = GenerationParams(max_new_tokens=4, eos_token_id=eng_a.cfg.eos_token_id,
                           pad_token_id=eng_a.cfg.pad_token_id)
    st = eng_a.new_stream()
    ref = [eng_a.chunk_step(st, frames(0, 6), 0.0, 3.0, "q", gen),
           eng_a.chunk_step(st, frames(1), 3.0, 4.0, None, gen)]

    from livecc_tpu.serve.scheduler import StreamServer
    eng_b = _build_engine(jnp.int8)
    srv = StreamServer(eng_b, gen, capacity=2)
    sid = srv.add_stream((28, 28), query="q")
    srv.submit_chunk(sid, frames(0, 6), 0.0, 3.0)
    srv.tick()
    srv.submit_chunk(sid, frames(1), 3.0, 4.0)
    srv.tick()
    srv.flush()
    out = [t for _, t in srv.drain(sid)]
    assert out == ref


def test_flash_layered_quantized_matches_dequantized():
    """The LAYERED (5D cache) + quantized kernels — the actual TPU int8
    serving configuration (layer-indexed pool cache with lane-major
    scales) — must match the fp kernels on the dequantized cache."""
    rng = np.random.RandomState(3)
    L, b, smax, hq, hk, d = 3, 2, 256, 4, 2, 64
    k = jnp.asarray(rng.randn(L, b, hk, smax, d).astype(np.float32))
    v = jnp.asarray(rng.randn(L, b, hk, smax, d).astype(np.float32))
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    kd = kq.astype(jnp.float32) * ks.astype(jnp.float32)
    vd = vq.astype(jnp.float32) * vs.astype(jnp.float32)
    ks = jnp.swapaxes(ks, -1, -2)        # lane-major [L, B, Hk, 1, Smax]
    vs = jnp.swapaxes(vs, -1, -2)
    li = jnp.int32(1)

    # decode (per-row limits)
    q1 = jnp.asarray(rng.randn(b, hq, 1, d).astype(np.float32))
    limit = jnp.asarray([200, 9], jnp.int32)
    out = flash_decode(q1, kq, vq, limit, li, k_scale=ks, v_scale=vs,
                       bk=128, interpret=True)
    ref = flash_decode(q1, kd, vd, limit, li, bk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)

    # prefill (per-row offsets)
    sq = 32
    qp = jnp.asarray(rng.randn(b, hq, sq, d).astype(np.float32))
    off = jnp.asarray([64, 128], jnp.int32)
    outp = flash_prefill(qp, kq, vq, off, off + sq, li, k_scale=ks, v_scale=vs,
                         bq=32, bk=64, interpret=True)
    refp = flash_prefill(qp, kd, vd, off, off + sq, li, bq=32, bk=64, interpret=True)
    np.testing.assert_allclose(np.asarray(outp), np.asarray(refp), atol=3e-5, rtol=1e-4)
