"""Pallas flash attention vs the XLA reference (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from livecc_tpu.ops.attention import kv_cache_mask, mha_bhsd
from livecc_tpu.ops.pallas.attention import flash_decode, flash_prefill


def make_case(seed, b=1, smax=512, hq=4, hk=2, d=64, sq=128, offset=100, valid=None):
    rng = np.random.RandomState(seed)
    q = rng.randn(b, hq, sq, d).astype(np.float32)
    k = rng.randn(b, hk, smax, d).astype(np.float32)
    v = rng.randn(b, hk, smax, d).astype(np.float32)
    valid = sq if valid is None else valid
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.int32(offset), jnp.int32(offset + valid))


def reference(q, k, v, offset, kv_limit):
    sq = q.shape[2]
    smax = k.shape[2]
    mask = kv_cache_mask(sq, smax, offset)[None, None]
    mask = mask & (jnp.arange(smax) < kv_limit)[None, None, None, :]
    return mha_bhsd(q, k, v, mask=mask)


@pytest.mark.parametrize("offset,sq,valid", [(0, 128, 128), (100, 128, 128), (100, 128, 70), (37, 64, 64)])
def test_flash_prefill_matches_reference(offset, sq, valid):
    q, k, v, off, limit = make_case(0, sq=sq, offset=offset, valid=valid)
    out = flash_prefill(q, k, v, off, limit, bq=32, bk=64, interpret=True)
    ref = reference(q, k, v, off, limit)
    # compare only valid query rows (pad rows are undefined garbage)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, :valid], np.asarray(ref)[:, :, :valid], atol=2e-5, rtol=1e-4
    )


def test_flash_prefill_bf16():
    q, k, v, off, limit = make_case(1, sq=64, offset=64, valid=64)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_prefill(qb, kb, vb, off, limit, bq=32, bk=64, interpret=True)
    ref = reference(qb, kb, vb, off, limit)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("kv_len", [1, 37, 512])
def test_flash_decode_matches_reference(kv_len):
    rng = np.random.RandomState(2)
    b, smax, hq, hk, d = 1, 512, 4, 2, 64
    q = jnp.asarray(rng.randn(b, hq, 1, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, hk, smax, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, hk, smax, d).astype(np.float32))
    out = flash_decode(q, k, v, jnp.int32(kv_len), bk=128, interpret=True)
    mask = (jnp.arange(smax) < kv_len)[None, None, None, :]
    ref = mha_bhsd(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_prefill_layered_cache():
    """Layer-indexed 5D cache (the scanned-transformer hot path) matches the
    per-layer-sliced reference, at real head_dim=128 GQA shapes."""
    rng = np.random.RandomState(3)
    L, b, hq, hk, d, smax, sq = 3, 2, 12, 2, 128, 512, 64
    q = jnp.asarray(rng.randn(b, hq, sq, d).astype(np.float32))
    k5 = jnp.asarray(rng.randn(L, b, hk, smax, d).astype(np.float32))
    v5 = jnp.asarray(rng.randn(L, b, hk, smax, d).astype(np.float32))
    off = jnp.asarray([100, 37], jnp.int32)           # per-row offsets
    limit = off + sq
    for li in (0, 2):
        out = flash_prefill(q, k5, v5, off, limit, jnp.int32(li),
                            bq=32, bk=128, interpret=True)
        ref = flash_prefill(q, k5[li], v5[li], off, limit,
                            bq=32, bk=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
        # and the 4D path against the XLA reference with per-row offsets
        mask = kv_cache_mask(sq, smax, off)
        mask = mask & (jnp.arange(smax)[None, None, None, :] < limit[:, None, None, None])
        xla = mha_bhsd(q, k5[li], v5[li], mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(xla), atol=2e-5, rtol=1e-4)


def test_flash_decode_layered_cache_per_row_limits():
    rng = np.random.RandomState(4)
    L, b, hq, hk, d, smax = 2, 3, 12, 2, 128, 512
    q = jnp.asarray(rng.randn(b, hq, 1, d).astype(np.float32))
    k5 = jnp.asarray(rng.randn(L, b, hk, smax, d).astype(np.float32))
    v5 = jnp.asarray(rng.randn(L, b, hk, smax, d).astype(np.float32))
    limits = jnp.asarray([1, 200, 512], jnp.int32)    # per-row cache depths
    out = flash_decode(q, k5, v5, limits, jnp.int32(1), bk=128, interpret=True)
    mask = (jnp.arange(smax)[None, None, None, :] < limits[:, None, None, None])
    ref = mha_bhsd(q, k5[1], v5[1], mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
