"""On-chip parity asserts for the SERVING Pallas kernels (VERDICT r3 #6).

tests/test_pallas_attention.py runs the kernels in interpreter mode on CPU;
compiled Mosaic code paths (DMA clamping, scalar prefetch, int8 lane-major
dequant) were previously only "exercised" by bench without numeric checks.
The reference itself warns kernel choice changes outputs (README.md:108).

``run_checks()`` compares COMPILED flash_prefill / flash_decode against the
XLA reference path on the current backend, over the product configurations:
bf16 + int8 caches, layered 5D cache with layer_index, per-row [B] offsets /
kv_limits at mixed depths. Returns {case: max_abs_err} and raises on
tolerance breach. bench.py calls this in its preamble on TPU; errors land
in the bench diagnostics (logged to PERF.md per run).

CLI:  PYTHONPATH=/root/repo:/root/.axon_site python tools/check_serving_kernels_tpu.py
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.ops.attention import kv_cache_mask, mha_bhsd
from livecc_tpu.ops.pallas.attention import flash_decode, flash_prefill

# bf16 inputs with fp32 softmax: elementwise |err| dominated by bf16
# rounding of inputs/outputs; int8 adds ~0.4% quantization error.
TOL_BF16 = 5e-2
TOL_INT8 = 1.5e-1


def _dequant(xq, xs, axis_pos=-2):
    # lane-major scales [L?, B, Hk, 1, Smax] -> broadcast over head_dim
    return xq.astype(jnp.float32) * jnp.swapaxes(xs.astype(jnp.float32), -1, -2)


def _reference(q, k, v, offset, kv_limit):
    b, hq, sq, d = q.shape
    smax = k.shape[-2]
    mask = kv_cache_mask(sq, smax, offset)
    if mask.ndim == 2:
        mask = mask[None, None]
    limit = jnp.broadcast_to(jnp.asarray(kv_limit), (b,))
    mask = mask & (jnp.arange(smax)[None, None, None, :] < limit[:, None, None, None])
    return mha_bhsd(q.astype(jnp.float32), k.astype(jnp.float32),
                    v.astype(jnp.float32), mask=mask)


def run_checks(seed: int = 0) -> dict[str, float]:
    from livecc_tpu.models.qwen2_vl.text import quantize_kv

    rng = np.random.RandomState(seed)
    L, B, Hq, Hk, D = 3, 8, 12, 2, 128
    Smax, Sq = 1024, 128
    layer = 1

    q_pre = jnp.asarray(rng.randn(B, Hq, Sq, D).astype(np.float32), jnp.bfloat16)
    q_dec = jnp.asarray(rng.randn(B, Hq, 1, D).astype(np.float32), jnp.bfloat16)
    k5 = jnp.asarray(rng.randn(L, B, Hk, Smax, D).astype(np.float32), jnp.bfloat16)
    v5 = jnp.asarray(rng.randn(L, B, Hk, Smax, D).astype(np.float32), jnp.bfloat16)
    # mixed per-row depths — the continuous-batching contract
    offsets = jnp.asarray(rng.randint(0, Smax - Sq, size=B), jnp.int32)
    limits = offsets + Sq
    kq, ks = quantize_kv(k5)
    vq, vs = quantize_kv(v5)
    # kernels take LANE-MAJOR scales: [..., Smax, 1] -> [..., 1, Smax]
    ks = jnp.swapaxes(ks, -1, -2)
    vs = jnp.swapaxes(vs, -1, -2)

    kl = k5[layer]
    vl = v5[layer]
    errs: dict[str, float] = {}

    def record(name, out, ref, tol):
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        errs[name] = round(err, 5)
        assert err < tol, f"{name}: max err {err} >= tol {tol}"

    # --- prefill bf16, layered 5D, per-row offsets
    out = flash_prefill(q_pre, k5, v5, offsets, limits, layer_index=jnp.int32(layer))
    ref = _reference(q_pre, kl, vl, offsets, limits)
    record("prefill_bf16_layered_perrow", out, ref, TOL_BF16)

    # --- prefill int8 lane-major scales
    out = flash_prefill(q_pre, kq, vq, offsets, limits,
                        layer_index=jnp.int32(layer), k_scale=ks, v_scale=vs)
    kd = _dequant(kq[layer], ks[layer]).astype(jnp.bfloat16)
    vd = _dequant(vq[layer], vs[layer]).astype(jnp.bfloat16)
    ref = _reference(q_pre, kd, vd, offsets, limits)
    record("prefill_int8_layered_perrow", out, ref, TOL_INT8)

    # --- decode bf16 (grouped q-heads), per-row kv limits
    out = flash_decode(q_dec, k5, v5, limits, layer_index=jnp.int32(layer))
    ref = _reference(q_dec, kl, vl, limits - 1, limits)
    record("decode_bf16_layered_perrow", out, ref, TOL_BF16)

    # --- decode int8
    out = flash_decode(q_dec, kq, vq, limits, layer_index=jnp.int32(layer),
                       k_scale=ks, v_scale=vs)
    ref = _reference(q_dec, kd, vd, limits - 1, limits)
    record("decode_int8_layered_perrow", out, ref, TOL_INT8)

    # --- 4D (single-layer) cache path, scalar offset
    out = flash_prefill(q_pre, kl, vl, jnp.int32(256), jnp.int32(256 + Sq))
    ref = _reference(q_pre, kl, vl, jnp.int32(256), jnp.int32(256 + Sq))
    record("prefill_bf16_4d_scalar", out, ref, TOL_BF16)

    # --- ViT per-group attention kernel (r5) vs the XLA reference at a
    # serving-like shape (head_dim 80, non-128 lanes)
    from livecc_tpu.ops.attention import mha
    from livecc_tpu.ops.pallas.vit_attention import vit_group_attention

    ngr, g, hv, dv = 4, 880, 16, 80
    qv = jnp.asarray(rng.randn(ngr, g, hv, dv).astype(np.float32), jnp.bfloat16)
    kv_ = jnp.asarray(rng.randn(ngr, g, hv, dv).astype(np.float32), jnp.bfloat16)
    vv = jnp.asarray(rng.randn(ngr, g, hv, dv).astype(np.float32), jnp.bfloat16)
    out = vit_group_attention(qv, kv_, vv)
    ref = mha(qv, kv_, vv).astype(jnp.float32)
    record("vit_group_attn_g880_d80", out, ref, TOL_BF16)

    return errs


def main() -> None:
    backend = jax.default_backend()
    errs = run_checks()
    print(json.dumps({"backend": backend, "kernel_parity_max_abs_err": errs}))


if __name__ == "__main__":
    main()
