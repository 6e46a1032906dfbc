"""ViT attention variants at the bench shape (13,056 patches, group 544).

The r3 component probes put vision_forward at ~52 TF/s effective vs the
~115 TF/s calibrated chip ceiling — the step's most below-par component
(31% of the train step; also in every serving prefill). Head_dim is 80
(non-MXU-aligned lanes) and the grouped attention materializes
[24, 16, 544, 544] f32 logits per layer. Variants:

  base       current vision_forward
  pad128     q/k/v zero-padded 80->128 in the attention only (MXU-aligned
             contraction; +60% attention FLOPs but aligned tiles)
  bf16probs  logits computed in bf16 (numerics probe — f32 softmax after)
  noattn     identity attention (upper bound without the attention cost)

Usage: PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/tpu_cache \
       python tools/exp_vit.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.models.qwen2_vl.model import init_params, prepare_vision_inputs
from livecc_tpu.models.qwen2_vl.vision import vision_forward
from livecc_tpu.ops.norms import layer_norm
from livecc_tpu.ops.rope import apply_rotary_vision

ACCUM = 4


def emit(o):
    print(json.dumps(o), flush=True)


def vit_variant(params, cfg, patches, cos, sin, group_size, variant: str):
    n = patches.shape[0]
    h, hd = cfg.num_heads, cfg.head_dim
    x = patches.astype(params["patch_embed"]["kernel"].dtype) @ params["patch_embed"]["kernel"]
    g = group_size

    def attend(q, k, v):
        if variant == "noattn":
            return v
        if variant == "flash":
            from livecc_tpu.ops.pallas.vit_attention import vit_group_attention
            qb = q.reshape(n // g, g, h, hd)
            kb = k.reshape(n // g, g, h, hd)
            vb = v.reshape(n // g, g, h, hd)
            return vit_group_attention(qb, kb, vb).reshape(n, h, hd)
        qb = q.reshape(n // g, g, h, hd)
        kb = k.reshape(n // g, g, h, hd)
        vb = v.reshape(n // g, g, h, hd)
        if variant == "pad128":
            pad = 128 - hd
            qb = jnp.pad(qb, ((0, 0), (0, 0), (0, 0), (0, pad)))
            kb = jnp.pad(kb, ((0, 0), (0, 0), (0, 0), (0, pad)))
        scale = hd ** -0.5
        ptype = jnp.bfloat16 if variant == "bf16probs" else jnp.float32
        logits = jnp.einsum("bqhd,bkhd->bhqk", qb, kb,
                            preferred_element_type=ptype) * scale
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vb)
        return out.reshape(n, h, hd)

    def block(x, layer):
        y = layer_norm(x, layer["norm1_scale"], layer["norm1_bias"], cfg.layer_norm_eps)
        qkv = y @ layer["qkv_kernel"] + layer["qkv_bias"]
        q, k, v = jnp.split(qkv.reshape(n, 3 * h, hd), 3, axis=1)
        q, k = apply_rotary_vision(q, k, cos, sin)
        attn = attend(q, k, v)
        x = x + attn.reshape(n, h * hd) @ layer["proj_kernel"] + layer["proj_bias"]
        y = layer_norm(x, layer["norm2_scale"], layer["norm2_bias"], cfg.layer_norm_eps)
        import jax.nn as jnn
        y = (y @ layer["fc1_kernel"] + layer["fc1_bias"])
        y = y * jax.nn.sigmoid(1.702 * y)
        y = y @ layer["fc2_kernel"] + layer["fc2_bias"]
        return x + y, None

    x, _ = lax.scan(block, x, params["blocks"])
    mg = params["merger"]
    y = layer_norm(x, mg["ln_q_scale"], mg["ln_q_bias"], cfg.layer_norm_eps)
    y = y.reshape(-1, cfg.embed_dim * cfg.spatial_merge_size**2)
    y = jax.nn.gelu(y @ mg["fc1_kernel"] + mg["fc1_bias"], approximate=False)
    return y @ mg["fc2_kernel"] + mg["fc2_bias"]


def main():
    assert jax.default_backend() == "tpu"
    import dataclasses

    full = ModelConfig.qwen2_vl_2b()
    cfg = dataclasses.replace(full, vision=dataclasses.replace(full.vision, depth=16))
    grid = (24, 16, 34)
    n_patches = grid[0] * grid[1] * grid[2]
    rng = np.random.RandomState(0)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)["visual"]
    vis = prepare_vision_inputs(
        cfg, rng.randn(n_patches, cfg.vision.patch_dim).astype(np.float32), [grid])

    ref_out = None
    for variant in ["base", "bf16probs", "flash", "noattn"]:
        if variant == "base":
            fwd = jax.jit(lambda p, pa, c, s: sum(
                vision_forward(p, cfg.vision, pa, c, s, vis.seg_ids,
                               group_size=grid[1] * grid[2]).astype(jnp.float32).sum()
                for _ in range(1)))
        else:
            fwd = jax.jit(lambda p, pa, c, s, v=variant: vit_variant(
                p, cfg.vision, pa, c, s, grid[1] * grid[2], v
            ).astype(jnp.float32).sum())
        args = (params, vis.patches, vis.cos, vis.sin)
        try:
            val = float(np.asarray(fwd(*args)))
            walls = []
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(fwd(*args))
                walls.append(time.perf_counter() - t0)
            if variant == "base":
                ref_out = val
            emit({"variant": variant, "median_s": round(float(np.median(walls)), 4),
                  "walls": [round(w, 4) for w in walls],
                  "sum_rel_err": (None if not ref_out else
                                  round(abs(val - ref_out) / (abs(ref_out) + 1e-9), 6))})
        except Exception as e:
            emit({"variant": variant, "error": f"{type(e).__name__}: {e}"[:300]})


if __name__ == "__main__":
    main()
