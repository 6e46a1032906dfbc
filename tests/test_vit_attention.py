"""Parity tests for the Pallas per-group ViT attention kernel.

The XLA reference (ops.attention.mha) is the numerical contract: fp32
scores/softmax, model-dtype probs into the pv matmul. The kernel runs in
interpreter mode on CPU here; bench.py exercises it compiled on the real
chip (kernel-parity preamble).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from livecc_tpu.ops.attention import mha
from livecc_tpu.ops.pallas.vit_attention import vit_group_attention


def _rand(key, shape, dtype):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-6), (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("ng,g,h,d", [(3, 24, 2, 80), (2, 28, 4, 16)])
def test_parity_vs_mha(dtype, tol, ng, g, h, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (_rand(kk, (ng, g, h, d), dtype) for kk in ks)
    out = vit_group_attention(q, k, v, True)
    ref = mha(q, k, v)
    assert out.dtype == dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=tol
    )


def test_non_multiple_of_8_group():
    """g = grid h*w is only guaranteed a multiple of 4 (h, w even) — e.g.
    a 14x22 pre-merge grid gives 308. The kernel must not require aligned
    sublane counts."""
    ng, g, h, d = 2, 12, 2, 80
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (_rand(kk, (ng, g, h, d), jnp.float32) for kk in ks)
    out = vit_group_attention(q, k, v, True)
    ref = mha(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_vmap_batched_serving():
    """Batched serving vmaps the ViT per stream row — the kernel must
    batch (pallas_call's batching rule adds a grid dim)."""
    b, ng, g, h, d = 2, 2, 16, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (_rand(kk, (b, ng, g, h, d), jnp.float32) for kk in ks)
    out = jax.vmap(lambda a, b_, c: vit_group_attention(a, b_, c, True))(q, k, v)
    ref = jax.vmap(mha)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_custom_vjp_matches_xla_grad():
    """Unfrozen-ViT path: gradients route through the XLA reference VJP."""
    ng, g, h, d = 2, 8, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (_rand(kk, (ng, g, h, d), jnp.float32) for kk in ks)

    def loss_kernel(q, k, v):
        return jnp.sum(vit_group_attention(q, k, v, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha(q, k, v) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vision_forward_flash_wiring():
    """vision_forward(use_flash=True) must produce the grouped-XLA result
    (interpreter mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    from livecc_tpu.core.config import tiny_config
    from livecc_tpu.models.qwen2_vl.vision import init_vision_params, vision_forward
    from livecc_tpu.ops.rope import vision_rotary_cos_sin

    cfg = tiny_config().vision
    t, gh, gw = 2, 4, 4
    n = t * gh * gw
    params = init_vision_params(cfg, jax.random.PRNGKey(0))
    patches = _rand(jax.random.PRNGKey(4), (n, cfg.patch_dim), jnp.float32)
    cos, sin = vision_rotary_cos_sin([(t, gh, gw)], cfg.head_dim)
    seg_ids = np.repeat(np.arange(t), gh * gw).astype(np.int32)
    ref = vision_forward(params, cfg, patches, cos, sin, seg_ids, gh * gw)
    with pltpu.force_tpu_interpret_mode():
        out = vision_forward(params, cfg, patches, cos, sin, seg_ids, gh * gw,
                             use_flash=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_oversize_group_falls_back():
    """group_size > MAX_GROUP must route to the XLA path (no kernel) —
    exercised by calling vision_forward WITHOUT interpret mode on CPU,
    which would fail if the Pallas kernel were hit."""
    from livecc_tpu.core.config import tiny_config
    from livecc_tpu.models.qwen2_vl.vision import init_vision_params, vision_forward
    from livecc_tpu.ops.pallas.vit_attention import MAX_GROUP
    from livecc_tpu.ops.rope import vision_rotary_cos_sin

    cfg = tiny_config().vision
    # one giant group: grid 1 x 34 x 34 = 1156 > MAX_GROUP
    t, gh, gw = 1, 34, 34
    assert gh * gw > MAX_GROUP
    n = t * gh * gw
    params = init_vision_params(cfg, jax.random.PRNGKey(0))
    patches = _rand(jax.random.PRNGKey(5), (n, cfg.patch_dim), jnp.float32)
    cos, sin = vision_rotary_cos_sin([(t, gh, gw)], cfg.head_dim)
    seg_ids = np.repeat(np.arange(t), gh * gw).astype(np.int32)
    out = vision_forward(params, cfg, patches, cos, sin, seg_ids, gh * gw,
                         use_flash=True)
    ref = vision_forward(params, cfg, patches, cos, sin, seg_ids, gh * gw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
