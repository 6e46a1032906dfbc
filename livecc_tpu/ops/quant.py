"""Weight-only int8 quantization for serving (per-output-channel symmetric).

Serving decode at small batch is weight-HBM-bound: every step streams the
full LLM weight set through the MXU for a handful of rows. Storing the big
matmul operands as int8 with a bf16 scale per output channel halves that
traffic (the int8->bf16 convert fuses into the matmul operand read, so HBM
sees int8), and halves weight memory: the 7B drops from 15.5 GB to ~7.8 GB,
turning the v5e serving plan from TP=4 into TP=2 (parallel/memory.py with
``param_dtype_bytes=1``).

This is a *serving-side* transform and the TPU serving DEFAULT
(``LiveCCEngine(quantize_weights=None)`` resolves to int8 on TPU — decided
by the r5 soak A/B + width-golden drift data, PERF.md); training and the
HF-parity test path stay bf16/fp32 (pass ``quantize_weights=False``). The reference has no quantization story at all — its serving memory
plan is "inherit an 80 GB GPU" (SURVEY.md §6).

A quantized weight is a pytree node ``{"q": int8, "scale": bf16}`` with the
scale reduced over the contraction (input) axis, so ``x @ q * scale`` is
exact per output column up to int8 rounding (~0.2% relative). All matmul
call sites route through :func:`dense` / :func:`embed_lookup` /
``lm_logits`` which accept both plain arrays and quantized nodes;
``parallel/sharding.py:param_pspecs`` assigns TP specs to the sub-leaves by
path, so TP serving works unchanged.
"""

from __future__ import annotations

from typing import Any, Union

import jax.numpy as jnp

Quantized = dict  # {"q": int8 ndarray, "scale": bf16 ndarray}
Weight = Union[jnp.ndarray, Quantized]

#: text-tower kernels quantized by quantize_model_params; scale reduces the
#: second-to-last (input) axis of each [L, in, out] stack.
_LAYER_KERNELS = ("q_kernel", "k_kernel", "v_kernel", "o_kernel",
                  "gate_kernel", "up_kernel", "down_kernel")


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "scale" in w


def quantize_weight(w: jnp.ndarray, scale_axis: int = -2) -> Quantized:
    """Symmetric int8 with a weight-dtype scale per kept channel.

    ``scale_axis`` is the CONTRACTION axis the scale reduces over: -2 for
    [..., in, out] kernels (one scale per output column), -1 for the
    [V, H] embedding (one scale per vocab row — the same scale then serves
    the tied lm_head as a per-column scale after transpose).
    """
    w = jnp.asarray(w)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=scale_axis, keepdims=True)
    # scale keeps the weight's dtype so activations stay in one dtype (bf16
    # for serving params, fp32 on the CPU parity path); round it to that
    # dtype BEFORE computing codes so q and the stored scale are consistent
    scale = (jnp.maximum(amax, 1e-8) / 127.0).astype(w.dtype)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale.astype(jnp.float32)),
                 -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def dense(x: jnp.ndarray, w: Weight) -> jnp.ndarray:
    """``x @ w`` for a plain or quantized weight ([..., in, out])."""
    if is_quantized(w):
        return (x @ w["q"].astype(x.dtype)) * w["scale"].astype(x.dtype)
    return x @ w


def embed_lookup(w: Weight, ids: jnp.ndarray) -> jnp.ndarray:
    """Row gather from a plain or quantized [V, H] embedding table."""
    if is_quantized(w):
        return w["q"][ids].astype(w["scale"].dtype) * w["scale"][ids]
    return w[ids]


def vocab_kernel(w: Weight, transpose: bool) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """(kernel [H, V], per-column scale [1, V] or None) for lm_logits.

    ``transpose=True`` for the tied [V, H] embedding, False for a stored
    [H, V] lm_head kernel.
    """
    if is_quantized(w):
        q, s = w["q"], w["scale"]
        return (q.T, s.reshape(1, -1)) if transpose else (q, s.reshape(1, -1))
    return (w.T if transpose else w), None


#: vision-tower kernels quantized alongside the text tower; the blocks are
#: [depth, in, out] lax.scan stacks, the merger kernels plain [in, out].
_VIT_BLOCK_KERNELS = ("qkv_kernel", "proj_kernel", "fc1_kernel", "fc2_kernel")


def quantize_model_params(params: dict) -> dict:
    """Quantize the matmul weights of a Qwen2-VL param tree.

    Text-tower attention/MLP kernels, the embedding table, the lm_head (if
    untied), and the ViT block/merger kernels become ``{"q", "scale"}``
    nodes; biases, norms, and the raw-pixel ``patch_embed`` projection
    (tiny, and the input's only precision gate) stay as-is. The returned
    tree drops straight into ``model.forward`` / ``LiveCCEngine``.
    """
    p = dict(params)
    text = dict(p["text"])
    layers = dict(text["layers"])
    for name in _LAYER_KERNELS:
        layers[name] = quantize_weight(layers[name], scale_axis=-2)
    text["layers"] = layers
    text["embed"] = {"weight": quantize_weight(text["embed"]["weight"], scale_axis=-1)}
    if "lm_head" in text:
        text["lm_head"] = {"kernel": quantize_weight(text["lm_head"]["kernel"], scale_axis=-2)}
    p["text"] = text
    if "visual" in p:
        visual = dict(p["visual"])
        blocks = dict(visual["blocks"])
        for name in _VIT_BLOCK_KERNELS:
            blocks[name] = quantize_weight(blocks[name], scale_axis=-2)
        visual["blocks"] = blocks
        merger = dict(visual["merger"])
        for name in ("fc1_kernel", "fc2_kernel"):
            merger[name] = quantize_weight(merger[name], scale_axis=-2)
        visual["merger"] = merger
        p["visual"] = visual
    return p
