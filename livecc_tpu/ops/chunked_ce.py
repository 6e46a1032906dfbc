"""Chunked softmax cross-entropy over the vocabulary projection.

N3-equivalent of the reference's Liger fused-linear-cross-entropy
(applied via --use_liger_kernel, scripts/pt_local.sh:32): never materializes
the full [seq, vocab] logits tensor. Two implementations share one API:

  * ``impl="scan"`` (default; CPU/parity/pipeline path) — the sequence is
    processed in fixed-size chunks under ``lax.scan`` + ``jax.checkpoint``
    so the backward recomputes each chunk's logits instead of storing them.
    Autodiff costs FOUR [chunk, H, V]-sized matmul passes per chunk
    (forward logits, recompute, dhidden, dkernel).
  * ``impl="fused"`` (TPU training hot path) — the Liger trick done the
    JAX way: a ``custom_vjp`` whose FORWARD chunk scan computes the loss
    AND both gradients in the same pass over each logits tile (softmax
    minus one-hot, while the tile is live), so the backward is a scalar
    scale of stored residuals. THREE matmul passes per chunk — the
    ``jax.checkpoint`` recompute pass disappears — and the dkernel
    accumulator rides the scan carry in fp32 (the plain-autodiff transpose
    accumulates it in the kernel's own dtype, i.e. bf16 in training, so
    the fused path is also numerically tighter there).

For a 32k-token sequence over the 152k Qwen2 vocab either path avoids the
~19.5 GB fp32 logits buffer; traffic per chunk is the hidden states + one
[chunk, V] tile of logits (+ one of grad-logits under autodiff).

Label convention matches the reference dataset (data/lmm_dataset.py:184-191):
labels == -100 are ignored; the loss is the sum over supervised positions
divided by their count (HF Trainer per-token mean).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

IGNORE_INDEX = -100


def _chunked(hidden, labels, chunk_size):
    """Pad to a chunk multiple and reshape to chunk-major [N, B, C, ...]."""
    b, s, h = hidden.shape
    pad = -s % chunk_size
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX)
    n_chunks = hidden.shape[1] // chunk_size
    hidden = hidden.reshape(b, n_chunks, chunk_size, h).swapaxes(0, 1)
    labels = labels.reshape(b, n_chunks, chunk_size).swapaxes(0, 1)
    return hidden, labels


def _scan_ce(hidden, lm_kernel, labels, chunk_size, out_dtype):
    hidden, labels = _chunked(hidden, labels, chunk_size)

    @jax.checkpoint
    def chunk_loss(hid, lab):
        logits = jnp.einsum("bsh,hv->bsv", hid, lm_kernel, preferred_element_type=out_dtype)
        mask = lab != IGNORE_INDEX
        safe = jnp.where(mask, lab, 0)
        logz = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
        gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0].astype(jnp.float32)
        return jnp.sum(jnp.where(mask, logz - gold, 0.0)), jnp.sum(mask)

    def body(carry, xs):
        loss, count = carry
        hid, lab = xs
        l, c = chunk_loss(hid, lab)
        return (loss + l, count + c), None

    # Initial carries derive their varying-axes type from the operands so
    # the scan is shard_map-safe (a literal 0.0 is unvarying; the body's
    # outputs vary over whatever axes hidden/labels vary over — e.g. when
    # this runs inside the pipeline-parallel last stage). Constant-folds to
    # plain zeros outside shard_map.
    zero_f = jnp.float32(0.0) + 0.0 * hidden[0, 0, 0, 0].astype(jnp.float32)
    zero_i = jnp.int32(0) + 0 * labels[0, 0, 0]
    (loss, count), _ = lax.scan(body, (zero_f, zero_i), (hidden, labels))
    return loss, count


@functools.lru_cache(maxsize=None)
def _fused_ce(chunk_size: int, logit_dtype, kernel_grad: bool):
    """Build the custom_vjp fused-linear-CE for one static configuration.

    ``kernel_grad=False`` skips the dkernel matmul pass and its [H, V] fp32
    accumulator entirely — use ONLY when ``lm_kernel`` is frozen (its
    cotangent comes back as zeros).
    """
    out_dtype = jnp.float32 if logit_dtype is None else logit_dtype

    def fwd_impl(hidden, lm_kernel, labels):
        b, s, h = hidden.shape
        v = lm_kernel.shape[1]
        hs, ls = _chunked(hidden, labels, chunk_size)

        def body(carry, xs):
            loss, count, dw = carry
            hid, lab = xs                                   # [B, C, H], [B, C]
            logits = jnp.einsum("bsh,hv->bsv", hid, lm_kernel,
                                preferred_element_type=out_dtype)
            mask = lab != IGNORE_INDEX
            safe = jnp.where(mask, lab, 0)
            lf = logits.astype(jnp.float32)
            logz = jax.nn.logsumexp(lf, axis=-1)
            gold = jnp.take_along_axis(lf, safe[..., None], axis=-1)[..., 0]
            loss = loss + jnp.sum(jnp.where(mask, logz - gold, 0.0))
            count = count + jnp.sum(mask)
            # grad wrt logits of sum-CE, while the tile is live: softmax
            # minus one-hot, zeroed at unsupervised positions; rounded to
            # the hidden dtype for the two grad matmuls (fp32 accumulation)
            g = jnp.exp(lf - logz[..., None]) - jax.nn.one_hot(safe, v, dtype=jnp.float32)
            g = (g * mask[..., None]).astype(hid.dtype)
            dhid = jnp.einsum("bsv,hv->bsh", g, lm_kernel,
                              preferred_element_type=jnp.float32).astype(hid.dtype)
            if kernel_grad:
                dw = dw + jnp.einsum("bsh,bsv->hv", hid, g,
                                     preferred_element_type=jnp.float32)
            return (loss, count, dw), dhid

        dw0 = jnp.zeros(lm_kernel.shape if kernel_grad else (), jnp.float32)
        (loss, count, dw), dhid = lax.scan(
            body, (jnp.float32(0.0), jnp.int32(0), dw0), (hs, ls))
        dhid = dhid.swapaxes(0, 1).reshape(b, -1, h)[:, :s]      # drop pad
        return (loss, count), (dhid, dw.astype(lm_kernel.dtype))

    @jax.custom_vjp
    def ce(hidden, lm_kernel, labels):
        # undifferentiated call: plain chunked loss, no grad passes
        return _scan_ce(hidden, lm_kernel, labels, chunk_size, out_dtype)

    def ce_fwd(hidden, lm_kernel, labels):
        (loss, count), (dhid, dw) = fwd_impl(hidden, lm_kernel, labels)
        if not kernel_grad:
            # shape/dtype carrier only — a constant XLA folds away unless the
            # caller (incorrectly) differentiates a frozen kernel, in which
            # case the cotangent is zeros as documented
            dw = jnp.zeros(lm_kernel.shape, lm_kernel.dtype)
        return (loss, count), (dhid, dw)

    def ce_bwd(res, cts):
        dhid, dw = res
        g_loss = cts[0].astype(jnp.float32)                      # count ct is float0
        d_hidden = (g_loss * dhid.astype(jnp.float32)).astype(dhid.dtype)
        if kernel_grad:
            d_kernel = (g_loss * dw.astype(jnp.float32)).astype(dw.dtype)
        else:
            d_kernel = dw
        return (d_hidden, d_kernel,
                np.zeros(dhid.shape[:2], jax.dtypes.float0))

    ce.defvjp(ce_fwd, ce_bwd)
    return ce


@functools.partial(jax.jit,
                   static_argnames=("chunk_size", "logit_dtype", "impl", "kernel_grad"))
def chunked_cross_entropy(
    hidden: jnp.ndarray,        # [B, S, H] final hidden states (pre-lm_head)
    lm_kernel: jnp.ndarray,     # [H, V]
    labels: jnp.ndarray,        # [B, S] int32, -100 = ignore
    chunk_size: int = 1024,
    logit_dtype=None,           # None = fp32 logits (parity); bf16 = TPU fast path
    impl: str = "scan",         # "scan" (checkpoint-recompute) | "fused" (grads in fwd)
    kernel_grad: bool = True,   # fused only: False iff lm_kernel is frozen
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (summed loss fp32, count of supervised tokens).

    ``logit_dtype=bf16`` rounds the [chunk, V] logit rows to bf16 at the
    MXU output (accumulation inside the matmul stays fp32; logsumexp and
    the gold gather upcast back to fp32): halves the dominant HBM term —
    the fp32 vocab-row round trip measured at 0.57x the calibrated MXU
    ceiling in r4 (PERF.md MFU table). Loss drift is the bf16 rounding of
    an O(10) logit (~0.04 absolute on logz), bounded in
    tests/test_train_step.py; fp32 remains the CPU/parity default.

    ``impl="fused"`` additionally deletes the checkpoint-recompute matmul
    pass under autodiff (module docstring; PERF.md r5 measures the win
    on-chip). Both impls share the masking/label semantics and the scan
    path's forward math; the pipeline-parallel last stage keeps "scan"
    (its loss runs inside shard_map where the replicated-zero carry
    trick applies).
    """
    if impl == "fused":
        return _fused_ce(chunk_size, logit_dtype, kernel_grad)(hidden, lm_kernel, labels)
    assert impl == "scan", impl
    out_dtype = jnp.float32 if logit_dtype is None else logit_dtype
    return _scan_ce(hidden, lm_kernel, labels, chunk_size, out_dtype)


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def _pmax_sg(x, axis_name):
    """``lax.pmax`` with a zero derivative (stop-gradient semantics).

    ``pmax`` has no AD rule, and wrapping it in ``stop_gradient`` does not
    help: JVP tracing reaches the inner pmax first. The custom_jvp keeps
    pmax's vma typing (the result is invariant over ``axis_name``, which the
    shard_map replication checker needs) while pinning the tangent to zero —
    exact for the logsumexp max-shift, whose derivative cancels analytically.
    """
    return lax.pmax(x, axis_name)


@_pmax_sg.defjvp
def _pmax_sg_jvp(axis_name, primals, tangents):
    out = lax.pmax(primals[0], axis_name)
    return out, jnp.zeros_like(out)


def vocab_parallel_ce(hidden, kernel_shard, labels, *, axis_name: str,
                      v_total: int, chunk_size: int = 1024, logit_dtype=None):
    """Chunked CE with the VOCAB dimension sharded over a mesh axis.

    For use INSIDE ``shard_map``: each participant holds a [H, V/P] column
    slice of the lm_head kernel (shard ``i`` owns global columns
    ``[i*V/P, (i+1)*V/P)``) and the full ``hidden``/``labels``. The full
    logsumexp is assembled from per-shard pieces with three small
    collectives per chunk (pmax of the row max, psum of the shifted sumexp,
    psum of the masked gold-logit gather) — O(batch x chunk) floats each,
    never a [*, V] tensor. Returns (summed loss fp32, supervised count),
    replicated over ``axis_name``; gradients flow to both operands (the
    kernel cotangent stays shard-local — no [H, V] all-reduce, the reason
    this exists: see parallel/pipeline.py, where the CE head is
    vocab-sharded over the pipeline stages so the tail after the drain
    phase runs P-way parallel instead of replicated).

    ``v_total`` is the UNPADDED vocab size: when the caller pads V up to a
    multiple of the axis size, the pad columns are masked to -inf here so
    they cannot leak into the logsumexp.
    """
    v_shard = kernel_shard.shape[1]
    n_shards = lax.axis_size(axis_name)
    assert v_shard * n_shards >= v_total, (v_shard, n_shards, v_total)
    needs_col_mask = v_shard * n_shards != v_total
    out_dtype = jnp.float32 if logit_dtype is None else logit_dtype
    v0 = lax.axis_index(axis_name) * v_shard
    hidden, labels = _chunked(hidden, labels, chunk_size)

    @jax.checkpoint
    def chunk_loss(hid, lab):
        logits = jnp.einsum("bsh,hv->bsv", hid, kernel_shard,
                            preferred_element_type=out_dtype)
        lf = logits.astype(jnp.float32)
        if needs_col_mask:
            col = v0 + lax.iota(jnp.int32, v_shard)
            lf = jnp.where(col < v_total, lf, -1e30)
        gmax = _pmax_sg(jnp.max(lf, axis=-1), axis_name)
        sumexp = jnp.sum(jnp.exp(lf - gmax[..., None]), axis=-1)
        logz = gmax + jnp.log(lax.psum(sumexp, axis_name))
        mask = lab != IGNORE_INDEX
        safe = jnp.where(mask, lab, 0)
        loc = safe - v0
        in_shard = (loc >= 0) & (loc < v_shard)
        gl = jnp.take_along_axis(lf, jnp.clip(loc, 0, v_shard - 1)[..., None],
                                 axis=-1)[..., 0]
        gold = lax.psum(jnp.where(in_shard, gl, 0.0), axis_name)
        return jnp.sum(jnp.where(mask, logz - gold, 0.0)), jnp.sum(mask)

    def body(carry, xs):
        loss, count = carry
        l, c = chunk_loss(*xs)
        return (loss + l, count + c), None

    # carries inherit the operands' varying axes (see _scan_ce)
    zero_f = jnp.float32(0.0) + 0.0 * hidden[0, 0, 0, 0].astype(jnp.float32)
    zero_i = jnp.int32(0) + 0 * labels[0, 0, 0]
    (loss, count), _ = lax.scan(body, (zero_f, zero_i), (hidden, labels))
    return loss, count


def cross_entropy_mean(hidden, lm_kernel, labels, chunk_size: int = 1024,
                       logit_dtype=None) -> jnp.ndarray:
    loss, count = chunked_cross_entropy(hidden, lm_kernel, labels,
                                        chunk_size=chunk_size, logit_dtype=logit_dtype)
    return loss / jnp.maximum(count, 1)
