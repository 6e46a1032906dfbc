"""Chunked softmax cross-entropy over the vocabulary projection.

N3-equivalent of the reference's Liger fused-linear-cross-entropy
(applied via --use_liger_kernel, scripts/pt_local.sh:32): never materializes
the full [seq, vocab] logits tensor. The sequence is processed in fixed-size
chunks under ``lax.scan`` (+ ``jax.checkpoint`` so the backward pass
recomputes each chunk's logits instead of storing them) — for a 32k-token
sequence over the 152k Qwen2 vocab this avoids a ~19.5 GB fp32 buffer and
keeps HBM traffic to the hidden states + one chunk of logits.

Label convention matches the reference dataset (data/lmm_dataset.py:184-191):
labels == -100 are ignored; the loss is the sum over supervised positions
divided by their count (HF Trainer per-token mean).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

IGNORE_INDEX = -100


@functools.partial(jax.jit, static_argnames=("chunk_size", "logit_dtype"))
def chunked_cross_entropy(
    hidden: jnp.ndarray,        # [B, S, H] final hidden states (pre-lm_head)
    lm_kernel: jnp.ndarray,     # [H, V]
    labels: jnp.ndarray,        # [B, S] int32, -100 = ignore
    chunk_size: int = 1024,
    logit_dtype=None,           # None = fp32 logits (parity); bf16 = TPU fast path
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (summed loss fp32, count of supervised tokens).

    ``logit_dtype=bf16`` rounds the [chunk, V] logit rows to bf16 at the
    MXU output (accumulation inside the matmul stays fp32; logsumexp and
    the gold gather upcast back to fp32): halves the dominant HBM term —
    the fp32 vocab-row round trip measured at 0.57x the calibrated MXU
    ceiling in r4 (PERF.md MFU table). Loss drift is the bf16 rounding of
    an O(10) logit (~0.04 absolute on logz), bounded in
    tests/test_train_step.py; fp32 remains the CPU/parity default.
    """
    b, s, h = hidden.shape
    pad = -s % chunk_size
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX)
    n_chunks = hidden.shape[1] // chunk_size
    hidden = hidden.reshape(b, n_chunks, chunk_size, h).swapaxes(0, 1)
    labels = labels.reshape(b, n_chunks, chunk_size).swapaxes(0, 1)

    out_dtype = jnp.float32 if logit_dtype is None else logit_dtype

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


def cross_entropy_mean(hidden, lm_kernel, labels, chunk_size: int = 1024,
                       logit_dtype=None) -> jnp.ndarray:
    loss, count = chunked_cross_entropy(hidden, lm_kernel, labels,
                                        chunk_size=chunk_size, logit_dtype=logit_dtype)
    return loss / jnp.maximum(count, 1)
