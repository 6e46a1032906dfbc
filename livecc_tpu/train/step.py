"""Sharded training step: AdamW + cosine/warmup, grad accumulation, remat.

Replaces the reference's HF Trainer + DeepSpeed ZeRO-2 stack (train.py:25-29,
scripts/pt_local.sh:17-31, scripts/deepspeed_zero2.json): one pjit-compiled
step over the (data, model) mesh. Params replicate along data and
tensor-parallel-shard along model (parallel/sharding.py); optimizer state is
ZeRO-2-sharded along data; gradient accumulation is a ``lax.scan`` over
micro-batches inside the same compiled step (reference: 64 micro-batches of
1 sample, effective batch 512).

The visual tower is frozen by default (train.py:17-19, --freeze_modules
visual): frozen subtrees get ``stop_gradient`` (skips their backward) and a
zero optax transform.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.models.qwen2_vl.model import VisionInputs, forward
from livecc_tpu.ops.chunked_ce import chunked_cross_entropy

Params = dict[str, Any]

# CE logit-row dtype on the TPU path: "bf16" (halved vocab-row HBM traffic,
# the default) or "f32". Env override for A/B experiments, mirroring
# TRAIN_ATTN / VIT_ATTN.
import os as _os

_CE_LOGITS_IMPL = _os.environ.get("CE_LOGITS", "bf16")
# CE autodiff strategy on the TPU path: "fused" (grads computed in the
# forward chunk scan via custom_vjp — 3 matmul passes/chunk instead of the
# checkpoint-recompute path's 4, ops/chunked_ce.py) or "scan". Env override
# for A/B; the CPU/parity path always uses "scan".
_CE_IMPL = _os.environ.get("CE_IMPL", "fused")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors the reference recipe (scripts/pt_local.sh:17-31)."""

    learning_rate: float = 2e-5          # PT; SFT uses 1e-5 (sft_local.sh:5)
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    # dtype of Adam's FIRST moment (optax mu_dtype). fp32 matches DeepSpeed;
    # bf16 halves that buffer (the second moment stays fp32) — at 2B scale
    # this frees ~1.8 GB of HBM, which matters on a single 16 GiB chip where
    # params + moments + fp32 grad accumulators crowd the backward's
    # workspace (see PERF.md round-2 notes).
    adam_mu_dtype: Optional[Any] = None
    max_grad_norm: float = 1.0
    freeze_modules: tuple[str, ...] = ("visual",)
    ce_chunk_size: int = 1024
    # CE autodiff strategy: None resolves per backend (TPU -> the fused
    # custom_vjp path unless CE_IMPL=scan; CPU/parity -> "scan"). Explicit
    # "fused"/"scan" pins it — tests use this to exercise the fused path
    # on the CPU suite.
    ce_impl: Optional[str] = None
    # Static cap on supervised positions per micro-batch: when set, the CE
    # gathers ONLY supervised (label != -100) positions into a [ce_sup_bucket]
    # buffer before the vocab projection, so the 152k-vocab matmul runs over
    # supervised tokens instead of the whole sequence. In the streaming
    # corpus most tokens are video/user context (data/lmm_dataset.py:184-191
    # masks everything outside assistant spans) — at 8k-token sequences with
    # ~40% supervision this cuts CE FLOPs ~2.4x (fwd+bwd+remat recompute).
    # The caller MUST size the bucket >= the bucket's max supervised count
    # (the collator knows it); overflow positions are dropped from the loss.
    ce_sup_bucket: Optional[int] = None
    # per-layer rematerialization (the reference's --gradient_checkpointing):
    # True = full recompute (nothing saved); "names" = save qkv/o/down
    # projection outputs (~83 MB/layer bf16 at seq 8k, skips ~1/3 of the
    # recompute matmuls); "names_mlp" = also save the silu(gate)*up product
    # (+140 MB/layer, skips ~80% of recompute matmuls); "dots" = XLA's
    # save-all-matmul-outputs policy (crashes the relay compiler here).
    # See models/qwen2_vl/text.py:text_forward for the measured trade-offs.
    remat: bool | str = True
    # Pallas flash attention with backward in the LLM (None = auto on TPU)
    use_flash: Optional[bool] = None
    # Sequence parallelism under a TP mesh (megatron SP as GSPMD
    # constraints: residual stream sharded along seq over the model axis;
    # see models/qwen2_vl/text.py:text_forward). Requires mesh with a
    # model axis; numerics identical to the unsharded step.
    seq_shard: bool = False


def lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    warmup = max(int(cfg.total_steps * cfg.warmup_ratio), 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=warmup,
        decay_steps=max(cfg.total_steps, warmup + 1),
        end_value=0.0,
    )


def split_frozen(params: Params, freeze_modules: tuple[str, ...]) -> tuple[Params, Params]:
    """(trainable, frozen) top-level split (train.py:17-19 freezes by module
    name). Frozen modules carry NO gradient buffers or optimizer state —
    the DeepSpeed behavior; a full-tree fp32 grad accumulator for the frozen
    ViT alone costs ~1.4 GB at 2B scale."""
    trainable = {k: v for k, v in params.items() if k not in freeze_modules}
    frozen = {k: v for k, v in params.items() if k in freeze_modules}
    return trainable, frozen


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW over the TRAINABLE subtree: init with
    ``split_frozen(params, cfg.freeze_modules)[0]``."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            learning_rate=lr_schedule(cfg),
            b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay, mu_dtype=cfg.adam_mu_dtype,
        ),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Batch:
    """One (accum, B, S) training batch; static shapes per bucket.

    ``vision`` carries all clips' patches concatenated per micro-batch
    (padded to a static patch count); labels use -100 ignore semantics
    (data/lmm_dataset.py:184-191).
    """

    input_ids: jnp.ndarray        # [A, B, S]
    labels: jnp.ndarray           # [A, B, S]
    position_ids: jnp.ndarray     # [A, 3, B, S]
    attention_mask: jnp.ndarray   # [A, B, S] bool
    vision_patches: Optional[jnp.ndarray] = None   # [A, N, patch_dim]
    vision_cos: Optional[jnp.ndarray] = None       # [A, N, hd]
    vision_sin: Optional[jnp.ndarray] = None
    vision_seg_ids: Optional[jnp.ndarray] = None   # [A, N]
    image_patches: Optional[jnp.ndarray] = None    # [A, Ni, patch_dim]
    image_cos: Optional[jnp.ndarray] = None
    image_sin: Optional[jnp.ndarray] = None
    image_seg_ids: Optional[jnp.ndarray] = None
    # Static per-temporal-group patch count (grid h*w) when uniform across
    # the window: enables the ViT's blocked O(N) attention — without it a
    # 21k-patch training video builds an O(N^2) mask (~30 GB at fp32).
    vision_group: Optional[int] = dataclasses.field(default=None, metadata=dict(static=True))
    image_group: Optional[int] = dataclasses.field(default=None, metadata=dict(static=True))


def loss_fn(params: Params, cfg: ModelConfig, tcfg: TrainConfig, micro,
            use_flash: bool = False) -> tuple[jnp.ndarray, tuple[jnp.ndarray, jnp.ndarray]]:
    """Mean CE over supervised tokens of one micro-batch.

    Returns ``(loss, (count, dropped))`` where ``dropped`` is the number of
    supervised positions truncated by an undersized ``ce_sup_bucket`` (0 on
    the unbucketed path) — silent truncation would train on a biased label
    subset, so the trainer logs/raises on it (metrics['ce_dropped'])."""
    ids, labels, pos, mask = micro.input_ids, micro.labels, micro.position_ids, micro.attention_mask
    vision = None
    if micro.vision_patches is not None:
        vision = VisionInputs(micro.vision_patches, micro.vision_cos, micro.vision_sin,
                              micro.vision_seg_ids, group=micro.vision_group)
    vision_images = None
    if micro.image_patches is not None:
        vision_images = VisionInputs(micro.image_patches, micro.image_cos,
                                     micro.image_sin, micro.image_seg_ids,
                                     group=micro.image_group)
    hidden, _ = forward(params, cfg, ids, pos, vision=vision,
                        vision_images=vision_images,
                        attention_mask=mask, compute_logits=False,
                        remat=tcfg.remat, use_flash=use_flash,
                        seq_shard=tcfg.seq_shard)
    # bf16 logit rows on the TPU hot path (fp32 matmul accumulation; the
    # CE reductions upcast) — halves the r4-measured CE HBM bottleneck.
    # CE_LOGITS=f32 A/Bs back to full-precision rows.
    ce_logit_dtype = (jnp.bfloat16 if use_flash and _CE_LOGITS_IMPL == "bf16"
                      else None)
    ce_impl = tcfg.ce_impl or (
        "fused" if use_flash and _CE_IMPL == "fused" else "scan")
    if cfg.text.tie_word_embeddings:
        kernel = params["text"]["embed"]["weight"].T
    else:
        kernel = params["text"]["lm_head"]["kernel"]
    # next-token shift: predict labels[t+1] from hidden[t]
    shifted = jnp.concatenate(
        [labels[:, 1:], jnp.full_like(labels[:, :1], -100)], axis=1
    )
    if tcfg.ce_sup_bucket:
        kb = tcfg.ce_sup_bucket
        b, s, h = hidden.shape
        flat_h = hidden.reshape(b * s, h)
        flat_l = shifted.reshape(b * s)
        sup = flat_l != -100
        n_sup = jnp.sum(sup)
        idx = jnp.nonzero(sup, size=kb, fill_value=0)[0]        # static size
        lab = jnp.where(jnp.arange(kb) < n_sup, flat_l[idx], -100)
        loss, count = chunked_cross_entropy(
            flat_h[idx][None], kernel, lab[None],
            chunk_size=min(tcfg.ce_chunk_size, kb),
            logit_dtype=ce_logit_dtype, impl=ce_impl,
        )
        dropped = jnp.maximum(n_sup - kb, 0)
    else:
        loss, count = chunked_cross_entropy(hidden, kernel, shifted,
                                            chunk_size=tcfg.ce_chunk_size,
                                            logit_dtype=ce_logit_dtype,
                                            impl=ce_impl)
        dropped = jnp.int32(0)
    return loss, (count, dropped)


def make_train_step(cfg: ModelConfig, tcfg: TrainConfig, optimizer: optax.GradientTransformation):
    """Returns jit-able ``step(params, opt_state, batch) -> (params, opt_state, metrics)``.

    Accumulates over the leading ``A`` axis of Batch inside one compiled
    program, normalizing by the total supervised-token count across the
    accumulation window (HF Trainer semantics).
    """

    use_flash = (jax.default_backend() == "tpu") if tcfg.use_flash is None else tcfg.use_flash

    def step(params: Params, opt_state, batch: Batch):
        trainable, frozen = split_frozen(params, tcfg.freeze_modules)

        def grad_one(micro):
            def scaled(tp):
                return loss_fn({**frozen, **tp}, cfg, tcfg, micro, use_flash=use_flash)
            (loss, (count, dropped)), grads = jax.value_and_grad(scaled, has_aux=True)(trainable)
            return loss, count, dropped, grads

        def body(carry, micro):
            loss_acc, count_acc, drop_acc, grads_acc = carry
            loss, count, dropped, grads = grad_one(micro)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (loss_acc + loss, count_acc + count, drop_acc + dropped, grads_acc), None

        zeros = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), trainable)
        (loss_sum, count_sum, drop_sum, grads), _ = lax.scan(
            body, (jnp.float32(0.0), jnp.int32(0), jnp.int32(0), zeros), batch
        )
        # cross-data-replica token-weighted mean happens automatically: grads
        # and counts are summed over the data axis by pjit when opt state is
        # data-sharded; normalize by global token count.
        denom = jnp.maximum(count_sum, 1).astype(jnp.float32)
        grads = jax.tree_util.tree_map(lambda g: (g / denom).astype(jnp.float32), grads)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics = {"loss": loss_sum / denom, "tokens": count_sum,
                   "ce_dropped": drop_sum}
        return {**frozen, **trainable}, opt_state, metrics

    return step
