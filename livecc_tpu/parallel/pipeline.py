"""Pipeline-parallel training step (GPipe fill-drain over the model axis).

Beyond-reference parallelism (SURVEY.md §2c lists PP as absent in the
reference): the LLM's stacked layer dimension is sharded over the mesh's
``model`` axis — stage ``s`` owns layers ``[s*L/P, (s+1)*L/P)`` — and the
gradient-accumulation microbatches stream through the stages in a
fill-drain schedule expressed as a ``lax.scan`` over ticks inside
``shard_map``; activations hop stages with ``ppermute`` over ICI.
Gradients come from plain autodiff THROUGH the schedule (the transpose of
``ppermute`` is the reverse permute), so numerics are bit-comparable to
the single-device step (tested on the virtual CPU mesh).

Scope (v1): text-only microbatches with frozen-ViT semantics (the
reference's recipe, --freeze_modules visual). Embedding runs replicated
OUTSIDE the shard_map region (GSPMD handles its data-parallel gradient);
the layer stack pipelines, and the CE head runs VOCAB-PARALLEL across the
stages inside the region (each stage owns [H, V/P] columns;
ops/chunked_ce.py:vocab_parallel_ce) — the tail after the drain uses all
P MXUs and the head's [H, V] gradient never crosses the model axis. The
data axis keeps its usual meaning: batch rows shard over ``data`` inside
the pipeline too, so DP x PP composes on one 2D mesh (PP replaces TP on
the ``model`` axis — the two are alternative uses of the same axis here).

Memory: autodiff through the tick scan stashes one boundary activation
per tick (M + P - 1 of [B/dp, S, H]) — the GPipe profile; per-layer remat
applies inside each stage as usual.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
from livecc_tpu.models.qwen2_vl.text import decoder_block, remat_policy
from livecc_tpu.ops.attention import causal_mask, mha, train_flash_attention
from livecc_tpu.ops.chunked_ce import vocab_parallel_ce
from livecc_tpu.ops.norms import rms_norm
from livecc_tpu.ops.quant import embed_lookup, vocab_kernel
from livecc_tpu.ops.rope import mrope_cos_sin
from livecc_tpu.train.step import Batch, TrainConfig, split_frozen

Params = dict[str, Any]


def pp_param_pspecs(params: Params) -> Params:
    """Layer-stacked leaves shard their LEADING (layer) axis over the model
    axis — each pipeline stage holds its contiguous slice; everything else
    replicates. The data axis is untouched (ZeRO-2 shards the OPTIMIZER
    state over it, exactly as in the TP layout)."""

    def spec_for(path, leaf):
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        if "layers" in names and leaf.ndim >= 1:
            return P(MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def make_pp_train_step(cfg: ModelConfig, tcfg: TrainConfig, optimizer,
                       mesh: Mesh, use_flash: bool | None = None):
    """Pipeline-parallel ``step(params, opt_state, batch)``.

    ``batch`` [A, B, S] — the accumulation dim A is the microbatch stream
    (A >= n_stage keeps the bubble fraction at (P-1)/(A+P-1)). Text-only:
    vision fields must be None (the reference freezes the ViT; pipelining
    its frozen forward buys nothing).
    """
    n_stage = mesh.shape[MODEL_AXIS]
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"

    tcfg_layers = cfg.text.num_hidden_layers
    assert tcfg_layers % n_stage == 0, (
        f"num_hidden_layers {tcfg_layers} must divide into {n_stage} stages")

    def stage_forward(layers_shard, x, cos, sin, mask):
        """Run this stage's layer slice on one microbatch activation."""
        if use_flash:
            # the splash/flash kernels take bool validity OR int32 segment
            # ids (sequence packing) natively
            attend = lambda q, k, v: train_flash_attention(q, k, v, mask)
        else:
            full = causal_mask(x.shape[1])[None, None]
            if mask is not None:
                if mask.dtype == jnp.bool_:
                    full = full & mask[:, None, None, :]
                else:
                    # int32 segment ids (packed batches): same-segment only,
                    # id 0 = pad — mirrors text_forward's packing branch
                    pair = (mask[:, None, :, None] == mask[:, None, None, :]) & (
                        mask > 0)[:, None, None, :]
                    full = full & pair
            attend = lambda q, k, v: mha(q, k, v, mask=full)

        def block(h, layer):
            return decoder_block(h, layer, attend, cfg=cfg.text, cos=cos,
                                 sin=sin, remat=tcfg.remat), None

        if tcfg.remat:
            # remat_policy matches decoder_block's name tags — using any
            # other policy with the "names" modes is the documented
            # mesh-path SIGABRT combination (models/qwen2_vl/text.py)
            block = jax.checkpoint(block, policy=remat_policy(tcfg.remat))
        x, _ = lax.scan(block, x, layers_shard)
        return x

    def pp_fn(layers_shard, final_ln, lm_kernel, embeds, cos, sin, mask, labels):
        """Per-device GPipe schedule. embeds/cos/sin/mask/labels carry the
        microbatch dim M in front; layers_shard is this stage's slice;
        lm_kernel is this stage's VOCAB column slice — after the drain the
        last stage's hidden states are psum-broadcast over the model axis
        and every stage computes the CE over its own vocab shard
        (ops/chunked_ce.py:vocab_parallel_ce), so the 152k-column head
        runs P-way parallel and its [H, V] gradient stays shard-local
        instead of being psum-replicated across the stages."""
        m = embeds.shape[0]
        stage = lax.axis_index(MODEL_AXIS)
        n_ticks = m + n_stage - 1
        # initial carries must already be model-varying (they become so
        # through ppermute/axis_index inside the scan body)
        outs0 = lax.pcast(jnp.zeros_like(embeds), (MODEL_AXIS,), to="varying")
        recv0 = lax.pcast(jnp.zeros_like(embeds[0]), (MODEL_AXIS,), to="varying")

        def tick(carry, t):
            recv, outs = carry
            mb = t - stage                                  # microbatch here
            src = jnp.clip(jnp.where(stage == 0, t, mb), 0, m - 1)
            x = jnp.where(stage == 0,
                          lax.dynamic_index_in_dim(embeds, jnp.clip(t, 0, m - 1),
                                                   0, keepdims=False),
                          recv)
            y = stage_forward(
                layers_shard, x,
                lax.dynamic_index_in_dim(cos, src, 0, keepdims=False),
                lax.dynamic_index_in_dim(sin, src, 0, keepdims=False),
                None if mask is None
                else lax.dynamic_index_in_dim(mask, src, 0, keepdims=False),
            )
            # hand the activation to the next stage (wraparound to stage 0
            # is ignored there — it always reads embeds)
            recv = lax.ppermute(y, MODEL_AXIS,
                                [(i, (i + 1) % n_stage) for i in range(n_stage)])
            valid = (mb >= 0) & (mb < m) & (stage == n_stage - 1)
            stored = lax.dynamic_update_index_in_dim(
                outs, y, jnp.clip(mb, 0, m - 1), 0)
            outs = jnp.where(valid, stored, outs)
            return (recv, outs), None

        (recv, outs), _ = lax.scan(tick, (recv0, outs0), jnp.arange(n_ticks))
        # Broadcast the last stage's hidden states over the model axis (a
        # psum with one non-zero contributor: non-last stages' outs stay
        # the zeros init), then run the CE VOCAB-PARALLEL: each stage owns
        # a [H, V/P] column slice, so the head's matmuls run P-way parallel
        # during the tail and only O(batch x chunk) scalars per chunk cross
        # the model axis — never a [*, V] tensor, and the kernel gradient
        # stays shard-local.
        last = stage == n_stage - 1
        outs = lax.psum(jnp.where(last, outs, 0.0), MODEL_AXIS)
        hidden = rms_norm(outs, final_ln, cfg.text.rms_norm_eps)
        b, s = hidden.shape[1], hidden.shape[2]
        loss, count = vocab_parallel_ce(
            hidden.reshape(m * b, s, -1), lm_kernel, labels.reshape(m * b, s),
            axis_name=MODEL_AXIS, v_total=cfg.text.vocab_size,
            chunk_size=tcfg.ce_chunk_size)
        # data-parallel reduction: token-weighted global mean
        loss = lax.psum(loss, DATA_AXIS)
        count = lax.psum(count, DATA_AXIS)
        return loss, count

    pp_sharded = jax.shard_map(
        pp_fn, mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(), P(None, MODEL_AXIS), P(None, DATA_AXIS),
                  P(None, DATA_AXIS), P(None, DATA_AXIS), P(None, DATA_AXIS),
                  P(None, DATA_AXIS)),
        out_specs=(P(), P()),
    )

    def loss_fn(trainable, frozen, batch: Batch):
        params = {**frozen, **trainable}
        tp = params["text"]
        embeds = jax.vmap(lambda ids: embed_lookup(tp["embed"]["weight"], ids))(
            batch.input_ids)                                # [M, B, S, H]
        cos, sin = jax.vmap(
            lambda p: mrope_cos_sin(p, cfg.text.head_dim, cfg.text.rope_theta,
                                    cfg.text.mrope_section)
        )(batch.position_ids)
        cos = cos.astype(embeds.dtype)
        sin = sin.astype(embeds.dtype)
        if cfg.text.tie_word_embeddings:
            kernel, scale = vocab_kernel(tp["embed"]["weight"], transpose=True)
        else:
            kernel, scale = vocab_kernel(tp["lm_head"]["kernel"], transpose=False)
        if scale is not None:
            kernel = kernel.astype(embeds.dtype) * scale
        # vocab-parallel CE: pad V up to a stage multiple (pad columns are
        # masked to -inf inside vocab_parallel_ce via cfg.text.vocab_size)
        v_pad = -kernel.shape[1] % n_stage
        if v_pad:
            kernel = jnp.pad(kernel, ((0, 0), (0, v_pad)))
        shifted = jnp.concatenate(
            [batch.labels[:, :, 1:], jnp.full_like(batch.labels[:, :, :1], -100)],
            axis=2)
        loss, count = pp_sharded(tp["layers"], tp["final_ln"], kernel,
                                 embeds, cos, sin, batch.attention_mask, shifted)
        return loss / jnp.maximum(count, 1), (loss, count)

    import optax

    def step(params: Params, opt_state, batch: Batch):
        assert batch.vision_patches is None and batch.image_patches is None, (
            "pipeline step v1 is text-only (frozen-ViT recipe)")
        trainable, frozen = split_frozen(params, tcfg.freeze_modules)
        (mean_loss, (loss_sum, count)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable, frozen, batch)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics = {"loss": mean_loss, "tokens": count, "ce_dropped": jnp.int32(0)}
        return {**frozen, **trainable}, opt_state, metrics

    return step


def shard_params_pp(params: Params, mesh: Mesh) -> Params:
    from jax.sharding import NamedSharding

    specs = pp_param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), params, specs
    )
