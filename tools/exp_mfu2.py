"""MFU attribution round 2: component-level probes, sequential with
calibration brackets.

Each probe builds its own state, runs REPS times, and frees everything
before the next probe (the chip has 16 GiB; holding two step states OOMs).
The calibration matmul runs between probes so the time-shared chip's drift
is visible in-line. Prints one JSON line per measurement.

Probes (EXP_PROBES csv): cal, vit, llm, ce, opt, step, step_dots

Usage: PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/tpu_cache \
       python tools/exp_mfu2.py
"""

from __future__ import annotations

import dataclasses
import gc
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.models.qwen2_vl.model import init_params, prepare_vision_inputs
from livecc_tpu.models.qwen2_vl.vision import vision_forward
from livecc_tpu.ops.chunked_ce import chunked_cross_entropy
from livecc_tpu.train import (Batch, TrainConfig, make_optimizer,
                              make_train_step, split_frozen)
from tools.exp_mfu import build  # same batch construction

SEQ = int(os.environ.get("EXP_SEQ", 8192))
DEPTH = int(os.environ.get("EXP_DEPTH", 12))
ACCUM = int(os.environ.get("EXP_ACCUM", 4))
REPS = int(os.environ.get("EXP_REPS", 3))


def emit(obj):
    print(json.dumps(obj), flush=True)


def measure(name, fn):
    try:
        t0 = time.perf_counter()
        fn()
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        emit({"probe": name, "compile_s": round(compile_s, 1),
              "walls": [round(w, 4) for w in walls],
              "median": round(float(np.median(walls)), 4)})
    except Exception as e:
        emit({"probe": name, "error": f"{type(e).__name__}: {e}"[:300]})


def calibrate():
    n = 8192
    x = jnp.ones((n, n), jnp.bfloat16)
    w = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def cal(x, w):
        for _ in range(8):
            x = (x @ w) * (1.0 / n)
        return jnp.sum(x)

    np.asarray(cal(x, w))
    t0 = time.perf_counter()
    np.asarray(cal(x, w))
    wall = time.perf_counter() - t0
    emit({"probe": "cal", "wall_s": round(wall, 4),
          "achieved_tflops": round(8 * 2 * n**3 / wall / 1e12, 1)})
    del x, w
    gc.collect()


def main():
    assert jax.default_backend() == "tpu"
    full = ModelConfig.qwen2_vl_2b()
    cfg = dataclasses.replace(
        full,
        vision=dataclasses.replace(full.vision, depth=16),
        text=dataclasses.replace(full.text, num_hidden_layers=DEPTH),
        name=f"{full.name}-d{DEPTH}",
    )
    grid = (24, 16, 34)
    n_patches = grid[0] * grid[1] * grid[2]
    probes = os.environ.get("EXP_PROBES", "vit,llm,ce,opt,step,step_dots").split(",")
    rng = np.random.RandomState(0)

    calibrate()

    # vit: XLA bf16-scores path; vit_flash: Pallas per-group kernel (r5)
    for vit_probe in (p for p in probes if p in ("vit", "vit_flash")):
        flash = vit_probe == "vit_flash"
        score_dtype = None if flash else jnp.bfloat16
        vparams = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)["visual"]
        vis = prepare_vision_inputs(
            cfg, rng.randn(n_patches, cfg.vision.patch_dim).astype(np.float32), [grid])

        @jax.jit
        def vit(p, patches, cos, sin, seg):
            out = 0.0
            for _ in range(ACCUM):
                out = out + vision_forward(p, cfg.vision, patches, cos, sin, seg,
                                           group_size=grid[1] * grid[2],
                                           score_dtype=score_dtype,
                                           use_flash=flash).sum()
            return out

        args = (vparams, vis.patches, vis.cos, vis.sin, vis.seg_ids)
        measure(f"{vit_probe}_x4", lambda: np.asarray(vit(*args)))
        del vparams, vis, args, vit
        gc.collect()
        calibrate()

    if "llm" in probes:
        from livecc_tpu.models.qwen2_vl.text import text_forward
        import optax

        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)["text"]
        ids = jnp.asarray(rng.randint(8, cfg.text.vocab_size, size=(1, SEQ)), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(SEQ)[None, None], (3, 1, SEQ)).astype(jnp.int32)
        amask = jnp.ones((1, SEQ), bool)

        def llm_loss(tp, frozen_embed):
            embeds = frozen_embed["weight"][ids]
            hidden, _ = text_forward({**tp, "embed": frozen_embed}, cfg.text, embeds,
                                     pos, attention_mask=amask, use_flash=True,
                                     remat=True)
            return jnp.sum(hidden.astype(jnp.float32) ** 2) * 1e-9

        @jax.jit
        def llm(tp, emb):
            total, g_acc = 0.0, None
            for _ in range(ACCUM):
                val, g = jax.value_and_grad(llm_loss)(tp, emb)
                total = total + val
                g_acc = g if g_acc is None else jax.tree_util.tree_map(jnp.add, g_acc, g)
            return total + optax.global_norm(g_acc)

        tp = {k: v for k, v in params.items() if k != "embed"}
        emb = params["embed"]
        measure("llm_fwdbwd_x4", lambda: np.asarray(llm(tp, emb)))
        del params, tp, emb, llm
        gc.collect()
        calibrate()

    # ce: fp32 logit rows; ce_bf16: bf16 rows (r5 bandwidth fix, CE_LOGITS);
    # ce_fused: bf16 rows + custom_vjp grads-in-forward (r5 CE_IMPL default —
    # 3 matmul passes per chunk instead of the checkpoint path's 4)
    for ce_probe in (p for p in probes if p in ("ce", "ce_bf16", "ce_fused")):
        logit_dtype = None if ce_probe == "ce" else jnp.bfloat16
        ce_impl = "fused" if ce_probe == "ce_fused" else "scan"
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)["text"]
        kb = 5120
        hid = jnp.asarray(rng.randn(1, kb, cfg.text.hidden_size), jnp.bfloat16)
        lab = jnp.asarray(rng.randint(0, cfg.text.vocab_size, size=(1, kb)), jnp.int32)
        kernel = (params["lm_head"]["kernel"] if "lm_head" in params
                  else params["embed"]["weight"].T)

        def ce_loss(kernel, hid, lab):
            loss, _ = chunked_cross_entropy(hid, kernel, lab, chunk_size=1024,
                                            logit_dtype=logit_dtype, impl=ce_impl)
            return loss

        @jax.jit
        def ce(kernel, hid, lab):
            total, gn = 0.0, 0.0
            for _ in range(ACCUM):
                val, g = jax.value_and_grad(ce_loss, argnums=(0, 1))(kernel, hid, lab)
                total = total + val
                gn = gn + jnp.sum(g[0].astype(jnp.float32) ** 2)
            return total + gn * 1e-12

        measure(f"{ce_probe}_x4", lambda: np.asarray(ce(kernel, hid, lab)))
        del params, kernel, hid, lab, ce
        gc.collect()
        calibrate()

    if "opt" in probes:
        import optax

        tcfg = TrainConfig(total_steps=1000, adam_mu_dtype=jnp.bfloat16)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        opt = make_optimizer(tcfg)
        trainable, _ = split_frozen(params, tcfg.freeze_modules)
        opt_state = opt.init(trainable)

        @jax.jit
        def optp(opt_state, tr):
            g = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), tr)
            updates, opt_state = opt.update(g, opt_state, tr)
            tr = optax.apply_updates(tr, updates)
            return opt_state, tr, optax.global_norm(updates)

        def run():
            nonlocal opt_state, trainable
            opt_state, trainable, norm = optp(opt_state, trainable)
            np.asarray(norm)

        measure("opt_update", run)
        del params, trainable, opt_state, optp
        gc.collect()
        calibrate()

    # full-step probes; repeats allowed (A/B/A/B drift control), each with
    # fresh state, freed before the next
    import livecc_tpu.ops.attention as attn_mod

    step_kinds = {"step": (True, "splash"), "step_flash": (True, "flash"),
                  "step_dots": ("dots", "splash"),
                  "step_names": ("names", "splash"),
                  "step_names_mlp": ("names_mlp", "splash")}
    for idx, probe in enumerate(p for p in probes if p in step_kinds):
        remat, impl = step_kinds[probe]
        attn_mod.TRAIN_ATTN_IMPL = impl
        batch, sup_tokens, _ = build(cfg, grid)
        tcfg = TrainConfig(total_steps=1000, ce_chunk_size=1024, ce_sup_bucket=5120,
                           adam_mu_dtype=jnp.bfloat16, remat=remat)
        opt = make_optimizer(tcfg)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        opt_state = opt.init(split_frozen(params, tcfg.freeze_modules)[0])
        stf = jax.jit(make_train_step(cfg, tcfg, opt), donate_argnums=(0, 1))
        box = {"p": params, "o": opt_state}
        del params, opt_state

        def run():
            box["p"], box["o"], m = stf(box["p"], box["o"], batch)
            np.asarray(m["loss"])

        measure(f"{probe}#{idx}", run)
        del box, stf, batch
        gc.collect()
        calibrate()


if __name__ == "__main__":
    main()
