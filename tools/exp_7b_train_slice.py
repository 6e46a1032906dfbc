"""Depth-differenced TRUE-7B-width TRAINING cost on the single chip.

VERDICT r4 next #7: every committed training number is Qwen2-VL-2B
depth-12, but the reference's training proposition is the 7B
(scripts/pt_local.sh:5). This measures the real per-layer train-step cost
at width — hidden 3584, 28q/4kv (head_dim 128), intermediate 18944 —
as a two-depth difference of fused (fwd + bwd + AdamW) steps, exactly like
the serving slice (tools/exp_7b_slice.py): every depth-independent term
(embed, lm_head/CE, dispatch, relay RTT) cancels.

Fitting the 16 GiB chip at width means the embedding/vocab head cannot
carry optimizer state (fp32 grad + m + v on 2x 545 MB tensors is ~6.5 GB
before any layer): gradients are taken w.r.t. LAYER params only, embed /
lm_head ride as frozen constants. The differenced per-layer cost is
unaffected — those terms are depth-independent — and the full-model
optimizer step is measured separately at 2B (exp_mfu2 `opt`).

Per-layer FLOP model (seq S, matmul-only):
  fwd  = 2*S*P_layer + 4*S^2*hidden   (P_layer = attn+MLP params; flash attn)
  step = 3x fwd (bwd = 2x fwd) + remat recompute tax
Reported as measured ms/layer plus implied TF/s against that model.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_COMPILATION_CACHE_DIR=/tmp/tpu_cache python tools/exp_7b_train_slice.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.models.qwen2_vl.text import init_text_params, text_forward
from livecc_tpu.ops.chunked_ce import chunked_cross_entropy

SEQ = int(os.environ.get("EXP_SEQ", 8192))
SUP = int(os.environ.get("EXP_SUP", 4096))   # supervised-token bucket
REPS = int(os.environ.get("EXP_REPS", 3))


def emit(o):
    print(json.dumps(o), flush=True)


def build_step(cfg: ModelConfig, params_text):
    """Fused train step over LAYER params only (embed/head frozen consts)."""
    tcfg_lr = 2e-5
    opt = optax.adamw(tcfg_lr, b1=0.9, b2=0.95, mu_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    hi = min(10000, cfg.text.vocab_size)   # tiny-config CPU smoke stays in-vocab
    ids = jnp.asarray(rng.randint(8, hi, size=(1, SEQ)), jnp.int32)
    labels = np.full((1, SEQ), -100, np.int32)
    sup_idx = rng.choice(SEQ - 1, size=SUP, replace=False)
    labels[0, sup_idx] = rng.randint(8, hi, size=SUP)
    labels = jnp.asarray(labels)
    pos = jnp.broadcast_to(jnp.arange(SEQ)[None, None], (3, 1, SEQ)).astype(jnp.int32)
    amask = jnp.ones((1, SEQ), bool)

    frozen = {k: v for k, v in params_text.items() if k in ("embed", "lm_head", "final_ln")}
    layers = {k: v for k, v in params_text.items() if k not in frozen}

    use_flash = jax.default_backend() == "tpu"   # CPU smoke path in tests

    # `frozen` (embed + head, ~2.2 GB at 7B width) MUST ride as a jit
    # ARGUMENT: closure-captured it lowers as 2.18 GB of inline constants,
    # which the axon relay's remote_compile cannot ship (broken pipe).
    def loss_fn(layer_params, frozen):
        hidden, _ = text_forward({**frozen, **layer_params}, cfg.text,
                                 frozen["embed"]["weight"][ids], pos,
                                 attention_mask=amask, use_flash=use_flash,
                                 remat=True)
        kernel = (frozen["lm_head"]["kernel"] if "lm_head" in frozen
                  else frozen["embed"]["weight"].T)
        # fused custom_vjp CE matches the r5 train-step default; the head is
        # frozen here so its grad pass is skipped too (kernel_grad=False).
        # EXP_CE=scan A/Bs the checkpoint-recompute path.
        loss, count = chunked_cross_entropy(
            hidden, kernel, labels, chunk_size=1024, logit_dtype=jnp.bfloat16,
            impl=os.environ.get("EXP_CE", "fused"), kernel_grad=False)
        return loss / jnp.maximum(count, 1)

    opt_state = opt.init(layers)

    @jax.jit
    def step(layer_params, opt_state, frozen):
        loss, g = jax.value_and_grad(loss_fn)(layer_params, frozen)
        updates, opt_state = opt.update(g, opt_state, layer_params)
        layer_params = optax.apply_updates(layer_params, updates)
        return layer_params, opt_state, loss, optax.global_norm(updates)

    def bound_step(layer_params, opt_state, _frozen=frozen):
        return step(layer_params, opt_state, _frozen)

    bound_step.jit_step = step      # raw jit, for lowering inspection (tests)
    bound_step.frozen = frozen
    return bound_step, layers, opt_state


def measure_depth(depth: int) -> dict:
    import dataclasses

    full = ModelConfig.qwen2_vl_7b()
    cfg = dataclasses.replace(
        full,
        text=dataclasses.replace(full.text, num_hidden_layers=depth),
        name=f"qwen2-vl-7b-w-d{depth}",
    )
    params_text = jax.block_until_ready(
        init_text_params(cfg.text, jax.random.PRNGKey(0), dtype=jnp.bfloat16))
    step, layers, opt_state = build_step(cfg, params_text)
    t0 = time.perf_counter()
    layers, opt_state, loss, gn = step(layers, opt_state)
    np.asarray(loss)
    compile_s = time.perf_counter() - t0
    # post-compile transient (PERF.md r3): discard one execution
    layers, opt_state, loss, gn = step(layers, opt_state)
    np.asarray(loss)
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        layers, opt_state, loss, gn = step(layers, opt_state)
        np.asarray(gn)   # consume updates so bwd/opt cannot be DCE'd
        walls.append(time.perf_counter() - t0)
    r = {"probe": f"train7b_d{depth}", "compile_s": round(compile_s, 1),
         "walls": [round(w, 4) for w in walls],
         "median_s": round(float(np.median(walls)), 4),
         "loss": round(float(loss), 3)}
    emit(r)
    del layers, opt_state, step, params_text
    import gc
    gc.collect()
    return r


def flop_model_per_layer(cfg_text, seq: int) -> float:
    h = cfg_text.hidden_size
    kvh = cfg_text.num_key_value_heads * cfg_text.head_dim
    p_layer = h * (h + 2 * kvh + h) + 3 * h * cfg_text.intermediate_size
    fwd = 2 * seq * p_layer + 4 * seq * seq * h
    return 3.0 * fwd   # fwd + 2x bwd (remat tax excluded -> conservative TF/s)


def main():
    assert jax.default_backend() == "tpu"
    from livecc_tpu.utils.calibrate import calibrate_matmul

    cal = calibrate_matmul()["achieved_tflops"]
    emit({"probe": "cal", "achieved_tflops": round(cal, 1)})
    d_lo = int(os.environ.get("EXP_D_LO", 1))
    d_hi = int(os.environ.get("EXP_D_HI", 3))
    lo = measure_depth(d_lo)
    hi = measure_depth(d_hi)
    per_layer_s = (hi["median_s"] - lo["median_s"]) / (d_hi - d_lo)
    cfg_text = ModelConfig.qwen2_vl_7b().text
    fl = flop_model_per_layer(cfg_text, SEQ)
    emit({"probe": "train7b_per_layer",
          "depths": [d_lo, d_hi],
          "per_layer_ms": round(per_layer_s * 1e3, 2),
          "seq": SEQ, "sup": SUP,
          "flop_model_per_layer_tflop": round(fl / 1e12, 3),
          "implied_tflops": round(fl / per_layer_s / 1e12, 1),
          "vs_calibrated": round(fl / per_layer_s / 1e12 / cal, 3),
          "proj_28layer_step_s_tp1": round(28 * per_layer_s, 3)})


if __name__ == "__main__":
    from livecc_tpu.utils.compile_cache import enable_machine_scoped_cache

    enable_machine_scoped_cache()
    main()
