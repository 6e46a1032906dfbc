"""North-star serving benchmark (+ training MFU): 8 concurrent 720p streams.

BASELINE.md targets: >=8 concurrent 1-fps 720p streams with p50 per-2-frame
commentary chunk latency < 2 s. Each tick, all 8 streams submit their next
2-frame chunk; the pipelined server executes them as batched prefill +
batched fused decode and the host drains tick N's text while tick N+1
computes. The metric is honest end-to-end latency (submit -> text drained);
real-time sustainability additionally requires tick wall < 1 s (reported in
the diagnostics).

Also times one compiled training step (2B, frozen ViT, grad accumulation,
8k-token bucket with a video span — the reference recipe's shape,
scripts/pt_local.sh:17-31) and reports tokens/s + MFU vs chip peak.

The LAST stdout line is the headline JSON:
  {"metric": "p50_chunk_latency_8streams_<cfg>_<backend>", "value": p50_s,
   "unit": "s", "vs_baseline": 2.0 / p50}
(vs_baseline > 1: faster than the 2 s budget; > 2: sustains real time.)
Earlier lines carry the training metric + diagnostics. Set BENCH_TRAIN=0 /
BENCH_SERVE=0 to skip a section.

Model: random-init Qwen2-VL-2B bf16 on TPU (largest family member fitting
one chip; the 7B runs the same programs under model-axis sharding — see
parallel/memory.py for the checked v5e-8 budget). CPU fallback uses the
tiny config (smoke only — this host is 1 throttled vCPU).
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

import os

# Persistent XLA compilation cache: TPU compiles through the relay cost
# 25-645 s per program (CLAUDE.md); with the cache, repeated bench runs
# re-execute in seconds and p99s stop counting compiles. SCOPED PER HOST
# CPU TYPE: stale XLA:CPU AOT blobs from another machine abort mid-run
# (utils/compile_cache.py) — this also overrides jax's default
# ~/.cache/jax, which has the same hazard.
from livecc_tpu.utils.compile_cache import enable_machine_scoped_cache

enable_machine_scoped_cache("/tmp/tpu_cache")

N_STREAMS = int(os.environ.get("BENCH_STREAMS", 8))
N_WARMUP = 2
# 30 timed ticks: the relay shows spontaneous ~20 s stalls at warm shapes
# (PERF.md); in a 10-tick phase one stall dominated the p50 (r3 final
# validation run), 30 ticks amortize it to a tail event.
N_TICKS = int(os.environ.get("BENCH_TICKS", 30))
# v5e bf16 peak; override for other chips (v4: 275, v5p: 459).
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))


def bench_train() -> dict:
    """One compiled train step at the reference recipe's shape; MFU report."""
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    from livecc_tpu.core.config import ModelConfig, tiny_config
    from livecc_tpu.models.qwen2_vl.model import init_params, prepare_vision_inputs
    from livecc_tpu.train import Batch, TrainConfig, make_optimizer, make_train_step, split_frozen
    from livecc_tpu.utils.flops import train_step_flops

    if on_tpu:
        # Full 2B layer widths, depth-reduced LLM: full-depth 2B training
        # state (bf16 params + fp32 grads + Adam moments) exceeds one 16 GiB
        # chip — by the same arithmetic as parallel/memory.py, training runs
        # ZeRO-2 over the data axis. Per-layer shapes (and therefore MFU)
        # are identical at any depth; full-depth tokens/s = this * depth/28.
        full = ModelConfig.qwen2_vl_2b()
        # depth 12, not 14: at depth 14 the fp32 grads + Adam moments put the
        # step exactly at the 16 GiB OOM edge — XLA sometimes fits it by
        # serializing (8.6-11.2 s/step across sessions), sometimes OOMs
        # outright depending on allocator state. Depth 12 + bf16 first
        # moment leaves real headroom, so the bench measures compute, not
        # the allocator. Per-layer shapes (hence MFU) are depth-invariant.
        depth = int(os.environ.get("BENCH_TRAIN_DEPTH", 12))
        cfg = dataclasses.replace(
            full,
            vision=dataclasses.replace(full.vision, depth=16),
            text=dataclasses.replace(full.text, num_hidden_layers=depth),
            name=f"{full.name}-d{depth}",
        )
        # flash training attention (Pallas fwd+bwd) materializes no [S, S]
        # tensors; the XLA fallback capped this bench at seq 4096.
        accum, seq = 4, int(os.environ.get("BENCH_TRAIN_SEQ", 8192))
        grid = (24, 16, 34)       # ~48 s of 2-fps video -> 3264 video tokens
        n_steps = 3
    else:
        cfg = tiny_config()
        accum, seq = 2, 256
        grid = (2, 4, 4)
        n_steps = 1

    n_patches = grid[0] * grid[1] * grid[2]
    n_vid = n_patches // 4
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    # CE runs only over supervised positions (gather-compacted): the bucket
    # covers the post-video span with one chunk of headroom. Adam's first
    # moment in bf16 (second stays fp32) frees ~1.8 GB on the single chip.
    tcfg = TrainConfig(total_steps=1000, ce_chunk_size=1024 if on_tpu else 128,
                       ce_sup_bucket=5120 if on_tpu else None,
                       adam_mu_dtype=jnp.bfloat16 if on_tpu else None)
    opt = make_optimizer(tcfg)
    opt_state = opt.init(split_frozen(params, tcfg.freeze_modules)[0])

    rng = np.random.RandomState(0)
    ids = rng.randint(8, cfg.text.vocab_size, size=(accum, 1, seq)).astype(np.int32)
    ids[:, :, 4] = cfg.vision_start_token_id
    ids[:, :, 5:5 + n_vid] = cfg.video_token_id
    ids[:, :, 5 + n_vid] = cfg.vision_end_token_id
    labels = ids.copy()
    sup_start = 5 + n_vid + 1
    labels[:, :, :sup_start] = -100       # only the post-video span supervised
    sup_tokens = seq - sup_start
    pos = np.broadcast_to(np.arange(seq)[None, None, None], (accum, 3, 1, seq)).astype(np.int32)
    vis = prepare_vision_inputs(
        cfg, rng.randn(n_patches, cfg.vision.patch_dim).astype(np.float32), [grid]
    )
    bcast = lambda x: jnp.broadcast_to(x, (accum,) + x.shape)
    batch = Batch(
        input_ids=jnp.asarray(ids), labels=jnp.asarray(labels),
        position_ids=jnp.asarray(np.ascontiguousarray(pos)),
        attention_mask=jnp.ones((accum, 1, seq), bool),
        vision_patches=bcast(vis.patches), vision_cos=bcast(vis.cos),
        vision_sin=bcast(vis.sin), vision_seg_ids=bcast(vis.seg_ids),
        vision_group=grid[1] * grid[2],
    )

    from livecc_tpu.utils.calibrate import calibrate_matmul
    cal = calibrate_matmul() if on_tpu else {"achieved_tflops": 0.0}

    step = jax.jit(make_train_step(cfg, tcfg, opt), donate_argnums=(0, 1))
    t0 = time.perf_counter()
    params, opt_state, metrics = step(params, opt_state, batch)
    loss = float(np.asarray(metrics["loss"]))   # force completion (CLAUDE.md)
    compile_s = time.perf_counter() - t0

    # Warm PAST the slow first executions: the first 1-2 runs after compile
    # measure ~3x the steady state (donated buffers still in init layout /
    # allocator defrag; tools/exp_mfu2.py r3: walls [6.88, 2.25, 2.25, ...]).
    # A training run's per-step cost is the steady state.
    for _ in range(2 if on_tpu else 0):
        params, opt_state, metrics = step(params, opt_state, batch)
        loss = float(np.asarray(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, metrics = step(params, opt_state, batch)
        loss = float(np.asarray(metrics["loss"]))
    wall = (time.perf_counter() - t0) / n_steps

    flops = train_step_flops(
        cfg, seq_len=seq, sup_tokens=sup_tokens, n_patches=n_patches,
        vit_group=grid[1] * grid[2], accum=accum, vit_frozen=True,
    )
    tokens_per_s = accum * seq / wall
    mfu = flops / wall / (PEAK_TFLOPS * 1e12)
    return {
        "metric": f"train_step_tokens_per_s_{cfg.name}_{backend}",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(mfu, 4),   # fraction of chip peak (MFU)
        "diagnostics": {
            "step_wall_s": round(wall, 4), "compile_s": round(compile_s, 1),
            "mfu": round(mfu, 4), "accum": accum, "seq": seq,
            "video_patches": n_patches, "supervised_tokens": sup_tokens,
            "loss": round(loss, 4), "peak_tflops": PEAK_TFLOPS,
            # chip-speed scale for cross-session comparison (the chip is
            # time-shared; see utils/calibrate.py)
            "calibration_tflops": cal["achieved_tflops"],
            "mfu_vs_calibrated": round(
                flops / wall / max(cal["achieved_tflops"], 1e-9) / 1e12, 4
            ) if on_tpu else 0.0,
        },
    }


def bench_serving() -> dict:
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    from livecc_tpu.core.config import ModelConfig, tiny_config
    from livecc_tpu.data.tokenizer import ByteTokenizer
    from livecc_tpu.engine import GenerationParams, LiveCCEngine
    from livecc_tpu.models.qwen2_vl.model import init_params
    from livecc_tpu.serve.scheduler import StreamServer

    if on_tpu:
        cfg = ModelConfig.qwen2_vl_2b()
        frame_hw = (308, 560)   # 720p after the live max_pixels budget (384*28*28)
        n_ticks = N_TICKS
    else:
        cfg = tiny_config()
        frame_hw = (56, 56)
        n_ticks = 3

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = jax.block_until_ready(params)
    from livecc_tpu.utils.calibrate import calibrate_matmul
    cal = calibrate_matmul() if on_tpu else {"achieved_tflops": 0.0}
    cache_len = int(os.environ.get("BENCH_CACHE_LEN", 8192))
    # int8 KV is the serving DEFAULT policy: halves KV HBM (capacity) and
    # measured faster than bf16 with lane-major scales (PERF.md round 2);
    # the horizon math (parallel/memory.py:streaming_horizon) and cache
    # compaction assume it. BENCH_KV=bf16 restores the old path.
    cache_dtype = {"int8": jnp.int8, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_KV", "int8" if on_tpu else "bf16")]
    # BENCH_SPEC=1: fused on-device lookahead decoding in the pool tick
    # (engine/speculative.py). Off by default pending the B=8 A/B: solo
    # measured -15%; pool acceptance is min-over-rows per window.
    spec = None
    if os.environ.get("BENCH_SPEC", "0") == "1":
        from livecc_tpu.engine import SpecConfig
        spec = SpecConfig()
    # int8 weights are the TPU serving default (PERF.md r5 soak A/B:
    # p50 1.26 s vs 1.73 s bf16); BENCH_W8=0/1 forces either side.
    w8 = {None: None, "0": False, "1": True}[os.environ.get("BENCH_W8")]
    engine = LiveCCEngine(
        params, cfg, ByteTokenizer.for_config(cfg), cache_len=cache_len,
        cache_dtype=cache_dtype, spec=spec, quantize_weights=w8,
    )
    gen = GenerationParams(
        max_new_tokens=16,
        eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id,
        repetition_penalty=1.05,
    )
    server = StreamServer(engine, gen, capacity=N_STREAMS)
    # pre-compile EVERYTHING a session at this resolution hits (solo init
    # path at the join cache length + batched pool programs) so no measured
    # phase ever contains an XLA compile (r2 weak #5: p99 lied)
    server.warmup([frame_hw])

    rng = np.random.RandomState(0)
    h, w = frame_hw
    frames = lambda n: rng.randint(0, 255, size=(n, h, w, 3), dtype=np.uint8)

    sids = [server.add_stream(frame_hw, query="Please describe the video.") for _ in range(N_STREAMS)]
    # init chunks (3 s window) — solo path, compiled by warmup
    for sid in sids:
        server.submit_chunk(sid, frames(6), 0.0, 3.0)
    server.tick()
    # steady-state warmup ticks (cache-depth effects, not compiles)
    t = 3.0
    for _ in range(N_WARMUP):
        for sid in sids:
            server.submit_chunk(sid, frames(2), t, t + 1.0)
        server.tick()
        t += 1.0
    server.flush()
    for sid in sids:
        server.drain(sid)
    # diagnostics describe ONLY the timed phase: init/warmup chunk_steps
    # and their (relay-variance-prone) walls are setup, not measurement
    engine.metrics.reset()

    # Timed phase: pipelined server — tick N's text is drained while tick
    # N+1 computes. Latency per chunk = submit -> drained; throughput =
    # chunks / wall. By default submissions are PACED at the real-time
    # cadence (one 2-frame chunk per second per stream, the product's
    # arrival pattern) so latency measures service time, not queueing;
    # BENCH_PACE=0 switches to back-to-back saturation (capacity probing —
    # then latency ~= 2x tick wall by Little's law).
    import sys

    pace = float(os.environ.get("BENCH_PACE", 1.0 if on_tpu else 0.0))
    submit_times: dict[float, float] = {}
    latencies: list[float] = []
    tick_wall: list[float] = []
    wall0 = time.perf_counter()
    for i in range(n_ticks + 1):          # +1 flush tick to drain the last batch
        if pace:
            target = wall0 + i * pace
            now = time.perf_counter()
            if now < target:
                time.sleep(target - now)
        if i < n_ticks:
            for sid in sids:
                server.submit_chunk(sid, frames(2), t, t + 1.0)
            submit_times[t] = time.perf_counter()
        t0 = time.perf_counter()
        server.tick()
        if i == n_ticks:
            server.flush()
        drained_at = time.perf_counter()
        tick_wall.append(drained_at - t0)
        for sid in sids:
            for (span0, _), _text in server.drain(sid, sync=False):
                latencies.append(drained_at - submit_times.get(span0, drained_at))
        t += 1.0
    total = time.perf_counter() - wall0
    throughput = len(latencies) / total

    # True end-to-end chunk latency: submit -> text surfaced (host prep +
    # dispatch + device compute + token fetch + detokenize), recorded by the
    # server against each chunk's submit wall-clock. Falls back to the older
    # dispatch->done metric, then to the loop's polled latencies.
    e2e = (engine.metrics.summary("chunk_submit_to_text")
           or engine.metrics.summary("chunk_e2e_latency"))
    p50 = e2e.get("p50", float(np.percentile(latencies, 50)))
    # metric name stays stable across rounds; the KV dtype (int8 default on
    # TPU since r3) is recorded in the diagnostics
    return {
        "metric": f"p50_chunk_latency_{N_STREAMS}streams_{cfg.name}_{backend}",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(2.0 / p50, 2),
        "diagnostics": {
            "p50_tick_wall_s": round(float(np.percentile(tick_wall, 50)), 4),
            "throughput_chunks_per_s": round(throughput, 2),
            "streams": N_STREAMS,
            "pace_s": pace,
            "kv_dtype": "int8" if cache_dtype == jnp.int8 else "bf16",
            "lookahead": spec is not None,
            "calibration_tflops": cal["achieved_tflops"],
            "engine_metrics": engine.metrics.summary(),
        },
    }


def kernel_parity_preamble() -> None:
    """On-chip parity asserts for the compiled serving kernels (VERDICT r3
    #6): bf16+int8, layered 5D cache, per-row offsets vs the XLA reference.
    Raises on breach; errors logged to stderr (and PERF.md per run)."""
    import sys

    import jax

    if jax.default_backend() != "tpu" or os.environ.get("BENCH_KERNEL_CHECK", "1") == "0":
        return
    from tools.check_serving_kernels_tpu import run_checks

    errs = run_checks()
    print(json.dumps({"diagnostics": {"kernel_parity_max_abs_err": errs}}),
          file=sys.stderr)
    sys.stderr.flush()


def bench_7b_slice() -> dict:
    """Depth-reduced slices at TRUE 7B width on the single chip (VERDICT r3 #5).

    The product model is 7B (reference demo/infer.py:43-47); this image has
    one chip, so 7B serving rides the TP=4 plan (parallel/memory.py). This
    measures the real per-layer decode/prefill cost at width — hidden 3584,
    28q/4kv GQA (head_dim 128), vocab 152064 — so the 28-layer projection is
    measurement-derived, not budget arithmetic. Per-layer cost comes from a
    TWO-DEPTH difference of FUSED decode loops, per_layer = (d4 - d2) / 2,
    which cancels every depth-independent term (152k-vocab head + embed +
    sampling + dispatch) without an un-fused probe (an un-fused lm_head
    probe is RTT-dominated through this relay and over-subtracts ~3x).
    """
    import jax
    import jax.numpy as jnp

    from livecc_tpu.models.qwen2_vl.model import init_params
    from tools.exp_7b_slice import time_decode, time_prefill, width7b

    steps = int(os.environ.get("BENCH_7B_STEPS", 24))
    meas = {}
    for depth in (2, 4):
        cfg = width7b(depth)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        params = jax.block_until_ready(params)
        meas[depth] = {
            "d1": time_decode(params, cfg, 8192, 1, steps),
            "d8": time_decode(params, cfg, 8192, 8, steps),
            "p256": time_prefill(params, cfg, 8192, 256, max(steps // 4, 4)),
        }
        del params

    per_layer_b1 = (meas[4]["d1"] - meas[2]["d1"]) / 2
    per_layer_b8 = (meas[4]["d8"] - meas[2]["d8"]) / 2
    per_layer_p256 = (meas[4]["p256"] - meas[2]["p256"]) / 2
    head_b1 = meas[2]["d1"] - 2 * per_layer_b1   # depth-independent remainder
    proj28_b1 = head_b1 + 28 * per_layer_b1
    proj28_tp4_b1 = proj28_b1 / 4                # TP=4 shards head + layers
    return {
        "metric": "7b_width_slice_decode_b1",
        "value": round(meas[2]["d1"] * 1e3, 3),
        "unit": "ms",
        "vs_baseline": 0.0,
        "diagnostics": {
            "depths": [2, 4],
            "decode_b1_ms": {d: round(m["d1"] * 1e3, 3) for d, m in meas.items()},
            "decode_b8_ms": {d: round(m["d8"] * 1e3, 3) for d, m in meas.items()},
            "prefill256_b1_ms": {d: round(m["p256"] * 1e3, 3) for d, m in meas.items()},
            "per_layer_decode_b1_ms": round(per_layer_b1 * 1e3, 3),
            "per_layer_decode_b8_ms": round(per_layer_b8 * 1e3, 3),
            "per_layer_prefill256_ms": round(per_layer_p256 * 1e3, 3),
            "depth_independent_decode_b1_ms": round(head_b1 * 1e3, 3),
            "proj_28layers_decode_b1_ms": round(proj28_b1 * 1e3, 2),
            "proj_28layers_tp4_decode_b1_ms": round(proj28_tp4_b1 * 1e3, 2),
        },
    }


def bench_7b_train_slice() -> dict:
    """Depth-differenced TRAINING cost at TRUE 7B width (VERDICT r4 #7).

    The reference's training proposition is the 7B (scripts/pt_local.sh:5);
    this measures the real fused (fwd + bwd + AdamW) per-layer cost at
    width — seq 8192, remat, bf16, chunked bf16-logit CE — as a two-depth
    difference so every depth-independent term (embed, 152k-vocab CE,
    dispatch) cancels. Feeds parallel/memory.py:MEASURED_7B_TRAIN /
    training_latency (the DP x TP projection). NOTE: the frozen embed/head
    ride as jit ARGUMENTS in the step (closure-captured, 2.18 GB of inline
    constants break the relay's remote_compile).
    """
    from livecc_tpu.utils.calibrate import calibrate_matmul
    from tools.exp_7b_train_slice import flop_model_per_layer, measure_depth

    from livecc_tpu.core.config import ModelConfig

    cal = calibrate_matmul()["achieved_tflops"]
    lo, hi = measure_depth(1), measure_depth(3)
    per_layer_s = (hi["median_s"] - lo["median_s"]) / 2
    seq = int(os.environ.get("EXP_SEQ", 8192))
    fl = flop_model_per_layer(ModelConfig.qwen2_vl_7b().text, seq)
    return {
        "metric": "7b_width_train_per_layer",
        "value": round(per_layer_s * 1e3, 2),
        "unit": "ms",
        "vs_baseline": 0.0,
        "diagnostics": {
            "cal_tflops": cal,
            "depths": [1, 3],
            "step_s": {1: lo["median_s"], 3: hi["median_s"]},
            "seq": seq,
            "remainder_ms": round((lo["median_s"] - per_layer_s) * 1e3, 1),
            "implied_tflops": round(fl / per_layer_s / 1e12, 1),
            "vs_calibrated": round(fl / per_layer_s / 1e12 / cal, 3),
            "proj_28layer_step_s_tp1": round(28 * per_layer_s, 3),
        },
    }


def main() -> None:
    """The LAST stdout line is the headline metric (driver parses last)."""
    import sys
    import traceback

    kernel_parity_preamble()

    def attempt(name, fn, out):
        """A failed OPTIONAL section logs to stderr and is dropped — it must
        never take the serving headline (the last stdout line) with it."""
        try:
            out.append(fn())
        except Exception:
            print(f"[bench] section {name} failed:", file=sys.stderr)
            traceback.print_exc()
            sys.stderr.flush()

    results = []
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        attempt("train", bench_train, results)
    on_tpu = __import__("jax").default_backend() == "tpu"
    if os.environ.get("BENCH_7B", "1" if on_tpu else "0") != "0":
        attempt("7b_slice", bench_7b_slice, results)
    if os.environ.get("BENCH_7B_TRAIN", "1" if on_tpu else "0") != "0":
        attempt("7b_train_slice", bench_7b_train_slice, results)
    if os.environ.get("BENCH_SERVE", "1") != "0":
        results.append(bench_serving())        # headline stays last
    for r in results:
        print(json.dumps({"diagnostics": {r["metric"]: r.pop("diagnostics")}}),
              file=sys.stderr)
        sys.stderr.flush()
    for r in results:
        print(json.dumps(r))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
