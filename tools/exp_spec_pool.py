"""Pool-level lookahead A/B at B=8 on the real chip (VERDICT r3 #7).

Round 3 measured fused lookahead a 14-21% LOSS at B=8 on random-weight
commentary (pool advances at min-over-rows acceptance) and a win solo.
This experiment measures the crossover and validates the adaptive
controller (engine/speculative.py:SpecController):

  configs x regimes, all in ONE chip session (A/B valid per CLAUDE.md):
    * plain        — spec=None
    * lookahead    — SpecConfig(adaptive=False)  (the r3 always-on mode)
    * adaptive     — SpecConfig()                (the new default)
  regimes:
    * hostile      — repetition_penalty 1.05 on random weights: greedy
      output is near-incompressible, n-gram drafts rarely hit
    * loop         — repetition_penalty 0.9 BOOSTS seen tokens: greedy
      chains lock into repeated phrases, the statistical shape of trained
      commentary (tools/exp_spec.py EXP_LOOP_REGIME, PERF.md r3)

Expected: adaptive ~= plain in hostile (controller self-disables after the
EMA converges) and ~= lookahead in loop (stays enabled). Prints one JSON
line per cell: steady tick wall p50 + controller state.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_spec_pool.py
Env: EXP_TICKS (default 24), EXP_STREAMS (default 8), EXP_MODEL (2b|tiny)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_cache")

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig, tiny_config
from livecc_tpu.data.tokenizer import ByteTokenizer
from livecc_tpu.engine import GenerationParams, LiveCCEngine, SpecConfig
from livecc_tpu.models.qwen2_vl.model import init_params
from livecc_tpu.serve.scheduler import StreamServer

TICKS = int(os.environ.get("EXP_TICKS", 24))
STREAMS = int(os.environ.get("EXP_STREAMS", 8))
MODEL = os.environ.get("EXP_MODEL", "2b")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def run_cell(params, cfg, frame_hw, spec, penalty, label):
    cache_dtype = jnp.int8 if jax.default_backend() == "tpu" else jnp.float32
    engine = LiveCCEngine(params, cfg, ByteTokenizer.for_config(cfg),
                          cache_len=8192, cache_dtype=cache_dtype, spec=spec)
    gen = GenerationParams(max_new_tokens=16, eos_token_id=cfg.eos_token_id,
                           pad_token_id=cfg.pad_token_id,
                           repetition_penalty=penalty)
    server = StreamServer(engine, gen, capacity=STREAMS)
    server.warmup([frame_hw])
    rng = np.random.RandomState(0)
    h, w = frame_hw
    frames = lambda n: rng.randint(0, 255, size=(n, h, w, 3), dtype=np.uint8)
    sids = [server.add_stream(frame_hw, query="Please describe the video.")
            for _ in range(STREAMS)]
    for sid in sids:
        server.submit_chunk(sid, frames(6), 0.0, 3.0)
    server.tick()
    t = 3.0
    for _ in range(3):                       # warm steady depth
        for sid in sids:
            server.submit_chunk(sid, frames(2), t, t + 1.0)
        server.tick()
        t += 1.0
    server.flush()
    [server.drain(sid) for sid in sids]
    walls = []
    for _ in range(TICKS):
        for sid in sids:
            server.submit_chunk(sid, frames(2), t, t + 1.0)
        t0 = time.perf_counter()
        server.tick()
        server.flush()                       # sync: honest per-tick wall
        walls.append(time.perf_counter() - t0)
        t += 1.0
    [server.drain(sid) for sid in sids]
    ctl = server._spec_ctl
    emit(cell=label, streams=STREAMS, ticks=TICKS,
         tick_wall_p50_ms=round(float(np.percentile(walls, 50)) * 1e3, 1),
         tick_wall_last8_p50_ms=round(float(np.percentile(walls[-8:], 50)) * 1e3, 1),
         spec_enabled_final=None if ctl is None else ctl.enabled,
         spec_ema=None if ctl is None or ctl.ema is None else round(ctl.ema, 3),
         tokens_per_window=engine.metrics.summary("spec_tokens_per_window").get("mean"))
    del server, engine
    import gc
    gc.collect()


def run_abab(params, cfg, frame_hw, penalty, label):
    """Interleaved per-tick A/B within ONE server lifetime: forces the
    adaptive controller plain/lookahead on alternating ticks, so both modes
    see the same warm programs, the same cache-depth trajectory, and the
    same chip drift — the honest pairwise comparison (per-cell medians in
    run_cell mix per-cell warmup tails with session drift; the first run's
    hostile cells disagreed with their own last-8 windows)."""
    cache_dtype = jnp.int8 if jax.default_backend() == "tpu" else jnp.float32
    engine = LiveCCEngine(params, cfg, ByteTokenizer.for_config(cfg),
                          cache_len=8192, cache_dtype=cache_dtype,
                          spec=SpecConfig())
    gen = GenerationParams(max_new_tokens=16, eos_token_id=cfg.eos_token_id,
                           pad_token_id=cfg.pad_token_id,
                           repetition_penalty=penalty)
    server = StreamServer(engine, gen, capacity=STREAMS)
    server.warmup([frame_hw])                 # compiles BOTH tick programs
    rng = np.random.RandomState(0)
    h, w = frame_hw
    frames = lambda n: rng.randint(0, 255, size=(n, h, w, 3), dtype=np.uint8)
    sids = [server.add_stream(frame_hw, query="Please describe the video.")
            for _ in range(STREAMS)]
    for sid in sids:
        server.submit_chunk(sid, frames(6), 0.0, 3.0)
    server.tick()
    t = 3.0
    ctl = server._ctl()
    for force in (False, True, False, True):  # warm both modes' steady state
        ctl.force = force
        for sid in sids:
            server.submit_chunk(sid, frames(2), t, t + 1.0)
        server.tick()
        server.flush()
        t += 1.0
    [server.drain(sid) for sid in sids]
    walls = {False: [], True: []}
    for i in range(2 * TICKS):
        force = bool(i % 2)
        ctl.force = force
        for sid in sids:
            server.submit_chunk(sid, frames(2), t, t + 1.0)
        t0 = time.perf_counter()
        server.tick()
        server.flush()
        walls[force].append(time.perf_counter() - t0)
        t += 1.0
    [server.drain(sid) for sid in sids]
    pair_delta = [s - p for p, s in zip(walls[False], walls[True])]
    emit(cell=label, streams=STREAMS, ticks_per_mode=TICKS,
         plain_p50_ms=round(float(np.percentile(walls[False], 50)) * 1e3, 1),
         spec_p50_ms=round(float(np.percentile(walls[True], 50)) * 1e3, 1),
         pairwise_spec_minus_plain_p50_ms=round(
             float(np.percentile(pair_delta, 50)) * 1e3, 1),
         spec_win_rate=round(float(np.mean([d < 0 for d in pair_delta])), 2),
         tokens_per_window=engine.metrics.summary("spec_tokens_per_window").get("mean"),
         adaptive_ema=None if ctl.ema is None else round(ctl.ema, 3))
    del server, engine
    import gc
    gc.collect()


def main():
    if MODEL == "2b":
        cfg, frame_hw = ModelConfig.qwen2_vl_2b(), (308, 560)
    else:
        cfg, frame_hw = tiny_config(), (56, 56)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = jax.block_until_ready(params)
    from livecc_tpu.utils.calibrate import calibrate_matmul
    if jax.default_backend() == "tpu":
        emit(probe="calibration", **calibrate_matmul())
    if os.environ.get("EXP_ABAB", "1") == "1":
        for penalty, regime in ((1.05, "hostile"), (0.9, "loop")):
            run_abab(params, cfg, frame_hw, penalty, f"abab/{regime}")
    else:
        cells = [
            ("plain", None),
            ("lookahead_pinned", SpecConfig(adaptive=False)),
            ("adaptive", SpecConfig()),
        ]
        for penalty, regime in ((1.05, "hostile"), (0.9, "loop")):
            for name, spec in cells:
                run_cell(params, cfg, frame_hw, spec, penalty, f"{regime}/{name}")
    if jax.default_backend() == "tpu":
        emit(probe="calibration", **calibrate_matmul())


if __name__ == "__main__":
    main()
