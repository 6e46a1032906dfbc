"""7B-on-v5e-8 memory budget: the serving plan is checked arithmetic.

SURVEY.md §7 hard part 5 — the reference runs the 7B on 80 GB GPUs
(demo/infer.py:43-47); on 16 GiB v5e chips the plan must be proven, not
assumed.
"""

import pytest

from livecc_tpu.core.config import ModelConfig, tiny_config
from livecc_tpu.parallel.memory import (
    GIB, count_params, kv_bytes_per_chip, serving_plan, weights_bytes_per_chip,
)


def test_7b_param_count():
    # Qwen2-VL-7B: ~8.29B params total (7.6B LLM + 0.68B ViT), ~16.6 GB bf16.
    n = count_params(ModelConfig.qwen2_vl_7b())
    assert 8.0e9 < n < 8.6e9
    total_bytes = n * 2
    # 15.4 GiB of bare weights on a 16 GiB chip: no room for KV + activations
    # (test_7b_single_chip_does_not_fit asserts the full budget).
    assert total_bytes > 15 * GIB


def test_7b_embed_bytes_hand_check():
    # Independent hand arithmetic for one leaf: embed = vocab x hidden.
    cfg = ModelConfig.qwen2_vl_7b()
    embed = cfg.text.vocab_size * cfg.text.hidden_size * 2
    assert embed == 152064 * 3584 * 2
    # TP shards embed along vocab: full weights/chip must drop by ~the
    # sharded fraction when TP goes 1 -> 4.
    w1 = weights_bytes_per_chip(cfg, n_model=1)
    w4 = weights_bytes_per_chip(cfg, n_model=4)
    assert w4 < w1 / 3  # most bytes are in sharded matmuls


def test_7b_single_chip_does_not_fit():
    plan = serving_plan(ModelConfig.qwen2_vl_7b(), n_model=1, streams=1, cache_len=32768)
    assert not plan.fits, plan.describe()


def test_7b_tp4_serves_8_streams():
    # The north-star config: 7B, TP=4 on v5e (28 q heads / 4, 4 KV heads / 4),
    # 8 concurrent streams at full 32k cache, bf16 KV.
    plan = serving_plan(ModelConfig.qwen2_vl_7b(), n_model=4, streams=8, cache_len=32768)
    assert plan.fits, plan.describe()
    # and with int8 KV the same slice holds >= 24 streams
    plan24 = serving_plan(ModelConfig.qwen2_vl_7b(), n_model=4, streams=24,
                          cache_len=32768, kv_dtype_bytes=1)
    assert plan24.fits, plan24.describe()


def test_7b_int8_weights_serve_at_tp2():
    # Weight-only int8 (ops/quant.py, param_dtype_bytes=1) halves weight
    # HBM: the 7B serving plan drops from TP=4 to TP=2 (8 streams, int8 KV).
    plan = serving_plan(ModelConfig.qwen2_vl_7b(), n_model=2, streams=8,
                        cache_len=32768, param_dtype_bytes=1, kv_dtype_bytes=1)
    assert plan.fits, plan.describe()
    # all-bf16 at TP=2 does NOT fit the same load — quantization buys it
    bf16 = serving_plan(ModelConfig.qwen2_vl_7b(), n_model=2, streams=8,
                        cache_len=32768)
    assert not bf16.fits, bf16.describe()


def test_tp_must_divide_heads():
    with pytest.raises(ValueError):
        serving_plan(ModelConfig.qwen2_vl_7b(), n_model=8, streams=1)  # 28 % 8 != 0


def test_2b_single_chip_fits():
    # bench.py's single-chip 2B serving config must fit by the same math.
    plan = serving_plan(ModelConfig.qwen2_vl_2b(), n_model=1, streams=8, cache_len=8192)
    assert plan.fits, plan.describe()


def test_kv_bytes_shard_with_tp():
    cfg = ModelConfig.qwen2_vl_7b()
    full = kv_bytes_per_chip(cfg, 1, 32768)
    # 28 layers x 2 x 4 heads x 32768 x 128 x 2B
    assert full == 28 * 2 * 4 * 32768 * 128 * 2
    assert kv_bytes_per_chip(cfg, 4, 32768) == full // 4
    # beyond Hk=4 the cache stops shrinking (replication floor)
    assert kv_bytes_per_chip(cfg, 28, 32768) == full // 4


def test_tiny_plan_smoke():
    plan = serving_plan(tiny_config(), n_model=2, streams=4, cache_len=256)
    assert plan.fits and plan.param_count > 0
    assert "fits" in plan.describe()


def test_training_plan_2b_dp8_fits():
    """The reference recipe's shape: 2B, frozen ViT, ZeRO-2 over 8 chips
    (scripts/deepspeed_zero2.json) fits v5e-8 with the bf16 first moment."""
    from livecc_tpu.parallel.memory import training_plan

    plan = training_plan(ModelConfig.qwen2_vl_2b(), n_data=8, mu_dtype_bytes=2)
    assert plan.fits, plan.describe()
    # frozen visual carries no optimizer state: trainable < total params
    from livecc_tpu.parallel.memory import count_params
    assert plan.trainable_params < count_params(ModelConfig.qwen2_vl_2b())


def test_training_plan_2b_single_chip_does_not_fit():
    """Matches the PERF.md observation: full-depth 2B training state (bf16
    params + fp32 grads + moments) exceeds one 16 GiB chip."""
    from livecc_tpu.parallel.memory import training_plan

    plan = training_plan(ModelConfig.qwen2_vl_2b(), n_data=1, mu_dtype_bytes=4)
    assert not plan.fits, plan.describe()


def test_training_plan_7b_needs_tp():
    from livecc_tpu.parallel.memory import training_plan

    dp8 = training_plan(ModelConfig.qwen2_vl_7b(), n_data=8)
    assert not dp8.fits, dp8.describe()         # 15.5 GB weights alone
    tp4 = training_plan(ModelConfig.qwen2_vl_7b(), n_data=2, n_model=4,
                        mu_dtype_bytes=2)
    assert tp4.fits, tp4.describe()


def test_streaming_horizon_matches_observed_exhaustion():
    """The 720p live grid fills a 16k bf16 pool in about a minute — the
    round-2 observed session ceiling; compaction makes it unbounded."""
    from livecc_tpu.parallel.memory import streaming_horizon

    grid = (1, 22, 40)                           # 720p live budget, 2 frames
    h = streaming_horizon(grid, cache_len=16384, start_len=1024)
    assert 40 < h.seconds_to_exhaustion < 90
    assert not h.unbounded
    hc = streaming_horizon(grid, cache_len=16384, start_len=1024,
                           compact_keep=8192)
    assert hc.unbounded
    assert hc.seconds_between_compactions > 25
    # sink+window too large for the pool -> still bounded
    hb = streaming_horizon(grid, cache_len=16384, start_len=1024,
                           compact_keep=16000)
    assert not hb.unbounded


# ---------------------------------------------------------------------------
# Measurement-derived 7B latency projection (VERDICT r3 weak #6 / next #5)
# ---------------------------------------------------------------------------

def test_7b_latency_projection_tp4_inside_budget():
    """Full-depth 7B under TP=4 from the MEASURED width slice: the per-chunk
    wall (prefill + 16 decode tokens) must sit far inside the 2 s budget —
    for the conservative envelope AND across the whole session band."""
    from livecc_tpu.parallel.memory import serving_latency, serving_latency_band

    cfg = ModelConfig.qwen2_vl_7b()
    proj = serving_latency(cfg, n_model=4)
    # envelope: (1.33 + 28*0.714)/4 + 2.16 overhead + 56*0.005 = 7.8 ms/token
    assert 3.0 < proj.decode_ms_per_token < 9.0, proj.describe()
    assert 5.0 < proj.prefill_chunk_ms < 30.0, proj.describe()
    assert proj.chunk_ms < 200.0, proj.describe()  # 10x inside 2 s
    fast, slow = serving_latency_band(cfg, n_model=4)
    assert fast.chunk_ms <= slow.chunk_ms
    assert slow.chunk_ms < 200.0, slow.describe()
    # the envelope point value must not be more optimistic than the band's
    # slowest session on decode (it is a per-field max)
    assert proj.decode_ms_per_token >= slow.decode_ms_per_token - 1e-9


def test_7b_latency_projection_reconstructs_slice():
    """The projection at TP=1 and the slice's own depths must agree: the
    model is (lm_head + overhead + L*per_layer), so plugging the slice
    depths back in reproduces the fused-loop sums the costs came from.
    Expected values are COMPUTED from the committed constants (not
    duplicated literals — ADVICE r4 low #4), so this asserts the algebraic
    identity that makes the projection falsifiable."""
    import dataclasses as dc

    from livecc_tpu.parallel.memory import MEASURED_7B_WIDTH, serving_latency

    cfg = ModelConfig.qwen2_vl_7b()
    c = MEASURED_7B_WIDTH
    for depth in (2, 4):
        sliced = dc.replace(cfg, text=dc.replace(cfg.text, num_hidden_layers=depth))
        proj = serving_latency(sliced, n_model=1)
        expect = c.lm_head_ms + c.overhead_ms + depth * c.per_layer_decode_b1_ms
        assert abs(proj.decode_ms_per_token - expect) < 1e-9
    # B=8 per-layer path selected by batch
    p8 = serving_latency(cfg, n_model=4, batch=8)
    p1 = serving_latency(cfg, n_model=4, batch=1)
    assert p8.decode_ms_per_token > p1.decode_ms_per_token
    assert MEASURED_7B_WIDTH.provenance in p8.describe()


def test_7b_latency_overhead_does_not_shard():
    """The unsharded overhead term must survive TP division: doubling TP
    must NOT halve decode latency (ADVICE r4 medium #2 — the old model
    divided sampling/dispatch by TP and was optimistic by ~2 ms/token)."""
    from livecc_tpu.parallel.memory import MEASURED_7B_WIDTH, serving_latency

    cfg = ModelConfig.qwen2_vl_7b()
    p2 = serving_latency(cfg, n_model=2, ici_allreduce_ms=0.0)
    p4 = serving_latency(cfg, n_model=4, ici_allreduce_ms=0.0)
    shardable = (MEASURED_7B_WIDTH.lm_head_ms
                 + cfg.text.num_hidden_layers * MEASURED_7B_WIDTH.per_layer_decode_b1_ms)
    assert abs((p2.decode_ms_per_token - p4.decode_ms_per_token)
               - (shardable / 2 - shardable / 4)) < 1e-9
    assert p4.decode_ms_per_token > shardable / 4  # overhead floor present


def test_7b_training_latency_reconstructs_slice():
    """TP=1 DP=1 projection is (remainder + L*per_layer): plugging the
    slice depths back in must reproduce the fused-step walls the constants
    were differenced from (expected values COMPUTED from the committed
    constants — the ADVICE r4 low #4 discipline)."""
    import dataclasses as dc

    from livecc_tpu.parallel.memory import MEASURED_7B_TRAIN, training_latency

    cfg = ModelConfig.qwen2_vl_7b()
    c = MEASURED_7B_TRAIN
    for depth in (1, 3):
        sliced = dc.replace(cfg, text=dc.replace(cfg.text, num_hidden_layers=depth))
        proj = training_latency(sliced)
        expect_s = (c.remainder_ms + depth * c.per_layer_step_ms) / 1e3
        assert abs(proj.step_s - expect_s) < 1e-9, proj.describe()
        assert proj.comm_s == 0.0
    full = training_latency(cfg)
    assert full.tokens_per_step == c.seq
    assert c.provenance in full.describe()
    # the best session ran AT the calibrated matmul ceiling (>= 1.0: the
    # FLOP model excludes the remat recompute tax); the committed envelope
    # may sit slightly below it (contended-host session)
    from livecc_tpu.parallel.memory import MEASURED_7B_TRAIN_SESSIONS

    assert max(s.vs_calibrated for s in MEASURED_7B_TRAIN_SESSIONS) >= 1.0
    assert c.vs_calibrated >= 0.9


def test_7b_training_latency_tp_dp_shape():
    """TP shards per-layer compute but NOT the remainder; comm terms are
    positive, labeled, and DP scales throughput sublinearly-but-nearly."""
    from livecc_tpu.parallel.memory import MEASURED_7B_TRAIN, training_latency

    cfg = ModelConfig.qwen2_vl_7b()
    c = MEASURED_7B_TRAIN
    L = cfg.text.num_hidden_layers
    tp1 = training_latency(cfg, n_model=1)
    tp4 = training_latency(cfg, n_model=4)
    # compute part of tp4 = remainder + L*per_layer/4, plus positive comm
    expect_compute = (c.remainder_ms + L * c.per_layer_step_ms / 4) / 1e3
    assert tp4.comm_s > 0.0
    assert abs(tp4.step_s - (expect_compute + tp4.comm_s)) < 1e-9
    assert tp4.step_s > tp1.step_s / 4          # remainder floor survives
    dp2 = training_latency(cfg, n_model=4, n_data=2)
    assert dp2.tokens_per_step == 2 * c.seq
    assert dp2.tokens_per_s > 1.5 * tp4.tokens_per_s   # near-linear DP
    # 8-chip reference plan (DP=2 x TP=4) must beat single-chip throughput
    assert dp2.tokens_per_s > training_latency(cfg).tokens_per_s
