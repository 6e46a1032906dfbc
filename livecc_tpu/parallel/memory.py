"""Serving/training HBM budget math for the (data, model) mesh.

Encodes the 7B-on-v5e-8 plan as *checked arithmetic* (SURVEY.md §7 hard
part 5: "weights bf16 ~15.5 GB + growing KV x 8 streams => needs model-axis
sharding and KV budget math from day one"). The reference never states this
budget; it inherits it implicitly from 80 GB GPUs (reference README.md:62,
demo/infer.py:43-47 loads the full 7B on one device).

Per-chip weight bytes are derived from the REAL partition specs
(``parallel.sharding.param_pspecs``) applied to the REAL parameter shapes
(``jax.eval_shape`` over ``init_params``) — the plan cannot drift from the
implementation.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.core.mesh import MODEL_AXIS

V5E_HBM_GIB = 16.0
GIB = 1024**3


def param_shapes(cfg: ModelConfig):
    """ShapeDtypeStruct tree of the model parameters (no allocation)."""
    from livecc_tpu.models.qwen2_vl.model import init_params

    return jax.eval_shape(
        lambda: init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )


def count_params(cfg: ModelConfig) -> int:
    return sum(math.prod(s.shape) for s in jax.tree_util.tree_leaves(param_shapes(cfg)))


def weights_bytes_per_chip(cfg: ModelConfig, n_model: int, dtype_bytes: int = 2) -> int:
    """Per-chip parameter bytes under the actual TP partition specs."""
    from livecc_tpu.parallel.sharding import param_pspecs

    shapes = param_shapes(cfg)
    specs = param_pspecs(shapes)

    def per_chip(s, spec) -> int:
        n = math.prod(s.shape) * dtype_bytes
        for axes in spec:
            if axes == MODEL_AXIS or (isinstance(axes, tuple) and MODEL_AXIS in axes):
                return -(-n // n_model)
        return n

    return sum(jax.tree_util.tree_leaves(jax.tree_util.tree_map(per_chip, shapes, specs)))


def kv_bytes_per_chip(
    cfg: ModelConfig, n_model: int, cache_len: int, dtype_bytes: int = 2
) -> int:
    """One stream's KV cache bytes on one chip.

    Cache layout [L, B, Hk, S, D]; under TP the Hk axis shards down to at
    best one KV head per chip (7B: Hk=4, so TP=4 gives 1 head/chip; beyond
    that the cache replicates).
    """
    t = cfg.text
    heads_per_chip = max(-(-t.num_key_value_heads // n_model), 1)
    return t.num_hidden_layers * 2 * heads_per_chip * cache_len * t.head_dim * dtype_bytes


@dataclasses.dataclass(frozen=True)
class ServingPlan:
    """HBM budget for serving `streams` concurrent streams under TP."""

    cfg_name: str
    n_model: int
    streams: int
    cache_len: int
    param_count: int
    weights_bytes: int            # per chip
    kv_bytes_per_stream: int      # per chip
    activation_reserve_bytes: int
    hbm_bytes: int                # per chip

    @property
    def total_bytes(self) -> int:
        return (self.weights_bytes + self.streams * self.kv_bytes_per_stream
                + self.activation_reserve_bytes)

    @property
    def headroom_bytes(self) -> int:
        return self.hbm_bytes - self.total_bytes

    @property
    def fits(self) -> bool:
        return self.headroom_bytes >= 0

    def describe(self) -> str:
        g = lambda n: f"{n / GIB:.2f} GiB"
        return (
            f"{self.cfg_name} TP={self.n_model} streams={self.streams} "
            f"cache={self.cache_len}: weights/chip {g(self.weights_bytes)} + "
            f"KV {g(self.streams * self.kv_bytes_per_stream)} + reserve "
            f"{g(self.activation_reserve_bytes)} = {g(self.total_bytes)} of "
            f"{g(self.hbm_bytes)} ({'fits' if self.fits else 'DOES NOT FIT'}, "
            f"headroom {g(self.headroom_bytes)})"
        )


def serving_plan(
    cfg: ModelConfig,
    *,
    n_model: int,
    streams: int,
    cache_len: int = 32768,
    param_dtype_bytes: int = 2,
    kv_dtype_bytes: int = 2,
    hbm_gib: float = V5E_HBM_GIB,
    activation_reserve_gib: float = 1.0,
) -> ServingPlan:
    """Checked serving budget. Raises on a TP degree the head layout cannot
    honor (attention shards along heads; 7B has 28 q / 4 KV heads)."""
    t = cfg.text
    if t.num_attention_heads % n_model != 0:
        raise ValueError(
            f"TP={n_model} does not divide {t.num_attention_heads} attention heads"
        )
    return ServingPlan(
        cfg_name=cfg.name,
        n_model=n_model,
        streams=streams,
        cache_len=cache_len,
        param_count=count_params(cfg),
        weights_bytes=weights_bytes_per_chip(cfg, n_model, param_dtype_bytes),
        kv_bytes_per_stream=kv_bytes_per_chip(cfg, n_model, cache_len, kv_dtype_bytes),
        activation_reserve_bytes=int(activation_reserve_gib * GIB),
        hbm_bytes=int(hbm_gib * GIB),
    )


# ---------------------------------------------------------------------------
# Training budget (ZeRO-2 over the data axis) — VERDICT r2 missing #2
# ---------------------------------------------------------------------------

def trainable_param_shapes(cfg: ModelConfig, freeze_modules=("visual",)):
    shapes = param_shapes(cfg)
    return {k: v for k, v in shapes.items() if k not in freeze_modules}


def _zero2_bytes_per_chip(shapes, n_data: int, dtype_bytes: int) -> int:
    """Per-chip bytes of a ZeRO-2-sharded state tree under the REAL
    ``parallel.sharding.zero2_pspecs`` rule (largest data-divisible dim;
    non-divisible leaves replicate)."""
    from livecc_tpu.parallel.sharding import zero2_pspecs

    specs = zero2_pspecs(shapes, n_data)

    def per_chip(s, spec) -> int:
        n = math.prod(s.shape) * dtype_bytes
        return -(-n // n_data) if any(a is not None for a in spec) else n

    return sum(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(per_chip, shapes, specs)))


@dataclasses.dataclass(frozen=True)
class TrainingPlan:
    """Per-chip HBM budget of one ZeRO-2(+TP) train step.

    Mirrors the reference's DeepSpeed stage-2 memory proposition
    (scripts/deepspeed_zero2.json:12-21): bf16 params replicated along
    data, fp32 grad accumulators + Adam moments sharded along data.
    """

    cfg_name: str
    n_data: int
    n_model: int
    trainable_params: int
    weights_bytes: int            # all params, bf16, per chip (TP-sharded)
    grads_bytes: int              # fp32 accumulators, ZeRO-sharded, per chip
    adam_m_bytes: int             # first moment (mu dtype), per chip
    adam_v_bytes: int             # second moment fp32, per chip
    activation_reserve_bytes: int
    hbm_bytes: int

    @property
    def total_bytes(self) -> int:
        return (self.weights_bytes + self.grads_bytes + self.adam_m_bytes
                + self.adam_v_bytes + self.activation_reserve_bytes)

    @property
    def headroom_bytes(self) -> int:
        return self.hbm_bytes - self.total_bytes

    @property
    def fits(self) -> bool:
        return self.headroom_bytes >= 0

    def describe(self) -> str:
        g = lambda n: f"{n / GIB:.2f} GiB"
        return (
            f"{self.cfg_name} train DP={self.n_data} TP={self.n_model}: "
            f"weights/chip {g(self.weights_bytes)} + grads {g(self.grads_bytes)} "
            f"+ adam_m {g(self.adam_m_bytes)} + adam_v {g(self.adam_v_bytes)} "
            f"+ reserve {g(self.activation_reserve_bytes)} = {g(self.total_bytes)} "
            f"of {g(self.hbm_bytes)} ({'fits' if self.fits else 'DOES NOT FIT'}, "
            f"headroom {g(self.headroom_bytes)})"
        )


def training_plan(
    cfg: ModelConfig,
    *,
    n_data: int,
    n_model: int = 1,
    freeze_modules: tuple = ("visual",),
    param_dtype_bytes: int = 2,
    mu_dtype_bytes: int = 4,            # 2 with TrainConfig.adam_mu_dtype=bf16
    hbm_gib: float = V5E_HBM_GIB,
    activation_reserve_gib: float = 2.0,
) -> TrainingPlan:
    """Checked ZeRO-2 training budget (per chip). Frozen modules carry no
    grads/moments (train/step.py:split_frozen, the DeepSpeed behavior)."""
    t = cfg.text
    if t.num_attention_heads % n_model != 0:
        raise ValueError(
            f"TP={n_model} does not divide {t.num_attention_heads} attention heads"
        )
    trainable = trainable_param_shapes(cfg, freeze_modules)
    n_trainable = sum(math.prod(s.shape) for s in jax.tree_util.tree_leaves(trainable))
    # TP splits the per-chip trainable tree before ZeRO shards the states;
    # approximate the composition by dividing the ZeRO-sharded bytes by the
    # TP factor for TP>1 (matmul weights dominate and are TP-divisible).
    tp = max(n_model, 1)
    return TrainingPlan(
        cfg_name=cfg.name,
        n_data=n_data,
        n_model=n_model,
        trainable_params=n_trainable,
        weights_bytes=weights_bytes_per_chip(cfg, n_model, param_dtype_bytes),
        grads_bytes=_zero2_bytes_per_chip(trainable, n_data, 4) // tp,
        adam_m_bytes=_zero2_bytes_per_chip(trainable, n_data, mu_dtype_bytes) // tp,
        adam_v_bytes=_zero2_bytes_per_chip(trainable, n_data, 4) // tp,
        activation_reserve_bytes=int(activation_reserve_gib * GIB),
        hbm_bytes=int(hbm_gib * GIB),
    )


# ---------------------------------------------------------------------------
# Serving latency projection from real-chip measurement — VERDICT r3 weak #6
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MeasuredLayerCosts:
    """Per-layer serving costs measured on a real chip at TRUE model width.

    Produced by ``bench.py:bench_7b_slice``: fused decode/prefill loops at
    two depths of the width-exact model, differenced so every
    depth-independent term (152k-vocab head, embed, sampling, dispatch,
    relay RTT) cancels. The depth-independent decode term is split into
    ``lm_head_ms`` — the 152k-vocab head read, which DOES shard 1/TP under
    the megatron vocab layout — and ``overhead_ms`` — sampling /
    repetition-penalty over [B, vocab_local... then gathered], dispatch and
    fused-loop glue, which does NOT shard (ADVICE r4 medium #2). The
    prefill remainder is NOT carried because the probe's per-rep cache
    allocation + full-logits fetch contaminate it — the real serving loop
    keeps both on device.
    """

    per_layer_decode_b1_ms: float
    per_layer_decode_b8_ms: float
    per_layer_prefill256_ms: float
    lm_head_ms: float              # depth-independent, TP-shardable head read
    overhead_ms: float             # depth-independent, does NOT shard with TP
    provenance: str

    @property
    def decode_remainder_ms(self) -> float:
        """Total depth-independent decode term (back-compat view)."""
        return self.lm_head_ms + self.overhead_ms


# 152064-row x 3584-col bf16 head = 1.09 GB read at the v5e's 819 GB/s HBM.
# Bandwidth-derived (not differenced out of a session), so it is the same
# in every session row below; the session noise lands in overhead_ms.
_LM_HEAD_BW_MS = 1.33

# bench_7b_slice on the v5e chip, depths (2, 4), kv_depth 4096 of an 8192
# cache — ONE ROW PER SESSION. The chip is time-shared and the two
# same-day sessions below disagree by +30% on per-layer decode and 2.5x on
# the (noise-dominated, ~2 ms signal differenced from ~57 ms walls)
# prefill constant, so single-session constants are NOT drift-invariant
# (ADVICE r4 medium #1). Projections should quote the band across
# sessions; the committed point value is the conservative per-field
# envelope (max) over all sessions.
MEASURED_7B_WIDTH_SESSIONS: tuple[MeasuredLayerCosts, ...] = (
    MeasuredLayerCosts(
        per_layer_decode_b1_ms=0.550,   # ≈800 GB/s = 98% of v5e HBM
        per_layer_decode_b8_ms=0.823,
        per_layer_prefill256_ms=2.146,
        lm_head_ms=_LM_HEAD_BW_MS,
        overhead_ms=3.49 - _LM_HEAD_BW_MS,
        provenance="7b_width_slice 2026-08-19 session A (tools/exp_7b_slice)",
    ),
    MeasuredLayerCosts(
        per_layer_decode_b1_ms=0.714,
        per_layer_decode_b8_ms=0.825,
        per_layer_prefill256_ms=0.872,
        lm_head_ms=_LM_HEAD_BW_MS,
        overhead_ms=2.639 - _LM_HEAD_BW_MS,
        provenance="7b_width_slice 2026-08-19 session B (BENCH_r04 driver run)",
    ),
)

# Conservative envelope: per-field max across sessions. Decode per-layer
# stays bandwidth-bound in every session (800-630 GB/s effective), but the
# absolute number carries the time-shared chip's session noise — use
# serving_latency_band for an honest range.
MEASURED_7B_WIDTH = MeasuredLayerCosts(
    per_layer_decode_b1_ms=max(s.per_layer_decode_b1_ms for s in MEASURED_7B_WIDTH_SESSIONS),
    per_layer_decode_b8_ms=max(s.per_layer_decode_b8_ms for s in MEASURED_7B_WIDTH_SESSIONS),
    per_layer_prefill256_ms=max(s.per_layer_prefill256_ms for s in MEASURED_7B_WIDTH_SESSIONS),
    lm_head_ms=_LM_HEAD_BW_MS,
    overhead_ms=max(s.overhead_ms for s in MEASURED_7B_WIDTH_SESSIONS),
    provenance=(
        f"envelope (per-field max) of {len(MEASURED_7B_WIDTH_SESSIONS)} "
        "real-chip sessions, 2026-08-19"
    ),
)


@dataclasses.dataclass(frozen=True)
class LatencyProjection:
    """Measurement-derived per-chunk serving latency under TP."""

    cfg_name: str
    n_model: int
    decode_ms_per_token: float     # per decoded token, all streams advance
    prefill_chunk_ms: float        # one ~256-token chunk (2-frame group + text)
    decode_steps: int
    costs: MeasuredLayerCosts

    @property
    def chunk_ms(self) -> float:
        return self.prefill_chunk_ms + self.decode_steps * self.decode_ms_per_token

    def describe(self) -> str:
        return (
            f"{self.cfg_name} TP={self.n_model}: decode "
            f"{self.decode_ms_per_token:.2f} ms/tok, chunk prefill "
            f"{self.prefill_chunk_ms:.1f} ms, per-chunk "
            f"({self.decode_steps} tokens) {self.chunk_ms:.1f} ms "
            f"[{self.costs.provenance}]"
        )


def serving_latency(
    cfg: ModelConfig,
    costs: MeasuredLayerCosts = MEASURED_7B_WIDTH,
    *,
    n_model: int,
    batch: int = 1,
    decode_steps: int = 16,
    ici_allreduce_ms: float = 0.005,
) -> LatencyProjection:
    """Project full-depth serving latency from measured per-layer costs.

    Layers and the vocab head shard 1/TP (megatron layout:
    ``parallel.sharding.param_pspecs``); ``overhead_ms`` (sampling,
    dispatch, fused-loop glue) does NOT shard and is carried at full cost
    (ADVICE r4 medium #2). TP adds two all-reduces per layer; at decode
    they move [B, 1, hidden] over ICI (~7 KB for the 7B at B=1) — sub-10 µs
    each. NOTE: the ICI term is an engineering estimate, not a
    measurement — no virtual mesh can validate it; it is carried explicitly
    so the model is falsifiable rather than silently absorbed.
    """
    layers = cfg.text.num_hidden_layers
    per_layer = (costs.per_layer_decode_b8_ms if batch >= 8
                 else costs.per_layer_decode_b1_ms)
    comm = (2 * layers * ici_allreduce_ms) if n_model > 1 else 0.0
    decode = ((costs.lm_head_ms + layers * per_layer) / n_model
              + costs.overhead_ms + comm)
    prefill = layers * costs.per_layer_prefill256_ms / n_model + comm
    return LatencyProjection(
        cfg_name=cfg.name, n_model=n_model,
        decode_ms_per_token=decode, prefill_chunk_ms=prefill,
        decode_steps=decode_steps, costs=costs,
    )


def serving_latency_band(
    cfg: ModelConfig,
    *,
    n_model: int,
    batch: int = 1,
    decode_steps: int = 16,
) -> tuple[LatencyProjection, LatencyProjection]:
    """(fastest, slowest) projection across every measured session —
    the honest uncertainty band for the time-shared chip's session noise
    (ADVICE r4 medium #1)."""
    projs = [
        serving_latency(cfg, s, n_model=n_model, batch=batch,
                        decode_steps=decode_steps)
        for s in MEASURED_7B_WIDTH_SESSIONS
    ]
    projs.sort(key=lambda p: p.chunk_ms)
    return projs[0], projs[-1]


# ---------------------------------------------------------------------------
# Training latency projection from real-chip measurement — VERDICT r4 next #7
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MeasuredTrainCosts:
    """Per-layer TRAIN-step cost measured at true 7B width on the real chip.

    Produced by ``tools/exp_7b_train_slice.py``: fused (fwd + bwd + AdamW)
    steps at two text depths of the width-exact model (hidden 3584, 28q/4kv,
    intermediate 18944), seq 8192, remat on, bf16 params, chunked
    bf16-logit CE — differenced so every depth-independent term (embed,
    152k-vocab CE, dispatch, relay RTT) cancels. ``remainder_ms`` is the
    depth-independent residual (d_lo wall − d_lo·per_layer): dominated by
    the 152k-vocab chunked CE fwd+bwd, which DOES shard under the megatron
    vocab layout, plus dispatch/opt glue, which does not. The split was not
    measured, so projections carry the remainder UNSHARDED (conservative —
    the same discipline as MeasuredLayerCosts.overhead_ms).
    """

    per_layer_step_ms: float       # fwd+bwd+AdamW, one decoder layer
    remainder_ms: float            # depth-independent (CE + embed + glue)
    seq: int                       # tokens per step the costs were timed at
    measured_tflops: float         # implied by the matmul-only FLOP model
    vs_calibrated: float           # against the same-session matmul ceiling
    provenance: str


# tools/exp_7b_train_slice.py on the v5e chip, depths (1, 3), seq 8192,
# sup 4096 — ONE ROW PER SESSION (the chip is time-shared; the same
# discipline as MEASURED_7B_WIDTH_SESSIONS). The implied per-layer compute
# runs at ~0.96-1.06x the matmul-only FLOP model's ceiling (the model
# excludes the remat recompute tax, so ~1.0 means the step executes AT the
# chip's delivered matmul rate). Frozen embed/head MUST ride as jit
# arguments (closure-captured they break the relay's remote_compile).
MEASURED_7B_TRAIN_SESSIONS: tuple[MeasuredTrainCosts, ...] = (
    MeasuredTrainCosts(
        per_layer_step_ms=123.1,
        remainder_ms=319.4 - 123.1,    # d1 wall − 1·per_layer
        seq=8192,
        measured_tflops=116.5,
        vs_calibrated=1.064,
        provenance="7b_train_slice 2026-08-19 session A (cal 109.5 TF/s)",
    ),
    MeasuredTrainCosts(
        per_layer_step_ms=136.5,
        remainder_ms=319.0 - 136.5,
        seq=8192,
        measured_tflops=105.1,
        vs_calibrated=0.96,            # suite compiles loaded the host
        provenance="7b_train_slice 2026-08-19 session B (bench.py, contended host)",
    ),
)

# Conservative envelope (per-field max on costs; min on achieved rate).
MEASURED_7B_TRAIN = MeasuredTrainCosts(
    per_layer_step_ms=max(s.per_layer_step_ms for s in MEASURED_7B_TRAIN_SESSIONS),
    remainder_ms=max(s.remainder_ms for s in MEASURED_7B_TRAIN_SESSIONS),
    seq=8192,
    measured_tflops=min(s.measured_tflops for s in MEASURED_7B_TRAIN_SESSIONS),
    vs_calibrated=min(s.vs_calibrated for s in MEASURED_7B_TRAIN_SESSIONS),
    provenance=(
        f"envelope (per-field max) of {len(MEASURED_7B_TRAIN_SESSIONS)} "
        "real-chip sessions, 2026-08-19"
    ),
)


@dataclasses.dataclass(frozen=True)
class TrainLatencyProjection:
    """Measurement-derived full-depth train-step latency under DP x TP."""

    cfg_name: str
    n_data: int
    n_model: int
    step_s: float                  # one optimizer step, all DP replicas
    tokens_per_step: int           # global batch tokens (n_data x seq)
    comm_s: float                  # labeled ICI estimate inside step_s
    costs: MeasuredTrainCosts

    @property
    def tokens_per_s(self) -> float:
        return self.tokens_per_step / self.step_s

    def describe(self) -> str:
        return (
            f"{self.cfg_name} train DP={self.n_data} TP={self.n_model}: "
            f"step {self.step_s:.2f} s, {self.tokens_per_s:,.0f} tok/s "
            f"(comm est {self.comm_s * 1e3:.0f} ms) [{self.costs.provenance}]"
        )


def training_latency(
    cfg: ModelConfig,
    costs: MeasuredTrainCosts = MEASURED_7B_TRAIN,
    *,
    n_data: int = 1,
    n_model: int = 1,
    trainable_bytes: float = 6.5e9 * 2,   # bf16 grads of the unfrozen 7B LLM
    ici_algo_gbps: float = 90.0,
) -> TrainLatencyProjection:
    """Project the full-depth train step from the measured per-layer cost.

    Per-layer compute shards 1/TP (megatron: matmuls by columns/rows,
    attention by heads); the depth-independent remainder is carried at
    FULL cost even though its CE bulk would shard (unmeasured split —
    conservative). Comm terms are ENGINEERING ESTIMATES, labeled as such
    exactly like serving_latency's ICI term: TP adds 4 all-reduces per
    layer on [seq, hidden] bf16 activations (2 fwd + 2 bwd); ZeRO-2 DP
    adds one grad reduce-scatter of the trainable bf16 grads per step.
    ``ici_algo_gbps`` is the assumed all-reduce algorithm bandwidth.
    Valid at the measured seq only (attention is seq-quadratic).
    """
    layers = cfg.text.num_hidden_layers
    compute_s = (costs.remainder_ms + layers * costs.per_layer_step_ms / n_model) / 1e3
    comm_s = 0.0
    if n_model > 1:
        ar_bytes = costs.seq * cfg.text.hidden_size * 2
        ar_s = 2 * (n_model - 1) / n_model * ar_bytes / (ici_algo_gbps * 1e9)
        comm_s += 4 * layers * ar_s
    if n_data > 1:
        rs_s = (n_data - 1) / n_data * (trainable_bytes / n_model) / (ici_algo_gbps * 1e9)
        comm_s += rs_s
    return TrainLatencyProjection(
        cfg_name=cfg.name, n_data=n_data, n_model=n_model,
        step_s=compute_s + comm_s,
        tokens_per_step=n_data * costs.seq,
        comm_s=comm_s, costs=costs,
    )


# ---------------------------------------------------------------------------
# Streaming session horizon — VERDICT r2 weak #2
# ---------------------------------------------------------------------------

def chunk_tokens(grid_thw: tuple[int, int, int], text_overhead: int = 18) -> int:
    """Tokens appended per streaming chunk: merged visual tokens of one
    2-frame group (t*h*w/4) + the ``Time=a-b s`` user-turn text/markup."""
    t, h, w = grid_thw
    return t * h * w // 4 + text_overhead


@dataclasses.dataclass(frozen=True)
class StreamingHorizon:
    """Session length arithmetic for one stream on a fixed cache."""

    cache_len: int
    start_len: int                 # tokens after the init chunk
    tokens_per_second: float
    compact_keep: int              # 0 = no eviction

    @property
    def seconds_to_exhaustion(self) -> float:
        """Wall-clock until the cache fills WITHOUT eviction."""
        return (self.cache_len - self.start_len) / self.tokens_per_second

    @property
    def unbounded(self) -> bool:
        """With compaction the working set is bounded: the session runs
        forever iff sink+window+chunk headroom fits the cache."""
        if not self.compact_keep:
            return False
        return self.start_len + self.compact_keep < self.cache_len

    @property
    def seconds_between_compactions(self) -> float:
        if not self.compact_keep:
            return float("inf")
        return (self.cache_len - self.start_len - self.compact_keep) / self.tokens_per_second


def streaming_horizon(
    grid_thw: tuple[int, int, int],
    *,
    cache_len: int,
    start_len: int = 1024,
    chunks_per_second: float = 1.0,
    compact_keep: int = 0,
    decode_tokens_per_chunk: int = 16,
) -> StreamingHorizon:
    """Horizon for the live cadence: one 2-frame chunk per second plus the
    kept decode tokens (all but the final sampled token, demo/infer.py:174)."""
    tps = (chunk_tokens(grid_thw) + decode_tokens_per_chunk - 1) * chunks_per_second
    return StreamingHorizon(
        cache_len=cache_len, start_len=start_len,
        tokens_per_second=tps, compact_keep=compact_keep,
    )
