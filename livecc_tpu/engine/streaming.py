"""LiveCC streaming engine: interleaved frame-chunk prefill + word decode.

TPU-native re-design of the reference's ``LiveCCDemoInfer`` (demo/infer.py):
the per-chunk loop (build ``Time=a-b s`` turn -> tokenize -> prefill new chunk
into the growing KV cache -> decode <=16 tokens) runs over *bucketed static
shapes* so a real-time stream never triggers a recompile:

  * prompt-token chunks are right-padded to power-of-two buckets;
  * vision shapes are exact per resolution class (the ViT's per-temporal-
    group blocked attention needs no padding: one grid = one shape);
  * the KV cache is a donated static buffer that doubles when exhausted.

Chunking semantics mirror the reference exactly: 6-frame (3 s) initial chunk
then 2-frame (1 s) chunks (demo/infer.py:27-33), system prompt stripped from
continuation turns (demo/infer.py:147-150), ``' ...'`` marks continuing
commentary, history continues from all but each chunk's final token
(demo/infer.py:173-174).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.data import chat
from livecc_tpu.data.tokenizer import Tokenizer
from livecc_tpu.engine.generation import GenerationParams, decode_chunk, prefill
from livecc_tpu.models.qwen2_vl.model import VisionInputs, get_rope_index
from livecc_tpu.models.qwen2_vl.text import KVCache
from livecc_tpu.ops.rope import vision_rotary_cos_sin
from livecc_tpu.vision_io.budget import VisionBudget
from livecc_tpu.vision_io.patchify import device_patchify, grid_for_frames

Params = dict[str, Any]

TOKEN_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)


def _bucket(n: int, buckets: Sequence[int] = TOKEN_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"chunk of {n} tokens exceeds the largest bucket {buckets[-1]}")


@dataclasses.dataclass
class StreamState:
    """Per-stream state: device arrays + host-side shadows.

    ``length`` mirrors cache.offset on the host so the streaming loop never
    synchronizes on the device just to do bookkeeping; ``counts`` is the
    device-resident repetition-penalty presence (no growing-shape rebuilds).
    """

    cache: KVCache
    counts: jnp.ndarray                      # [1, V] int32 token counts
    past_ids: list[int]
    length: int = 0                          # host shadow of cache.offset
    last_token: int = -1                     # prev chunk's dropped final token
    rope_delta: int | None = None            # set by the first prefill
    query_sent: bool = False
    # id-shadow of the KV cache ([1, Hcap] int32) for fused lookahead
    # decoding (engine/speculative.py); allocated when spec.fused
    hist: jnp.ndarray | None = None


class LiveCCEngine:
    """Single-stream streaming commentary engine (multi-stream in serve/)."""

    fps = 2.0
    initial_fps_frames = 6
    streaming_fps_frames = 2

    def __init__(
        self,
        params: Params,
        cfg: ModelConfig,
        tokenizer: Tokenizer,
        *,
        budget: VisionBudget | None = None,
        cache_len: int = 8192,
        cache_dtype=None,
        use_flash: bool | None = None,
        compact_keep: int | None = None,
        compact_sink_cap: int = 1024,
        quantize_weights: bool | None = None,
        spec: "SpecConfig | None" = None,
    ):
        if quantize_weights is None:
            # TPU serving DEFAULT (decided by data, PERF.md r5): weight-only
            # int8 halves weight HBM on the decode hot path — real-video
            # soak A/B p50 1.26 s vs 1.73 s bf16 (-27%), and at TRUE 7B
            # width the drift is indistinguishable from bf16's own (zero
            # argmax flips at margin > 2e-2 vs the fp32 goldens). Pass
            # False explicitly for bit-parity work (tools/parity_vs_hf.py);
            # CPU (the parity/test path) stays unquantized.
            quantize_weights = jax.default_backend() == "tpu"
        if quantize_weights:
            from livecc_tpu.ops.quant import quantize_model_params
            params = quantize_model_params(params)
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.budget = budget or VisionBudget()
        self.cache_len = cache_len
        # KV dtype default: bf16 on TPU (half the f32 HBM; the serving
        # bench further opts into int8 — see parallel/memory.py horizon
        # math), fp32 elsewhere (the CPU/parity test path).
        if cache_dtype is None:
            cache_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                           else jnp.float32)
        self.cache_dtype = cache_dtype
        # Solo-stream session horizon: once a stream's cache has doubled up
        # to ``cache_len``, evict (sink + recent window) instead of growing
        # further. None = auto (half the ceiling); 0 disables (cache then
        # doubles without bound — the reference's own behavior).
        self.compact_keep = cache_len // 2 if compact_keep is None else compact_keep
        self.compact_sink_cap = compact_sink_cap
        # Speculative decoding (engine/speculative.py): draft-token
        # verification amortizes the weight-bound decode HBM reads; greedy
        # output is bit-identical to the plain decode path for any draft.
        # ``spec_draft_source`` overrides the default n-gram lookup (tests
        # inject oracle/adversarial drafts; a distilled draft model plugs in
        # the same way).
        self.spec = spec
        self.spec_draft_source = None
        # adaptive lookahead controller (engine/speculative.py:
        # SpecController, shared with the serving pool): runs whichever of
        # lookahead/plain MEASURES faster per emitted token, probing the
        # slower mode periodically
        self._spec_ctl = None
        self.sys_offset = chat.system_prompt_offset()
        # ' ...' continuation marker token (reference demo/infer.py:49)
        ids = tokenizer.encode(" ...")
        self.streaming_eos_token_id = ids[-1]
        self._rng = jax.random.PRNGKey(0)
        self._vision_aux_cache: dict = {}
        from livecc_tpu.utils.metrics import LatencyTracker
        self.metrics = LatencyTracker()
        # Pallas flash attention on TPU; XLA reference path elsewhere.
        self.use_flash = (jax.default_backend() == "tpu") if use_flash is None else use_flash

    def _spec_on(self) -> bool:
        """Adaptive-lookahead gate for this chunk (True = run lookahead)."""
        if self._spec_ctl is None:
            from livecc_tpu.engine.speculative import SpecController
            self._spec_ctl = SpecController(self.spec)
        return self._spec_ctl.use_spec()

    # ------------------------------------------------------------------
    # state management
    # ------------------------------------------------------------------

    def new_stream(self, cache_len: int | None = None) -> StreamState:
        """``cache_len`` overrides the engine default for this stream's
        initial cache (it doubles on demand); the serving pool starts init
        streams small so N joining streams don't transiently hold N
        full-length solo caches next to the pool."""
        n = cache_len or self.cache_len
        cache = KVCache.zeros(self.cfg.text, 1, n, self.cache_dtype)
        counts = jnp.zeros((1, self.cfg.text.vocab_size), jnp.int32)
        hist = None
        if self.spec is not None and self.spec.fused:
            hist = jnp.full((1, n), -1, jnp.int32)
        return StreamState(cache=cache, counts=counts, past_ids=[], hist=hist)

    def _ensure_capacity(self, state: StreamState, needed: int) -> None:
        off = state.length
        cap = state.cache.max_len
        if off + needed <= cap:
            return
        # At the engine ceiling, stop growing and COMPACT instead (sink
        # prefix + recent window; engine/compact.py): unbounded session on
        # a bounded cache, same policy the serving pool applies.
        if cap >= self.cache_len and self.compact_keep:
            from livecc_tpu.engine.compact import (
                compact_cache_row, compact_token_row, plan_compaction)

            old_off = int(np.asarray(state.cache.offset[0]))
            sink, keep, new_off = plan_compaction(
                old_off, self.compact_sink_cap, self.compact_keep, cap)
            if new_off < old_off and new_off + needed <= cap:
                state.cache = compact_cache_row(
                    state.cache, jnp.int32(0), jnp.int32(sink), jnp.int32(keep)
                )
                if state.hist is not None:
                    state.hist = compact_token_row(
                        state.hist, jnp.int32(old_off), jnp.int32(0),
                        jnp.int32(sink), jnp.int32(keep))
                state.rope_delta += old_off - new_off
                state.length = new_off
                self.metrics.record("cache_compaction_dropped_tokens",
                                    float(old_off - new_off))
                return
        new_cap = cap
        while off + needed > new_cap:
            new_cap *= 2

        def grow(arr, dim=3):
            # dim 3 = positions for k/v [L,B,Hk,Smax,D]; lane-major scales
            # [L,B,Hk,1,Smax] keep positions on the last axis.
            if arr is None:
                return None
            shape = list(arr.shape)
            shape[dim] = new_cap
            out = jnp.zeros(tuple(shape), arr.dtype)
            return jax.lax.dynamic_update_slice(out, arr, (0,) * arr.ndim)

        state.cache = KVCache(grow(state.cache.k), grow(state.cache.v), state.cache.offset,
                              grow(state.cache.k_scale, 4), grow(state.cache.v_scale, 4))
        if state.hist is not None:
            state.hist = jnp.concatenate(
                [state.hist,
                 jnp.full((1, new_cap - state.hist.shape[1]), -1, jnp.int32)], axis=1)

    # ------------------------------------------------------------------
    # one chunk: text+frames -> generated words
    # ------------------------------------------------------------------

    def chunk_step(
        self,
        state: StreamState,
        frames: np.ndarray | None,          # [T, H, W, 3] uint8 pre-scaled frames or None
        t0: float,
        t1: float,
        query: str | None,
        gen: GenerationParams,
    ) -> str:
        """Run one interleave step; returns decoded new text."""
        with self.metrics.measure("chunk_step"):
            return self._chunk_step(state, frames, t0, t1, query, gen)

    def _chunk_step(self, state, frames, t0, t1, query, gen) -> str:
        content: list[dict] = [{"type": "text", "text": f"Time={t0:.1f}-{t1:.1f}s"}]
        if frames is not None:
            content.append({"type": "video", "video": None})
        if query is not None:
            content.append({"type": "text", "text": query})
        return self._user_turn(state, content, frames, gen)

    def qa_turn(
        self,
        state: StreamState,
        frames: np.ndarray | None,
        message: str,
        gen: GenerationParams,
    ) -> str:
        """One QA turn over the shared cache (video attached if given) —
        reference video_qa semantics (demo/infer.py:182-242)."""
        content: list[dict] = []
        if frames is not None:
            content.append({"type": "video", "video": None})
        content.append({"type": "text", "text": message})
        return self._user_turn(state, content, frames, gen)

    def _user_turn(
        self,
        state: StreamState,
        content: list[dict],
        frames: np.ndarray | None,
        gen: GenerationParams,
    ) -> str:
        grid = None
        vision = None
        if frames is not None:
            grid, vision = self._device_vision(frames)
        text = chat.render_chat([{"role": "user", "content": content}], add_generation_prompt=True)
        if state.rope_delta is not None:
            text = chat.strip_system_for_continuation(text, self.sys_offset)
        if grid is not None:
            text = chat.expand_vision_placeholders(text, video_grid_thw=[grid])
        new_ids = self.tokenizer.encode(text)
        return self._run_chunk(state, new_ids, vision, grid, gen)

    def _device_vision(self, frames: np.ndarray):
        """uint8 [T, H, W, 3] pre-scaled frames -> (grid_thw, VisionInputs).

        Frames ship to the device as uint8; normalize+patchify run in one jit.
        Rotary tables / segment ids are cached per (grid, pad) on device —
        for a streaming video they are computed exactly once.
        """
        t, h, w, _ = frames.shape
        grid = grid_for_frames(t, h, w, self.cfg.vision)
        n = grid[0] * grid[1] * grid[2]
        # Uniform grid: blocked ViT attention needs no padding (each temporal
        # group is one attention block), so ship exactly N patches.
        n_pad = 0
        patches = device_patchify(jnp.asarray(frames), n_pad=n_pad)
        key = (grid, n_pad)
        aux = self._vision_aux_cache.get(key)
        if aux is None:
            cos, sin = vision_rotary_cos_sin(
                [grid], self.cfg.vision.head_dim,
                spatial_merge_size=self.cfg.vision.spatial_merge_size,
            )
            seg = np.repeat(np.arange(grid[0]), grid[1] * grid[2]).astype(np.int32)
            if n_pad:
                hd = cos.shape[1]
                cos = np.concatenate([cos, np.ones((n_pad, hd), cos.dtype)])
                sin = np.concatenate([sin, np.zeros((n_pad, hd), sin.dtype)])
                seg = np.concatenate([seg, np.full((n_pad,), -1, np.int32)])
            aux = (jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(seg))
            self._vision_aux_cache[key] = aux
        cos, sin, seg = aux
        return grid, VisionInputs(patches=patches, cos=cos, sin=sin, seg_ids=seg,
                                  group=grid[1] * grid[2])

    def _run_chunk(
        self,
        state: StreamState,
        new_ids: list[int],
        vision: Optional[VisionInputs],
        grid,
        gen: GenerationParams,
    ) -> str:
        n_new = len(new_ids)
        bucket = _bucket(n_new)
        # Speculative windows transiently write up to k_draft+1 tokens past
        # the accepted frontier; reserve room for one full window beyond the
        # final emitted token.
        extra = (self.spec.k_draft + 2) if self.spec is not None else 0
        self._ensure_capacity(state, bucket + gen.max_new_tokens + 1 + extra)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :n_new] = new_ids
        offset = state.length

        if state.rope_delta is None:
            # First chunk: true 3D M-RoPE positions over the full prompt.
            pos, delta = get_rope_index(
                self.cfg,
                np.asarray(new_ids)[None],
                video_grid_thw=np.asarray([grid]) if grid is not None else None,
            )
            state.rope_delta = int(delta[0, 0])
            pos_pad = np.zeros((3, 1, bucket), np.int32)
            pos_pad[:, :, :n_new] = pos
            pos_pad[:, :, n_new:] = pos[:, :, -1:] + np.arange(1, bucket - n_new + 1)
        else:
            # Continuation: flat offset+delta positions (cached rope_deltas
            # branch of Qwen2VLModel.forward — reference streaming behavior).
            pos_pad = np.broadcast_to(
                (np.arange(bucket) + offset + state.rope_delta)[None, None], (3, 1, bucket)
            ).astype(np.int32)

        logits0, state.cache, state.counts = prefill(
            self.params, self.cfg, jnp.asarray(ids), jnp.asarray(pos_pad),
            jnp.int32(n_new), state.cache, vision=vision,
            counts=state.counts, remove_token=jnp.int32(state.last_token),
            use_flash=self.use_flash,
        )
        if self.spec is not None and self.spec.fused and self._spec_on():
            from livecc_tpu.engine.speculative import decode_chunk_lookahead

            self._rng, sub = jax.random.split(self._rng)
            t0 = time.perf_counter()
            (tokens, n_gen, state.cache, state.hist, state.counts,
             n_iters) = decode_chunk_lookahead(
                self.params, self.cfg, gen, self.spec,
                jnp.asarray(ids), jnp.asarray([n_new], jnp.int32), logits0,
                state.cache, state.hist, state.counts,
                jnp.asarray([[state.rope_delta]], jnp.int32), sub,
                use_flash=self.use_flash,
            )
            n = int(n_gen[0])
            generated = np.asarray(tokens)[0, :n].tolist()
            # np.asarray forced completion: an honest decode wall, fed to
            # the measured-cost controller (includes the pending prefill —
            # both modes pay it identically)
            self._spec_ctl.observe_wall(True, time.perf_counter() - t0, n)
            self._spec_ctl.observe(n, 1, int(n_iters))
        elif self.spec is not None and self.spec.fused:
            # adaptive controller chose plain fused decode this chunk
            # (state.hist goes stale here; it only degrades DRAFT quality on
            # the next probe — outputs stay exact by acceptance)
            self._rng, sub = jax.random.split(self._rng)
            t0 = time.perf_counter()
            tokens, n_gen, state.cache, state.counts = decode_chunk(
                self.params, self.cfg, gen, logits0, state.cache, state.counts,
                jnp.asarray([[state.rope_delta]], jnp.int32), sub,
                use_flash=self.use_flash,
            )
            n = int(n_gen[0])
            generated = np.asarray(tokens)[0, :n].tolist()
            self._spec_ctl.observe_wall(False, time.perf_counter() - t0, n)
        elif self.spec is not None:
            from livecc_tpu.engine.speculative import speculative_decode_chunk

            generated = speculative_decode_chunk(
                self, state, logits0, gen, self.spec,
                context_ids=state.past_ids + new_ids,
                draft_source=self.spec_draft_source,
            )
        else:
            self._rng, sub = jax.random.split(self._rng)
            tokens, n_gen, state.cache, state.counts = decode_chunk(
                self.params, self.cfg, gen, logits0, state.cache, state.counts,
                jnp.asarray([[state.rope_delta]], jnp.int32), sub,
                use_flash=self.use_flash,
            )
            tokens = np.asarray(tokens)[0]
            n = int(n_gen[0])
            generated = tokens[:n].tolist()
        # History keeps all but the final sampled token (demo/infer.py:174);
        # its presence count is removed at the next chunk's prefill.
        state.past_ids = state.past_ids + new_ids + generated[:-1]
        state.length = offset + n_new + max(len(generated) - 1, 0)
        state.last_token = generated[-1] if generated else -1
        return self.tokenizer.decode(generated, skip_special_tokens=True)

    # ------------------------------------------------------------------
    # offline evaluation API (reference demo/infer.py:244-310)
    # ------------------------------------------------------------------

    def live_cc_once_for_evaluation(
        self,
        query: str,
        frames: np.ndarray,                  # [T, H, W, 3] uint8 pre-scaled, strict-fps sampled
        *,
        video_start: float = 0.0,
        max_new_tokens: int = 32,
        repetition_penalty: float = 1.05,
        do_sample: bool = False,
    ) -> list[list]:
        """Whole-clip chunked commentary; returns [[t0, t1, text], ...]."""
        gen = GenerationParams(
            max_new_tokens=max_new_tokens,
            eos_token_id=self.cfg.eos_token_id,
            pad_token_id=self.cfg.pad_token_id,
            do_sample=do_sample,
            repetition_penalty=repetition_penalty,
        )
        state = self.new_stream()
        chunks: list[np.ndarray] = [frames[: self.initial_fps_frames]]
        rest = frames[self.initial_fps_frames:]
        chunks += [rest[i:i + self.streaming_fps_frames] for i in range(0, len(rest), self.streaming_fps_frames)]
        out = []
        t1 = 0.0
        for i, clip in enumerate(chunks):
            if len(clip) == 0:
                continue
            t0, t1 = (0.0, self.initial_fps_frames / self.fps) if i == 0 else (t1, t1 + self.streaming_fps_frames / self.fps)
            text = self.chunk_step(state, clip, t0, t1, query if i == 0 else None, gen)
            out.append([video_start + t0, video_start + t1, text])
        return out
