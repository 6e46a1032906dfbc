"""Multi-stream serving: pool-resident, host-sync-free batched execution.

The reference serves one stream per process (demo/infer.py); the TPU target
is >=8 concurrent 1-fps 720p streams per replica (BASELINE.md north star).

Design (v3, informed by on-TPU tick profiling — see PERF.md):
  * steady-state streams live in a fixed-capacity **slot pool**: KV caches,
    presence counts, rope deltas and last-token markers stay permanently on
    device ([C, ...]); a tick runs ONE vmapped prefill + ONE vmapped fused
    decode over the whole pool with donated buffers;
  * **zero host round-trips in the steady loop**: continuation positions are
    computed on device from each slot's cache offset; the previous chunk's
    dropped final token (presence-count bookkeeping) flows decode -> next
    prefill as a device array; generated tokens are fetched lazily — the
    host reads tick N's text while tick N+1 computes;
  * idle slots ride along inert (valid_len 0, active=False: offsets, counts
    and caches provably unchanged);
  * frames of all ready streams ship as ONE stacked uint8 transfer and one
    batched patchify dispatch; vision rotary/segment tables are shared
    across the pool (streams in a pool share a resolution class);
  * streams joining mid-flight run their 6-frame init chunk solo through
    the single-stream engine (3D M-RoPE positions), then adopt a pool slot.
"""

from __future__ import annotations

import dataclasses
import functools
import threading
import time
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.data import chat
from livecc_tpu.engine.generation import GenerationParams, decode_chunk, prefill
from livecc_tpu.engine.speculative import SpecController
from livecc_tpu.engine.streaming import LiveCCEngine, StreamState, _bucket
from livecc_tpu.models.qwen2_vl.model import VisionInputs
from livecc_tpu.models.qwen2_vl.text import KVCache
from livecc_tpu.vision_io.patchify import device_patchify, grid_for_frames

Params = dict[str, Any]

# Initial solo-cache length for joining streams (an init chunk is ~1k
# tokens; the solo cache doubles on demand). Shared by add_stream and
# warmup: prefill/decode jit-specialize on cache shape, so warming any
# other length would leave the real join path uncompiled.
INIT_CACHE_LEN = 2048


def _init_cache_len(engine: LiveCCEngine) -> int:
    return min(INIT_CACHE_LEN, engine.cache_len)


def make_pool_step(cfg: ModelConfig, gen: GenerationParams, use_flash: bool,
                   spec=None):
    """One fused jit per tick: batched prefill + fused decode over the pool.

    Every row (stream) sits at its own cache depth — positions, key-validity
    and writes use the per-row offsets natively (no vmap, so GEMMs stay
    batched and the Pallas kernels see the whole pool in one grid).

    ``spec`` (a fused SpecConfig, inherited from the engine) swaps the
    plain fused decode for on-device lookahead decoding
    (engine/speculative.py:decode_chunk_lookahead): n-gram drafts verified
    one window per while-iteration, history in the pool's ``hist`` shadow.
    The tick stays ONE dispatch either way.
    """

    @functools.partial(
        jax.jit, donate_argnames=("cache", "counts", "last_tokens", "hist"),
        static_argnames=("group",))
    def run(params, ids, valid, cache, patches, cos, sin, seg,
            counts, last_tokens, deltas, active, rng, hist=None, group=None):
        b, sb = ids.shape
        pos = jnp.broadcast_to(
            jnp.arange(sb)[None, None, :] + (cache.offset + deltas)[None, :, None],
            (3, b, sb),
        ).astype(jnp.int32)
        remove = jnp.where(active, last_tokens, -1)
        vision = VisionInputs(patches=patches, cos=cos, sin=sin, seg_ids=seg, group=group)
        logits0, cache, counts = prefill(
            params, cfg, ids, pos, valid, cache, vision=vision,
            counts=counts, remove_token=remove, use_flash=use_flash,
        )
        if spec is not None:
            from livecc_tpu.engine.speculative import decode_chunk_lookahead

            tokens, n_gen, cache, hist, counts, n_iters = decode_chunk_lookahead(
                params, cfg, gen, spec, ids, valid, logits0, cache, hist,
                counts, deltas[:, None], rng, use_flash=use_flash, active=active,
            )
        else:
            tokens, n_gen, cache, counts = decode_chunk(
                params, cfg, gen, logits0, cache, counts, deltas[:, None], rng,
                use_flash=use_flash, active=active,
            )
            n_iters = jnp.int32(0)
        new_last = jnp.where(
            n_gen > 0,
            tokens[jnp.arange(b), jnp.maximum(n_gen - 1, 0)],
            -1,
        ).astype(jnp.int32)
        last_tokens = jnp.where(active, new_last, last_tokens)
        return tokens, n_gen, cache, counts, last_tokens, hist, n_iters

    return run


@functools.partial(jax.jit, donate_argnames=("pool_cache", "pool_counts",
                                             "pool_last", "pool_hist"))
def _insert_slot(pool_cache, pool_counts, pool_last, slot, cache, counts, last,
                 pool_hist=None, hist=None):
    """Copy a (possibly SHORTER) solo cache into a pool slot.

    Init streams start with a small cache (see StreamServer.add_stream) so
    N simultaneously-joining streams don't hold N full-length caches next
    to the pool; the prefix past the solo length stays zero and sits beyond
    the row's kv_limit, so it is never attended. ``hist`` (the lookahead
    token-history shadow) rides along when speculation is on."""

    def put_kv(pool_arr, arr):
        if pool_arr is None:
            return None
        s = arr.shape[-2]                      # positions on axis -2 (K/V)
        if s == pool_arr.shape[-2]:
            return pool_arr.at[:, slot].set(arr[:, 0])
        return pool_arr.at[:, slot, :, :s, :].set(arr[:, 0])

    def put_scale(pool_arr, arr):
        if pool_arr is None:
            return None
        s = arr.shape[-1]                      # lane-major: positions last
        if s == pool_arr.shape[-1]:
            return pool_arr.at[:, slot].set(arr[:, 0])
        return pool_arr.at[:, slot, :, :, :s].set(arr[:, 0])

    new_cache = KVCache(
        put_kv(pool_cache.k, cache.k),
        put_kv(pool_cache.v, cache.v),
        pool_cache.offset.at[slot].set(cache.offset[0]),
        put_scale(pool_cache.k_scale, cache.k_scale),
        put_scale(pool_cache.v_scale, cache.v_scale),
    )
    if pool_hist is not None:
        s = hist.shape[-1]
        if s == pool_hist.shape[-1]:
            pool_hist = pool_hist.at[slot].set(hist[0])
        else:
            pool_hist = pool_hist.at[slot, :s].set(hist[0])
    return (new_cache, pool_counts.at[slot].set(counts[0]),
            pool_last.at[slot].set(last), pool_hist)


from livecc_tpu.engine.compact import (
    compact_cache_row as _compact_slot,
    plan_compaction as _plan_compaction,
)


@dataclasses.dataclass
class Stream:
    sid: int
    resolution: tuple[int, int]
    query: str | None = None
    query_sent: bool = False
    slot: int | None = None              # pool slot once past the init chunk
    init_state: Optional[StreamState] = None
    rope_delta: int | None = None
    length_ub: int = 0                   # host upper bound on cache length
    sink_len: int = 0                    # tokens to pin under compaction
    pending: Optional[tuple] = None
    outputs: list = dataclasses.field(default_factory=list)


class StreamServer:
    """Continuous batching of LiveCC streams sharing one model replica.

    ``compact_keep`` bounds every stream's attended KV window: when a
    stream's cache nears the pool size, the middle of its history is
    evicted (sink prefix + recent window retained, ``_compact_slot``) and
    the dropped length folds into its rope_delta — sessions become
    unbounded in wall-clock on a fixed pool (VERDICT r2 weak #2: a 16k pool
    previously hard-errored after ~70 s of 720p video). 0 disables
    (restores the hard RuntimeError); None = auto (half the pool).
    """

    def __init__(self, engine: LiveCCEngine, gen: GenerationParams, capacity: int = 8,
                 compact_keep: int | None = None, compact_sink_cap: int = 1024):
        self.engine = engine
        self.gen = gen
        self.capacity = capacity
        self.compact_keep = (engine.cache_len // 2 if compact_keep is None
                             else compact_keep)
        self.compact_sink_cap = compact_sink_cap
        self._streams: dict[int, Stream] = {}
        self._next_sid = 0
        self._steps: dict = {}             # use_spec -> compiled pool step
        self._spec_ctl: Optional[SpecController] = None
        # (tokens_dev, n_gen_dev, slot_map, dispatch_ts, n_iters_dev, used_spec)
        self._inflight: list[tuple] = []
        self._lock = threading.Lock()
        self._collector: Optional[threading.Thread] = None
        # pool device state (lazy)
        self.pool_caches: Optional[KVCache] = None      # stacked [C, ...]
        self.pool_counts: Optional[jnp.ndarray] = None  # [C, 1, V]
        self.pool_last: Optional[jnp.ndarray] = None    # [C] int32
        self.pool_hist: Optional[jnp.ndarray] = None    # [C, Smax] int32 (lookahead)
        self._free: list[int] = list(range(capacity))

    def _spec(self):
        """The engine's fused SpecConfig, or None (lookahead off)."""
        sp = getattr(self.engine, "spec", None)
        return sp if (sp is not None and sp.fused) else None

    def _ctl(self) -> "SpecController":
        if self._spec_ctl is None:
            self._spec_ctl = SpecController(self._spec())
        return self._spec_ctl

    def _get_step(self, use_spec: bool):
        """Compiled pool step for the requested decode mode (cached)."""
        key = bool(use_spec and self._spec() is not None)
        step = self._steps.get(key)
        if step is None:
            step = make_pool_step(self.engine.cfg, self.gen, self.engine.use_flash,
                                  spec=self._spec() if key else None)
            self._steps[key] = step
        return step

    # -- stream lifecycle -------------------------------------------------

    def add_stream(self, resolution: tuple[int, int], query: str | None = None) -> int:
        reserved = sum(1 for s in self._streams.values())
        if reserved >= self.capacity:
            raise RuntimeError(f"server at capacity ({self.capacity} streams)")
        sid = self._next_sid
        self._next_sid += 1
        # Small initial solo cache (init chunk is ~1k tokens; it doubles on
        # demand): at a 32k pool, 8 full-length solo caches would add
        # ~7.5 GB (2B bf16) next to the pool during a joining burst — the
        # prefix-copying _insert_slot makes the small cache adoptable.
        init_len = _init_cache_len(self.engine)
        self._streams[sid] = Stream(
            sid=sid, resolution=resolution, query=query,
            init_state=self.engine.new_stream(cache_len=init_len),
        )
        return sid

    def remove_stream(self, sid: int) -> None:
        self._join_collector()
        self._collect()
        s = self._streams.pop(sid, None)
        if s is not None and s.slot is not None:
            self._free.append(s.slot)

    def submit_chunk(self, sid: int, frames: np.ndarray, t0: float, t1: float) -> None:
        """Queue one chunk ([T, H, W, 3] uint8 pre-scaled frames).

        Steady-state frames are staged to the device immediately (transfer +
        patchify dispatch) so they overlap the in-flight tick's compute —
        in a real deployment frames arrive during the previous second.

        The submit wall-clock is carried with the chunk: when its text
        surfaces, the server records ``chunk_submit_to_text`` (the honest
        user-perceived commentary latency — submit through host prep,
        dispatch, device compute, and text decode) and stamps the output
        row for ``drain_timed``."""
        s = self._streams[sid]
        sub_ts = time.perf_counter()
        if s.slot is not None:
            t, h, w = frames.shape[:3]
            cfgv = self.engine.cfg.vision
            grid = grid_for_frames(t, h, w, cfgv)
            staged = device_patchify(jnp.asarray(frames), n_pad=0)
            s.pending = ((staged, grid), t0, t1, sub_ts)
        else:
            s.pending = (frames, t0, t1, sub_ts)

    def drain(self, sid: int, sync: bool = True) -> list[tuple[tuple[float, float], str]]:
        """Collected outputs for a stream. ``sync=True`` (default) waits for
        the in-flight tick; ``sync=False`` returns whatever the background
        collector has already surfaced (keeps the pipeline running)."""
        return [(span, text) for span, text, _ts in self.drain_timed(sid, sync=sync)]

    def drain_timed(self, sid: int, sync: bool = True,
                    ) -> list[tuple[tuple[float, float], str, float]]:
        """Like drain, but each row carries the ``time.perf_counter()`` at
        which its text became available (the collector surfaced it) — the
        correct timestamp for latency accounting. A caller polling drain()
        on a paced loop otherwise measures its own polling cadence, not
        the serving latency (the r5 soak overstated p50 by ~1 pace)."""
        if sync:
            self._join_collector()
            self._collect()
        with self._lock:
            out = self._streams[sid].outputs
            self._streams[sid].outputs = []
        return out

    def flush(self) -> None:
        """Force collection of any in-flight results."""
        self._join_collector()
        self._collect()

    # -- snapshot / restore (serving failure recovery) --------------------

    def snapshot(self, path: str) -> None:
        """Persist every ADOPTED stream's session (KV cache row, presence
        counts, rope_delta, host metadata) to one .npz: a server process
        restart resumes live sessions mid-video instead of dropping them.
        The reference has no serving-recovery story (one stream per
        process, state in RAM only); orbax covers training resume — this
        is the serving analogue. Streams still in their init chunk are not
        snapshotted (they re-join with a fresh init chunk), and PENDING
        (submitted, un-ticked) chunks are not persisted — snapshot after a
        tick+drain boundary.
        """
        self.flush()
        arrays: dict[str, np.ndarray] = {}
        meta = []
        for s in self._streams.values():
            if s.slot is None:
                continue
            slot = s.slot
            # npz has no bf16: persist floats as fp32 (exact for bf16)
            as_np = lambda a: (np.asarray(a, np.float32)
                               if a.dtype == jnp.bfloat16 else np.asarray(a))
            arrays[f"k_{s.sid}"] = as_np(self.pool_caches.k[:, slot])
            arrays[f"v_{s.sid}"] = as_np(self.pool_caches.v[:, slot])
            if self.pool_caches.quantized:
                arrays[f"ks_{s.sid}"] = as_np(self.pool_caches.k_scale[:, slot])
                arrays[f"vs_{s.sid}"] = as_np(self.pool_caches.v_scale[:, slot])
            arrays[f"counts_{s.sid}"] = np.asarray(self.pool_counts[slot])
            if self.pool_hist is not None:
                arrays[f"hist_{s.sid}"] = np.asarray(self.pool_hist[slot])
            meta.append({
                "sid": s.sid, "resolution": list(s.resolution),
                "query": s.query, "query_sent": s.query_sent,
                "rope_delta": s.rope_delta, "length_ub": s.length_ub,
                "sink_len": s.sink_len,
                "offset": int(np.asarray(self.pool_caches.offset[slot])),
                "last": int(np.asarray(self.pool_last[slot])),
            })
        import json as _json

        arrays["__meta__"] = np.frombuffer(
            _json.dumps({"streams": meta, "cache_len": self.engine.cache_len,
                         "dtype": str(np.dtype(self.engine.cache_dtype))}).encode(),
            np.uint8,
        )
        np.savez(path, **arrays)

    def restore(self, path: str) -> list[int]:
        """Re-adopt snapshotted sessions into this server's pool; returns
        the restored stream ids (renumbered). Cache rows longer than this
        pool raise (same contract as adoption)."""
        import json as _json

        data = np.load(path)
        meta = _json.loads(bytes(data["__meta__"].tobytes()).decode())
        want = str(np.dtype(self.engine.cache_dtype))
        if meta.get("dtype") != want:
            raise ValueError(
                f"snapshot KV dtype {meta.get('dtype')} != engine {want}; "
                "restore into an engine with the same cache_dtype"
            )
        self._ensure_pool()
        restored = []
        for m in meta["streams"]:
            if not self._free:
                raise RuntimeError("restore: server out of slots")
            old = m["sid"]
            sid = self._next_sid
            self._next_sid += 1
            slot = self._free.pop(0)
            off = m["offset"]
            if off > self.pool_caches.max_len:
                raise RuntimeError("restored cache longer than this pool")

            def put(pool_arr, arr, scale=False):
                if pool_arr is None:
                    return None
                a = jnp.asarray(arr).astype(pool_arr.dtype)   # fp32 npz -> bf16
                if scale:
                    s_len = min(a.shape[-1], pool_arr.shape[-1])
                    return pool_arr.at[:, slot, ..., :s_len].set(a[..., :s_len])
                s_len = min(a.shape[-2], pool_arr.shape[-2])
                return pool_arr.at[:, slot, :, :s_len, :].set(a[:, :, :s_len, :])

            self.pool_caches = KVCache(
                put(self.pool_caches.k, data[f"k_{old}"]),
                put(self.pool_caches.v, data[f"v_{old}"]),
                self.pool_caches.offset.at[slot].set(off),
                put(self.pool_caches.k_scale, data.get(f"ks_{old}"), scale=True)
                if self.pool_caches.quantized else None,
                put(self.pool_caches.v_scale, data.get(f"vs_{old}"), scale=True)
                if self.pool_caches.quantized else None,
            )
            self.pool_counts = self.pool_counts.at[slot].set(
                jnp.asarray(data[f"counts_{old}"]))
            if self.pool_hist is not None and f"hist_{old}" in data:
                h = jnp.asarray(data[f"hist_{old}"])
                n = min(h.shape[-1], self.pool_hist.shape[-1])
                self.pool_hist = self.pool_hist.at[slot, :n].set(h[:n])
            # (a missing hist leaves -1s: lookahead drafts just miss until
            # new history accumulates — outputs stay correct by acceptance)
            self.pool_last = self.pool_last.at[slot].set(m["last"])
            self._streams[sid] = Stream(
                sid=sid, resolution=tuple(m["resolution"]), query=m["query"],
                query_sent=m["query_sent"], slot=slot,
                rope_delta=m["rope_delta"], length_ub=m["length_ub"],
                sink_len=m["sink_len"],
            )
            restored.append(sid)
        return restored

    def _vision_aux(self, grid, n_pad):
        """Shared rotary/segment tables for a resolution class (cached on
        device via the engine's per-grid cache)."""
        from livecc_tpu.models.qwen2_vl.model import VisionInputs as VI
        engine = self.engine
        key = (grid, n_pad)
        aux = engine._vision_aux_cache.get(key)
        if aux is None:
            from livecc_tpu.ops.rope import vision_rotary_cos_sin
            cos, sin = vision_rotary_cos_sin(
                [grid], engine.cfg.vision.head_dim,
                spatial_merge_size=engine.cfg.vision.spatial_merge_size,
            )
            seg = np.repeat(np.arange(grid[0]), grid[1] * grid[2]).astype(np.int32)
            if n_pad:
                hd = cos.shape[1]
                cos = np.concatenate([cos, np.ones((n_pad, hd), cos.dtype)])
                sin = np.concatenate([sin, np.zeros((n_pad, hd), sin.dtype)])
                seg = np.concatenate([seg, np.full((n_pad,), -1, np.int32)])
            aux = (jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(seg))
            engine._vision_aux_cache[key] = aux
        cos, sin, seg = aux
        return VI(patches=None, cos=cos, sin=sin, seg_ids=seg, group=grid[1] * grid[2])

    # -- warmup --------------------------------------------------------------

    def warmup(
        self,
        resolutions: list[tuple[int, int]],
        *,
        query: str = "Please describe the video.",
        init_frames: int = 6,
        steady_frames: int = 2,
    ) -> None:
        """Pre-compile every program a serving session at these resolution
        classes will hit, so no stream ever eats a mid-serve XLA compile
        (round-1 bench saw 60 s p99 spikes from exactly that).

        Runs (a) the solo init-chunk path and (b) the batched pool step per
        resolution, on one scratch pool state. Adopted streams' pool state
        is untouched. When no pool exists yet (warmup before serving — the
        intended use), the scratch BECOMES the pool afterwards
        (offsets/counts reset), so a pre-serve warmup never holds two
        full-size KV pools at once; a MID-serve warmup (pool already live)
        does transiently hold pool + scratch — at the 20-24-stream int8
        configurations that doubles peak KV HBM, so warm new resolutions
        before adopting streams where possible. Token bucketing makes the
        text side robust to prompt wording: any query landing in the same
        bucket reuses the compiled program.
        """
        engine = self.engine
        cfgv = engine.cfg.vision
        adopt_scratch = self.pool_caches is None   # scratch becomes the pool
        c = self.capacity
        scratch_cache = KVCache.zeros(engine.cfg.text, c, engine.cache_len,
                                      engine.cache_dtype)
        scratch_counts = jnp.zeros((c, engine.cfg.text.vocab_size), jnp.int32)
        scratch_last = jnp.full((c,), -1, jnp.int32)
        scratch_hist = (jnp.full((c, engine.cache_len), -1, jnp.int32)
                        if self._spec() is not None else None)
        for (h, w) in resolutions:
            # (a) solo init path (3D M-RoPE prefill + decode at the init
            # bucket) — at the SAME cache length add_stream uses: the solo
            # programs specialize on cache shape, so warming a full-length
            # cache would leave the real join path to compile mid-serve.
            st = engine.new_stream(cache_len=_init_cache_len(engine))
            frames = np.zeros((init_frames, h, w, 3), np.uint8)
            engine.chunk_step(st, frames, 0.0, init_frames / engine.fps, query, self.gen)
            # also pre-compile the adoption copy (short solo cache -> pool
            # slot) — it otherwise compiles inside the first live tick
            scratch_cache, scratch_counts, scratch_last, scratch_hist = _insert_slot(
                scratch_cache, scratch_counts, scratch_last,
                jnp.int32(0), st.cache, st.counts, jnp.int32(st.last_token),
                pool_hist=scratch_hist, hist=st.hist,
            )
            del st
            if self.compact_keep:
                # pre-compile the eviction program too (fires mid-serve at
                # the session horizon otherwise)
                scratch_cache = _compact_slot(
                    scratch_cache, jnp.int32(0), jnp.int32(8), jnp.int32(8)
                )
            # (b) steady pool step for this grid class
            grid = grid_for_frames(steady_frames, h, w, cfgv)
            staged = device_patchify(
                jnp.zeros((steady_frames, h, w, 3), jnp.uint8), n_pad=0
            )
            vis0 = self._vision_aux(grid, 0)
            content = [{"type": "text", "text": "Time=3.0-4.0s"},
                       {"type": "video", "video": None}]
            text = chat.render_chat([{"role": "user", "content": content}],
                                    add_generation_prompt=True)
            text = chat.strip_system_for_continuation(text, engine.sys_offset)
            text = chat.expand_vision_placeholders(text, video_grid_thw=[grid])
            n_ids = len(engine.tokenizer.encode(text))
            bucket = _bucket(n_ids)
            patches = jnp.broadcast_to(staged, (c,) + staged.shape)
            ids = np.zeros((c, bucket), np.int32)
            valid = np.full((c,), n_ids, np.int32)
            active = np.ones((c,), bool)
            # warm the spec step and, when the adaptive controller can
            # switch mid-serve, the plain step too (a mid-serve compile
            # spike would defeat the point of disabling lookahead)
            modes = [True]
            sp = self._spec()
            if sp is not None and sp.adaptive:
                modes.append(False)
            for use_spec in modes:
                engine._rng, sub = jax.random.split(engine._rng)
                out = self._get_step(use_spec)(
                    engine.params, jnp.asarray(ids), jnp.asarray(valid),
                    scratch_cache, patches, vis0.cos, vis0.sin, vis0.seg_ids,
                    scratch_counts, scratch_last, jnp.zeros((c,), jnp.int32),
                    jnp.asarray(active), sub, hist=scratch_hist, group=vis0.group,
                )
                # the step donates the scratch state; carry the returned buffers
                (tokens_out, _, scratch_cache, scratch_counts, scratch_last,
                 scratch_hist, _) = out
                # force completion on a REAL step output — materializing an
                # unrelated array can return before the step finishes through
                # the relay (CLAUDE.md), deferring the warmup compile/execution
                # (and any OOM) to the first live tick
                np.asarray(tokens_out)
                scratch_cache = dataclasses.replace(
                    scratch_cache, offset=jnp.zeros((c,), jnp.int32))
            # reset per-resolution so each warmup sees a fresh-depth pool
            scratch_cache = dataclasses.replace(
                scratch_cache, offset=jnp.zeros((c,), jnp.int32)
            )
            scratch_counts = jnp.zeros_like(scratch_counts)
            scratch_last = jnp.full((c,), -1, jnp.int32)
        if adopt_scratch and self.pool_caches is None:
            # stale K/V contents sit beyond every row's kv_limit (offset 0)
            # and are never attended; reusing the warmed buffers avoids a
            # second full-size pool allocation.
            self.pool_caches = scratch_cache
            self.pool_counts = scratch_counts
            self.pool_last = scratch_last
            self.pool_hist = scratch_hist

    # -- pool management ----------------------------------------------------

    def _ensure_pool(self) -> None:
        if self.pool_caches is not None:
            return
        engine = self.engine
        self.pool_caches = KVCache.zeros(
            engine.cfg.text, self.capacity, engine.cache_len, engine.cache_dtype
        )
        self.pool_counts = jnp.zeros(
            (self.capacity, engine.cfg.text.vocab_size), jnp.int32
        )
        self.pool_last = jnp.full((self.capacity,), -1, jnp.int32)
        if self._spec() is not None:
            self.pool_hist = jnp.full((self.capacity, engine.cache_len), -1, jnp.int32)

    def _adopt(self, s: Stream) -> None:
        """Move a freshly-initialized stream's cache into a pool slot."""
        self._ensure_pool()
        slot = self._free.pop(0)
        st = s.init_state
        if st.cache.max_len > self.pool_caches.max_len:
            raise RuntimeError("stream cache grew past the pool size; raise cache_len")
        self.pool_caches, self.pool_counts, self.pool_last, self.pool_hist = _insert_slot(
            self.pool_caches, self.pool_counts, self.pool_last,
            slot, st.cache, st.counts, jnp.int32(st.last_token),
            pool_hist=self.pool_hist, hist=st.hist,
        )
        s.slot = slot
        s.rope_delta = st.rope_delta
        s.length_ub = st.length
        s.sink_len = min(st.length, self.compact_sink_cap)
        s.init_state = None

    def _compact(self, s: Stream) -> None:
        """Evict the middle of one stream's cache (sink + recent window
        retained). The in-flight tick must have completed its device
        dispatches (we run before this tick's dispatch; the previous tick's
        outputs are futures on the SAME pool buffers — JAX sequences the
        donated update after them)."""
        # actual device depth, not the host upper bound: the rope_delta fold
        # must keep (offset + delta) invariant exactly
        old_off = int(np.asarray(self.pool_caches.offset[s.slot]))
        sink, keep, new_off = _plan_compaction(
            old_off, s.sink_len, self.compact_keep, self.pool_caches.max_len)
        if new_off >= old_off:
            return
        self.pool_caches = _compact_slot(
            self.pool_caches, jnp.int32(s.slot), jnp.int32(sink), jnp.int32(keep)
        )
        if self.pool_hist is not None:
            from livecc_tpu.engine.compact import compact_token_row

            self.pool_hist = compact_token_row(
                self.pool_hist, jnp.int32(old_off), jnp.int32(s.slot),
                jnp.int32(sink), jnp.int32(keep))
        s.rope_delta += old_off - new_off
        s.length_ub = new_off
        self.engine.metrics.record("cache_compaction_dropped_tokens",
                                   float(old_off - new_off))

    # -- execution ---------------------------------------------------------

    def _collect(self) -> None:
        """Fetch in-flight generated tokens (runs on the collector thread as
        soon as the device finishes; callable from the main thread too)."""
        with self._lock:
            inflight, self._inflight = self._inflight, []
        for tokens_dev, n_gen_dev, slot_map, dispatched, n_iters_dev, used_spec in inflight:
            tokens = np.asarray(tokens_dev)      # blocks until device completion
            n_gen = np.asarray(n_gen_dev)
            done = time.perf_counter()
            # measured cost -> adaptive controller (rides the collection
            # sync; adds no device round-trips). wall = dispatch -> device
            # done: prefill + decode + queueing, a fair per-mode comparison.
            emitted = int(sum(n_gen[slot] for slot in slot_map))
            self._ctl().observe_wall(used_spec, done - dispatched, emitted)
            if used_spec:
                self._ctl().observe(emitted, len(slot_map), int(n_iters_dev))
                self.engine.metrics.record("spec_tokens_per_window",
                                           emitted / max(len(slot_map), 1)
                                           / max(int(n_iters_dev), 1))
            with self._lock:
                for slot, (sid, span, n_new, sub_ts) in slot_map.items():
                    s = self._streams.get(sid)
                    if s is None:
                        continue
                    generated = tokens[slot, : int(n_gen[slot])].tolist()
                    text = self.engine.tokenizer.decode(generated, skip_special_tokens=True)
                    now = time.perf_counter()
                    s.outputs.append((span, text, now))
                    self.engine.metrics.record("chunk_e2e_latency", done - dispatched)
                    self.engine.metrics.record("chunk_submit_to_text", now - sub_ts)

    def _join_collector(self) -> None:
        c = self._collector
        if c is not None and c.is_alive():
            c.join()

    def tick(self) -> int:
        """Dispatch all pending chunks; returns the number dispatched.

        Pipelined: results become visible via drain() (which syncs) or on a
        later tick — the host prepares tick N+1 while the device runs tick N.
        """
        with self.engine.metrics.measure("serve_tick"):
            return self._tick()

    def _tick(self) -> int:
        ready = [s for s in self._streams.values() if s.pending is not None]
        if not ready:
            self._collect()
            return 0
        # init chunks: single-stream path (3D rope), then adopt into the pool
        for s in [x for x in ready if x.slot is None]:
            frames, t0, t1, sub_ts = s.pending
            s.pending = None
            q = s.query if (s.query and not s.query_sent) else None
            s.query_sent = s.query_sent or q is not None
            text = self.engine.chunk_step(s.init_state, frames, t0, t1, q, self.gen)
            now = time.perf_counter()
            s.outputs.append(((t0, t1), text, now))
            self.engine.metrics.record("chunk_submit_to_text", now - sub_ts)
            self._adopt(s)
        steady = [s for s in ready if s.pending is not None]
        if steady:
            self._run_pool(steady)
        else:
            self._collect()
        return len(ready)

    def _run_pool(self, streams: list["Stream"]) -> None:
        engine = self.engine
        # host prep: tokenize per stream, group by resolution class — each
        # grid class dispatches its own batched pool step over the shared
        # slot pool (heterogeneous streams coexist; the reference serves any
        # per-video resolution, demo/infer.py:89-94).
        preps = []
        for s in streams:
            (staged, grid), t0, t1, sub_ts = s.pending
            s.pending = None
            content = [{"type": "text", "text": f"Time={t0:.1f}-{t1:.1f}s"},
                       {"type": "video", "video": None}]
            text = chat.render_chat([{"role": "user", "content": content}],
                                    add_generation_prompt=True)
            text = chat.strip_system_for_continuation(text, engine.sys_offset)
            text = chat.expand_vision_placeholders(text, video_grid_thw=[grid])
            preps.append({"s": s, "ids": engine.tokenizer.encode(text), "grid": grid,
                          "staged": staged, "span": (t0, t1), "sub_ts": sub_ts})
        groups: dict[tuple, list[dict]] = {}
        for p in preps:
            groups.setdefault(p["grid"], []).append(p)
        # Bump host length upper-bounds, then guard EVERY adopted row
        # against the largest bucket this tick writes, BEFORE dispatching
        # any group: the batched prefill writes a bucket tile at every pool
        # row's offset (an out-of-range dynamic_update_slice start clamps
        # downward and would overwrite an idle row's history tail), and a
        # guard failing between two groups' dispatches would leave the tick
        # half-applied (first group's donated pool mutations with its
        # results dropped).
        max_bucket = 0
        charges: dict[int, int] = {}         # this tick's length growth per sid
        # lookahead verify windows transiently write up to k_draft+1 KVs
        # past the accepted frontier; reserve that overhang in the guard
        spec_extra = 0 if self._spec() is None else self._spec().k_draft + 1
        for group_preps in groups.values():
            bucket = _bucket(max(len(p["ids"]) for p in group_preps))
            max_bucket = max(max_bucket, bucket)
            for p in group_preps:
                charges[p["s"].sid] = (len(p["ids"]) + self.gen.max_new_tokens
                                       + spec_extra)
        for s in self._streams.values():
            if s.slot is None:
                continue
            need = s.length_ub + charges.get(s.sid, 0) + max_bucket
            # Per-slot staggered threshold: streams that joined together hit
            # the horizon together — compacting all of them in one tick
            # stacks 8 row rewrites into one latency spike (r3 soak: p99
            # 13.8 s vs p50 1.49 s). Earlier thresholds spread the rounds
            # across ~capacity ticks at a small headroom cost.
            stagger = s.slot * 256 if self.compact_keep else 0  # slot < capacity
            if self.compact_keep and need > self.pool_caches.max_len - stagger:
                self._compact(s)             # resets length_ub to device depth
                need = s.length_ub + charges.get(s.sid, 0) + max_bucket
            if need > self.pool_caches.max_len:
                raise RuntimeError("pool cache exhausted; raise engine.cache_len")
        for sid, charge in charges.items():
            self._streams[sid].length_ub += charge
        # dispatch FIRST (async device work), join the previous collector
        # only afterwards — joining first would serialize tick N behind
        # tick N-1's host-side drain and cost ~50 ms/tick of pipelining.
        entries = [self._dispatch(grid, group_preps)
                   for grid, group_preps in groups.items()]
        self._join_collector()
        with self._lock:
            self._inflight.extend(entries)
        # background collector surfaces results the moment the device
        # finishes, while the main thread prepares the next tick
        self._collector = threading.Thread(target=self._collect, daemon=True)
        self._collector.start()

    def _dispatch(self, grid: tuple, preps: list[dict]) -> tuple:
        """One batched prefill+decode over the pool for one resolution class."""
        engine = self.engine
        c = self.capacity
        vis0 = self._vision_aux(grid, 0)
        bucket = _bucket(max(len(p["ids"]) for p in preps))
        # capacity/overwrite guard runs in _run_pool BEFORE any dispatch

        # frames were staged at submit time; one scatter into slot order
        patches_ready = jnp.stack([p["staged"] for p in preps])
        slots_arr = jnp.asarray([p["s"].slot for p in preps])
        patches = jnp.zeros((c,) + patches_ready.shape[1:], patches_ready.dtype)
        patches = patches.at[slots_arr].set(patches_ready)

        ids = np.zeros((c, bucket), np.int32)
        valid = np.zeros((c,), np.int32)
        deltas = np.zeros((c,), np.int32)
        active = np.zeros((c,), bool)
        slot_map: dict[int, tuple] = {}
        for p in preps:
            s = p["s"]
            slot = s.slot
            slot_map[slot] = (s.sid, p["span"], len(p["ids"]), p["sub_ts"])
            ids[slot, : len(p["ids"])] = p["ids"]
            valid[slot] = len(p["ids"])
            deltas[slot] = s.rope_delta
            active[slot] = True

        use_spec = self._ctl().use_spec()
        engine._rng, sub = jax.random.split(engine._rng)
        (tokens, n_gen, self.pool_caches, self.pool_counts, self.pool_last,
         self.pool_hist, n_iters) = self._get_step(use_spec)(
            engine.params, jnp.asarray(ids), jnp.asarray(valid),
            self.pool_caches, patches, vis0.cos, vis0.sin, vis0.seg_ids,
            self.pool_counts, self.pool_last, jnp.asarray(deltas),
            jnp.asarray(active), sub, hist=self.pool_hist, group=vis0.group,
        )
        return (tokens, n_gen, slot_map, time.perf_counter(), n_iters, use_spec)
