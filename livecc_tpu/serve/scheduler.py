"""Multi-stream serving: pool-resident batched prefill/decode.

The reference serves one stream per process (demo/infer.py); the TPU target
is >=8 concurrent 1-fps 720p streams per replica (BASELINE.md north star).

Design (v2, informed by on-TPU tick profiling):
  * steady-state streams live in a fixed-capacity **slot pool**: KV caches,
    presence counts and offsets stay permanently stacked on device
    ([C, ...]); a tick runs ONE vmapped prefill + ONE vmapped fused decode
    over the whole pool with donated buffers — no per-tick cache
    stacking/unstacking (that copied ~0.5 GB/tick in v1);
  * idle slots ride along inert: valid_len 0 at prefill, ``active=False``
    at decode (their offsets, counts and caches are provably unchanged);
  * frames of all ready streams ship as ONE stacked uint8 transfer and one
    batched patchify dispatch; vision rotary/segment tables are shared
    across the pool (streams in a pool share a resolution class);
  * streams joining mid-flight run their 6-frame init chunk solo through
    the single-stream engine (3D M-RoPE positions), then their cache is
    inserted into a pool slot.

Host work per tick is O(streams) tokenization; device work is 3 dispatches.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.data import chat
from livecc_tpu.engine.generation import GenerationParams, decode_chunk, prefill
from livecc_tpu.engine.streaming import LiveCCEngine, StreamState, _bucket
from livecc_tpu.models.qwen2_vl.model import VisionInputs
from livecc_tpu.models.qwen2_vl.text import KVCache
from livecc_tpu.vision_io.patchify import device_patchify

Params = dict[str, Any]


@functools.partial(jax.jit, static_argnames=("cfg", "use_flash"),
                   donate_argnames=("caches", "counts"))
def pool_prefill(params, cfg, ids, pos, valid, caches, patches, cos, sin, seg,
                 counts, remove, *, use_flash):
    """vmapped prefill over pool slots; vision aux shared across slots."""
    def one(ids, pos, valid, cache, patches, counts, remove):
        vision = VisionInputs(patches=patches, cos=cos, sin=sin, seg_ids=seg)
        return prefill(params, cfg, ids, pos, valid, cache, vision=vision,
                       counts=counts, remove_token=remove, use_flash=use_flash)
    return jax.vmap(one)(ids, pos, valid, caches, patches, counts, remove)


def make_pool_decode(cfg: ModelConfig, gen: GenerationParams, use_flash: bool):
    @functools.partial(jax.jit, donate_argnames=("caches", "counts"))
    def run(params, logits0, caches, counts, deltas, rngs, active):
        def one(logits0, cache, counts, delta, rng, active):
            return decode_chunk(params, cfg, gen, logits0, cache, counts, delta, rng,
                                use_flash=use_flash, active=active)
        return jax.vmap(one)(logits0, caches, counts, deltas, rngs, active)
    return run


@functools.partial(jax.jit, donate_argnames=("pool_k", "pool_v", "pool_counts"))
def _insert_slot(pool_k, pool_v, pool_offsets, pool_counts, slot, k, v, offset, counts):
    return (
        pool_k.at[slot].set(k),
        pool_v.at[slot].set(v),
        pool_offsets.at[slot].set(offset),
        pool_counts.at[slot].set(counts),
    )


@dataclasses.dataclass
class Stream:
    sid: int
    resolution: tuple[int, int]
    query: str | None = None
    query_sent: bool = False
    slot: int | None = None              # pool slot once past the init chunk
    init_state: Optional[StreamState] = None
    # host shadows (mirrors of the pooled device state)
    length: int = 0
    rope_delta: int | None = None
    last_token: int = -1
    pending: Optional[tuple] = None
    outputs: list = dataclasses.field(default_factory=list)


class StreamServer:
    """Continuous batching of LiveCC streams sharing one model replica."""

    def __init__(self, engine: LiveCCEngine, gen: GenerationParams, capacity: int = 8):
        self.engine = engine
        self.gen = gen
        self.capacity = capacity
        self._streams: dict[int, Stream] = {}
        self._next_sid = 0
        self._decode = None
        # pool device state (lazy)
        self.pool_caches: Optional[KVCache] = None      # stacked [C, ...]
        self.pool_counts: Optional[jnp.ndarray] = None  # [C, 1, V]
        self._free: list[int] = list(range(capacity))

    # -- stream lifecycle -------------------------------------------------

    def add_stream(self, resolution: tuple[int, int], query: str | None = None) -> int:
        if not self._free:
            raise RuntimeError(f"server at capacity ({self.capacity} streams)")
        sid = self._next_sid
        self._next_sid += 1
        self._streams[sid] = Stream(
            sid=sid, resolution=resolution, query=query,
            init_state=self.engine.new_stream(),
        )
        return sid

    def remove_stream(self, sid: int) -> None:
        s = self._streams.pop(sid, None)
        if s is not None and s.slot is not None:
            self._free.append(s.slot)

    def submit_chunk(self, sid: int, frames: np.ndarray, t0: float, t1: float) -> None:
        """Queue one chunk ([T, H, W, 3] uint8 pre-scaled frames)."""
        self._streams[sid].pending = (frames, t0, t1)

    def drain(self, sid: int) -> list[tuple[tuple[float, float], str]]:
        out = self._streams[sid].outputs
        self._streams[sid].outputs = []
        return out

    # -- pool management ----------------------------------------------------

    def _ensure_pool(self) -> None:
        if self.pool_caches is not None:
            return
        engine = self.engine
        cache = KVCache.zeros(engine.cfg.text, 1, engine.cache_len, engine.cache_dtype)
        self.pool_caches = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (self.capacity,) + x.shape).copy(), cache
        )
        self.pool_counts = jnp.zeros(
            (self.capacity, 1, engine.cfg.text.vocab_size), jnp.int32
        )

    def _adopt(self, s: Stream) -> None:
        """Move a freshly-initialized stream's cache into a pool slot."""
        self._ensure_pool()
        slot = self._free.pop(0)
        st = s.init_state
        if st.cache.max_len != self.pool_caches.max_len:
            raise RuntimeError("stream cache grew past the pool size; raise cache_len")
        k, v, off, counts = _insert_slot(
            self.pool_caches.k, self.pool_caches.v, self.pool_caches.offset,
            self.pool_counts, slot, st.cache.k, st.cache.v, st.cache.offset, st.counts,
        )
        self.pool_caches = KVCache(k, v, off)
        self.pool_counts = counts
        s.slot = slot
        s.length = st.length
        s.rope_delta = st.rope_delta
        s.last_token = st.last_token
        s.init_state = None

    # -- execution ---------------------------------------------------------

    def tick(self) -> int:
        """Execute all pending chunks; returns number of chunks processed."""
        with self.engine.metrics.measure("serve_tick"):
            return self._tick()

    def _tick(self) -> int:
        ready = [s for s in self._streams.values() if s.pending is not None]
        if not ready:
            return 0
        # init chunks: single-stream path (3D rope), then adopt into the pool
        for s in [x for x in ready if x.slot is None]:
            frames, t0, t1 = s.pending
            s.pending = None
            q = s.query if (s.query and not s.query_sent) else None
            s.query_sent = s.query_sent or q is not None
            text = self.engine.chunk_step(s.init_state, frames, t0, t1, q, self.gen)
            s.outputs.append(((t0, t1), text))
            self._adopt(s)
        steady = [s for s in ready if s.pending is not None]
        if steady:
            self._run_pool(steady)
        return len(ready)

    def _run_pool(self, streams: list["Stream"]) -> None:
        engine = self.engine
        c = self.capacity
        # host prep: tokenize per stream, one frames stack
        preps = []
        for s in streams:
            frames, t0, t1 = s.pending
            s.pending = None
            content = [{"type": "text", "text": f"Time={t0:.1f}-{t1:.1f}s"},
                       {"type": "video", "video": None}]
            text = chat.render_chat([{"role": "user", "content": content}],
                                    add_generation_prompt=True)
            text = chat.strip_system_for_continuation(text, engine.sys_offset)
            t, h, w = (frames.shape[0], frames.shape[1], frames.shape[2])
            grid = (max(t // engine.cfg.vision.temporal_patch_size, 1),
                    h // engine.cfg.vision.patch_size, w // engine.cfg.vision.patch_size)
            text = chat.expand_vision_placeholders(text, video_grid_thw=[grid])
            preps.append({"s": s, "ids": engine.tokenizer.encode(text), "grid": grid,
                          "frames": frames, "span": (t0, t1)})
        grid = preps[0]["grid"]
        if any(p["grid"] != grid for p in preps):
            raise RuntimeError("streams in one pool must share a resolution class")
        n = grid[0] * grid[1] * grid[2]
        from livecc_tpu.engine.streaming import PATCH_BUCKET
        n_pad = -n % PATCH_BUCKET
        # shared vision aux (cached per grid inside the engine)
        _, vis0 = engine._device_vision(preps[0]["frames"])
        # batched patchify: one transfer, one dispatch
        stacked = np.stack([p["frames"] for p in preps])
        patches_ready = jax.vmap(
            lambda f: device_patchify(f, n_pad=n_pad)
        )(jnp.asarray(stacked))
        slots_arr = jnp.asarray([p["s"].slot for p in preps])
        patches = jnp.zeros((c,) + patches_ready.shape[1:], patches_ready.dtype)
        patches = patches.at[slots_arr].set(patches_ready)   # one scatter
        bucket = _bucket(max(len(p["ids"]) for p in preps))
        ids = np.zeros((c, 1, bucket), np.int32)
        pos = np.zeros((c, 3, 1, bucket), np.int32)
        valid = np.zeros((c,), np.int32)
        deltas = np.zeros((c, 1, 1), np.int32)
        removes = np.full((c,), -1, np.int32)
        active = np.zeros((c,), bool)
        slot_of = {}
        for i, p in enumerate(preps):
            s = p["s"]
            slot = s.slot
            slot_of[slot] = p
            k = len(p["ids"])
            ids[slot, 0, :k] = p["ids"]
            pos[slot] = np.broadcast_to(
                (np.arange(bucket) + s.length + s.rope_delta)[None, None], (3, 1, bucket)
            )
            valid[slot] = k
            deltas[slot, 0, 0] = s.rope_delta
            removes[slot] = s.last_token
            active[slot] = True

        logits0, self.pool_caches, self.pool_counts = pool_prefill(
            engine.params, engine.cfg, jnp.asarray(ids), jnp.asarray(pos),
            jnp.asarray(valid), self.pool_caches, patches,
            vis0.cos, vis0.sin, vis0.seg_ids,
            self.pool_counts, jnp.asarray(removes), use_flash=engine.use_flash,
        )
        if self._decode is None:
            self._decode = make_pool_decode(engine.cfg, self.gen, engine.use_flash)
        engine._rng, sub = jax.random.split(engine._rng)
        rngs = jax.random.split(sub, c)
        tokens, n_gen, self.pool_caches, self.pool_counts = self._decode(
            engine.params, logits0, self.pool_caches, self.pool_counts,
            jnp.asarray(deltas), rngs, jnp.asarray(active),
        )
        tokens = np.asarray(tokens)
        n_gen = np.asarray(n_gen)
        for slot, p in slot_of.items():
            s = p["s"]
            generated = tokens[slot, 0, : int(n_gen[slot, 0])].tolist()
            s.length += len(p["ids"]) + max(len(generated) - 1, 0)
            s.last_token = generated[-1] if generated else -1
            s.outputs.append((p["span"], engine.tokenizer.decode(generated, skip_special_tokens=True)))
