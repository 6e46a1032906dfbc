"""Multi-stream serving: batched prefill/decode over concurrent streams.

The reference serves one stream per process (demo/infer.py); the TPU target
is >=8 concurrent 1-fps 720p streams per replica (BASELINE.md north star).
Design:

  * each stream keeps its own static KV cache, counts and cursors;
  * per tick, every stream with a ready 2-frame chunk is grouped by *shape
    class* (token bucket, vision patch bucket, cache size) and executed as
    ONE vmapped prefill + ONE vmapped fused decode — the single-stream jit
    programs composed with ``jax.vmap`` (params broadcast), so MXU work
    batches across streams instead of round-robining dispatches;
  * streams joining mid-flight run their 6-frame init chunk solo, then join
    the steady-state batch.

Host work per tick is O(streams): tokenize + ship uint8 frames; everything
else is two dispatches per shape group.
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
from livecc_tpu.engine.streaming import LiveCCEngine, StreamState
from livecc_tpu.models.qwen2_vl.model import VisionInputs

Params = dict[str, Any]


@functools.partial(jax.jit, static_argnames=("cfg", "use_flash"),
                   donate_argnames=("caches", "counts"))
def batched_prefill(params, cfg, ids, pos, valid, caches, visions, counts, remove, *, use_flash):
    """vmap of engine.prefill over a leading stream axis (params broadcast)."""
    def one(ids, pos, valid, cache, vision, counts, remove):
        return prefill(params, cfg, ids, pos, valid, cache, vision=vision,
                       counts=counts, remove_token=remove, use_flash=use_flash)
    return jax.vmap(one)(ids, pos, valid, caches, visions, counts, remove)


def make_batched_decode(cfg: ModelConfig, gen: GenerationParams, use_flash: bool):
    @functools.partial(jax.jit, donate_argnames=("caches", "counts"))
    def run(params, logits0, caches, counts, deltas, rngs):
        def one(logits0, cache, counts, delta, rng):
            return decode_chunk(params, cfg, gen, logits0, cache, counts, delta, rng,
                                use_flash=use_flash)
        return jax.vmap(one)(logits0, caches, counts, deltas, rngs)
    return run


@dataclasses.dataclass
class Stream:
    sid: int
    state: StreamState
    resolution: tuple[int, int]        # (h, w) of incoming pre-scaled frames
    query: str | None = None
    query_sent: bool = False
    pending: Optional[tuple] = None    # (frames, t0, t1) awaiting execution
    outputs: list = dataclasses.field(default_factory=list)


class StreamServer:
    """Continuous batching of LiveCC streams sharing one model replica."""

    def __init__(self, engine: LiveCCEngine, gen: GenerationParams):
        self.engine = engine
        self.gen = gen
        self._decoders: dict[bool, Any] = {}
        self._streams: dict[int, Stream] = {}
        self._next_sid = 0

    # -- stream lifecycle -------------------------------------------------

    def add_stream(self, resolution: tuple[int, int], query: str | None = None) -> int:
        sid = self._next_sid
        self._next_sid += 1
        self._streams[sid] = Stream(
            sid=sid, state=self.engine.new_stream(), resolution=resolution, query=query
        )
        return sid

    def remove_stream(self, sid: int) -> None:
        self._streams.pop(sid, None)

    def submit_chunk(self, sid: int, frames: np.ndarray, t0: float, t1: float) -> None:
        """Queue one chunk ([T, H, W, 3] uint8 pre-scaled frames)."""
        self._streams[sid].pending = (frames, t0, t1)

    def drain(self, sid: int) -> list[tuple[tuple[float, float], str]]:
        out = self._streams[sid].outputs
        self._streams[sid].outputs = []
        return out

    # -- execution ---------------------------------------------------------

    def tick(self) -> int:
        """Execute all pending chunks; returns number of chunks processed."""
        ready = [s for s in self._streams.values() if s.pending is not None]
        if not ready:
            return 0
        solo = [s for s in ready if s.state.rope_delta is None]
        steady = [s for s in ready if s.state.rope_delta is not None]
        # init chunks run through the single-stream path (3D rope positions)
        for s in solo:
            frames, t0, t1 = s.pending
            s.pending = None
            q = s.query if (s.query and not s.query_sent) else None
            s.query_sent = s.query_sent or q is not None
            text = self.engine.chunk_step(s.state, frames, t0, t1, q, self.gen)
            s.outputs.append(((t0, t1), text))
        # steady-state chunks batch by shape class
        groups: dict[tuple, list[Stream]] = {}
        for s in steady:
            prep = self._prepare(s)
            key = prep["key"]
            groups.setdefault(key, []).append((s, prep))  # type: ignore[arg-type]
        for key, members in groups.items():
            self._run_group([m[0] for m in members], [m[1] for m in members])
        return len(ready)

    def _prepare(self, s: Stream) -> dict:
        engine = self.engine
        frames, t0, t1 = s.pending
        s.pending = None
        grid, vision = engine._device_vision(frames)
        content = [{"type": "text", "text": f"Time={t0:.1f}-{t1:.1f}s"},
                   {"type": "video", "video": None}]
        text = chat.render_chat([{"role": "user", "content": content}], add_generation_prompt=True)
        text = chat.strip_system_for_continuation(text, engine.sys_offset)
        text = chat.expand_vision_placeholders(text, video_grid_thw=[grid])
        new_ids = engine.tokenizer.encode(text)
        from livecc_tpu.engine.streaming import _bucket
        bucket = _bucket(len(new_ids))
        engine._ensure_capacity(s.state, bucket + self.gen.max_new_tokens + 1)
        key = (bucket, vision.patches.shape[0], s.state.cache.max_len)
        return {"key": key, "ids": new_ids, "bucket": bucket, "vision": vision,
                "span": (t0, t1)}

    def _run_group(self, streams: list[Stream], preps: list[dict]) -> None:
        engine = self.engine
        n = len(streams)
        bucket = preps[0]["bucket"]
        ids = np.zeros((n, 1, bucket), np.int32)
        pos = np.zeros((n, 3, 1, bucket), np.int32)
        valid = np.zeros((n,), np.int32)
        deltas = np.zeros((n, 1, 1), np.int32)
        removes = np.zeros((n,), np.int32)
        for i, (s, p) in enumerate(zip(streams, preps)):
            k = len(p["ids"])
            ids[i, 0, :k] = p["ids"]
            off = s.state.length
            pos[i] = np.broadcast_to(
                (np.arange(bucket) + off + s.state.rope_delta)[None, None], (3, 1, bucket)
            )
            valid[i] = k
            deltas[i, 0, 0] = s.state.rope_delta
            removes[i] = s.state.last_token
        caches = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[s.state.cache for s in streams])
        counts = jnp.stack([s.state.counts for s in streams])
        visions = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[p["vision"] for p in preps])

        logits0, caches, counts = batched_prefill(
            engine.params, engine.cfg, jnp.asarray(ids), jnp.asarray(pos),
            jnp.asarray(valid), caches, visions, counts, jnp.asarray(removes),
            use_flash=engine.use_flash,
        )
        decode = self._decoders.get(engine.use_flash)
        if decode is None:
            decode = make_batched_decode(engine.cfg, self.gen, engine.use_flash)
            self._decoders[engine.use_flash] = decode
        engine._rng, sub = jax.random.split(engine._rng)
        rngs = jax.random.split(sub, n)
        tokens, n_gen, caches, counts = decode(
            engine.params, logits0, caches, counts, jnp.asarray(deltas), rngs
        )
        tokens = np.asarray(tokens)
        n_gen = np.asarray(n_gen)
        for i, (s, p) in enumerate(zip(streams, preps)):
            s.state.cache = jax.tree_util.tree_map(lambda x: x[i], caches)
            s.state.counts = counts[i]
            generated = tokens[i, 0, : int(n_gen[i, 0])].tolist()
            s.state.past_ids = s.state.past_ids + p["ids"] + generated[:-1]
            s.state.length += len(p["ids"]) + max(len(generated) - 1, 0)
            s.state.last_token = generated[-1] if generated else -1
            s.outputs.append((p["span"], engine.tokenizer.decode(generated, skip_special_tokens=True)))
