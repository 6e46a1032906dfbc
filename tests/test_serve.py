"""Multi-stream server: batched steady-state execution == single-stream engine."""

import os

import numpy as np
import pytest

from livecc_tpu.core.config import tiny_config
from livecc_tpu.data.tokenizer import ByteTokenizer
from livecc_tpu.engine import GenerationParams, LiveCCEngine
from livecc_tpu.models import qwen2_vl as m
from livecc_tpu.serve.scheduler import StreamServer

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "hf_tiny.npz")


def build_engine():
    g = np.load(GOLDEN)
    cfg = tiny_config()
    state = {k[len("state::"):]: g[k] for k in g.files if k.startswith("state::")}
    params = m.convert_state_dict(state, cfg)
    return LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=512)


def frames(seed, n=2):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, size=(n, 28, 28, 3), dtype=np.uint8)


def gen_for(engine, max_new=4):
    return GenerationParams(max_new_tokens=max_new, eos_token_id=engine.cfg.eos_token_id,
                            pad_token_id=engine.cfg.pad_token_id)


def test_batched_matches_single_stream():
    # single-stream reference trace
    engine_a = build_engine()
    gen = gen_for(engine_a)
    state = engine_a.new_stream()
    ref = []
    ref.append(engine_a.chunk_step(state, frames(0, 6), 0.0, 3.0, "q", gen))
    ref.append(engine_a.chunk_step(state, frames(1), 3.0, 4.0, None, gen))
    ref.append(engine_a.chunk_step(state, frames(2), 4.0, 5.0, None, gen))

    # server with two concurrent streams; stream 0 gets the same inputs
    engine_b = build_engine()
    server = StreamServer(engine_b, gen_for(engine_b))
    s0 = server.add_stream((28, 28), query="q")
    s1 = server.add_stream((28, 28), query="other")
    server.submit_chunk(s0, frames(0, 6), 0.0, 3.0)
    server.submit_chunk(s1, frames(9, 6), 0.0, 3.0)
    assert server.tick() == 2
    server.submit_chunk(s0, frames(1), 3.0, 4.0)
    server.submit_chunk(s1, frames(8), 3.0, 4.0)
    assert server.tick() == 2
    server.submit_chunk(s0, frames(2), 4.0, 5.0)
    server.submit_chunk(s1, frames(7), 4.0, 5.0)
    server.tick()

    out0 = [text for _, text in server.drain(s0)]
    out1 = [text for _, text in server.drain(s1)]
    assert out0 == ref, (out0, ref)
    assert len(out1) == 3
    # streams are independent: different inputs -> (almost surely) different state
    assert out0 != out1 or server._streams[s0].length_ub != server._streams[s1].length_ub


def test_stream_join_and_remove():
    engine = build_engine()
    server = StreamServer(engine, gen_for(engine))
    s0 = server.add_stream((28, 28), query="q")
    server.submit_chunk(s0, frames(0, 6), 0.0, 3.0)
    server.tick()
    # a new stream joins later: its init chunk runs solo while s0 batches
    s1 = server.add_stream((28, 28), query="late")
    server.submit_chunk(s0, frames(1), 3.0, 4.0)
    server.submit_chunk(s1, frames(2, 6), 0.0, 3.0)
    assert server.tick() == 2
    assert len(server.drain(s0)) == 2
    assert len(server.drain(s1)) == 1
    server.remove_stream(s1)
    server.submit_chunk(s0, frames(3), 4.0, 5.0)
    assert server.tick() == 1


def test_capacity_enforced():
    engine = build_engine()
    server = StreamServer(engine, gen_for(engine), capacity=2)
    server.add_stream((28, 28))
    server.add_stream((28, 28))
    with pytest.raises(RuntimeError, match="capacity"):
        server.add_stream((28, 28))


def frames_hw(seed, h, w, n=2):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, size=(n, h, w, 3), dtype=np.uint8)


def test_mixed_resolution_pool():
    """Streams of different resolution classes share one server: each grid
    class dispatches its own batched step over the common slot pool, and
    per-stream outputs match the single-stream engine exactly."""
    engine_a = build_engine()
    gen = gen_for(engine_a)
    st = engine_a.new_stream()
    ref = [engine_a.chunk_step(st, frames_hw(0, 28, 28, 6), 0.0, 3.0, "q", gen),
           engine_a.chunk_step(st, frames_hw(1, 28, 28), 3.0, 4.0, None, gen)]
    st2 = engine_a.new_stream()
    ref2 = [engine_a.chunk_step(st2, frames_hw(5, 28, 56, 6), 0.0, 3.0, "w", gen),
            engine_a.chunk_step(st2, frames_hw(6, 28, 56), 3.0, 4.0, None, gen)]

    engine_b = build_engine()
    server = StreamServer(engine_b, gen_for(engine_b))
    s0 = server.add_stream((28, 28), query="q")
    s1 = server.add_stream((28, 56), query="w")    # different grid class
    server.submit_chunk(s0, frames_hw(0, 28, 28, 6), 0.0, 3.0)
    server.submit_chunk(s1, frames_hw(5, 28, 56, 6), 0.0, 3.0)
    assert server.tick() == 2
    server.submit_chunk(s0, frames_hw(1, 28, 28), 3.0, 4.0)
    server.submit_chunk(s1, frames_hw(6, 28, 56), 3.0, 4.0)
    assert server.tick() == 2
    server.flush()
    assert [t for _, t in server.drain(s0)] == ref
    assert [t for _, t in server.drain(s1)] == ref2


def test_warmup_compiles_without_state_change():
    engine = build_engine()
    server = StreamServer(engine, gen_for(engine))
    server.warmup([(28, 28), (28, 56)])
    # real serving after warmup produces the same outputs as a cold server
    engine2 = build_engine()
    cold = StreamServer(engine2, gen_for(engine2))
    for srv in (server, cold):
        sid = srv.add_stream((28, 28), query="q")
        srv.submit_chunk(sid, frames(0, 6), 0.0, 3.0)
        srv.tick()
        srv.submit_chunk(sid, frames(1), 3.0, 4.0)
        srv.tick()
        srv.flush()
    warm_out = [t for _, t in server.drain(0)]
    cold_out = [t for _, t in cold.drain(0)]
    assert warm_out == cold_out and len(warm_out) == 2


def test_remove_stream_with_inflight_results():
    """Removing a stream whose results are still in flight must not corrupt
    other streams or crash collection."""
    engine = build_engine()
    server = StreamServer(engine, gen_for(engine), capacity=3)
    s0 = server.add_stream((28, 28), query="a")
    s1 = server.add_stream((28, 28), query="b")
    for sid, seed in ((s0, 0), (s1, 9)):
        server.submit_chunk(sid, frames(seed, 6), 0.0, 3.0)
    server.tick()
    server.submit_chunk(s0, frames(1), 3.0, 4.0)
    server.submit_chunk(s1, frames(2), 3.0, 4.0)
    server.tick()                       # results in flight
    server.remove_stream(s1)            # forces collect; s1 vanishes
    out0 = server.drain(s0)
    assert len(out0) == 2               # s0 unaffected
    # freed slot is reusable
    s2 = server.add_stream((28, 28), query="c")
    server.submit_chunk(s2, frames(3, 6), 0.0, 3.0)
    assert server.tick() == 1


def test_prefix_adoption_small_init_cache_matches():
    """Init streams start with a SMALL solo cache that is prefix-copied
    into a larger pool slot (add_stream caps the init cache so N joining
    streams don't hold N full-length caches next to the pool). Server
    output must be token-identical to the solo engine at the pool size."""
    # solo reference at the full cache length
    engine_a = build_engine()
    gen = gen_for(engine_a)
    st = engine_a.new_stream()
    ref = [engine_a.chunk_step(st, frames(0, 6), 0.0, 3.0, "q", gen)]
    for i in range(3):
        ref.append(engine_a.chunk_step(st, frames(i + 1), 3.0 + i, 4.0 + i, None, gen))

    # server whose pool is larger than the init cache: force the prefix path
    engine_b = build_engine()
    srv = StreamServer(engine_b, gen, capacity=2)
    sid = srv.add_stream((28, 28), query="q")
    assert srv._streams[sid].init_state.cache.max_len < engine_b.cache_len or \
        engine_b.cache_len <= 2048
    # shrink the init cache further to guarantee init < pool in this config
    srv._streams[sid].init_state = engine_b.new_stream(cache_len=128)
    srv.submit_chunk(sid, frames(0, 6), 0.0, 3.0)
    srv.tick()
    for i in range(3):
        srv.submit_chunk(sid, frames(i + 1), 3.0 + i, 4.0 + i)
        srv.tick()
    srv.flush()
    out = [t for _, t in srv.drain(sid)]
    assert out == ref


def test_compact_slot_retains_sink_and_recent():
    """_compact_slot keeps the sink prefix + the most recent window and
    resets the row's offset; other rows untouched."""
    import jax.numpy as jnp
    from livecc_tpu.models.qwen2_vl.text import KVCache
    from livecc_tpu.serve.scheduler import _compact_slot

    cfg = tiny_config()
    c, smax = 3, 64
    cache = KVCache.zeros(cfg.text, c, smax)
    # fill row 1 with position-identifying values up to off=48
    k = np.array(cache.k)                      # writable copy
    k[:, 1, :, :, 0] = np.arange(smax)[None, None, :]
    cache = KVCache(jnp.asarray(k), cache.v, cache.offset.at[1].set(48),
                    cache.k_scale, cache.v_scale)
    sink, keep = 8, 16
    out = _compact_slot(cache, jnp.int32(1), jnp.int32(sink), jnp.int32(keep))
    assert int(out.offset[1]) == sink + keep
    row = np.asarray(out.k)[:, 1, :, :, 0]
    np.testing.assert_array_equal(row[0, 0, :sink], np.arange(sink))
    np.testing.assert_array_equal(row[0, 0, sink:sink + keep],
                                  np.arange(48 - keep, 48))
    # untouched rows keep offset 0
    assert int(out.offset[0]) == 0 and int(out.offset[2]) == 0


def test_compaction_keeps_session_alive_past_pool_exhaustion():
    """A stream whose history would exhaust the pool survives via
    compaction; positions stay globally continuous (offset+delta invariant)
    and the session keeps producing output."""
    engine = build_engine()           # cache_len 512
    server = StreamServer(engine, gen_for(engine), compact_keep=128,
                          compact_sink_cap=64)
    s0 = server.add_stream((28, 28), query="q")
    server.submit_chunk(s0, frames(0, 6), 0.0, 3.0)
    server.tick()
    server.flush()
    s = server._streams[s0]
    global_len = lambda: s.length_ub + s.rope_delta   # invariant under compaction
    outs = []
    t = 3.0
    compactions = 0
    for i in range(40):               # way past 512 tokens of history
        before = engine.metrics.summary("cache_compaction_dropped_tokens").get("n", 0)
        server.submit_chunk(s0, frames(i + 1), t, t + 1.0)
        server.tick()
        server.flush()
        after = engine.metrics.summary("cache_compaction_dropped_tokens").get("n", 0)
        if after > before:
            compactions += 1
        # the host length shadow must stay an UPPER bound on device depth
        assert s.length_ub >= int(np.asarray(server.pool_caches.offset[s.slot]))
        outs.extend(server.drain(s0))
        t += 1.0
    assert compactions >= 1, "pool never compacted"
    assert len(outs) == 41            # init + every steady chunk produced output
    # device offset stays within the pool; rope positions moved far beyond it
    assert int(np.asarray(server.pool_caches.offset[s.slot])) <= 512
    assert global_len() > 512


def test_compaction_disabled_raises():
    engine = build_engine()
    server = StreamServer(engine, gen_for(engine), compact_keep=0)
    s0 = server.add_stream((28, 28), query="q")
    server.submit_chunk(s0, frames(0, 6), 0.0, 3.0)
    server.tick()
    with pytest.raises(RuntimeError, match="pool cache exhausted"):
        t = 3.0
        for i in range(40):
            server.submit_chunk(s0, frames(i + 1), t, t + 1.0)
            server.tick()
            t += 1.0


def test_snapshot_restore_resumes_sessions(tmp_path):
    """A server restart restores live sessions mid-video: the restored
    server produces EXACTLY the continuation the uninterrupted server
    would (same cache rows, counts, rope deltas)."""
    engine_a = build_engine()
    server_a = StreamServer(engine_a, gen_for(engine_a))
    s0 = server_a.add_stream((28, 28), query="q")
    s1 = server_a.add_stream((28, 28), query="w")
    server_a.submit_chunk(s0, frames(0, 6), 0.0, 3.0)
    server_a.submit_chunk(s1, frames(9, 6), 0.0, 3.0)
    server_a.tick()
    server_a.submit_chunk(s0, frames(1), 3.0, 4.0)
    server_a.submit_chunk(s1, frames(8), 3.0, 4.0)
    server_a.tick()
    server_a.flush()
    server_a.drain(s0), server_a.drain(s1)
    path = str(tmp_path / "sessions.npz")
    server_a.snapshot(path)
    # uninterrupted continuation (the reference trace)
    server_a.submit_chunk(s0, frames(2), 4.0, 5.0)
    server_a.submit_chunk(s1, frames(7), 4.0, 5.0)
    server_a.tick()
    server_a.flush()
    ref0 = [t for _, t in server_a.drain(s0)]
    ref1 = [t for _, t in server_a.drain(s1)]

    # "crashed" process: fresh engine + server, restore, continue
    engine_b = build_engine()
    server_b = StreamServer(engine_b, gen_for(engine_b))
    r0, r1 = server_b.restore(path)
    server_b.submit_chunk(r0, frames(2), 4.0, 5.0)
    server_b.submit_chunk(r1, frames(7), 4.0, 5.0)
    server_b.tick()
    server_b.flush()
    out0 = [t for _, t in server_b.drain(r0)]
    out1 = [t for _, t in server_b.drain(r1)]
    assert out0 == ref0 and out1 == ref1


def test_compact_noop_when_window_covers_history():
    """sink + keep >= offset: compaction must be an exact no-op (boundary
    correctness — the quality-affecting path only ever triggers when
    history genuinely exceeds the window)."""
    import jax.numpy as jnp
    from livecc_tpu.engine.compact import compact_cache_row
    from livecc_tpu.models.qwen2_vl.text import KVCache

    cfg = tiny_config()
    cache = KVCache.zeros(cfg.text, 2, 64)
    k = np.array(cache.k)
    k[:, 1, :, :, 0] = np.arange(64)[None, None, :]
    cache = KVCache(jnp.asarray(k), cache.v, cache.offset.at[1].set(20),
                    cache.k_scale, cache.v_scale)
    out = compact_cache_row(cache, jnp.int32(1), jnp.int32(8), jnp.int32(40))
    assert int(out.offset[1]) == 20                    # unchanged
    np.testing.assert_array_equal(np.asarray(out.k)[:, 1, :, :20, 0],
                                  np.asarray(k)[:, 1, :, :20, 0])


def test_snapshot_restore_int8_pool(tmp_path):
    """Snapshot/restore round-trips the QUANTIZED pool (int8 rows + lane-
    major scales) with token-identical continuation."""
    import jax.numpy as jnp

    g = np.load(GOLDEN)
    cfg = tiny_config()
    state = {k[len("state::"):]: g[k] for k in g.files if k.startswith("state::")}
    params = m.convert_state_dict(state, cfg)

    def mk():
        eng = LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=512,
                           cache_dtype=jnp.int8)
        return eng, StreamServer(eng, gen_for(eng))

    _, server_a = mk()
    s0 = server_a.add_stream((28, 28), query="q")
    server_a.submit_chunk(s0, frames(0, 6), 0.0, 3.0)
    server_a.tick()
    server_a.flush()
    server_a.drain(s0)
    path = str(tmp_path / "int8.npz")
    server_a.snapshot(path)
    server_a.submit_chunk(s0, frames(1), 3.0, 4.0)
    server_a.tick()
    server_a.flush()
    ref = [t for _, t in server_a.drain(s0)]

    _, server_b = mk()
    (r0,) = server_b.restore(path)
    assert server_b.pool_caches.quantized
    server_b.submit_chunk(r0, frames(1), 3.0, 4.0)
    server_b.tick()
    server_b.flush()
    assert [t for _, t in server_b.drain(r0)] == ref


def test_pool_lookahead_matches_plain_pool():
    """Pool-level fused lookahead (engine.spec): identical texts to the
    plain pool decode for the same streams/inputs (greedy, XLA path), with
    the pool's token-history shadow threaded through adoption and ticks."""
    from livecc_tpu.engine import SpecConfig
    from livecc_tpu.models.qwen2_vl.model import init_params
    import jax

    def build(spec):
        cfg = tiny_config()
        params = init_params(cfg, jax.random.PRNGKey(11))
        return LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=512, spec=spec)

    outs = {}
    for name, spec in (("plain", None), ("spec", SpecConfig(k_draft=3))):
        engine = build(spec)
        server = StreamServer(engine, gen_for(engine, max_new=5))
        s0 = server.add_stream((28, 28), query="q")
        s1 = server.add_stream((28, 28), query="other")
        t = 3.0
        server.submit_chunk(s0, frames(0, 6), 0.0, 3.0)
        server.submit_chunk(s1, frames(9, 6), 0.0, 3.0)
        server.tick()
        for i in range(3):
            server.submit_chunk(s0, frames(1 + i), t, t + 1.0)
            server.submit_chunk(s1, frames(8 - i), t, t + 1.0)
            server.tick()
            t += 1.0
        outs[name] = ([x for _, x in server.drain(s0)],
                      [x for _, x in server.drain(s1)])
        if spec is not None:
            assert server.pool_hist is not None
    assert outs["spec"] == outs["plain"]


def test_pool_lookahead_compaction_and_snapshot(tmp_path):
    """Lookahead pool across the horizon + snapshot/restore with hist."""
    from livecc_tpu.engine import SpecConfig
    from livecc_tpu.models.qwen2_vl.model import init_params
    import jax

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(12))
    engine = LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=256,
                          spec=SpecConfig(k_draft=3))
    server = StreamServer(engine, gen_for(engine, max_new=4),
                          compact_keep=64, compact_sink_cap=32)
    sid = server.add_stream((28, 28), query="q")
    server.submit_chunk(sid, frames(0, 6), 0.0, 3.0)
    server.tick()
    t = 3.0
    for i in range(8):
        server.submit_chunk(sid, frames(i + 1), t, t + 1.0)
        server.tick()
        t += 1.0
    server.flush()
    assert engine.metrics.summary("cache_compaction_dropped_tokens").get("n", 0) > 0
    out_a = [x for _, x in server.drain(sid)]
    assert len(out_a) == 9

    path = str(tmp_path / "snap.npz")
    server.snapshot(path)
    engine2 = LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=256,
                           spec=SpecConfig(k_draft=3))
    server2 = StreamServer(engine2, gen_for(engine2, max_new=4),
                           compact_keep=64, compact_sink_cap=32)
    (rid,) = server2.restore(path)
    # restored hist row equals the snapshotted one
    np.testing.assert_array_equal(
        np.asarray(server.pool_hist[server._streams[sid].slot]),
        np.asarray(server2.pool_hist[server2._streams[rid].slot]))
    # both servers continue identically
    server.submit_chunk(sid, frames(40), t, t + 1.0)
    server.tick(); server.flush()
    server2.submit_chunk(rid, frames(40), t, t + 1.0)
    server2.tick(); server2.flush()
    a = [x for _, x in server.drain(sid)]
    b = [x for _, x in server2.drain(rid)]
    assert a == b


def test_drain_timed_availability_timestamps():
    """drain_timed stamps each output with the wall-clock its text became
    available, and the server records chunk_submit_to_text per chunk —
    submit ts <= avail ts, one metric sample per drained row. (A paced
    harness polling drain() would otherwise measure its own polling
    cadence; the r5 soak overstated p50 by ~1 pace this way.)"""
    import time

    engine = build_engine()
    server = StreamServer(engine, gen_for(engine))
    s0 = server.add_stream((28, 28), query="q")

    before = time.perf_counter()
    server.submit_chunk(s0, frames(0, 6), 0.0, 3.0)
    server.tick()
    server.submit_chunk(s0, frames(1), 3.0, 4.0)
    server.tick()
    server.flush()
    after = time.perf_counter()

    rows = server.drain_timed(s0)
    assert [span for span, _, _ in rows] == [(0.0, 3.0), (3.0, 4.0)]
    for _, text, ts in rows:
        assert isinstance(text, str)
        assert before <= ts <= after
    # timestamps are ordered with the chunks
    assert rows[0][2] <= rows[1][2]
    m_ = engine.metrics.summary("chunk_submit_to_text")
    assert m_["n"] == 2
    assert m_["max"] <= after - before
    # drain() keeps its 2-tuple API
    server.submit_chunk(s0, frames(2), 4.0, 5.0)
    server.tick()
    server.flush()
    out = server.drain(s0)
    assert len(out) == 1 and len(out[0]) == 2
