"""Tensor-parallel serving: sharded params produce identical generations.

The 7B does not fit one v5e chip (SURVEY.md §7 hard parts); serving shards
the LLM along the mesh model axis (parallel/sharding.py megatron layout).
This validates on the 8-virtual-device CPU mesh that prefill + fused decode
under TP produce token-identical output to the unsharded engine.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from livecc_tpu.core.config import tiny_config
from livecc_tpu.core.mesh import make_mesh
from livecc_tpu.data.tokenizer import ByteTokenizer
from livecc_tpu.engine import GenerationParams, LiveCCEngine
from livecc_tpu.models import qwen2_vl as m
from livecc_tpu.parallel.sharding import shard_params

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "hf_tiny.npz")


def build(params):
    cfg = tiny_config()
    return LiveCCEngine(params, cfg, ByteTokenizer(), cache_len=256)


def frames(seed, n=2):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, size=(n, 28, 28, 3), dtype=np.uint8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_sharded_pool_server_matches():
    """The 7B serving topology end to end: the POOL server (continuous
    batching, fused pool step) over TP-sharded params produces outputs
    token-identical to the unsharded pool server."""
    from livecc_tpu.serve.scheduler import StreamServer

    g = np.load(GOLDEN)
    cfg = tiny_config()
    state = {k[len("state::"):]: g[k] for k in g.files if k.startswith("state::")}
    params = m.convert_state_dict(state, cfg)

    def drive(srv):
        s0 = srv.add_stream((28, 28), query="q")
        s1 = srv.add_stream((28, 28), query="w")
        srv.submit_chunk(s0, frames(0, 6), 0.0, 3.0)
        srv.submit_chunk(s1, frames(9, 6), 0.0, 3.0)
        srv.tick()
        srv.submit_chunk(s0, frames(1), 3.0, 4.0)
        srv.submit_chunk(s1, frames(8), 3.0, 4.0)
        srv.tick()
        srv.flush()
        return [[t for _, t in srv.drain(s)] for s in (s0, s1)]

    gen = GenerationParams(max_new_tokens=4, eos_token_id=cfg.eos_token_id,
                           pad_token_id=cfg.pad_token_id)
    ref = drive(StreamServer(build(params), gen, capacity=2))

    mesh = make_mesh(n_data=2, n_model=4, devices=jax.devices()[:8])
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        out = drive(StreamServer(build(sharded), gen, capacity=2))
    assert out == ref


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_sharded_generation_matches():
    g = np.load(GOLDEN)
    cfg = tiny_config()
    state = {k[len("state::"):]: g[k] for k in g.files if k.startswith("state::")}
    params = m.convert_state_dict(state, cfg)

    engine_ref = build(params)
    gen = GenerationParams(max_new_tokens=4, eos_token_id=cfg.eos_token_id,
                           pad_token_id=cfg.pad_token_id)
    st = engine_ref.new_stream()
    ref = [engine_ref.chunk_step(st, frames(0, 6), 0.0, 3.0, "q", gen),
           engine_ref.chunk_step(st, frames(1), 3.0, 4.0, None, gen)]

    # model-parallel over 4 devices (tiny dims: head_dim*heads=64, 4-way TP)
    mesh = make_mesh(n_data=2, n_model=4, devices=jax.devices()[:8])
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        # non-trivially sharded: q_kernel split along model axis
        qshard = sharded["text"]["layers"]["q_kernel"].sharding
        assert qshard.spec == P(None, None, "model")
        engine_tp = build(sharded)
        st2 = engine_tp.new_stream()
        out = [engine_tp.chunk_step(st2, frames(0, 6), 0.0, 3.0, "q", gen),
               engine_tp.chunk_step(st2, frames(1), 3.0, 4.0, None, gen)]
    assert out == ref
