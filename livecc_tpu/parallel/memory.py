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
