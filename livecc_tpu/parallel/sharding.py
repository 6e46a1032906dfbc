"""Parameter / optimizer-state partition specs over the (data, model) mesh.

Replaces the reference's distribution config (DeepSpeed ZeRO-2 over NCCL,
scripts/deepspeed_zero2.json + torchrun, SURVEY.md §2c) with declarative
shardings; XLA inserts all collectives:

  * **TP (model axis)** — LLM attention/MLP matrices column/row-sharded in
    megatron layout (q/k/v out-dim, o in-dim, gate/up out-dim, down in-dim),
    embed + lm_head vocab-sharded. ViT params stay replicated (it is a small
    fraction of FLOPs at streaming chunk sizes).
  * **ZeRO-2 (data axis)** — optimizer state sharded along the data axis on
    each tensor's largest divisible dimension; params stay replicated along
    data, gradients reduce-scatter automatically when XLA sees the
    (replicated grads) -> (sharded opt state) dataflow.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from livecc_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

Params = dict[str, Any]


def param_pspecs(params: Params) -> Params:
    """PartitionSpec tree for model params (TP over the model axis)."""

    def spec_for(path: tuple, leaf) -> P:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names)
        nd = leaf.ndim
        def last_sharded():   # shard the output (last) dim
            return P(*([None] * (nd - 1) + [MODEL_AXIS]))
        def middle_sharded():  # shard the input dim of a [L, in, out] kernel
            return P(*([None] * (nd - 2) + [MODEL_AXIS, None]))
        if "visual" in joined:
            return P()
        if names[-1] == "scale" and any(k in joined for k in ("o_kernel", "down_kernel")):
            # int8-quantized input-sharded kernel: its per-OUTPUT-column
            # scale ([L, 1, out]) has no sharded dim — replicate (tiny)
            return P()
        if "embed/weight" in joined:
            return P(MODEL_AXIS, None)          # vocab-sharded
        if "lm_head" in joined:
            return last_sharded()                # [H, V] vocab-sharded
        if any(k in joined for k in ("q_kernel", "k_kernel", "v_kernel", "gate_kernel", "up_kernel")):
            return last_sharded()
        if any(k in joined for k in ("q_bias", "k_bias", "v_bias")):
            return last_sharded()
        if any(k in joined for k in ("o_kernel", "down_kernel")):
            return middle_sharded()
        return P()                               # norms, small tensors

    return jax.tree_util.tree_map_with_path(spec_for, params)


def zero2_pspecs(params: Params, n_data: int) -> Params:
    """Optimizer-state specs: shard along data on the largest divisible dim.

    ZeRO-2-equivalent: each data-parallel rank owns a slice of the Adam
    moments; XLA reduce-scatters grads into the slice and all-gathers the
    param update (scripts/deepspeed_zero2.json:12-21 semantics).
    """

    def spec_for(leaf) -> P:
        if leaf.ndim == 0:
            return P()
        dims = list(leaf.shape)
        best = max(range(len(dims)), key=lambda i: dims[i] if dims[i] % n_data == 0 else -1)
        if dims[best] % n_data != 0:
            return P()
        spec = [None] * len(dims)
        spec[best] = DATA_AXIS
        return P(*spec)

    return jax.tree_util.tree_map(spec_for, params)


def shard_params(params: Params, mesh: Mesh) -> Params:
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_pspec() -> P:
    return P(DATA_AXIS)
