"""Device mesh construction and sharding helpers.

The reference's distribution stack (torchrun + NCCL + DeepSpeed ZeRO-2,
scripts/pt_local.sh:8, scripts/deepspeed_zero2.json) is replaced by a single
`jax.sharding.Mesh` with two axes:

  * ``data``  — data parallelism; gradients/optimizer state are sharded along
    it (ZeRO-2 equivalent, SURVEY.md §2c), batches are split along it.
  * ``model`` — tensor parallelism for serving the 7B across a v5e-8 slice
    (weights ~15.5 GB bf16 exceed one chip's HBM headroom with KV caches).

All collectives are inserted by XLA from sharding annotations; there is no
hand-written communication backend.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    *,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis. ``n_model`` should divide the
    device count; the model axis is placed innermost so tensor-parallel
    collectives ride the fastest ICI links.
    """
    if devices is None:
        devices = jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    if n_data * n_model != n_total:
        raise ValueError(f"mesh {n_data}x{n_model} != {n_total} devices")
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def single_device_mesh() -> Mesh:
    """1x1 mesh for single-chip paths (keeps code mesh-generic)."""
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))
