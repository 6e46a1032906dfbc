from livecc_tpu.parallel.memory import ServingPlan, count_params, serving_plan
from livecc_tpu.parallel.sharding import batch_pspec, param_pspecs, shard_params, zero2_pspecs

__all__ = [
    "ServingPlan", "batch_pspec", "count_params", "param_pspecs",
    "serving_plan", "shard_params", "zero2_pspecs",
]
