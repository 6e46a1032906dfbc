from livecc_tpu.parallel.sharding import batch_pspec, param_pspecs, shard_params, zero2_pspecs

__all__ = ["batch_pspec", "param_pspecs", "shard_params", "zero2_pspecs"]
