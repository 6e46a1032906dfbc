from livecc_tpu.core.config import ModelConfig, TextConfig, VisionConfig, tiny_config
from livecc_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, make_mesh, shard, replicated

__all__ = [
    "ModelConfig", "TextConfig", "VisionConfig", "tiny_config",
    "DATA_AXIS", "MODEL_AXIS", "make_mesh", "shard", "replicated",
]
