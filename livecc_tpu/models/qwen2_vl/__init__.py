from livecc_tpu.models.qwen2_vl.model import (
    VisionInputs,
    continuation_position_ids,
    forward,
    get_rope_index,
    init_params,
    prepare_vision_inputs,
    scatter_video_embeds,
)
from livecc_tpu.models.qwen2_vl.text import KVCache, init_text_params, lm_logits, text_forward
from livecc_tpu.models.qwen2_vl.vision import init_vision_params, vision_forward
from livecc_tpu.models.qwen2_vl.convert import (
    config_from_hf_json,
    convert_state_dict,
    convert_torch_model,
    load_safetensors_dir,
)

__all__ = [
    "VisionInputs", "continuation_position_ids", "forward", "get_rope_index",
    "init_params", "prepare_vision_inputs", "scatter_video_embeds",
    "KVCache", "init_text_params", "lm_logits", "text_forward",
    "init_vision_params", "vision_forward",
    "config_from_hf_json", "convert_state_dict", "convert_torch_model", "load_safetensors_dir",
]
