from livecc_tpu.models.whisper.convert import (
    config_from_hf_json, convert_state_dict, convert_torch_model, load_safetensors_dir,
)
from livecc_tpu.models.whisper.model import (
    WhisperConfig, greedy_transcribe_tokens, tiny_whisper_config,
    whisper_decode, whisper_encode,
)

__all__ = [
    "WhisperConfig", "config_from_hf_json", "convert_state_dict",
    "convert_torch_model", "greedy_transcribe_tokens", "load_safetensors_dir",
    "tiny_whisper_config", "whisper_decode", "whisper_encode",
]
