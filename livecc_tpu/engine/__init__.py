from livecc_tpu.engine.generation import (
    GenerationParams,
    decode_chunk,
    prefill,
    presence_from_ids,
    update_counts,
    apply_repetition_penalty,
    select_token,
)
from livecc_tpu.engine.speculative import (
    NGramDraftSource, SpecConfig, decode_chunk_lookahead, verify_window,
)
from livecc_tpu.engine.streaming import LiveCCEngine, StreamState, TOKEN_BUCKETS

__all__ = [
    "GenerationParams", "decode_chunk", "prefill", "presence_from_ids", "update_counts",
    "apply_repetition_penalty", "select_token",
    "NGramDraftSource", "SpecConfig", "decode_chunk_lookahead", "verify_window",
    "LiveCCEngine", "StreamState", "TOKEN_BUCKETS",
]
