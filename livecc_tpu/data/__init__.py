from livecc_tpu.data.tokenizer import ByteTokenizer, HFTokenizer, load_tokenizer
from livecc_tpu.data import chat

__all__ = ["ByteTokenizer", "HFTokenizer", "load_tokenizer", "chat"]
