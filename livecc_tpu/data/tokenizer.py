"""Tokenizer layer: HF-file-backed BPE or a self-contained byte fallback.

The reference relies on the Qwen2 tokenizer through AutoProcessor
(demo/infer.py:48). Here:

  * ``HFTokenizer`` loads a checkpoint directory's ``tokenizer.json`` via the
    ``tokenizers`` runtime (pure offline file load — used when serving real
    Qwen2-VL/LiveCC checkpoints).
  * ``ByteTokenizer`` is a dependency-free byte-level tokenizer whose special
    tokens match ``core.config.tiny_config`` — it powers every test without
    network access.

Both expose the same minimal interface: encode/decode + special ids.
"""

from __future__ import annotations

import os
import re
from typing import Protocol, Sequence

_SPECIAL_RE = re.compile(r"<\|[a-z_0-9]+\|>")

QWEN_SPECIAL_TOKENS = {
    "<|endoftext|>": 151643,
    "<|im_start|>": 151644,
    "<|im_end|>": 151645,
    "<|object_ref_start|>": 151646,
    "<|object_ref_end|>": 151647,
    "<|box_start|>": 151648,
    "<|box_end|>": 151649,
    "<|quad_start|>": 151650,
    "<|quad_end|>": 151651,
    "<|vision_start|>": 151652,
    "<|vision_end|>": 151653,
    "<|vision_pad|>": 151654,
    "<|image_pad|>": 151655,
    "<|video_pad|>": 151656,
}


class Tokenizer(Protocol):
    def encode(self, text: str) -> list[int]: ...
    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str: ...
    @property
    def special_ids(self) -> set[int]: ...


class HFTokenizer:
    """Loads tokenizer.json from a local checkpoint directory (no network)."""

    def __init__(self, path: str):
        from tokenizers import Tokenizer as RustTokenizer

        f = os.path.join(path, "tokenizer.json") if os.path.isdir(path) else path
        self._tok = RustTokenizer.from_file(f)
        self._special = {
            self._tok.token_to_id(t) for t in QWEN_SPECIAL_TOKENS if self._tok.token_to_id(t) is not None
        }

    def encode(self, text: str) -> list[int]:
        return self._tok.encode(text, add_special_tokens=False).ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=skip_special_tokens)

    def token_to_id(self, token: str) -> int:
        return self._tok.token_to_id(token)

    @property
    def special_ids(self) -> set[int]:
        return set(self._special)


class ByteTokenizer:
    """Byte-level tokenizer with tiny_config's special-token ids.

    Layout: ids 0-7 = special tokens (pad/bos=0, 1 unused, im_start=2,
    im_end=3, vision_start=4, vision_end=5, image_pad=6, video_pad=7);
    ids 8-263 = raw bytes.
    """

    SPECIALS = {
        "<|endoftext|>": 0,
        "<|unused|>": 1,
        "<|im_start|>": 2,
        "<|im_end|>": 3,
        "<|vision_start|>": 4,
        "<|vision_end|>": 5,
        "<|image_pad|>": 6,
        "<|video_pad|>": 7,
    }
    BYTE_OFFSET = 8

    def __init__(self, specials: dict[str, int] | None = None):
        if specials is not None:
            self.SPECIALS = dict(specials)
        self._id_to_special = {v: k for k, v in self.SPECIALS.items()}

    @classmethod
    def for_config(cls, cfg) -> "ByteTokenizer":
        """Byte tokenizer whose special ids match a ModelConfig (benchmarks
        with real-architecture random-init models)."""
        return cls({
            "<|endoftext|>": cfg.pad_token_id,
            "<|im_start|>": cfg.im_start_token_id,
            "<|im_end|>": cfg.im_end_token_id,
            "<|vision_start|>": cfg.vision_start_token_id,
            "<|vision_end|>": cfg.vision_end_token_id,
            "<|image_pad|>": cfg.image_token_id,
            "<|video_pad|>": cfg.video_token_id,
        })

    @property
    def vocab_size(self) -> int:
        return self.BYTE_OFFSET + 256

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        pos = 0
        for match in _SPECIAL_RE.finditer(text):
            ids.extend(b + self.BYTE_OFFSET for b in text[pos:match.start()].encode())
            tok = match.group()
            if tok in self.SPECIALS:
                ids.append(self.SPECIALS[tok])
            else:
                ids.extend(b + self.BYTE_OFFSET for b in tok.encode())
            pos = match.end()
        ids.extend(b + self.BYTE_OFFSET for b in text[pos:].encode())
        return ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        out: list[str] = []
        buf = bytearray()
        for i in ids:
            i = int(i)
            if self.BYTE_OFFSET <= i < self.BYTE_OFFSET + 256:
                buf.append(i - self.BYTE_OFFSET)
            else:
                if buf:
                    out.append(buf.decode(errors="replace"))
                    buf = bytearray()
                if i in self._id_to_special:
                    if not skip_special_tokens:
                        out.append(self._id_to_special[i])
                else:
                    # Out-of-range id (random-init test models sample the
                    # whole vocab): render a visible placeholder.
                    out.append(f"<{i}>")
        if buf:
            out.append(buf.decode(errors="replace"))
        return "".join(out)

    def token_to_id(self, token: str) -> int:
        if token in self.SPECIALS:
            return self.SPECIALS[token]
        ids = self.encode(token)
        assert len(ids) == 1, f"{token!r} is not a single token"
        return ids[0]

    @property
    def special_ids(self) -> set[int]:
        return set(self.SPECIALS.values())


def load_tokenizer(path: str | None = None) -> Tokenizer:
    """HFTokenizer if a checkpoint path with tokenizer.json is given, else bytes."""
    if path and (
        os.path.isfile(path) or os.path.isfile(os.path.join(path, "tokenizer.json"))
    ):
        return HFTokenizer(path)
    return ByteTokenizer()
