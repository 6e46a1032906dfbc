"""Qwen2-VL chat templating + vision-token expansion (from scratch).

Behavioral contract: transformers Qwen2VLProcessor.apply_chat_template /
__call__ — ``<|im_start|>role\\n...<|im_end|>\\n`` turns with a default system
prompt, vision items rendered as ``<|vision_start|><|video_pad|><|vision_end|>``,
and each video placeholder expanded to ``t*h*w / merge**2`` tokens.

The reference builds its streaming turns with this template (demo/infer.py:
134-150) and strips the system prompt on continuation turns via a character
offset; both helpers live here.
"""

from __future__ import annotations

from typing import Any, Sequence

IM_START = "<|im_start|>"
IM_END = "<|im_end|>"
VISION_START = "<|vision_start|>"
VISION_END = "<|vision_end|>"
IMAGE_PAD = "<|image_pad|>"
VIDEO_PAD = "<|video_pad|>"

DEFAULT_SYSTEM = "You are a helpful assistant."

Conversation = Sequence[dict[str, Any]]


def render_chat(
    conversation: Conversation,
    add_generation_prompt: bool = False,
    default_system: str = DEFAULT_SYSTEM,
) -> str:
    """Conversation -> template string with one placeholder per vision item."""
    parts: list[str] = []
    if not conversation or conversation[0].get("role") != "system":
        parts.append(f"{IM_START}system\n{default_system}{IM_END}\n")
    for message in conversation:
        content = message["content"]
        if isinstance(content, str):
            body = content
        else:
            chunks = []
            for element in content:
                etype = element.get("type", "text")
                if etype == "text":
                    chunks.append(element["text"])
                elif etype == "image":
                    chunks.append(f"{VISION_START}{IMAGE_PAD}{VISION_END}")
                elif etype == "video":
                    chunks.append(f"{VISION_START}{VIDEO_PAD}{VISION_END}")
                else:
                    raise ValueError(f"unknown content type {etype!r}")
            body = "".join(chunks)
        parts.append(f"{IM_START}{message['role']}\n{body}{IM_END}\n")
    if add_generation_prompt:
        parts.append(f"{IM_START}assistant\n")
    return "".join(parts)


def system_prompt_offset(default_system: str = DEFAULT_SYSTEM) -> int:
    """Character index of '<|im_start|>user' in a 1-turn templated text.

    Reference: demo/infer.py:51-58 — used to strip the system prompt from
    continuation turns (texts = '<|im_end|>\\n' + texts[offset:]).
    """
    text = render_chat([{"role": "user", "content": [{"type": "text", "text": "livecc"}]}],
                       default_system=default_system)
    return text.index(f"{IM_START}user")


def strip_system_for_continuation(text: str, offset: int | None = None) -> str:
    """Continuation-turn text: replace system header with the closing im_end.

    Reference: demo/infer.py:147-150.
    """
    offset = system_prompt_offset() if offset is None else offset
    return f"{IM_END}\n" + text[offset:]


def expand_vision_placeholders(
    text: str,
    video_grid_thw: Sequence[tuple[int, int, int]] = (),
    image_grid_thw: Sequence[tuple[int, int, int]] = (),
    merge_size: int = 2,
) -> str:
    """Expand each image/video placeholder to its token count (processor semantics)."""
    out = []
    vid_iter = iter(video_grid_thw)
    img_iter = iter(image_grid_thw)
    rest = text
    while True:
        i_img = rest.find(IMAGE_PAD)
        i_vid = rest.find(VIDEO_PAD)
        if i_img == -1 and i_vid == -1:
            out.append(rest)
            break
        if i_vid == -1 or (i_img != -1 and i_img < i_vid):
            idx, tok, it = i_img, IMAGE_PAD, img_iter
        else:
            idx, tok, it = i_vid, VIDEO_PAD, vid_iter
        t, h, w = next(it)
        n = t * h * w // merge_size**2
        out.append(rest[:idx])
        out.append(tok * n)
        rest = rest[idx + len(tok):]
    return "".join(out)
