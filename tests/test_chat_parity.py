"""Template/tokenizer fidelity vs HF goldens (VERDICT r2 missing #3).

Goldens (tests/goldens/chat_template.json, regenerate with
tools/gen_chat_goldens.py) were produced by transformers' own machinery:
``apply_chat_template`` executing the canonical Qwen2-VL Jinja template
(committed at tests/fixtures/qwen2_vl_chat_template.jinja) with
``Qwen2TokenizerFast`` over the committed tiny_tokenizer.json fixture, and
a full ``Qwen2VLProcessor`` run (image-processor video path) for the
post-expansion input_ids. This is the last link of the exact-greedy-parity
chain: the reference templates + tokenizes through AutoProcessor
(demo/infer.py:147-157, data/lmm_dataset.py:177-183).
"""

import json
import os

import numpy as np
import pytest

from livecc_tpu.data import chat
from livecc_tpu.data.tokenizer import HFTokenizer

HERE = os.path.dirname(__file__)
GOLDEN = os.path.join(HERE, "goldens", "chat_template.json")
TOK_FIXTURE = os.path.join(HERE, "fixtures", "tiny_tokenizer.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def tok():
    return HFTokenizer(TOK_FIXTURE)


@pytest.mark.parametrize("name", ["stream", "qa", "qa_no_genprompt"])
def test_render_chat_matches_hf_template(golden, tok, name):
    g = golden["conversations"][name]
    ours = chat.render_chat(g["messages"], add_generation_prompt=g["add_generation_prompt"])
    assert ours == g["rendered"]
    # HFTokenizer over the same fixture reproduces HF's exact token ids
    assert tok.encode(ours) == g["ids"]


def test_processor_input_ids_after_expansion(golden, tok):
    """Grid math + placeholder expansion + tokenizer == the real HF
    Qwen2VLProcessor's input_ids for an actual clip."""
    if "processor" not in golden:
        pytest.skip(f"goldens lack processor run: {golden.get('processor_error')}")
    g = golden["processor"]
    t, h, w, _ = g["video_shape"]

    from livecc_tpu.vision_io.budget import (
        FRAME_FACTOR, IMAGE_MAX_PIXELS, IMAGE_MIN_PIXELS, smart_resize,
    )

    # HF image-processor defaults: min 56*56, max 28*28*1280 per frame
    rh, rw = smart_resize(h, w, min_pixels=IMAGE_MIN_PIXELS, max_pixels=IMAGE_MAX_PIXELS)
    grid = (t // FRAME_FACTOR, rh // 14, rw // 14)
    assert [list(grid)] == g["video_grid_thw"]

    ours = chat.render_chat(
        golden["conversations"]["qa"]["messages"], add_generation_prompt=True
    )
    assert ours == g["rendered"]
    expanded = chat.expand_vision_placeholders(ours, video_grid_thw=[grid])
    assert tok.encode(expanded) == g["input_ids"]


def test_tokenizer_roundtrip_and_specials(tok):
    ids = tok.encode("<|im_start|>user\nTime=0.0-1.0s<|im_end|>\n")
    assert tok.token_to_id("<|im_start|>") in ids
    assert tok.decode(ids, skip_special_tokens=False).startswith("<|im_start|>user")
    # special ids are excluded from default decode
    assert "<|im_start|>" not in tok.decode(ids)
