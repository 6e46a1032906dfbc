"""Official VideoMME scorer parity: our report must reproduce the reference's
committed result files byte-for-byte.

The reference ships the official scorer's output for LiveCC-7B-Instruct
(evaluation/videomme/results/LiveCC-7B-Instruct_*.{json,txt}); feeding the
committed predictions JSON through our scorer is the cheapest whole-stack
parity evidence for the eval pipeline (VERDICT r1 weak #6).
"""

import json
import os

import pytest

from livecc_tpu.eval.videomme import extract_official, official_report

REF_RESULTS = "/root/reference/evaluation/videomme/results"


def _ref(name):
    path = os.path.join(REF_RESULTS, name)
    if not os.path.exists(path):
        pytest.skip("reference results not available")
    return path


@pytest.mark.parametrize("tag,overall", [
    ("no_subtitles", " 64.1%"),
    ("with_subtitles", " 70.3%"),
])
def test_official_report_byte_parity(tag, overall):
    with open(_ref(f"LiveCC-7B-Instruct_{tag}.json")) as f:
        results = json.load(f)
    ours = official_report(results, expected_per_type=300)
    with open(_ref(f"LiveCC-7B-Instruct_{tag}.txt")) as f:
        theirs = f.read()
    assert ours.splitlines()[-1] == f"Overall: {overall}"
    assert ours == theirs


def test_extract_official():
    assert extract_official("C. Berries.") == "C"
    assert extract_official("The answer is B") == "B"
    assert extract_official("Answer: (D)") == "D"
    assert extract_official("") == ""
    # long letter-free prose bails before the regex
    assert extract_official("this video mostly shows people walking around "
                            "the market and nothing else happens there") == ""
    # first A-D hit wins
    assert extract_official("Between B and C, pick B") == "B"


def test_report_validates_taxonomy():
    rows = [{"video_id": "1", "duration": "short", "domain": "NotACategory",
             "sub_category": "Food", "questions": [
                 {"task_type": "OCR Problems", "answer": "A", "response": "A"}]}]
    with pytest.raises(KeyError):
        official_report(rows, video_types=("short",))


def test_report_expected_count_check():
    with pytest.raises(ValueError):
        official_report([], video_types=("short",), expected_per_type=300)
