"""Distributed LMM talking-head filter (reference distributed_lmm4asd.py):
batched Yes-prob predict, stride sharding, idempotent chunk files, merge."""

import os

import numpy as np
import pytest

from livecc_tpu.core.config import tiny_config
from livecc_tpu.data.tokenizer import ByteTokenizer
from livecc_tpu.models import qwen2_vl as m
from livecc_tpu.tools.lmm4asd import (
    TalkingHeadPredictor,
    merge_lmm4asd,
    run_lmm4asd,
    yes_prob_at_last,  # noqa: F401  (public API)
)
from livecc_tpu.vision_io import video_reader as vr

pytestmark = pytest.mark.skipif(not vr.is_available(), reason="native decoder unavailable")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("lmm4asd")
    vids = []
    for i in range(5):
        path = str(root / f"v{i}.mp4")
        rng = np.random.RandomState(i)
        vr.encode_test_video(path, rng.randint(0, 255, (24, 56, 56, 3), dtype=np.uint8), fps=8)
        vids.append(path)
    cfg = tiny_config()
    import jax
    params = m.init_params(cfg, jax.random.PRNGKey(0))
    predictor = TalkingHeadPredictor(
        params, cfg, ByteTokenizer(), num_frames=4, frame_hw=(28, 28), batch_size=3)
    return predictor, vids, root


def test_predict_probs_batched_matches_single(setup):
    predictor, vids, _ = setup
    probs = predictor.predict_probs(vids[:4])            # flushes 3 + 1
    assert probs.shape == (4,)
    assert ((probs >= 0) & (probs <= 1)).all()
    one_by_one = np.array([predictor.predict_probs([v])[0] for v in vids[:4]])
    np.testing.assert_allclose(probs, one_by_one, atol=2e-5)
    # determinism
    np.testing.assert_array_equal(probs, predictor.predict_probs(vids[:4]))
    # the frames must actually reach the model: different videos ->
    # different Yes probs (guards the image-slot scatter wiring)
    assert len(set(probs.tolist())) > 1, probs


def test_unreadable_video_marks_minus_one(setup):
    predictor, vids, root = setup
    bogus = str(root / "missing.mp4")
    probs = predictor.predict_probs([vids[0], bogus])
    assert 0.0 <= probs[0] <= 1.0
    assert probs[1] == -1.0                             # main.py:109-111 convention


def test_run_sharded_idempotent_and_merge(setup, tmp_path):
    predictor, vids, _ = setup
    out = str(tmp_path / "out")
    # two nodes cover disjoint strides of the same corpus
    files0 = run_lmm4asd(vids, out, predictor, node=0, num_nodes=2, chunk_size=2)
    files1 = run_lmm4asd(vids, out, predictor, node=1, num_nodes=2, chunk_size=2)
    assert all(os.path.exists(f) for f in files0 + files1)
    merged = merge_lmm4asd(out)
    assert sorted(merged) == list(range(len(vids)))
    assert all(0.0 <= p <= 1.0 for p in merged.values())
    # idempotent resume: a re-run rewrites nothing
    mtimes = {f: os.path.getmtime(f) for f in files0}
    again = run_lmm4asd(vids, out, predictor, node=0, num_nodes=2, chunk_size=2)
    assert again == files0
    assert mtimes == {f: os.path.getmtime(f) for f in files0}


def test_part_filter(setup, tmp_path):
    """The reference driver scores only part 3 of 4 of the corpus
    (distributed_lmm4asd.py:76-78); the part filter reproduces that."""
    predictor, vids, _ = setup
    out = str(tmp_path / "part")
    run_lmm4asd(vids, out, predictor, part=3, num_parts=4, chunk_size=10)
    merged = merge_lmm4asd(out)
    assert sorted(merged) == list(range(3, len(vids), 4))
