"""Golden tests for the frame-pipeline math.

smart_resize is checked against the implementation shipped inside
transformers (the reference's source of truth); the sampling functions are
checked against hand-computed goldens derived from the reference semantics
(livecc-utils video_process_patch.py).
"""

import numpy as np
import pytest

from livecc_tpu.vision_io import (
    VisionBudget,
    smart_resize,
    smart_nframes,
    strict_fps_sample,
    snap_timestamps_to_pts,
    grid_thw_for,
    num_video_tokens,
    patchify_video,
)


def test_smart_resize_matches_transformers():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        smart_resize as hf_smart_resize,
    )

    rng = np.random.RandomState(0)
    cases = [(720, 1280), (1080, 1920), (480, 640), (360, 640), (28, 28), (100, 100),
             (2160, 3840), (50, 1000), (1000, 50)]
    cases += [(int(rng.randint(28, 4000)), int(rng.randint(28, 4000))) for _ in range(200)]
    budgets = [
        (56 * 56, 14 * 14 * 4 * 1280),
        (100 * 28 * 28, 24576 * 28 * 28),
        (100 * 28 * 28, 384 * 28 * 28),
    ]
    for h, w in cases:
        if max(h, w) / min(h, w) > 200:
            continue
        for mn, mx in budgets:
            assert smart_resize(h, w, 28, mn, mx) == hf_smart_resize(h, w, 28, mn, mx)


def test_smart_resize_divisible_and_budgeted():
    b = VisionBudget()
    h, w = b.spatial_target(720, 1280, nframes=480)
    assert h % 28 == 0 and w % 28 == 0
    assert h * w <= b.video_frame_max_pixels(480)
    # Note: the max-pixels branch floors to 28-multiples, so the result may
    # land slightly below min_pixels — reference smart_resize does the same.
    h2, w2 = b.spatial_target(720, 1280, nframes=6)
    assert h2 * w2 >= b.video_min_pixels


def test_video_frame_max_pixels_budget():
    b = VisionBudget()
    # Few frames: full per-frame budget capped at VIDEO_MAX_PIXELS.
    assert b.video_frame_max_pixels(2) == b.video_max_pixels
    # Many frames: budget split across frames (x FRAME_FACTOR), but the
    # 1.05x-min floor dominates at 480 frames (80281.6 < 82320).
    assert b.video_frame_max_pixels(480) == int(b.video_min_pixels * 1.05)
    assert b.video_frame_max_pixels(400) == b.video_total_pixels / 400 * 2
    # Floor: never below 1.05x min pixels.
    assert b.video_frame_max_pixels(10**9) == int(b.video_min_pixels * 1.05)


def test_smart_nframes_fps_mode():
    b = VisionBudget()
    # 60 s at 30 fps -> 1800 frames -> 2 fps target = 120 frames.
    assert smart_nframes(1800, 30.0, budget=b) == 120
    # Cap at fps_max_frames (480), floored to FRAME_FACTOR.
    assert smart_nframes(30 * 30 * 60, 30.0, budget=b) == 480
    # Short video: min frames = 4.
    assert smart_nframes(30, 30.0, budget=b) == 4
    # Explicit nframes rounds to FRAME_FACTOR.
    assert smart_nframes(100, 30.0, nframes=7, budget=b) == 8


def test_strict_fps_sample_basic():
    # 10 s of 10-fps video: PTS 0.0..9.9; 2 fps sampling -> 20 frames.
    pts = np.arange(0, 10, 0.1)
    idxs, spts = strict_fps_sample(pts)
    assert len(idxs) % 2 == 0
    assert len(idxs) == 20
    # Each sampled PTS is the first >= expected timestamp (0.0, 0.5, 1.0, ...).
    np.testing.assert_allclose(spts[:4], [0.0, 0.5, 1.0, 1.5], atol=1e-9)


def test_strict_fps_sample_pads_to_frame_factor():
    pts = np.array([0.0, 0.5, 1.0])  # 3 expected timestamps -> pad to 4
    idxs, spts = strict_fps_sample(pts)
    assert len(idxs) == 4
    assert idxs[-1] == idxs[-2]


def test_strict_fps_sample_caps_max_frames():
    b = VisionBudget(fps_max_frames=8)
    pts = np.arange(0, 100, 0.5)
    idxs, _ = strict_fps_sample(pts, budget=b)
    assert len(idxs) == 8
    # drop_last: the first 8 expected timestamps.
    assert list(idxs) == list(range(8))
    idxs2, _ = strict_fps_sample(pts, budget=b, drop_last=False)
    assert len(idxs2) == 8
    assert idxs2[-1] == len(pts) - 1  # linspace reaches the end


def test_snap_timestamps_cursor():
    video_pts = np.arange(0, 10, 1 / 30)  # 30 fps
    ts = np.array([0.5, 1.0, 1.5])  # odd count -> pad with 2.0
    idxs, kept, cursor = snap_timestamps_to_pts(ts, video_pts, index_from=0)
    assert len(idxs) == 4 and len(kept) == 4
    assert kept[-1] == pytest.approx(2.0)
    # Each chosen frame PTS >= its timestamp; cursor = last idx + 1.
    assert all(video_pts[i] >= t - 1e-9 for i, t in zip(idxs, kept))
    assert cursor == idxs[-1] + 1
    # Continuing from the cursor never reuses frames.
    idxs2, _, _ = snap_timestamps_to_pts(np.array([2.5, 3.0]), video_pts, index_from=cursor)
    assert idxs2[0] >= cursor


def test_grid_and_token_count():
    # 6 frames at 252x448 -> grid (3, 18, 32) -> 3*18*32/4 = 432 tokens.
    g = grid_thw_for(6, 252, 448)
    assert g == (3, 18, 32)
    assert num_video_tokens(g) == 432


def test_patchify_shapes_and_layout():
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, size=(4, 3, 28, 56)).astype(np.float32)
    flat, grid = patchify_video(frames, normalize=False)
    assert grid == (2, 2, 4)
    assert flat.shape == (2 * 2 * 4, 3 * 2 * 14 * 14)
    # Golden cross-check against a direct loop implementation of the HF layout.
    t, c, h, w = frames.shape
    ps, tps, m = 14, 2, 2
    ref = frames.reshape(t // tps, tps, c, h // ps // m, m, ps, w // ps // m, m, ps)
    ref = ref.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    ref = ref.reshape((t // tps) * (h // ps) * (w // ps), c * tps * ps * ps)
    np.testing.assert_array_equal(flat, ref)


def test_patchify_pads_odd_temporal():
    frames = np.ones((3, 3, 28, 28), np.float32)
    flat, grid = patchify_video(frames, normalize=False)
    assert grid == (2, 2, 2)
