"""Sequence packing: packed rows (segment-id attention) produce the same
total loss/gradients as unpacked rows — per-sample isolation is exact.

Beyond-reference throughput feature: the reference trains per-device batch 1
right-padded to the bucket (HF Trainer, scripts/pt_local.sh:17), so short
clips waste most of the step's FLOPs. train/data.py:pack_samples merges
samples into one row with int32 segment ids; attention is blocked per
sample on both the XLA path (pairwise mask) and the splash kernels
(SegmentIds), positions restart per sample, and the next-token shift never
crosses a boundary (first-token labels forced -100).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import tiny_config
from livecc_tpu.models.qwen2_vl.model import init_params
from livecc_tpu.train import Batch, TrainConfig
from livecc_tpu.train.data import collate, collate_packed, pack_samples
from livecc_tpu.train.step import loss_fn
from livecc_tpu.vision_io.patchify import patchify_video


def make_sample(cfg, n_tokens, rng, with_video=False):
    """Processed-sample dict in LMMDataset.build_sample's schema."""
    ids = rng.randint(8, cfg.text.vocab_size, size=(1, n_tokens)).astype(np.int32)
    pixel_patches = grid = None
    if with_video:
        frames = rng.randint(0, 255, size=(2, 3, 28, 28)).astype(np.uint8)
        pixel_patches, g = patchify_video(frames)
        grid = np.asarray([g])
        n_vid = pixel_patches.shape[0] // 4
        assert n_vid + 3 <= n_tokens
        ids[0, 0] = cfg.vision_start_token_id
        ids[0, 1:1 + n_vid] = cfg.video_token_id
        ids[0, 1 + n_vid] = cfg.vision_end_token_id
    labels = ids.copy()
    labels[:, : n_tokens // 2] = -100         # supervise the tail half only
    pos = np.broadcast_to(np.arange(n_tokens)[None, None], (3, 1, n_tokens)).astype(np.int32)
    return {
        "input_ids": ids, "labels": labels,
        "position_ids": np.ascontiguousarray(pos),
        "pixel_patches": pixel_patches, "video_grid_thw": grid,
        "image_patches": None, "image_grid_thw": None,
    }


def total_loss_and_grads(params, cfg, batch: Batch):
    """Sum of per-micro CE sums + counts + grads over the whole window."""
    tcfg = TrainConfig(total_steps=10, ce_chunk_size=16)

    def window_loss(p):
        total, count = jnp.float32(0.0), jnp.int32(0)
        a = batch.input_ids.shape[0]
        for i in range(a):
            micro = jax.tree_util.tree_map(
                lambda x: None if x is None else x[i], batch,
                is_leaf=lambda x: x is None)
            loss, (c, _) = loss_fn(p, cfg, tcfg, micro)
            total, count = total + loss, count + c
        return total, count

    (loss, count), grads = jax.value_and_grad(window_loss, has_aux=True)(params)
    return float(loss), int(count), grads


@pytest.mark.parametrize("with_video", [False, True])
def test_packed_equals_unpacked(with_video):
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    lens = [24, 40, 18, 56, 30]
    samples = [make_sample(cfg, n, rng, with_video=with_video) for n in lens]
    # both layouts must supervise the same positions: packing forces each
    # sample's FIRST label to -100 (boundary shift guard) — already -100
    # here (only the tail half is supervised)
    unpacked = collate(samples, cfg, rows=1)
    packed = collate_packed(samples, cfg, rows=1, seq_len=96)
    assert packed.input_ids.shape[0] < unpacked.input_ids.shape[0], "packing must reduce rows"
    assert packed.attention_mask.dtype == jnp.int32

    l_u, c_u, g_u = total_loss_and_grads(params, cfg, unpacked)
    l_p, c_p, g_p = total_loss_and_grads(params, cfg, packed)
    assert c_u == c_p
    np.testing.assert_allclose(l_u, l_p, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_u), jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_pack_samples_structure():
    cfg = tiny_config()
    rng = np.random.RandomState(1)
    samples = [make_sample(cfg, n, rng) for n in (30, 30, 50, 90, 10)]
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        packed, leftovers = pack_samples(samples, seq_len=64)
    assert leftovers == []
    # 30+30 fit; 50 new row; 90 skipped (too long alone); 10 joins the 50
    assert len(packed) == 2
    assert packed[0]["input_ids"].shape[1] == 60
    assert packed[0]["n_samples"] == 2
    assert packed[1]["input_ids"].shape[1] == 60
    seg = packed[0]["segments"][0]
    assert list(np.unique(seg)) == [1, 2]
    # positions restart per sample
    pos = packed[0]["position_ids"][0, 0]
    assert pos[30] == 0 and pos[29] == 29
    # first-token labels masked at each boundary
    assert packed[0]["labels"][0, 0] == -100 and packed[0]["labels"][0, 30] == -100


def test_packed_segment_isolation():
    """A packed neighbor must not change a sample's loss at all: pack the
    same sample next to two DIFFERENT partners and compare its per-token
    contribution via total sums."""
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.RandomState(3)
    target = make_sample(cfg, 32, rng)
    partner_a = make_sample(cfg, 20, rng)
    partner_b = make_sample(cfg, 20, rng)

    def loss_of_pair(partner):
        batch = collate_packed([target, partner], cfg, rows=1, seq_len=64)
        tcfg = TrainConfig(total_steps=10, ce_chunk_size=16)
        micro = jax.tree_util.tree_map(lambda x: None if x is None else x[0],
                                       batch, is_leaf=lambda x: x is None)
        loss, (count, _) = loss_fn(params, cfg, tcfg, micro)
        return float(loss), int(count)

    def loss_alone(s):
        batch = collate([s], cfg, rows=1)
        tcfg = TrainConfig(total_steps=10, ce_chunk_size=16)
        micro = jax.tree_util.tree_map(lambda x: None if x is None else x[0],
                                       batch, is_leaf=lambda x: x is None)
        loss, (count, _) = loss_fn(params, cfg, tcfg, micro)
        return float(loss), int(count)

    la, ca = loss_of_pair(partner_a)
    lb, cb = loss_of_pair(partner_b)
    ta, tc = loss_alone(target)
    pa, pc = loss_alone(partner_a)
    pb, _ = loss_alone(partner_b)
    assert ca == cb == tc + pc
    np.testing.assert_allclose(la - pa, ta, rtol=1e-5)
    np.testing.assert_allclose(lb - pb, ta, rtol=1e-5)


def test_pack_samples_max_rows_carry():
    cfg = tiny_config()
    rng = np.random.RandomState(4)
    samples = [make_sample(cfg, 30, rng) for _ in range(6)]
    packed, leftovers = pack_samples(samples, seq_len=64, max_rows=2)
    assert len(packed) == 2
    assert len(leftovers) == 2           # 2 rows x 2 samples used, 2 carried
    assert all(l["input_ids"].shape[1] == 30 for l in leftovers)
    # carried samples are raw (re-packable, no segments yet)
    assert "segments" not in leftovers[0]
