"""Pipeline-parallel training step (GPipe over the model axis): loss and
updated params match the single-device step exactly on the virtual CPU
mesh. Beyond-reference parallelism (SURVEY.md §2c: reference has no PP)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from livecc_tpu.core.config import tiny_config
from livecc_tpu.core.mesh import make_mesh
from livecc_tpu.models.qwen2_vl.model import init_params
from livecc_tpu.parallel.pipeline import make_pp_train_step, pp_param_pspecs, shard_params_pp
from livecc_tpu.train import Batch, TrainConfig, make_optimizer, make_train_step, split_frozen


def text_batch(cfg, accum, b, s, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(8, cfg.text.vocab_size, size=(accum, b, s)).astype(np.int32)
    labels = ids.copy()
    labels[:, :, : s // 2] = -100
    pos = np.broadcast_to(np.arange(s)[None, None, None], (accum, 3, b, s)).astype(np.int32)
    return Batch(
        input_ids=jnp.asarray(ids), labels=jnp.asarray(labels),
        position_ids=jnp.asarray(np.ascontiguousarray(pos)),
        attention_mask=jnp.ones((accum, b, s), bool),
    )


@pytest.mark.parametrize("n_data,n_stage", [(1, 2), (2, 2)])
def test_pp_matches_single_device(n_data, n_stage):
    devs = jax.devices()
    if len(devs) < n_data * n_stage:
        pytest.skip("needs more virtual devices")
    cfg = tiny_config()
    assert cfg.text.num_hidden_layers % n_stage == 0
    tcfg = TrainConfig(learning_rate=1e-3, total_steps=10, ce_chunk_size=16)
    batch = text_batch(cfg, accum=4, b=2, s=32)

    # single-device reference
    params0 = init_params(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer(tcfg)
    opt_state = opt.init(split_frozen(params0, tcfg.freeze_modules)[0])
    step_ref = jax.jit(make_train_step(cfg, tcfg, opt))
    p_ref, _, m_ref = step_ref(params0, opt_state, batch)

    # pipeline step on the mesh
    mesh = make_mesh(n_data=n_data, n_model=n_stage,
                     devices=devs[: n_data * n_stage])
    params = shard_params_pp(init_params(cfg, jax.random.PRNGKey(0)), mesh)
    opt2 = make_optimizer(tcfg)
    opt_state2 = opt2.init(split_frozen(params, tcfg.freeze_modules)[0])
    with jax.set_mesh(mesh):
        step_pp = jax.jit(make_pp_train_step(cfg, tcfg, opt2, mesh))
        p_pp, _, m_pp = step_pp(params, opt_state2, batch)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]), rtol=1e-5)
    assert int(m_pp["tokens"]) == int(m_ref["tokens"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        p_ref, p_pp,
    )


def test_pp_param_pspecs_layers_sharded():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    specs = pp_param_pspecs(params)
    assert specs["text"]["layers"]["q_kernel"] == jax.sharding.PartitionSpec("model")
    assert specs["text"]["embed"]["weight"] == jax.sharding.PartitionSpec()
    assert specs["text"]["final_ln"] == jax.sharding.PartitionSpec()


def test_pp_four_stages():
    """PP=4 on a deeper tiny config (one layer per stage)."""
    import dataclasses

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    base = tiny_config()
    cfg = dataclasses.replace(
        base, text=dataclasses.replace(base.text, num_hidden_layers=4))
    tcfg = TrainConfig(learning_rate=1e-3, total_steps=10, ce_chunk_size=16)
    batch = text_batch(cfg, accum=4, b=2, s=32)

    params0 = init_params(cfg, jax.random.PRNGKey(1))
    opt = make_optimizer(tcfg)
    opt_state = opt.init(split_frozen(params0, tcfg.freeze_modules)[0])
    p_ref, _, m_ref = jax.jit(make_train_step(cfg, tcfg, opt))(params0, opt_state, batch)

    mesh = make_mesh(n_data=1, n_model=4, devices=devs[:4])
    params = shard_params_pp(init_params(cfg, jax.random.PRNGKey(1)), mesh)
    opt2 = make_optimizer(tcfg)
    opt_state2 = opt2.init(split_frozen(params, tcfg.freeze_modules)[0])
    with jax.set_mesh(mesh):
        step_pp = jax.jit(make_pp_train_step(cfg, tcfg, opt2, mesh))
        p_pp, _, m_pp = step_pp(params, opt_state2, batch)
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        p_ref, p_pp,
    )


def test_pp_packed_segment_batch():
    """PP on a PACKED batch (int32 segment-id attention): matches the
    single-device step on the same packed batch — regression for the XLA
    mask path silently bit-ANDing segment ids (code review r3)."""
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 virtual devices")
    from livecc_tpu.train.data import collate_packed_rows, pack_samples

    cfg = tiny_config()
    rng = np.random.RandomState(5)

    def sample(n):
        ids = rng.randint(8, cfg.text.vocab_size, size=(1, n)).astype(np.int32)
        labels = ids.copy()
        labels[:, : n // 2] = -100
        pos = np.broadcast_to(np.arange(n)[None, None], (3, 1, n)).astype(np.int32)
        return {"input_ids": ids, "labels": labels,
                "position_ids": np.ascontiguousarray(pos),
                "pixel_patches": None, "video_grid_thw": None,
                "image_patches": None, "image_grid_thw": None}

    packed, _ = pack_samples([sample(n) for n in (20, 12, 24, 8, 16, 18)], 40)
    batch = collate_packed_rows(packed, cfg, rows=1, accum=len(packed))
    batch = Batch(input_ids=batch.input_ids, labels=batch.labels,
                  position_ids=batch.position_ids,
                  attention_mask=batch.attention_mask)
    assert batch.attention_mask.dtype == jnp.int32
    assert int(batch.attention_mask.max()) >= 2

    tcfg = TrainConfig(learning_rate=1e-3, total_steps=10, ce_chunk_size=16)
    params0 = init_params(cfg, jax.random.PRNGKey(2))
    opt = make_optimizer(tcfg)
    opt_state = opt.init(split_frozen(params0, tcfg.freeze_modules)[0])
    _, _, m_ref = jax.jit(make_train_step(cfg, tcfg, opt))(params0, opt_state, batch)

    mesh = make_mesh(n_data=1, n_model=2, devices=devs[:2])
    params = shard_params_pp(init_params(cfg, jax.random.PRNGKey(2)), mesh)
    opt2 = make_optimizer(tcfg)
    opt_state2 = opt2.init(split_frozen(params, tcfg.freeze_modules)[0])
    with jax.set_mesh(mesh):
        _, _, m_pp = jax.jit(make_pp_train_step(cfg, tcfg, opt2, mesh))(
            params, opt_state2, batch)
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]), rtol=1e-5)
    assert int(m_pp["tokens"]) == int(m_ref["tokens"])


@pytest.mark.parametrize("v_total", [64, 61])
def test_vocab_parallel_ce_matches_dense(v_total):
    """vocab_parallel_ce (CE head column-sharded over a mesh axis, used by
    the pipeline tail) matches the dense chunked CE in loss, count and both
    gradients — including a vocab that does NOT divide the axis (61 over 4
    shards: pad columns must be masked out of the logsumexp)."""
    from jax import lax
    from jax.sharding import PartitionSpec as P

    from livecc_tpu.ops.chunked_ce import chunked_cross_entropy, vocab_parallel_ce

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(n_data=1, n_model=4, devices=devs[:4])
    rng = np.random.RandomState(7)
    b, s, h = 2, 37, 16                                 # 37 % 16 != 0: pad leg
    hidden = jnp.asarray(rng.randn(b, s, h).astype(np.float32))
    kernel = jnp.asarray((rng.randn(h, v_total) / 4).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, v_total, size=(b, s)).astype(np.int32))
    labels = labels.at[0, :10].set(-100)

    v_pad = -v_total % 4
    kernel_p = jnp.pad(kernel, ((0, 0), (0, v_pad)))

    def sharded(hid, ker, lab):
        def f(hid, ker, lab):
            loss, count = vocab_parallel_ce(hid, ker, lab, axis_name="model",
                                            v_total=v_total, chunk_size=16)
            return lax.psum(loss, "data"), lax.psum(count, "data")
        return jax.shard_map(
            f, mesh=mesh,
            in_specs=(P("data"), P(None, "model"), P("data")),
            out_specs=(P(), P()))(hid, ker, lab)

    def mean_sharded(hid, ker):
        loss, count = sharded(hid, ker, labels)
        return loss / jnp.maximum(count, 1)

    def mean_dense(hid, ker):
        loss, count = chunked_cross_entropy(hid, ker, labels, chunk_size=16)
        return loss / jnp.maximum(count, 1)

    with jax.set_mesh(mesh):
        l_sh, c_sh = sharded(hidden, kernel_p, labels)
        gh_sh, gk_sh = jax.grad(mean_sharded, argnums=(0, 1))(hidden, kernel_p)
    l_d, c_d = chunked_cross_entropy(hidden, kernel, labels, chunk_size=16)
    gh_d, gk_d = jax.grad(mean_dense, argnums=(0, 1))(hidden, kernel)

    np.testing.assert_allclose(float(l_sh), float(l_d), rtol=1e-6)
    assert int(c_sh) == int(c_d)
    assert float(jnp.linalg.norm(gh_sh - gh_d) / jnp.linalg.norm(gh_d)) < 1e-5
    gk_sh_trim = gk_sh[:, :v_total]
    assert float(jnp.linalg.norm(gk_sh_trim - gk_d) / jnp.linalg.norm(gk_d)) < 1e-5
    if v_pad:
        assert float(jnp.linalg.norm(gk_sh[:, v_total:])) == 0.0
