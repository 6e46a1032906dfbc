"""Training step: loss decreases, freezing works, ZeRO-2/TP sharding compiles
and runs on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from livecc_tpu.core.config import tiny_config
from livecc_tpu.core.mesh import make_mesh
from livecc_tpu.models.qwen2_vl.model import init_params
from livecc_tpu.parallel.sharding import param_pspecs, shard_params, zero2_pspecs
from livecc_tpu.train import Batch, TrainConfig, make_optimizer, make_train_step, split_frozen


def text_batch(cfg, accum=1, b=2, s=32, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(8, cfg.text.vocab_size, size=(accum, b, s)).astype(np.int32)
    labels = ids.astype(np.int32).copy()
    labels[:, :, : s // 2] = -100      # supervise the second half only
    pos = np.broadcast_to(np.arange(s)[None, None, None], (accum, 3, b, s)).astype(np.int32)
    mask = np.ones((accum, b, s), bool)
    return Batch(
        input_ids=jnp.asarray(ids), labels=jnp.asarray(labels),
        position_ids=jnp.asarray(np.ascontiguousarray(pos)), attention_mask=jnp.asarray(mask),
    )


def test_loss_decreases_and_visual_frozen():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(learning_rate=1e-3, total_steps=20)
    opt = make_optimizer(tcfg)
    opt_state = opt.init(split_frozen(params, tcfg.freeze_modules)[0])
    step = jax.jit(make_train_step(cfg, tcfg, opt))
    batch = text_batch(cfg)
    visual_before = jax.tree_util.tree_leaves(params["visual"])[0].copy()
    losses = []
    for _ in range(5):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # visual frozen (train.py:17-19 default --freeze_modules visual)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(params["visual"])[0]), np.asarray(visual_before)
    )


@pytest.mark.parametrize("ce_impl", [None, "fused"])
def test_sharded_train_step_8dev(ce_impl):
    """DPxTP ZeRO-2 step on the virtual mesh; ce_impl="fused" additionally
    pins that the custom_vjp CE (the TPU default) partitions under GSPMD —
    its [H, V] fp32 grad accumulator must shard like the kernel."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=4, n_model=2, devices=devs[:8])
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(learning_rate=1e-3, total_steps=10, ce_impl=ce_impl)
    opt = make_optimizer(tcfg)

    params = shard_params(params, mesh)
    opt_state = opt.init(split_frozen(params, tcfg.freeze_modules)[0])
    opt_specs = zero2_pspecs(opt_state, n_data=4)
    opt_state = jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), opt_state, opt_specs
    )
    batch = text_batch(cfg, accum=2, b=4, s=32)
    bspec = Batch(
        input_ids=P(None, "data"), labels=P(None, "data"),
        position_ids=P(None, None, "data"), attention_mask=P(None, "data"),
    )
    batch = jax.tree_util.tree_map(
        lambda x, sp: x if x is None else jax.device_put(x, NamedSharding(mesh, sp)),
        batch, bspec, is_leaf=lambda x: x is None,
    )
    pshard = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), param_pspecs(params))
    oshard = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), opt_specs)
    with jax.set_mesh(mesh):
        step = jax.jit(make_train_step(cfg, tcfg, opt), out_shardings=(pshard, oshard, None))
        params2, opt_state, metrics = step(params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params keep their TP sharding after the update (ZeRO-2: replicated on data)
    q = params2["text"]["layers"]["q_kernel"]
    assert q.sharding.spec == param_pspecs(params2)["text"]["layers"]["q_kernel"]


def test_ce_sup_bucket_matches_full():
    """Gather-compacted CE (ce_sup_bucket) reproduces the full-sequence loss
    and gradients when the bucket covers all supervised positions."""
    from livecc_tpu.train.step import loss_fn

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    batch = text_batch(cfg, accum=1, b=2, s=32)
    micro = jax.tree_util.tree_map(lambda x: x[0], batch)

    def run(tcfg):
        def f(p):
            loss, (count, _dropped) = loss_fn(p, cfg, tcfg, micro)
            return loss / jnp.maximum(count, 1)
        val, grads = jax.value_and_grad(f)(params)
        return val, grads

    full_val, full_grads = run(TrainConfig(total_steps=10, ce_chunk_size=16))
    # bucket 32 >= 2*16 supervised positions
    comp_val, comp_grads = run(TrainConfig(total_steps=10, ce_chunk_size=16, ce_sup_bucket=32))
    np.testing.assert_allclose(float(full_val), float(comp_val), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(full_grads), jax.tree_util.tree_leaves(comp_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-6)

    # undersized bucket drops positions but stays finite and well-defined,
    # and the overflow is REPORTED (ADVICE r2: silent truncation trains on a
    # biased label subset)
    s_val, _ = run(TrainConfig(total_steps=10, ce_chunk_size=16, ce_sup_bucket=8))
    assert np.isfinite(float(s_val))
    tcfg_small = TrainConfig(total_steps=10, ce_chunk_size=16, ce_sup_bucket=8)
    _, (count, dropped) = loss_fn(params, cfg, tcfg_small, micro)
    tcfg_full = TrainConfig(total_steps=10, ce_chunk_size=16, ce_sup_bucket=32)
    _, (count_f, dropped_f) = loss_fn(params, cfg, tcfg_full, micro)
    assert int(dropped) == int(count_f) - 8 and int(dropped) > 0
    assert int(dropped_f) == 0


def test_remat_names_policies_match_full_recompute():
    """remat="names"/"names_mlp" (save tagged projection outputs) change
    only what the backward stores, never the gradients: bitwise-equal-level
    parity with remat=True on the fp32 CPU path."""
    from livecc_tpu.models.qwen2_vl.text import text_forward

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))["text"]
    rng = np.random.RandomState(0)
    s = 32
    embeds = jnp.asarray(rng.randn(1, s, cfg.text.hidden_size), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(s)[None, None], (3, 1, s)).astype(jnp.int32)

    def loss(p, remat):
        h, _ = text_forward(p, cfg.text, embeds, pos, remat=remat)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    g_ref = jax.grad(lambda p: loss(p, True))(params)
    for mode in ("names", "names_mlp"):
        g = jax.grad(lambda p: loss(p, mode))(params)
        for a, b_ in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-8)


def test_sequence_parallel_matches_unsharded():
    """TrainConfig.seq_shard (megatron SP as GSPMD constraints): identical
    loss/updated params to the plain TP step on the 4x2 CPU mesh."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=4, n_model=2, devices=devs[:8])
    cfg = tiny_config()
    batch0 = text_batch(cfg, accum=2, b=4, s=32)
    bspec = Batch(
        input_ids=P(None, "data"), labels=P(None, "data"),
        position_ids=P(None, None, "data"), attention_mask=P(None, "data"),
    )

    def run(seq_shard):
        params = init_params(cfg, jax.random.PRNGKey(0))
        tcfg = TrainConfig(learning_rate=1e-3, total_steps=10, seq_shard=seq_shard)
        opt = make_optimizer(tcfg)
        params = shard_params(params, mesh)
        opt_state = opt.init(split_frozen(params, tcfg.freeze_modules)[0])
        opt_specs = zero2_pspecs(opt_state, n_data=4)
        opt_state = jax.tree_util.tree_map(
            lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), opt_state, opt_specs
        )
        batch = jax.tree_util.tree_map(
            lambda x, sp: x if x is None else jax.device_put(x, NamedSharding(mesh, sp)),
            batch0, bspec, is_leaf=lambda x: x is None,
        )
        pshard = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), param_pspecs(params))
        oshard = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), opt_specs)
        with jax.set_mesh(mesh):
            step = jax.jit(make_train_step(cfg, tcfg, opt),
                           out_shardings=(pshard, oshard, None))
            params, opt_state, metrics = step(params, opt_state, batch)
        return float(metrics["loss"]), params

    loss_tp, p_tp = run(False)
    loss_sp, p_sp = run(True)
    np.testing.assert_allclose(loss_sp, loss_tp, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_tp), jax.tree_util.tree_leaves(p_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_ce_bf16_logit_rows_bounded_drift():
    """The TPU fast path rounds CE logit rows to bf16 (ops/chunked_ce.py,
    CE_LOGITS): loss and hidden-state gradients must track the fp32 path to
    bf16 rounding scale — this bounds the drift the bandwidth win costs."""
    from livecc_tpu.ops.chunked_ce import chunked_cross_entropy

    rng = np.random.RandomState(0)
    b, s, h, v = 2, 48, 64, 512
    hidden = jnp.asarray(rng.randn(b, s, h).astype(np.float32))
    kernel = jnp.asarray((rng.randn(h, v) / np.sqrt(h)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, v, size=(b, s)).astype(np.int32))
    labels = labels.at[:, :8].set(-100)

    def mean_loss(hid, dtype):
        loss, count = chunked_cross_entropy(hid, kernel, labels, chunk_size=16,
                                            logit_dtype=dtype)
        return loss / jnp.maximum(count, 1)

    l32, g32 = jax.value_and_grad(mean_loss)(hidden, None)
    l16, g16 = jax.value_and_grad(mean_loss)(hidden, jnp.bfloat16)
    # bf16 rounds an O(|logit|) value with ~2^-8 relative error; the mean
    # over hundreds of supervised tokens keeps the loss within ~1e-2.
    assert abs(float(l16) - float(l32)) < 2e-2 * max(1.0, float(l32))
    rel = float(jnp.linalg.norm(g16 - g32) / jnp.linalg.norm(g32))
    assert rel < 5e-2, rel
    # count identical (masking logic unaffected by dtype)
    _, c32 = chunked_cross_entropy(hidden, kernel, labels, chunk_size=16)
    _, c16 = chunked_cross_entropy(hidden, kernel, labels, chunk_size=16,
                                   logit_dtype=jnp.bfloat16)
    assert int(c32) == int(c16)


def test_fused_ce_matches_scan_grads():
    """impl="fused" (custom_vjp: grads computed in the forward chunk scan,
    the TPU default — ops/chunked_ce.py) must reproduce the checkpoint-
    recompute path's loss AND both gradients at fp32, including padding
    (s % chunk != 0), label masking and the frozen-kernel fast path."""
    from livecc_tpu.ops.chunked_ce import chunked_cross_entropy

    rng = np.random.RandomState(3)
    b, s, h, v = 2, 50, 64, 512                       # 50 % 16 != 0: pad leg
    hidden = jnp.asarray(rng.randn(b, s, h).astype(np.float32))
    kernel = jnp.asarray((rng.randn(h, v) / np.sqrt(h)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, v, size=(b, s)).astype(np.int32))
    labels = labels.at[0, :48].set(-100)              # one chunk fully masked

    def mean_loss(hid, ker, impl, kg=True):
        loss, count = chunked_cross_entropy(hid, ker, labels, chunk_size=16,
                                            impl=impl, kernel_grad=kg)
        return loss / jnp.maximum(count, 1)

    l0, (gh0, gk0) = jax.value_and_grad(
        lambda a, k: mean_loss(a, k, "scan"), argnums=(0, 1))(hidden, kernel)
    l1, (gh1, gk1) = jax.value_and_grad(
        lambda a, k: mean_loss(a, k, "fused"), argnums=(0, 1))(hidden, kernel)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    assert float(jnp.linalg.norm(gh1 - gh0) / jnp.linalg.norm(gh0)) < 1e-5
    assert float(jnp.linalg.norm(gk1 - gk0) / jnp.linalg.norm(gk0)) < 1e-5
    # kernel_grad=False: hidden grad unchanged, kernel cotangent zeros
    _, (gh2, gk2) = jax.value_and_grad(
        lambda a, k: mean_loss(a, k, "fused", kg=False), argnums=(0, 1))(hidden, kernel)
    assert float(jnp.linalg.norm(gh2 - gh0) / jnp.linalg.norm(gh0)) < 1e-5
    assert float(jnp.linalg.norm(gk2)) == 0.0
    # undifferentiated primal: identical math to the scan path
    lA = chunked_cross_entropy(hidden, kernel, labels, chunk_size=16, impl="scan")
    lB = chunked_cross_entropy(hidden, kernel, labels, chunk_size=16, impl="fused")
    assert float(lA[0]) == float(lB[0]) and int(lA[1]) == int(lB[1])
    # all-masked batch stays finite (softmax over garbage rows is masked out)
    allmask = jnp.full((b, s), -100, jnp.int32)
    lD, gD = jax.value_and_grad(
        lambda a: chunked_cross_entropy(a, kernel, allmask, chunk_size=16,
                                        impl="fused")[0])(hidden)
    assert float(lD) == 0.0 and bool(jnp.all(gD == 0.0))


def test_fused_ce_in_train_step_matches_scan():
    """End-to-end: one train step with ce_impl="fused" vs "scan" produces
    the same loss and updated params (fp32, CPU) — the custom_vjp composes
    with remat, the grad-accum scan, the sup-bucket gather and AdamW."""
    cfg = tiny_config()
    params0 = init_params(cfg, jax.random.PRNGKey(0))
    batch = text_batch(cfg, accum=2)

    def run(impl):
        tcfg = TrainConfig(learning_rate=1e-3, total_steps=10, ce_chunk_size=16,
                           ce_sup_bucket=32, ce_impl=impl)
        opt = make_optimizer(tcfg)
        opt_state = opt.init(split_frozen(params0, tcfg.freeze_modules)[0])
        step = jax.jit(make_train_step(cfg, tcfg, opt))
        params, _, metrics = step(params0, opt_state, batch)
        return float(metrics["loss"]), params

    loss_s, p_s = run("scan")
    loss_f, p_f = run("fused")
    np.testing.assert_allclose(loss_f, loss_s, rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(p_s), jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-7)
