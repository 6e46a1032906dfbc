"""CPU smoke for tools/exp_7b_train_slice.py (VERDICT r4 next #7).

The tool's product run is TPU-only (true 7B width); this pins the step
construction on a tiny config so the tool cannot rot: loss is finite,
layer params actually update, frozen embed/head do not, and the FLOP
model stays positive and width-monotonic. It also guards the round-5
relay regression: the frozen tree must enter the jitted step as an
ARGUMENT (closure-capturing ~2.2 GB of embed/head lowers them as inline
constants, which the axon remote-compile transport cannot ship).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tools.exp_7b_train_slice as slice_mod
from livecc_tpu.core.config import ModelConfig, tiny_config
from livecc_tpu.models.qwen2_vl.text import init_text_params


@pytest.fixture()
def small_seq(monkeypatch):
    monkeypatch.setattr(slice_mod, "SEQ", 96)
    monkeypatch.setattr(slice_mod, "SUP", 24)


def test_build_step_runs_and_updates_only_layers(small_seq):
    cfg = tiny_config()
    params = init_text_params(cfg.text, jax.random.PRNGKey(0), dtype=jnp.float32)
    step, layers, opt_state = slice_mod.build_step(cfg, params)

    before = jax.tree_util.tree_map(np.asarray, layers)
    embed_before = np.asarray(params["embed"]["weight"])
    new_layers, opt_state, loss, gn = step(layers, opt_state)
    loss = float(loss)

    assert np.isfinite(loss) and loss > 0.0
    assert float(gn) > 0.0
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - b))), new_layers, before)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
    # frozen tree rides as a jit argument and is never written back
    assert np.array_equal(np.asarray(params["embed"]["weight"]), embed_before)
    assert "embed" not in new_layers and "lm_head" not in new_layers


def test_frozen_tree_is_not_lowered_as_constants(small_seq):
    """The jitted step's lowered text must reference the frozen leaves as
    parameters; a closure-captured embed would appear as a dense constant
    of vocab x hidden elements in the StableHLO."""
    cfg = tiny_config()
    params = init_text_params(cfg.text, jax.random.PRNGKey(0), dtype=jnp.float32)
    step, layers, opt_state = slice_mod.build_step(cfg, params)
    # Lower the RAW jit with frozen as argument 3 — wrapping in an outer
    # jit closure would itself re-capture frozen as constants and mask
    # the regression this test guards.
    lowered = step.jit_step.lower(layers, opt_state, step.frozen)
    text = lowered.as_text()
    # a captured [1024, 64] fp32 embed constant would serialize >64k floats;
    # the whole module must stay far smaller than that
    assert len(text) < 2_000_000
    # no weight-sized tensor may appear as a lowered constant
    bad = [ln for ln in text.splitlines()
           if "constant" in ln and ("1024x64" in ln or "64x1024" in ln)]
    assert not bad, bad[:2]


def test_flop_model_monotonic_in_width():
    tiny = tiny_config().text
    full = ModelConfig.qwen2_vl_7b().text
    f_tiny = slice_mod.flop_model_per_layer(tiny, 1024)
    f_full = slice_mod.flop_model_per_layer(full, 1024)
    assert 0 < f_tiny < f_full
    # seq-quadratic attention term present
    assert slice_mod.flop_model_per_layer(full, 2048) > 2 * slice_mod.flop_model_per_layer(full, 1024)
