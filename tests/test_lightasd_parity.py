"""Light-ASD weight compatibility: the REAL reference checkpoint, converted
by convert_torch_state, must reproduce the reference torch model's scores.

Oracle: the reference implementation itself
(data/production/distributed_lighter_asd/{lightasd,model/*}.py) loaded with
finetuning_TalkSet.model — skipped when that tree isn't present.
"""

import os
import sys

import numpy as np
import pytest

_REF_DIR = "/root/reference/data/production/distributed_lighter_asd"
_CKPT = os.path.join(_REF_DIR, "finetuning_TalkSet.model")

pytestmark = pytest.mark.skipif(
    not os.path.exists(_CKPT), reason="reference Light-ASD checkpoint not present"
)


def _load_ref_model():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, _REF_DIR)
    try:
        import lightasd as ref_lightasd  # noqa: F401  (reference module)
        net = ref_lightasd.LightASD()
        sd = torch.load(_CKPT, map_location="cpu", weights_only=True)
        net.load_state_dict(sd, strict=False)
        net.eval()
        return net, sd
    finally:
        sys.path.remove(_REF_DIR)
        # the reference dir's top-level modules must not leak into later tests
        for m in ("lightasd", "model", "model.Model", "model.Encoder", "model.Classifier"):
            sys.modules.pop(m, None)


@pytest.fixture(scope="module")
def ref_and_params():
    from livecc_tpu.tools.lightasd import convert_torch_state

    net, sd = _load_ref_model()
    return net, convert_torch_state(sd)


def test_real_checkpoint_score_parity(ref_and_params):
    """Full forward (visual + audio + BiGRU + lossAV head) on the real
    checkpoint: JAX scores match torch to fp32 tolerance."""
    import torch

    from livecc_tpu.tools.lightasd import lightasd_scores

    net, params = ref_and_params
    rng = np.random.RandomState(0)
    b, t = 2, 8
    faces = rng.randint(0, 256, size=(b, t, 112, 112)).astype(np.float32)
    mfcc = rng.randn(b, 4 * t, 13).astype(np.float32) * 10.0

    with torch.inference_mode():
        ref = net(torch.from_numpy(faces), torch.from_numpy(mfcc)).numpy()
    got = np.asarray(lightasd_scores(params, faces, mfcc))
    assert got.shape == ref.shape == (b, t)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)
    # the downstream keep/drop decision is score > 0 (main.py:104-106):
    # sign agreement must be exact away from the boundary
    confident = np.abs(ref) > 1e-2
    assert ((got > 0) == (ref > 0))[confident].all()


def test_real_checkpoint_frontend_parity(ref_and_params):
    """Per-frontend parity isolates any drift: visual tube embedding and
    audio MFCC embedding each match torch."""
    import torch

    from livecc_tpu.tools.lightasd import audio_frontend, visual_frontend

    net, params = ref_and_params
    rng = np.random.RandomState(1)
    faces = rng.randint(0, 256, size=(1, 6, 112, 112)).astype(np.float32)
    mfcc = rng.randn(1, 24, 13).astype(np.float32) * 10.0

    with torch.inference_mode():
        ref_v = net.model.forward_visual_frontend(torch.from_numpy(faces)).numpy()
        ref_a = net.model.forward_audio_frontend(torch.from_numpy(mfcc)).numpy()
    got_v = np.asarray(visual_frontend(params["visual"], faces))
    got_a = np.asarray(audio_frontend(params["audio"], mfcc))
    np.testing.assert_allclose(got_v, ref_v, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(got_a, ref_a, atol=2e-4, rtol=1e-4)


def test_load_torch_checkpoint_roundtrip():
    """load_torch_checkpoint is the one-call converter the docstring
    promises; spot-check a folded BatchNorm against hand math."""
    import torch

    from livecc_tpu.tools.lightasd import load_torch_checkpoint

    params = load_torch_checkpoint(_CKPT)
    sd = torch.load(_CKPT, map_location="cpu", weights_only=True)
    g = sd["model.visualEncoder.block1.bn_s_3.weight"].numpy()
    var = sd["model.visualEncoder.block1.bn_s_3.running_var"].numpy()
    mean = sd["model.visualEncoder.block1.bn_s_3.running_mean"].numpy()
    beta = sd["model.visualEncoder.block1.bn_s_3.bias"].numpy()
    inv = g / np.sqrt(var + 1e-3)
    np.testing.assert_allclose(
        np.asarray(params["visual"]["block1"]["s_3"]["scale"]), inv, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["visual"]["block1"]["s_3"]["bias"]),
        beta - mean * inv, rtol=1e-5, atol=1e-6)
    # conv kernel layout: torch (O,I,kT,kH,kW) -> THWIO
    w = sd["model.visualEncoder.block1.s_3.weight"].numpy()
    np.testing.assert_array_equal(
        np.asarray(params["visual"]["block1"]["s_3"]["kernel"]),
        w.transpose(2, 3, 4, 1, 0))
