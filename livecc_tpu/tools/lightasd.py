"""Light-ASD active-speaker scorer in JAX — weight-compatible with the
reference checkpoint.

Reference: data/production/distributed_lighter_asd/model/{Encoder,
Classifier,Model}.py + lightasd.py — a small audio-visual net scoring
whether a tracked face tube is speaking. The reference ships a trained
checkpoint (finetuning_TalkSet.model); this module reproduces the exact
architecture so ``convert_torch_state`` can load it:

- visual encoder (Encoder.py:83-117): grayscale face tubes [B,T,112,112],
  normalized (x/255 - 0.4161)/0.1688 (Model.py:18), through three
  Visual_Blocks — parallel (1,3,3)/(1,5,5) spatial convs each followed by
  a (3,1,1)/(5,1,1) temporal conv, branches summed, 1x1x1 fuse conv; every
  conv is bias-free + BatchNorm(eps=1e-3) + ReLU (Encoder.py:38-80).
  Block1 downsamples spatially 2x; (1,3,3)-stride-(1,2,2) max pools after
  blocks 1 and 2; adaptive spatial MAX pool to [B,T,128].
- audio encoder (Encoder.py:129-156): MFCC [B,4T,13] as a (freq,time)
  image through three Audio_Blocks — parallel (3,1)/(5,1) freq convs each
  followed by (1,3)/(1,5) time convs, summed, 1x1 fuse; time max-pooled 2x
  after blocks 1 and 2 (100 fps MFCC -> 25 fps features); mean over freq
  -> [B,T,128].
- backend (Model.py:27-30 + Classifier.py): audio + visual embeddings are
  ADDED, then a sequential bi-GRU — forward GRU(128), GELU, time-reversed
  backward GRU(128), GELU — and the lossAV head Linear(128,2) whose
  class-1 logit is the per-frame speaking score (lightasd.py:4-10).

Numerics: BatchNorm is inference-only here and folded into per-channel
scale/bias at conversion; GELU is torch's exact (erf) variant; convs use
torch's symmetric explicit padding (NOT XLA "SAME", whose asymmetric
stride-2 padding would shift the grid).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = dict[str, Any]

VISUAL_SIZE = 112        # grayscale face crop side (asd_utils resized_crop)
FEAT_DIM = 128
VISUAL_MEAN = 0.4161     # Model.py:18
VISUAL_STD = 0.1688

_VIS_BRANCHES = ("s_3", "t_3", "s_5", "t_5", "last")
_AUD_BRANCHES = ("m_3", "t_3", "m_5", "t_5", "last")


# ---------------------------------------------------------------- params

def _kaiming(key, shape, fan_in, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * (2.0 / fan_in) ** 0.5


def init_lightasd_params(key: jax.Array) -> Params:
    """Random params with the exact tree `convert_torch_state` produces."""
    ks = iter(jax.random.split(key, 64))

    def cbn(shape):
        fan_in = int(np.prod(shape[:-1]))
        cout = shape[-1]
        return {"kernel": _kaiming(next(ks), shape, fan_in),
                "scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,))}

    def vis_block(cin, cout):
        # kernels in THWIO layout
        return {
            "s_3": cbn((1, 3, 3, cin, cout)), "t_3": cbn((3, 1, 1, cout, cout)),
            "s_5": cbn((1, 5, 5, cin, cout)), "t_5": cbn((5, 1, 1, cout, cout)),
            "last": cbn((1, 1, 1, cout, cout)),
        }

    def aud_block(cin, cout):
        # kernels in HWIO layout, H=freq W=time
        return {
            "m_3": cbn((3, 1, cin, cout)), "t_3": cbn((1, 3, cout, cout)),
            "m_5": cbn((5, 1, cin, cout)), "t_5": cbn((1, 5, cout, cout)),
            "last": cbn((1, 1, cout, cout)),
        }

    def gru(cin, hidden):
        return {"wi": _kaiming(next(ks), (cin, 3 * hidden), cin),
                "wh": _kaiming(next(ks), (hidden, 3 * hidden), hidden),
                "bi": jnp.zeros((3 * hidden,)), "bh": jnp.zeros((3 * hidden,))}

    f = FEAT_DIM
    return {
        "visual": {"block1": vis_block(1, 32), "block2": vis_block(32, 64),
                   "block3": vis_block(64, f)},
        "audio": {"block1": aud_block(1, 32), "block2": aud_block(32, 64),
                  "block3": aud_block(64, f)},
        "gru_fw": gru(f, f),
        "gru_bw": gru(f, f),
        "fc": {"kernel": _kaiming(next(ks), (f, 2), f), "bias": jnp.zeros((2,))},
    }


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def convert_torch_state(state_dict: dict) -> Params:
    """Map the reference checkpoint's torch state dict onto this pytree.

    Layout source: finetuning_TalkSet.model — keys
    ``model.visualEncoder.blockN.{s_3,t_3,s_5,t_5,last}.weight`` (+
    ``bn_*`` BatchNorm stats), ``model.audioEncoder.blockN.{m_3,...}``,
    ``model.GRU.gru_{forward,backward}.{weight,bias}_{ih,hh}_l0`` and
    ``lossAV.FC.{weight,bias}``; ``lossV.*`` is unused (the reference loads
    with strict=False, lightasd.py:19). BatchNorm (eps=1e-3) is folded into
    per-channel scale/bias since inference never updates running stats.
    """
    sd = {k: v for k, v in state_dict.items()}

    def fold_bn(prefix: str, bn: str, kernel: np.ndarray) -> Params:
        g = _np(sd[f"{prefix}.{bn}.weight"])
        b = _np(sd[f"{prefix}.{bn}.bias"])
        mean = _np(sd[f"{prefix}.{bn}.running_mean"])
        var = _np(sd[f"{prefix}.{bn}.running_var"])
        inv = g / np.sqrt(var + 1e-3)
        return {"kernel": jnp.asarray(kernel), "scale": jnp.asarray(inv),
                "bias": jnp.asarray(b - mean * inv)}

    def vis_block(prefix: str) -> Params:
        out = {}
        for name in _VIS_BRANCHES:
            w = _np(sd[f"{prefix}.{name}.weight"])          # (O,I,kT,kH,kW)
            out[name] = fold_bn(prefix, f"bn_{name}", w.transpose(2, 3, 4, 1, 0))
        return out

    def aud_block(prefix: str) -> Params:
        out = {}
        for name in _AUD_BRANCHES:
            w = _np(sd[f"{prefix}.{name}.weight"])          # (O,I,kH,kW)
            out[name] = fold_bn(prefix, f"bn_{name}", w.transpose(2, 3, 1, 0))
        return out

    def gru(prefix: str) -> Params:
        return {
            "wi": jnp.asarray(_np(sd[f"{prefix}.weight_ih_l0"]).T),   # [C,3H] r|z|n
            "wh": jnp.asarray(_np(sd[f"{prefix}.weight_hh_l0"]).T),
            "bi": jnp.asarray(_np(sd[f"{prefix}.bias_ih_l0"])),
            "bh": jnp.asarray(_np(sd[f"{prefix}.bias_hh_l0"])),
        }

    return {
        "visual": {f"block{i}": vis_block(f"model.visualEncoder.block{i}")
                   for i in (1, 2, 3)},
        "audio": {f"block{i}": aud_block(f"model.audioEncoder.block{i}")
                  for i in (1, 2, 3)},
        "gru_fw": gru("model.GRU.gru_forward"),
        "gru_bw": gru("model.GRU.gru_backward"),
        "fc": {"kernel": jnp.asarray(_np(sd["lossAV.FC.weight"]).T),
               "bias": jnp.asarray(_np(sd["lossAV.FC.bias"]))},
    }


def load_torch_checkpoint(path: str) -> Params:
    """Load the reference .model file (torch state dict) into JAX params."""
    import torch

    return convert_torch_state(torch.load(path, map_location="cpu", weights_only=True))


# ---------------------------------------------------------------- forward

def _cbn3d(x, p, stride, pad):
    """conv3d (bias-free) + folded BatchNorm + ReLU, torch padding."""
    y = lax.conv_general_dilated(
        x, p["kernel"], window_strides=stride,
        padding=[(q, q) for q in pad],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )
    return jax.nn.relu(y * p["scale"] + p["bias"])


def _cbn2d(x, p, pad):
    y = lax.conv_general_dilated(
        x, p["kernel"], window_strides=(1, 1),
        padding=[(q, q) for q in pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y * p["scale"] + p["bias"])


def _maxpool_spatial(x):
    """MaxPool3d k(1,3,3) s(1,2,2) p(0,1,1) on NTHWC (Encoder.py:88,91)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, window_dimensions=(1, 1, 3, 3, 1),
        window_strides=(1, 1, 2, 2, 1),
        padding=[(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _maxpool_time(x):
    """MaxPool over the time (W) axis k3 s2 p1 on NHWC (Encoder.py:134,137)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, window_dimensions=(1, 1, 3, 1),
        window_strides=(1, 1, 2, 1),
        padding=[(0, 0), (0, 0), (1, 1), (0, 0)],
    )


def _visual_block(x, p, down: bool):
    s_stride = (1, 2, 2) if down else (1, 1, 1)
    x3 = _cbn3d(x, p["s_3"], s_stride, (0, 1, 1))
    x3 = _cbn3d(x3, p["t_3"], (1, 1, 1), (1, 0, 0))
    x5 = _cbn3d(x, p["s_5"], s_stride, (0, 2, 2))
    x5 = _cbn3d(x5, p["t_5"], (1, 1, 1), (2, 0, 0))
    return _cbn3d(x3 + x5, p["last"], (1, 1, 1), (0, 0, 0))


def _audio_block(x, p):
    x3 = _cbn2d(x, p["m_3"], (1, 0))
    x3 = _cbn2d(x3, p["t_3"], (0, 1))
    x5 = _cbn2d(x, p["m_5"], (2, 0))
    x5 = _cbn2d(x5, p["t_5"], (0, 2))
    return _cbn2d(x3 + x5, p["last"], (0, 0))


def visual_frontend(params: Params, faces: jnp.ndarray) -> jnp.ndarray:
    """[B, T, 112, 112] raw grayscale (0..255) -> [B, T, 128]."""
    x = ((faces / 255.0 - VISUAL_MEAN) / VISUAL_STD)[..., None]   # NTHWC
    x = _visual_block(x, params["block1"], down=True)
    x = _maxpool_spatial(x)
    x = _visual_block(x, params["block2"], down=False)
    x = _maxpool_spatial(x)
    x = _visual_block(x, params["block3"], down=False)
    return jnp.max(x, axis=(2, 3))        # AdaptiveMaxPool2d((1,1)), :95


def audio_frontend(params: Params, mfcc: jnp.ndarray) -> jnp.ndarray:
    """[B, 4T, n_mfcc] 100 fps MFCC -> [B, T, 128] 25 fps features."""
    x = jnp.swapaxes(mfcc, 1, 2)[..., None]      # [B, freq, time, 1] NHWC
    x = _audio_block(x, params["block1"])
    x = _maxpool_time(x)
    x = _audio_block(x, params["block2"])
    x = _maxpool_time(x)
    x = _audio_block(x, params["block3"])
    return jnp.mean(x, axis=1)                   # mean over freq, :153-154


def _gru_scan(p: Params, xs: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
    """[B, T, C] -> [B, T, H] single-direction GRU (torch gate math/order)."""
    b = xs.shape[0]
    h0 = jnp.zeros((b, p["wh"].shape[0]), xs.dtype)

    def step(h, x):
        gates_i = x @ p["wi"] + p["bi"]
        gates_h = h @ p["wh"] + p["bh"]
        ir, iz, in_ = jnp.split(gates_i, 3, axis=-1)
        hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(in_ + r * hn)
        h = (1 - z) * n + z * h
        return h, h

    _, hs = lax.scan(step, h0, jnp.swapaxes(xs, 0, 1), reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


@jax.jit
def lightasd_scores(params: Params, faces: jnp.ndarray, mfcc: jnp.ndarray) -> jnp.ndarray:
    """Per-frame speaking logits [B, T] (lossAV class-1 logit, >0 = talking).

    faces: [B, T, 112, 112] raw grayscale 0..255;
    mfcc:  [B, 4*T, n_mfcc] (100 fps features aligned to 25 fps frames,
    main.py:29-32).
    """
    v = visual_frontend(params["visual"], faces)              # [B, T, F]
    a = audio_frontend(params["audio"], mfcc)                 # [B, T, F]
    # align: a no-op when mfcc covers exactly 4*T frames (the reference pads
    # it so, main.py:59); trims/zero-pads otherwise
    t = v.shape[1]
    a = jnp.pad(a[:, :t], ((0, 0), (0, max(t - a.shape[1], 0)), (0, 0)))
    x = a + v                                                 # Model.py:28
    x = jax.nn.gelu(_gru_scan(params["gru_fw"], x), approximate=False)
    x = _gru_scan(params["gru_bw"], x, reverse=True)
    x = jax.nn.gelu(x, approximate=False)                     # Classifier.py:15-22
    return (x @ params["fc"]["kernel"] + params["fc"]["bias"])[..., 1]


def track_score(params: Params, faces: jnp.ndarray, mfcc: jnp.ndarray) -> float:
    """Mean speaking probability over a tube — the ``score_track`` signature
    tools.asd.talking_ratio expects (after partial application)."""
    logits = lightasd_scores(params, faces[None], mfcc[None])
    return float(jax.nn.sigmoid(logits).mean())
