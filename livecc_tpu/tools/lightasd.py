"""Light-ASD active-speaker scorer in JAX (reference model/ equivalent).

Reference: data/production/distributed_lighter_asd/model/ — a small
audio-visual net scoring whether a tracked face tube is speaking:
grayscale face crops through a 3D-conv visual encoder, audio MFCCs through
a 2D-conv encoder, fused and classified per frame by a bidirectional GRU
(Encoder.py + Classifier.py). Used by tools.asd.talking_ratio as the
``score_track`` callable once weights are available (the reference ships
a torch checkpoint; convert_torch_state maps it onto this pytree).

This is an idiomatic JAX re-implementation of the architecture family —
separable 3D/2D conv stacks at matching downsampling rates (visual 25 fps
frames, audio 100 fps MFCC -> both to 25 fps features), BiGRU via lax.scan.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]

VISUAL_SIZE = 112        # grayscale face crop side
FEAT_DIM = 128


def _conv_init(key, shape, fan_in, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * (2.0 / fan_in) ** 0.5


def init_lightasd_params(key: jax.Array, feat: int = FEAT_DIM) -> Params:
    ks = iter(jax.random.split(key, 24))
    def conv3d(cin, cout, kt, kxy):
        shape = (kt, kxy, kxy, cin, cout)
        return {"kernel": _conv_init(next(ks), shape, kt * kxy * kxy * cin),
                "bias": jnp.zeros((cout,))}
    def conv2d(cin, cout, kh, kw):
        shape = (kh, kw, cin, cout)
        return {"kernel": _conv_init(next(ks), shape, kh * kw * cin),
                "bias": jnp.zeros((cout,))}
    def dense(cin, cout):
        return {"kernel": _conv_init(next(ks), (cin, cout), cin),
                "bias": jnp.zeros((cout,))}
    def gru(cin, hidden):
        return {"wi": _conv_init(next(ks), (cin, 3 * hidden), cin),
                "wh": _conv_init(next(ks), (hidden, 3 * hidden), hidden),
                "bi": jnp.zeros((3 * hidden,)), "bh": jnp.zeros((3 * hidden,))}
    h = feat // 2
    return {
        "visual": {
            "c1": conv3d(1, 32, 5, 7),      # temporal context, spatial /4
            "c2": conv3d(32, 64, 3, 5),     # spatial /2
            "c3": conv3d(64, feat, 3, 3),   # spatial /2 then global pool
        },
        "audio": {
            "c1": conv2d(1, 32, 3, 3),
            "c2": conv2d(32, 64, 3, 3),
            "c3": conv2d(64, feat, 3, 3),
        },
        "gru_fw": gru(2 * feat, h),
        "gru_bw": gru(2 * feat, h),
        "head": dense(2 * h, 1),
    }


def _conv3d(x, p, stride):
    y = lax.conv_general_dilated(
        x, p["kernel"], window_strides=stride, padding="SAME",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )
    return jax.nn.relu(y + p["bias"])


def _conv2d(x, p, stride):
    y = lax.conv_general_dilated(
        x, p["kernel"], window_strides=stride, padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + p["bias"])


def visual_frontend(params: Params, faces: jnp.ndarray) -> jnp.ndarray:
    """[B, T, 112, 112] grayscale in [0,1] -> [B, T, feat]."""
    x = faces[..., None]                                     # NTHWC
    x = _conv3d(x, params["c1"], (1, 4, 4))
    x = _conv3d(x, params["c2"], (1, 2, 2))
    x = _conv3d(x, params["c3"], (1, 2, 2))
    return jnp.mean(x, axis=(2, 3))                          # global spatial pool


def audio_frontend(params: Params, mfcc: jnp.ndarray) -> jnp.ndarray:
    """[B, Ta, n_mfcc] at 100 fps -> [B, Ta/4, feat] (~25 fps)."""
    x = mfcc[..., None]                                      # NHWC (time, coeff)
    x = _conv2d(x, params["c1"], (2, 1))
    x = _conv2d(x, params["c2"], (2, 1))
    x = _conv2d(x, params["c3"], (1, 1))
    return jnp.mean(x, axis=2)                               # pool coeff axis


def _gru_scan(p: Params, xs: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
    """[B, T, C] -> [B, T, H] single-direction GRU."""
    b, t, c = xs.shape
    h0 = jnp.zeros((b, p["wh"].shape[0]))

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
    """Per-frame speaking logits [B, T].

    faces: [B, T, 112, 112] grayscale in [0,1];
    mfcc:  [B, 4*T, n_mfcc] (100 fps audio features for 25 fps frames).
    """
    v = visual_frontend(params["visual"], faces)             # [B, T, F]
    a = audio_frontend(params["audio"], mfcc)                # [B, ~T, F]
    t = v.shape[1]
    a = a[:, :t]
    a = jnp.pad(a, ((0, 0), (0, t - a.shape[1]), (0, 0)))
    x = jnp.concatenate([v, a], axis=-1)
    fw = _gru_scan(params["gru_fw"], x)
    bw = _gru_scan(params["gru_bw"], x, reverse=True)
    h = jnp.concatenate([fw, bw], axis=-1)
    return (h @ params["head"]["kernel"] + params["head"]["bias"])[..., 0]


def track_score(params: Params, faces: jnp.ndarray, mfcc: jnp.ndarray) -> float:
    """Mean speaking probability over a tube — the ``score_track`` signature
    tools.asd.talking_ratio expects (after partial application)."""
    logits = lightasd_scores(params, faces[None], mfcc[None])
    return float(jax.nn.sigmoid(logits).mean())
