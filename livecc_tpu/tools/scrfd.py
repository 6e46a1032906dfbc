"""SCRFD-style face detector in JAX (N7-equivalent, no ONNX runtime).

The reference's ASD pipeline detects faces with insightface's ``buffalo_sc``
SCRFD model through onnxruntime (data/production/distributed_lighter_asd/
face_detector.py:9-67): an FPN detector with strides (8, 16, 32), two
anchors per location, a sigmoid face score and a 4-vector of anchor-center
distances per anchor (decoded as ``center -+ distance * stride``), followed
by score thresholding and NMS.

This module implements that contract natively:

  * ``ScrfdConfig`` / ``init_scrfd_params`` — a config-driven SCRFD
    architecture (separable-conv backbone -> top-down FPN -> shared head
    emitting ``score [A]`` / ``bbox [A, 4]`` per stride level).
  * ``scrfd_forward`` — jit-able batched forward: frames -> per-level raw
    outputs, normalization (x - 127.5) / 128 matching face_detector.py:64.
  * ``decode_detections`` — anchor-center generation exactly as
    face_detector.py:15-21 plus distance decode and score threshold
    (numpy; NMS reuses tools/asd.py).
  * ``save_npz`` / ``load_npz`` — weights ship as a plain npz of named
    leaves (the interchange format for weights extracted from an ONNX
    model's initializers on a host that has the onnx package).
  * ``make_detector`` — builds the ``detect_faces(frame) -> (boxes,
    scores)`` callable that tools/asd.py:talking_ratio consumes.

Real buffalo_sc weights are NAS-searched and keyed to its exact graph; with
random init this detector still exercises the full pipeline (shapes,
decode, NMS, tracking) and trains/loads like any other pytree here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from livecc_tpu.tools.asd import nms

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ScrfdConfig:
    """Detector hyperparameters (defaults mirror buffalo_sc's contract:
    strides 8/16/32, 2 anchors, 288x160 input, face_detector.py:9-21)."""

    strides: tuple[int, ...] = (8, 16, 32)
    num_anchors: int = 2
    stem_channels: int = 16
    fpn_channels: int = 24
    head_channels: int = 32
    score_threshold: float = 0.5
    nms_threshold: float = 0.4


def _conv_init(key, h, w, cin, cout):
    fan_in = h * w * cin
    return jax.random.normal(key, (h, w, cin, cout), jnp.float32) * fan_in**-0.5


def init_scrfd_params(cfg: ScrfdConfig, key: jax.Array) -> Params:
    ks = iter(jax.random.split(key, 64))
    c0, cf, ch = cfg.stem_channels, cfg.fpn_channels, cfg.head_channels
    # Backbone: stem (stride 4) then one separable stage per FPN level.
    params: Params = {
        "stem": {"kernel": _conv_init(next(ks), 3, 3, 3, c0)},
        "stages": [],
        "lateral": [],
        "head": {
            "conv1": {"kernel": _conv_init(next(ks), 3, 3, cf, ch)},
            "conv2": {"kernel": _conv_init(next(ks), 3, 3, ch, ch)},
            "score": {"kernel": _conv_init(next(ks), 1, 1, ch, cfg.num_anchors),
                      "bias": jnp.full((cfg.num_anchors,), -4.0)},  # rare-positive prior
            "bbox": {"kernel": _conv_init(next(ks), 1, 1, ch, cfg.num_anchors * 4),
                     "bias": jnp.zeros((cfg.num_anchors * 4,))},
        },
    }
    cin = c0
    for i, _stride in enumerate(cfg.strides):
        cout = c0 * 2 ** (i + 1)
        params["stages"].append({
            "dw": {"kernel": _conv_init(next(ks), 3, 3, 1, cin) * np.sqrt(cin)},
            "pw": {"kernel": _conv_init(next(ks), 1, 1, cin, cout)},
        })
        params["lateral"].append({"kernel": _conv_init(next(ks), 1, 1, cout, cf)})
        cin = cout
    return params


def _conv(x, kernel, stride=1, groups=1):
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=groups,
    )


def scrfd_forward(params: Params, cfg: ScrfdConfig, frames: jnp.ndarray):
    """uint8/float frames [B, H, W, 3] -> per-level (score [B,A], bbox [B,A,4]).

    A = (H/stride) * (W/stride) * num_anchors; bbox entries are raw
    distances in stride units (decoded by ``decode_detections`` — the
    reference multiplies by stride at face_detector.py:52).
    """
    x = (frames.astype(jnp.float32) - 127.5) / 128.0     # face_detector.py:64
    x = jax.nn.relu(_conv(x, params["stem"]["kernel"], stride=2))
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME")
    feats = []
    for stage in params["stages"]:
        cin = x.shape[-1]
        x = jax.nn.relu(_conv(x, stage["dw"]["kernel"], stride=2, groups=cin))
        x = jax.nn.relu(_conv(x, stage["pw"]["kernel"]))
        feats.append(x)
    # top-down FPN: upsample coarser level into finer laterals
    laterals = [_conv(f, lat["kernel"]) for f, lat in zip(feats, params["lateral"])]
    for i in range(len(laterals) - 2, -1, -1):
        up = jax.image.resize(laterals[i + 1], laterals[i].shape, "nearest")
        laterals[i] = laterals[i] + up
    head = params["head"]
    outs = []
    for lvl in laterals:
        h = jax.nn.relu(_conv(lvl, head["conv1"]["kernel"]))
        h = jax.nn.relu(_conv(h, head["conv2"]["kernel"]))
        score = _conv(h, head["score"]["kernel"]) + head["score"]["bias"]
        bbox = _conv(h, head["bbox"]["kernel"]) + head["bbox"]["bias"]
        b = score.shape[0]
        outs.append((
            jax.nn.sigmoid(score).reshape(b, -1),                  # [B, A]
            bbox.reshape(b, -1, 4),                                # [B, A, 4]
        ))
    return outs


def anchor_centers(height: int, width: int, stride: int, num_anchors: int) -> np.ndarray:
    """Flattened anchor centers for one FPN level — exactly the reference's
    construction (face_detector.py:15-20): xy grid * stride, repeated per
    anchor. Grid dims use CEIL division: the SAME-padded stride-2 conv
    chain in scrfd_forward produces ceil-sized feature maps, so for frames
    whose H/W is not a multiple of the stride the anchor count must match
    ceil(h/s)*ceil(w/s) (the reference's 288x160 input hides this)."""
    centers = np.stack(
        np.mgrid[: -(-height // stride), : -(-width // stride)][::-1], axis=-1
    ).astype(np.float32)
    centers = (centers * stride).reshape(-1, 2)
    return np.stack([centers] * num_anchors, axis=1).reshape(-1, 2)


def decode_detections(
    cfg: ScrfdConfig,
    level_outputs,                  # [(score [A], bbox [A,4])] per stride, one frame
    height: int,
    width: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Raw per-level outputs -> (boxes [N,4], scores [N]) after threshold+NMS.

    Distance decode matches face_detector.py:52-55: distances are scaled by
    the level stride; box = [center - d[:2], center + d[2:]].
    """
    all_boxes, all_scores = [], []
    for (score, bbox), stride in zip(level_outputs, cfg.strides):
        score = np.asarray(score)
        dist = np.asarray(bbox) * stride
        centers = anchor_centers(height, width, stride, cfg.num_anchors)
        boxes = np.concatenate([centers - dist[:, :2], centers + dist[:, 2:]], axis=1)
        keep = score >= cfg.score_threshold
        all_boxes.append(boxes[keep])
        all_scores.append(score[keep])
    boxes = np.concatenate(all_boxes, axis=0)
    scores = np.concatenate(all_scores, axis=0)
    if len(boxes):
        order = nms(boxes, scores, cfg.nms_threshold)
        boxes, scores = boxes[order], scores[order]
    return boxes, scores


def make_detector(params: Params, cfg: ScrfdConfig) -> Callable[[np.ndarray], tuple[np.ndarray, np.ndarray]]:
    """Returns ``detect_faces(frame [H,W,3] uint8) -> (boxes, scores)`` for
    tools/asd.py:talking_ratio. The forward is jit-compiled once per frame
    shape; decode/NMS run on host (tiny)."""
    fwd = jax.jit(lambda p, f: scrfd_forward(p, cfg, f))

    def detect_faces(frame: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h, w = frame.shape[:2]
        outs = fwd(params, jnp.asarray(frame)[None])
        level_outputs = [(s[0], b[0]) for s, b in outs]
        return decode_detections(cfg, level_outputs, h, w)

    return detect_faces


def load_onnx_detector(
    path: str, cfg: ScrfdConfig | None = None
) -> Callable[[np.ndarray], tuple[np.ndarray, np.ndarray]]:
    """REAL-weight path: run an insightface SCRFD ONNX graph (buffalo_sc
    ``det_500m.onnx``) natively in JAX — no onnxruntime.

    The graph is parsed by ``tools.onnx_lite`` (protobuf wire format, no
    onnx dependency) and executed by ``tools.onnx_jax`` (jit per frame
    shape). Output contract matches the reference exactly
    (face_detector.py:40-58): outputs [score_8, score_16, score_32,
    bbox_8, bbox_16, bbox_32, (kps...)], scores flattened per anchor, bbox
    distances scaled by stride in ``decode_detections``.
    """
    import jax as _jax
    import jax.numpy as _jnp

    from livecc_tpu.tools.onnx_jax import build_fn
    from livecc_tpu.tools.onnx_lite import load_model

    cfg = cfg or ScrfdConfig()
    model = load_model(path)
    fn = _jax.jit(build_fn(model))
    n_levels = len(cfg.strides)

    def detect_faces(frame: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h, w = frame.shape[:2]
        x = ((frame.astype(np.float32) - 127.5) / 128.0)    # face_detector.py:64
        x = x.transpose(2, 0, 1)[None]                       # NCHW
        outs = fn(_jnp.asarray(x))
        level_outputs = [
            (np.asarray(outs[i]).reshape(-1),
             np.asarray(outs[i + n_levels]).reshape(-1, 4))
            for i in range(n_levels)
        ]
        return decode_detections(cfg, level_outputs, h, w)

    return detect_faces


def save_npz(path: str, params: Params) -> None:
    np.savez(path, **{_pathstr(k): np.asarray(v)
                      for k, v in _iter_leaves(params)})


def _iter_leaves(tree, prefix=()):  # stable name/value pairs for npz round-trip
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _iter_leaves(tree[k], prefix + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _iter_leaves(v, prefix + (str(i),))
    else:
        yield prefix, tree


def _pathstr(path) -> str:
    return "/".join(path)


def load_npz(path: str, cfg: ScrfdConfig) -> Params:
    """npz (as written by save_npz, or converted from ONNX) -> params pytree."""
    data = np.load(path)
    template = init_scrfd_params(cfg, jax.random.PRNGKey(0))
    out = template
    for key, _ in _iter_leaves(template):
        name = _pathstr(key)
        if name not in data:
            raise KeyError(f"weights file missing {name}")
        node = out
        for p in key[:-1]:
            node = node[int(p)] if isinstance(node, list) else node[p]
        leaf = key[-1]
        idx = int(leaf) if isinstance(node, list) else leaf
        node[idx] = jnp.asarray(data[name])
    return out


