"""Measure bf16 logits drift at TRUE 7B width vs the fp32 midsize golden.

VERDICT r3 weak #3 asked for kernel-class divergence measured at realistic
width: this runs the multimodal forward with bf16 params + activations on
the XLA path and reports max/mean |Δlogit| plus argmax agreement bucketed
by the golden's own top-1/top-2 margin (a flip at a near-tie is bf16 noise;
a flip at a decided position would be a real parity break). Results in
PERF.md "Real-checkpoint parity".

Usage: python tools/exp_bf16_width.py   (CPU, ~4 min; needs hf_midsize.npz)
"""

import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from livecc_tpu.models import qwen2_vl as m
from livecc_tpu.utils.param_recipe import recipe_tensor
import dataclasses
from livecc_tpu.core.config import ModelConfig

g = np.load(os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                         "hf_midsize.npz"))
full = ModelConfig.qwen2_vl_7b()
cfg = dataclasses.replace(full,
    vision=dataclasses.replace(full.vision, depth=4),
    text=dataclasses.replace(full.text, num_hidden_layers=4))
names = [str(n) for n in g["manifest_names"]]; shapes = g["manifest_shapes"]
state = {n: recipe_tensor(n, tuple(int(d) for d in shapes[i] if d)) for i, n in enumerate(names)}
params = m.convert_state_dict(state, cfg, dtype=jnp.bfloat16)
del state
ids, patches, grid = g["mm_ids"], g["mm_patches"], g["mm_grid"]
pos, _ = m.get_rope_index(cfg, ids, video_grid_thw=grid)
vis = m.prepare_vision_inputs(cfg, patches, [tuple(x) for x in grid])
logits, _ = m.forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos), vision=vis)
lg = np.asarray(logits[0], np.float32)
tail_ref = g["mm_tail"]; am_ref = g["mm_argmax"]; margin = g["mm_margin"]
d = np.abs(lg[-4:] - tail_ref)
am = lg.argmax(-1)
agree = (am == am_ref)
print(f"bf16 mm: max|d|={d.max():.4f} mean|d|={d.mean():.5f} "
      f"ref_logit_absmax={np.abs(tail_ref).max():.2f}")
for eps in (0.0, 5e-3, 2e-2, 5e-2):
    dec = margin > eps
    print(f"  argmax agree @margin>{eps}: {agree[dec].mean():.3f} ({dec.sum()}/{len(dec)} pos)")
