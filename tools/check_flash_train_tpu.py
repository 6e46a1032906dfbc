"""TPU check: flash (Pallas fwd+bwd) training attention vs the XLA path.

Run on a real chip: PYTHONPATH=. python tools/check_flash_train_tpu.py
"""

import numpy as np, time, dataclasses
import jax, jax.numpy as jnp
from livecc_tpu.core.config import tiny_config
from livecc_tpu.train import Batch, TrainConfig, make_optimizer, make_train_step, split_frozen
from livecc_tpu.models.qwen2_vl.model import init_params

cfg = tiny_config()
params = init_params(cfg, jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
a, b, s = 2, 2, 512
ids = rng.randint(8, cfg.text.vocab_size, size=(a, b, s)).astype(np.int32)
labels = ids.copy(); labels[:, :, : s // 2] = -100
pos = np.broadcast_to(np.arange(s)[None, None, None], (a, 3, b, s)).astype(np.int32)
mask = np.ones((a, b, s), bool)
mask[:, :, s - 37:] = False   # right padding
batch = Batch(input_ids=jnp.asarray(ids), labels=jnp.asarray(labels),
              position_ids=jnp.asarray(np.ascontiguousarray(pos)),
              attention_mask=jnp.asarray(mask))
outs = {}
for flash in (False, True):
    tcfg = TrainConfig(learning_rate=1e-3, total_steps=10, ce_chunk_size=128, use_flash=flash)
    opt = make_optimizer(tcfg)
    st = opt.init(split_frozen(params, tcfg.freeze_modules)[0])
    step = jax.jit(make_train_step(cfg, tcfg, opt))
    p2, st2, m = step(params, st, batch)
    outs[flash] = (float(np.asarray(m["loss"])), p2)
l0, p0 = outs[False]; l1, p1 = outs[True]
print("loss xla", l0, "flash", l1, "diff", abs(l0 - l1))
d = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)))
print("max param diff after one step:", d)
# MXU rounding differs between the XLA and Pallas paths (~0.2% on fp32
# inputs); gradient SIGNS matching makes the first Adam step bit-identical.
assert abs(l0 - l1) / l0 < 0.01 and d < 5e-3
print("FLASH TRAIN PARITY OK")
