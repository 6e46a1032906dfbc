"""Chip-speed calibration: a fixed bf16 matmul chain timed each bench run.

The TPU here is time-shared behind a relay: identical programs measure
1.5-2x apart across sessions (PERF.md round-2 notes), so absolute walls are
not comparable across runs. Every bench JSON carries this program's
achieved TFLOP/s as a scale factor — cross-session comparisons divide by
it (VERDICT r2 weak #6).
"""

from __future__ import annotations

import time

import numpy as np

CAL_N = 8192
CAL_CHAIN = 8
CAL_FLOPS = CAL_CHAIN * 2 * CAL_N**3


def calibrate_matmul() -> dict:
    """Returns {"wall_s", "achieved_tflops"} for the fixed matmul chain.

    Scalar output only: pulling a [8k, 8k] result through the relay costs
    seconds of pure transfer and would swamp the measurement.
    """
    import jax
    import jax.numpy as jnp

    n = CAL_N
    x = jnp.ones((n, n), jnp.bfloat16)
    w = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def prog(x, w):
        for _ in range(CAL_CHAIN):
            x = (x @ w) * (1.0 / n)
        return jnp.sum(x)

    np.asarray(prog(x, w))                  # compile + warm
    t0 = time.perf_counter()
    np.asarray(prog(x, w))                  # forced completion (CLAUDE.md)
    wall = time.perf_counter() - t0
    return {
        "wall_s": round(wall, 4),
        "achieved_tflops": round(CAL_FLOPS / wall / 1e12, 1),
    }
