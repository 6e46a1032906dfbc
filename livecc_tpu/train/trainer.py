"""Training loop: dataset -> sharded step -> orbax checkpoints -> resume.

Replaces the reference's HF Trainer + DeepSpeed wiring (train.py:25-29):
  * per-host data sharding (each host draws its own sample indices — the
    reference's DataLoader-per-rank equivalent);
  * one compiled step per (seq-bucket, patch-bucket) pair, accumulation
    inside the step;
  * orbax save every ``save_steps`` (reference --save_steps 1000,
    scripts/pt_local.sh:22) with params+opt_state+step; ``resume``
    restores the latest checkpoint (train.py:29 semantics);
  * metrics appended to ``<output_dir>/log.jsonl`` (the reference reports
    to wandb; this log is the neutral equivalent and a wandb hook can
    tail it).
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
import time
from typing import Any

import jax

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.data.lmm_dataset import LMMDataset
from livecc_tpu.train.data import collate
from livecc_tpu.train.step import TrainConfig, make_optimizer, make_train_step

Params = dict[str, Any]


@dataclasses.dataclass
class TrainerConfig:
    output_dir: str = "output"
    total_steps: int = 1000
    accum_steps: int = 8
    save_steps: int = 1000
    log_steps: int = 10
    seed: int = 0
    resume: bool = True


class Trainer:
    def __init__(
        self,
        params: Params,
        cfg: ModelConfig,
        tcfg: TrainConfig,
        run: TrainerConfig,
        dataset: LMMDataset,
    ):
        self.cfg = cfg
        self.tcfg = tcfg
        self.run = run
        self.dataset = dataset
        self.optimizer = make_optimizer(tcfg, params)
        self.params = params
        self.opt_state = self.optimizer.init(params)
        self.step_fn = jax.jit(make_train_step(cfg, tcfg, self.optimizer))
        self.step = 0
        os.makedirs(run.output_dir, exist_ok=True)
        self._ckpt_dir = os.path.abspath(os.path.join(run.output_dir, "ckpt"))
        self._log_path = os.path.join(run.output_dir, "log.jsonl")
        if run.resume:
            self.try_restore()

    # -- checkpointing (orbax) -------------------------------------------

    def _checkpointer(self):
        import orbax.checkpoint as ocp
        return ocp.CheckpointManager(self._ckpt_dir)

    def save(self) -> None:
        import orbax.checkpoint as ocp

        with self._checkpointer() as mgr:
            mgr.save(
                self.step,
                args=ocp.args.Composite(
                    params=ocp.args.StandardSave(self.params),
                    opt_state=ocp.args.StandardSave(self.opt_state),
                ),
            )
            mgr.wait_until_finished()

    def try_restore(self) -> bool:
        import orbax.checkpoint as ocp

        if not os.path.isdir(self._ckpt_dir):
            return False
        with self._checkpointer() as mgr:
            latest = mgr.latest_step()
            if latest is None:
                return False
            restored = mgr.restore(
                latest,
                args=ocp.args.Composite(
                    params=ocp.args.StandardRestore(self.params),
                    opt_state=ocp.args.StandardRestore(self.opt_state),
                ),
            )
            self.params = restored["params"]
            self.opt_state = restored["opt_state"]
            self.step = latest
        return True

    # -- loop --------------------------------------------------------------

    def _log(self, record: dict) -> None:
        with open(self._log_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def sample_indices(self, rng: random.Random) -> list[int]:
        """One accumulation window of sample indices, sharded per host."""
        n_hosts = jax.process_count()
        host = jax.process_index()
        return [
            rng.randrange(host, len(self.dataset) - ((len(self.dataset) - host) % n_hosts) or len(self.dataset), n_hosts)
            if n_hosts > 1 else rng.randrange(len(self.dataset))
            for _ in range(self.run.accum_steps)
        ]

    def _load_batch(self, indices: list[int]):
        samples = [self.dataset[i] for i in indices]
        return collate(samples, self.cfg)

    def train(self) -> dict:
        """Run to total_steps with one-batch lookahead prefetch.

        The reference hides data latency behind 16 DataLoader worker
        processes (lmm_dataset.py __main__, num_workers=16); here a
        background thread decodes/collates batch N+1 (video decode releases
        the GIL in the native library) while the device runs step N.
        """
        from concurrent.futures import ThreadPoolExecutor

        rng = random.Random(self.run.seed + self.step)
        t0 = time.time()
        last = {}
        with ThreadPoolExecutor(max_workers=1) as pool:
            future = pool.submit(self._load_batch, self.sample_indices(rng))
            while self.step < self.run.total_steps:
                batch = future.result()
                if self.step + 1 < self.run.total_steps:
                    future = pool.submit(self._load_batch, self.sample_indices(rng))
                self.params, self.opt_state, metrics = self.step_fn(self.params, self.opt_state, batch)
                self.step += 1
                if self.step % self.run.log_steps == 0 or self.step == self.run.total_steps:
                    last = {
                        "step": self.step,
                        "loss": float(metrics["loss"]),
                        "tokens": int(metrics["tokens"]),
                        "elapsed_s": round(time.time() - t0, 2),
                    }
                    self._log(last)
                if self.step % self.run.save_steps == 0 or self.step == self.run.total_steps:
                    self.save()
        return last
