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
import warnings
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from livecc_tpu.core.config import ModelConfig
from livecc_tpu.core.mesh import DATA_AXIS
from livecc_tpu.data.lmm_dataset import LMMDataset
from livecc_tpu.train.data import collate
from livecc_tpu.train.step import Batch, TrainConfig, make_optimizer, make_train_step, split_frozen

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
    # per-sample decode/collate threads inside the prefetch (the
    # reference's dataloader_num_workers; threads suffice because the
    # native decoder releases the GIL)
    loader_workers: int = 4
    # Sequence packing (train/data.py:pack_samples): pack variable-length
    # samples into rows of this many tokens with per-sample segment-id
    # attention — the step's FLOPs train on real tokens instead of bucket
    # padding (the reference right-pads per-device batch 1 to the longest
    # sample). None disables. Extra samples are fetched until the
    # accumulation window is full; unpacked leftovers carry to the next
    # step.
    pack_seq: int | None = None


class Trainer:
    """Distributed-by-default training loop.

    With ``mesh``: params TP-shard along the model axis, optimizer state
    ZeRO-2-shards along the data axis, and each micro-step carries
    ``n_data`` samples in the batch dimension (the reference's 8-rank
    torchrun + DeepSpeed layout, scripts/pt_local.sh:8). Without it,
    single-device with batch rows = 1.
    """

    def __init__(
        self,
        params: Params,
        cfg: ModelConfig,
        tcfg: TrainConfig,
        run: TrainerConfig,
        dataset: LMMDataset,
        mesh: Mesh | None = None,
    ):
        self.cfg = cfg
        self.tcfg = tcfg
        self.run = run
        self.dataset = dataset
        self.mesh = mesh
        self.optimizer = make_optimizer(tcfg)
        if mesh is None:
            self.batch_rows = 1
            self.params = params
            self.opt_state = self.optimizer.init(split_frozen(params, tcfg.freeze_modules)[0])
            self.step_fn = jax.jit(make_train_step(cfg, tcfg, self.optimizer))
        else:
            from livecc_tpu.parallel.sharding import param_pspecs, shard_params, zero2_pspecs

            n_data = mesh.shape[DATA_AXIS]
            self.batch_rows = n_data
            self.params = shard_params(params, mesh)
            opt_state = self.optimizer.init(split_frozen(self.params, tcfg.freeze_modules)[0])
            self._opt_specs = zero2_pspecs(opt_state, n_data=n_data)
            self.opt_state = jax.tree_util.tree_map(
                lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
                opt_state, self._opt_specs,
            )
            pshard = jax.tree_util.tree_map(
                lambda sp: NamedSharding(mesh, sp), param_pspecs(self.params)
            )
            oshard = jax.tree_util.tree_map(
                lambda sp: NamedSharding(mesh, sp), self._opt_specs
            )
            self.step_fn = jax.jit(
                make_train_step(cfg, tcfg, self.optimizer),
                out_shardings=(pshard, oshard, None),
            )
        self.step = 0
        self._pack_buf: list = []   # sequence-packing carry (pack_seq)
        os.makedirs(run.output_dir, exist_ok=True)
        self._ckpt_dir = os.path.abspath(os.path.join(run.output_dir, "ckpt"))
        self._log_path = os.path.join(run.output_dir, "log.jsonl")
        if run.resume:
            self.try_restore()

    def _place_batch(self, batch: Batch) -> Batch:
        """Shard the batch: sequences split along data, vision replicated
        (the frozen ViT's forward is a small fraction of step FLOPs)."""
        if self.mesh is None:
            return batch
        d = DATA_AXIS
        spec = dataclasses.replace(
            Batch(
                input_ids=P(None, d), labels=P(None, d),
                position_ids=P(None, None, d), attention_mask=P(None, d),
                vision_patches=None if batch.vision_patches is None else P(),
                vision_cos=None if batch.vision_cos is None else P(),
                vision_sin=None if batch.vision_sin is None else P(),
                vision_seg_ids=None if batch.vision_seg_ids is None else P(),
                image_patches=None if batch.image_patches is None else P(),
                image_cos=None if batch.image_cos is None else P(),
                image_sin=None if batch.image_sin is None else P(),
                image_seg_ids=None if batch.image_seg_ids is None else P(),
            ),
            vision_group=batch.vision_group, image_group=batch.image_group,
        )
        return jax.tree_util.tree_map(
            lambda x, sp: x if x is None else jax.device_put(x, NamedSharding(self.mesh, sp)),
            batch, spec, is_leaf=lambda x: x is None,
        )

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

    def sample_indices(
        self, rng: random.Random, host: int | None = None, n_hosts: int | None = None
    ) -> list[int]:
        """One window of accum_steps x batch_rows indices, disjoint per host.

        Every host draws the SAME pseudo-random stream (same seed) over
        ``n // n_hosts`` strided slots, then lands in its own congruence
        class — no coordination, no overlap (the reference's
        DistributedSampler equivalent).
        """
        host = jax.process_index() if host is None else host
        n_hosts = jax.process_count() if n_hosts is None else n_hosts
        n = len(self.dataset)
        count = self.run.accum_steps * self.batch_rows
        if n_hosts <= 1 or n < n_hosts:
            return [rng.randrange(n) for _ in range(count)]
        return [rng.randrange(n // n_hosts) * n_hosts + host for _ in range(count)]

    def _fetch(self, indices: list[int]):
        if self.run.loader_workers > 1:
            # per-sample fan-out: the native decoder releases the GIL
            # inside FFmpeg, so threads scale with host cores (the
            # reference's dataloader_num_workers=16, scripts/pt_local.sh)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=self.run.loader_workers) as p:
                return list(p.map(self.dataset.__getitem__, indices))
        return [self.dataset[i] for i in indices]

    def _load_batch(self, rng: random.Random):
        samples = self._fetch(self.sample_indices(rng))
        if self.run.pack_seq is None:
            return self._place_batch(collate(samples, self.cfg, rows=self.batch_rows))
        from livecc_tpu.train.data import collate_packed_rows, pack_samples

        # Packed path: each row holds several samples, so one window needs
        # MORE samples than rows — keep fetching until full (bounded), and
        # carry unpacked leftovers to the next step.
        target = self.run.accum_steps * self.batch_rows
        self._pack_buf.extend(samples)
        for _ in range(8):
            packed, left = pack_samples(self._pack_buf, self.run.pack_seq,
                                        max_rows=target)
            if len(packed) >= target:
                break
            self._pack_buf.extend(self._fetch(self.sample_indices(rng)))
        else:
            packed, left = pack_samples(self._pack_buf, self.run.pack_seq,
                                        max_rows=target)
        if not packed:
            # every fetched sample was dropped (longer than pack_seq) or
            # nothing packed: training would silently run on all-pad rows
            raise RuntimeError(
                f"pack_seq={self.run.pack_seq} produced no packed rows from "
                f"{len(self._pack_buf)} fetched samples — the corpus's "
                "samples are longer than pack_seq; raise it")
        self._pack_buf = left
        return self._place_batch(collate_packed_rows(
            packed, self.cfg, rows=self.batch_rows, accum=self.run.accum_steps))

    def train(self) -> dict:
        """Run to total_steps with one-batch lookahead prefetch.

        The reference hides data latency behind 16 DataLoader worker
        processes (lmm_dataset.py __main__, num_workers=16); here a
        background thread decodes/collates batch N+1 (with
        ``loader_workers`` per-sample decode threads — video decode
        releases the GIL in the native library) while the device runs
        step N.
        """
        from concurrent.futures import ThreadPoolExecutor

        rng = random.Random(self.run.seed + self.step)
        t0 = time.time()
        last = {}
        with ThreadPoolExecutor(max_workers=1) as pool:
            future = pool.submit(self._load_batch, rng)
            while self.step < self.run.total_steps:
                batch = future.result()
                if self.step + 1 < self.run.total_steps:
                    future = pool.submit(self._load_batch, rng)
                self.params, self.opt_state, metrics = self.step_fn(self.params, self.opt_state, batch)
                self.step += 1
                if self.step % self.run.log_steps == 0 or self.step == self.run.total_steps:
                    last = {
                        "step": self.step,
                        "loss": float(metrics["loss"]),
                        "tokens": int(metrics["tokens"]),
                        "elapsed_s": round(time.time() - t0, 2),
                    }
                    # supervised positions truncated by an undersized
                    # ce_sup_bucket: never silent — it biases the loss
                    dropped = int(metrics.get("ce_dropped", 0))
                    if dropped:
                        last["ce_dropped"] = dropped
                        warnings.warn(
                            f"ce_sup_bucket dropped {dropped} supervised tokens "
                            "this step; raise TrainConfig.ce_sup_bucket"
                        )
                    self._log(last)
                if self.step % self.run.save_steps == 0 or self.step == self.run.total_steps:
                    self.save()
        return last
