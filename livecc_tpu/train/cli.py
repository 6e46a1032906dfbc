"""Training entry point (reference train.py equivalent).

Usage:
  python -m livecc_tpu.train.cli \
      --annotation_paths pt.jsonl sft.jsonl \
      --pretrained /path/to/hf_checkpoint \
      --output_dir out --learning_rate 2e-5 --total_steps 1000 \
      --accum_steps 64 --freeze_modules visual

Loads the model from an HF checkpoint dir (config.json + safetensors +
tokenizer.json), freezes the named modules (default: the visual tower,
reference train.py:17-19), builds the seek-indexed streaming dataset and
runs the sharded trainer with resume-by-default (train.py:29 semantics).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--annotation_paths", nargs="+", required=True)
    parser.add_argument("--pretrained", default=None, help="HF checkpoint dir; omit for tiny random init (smoke)")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--learning_rate", type=float, default=2e-5)
    parser.add_argument("--warmup_ratio", type=float, default=0.03)
    parser.add_argument("--total_steps", type=int, default=1000)
    parser.add_argument("--accum_steps", type=int, default=64)
    parser.add_argument("--save_steps", type=int, default=1000)
    parser.add_argument("--log_steps", type=int, default=10)
    parser.add_argument("--freeze_modules", nargs="*", default=["visual"])
    parser.add_argument("--ce_sup_bucket", type=int, default=None,
                        help="static cap on supervised tokens per micro-batch; "
                             "compacts the 152k-vocab CE to supervised "
                             "positions only (see TrainConfig.ce_sup_bucket)")
    parser.add_argument("--adam_mu_dtype", choices=["fp32", "bf16"], default="fp32",
                        help="Adam first-moment dtype; bf16 halves that buffer "
                             "(fp32 matches DeepSpeed)")
    parser.add_argument("--with_context", action="store_true")
    parser.add_argument("--dataloader_num_workers", type=int, default=4,
                        help="per-sample decode/collate threads in the "
                             "prefetch (reference: --dataloader_num_workers 16)")
    parser.add_argument("--overwrite_output_dir", action="store_true",
                        help="start fresh instead of resuming (train.py:29)")
    parser.add_argument("--seq_shard", action="store_true",
                        help="sequence parallelism under a TP mesh "
                             "(megatron SP as GSPMD constraints)")
    parser.add_argument("--pack_seq", type=int, default=None,
                        help="sequence packing: pack variable-length samples "
                             "into rows of this many tokens (segment-id "
                             "attention); beyond-reference throughput feature")
    parser.add_argument("--mesh", default=None, metavar="DATAxMODEL",
                        help="device mesh, e.g. 4x2 (data-parallel 4, tensor-"
                             "parallel 2); replaces the reference's torchrun "
                             "--nproc_per_node + deepspeed_zero2.json")
    args = parser.parse_args(argv)
    if args.seq_shard:
        model_ax = int(args.mesh.lower().split("x")[1]) if args.mesh else 0
        if model_ax < 2:
            parser.error("--seq_shard requires --mesh DATAxMODEL with "
                         "MODEL >= 2 (sequence parallelism shards "
                         "activations over the model axis)")

    import jax
    import jax.numpy as jnp

    from livecc_tpu.core.config import tiny_config
    from livecc_tpu.data.lmm_dataset import LMMDataset
    from livecc_tpu.data.tokenizer import ByteTokenizer, HFTokenizer
    from livecc_tpu.models.qwen2_vl.convert import config_from_hf_json, load_safetensors_dir
    from livecc_tpu.models.qwen2_vl.model import init_params
    from livecc_tpu.train.step import TrainConfig
    from livecc_tpu.train.trainer import Trainer, TrainerConfig

    if args.pretrained:
        cfg = config_from_hf_json(args.pretrained)
        params = load_safetensors_dir(args.pretrained, cfg, dtype=jnp.bfloat16)
        tokenizer = HFTokenizer(args.pretrained)
    else:
        cfg = tiny_config()
        params = init_params(cfg, jax.random.PRNGKey(0))
        tokenizer = ByteTokenizer()

    dataset = LMMDataset(
        annotation_paths=args.annotation_paths, tokenizer=tokenizer, cfg=cfg,
        with_context=args.with_context,
    )
    tcfg = TrainConfig(
        learning_rate=args.learning_rate,
        warmup_ratio=args.warmup_ratio,
        total_steps=args.total_steps,
        freeze_modules=tuple(args.freeze_modules),
        ce_sup_bucket=args.ce_sup_bucket,
        adam_mu_dtype=jnp.bfloat16 if args.adam_mu_dtype == "bf16" else None,
        seq_shard=args.seq_shard,
    )
    run = TrainerConfig(
        output_dir=args.output_dir,
        total_steps=args.total_steps,
        accum_steps=args.accum_steps,
        save_steps=args.save_steps,
        log_steps=args.log_steps,
        resume=not args.overwrite_output_dir,
        loader_workers=args.dataloader_num_workers,
        pack_seq=args.pack_seq,
    )
    mesh = None
    if args.mesh:
        from livecc_tpu.core.mesh import make_mesh
        n_data, n_model = (int(x) for x in args.mesh.lower().split("x"))
        mesh = make_mesh(n_data=n_data, n_model=n_model)
    trainer = Trainer(params, cfg, tcfg, run, dataset, mesh=mesh)
    last = trainer.train()
    print(last)
    return last


if __name__ == "__main__":
    main()
