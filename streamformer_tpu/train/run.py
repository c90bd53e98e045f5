"""Training entry point (reference run_finetuning_multi_task.py:39-584).

Usage:
    python -m streamformer_tpu.train.run --metadata path/to/all.yaml \
        --output_dir out --batch_size 16 --epochs 20 --lr 2e-5 ...

Flow: config -> datasets (YAML) -> model (+ optional HF checkpoint) ->
prepare_for_multi_tasks -> freeze/LoRA policy -> optimizer + cosine
schedules -> epoch loop with per-epoch checkpointing and auto-resume.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np


def get_args():
    p = argparse.ArgumentParser("StreamFormer-TPU multitask training")
    # core (reference get_args, run_finetuning_multi_task.py:39-215)
    p.add_argument("--metadata", required=True, help="dataset metadata YAML")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--model_path", default=None, help="HF checkpoint dir")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--update_freq", type=int, default=1)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--min_lr", type=float, default=1e-6)
    p.add_argument("--warmup_epochs", type=float, default=1)
    p.add_argument("--warmup_steps", type=int, default=-1)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--weight_decay_end", type=float, default=None)
    p.add_argument("--layer_decay", type=float, default=None)
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--opt", default="adamw")
    p.add_argument("--opt_betas", type=float, nargs=2, default=(0.9, 0.999))
    p.add_argument("--opt_eps", type=float, default=1e-8)
    p.add_argument("--num_sample", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--save_ckpt_freq", type=int, default=10)
    p.add_argument("--eval_freq", type=int, default=0,
                   help="run validation every N epochs (0 = off)")
    # model policy flags
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_layers", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    p.add_argument("--text_layers", type=int, default=12)
    p.add_argument("--enable_causal_temporal", action="store_true", default=True)
    p.add_argument("--add_lora_spatial", action="store_true")
    p.add_argument("--frozen_spatial", action="store_true")
    p.add_argument("--frozen_backbone", action="store_true")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--balance_datasets", action="store_true")
    p.add_argument("--remat", default="none", choices=["none", "layer"])
    # parallelism (reference: torchrun DDP/DeepSpeed wrap point,
    # run_finetuning_multi_task.py:398-433 -> jax.sharding mesh)
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh axis; 0 = all devices / mp")
    p.add_argument("--mp", type=int, default=1,
                   help="model (tensor) parallel mesh axis")
    p.add_argument("--shard_patches", action="store_true",
                   help="sequence-parallel: shard the patch axis over mp")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() from env")
    # manual coordinator bootstrap (the torchrun MASTER_ADDR/RANK/WORLD_SIZE
    # analog, reference utils.py:372-447): when the cluster env can't be
    # auto-detected, pass all three explicitly on every process
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (with --distributed)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler TensorBoard trace of this "
                        "many steady-state steps of the first epoch "
                        "(reference: DeepSpeed flops_profiler, "
                        "utils.py:1028-1034)")
    return p.parse_args()


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp
    import optax

    from streamformer_tpu.config import StreamformerConfig
    from streamformer_tpu.checkpoint import hf_import
    from streamformer_tpu.data.build import build_multi_task_dataset
    from streamformer_tpu.data.collate import MultitaskLoader
    from streamformer_tpu.data.samplers import DistributedBatchTaskUniqueSampler
    from streamformer_tpu.models.multitask import MultitaskModel
    from streamformer_tpu.train import checkpoint as ckpt_lib
    from streamformer_tpu.train import metrics as metrics_lib
    from streamformer_tpu.train import optim
    from streamformer_tpu.train.trainer import MultitaskTrainer, TrainState

    if args.distributed:
        # multi-host single-controller bootstrap (reference
        # init_distributed_mode, utils.py:372-447 -> NCCL; here coordinator
        # discovery comes from the standard JAX env vars / TPU metadata)
        if args.coordinator_address:
            jax.distributed.initialize(
                coordinator_address=args.coordinator_address,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        else:
            jax.distributed.initialize()

    # device mesh (L0): data axis = DP/ZeRO + the contrastive ring,
    # model axis = Megatron TP / patch (sequence) sharding
    mesh = None
    n_dev = len(jax.devices())
    dp = args.dp if args.dp > 0 else max(n_dev // args.mp, 1)
    if dp * args.mp > 1:
        from streamformer_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=dp, model=args.mp)
        print(f"mesh: data={dp} model={args.mp} over {n_dev} devices, "
              f"{jax.process_count()} process(es)")

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    train_ds, eval_ds, mtc = build_multi_task_dataset(
        args.metadata, balance=args.balance_datasets
    )
    print(f"train samples: {len(train_ds)} tasks: {list(mtc)}")

    cfg = StreamformerConfig(
        num_frames=args.num_frames,
        image_size=args.input_size,
        hidden_size=args.hidden_size,
        num_hidden_layers=args.num_layers,
        num_attention_heads=args.num_heads,
        intermediate_size=args.intermediate_size,
        enable_causal_temporal=args.enable_causal_temporal,
        add_lora_spatial=args.add_lora_spatial,
        dtype="bfloat16" if args.bf16 else "float32",
        remat=args.remat,
        shard_patches=args.shard_patches and args.mp > 1,
    )
    from streamformer_tpu.models.text_encoder import SiglipTextConfig

    text_cfg = SiglipTextConfig(
        hidden_size=args.hidden_size,
        num_hidden_layers=args.text_layers,
        num_attention_heads=args.num_heads,
        intermediate_size=args.intermediate_size,
    )
    model = MultitaskModel(
        cfg, mtc, text_cfg=text_cfg, rng=jax.random.PRNGKey(args.seed)
    )
    if args.model_path:
        cfg_loaded, backbone = hf_import.from_pretrained(args.model_path, cfg)
        model.params["backbone"] = backbone
        print(f"loaded backbone from {args.model_path}")
    model.prepare_for_multi_tasks()
    if mesh is not None:
        # TP/replicated placement for params (ZeRO analog: the optimizer
        # state initialized from these inherits the same shardings)
        from streamformer_tpu.parallel import sharding as sh

        model.params = sh.shard_params(model.params, mesh)

    # lr scaling rule (run_finetuning_multi_task.py:386-388): total batch
    # includes the data-parallel world size, like the reference's
    # batch_size * world_size * update_freq
    total_bs = args.batch_size * args.update_freq * dp
    lr = optim.scale_lr(args.lr, total_bs, args.num_sample)

    # single-controller: this process feeds the GLOBAL batch (batch_size is
    # per data-parallel replica, as in the reference); under multi-host each
    # process loads its disjoint stride of every batch
    local_dp = max(dp // jax.process_count(), 1)
    sampler = DistributedBatchTaskUniqueSampler(
        train_ds.task_specs(),
        batch_size=args.batch_size * local_dp,
        num_replicas=jax.process_count(),
        rank=jax.process_index(),
        seed=args.seed,
    )
    steps_per_epoch = max(len(sampler) // args.update_freq, 1)
    lr_sched = optim.cosine_lr_schedule(
        lr, args.min_lr, args.epochs, steps_per_epoch,
        warmup_epochs=args.warmup_epochs, warmup_steps=args.warmup_steps,
    )
    wd_sched = optim.cosine_wd_schedule(
        args.weight_decay, args.weight_decay_end, args.epochs, steps_per_epoch
    )

    trainable = optim.trainable_mask_frozen_text(model.params)
    if args.add_lora_spatial or args.frozen_spatial:
        bb_mask = optim.trainable_mask_lora_spatial(model.params["backbone"])
        trainable["backbone"] = bb_mask
    if args.frozen_backbone:
        trainable["backbone"] = jax.tree.map(
            lambda _: False, model.params["backbone"]
        )

    tx = optim.create_optimizer(
        model.params,
        lr_sched,
        weight_decay=args.weight_decay,
        wd_schedule=wd_sched if args.weight_decay_end else None,
        betas=tuple(args.opt_betas),
        eps=args.opt_eps,
        clip_grad=args.clip_grad,
        layer_decay=args.layer_decay,
        num_layers=cfg.num_hidden_layers,
        trainable_mask=trainable,
        opt_name=args.opt,
    )
    trainer = MultitaskTrainer(model, tx, update_freq=args.update_freq,
                               mesh=mesh)
    state = TrainState.create(model.params, tx)

    start_epoch = 0
    start_micro = 0
    if args.auto_resume:
        like = {
            "params": state.params,
            "opt_state": state.opt_state,
            "meta": {"epoch": np.asarray(0, np.int64), "step": np.asarray(0, np.int64)},
        }
        restored = ckpt_lib.auto_resume(args.output_dir, like)
        if restored is not None:
            state = TrainState(
                params=restored["params"],
                opt_state=restored["opt_state"],
                grad_accum=jax.tree.map(jnp.zeros_like, restored["params"]),
                accum_count=jnp.zeros((), jnp.int32),
                step=jnp.asarray(restored["meta"]["step"], jnp.int32),
            )
            start_micro = restored["meta"].get("micro", 0)
            if start_micro > 0:
                # mid-epoch (preemption) checkpoint: replay the same epoch
                # from the saved batch offset
                start_epoch = restored["meta"]["epoch"]
                print(f"resumed mid-epoch {start_epoch} at micro-batch "
                      f"{start_micro}")
            else:
                start_epoch = restored["meta"]["epoch"] + 1
                print(f"resumed from epoch {start_epoch - 1}")

    # preemption: on SIGTERM finish the in-flight optimizer update, save a
    # mid-epoch checkpoint, and exit 0 so the scheduler restarts into the
    # auto_resume path above (beyond the reference's epoch-only auto_resume)
    import signal

    stop_requested = {"flag": False}

    def _on_sigterm(signum, frame):
        stop_requested["flag"] = True
        print("SIGTERM: will checkpoint at the next update boundary")

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not the main thread (embedded use): no handler, still trains

    log_writer = metrics_lib.TensorboardLogger(
        args.log_dir or os.path.join(args.output_dir, "tb")
    )
    rng = jax.random.PRNGKey(args.seed)
    for epoch in range(start_epoch, args.epochs):
        loader = MultitaskLoader(
            train_ds, sampler, model, crop_size=args.input_size,
            num_workers=args.num_workers, aug_seed=args.seed + epoch,
        )
        epoch_micro = start_micro if epoch == start_epoch else 0
        loader.set_epoch(epoch, start_step=epoch_micro)
        # fold_in(seed, epoch) rather than a running split: the epoch's rng
        # stream is then a pure function of (seed, epoch), identical whether
        # the process trained from epoch 0 or resumed here (mid-epoch resume
        # replays the stream exactly)
        sub = jax.random.fold_in(rng, epoch)
        t0 = time.time()
        state, stats = trainer.train_one_epoch(
            state, iter(loader), epoch, sub, log_writer=log_writer,
            lr_schedule=lr_sched,
            profile_steps=args.profile_steps if epoch == start_epoch else 0,
            profile_dir=os.path.join(
                args.log_dir or os.path.join(args.output_dir, "tb"), "profile"
            ),
            should_stop=lambda: stop_requested["flag"],
            start_micro=epoch_micro,
        )
        stats["epoch_time"] = time.time() - t0
        loader.close()  # release the decode pool now, not at GC
        if "preempted_at_micro" in stats:
            micro_done = int(stats["preempted_at_micro"])
            ckpt_lib.save_checkpoint(
                args.output_dir, epoch, state.params, state.opt_state,
                step=int(state.step), keep_every=args.save_ckpt_freq,
                micro=micro_done,
            )
            print(f"preempted: saved epoch {epoch} at micro-batch "
                  f"{micro_done}; exiting for restart")
            return
        metrics_lib.write_log_line(
            args.output_dir, {"epoch": epoch, **{k: float(v) for k, v in stats.items()}}
        )
        # async: disk I/O overlaps the next epoch; the preemption save above
        # stays blocking (durability before exit). atexit + auto_resume's
        # latest_checkpoint() barrier make the final save safe.
        ckpt_lib.save_checkpoint(
            args.output_dir, epoch, state.params, state.opt_state,
            step=int(state.step), keep_every=args.save_ckpt_freq,
            block=False,
        )
        if args.eval_freq and eval_ds and (epoch + 1) % args.eval_freq == 0:
            from streamformer_tpu.eval.validate import evaluate_multitask

            ev = evaluate_multitask(
                model, state.params, eval_ds, crop_size=args.input_size
            )
            flat = {
                f"eval_{t}_{k}": float(v)
                for t, m in ev.items()
                for k, v in m.items()
            }
            print(f"epoch {epoch} eval:", flat)
            metrics_lib.write_log_line(args.output_dir,
                                       {"epoch": epoch, **flat})
    ckpt_lib.wait_for_checkpoints()
    print("done")


if __name__ == "__main__":
    main()
