"""Curriculum fine-tuning: source → target label-granularity transfer.

Mirrors the reference's coarse_grain_benefits/curriculum_finetuning.py:
load a cfg{source} checkpoint, replace the classifier head with a
fresh He-initialized target-granularity head, freeze layers per the
transfer mode (full / late_layers / fc_only / head_only), fine-tune on
ImageNet with the target labels (PCA CSV when target ≠ 1000), evaluate
every eval_freq epochs, and write checkpoints named
``cfg{source}_to_{target}_{mode}_{seed_letter}`` plus a metrics CSV.

TPU redesign: the loop is the framework's donated jitted train step
over the auto device mesh (train/trainer.py) — no GradScaler/AMP
choreography; the frozen layers are an optax mask (train/optim.py),
and the LR schedule is the framework's warmup+cosine (per-step rather
than the reference's per-epoch LambdaLR — same envelope).

Usage:
  python experiments/coarse_grain_benefits/curriculum_finetuning.py \
      --source-cfg-id 64 --target-cfg-id 1000 --transfer-mode late_layers \
      --checkpoint-dir /data/ckpts/alexnet_pca --seed 1
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

import jax

from visreps_tpu.core.config import Config, get_seed_letter
from visreps_tpu.core.logging import rprint
from visreps_tpu.models.zoo import ModelState, init_model
from visreps_tpu.train import checkpoint as ckpt
from visreps_tpu.train.optim import setup_optimizer
from visreps_tpu.train.trainer import calculate_cls_accuracy, make_eval_step, make_train_step

# Reference: curriculum_finetuning.py:79-100 — trainable-layer strings.
TRANSFER_MODES = {
    "full": {"conv": "11111", "fc": "111",
             "description": "Train all layers (standard fine-tuning)"},
    "late_layers": {"conv": "00001", "fc": "111",
                    "description": "Freeze conv1-4, train conv5 + fc"},
    "fc_only": {"conv": "00000", "fc": "111",
                "description": "Freeze all conv, train only fc layers"},
    "head_only": {"conv": "00000", "fc": "001",
                  "description": "Freeze everything except the head"},
}


def replace_classifier_head(state: ModelState, target_classes: int,
                            transfer_mode: str, seed: int) -> ModelState:
    """New module with a fresh fc3 head + transfer-mode trainability.

    Reference: curriculum_finetuning.py:129-160 (head swap + He init);
    here the head re-initializes through the module's own head_init by
    rebuilding the flax module and grafting every non-head param over.
    """
    mode = TRANSFER_MODES[transfer_mode]
    module = type(state.module)(
        num_classes=target_classes,
        conv_trainable=mode["conv"],
        fc_trainable=mode["fc"],
    )
    fresh = init_model(type(state.module).__name__, target_classes, seed=seed,
                       input_size=state.input_size)
    params = dict(fresh.params)
    for name, sub in state.params.items():
        if name != "fc3":
            params[name] = sub
    batch_stats = state.batch_stats
    return ModelState(module=module, params=params, batch_stats=batch_stats,
                      input_size=state.input_size)


def run_curriculum_finetuning(args) -> list[dict]:
    from visreps_tpu.data.obj_cls import get_obj_cls_loader
    from visreps_tpu.parallel.auto import default_mesh

    seed_letter = get_seed_letter(args.seed)
    exp_name = f"cfg{args.source_cfg_id}_to_{args.target_cfg_id}_{args.transfer_mode}_{seed_letter}"
    exp_dir = os.path.join(args.output_dir, exp_name)
    os.makedirs(exp_dir, exist_ok=True)
    rprint(f"Curriculum: {args.source_cfg_id}-way -> {args.target_cfg_id}-way "
           f"({args.transfer_mode}, seed {args.seed}) -> {exp_dir}", style="info")

    # Load source, swap head, set trainability.
    src_cfg = Config({
        "load_model_from": "checkpoint", "seed": args.seed,
        "cfg_id": args.source_cfg_id, "checkpoint_dir": args.checkpoint_dir,
        "checkpoint_model": args.checkpoint_model,
    })
    from visreps_tpu.models.zoo import load_model

    state = load_model(src_cfg)
    state = replace_classifier_head(state, args.target_cfg_id,
                                    args.transfer_mode, args.seed)

    # Data with target-granularity labels.
    data_cfg = Config({
        "dataset": "imagenet", "batchsize": args.batch_size,
        "num_workers": args.num_workers,
        "pca_labels": args.target_cfg_id != 1000,
        "pca_n_classes": args.target_cfg_id,
        "pca_labels_folder": args.pca_labels_folder,
        "data_augment": True, "seed": args.seed,
    })
    datasets, loaders = get_obj_cls_loader(data_cfg)

    train_cfg = Config({
        "optimizer": "adamw", "learning_rate": args.learning_rate,
        "weight_decay": args.weight_decay, "grad_clip": 1.0,
        "lr_scheduler": "cosineannealinglr", "num_epochs": args.num_epochs,
        "warmup_epochs": args.warmup_epochs,
    })
    steps_per_epoch = max(1, len(loaders["train"]))
    mask = state.module.trainable_mask()
    tx, _ = setup_optimizer(state.params, train_cfg, steps_per_epoch, mask)
    opt_state = tx.init(state.params)
    train_step = make_train_step(state.module, tx)
    eval_step = make_eval_step(state.module)
    mesh = default_mesh()
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("data"))

    config = {
        "source_cfg_id": args.source_cfg_id, "target_cfg_id": args.target_cfg_id,
        "seed": args.seed, "num_epochs": args.num_epochs,
        "learning_rate": args.learning_rate, "weight_decay": args.weight_decay,
        "batch_size": args.batch_size, "warmup_epochs": args.warmup_epochs,
        "transfer_mode": args.transfer_mode,
        "transfer_mode_config": TRANSFER_MODES[args.transfer_mode],
        "total_params": int(state.num_params()),
    }
    with open(os.path.join(exp_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)

    def put(x):
        import jax.numpy as jnp

        arr = jnp.asarray(np.asarray(x))
        return jax.device_put(arr, sharding) if sharding is not None else arr

    results = []

    def evaluate_now(epoch, train_loss, lr):
        top1, top5 = calculate_cls_accuracy(loaders["test"], state, eval_step)
        rprint(f"  epoch {epoch}: top1 {top1:.2f}% top5 {top5}", style="highlight")
        results.append({
            "source_cfg_id": args.source_cfg_id, "target_cfg_id": args.target_cfg_id,
            "seed": args.seed, "transfer_mode": args.transfer_mode,
            "epoch": epoch, "train_loss": train_loss,
            "val_top1": top1, "val_top5": top5, "learning_rate": lr,
        })
        return top1

    evaluate_now(0, None, args.learning_rate)
    ckpt.save_checkpoint(exp_dir, 0, state, {"val_top1": results[-1]["val_top1"]}, config)

    rng = jax.random.PRNGKey(args.seed)
    start = time.time()
    for epoch in range(1, args.num_epochs + 1):
        total = n = 0
        for images, labels in loaders["train"]:
            rng, dk = jax.random.split(rng)
            params, stats, opt_state, loss, _ = train_step(
                state.params, state.batch_stats, opt_state, put(images), put(labels), dk
            )
            state.params, state.batch_stats = params, stats
            total += float(loss)
            n += 1
        train_loss = total / max(n, 1)
        rprint(f"Epoch {epoch}/{args.num_epochs}: loss {train_loss:.4f} "
               f"({time.time()-start:.0f}s elapsed)", style="info")
        if epoch % args.eval_freq == 0 or epoch == args.num_epochs:
            evaluate_now(epoch, train_loss, args.learning_rate)
        ckpt.save_checkpoint(exp_dir, epoch, state,
                             {"train_loss": train_loss}, config)

    csv_path = os.path.join(exp_dir, "metrics.csv")
    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(results[0].keys()))
        writer.writeheader()
        writer.writerows(results)
    rprint(f"Metrics -> {csv_path}", style="success")
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--source-cfg-id", type=int, default=64)
    parser.add_argument("--target-cfg-id", type=int, default=1000)
    parser.add_argument("--checkpoint-dir", required=True,
                        help="dir holding cfg{source}{seed_letter}/")
    parser.add_argument("--checkpoint-model", default="checkpoint_epoch_20.pth")
    parser.add_argument("--pca-labels-folder", default="pca_labels_alexnet")
    parser.add_argument("--seed", type=int, default=1, choices=[1, 2, 3])
    parser.add_argument("--num-epochs", type=int, default=10)
    parser.add_argument("--learning-rate", type=float, default=0.002)
    parser.add_argument("--weight-decay", type=float, default=0.0001)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--num-workers", type=int, default=8)
    parser.add_argument("--warmup-epochs", type=int, default=1)
    parser.add_argument("--transfer-mode", default="full", choices=list(TRANSFER_MODES))
    parser.add_argument("--eval-freq", type=int, default=2)
    parser.add_argument("--output-dir",
                        default="experiments/coarse_grain_benefits/results/curriculum_checkpoints")
    args = parser.parse_args(argv)
    return run_curriculum_finetuning(args)


if __name__ == "__main__":
    main()
