"""Training loop: donated jit train step over a data-parallel mesh.

Reference parity: visreps/trainer.py — seeded setup, CE with label
smoothing 0.1, optional grad clip (grad norm reported either way),
per-log_interval top-1/top-5 eval on BOTH splits, per-
checkpoint_interval saves (epoch 0 always saved), ETA print after the
first epoch.

TPU redesign:
  * The train step is one jitted function with donated (state, opt)
    arguments; BatchNorm batch stats are mutable collections threaded
    through the step (no .train()/.eval() mode flags).
  * Data parallelism: batches are sharded over a jax.sharding.Mesh
    ('data' axis); with GSPMD, BatchNorm's batch-mean reductions become
    cross-replica collectives automatically — no DDP/NCCL analog needed.
  * Eval accuracy runs the forward in bfloat16 (the reference autocasts
    eval only, visreps/utils.py:96-104).
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visreps_tpu.core.logging import MetricsLogger, is_interactive_environment, rprint
from visreps_tpu.models.zoo import ModelState, load_model
from visreps_tpu.train import checkpoint as ckpt
from visreps_tpu.train.optim import cross_entropy_loss, lr_at_epoch, setup_optimizer


def make_train_step(module, tx, label_smoothing: float = 0.1,
                    compute_dtype: str | None = None):
    """Build the jitted (params, batch_stats, opt_state, batch) → updated step.

    compute_dtype="bf16" runs the forward/backward matmuls and convs in
    bfloat16 (cast at the loss_fn boundary — the f32 MASTER params, the
    optimizer state, the loss and the BatchNorm running stats all stay
    float32; gradients come back f32 through the cast's transpose).
    ~3× MXU throughput on TPU for conv-bound models; the reference
    trains fp32 (its use_amp flag is never read, SURVEY §2.6), so the
    default stays f32 for parity and bf16 is the measured opt-in
    (bench stage_train compute_dtype=bf16 A/Bs it).
    """
    bf16 = compute_dtype == "bf16"

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, images, labels, dropout_key):
        def loss_fn(p):
            if bf16:
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, p)
                x = images.astype(jnp.bfloat16)
            else:
                x = images
            variables = {"params": p}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            (logits, _), updates = module.apply(
                variables, x, train=True, capture=(),
                rngs={"dropout": dropout_key},
                mutable=["batch_stats"] if batch_stats is not None else [],
            )
            loss = cross_entropy_loss(logits.astype(jnp.float32), labels,
                                      label_smoothing)
            new_stats = updates.get("batch_stats") if batch_stats is not None else None
            if bf16 and new_stats is not None:
                # Running stats stay f32 across steps (donated buffers
                # must keep their dtype; bf16 EMAs also drift).
                new_stats = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.float32), new_stats)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grad_norm = optax_global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, new_stats, opt_state, loss, grad_norm

    return train_step


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))


def make_eval_step(module):
    @jax.jit
    def eval_step(variables, images, labels):
        # bf16 eval forward (reference autocast, utils.py:96-104)
        logits, _ = module.apply(variables, images.astype(jnp.bfloat16), train=False, capture=())
        logits = logits.astype(jnp.float32)
        top1 = (jnp.argmax(logits, axis=-1) == labels).sum()
        k = min(5, logits.shape[-1])
        topk = jax.lax.top_k(logits, k)[1]
        top5 = (topk == labels[:, None]).any(axis=-1).sum()
        return top1, top5

    return eval_step


def calculate_cls_accuracy(loader, state: ModelState, eval_step=None):
    """Top-1/top-5 percentages; top-5 suppressed when < 5 classes.

    Reference: visreps/utils.py:76-139.
    """
    if eval_step is None:
        eval_step = make_eval_step(state.module)
    total = top1 = top5 = 0
    n_classes = None
    for images, labels in loader:
        images = jnp.asarray(np.asarray(images))
        labels = jnp.asarray(np.asarray(labels))
        t1, t5 = eval_step(state.variables, images, labels)
        total += labels.shape[0]
        top1 += int(t1)
        top5 += int(t5)
        if n_classes is None:
            n_classes = state.module.num_classes
    if total == 0:
        return 0.0, 0.0
    top1_acc = 100.0 * top1 / total
    if n_classes is not None and n_classes < 5:
        return top1_acc, ""
    return top1_acc, 100.0 * top5 / total


class Trainer:
    """Object-classification trainer. Reference: visreps/trainer.py:12-126."""

    def __init__(self, cfg, mesh: Mesh | None = None):
        self.cfg = cfg
        self.mesh = mesh
        self._setup()

    def _setup(self):
        from visreps_tpu.data.obj_cls import get_obj_cls_loader

        cfg = self.cfg
        self.rng = jax.random.PRNGKey(cfg.seed)

        # Device-side augmentation: host loaders stay augment-free and a
        # jitted flip+rotate runs on the batch (data/augment.py).
        self.device_augment = bool(cfg.get("device_augment", False))
        if self.device_augment:
            cfg = cfg.merge({"data_augment": False})

        self.datasets, self.loaders = get_obj_cls_loader(cfg)
        num_classes = (
            cfg.pca_n_classes if cfg.get("pca_labels") else self.datasets["train"].num_classes
        )
        self.state = load_model(cfg, num_classes=num_classes)

        steps_per_epoch = max(1, len(self.loaders["train"]))
        self.steps_per_epoch = steps_per_epoch
        mask = (
            self.state.module.trainable_mask()
            if hasattr(self.state.module, "trainable_mask")
            else None
        )
        self.tx, self.schedule = setup_optimizer(self.state.params, cfg, steps_per_epoch, mask)
        self.opt_state = self.tx.init(self.state.params)
        # train_compute_dtype="bf16" opts into bfloat16 matmul compute
        # (f32 master params/opt/BN stats); default f32 — the reference
        # trains fp32 (its use_amp flag is never read, SURVEY §2.6).
        self.train_step = make_train_step(
            self.state.module, self.tx,
            compute_dtype=cfg.get("train_compute_dtype"))
        self.eval_step = make_eval_step(self.state.module)
        self.global_step = 0

        self.checkpoint_dir = None
        self.cfg_dict = None
        self.start_epoch = 1
        if cfg.get("log_checkpoints"):
            self.checkpoint_dir, self.cfg_dict = ckpt.setup_checkpoint_dir(cfg, self.state)
            resume_epoch = cfg.get("resume_from_epoch", 0)
            if resume_epoch:
                self._resume(resume_epoch)
            else:
                ckpt.save_checkpoint(self.checkpoint_dir, 0, self.state, {}, self.cfg_dict)

        self.metrics_logger = MetricsLogger(cfg, self.checkpoint_dir)

        self._data_sharding = None
        if self.mesh is not None:
            self._data_sharding = NamedSharding(self.mesh, P("data"))
            replicated = NamedSharding(self.mesh, P())
            self.state.params = jax.device_put(self.state.params, replicated)
            if self.state.batch_stats is not None:
                self.state.batch_stats = jax.device_put(self.state.batch_stats, replicated)
            self.opt_state = jax.device_put(self.opt_state, replicated)

    def _resume(self, epoch: int):
        """Mid-training resume (improvement over the reference, which
        has no resume path — SURVEY.md §5.4)."""
        import os

        path = os.path.join(self.checkpoint_dir, f"checkpoint_epoch_{epoch}.pth")
        state, payload = ckpt.load_checkpoint(path)
        self.state = state
        opt = ckpt.load_resume_state(self.checkpoint_dir, epoch)
        if opt is not None:
            self.opt_state = jax.tree_util.tree_map(jnp.asarray, opt)
        self.global_step = epoch * self.steps_per_epoch
        self.start_epoch = epoch + 1
        rprint(f"Resumed from epoch {epoch} ({path})", style="success")

    def _put(self, x):
        if self._data_sharding is not None:
            # multi-host safe: under >1 process, x is this host's shard
            # of the global batch (parallel/feed.py)
            from visreps_tpu.parallel.feed import put_global_batch

            return put_global_batch(x, self.mesh)
        if not isinstance(x, jax.Array):
            x = jnp.asarray(np.asarray(x))
        return x

    def evaluate(self, split: str = "test"):
        # tiny-imagenet loaders are keyed "val" (reference obj_cls.py:293)
        if split not in self.loaders and split == "test" and "val" in self.loaders:
            split = "val"
        return calculate_cls_accuracy(self.loaders[split], self.state, self.eval_step)

    def train_epoch(self, epoch: int):
        total_loss = 0.0
        total_grad_norm = 0.0
        n = 0
        lr = lr_at_epoch(self.cfg, epoch - 1)
        for images, labels in self.loaders["train"]:
            self.rng, dk = jax.random.split(self.rng)
            if self.device_augment:
                from visreps_tpu.data.augment import augment_batch

                self.rng, ak = jax.random.split(self.rng)
                images = augment_batch(ak, self._put(images))
            params, stats, opt, loss, gn = self.train_step(
                self.state.params, self.state.batch_stats, self.opt_state,
                self._put(images), self._put(labels), dk,
            )
            self.state.params = params
            self.state.batch_stats = stats
            self.opt_state = opt
            self.global_step += 1
            n += 1
            total_loss += float(loss)
            total_grad_norm += float(gn)
        avg = total_loss / max(n, 1)
        return avg, {"epoch_loss": avg, "learning_rate": lr,
                     "grad_norm": total_grad_norm / max(n, 1)}

    def train(self):
        start = time.time()
        cfg = self.cfg
        for epoch in range(self.start_epoch, cfg.num_epochs + 1):
            epoch_loss, epoch_metrics = self.train_epoch(epoch)
            metrics = {"epoch": epoch, "epoch_metrics": epoch_metrics}

            if epoch == 1 and is_interactive_environment():
                eta = (time.time() - start) * (cfg.num_epochs - 1)
                h, m = int(eta // 3600), int((eta % 3600) // 60)
                rprint(f"Estimated time remaining: {f'{h}h {m}m' if h else f'{m}m'}")

            if epoch % cfg.get("log_interval", 1) == 0:
                for split in ["test", "train"]:
                    top1, top5 = self.evaluate(split)
                    metrics[f"{split}_acc"] = top1
                    metrics[f"{split}_top5"] = top5
                self.metrics_logger.log_metrics(epoch, epoch_loss, metrics)

            if self.checkpoint_dir and epoch % cfg.get("checkpoint_interval", 5) == 0:
                ckpt.save_checkpoint(
                    self.checkpoint_dir, epoch, self.state, metrics, self.cfg_dict,
                    opt_state=self.opt_state if cfg.get("save_resume_state") else None,
                )

        self.metrics_logger.finish()
        return self.state
