from visreps_tpu.train.trainer import Trainer
from visreps_tpu.train.checkpoint import save_checkpoint, load_checkpoint, setup_checkpoint_dir

__all__ = ["Trainer", "save_checkpoint", "load_checkpoint", "setup_checkpoint_dir"]
