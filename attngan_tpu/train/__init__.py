from attngan_tpu.train.checkpoint import (
    latest_checkpoint,
    load_converted,
    restore_checkpoint,
    save_checkpoint,
)
from attngan_tpu.train.damsm_trainer import DamsmState, DamsmTrainer
from attngan_tpu.train.gan_trainer import GanState, GanTrainer

__all__ = [
    "DamsmState", "DamsmTrainer", "GanState", "GanTrainer",
    "latest_checkpoint", "load_converted", "restore_checkpoint",
    "save_checkpoint",
]
