"""Registry entry for the baseline trainer (pure inheritance, mirroring
/root/reference/trainers/baseline_trainer.py:6-10)."""

from . import register_trainer
from .base_trainer import BaseTrainer


@register_trainer("baseline")
class BaselineTrainer(BaseTrainer):
    name_str = "baseline"
