"""Trainer registry — fairseq-style, keyed by --aug
(API per /root/reference/trainers/__init__.py:6-47)."""

from .base_trainer import BaseTrainer

TRAINER_REGISTRY = {}
TRAINER_CLASS_NAMES = set()


def get_trainer_and_parser(args, parser):
    trainer = TRAINER_REGISTRY[args.aug]
    trainer.add_args(parser)
    return trainer


def register_trainer(name):
    def register_trainer_cls(cls):
        if name in TRAINER_REGISTRY:
            raise ValueError(f"Cannot register duplicate trainer ({name})")
        if not issubclass(cls, BaseTrainer):
            raise ValueError(f"Trainer ({name}: {cls.__name__}) must extend BaseTrainer")
        if cls.__name__ in TRAINER_CLASS_NAMES:
            raise ValueError(f"Cannot register trainer with duplicate class name ({cls.__name__})")
        TRAINER_REGISTRY[name] = cls
        TRAINER_CLASS_NAMES.add(cls.__name__)
        return cls

    return register_trainer_cls


from . import baseline_trainer, flag_trainer  # noqa: E402,F401
