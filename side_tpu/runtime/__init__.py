from .trainer import Trainer, TrainState  # noqa: F401
