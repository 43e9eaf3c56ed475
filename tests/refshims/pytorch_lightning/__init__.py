"""No-op pytorch_lightning stub: just enough surface for the reference
modules to IMPORT (class definitions inherit these); parity tests never run
Lightning training."""

import torch
from torch import nn

from . import callbacks  # noqa: F401
from . import loggers  # noqa: F401
from . import utilities  # noqa: F401


def seed_everything(seed, workers=False):
    import random

    import numpy as np
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)
    return seed


class LightningModule(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()

    def log(self, *a, **k):
        pass

    def save_hyperparameters(self, *a, **k):
        pass


class LightningDataModule:
    def __init__(self, *a, **k):
        pass


class Callback:
    pass


class _TrainerShim:
    def __init__(self, *a, **k):
        pass

    @staticmethod
    def add_argparse_args(parser, **k):
        return parser

    @classmethod
    def from_argparse_args(cls, args, **k):
        return cls()

    def fit(self, *a, **k):
        raise NotImplementedError("pl shim cannot train")

    def validate(self, *a, **k):
        raise NotImplementedError("pl shim cannot validate")


Trainer = _TrainerShim


class trainer:  # pl.trainer.trainer.Trainer attribute path
    class trainer:
        Trainer = _TrainerShim
