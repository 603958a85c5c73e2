from .dataset import (
    ChalearnVideoDataset,
    train_batches,
    eval_batches,
    NUM_MODALITY_CHANNELS,
)
from .fixture import generate_fixture

__all__ = [
    "ChalearnVideoDataset",
    "train_batches",
    "eval_batches",
    "NUM_MODALITY_CHANNELS",
    "generate_fixture",
]
