from .model_manager import ModelManager
from .trainer import Trainer, TrainState, train_unimportant_parts
from .checkpoint import save_checkpoint, load_checkpoint, ckpt_dir
from .sparse import ResultSaver, SparseFusionDataset, SparseTrainer, PART_YAMLS
from .predictor import Predictor, EnsemblePredictor
from .parallel_streams import train_streams_parallel, assign_device_groups

__all__ = [
    "ModelManager",
    "Trainer",
    "TrainState",
    "train_unimportant_parts",
    "save_checkpoint",
    "load_checkpoint",
    "ckpt_dir",
    "ResultSaver",
    "SparseFusionDataset",
    "SparseTrainer",
    "PART_YAMLS",
    "Predictor",
    "EnsemblePredictor",
    "train_streams_parallel",
    "assign_device_groups",
]
