from .slowfast import SlowFast, init_my_slowfast
from .resnet2d import ResNet50_2D, init_res2d
from .res3d import Res3D, init_res3d
from .sparse_fusion import SparseModel
from .raft import RAFT
from .torch_convert import (
    torch_to_flax,
    flax_to_torch,
    delete_mismatch,
    MISMATCH_LAYERS,
)

__all__ = [
    "SlowFast",
    "init_my_slowfast",
    "ResNet50_2D",
    "init_res2d",
    "Res3D",
    "init_res3d",
    "SparseModel",
    "RAFT",
    "torch_to_flax",
    "flax_to_torch",
    "delete_mismatch",
    "MISMATCH_LAYERS",
]
