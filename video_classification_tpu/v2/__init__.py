from .video_io import VideoIO
from . import part_compose
from .part_compose import PartCompose
from .convert import (
    ConvertVideoToFlow,
    ConvertVideoToIUVPkl,
    ConvertIuvPklToUvVideo,
    ConvertIuvPklToPartBox,
)
from .dataset import ChalearnGestureDataset, V2_CHANNELS
from .trainer import V2ModelManager, V2Trainer

__all__ = [
    "VideoIO",
    "part_compose",
    "PartCompose",
    "ConvertVideoToFlow",
    "ConvertVideoToIUVPkl",
    "ConvertIuvPklToUvVideo",
    "ConvertIuvPklToPartBox",
    "ChalearnGestureDataset",
    "V2_CHANNELS",
    "V2ModelManager",
    "V2Trainer",
]
