from .node import CfgNode
from .defaults import get_cfg, get_override_cfg, load_model_cfg
from . import crop_cfg

__all__ = ["CfgNode", "get_cfg", "get_override_cfg", "load_model_cfg", "crop_cfg"]
