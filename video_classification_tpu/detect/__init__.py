from .ops import roi_align, multilevel_roi_align, nms, box_iou, apply_deltas, clip_boxes
from .densepose import (
    ASPP,
    BoxHead,
    ChartPredictor,
    Decoder,
    DensePoseDeepLabHead,
    DensePoseRCNN,
    ResNetFPN,
    RPNHead,
)
from .d2_convert import (
    coverage_report,
    d2_key_shapes,
    d2_to_flax,
    load_d2_pkl,
    load_densepose_variables,
    synthesize_state_dict,
)
from .provider import DensePoseIUVProvider

__all__ = [
    "roi_align",
    "multilevel_roi_align",
    "nms",
    "box_iou",
    "apply_deltas",
    "clip_boxes",
    "ASPP",
    "BoxHead",
    "ChartPredictor",
    "Decoder",
    "DensePoseDeepLabHead",
    "DensePoseRCNN",
    "ResNetFPN",
    "RPNHead",
    "DensePoseIUVProvider",
    "coverage_report",
    "d2_key_shapes",
    "d2_to_flax",
    "load_d2_pkl",
    "load_densepose_variables",
    "synthesize_state_dict",
]
