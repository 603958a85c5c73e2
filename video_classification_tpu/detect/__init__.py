from .ops import roi_align, nms, box_iou, apply_deltas, clip_boxes
from .densepose import DensePoseRCNN, ResNetFPN, RPNHead, BoxHead, DensePoseHead
from .provider import DensePoseIUVProvider

__all__ = [
    "roi_align",
    "nms",
    "box_iou",
    "apply_deltas",
    "clip_boxes",
    "DensePoseRCNN",
    "ResNetFPN",
    "RPNHead",
    "BoxHead",
    "DensePoseHead",
    "DensePoseIUVProvider",
]
