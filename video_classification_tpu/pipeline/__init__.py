from .iuv_contract import IUVDetection, IUVProvider, SyntheticIUVProvider
from .online import (
    DensePoseOnlineDetector,
    OnlineVideoDataset,
    SyntheticOnlineDetector,
    make_online_detector,
)
from .stages import (
    sample_data,
    video_to_images,
    video_to_flow,
    filter_img_by_flow,
    image_to_padded,
    padded_to_iuv,
    padded_to_cse,
    iuv_to_crop,
    run_full_pipeline,
)

__all__ = [
    "IUVDetection",
    "IUVProvider",
    "SyntheticIUVProvider",
    "DensePoseOnlineDetector",
    "OnlineVideoDataset",
    "SyntheticOnlineDetector",
    "make_online_detector",
    "sample_data",
    "video_to_images",
    "video_to_flow",
    "filter_img_by_flow",
    "image_to_padded",
    "padded_to_iuv",
    "padded_to_cse",
    "iuv_to_crop",
    "run_full_pipeline",
]
