from .image import (
    cubic_resize,
    pad_to_square_resize,
    pad2x,
    normalize,
    denormalize_to_uint8,
    random_crop,
    random_crop_batch,
    NORM_MEAN,
    NORM_STD,
)
from .sampling import (
    random_clip_indices,
    uniform_clip_indices,
    num_uniform_clips,
    random_clip_indices_device,
    uniform_clip_indices_device,
    UNIFORM_STRIDE,
)
from .segment import (
    segment_ids_from_counts,
    per_video_scores,
    per_video_accuracy,
    softmax_scores,
)
