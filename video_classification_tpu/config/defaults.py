"""Default configuration tree.

Mirrors the reference yacs config surface key-for-key
(`/root/reference/config/defaults.py:4-48`) so that the reference's per-model yaml
files and the machine-local ``cfg_override.yaml`` merge unchanged, and adds a
TPU-native namespace (``TPU.*``) controlling mesh shape, sharding, precision and the
input pipeline — concerns the single-GPU reference did not have.
"""

from pathlib import Path

from .node import CfgNode

_C = CfgNode()

_C.CHALEARN = CfgNode()

_C.DEBUG = False  # Tiny run: 1 train batch, few eval steps, no checkpoint writes.

_C.CHALEARN.ROOT = "/data/ChaLearnIsoAllClass"  # Root of all stage folders.

_C.CHALEARN.NUM_CLASS = 249  # Labels on disk are 1..249 (reference defaults.py:14).
_C.CHALEARN.BATCH_SIZE = 10
_C.CHALEARN.ISO = "0_Iso"  # Raw ChaLearn IsoGD download.
_C.CHALEARN.SAMPLE = "1_Sample"  # Class-filtered subset (stage 1).
_C.CHALEARN.SAMPLE_CLASS = 249  # Keep labels <= this (dataset subsetting knob).
_C.CHALEARN.IMG = "2_Images"  # Extracted frames.
_C.CHALEARN.IMG_SAMPLE_INTERVAL = 5  # Keep 1 frame out of every 5.
_C.CHALEARN.PAD = "3_Pad"  # 2x zero-padded frames.
_C.CHALEARN.IUV = "4_IUV"  # DensePose IUV dumps.
_C.CHALEARN.CSE = "4_CSE"
_C.CHALEARN.CROP_BODY = "CropBody"  # Whole-body crops.
_C.CHALEARN.CLIP_LEN = 20  # Frames per training clip.
_C.CHALEARN.FLOW = "2_Flow"  # Optical flow encoded as 3-channel uint8 images.
_C.CHALEARN.FLOW_NPY = "2_Flow_npy"
_C.CHALEARN.IMG_ENERGY = "2_Images_energy"  # Top-flow-energy frames.

_C.CHALEARN.FLOW_VIDEO = "2_Flow_New"  # v2 pipeline stage folders
_C.CHALEARN.IUV_NEW = "4_IUV_New"      # (reference defaults.py:30-33).
_C.CHALEARN.UV_VIDEO = "5_UV_Video"
_C.CHALEARN.BOX = "6_Box"

_C.DENSEPOSE = "./detectron2/projects/DensePose"  # Kept for surface parity; unused.

_C.MODEL = CfgNode()
_C.MODEL.LOGS = "logs"
_C.MODEL.NAME = "new_feature_test"
_C.MODEL.CKPT_DIR = "checkpoints"
_C.MODEL.R3D_INPUT = "CropHTAH"  # Which crop stream this model consumes.
_C.MODEL.LR = 5e-4
_C.MODEL.FUSE = True  # Lateral fast->slow fusion on/off (my_slowfast.py:86-92).
_C.MODEL.MAX_EPOCH = 100
_C.MODEL.INPUT_SIZE = 192
# ResNet depth of every stream (reference hard-codes 50, my_slowfast.py:98);
# 18 => (1,1,1,1) stages, used by tests/debug for fast compiles.
_C.MODEL.DEPTH = 50
# Lateral-fusion forward variant: 'default' (conv+BN+ReLU+concat,
# my_slowfast.py:334-344), 'C123' (concat->res_unit->+residual, :285-308) or
# 'R' (concat->+residual, :310-332).
_C.MODEL.FUSION_MODE = "default"

_C.NUM_CPU = 18

# ---------------------------------------------------------------------------
# TPU-native additions (no reference equivalent: the reference is single-GPU
# PyTorch with no distributed machinery — SURVEY.md §2.2).
# ---------------------------------------------------------------------------
_C.TPU = CfgNode()
_C.TPU.MESH_SHAPE = [-1]          # Device mesh; -1 = all available devices.
_C.TPU.MESH_AXES = ["data"]       # Axis names; batch is sharded over 'data'.
_C.TPU.COMPUTE_DTYPE = "bfloat16"  # MXU-friendly activations/compute dtype.
_C.TPU.PARAM_DTYPE = "float32"     # Master weights.
# Note: batch-norm is cross-replica by construction — the train step is one
# global-view jit program, so BN moments reduce over the full global batch
# (models/layers.py); there is no per-replica mode to toggle.
_C.TPU.PREFETCH_DEPTH = 1  # Device-side double buffering depth. Each queued batch
                           # holds HBM (~0.5 GB at batch 32/192px); with the
                           # flagship step's ~15 GB working set, 1 is the safe
                           # default on 16 GB chips.
_C.TPU.DONATE_STATE = True         # Donate train state buffers to the step fn.
_C.TPU.REMAT = False               # jax.checkpoint the stages (memory/compute trade).
_C.TPU.PACK_FAST = True            # Small-channel fast-pathway stages run in the
                                   # 2x2 space-to-depth domain (4x lane occupancy;
                                   # same math up to float reassociation).
_C.TPU.REMAT_POLICY = ""           # "" = recompute everything in the stage;
                                   # "conv" = save conv outputs, recompute only
                                   # the BN/ReLU/add chains between them (much
                                   # cheaper recompute, most of the HBM relief).
_C.TPU.SEED = 0
_C.TPU.COMPILATION_CACHE_DIR = ""  # non-empty: persistent XLA compile cache.

_C.DATA = CfgNode()
# Input backend: 'auto' | 'cv2' | 'native' pick the host decoder for the
# offline crop folders; 'online' trains straight from the raw 1_Sample videos
# through the fused device preprocessing graph — no stage folders on disk
# (pipeline/online.py).
_C.DATA.BACKEND = "auto"
_C.DATA.SYNTHETIC_NUM_VIDEOS = 0  # >0: use the synthetic fixture with this many videos.
_C.DATA.SYNTHETIC_SEQ_LEN = 24    # Frames per synthetic video.
_C.DATA.ONLINE_DETECTOR = "synthetic"  # online-path detections: 'synthetic' | 'densepose'.
_C.DATA.DENSEPOSE_PKL = ""  # converted detectron2 pkl for the online detector.
# Online-path flow solver effort (reference pyflow params by default,
# chalearn_video_to_flow.py:27-33); turn down for CPU tests.
_C.DATA.FLOW_OUTER = 7
_C.DATA.FLOW_SOR = 30
_C.DATA.FLOW_MIN_WIDTH = 20

_DEFAULT_OVERRIDE_LOCATIONS = (
    Path("..", "cfg_override.yaml"),
    Path("cfg_override.yaml"),
)


def get_cfg() -> CfgNode:
    """Get a copy of the default config (reference defaults.py:50-54)."""
    return _C.clone()


def get_override_cfg() -> CfgNode:
    """Default config merged with the machine-local ``cfg_override.yaml``.

    Matches reference defaults.py:56-61: the override file lives *outside* the
    repo (``../cfg_override.yaml``) so per-machine paths never hit version
    control; a repo-root ``cfg_override.yaml`` is also honoured.
    """
    cfg = get_cfg()
    for override in _DEFAULT_OVERRIDE_LOCATIONS:
        if override.is_file():
            cfg.merge_from_file(override)
            break
    return cfg


def load_model_cfg(model_yaml_name: str, overrides=None) -> CfgNode:
    """3-layer merge: defaults <- config/yamls/<name>.yaml <- cfg_override.yaml.

    Reproduces the merge order of reference train.py:405-413 (per-model yaml first,
    machine override last) as a single function instead of inline __main__ code.
    """
    cfg = get_cfg()
    yaml_path = Path(__file__).parent / "yamls" / f"{model_yaml_name}.yaml"
    cfg.merge_from_file(yaml_path)
    for override in _DEFAULT_OVERRIDE_LOCATIONS:
        if override.is_file():
            cfg.merge_from_file(override)
            break
    if overrides:
        cfg.merge_from_list(list(overrides))
    return cfg
