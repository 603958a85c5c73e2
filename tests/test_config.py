"""Config system tests: yacs-compatible semantics + reference key surface."""

from pathlib import Path

import pytest

from video_classification_tpu.config import CfgNode, get_cfg, load_model_cfg
from video_classification_tpu.config import crop_cfg


def test_defaults_match_reference_keys():
    cfg = get_cfg()
    # Key surface of reference config/defaults.py:4-48.
    assert cfg.CHALEARN.NUM_CLASS == 249
    assert cfg.CHALEARN.BATCH_SIZE == 10
    assert cfg.CHALEARN.SAMPLE_CLASS == 249
    assert cfg.CHALEARN.IMG_SAMPLE_INTERVAL == 5
    assert cfg.CHALEARN.CLIP_LEN == 20
    assert cfg.CHALEARN.ISO == "0_Iso"
    assert cfg.CHALEARN.SAMPLE == "1_Sample"
    assert cfg.CHALEARN.IMG == "2_Images"
    assert cfg.CHALEARN.PAD == "3_Pad"
    assert cfg.CHALEARN.IUV == "4_IUV"
    assert cfg.CHALEARN.CSE == "4_CSE"
    assert cfg.CHALEARN.CROP_BODY == "CropBody"
    assert cfg.CHALEARN.FLOW == "2_Flow"
    assert cfg.CHALEARN.IMG_ENERGY == "2_Images_energy"
    assert cfg.CHALEARN.FLOW_VIDEO == "2_Flow_New"
    assert cfg.CHALEARN.IUV_NEW == "4_IUV_New"
    assert cfg.CHALEARN.UV_VIDEO == "5_UV_Video"
    assert cfg.CHALEARN.BOX == "6_Box"
    assert cfg.MODEL.R3D_INPUT == "CropHTAH"
    assert cfg.MODEL.LR == 5e-4
    assert cfg.MODEL.FUSE is True
    assert cfg.MODEL.MAX_EPOCH == 100
    assert cfg.MODEL.INPUT_SIZE == 192
    assert cfg.NUM_CPU == 18


def test_clone_is_independent():
    a = get_cfg()
    b = a.clone()
    b.CHALEARN.BATCH_SIZE = 99
    assert a.CHALEARN.BATCH_SIZE == 10


def test_merge_from_file(tmp_path):
    yaml_file = tmp_path / "override.yaml"
    yaml_file.write_text("CHALEARN:\n  BATCH_SIZE: 55\nMODEL:\n  LR: 2e-4\n")
    cfg = get_cfg()
    cfg.merge_from_file(yaml_file)
    assert cfg.CHALEARN.BATCH_SIZE == 55
    assert cfg.MODEL.LR == 2e-4
    # Untouched keys keep defaults.
    assert cfg.CHALEARN.CLIP_LEN == 20


def test_merge_unknown_key_raises(tmp_path):
    yaml_file = tmp_path / "bad.yaml"
    yaml_file.write_text("CHALEARN:\n  TYPO_KEY: 1\n")
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_file(yaml_file)


def test_merge_type_mismatch_raises(tmp_path):
    yaml_file = tmp_path / "bad.yaml"
    yaml_file.write_text("CHALEARN:\n  BATCH_SIZE: 'not-a-number'\n")
    cfg = get_cfg()
    with pytest.raises(ValueError):
        cfg.merge_from_file(yaml_file)


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(["CHALEARN.BATCH_SIZE", "300", "MODEL.NAME", "slowfast-LHand"])
    assert cfg.CHALEARN.BATCH_SIZE == 300
    assert cfg.MODEL.NAME == "slowfast-LHand"
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.NOPE", "1"])


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.LR = 1.0
    cfg.defrost()
    cfg.MODEL.LR = 1.0
    assert cfg.MODEL.LR == 1.0


def test_dump_roundtrip():
    cfg = get_cfg()
    dumped = cfg.dump()
    reparsed = CfgNode(__import__("yaml").safe_load(dumped))
    assert reparsed.CHALEARN.CLIP_LEN == 20


ALL_MODEL_YAMLS = [
    "res2d",
    "res3d",
    "slowfast-HTAH",
    "slowfast-LHand",
    "slowfast-RHand",
    "slowfast-LHandArm",
    "slowfast-RHandArm",
    "slowfast-Torso",
]


@pytest.mark.parametrize("name", ALL_MODEL_YAMLS)
def test_model_yamls_load(name):
    cfg = load_model_cfg(name)
    assert cfg.MODEL.NAME == name


def test_model_yaml_values_match_reference():
    # Spot-check the per-stream hyperparameters (reference config/*.yaml).
    cfg = load_model_cfg("slowfast-HTAH")
    assert (cfg.CHALEARN.BATCH_SIZE, cfg.MODEL.LR, cfg.MODEL.MAX_EPOCH) == (55, 2e-4, 150)
    assert cfg.MODEL.R3D_INPUT == "CropHTAH"
    cfg = load_model_cfg("slowfast-LHand")
    assert (cfg.CHALEARN.BATCH_SIZE, cfg.MODEL.MAX_EPOCH) == (300, 50)
    cfg = load_model_cfg("res2d")
    assert (cfg.CHALEARN.BATCH_SIZE, cfg.CHALEARN.CLIP_LEN, cfg.MODEL.MAX_EPOCH) == (60, 10, 400)
    cfg = load_model_cfg("res3d")
    assert cfg.CHALEARN.BATCH_SIZE == 30


def test_crop_taxonomy_matches_reference():
    # reference config/crop_cfg.py:3-45
    assert crop_cfg.crop_folder_list == [
        "CropHTAH", "CropLHand", "CropRHand", "CropLHandArm", "CropRHandArm", "CropTorso",
    ]
    assert crop_cfg.crop_resize_dict["CropHTAH"] == 192
    assert crop_cfg.crop_resize_dict["CropLHand"] == 64
    assert crop_cfg.crop_resize_dict["CropTorso"] == 128
    d = {name: idx for idx, name in crop_cfg.crop_part_args}
    assert d["CropLHand"] == [4]
    assert d["CropRHand"] == [3]
    assert d["CropTorso"] == [1, 2]
    assert d["CropLHandArm"] == [4, 21, 19, 17, 15]
    assert d["CropRHandArm"] == [3, 20, 22, 16, 18]
    assert d["CropHTAH"] == [4, 21, 19, 17, 15, 1, 2, 23, 24, 20, 22, 16, 18, 3]
    assert len(crop_cfg.extra_crop_folder_list) == 8


def test_labels_roundtrip(tmp_path):
    from video_classification_tpu.utils import get_labels, write_labels, Labels

    cfg = get_cfg()
    cfg.CHALEARN.ROOT = str(tmp_path)
    entries = [
        ("train/001/M_00001.avi", "train/001/K_00001.avi", 1),
        ("train/002/M_00002.avi", "train/002/K_00002.avi", 2),
    ]
    write_labels(cfg, "train", entries)
    assert get_labels(cfg, "train") == entries
    assert Labels(cfg).from_set("train") == entries


def test_chapath():
    from video_classification_tpu.utils import ChaPath

    # Reference path layout (new_feature_test.py:24-53): ROOT/<stage>/<split>/<class>/<video>
    p = ChaPath(Path("/root/1_Sample/train/001/M_00068.avi"))
    assert str(p.change_split("test")) == "/root/1_Sample/test/001/M_00068.avi"
    assert str(p.change_base("2_Flow_New")) == "/root/2_Flow_New/train/001/M_00068.avi"
    assert str(p.prepend("U_")) == "/root/1_Sample/train/001/U_M_00068.avi"
