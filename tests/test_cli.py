"""CLI smoke tests (argument wiring; heavy subcommands exercised elsewhere)."""

import numpy as np

from video_classification_tpu.__main__ import main
from video_classification_tpu import tools


def test_how_many_classes(tmp_path, capsys):
    txt = tmp_path / "train.txt"
    txt.write_text(
        "train/001/M_1.avi train/001/K_1.avi 1\n"
        "train/002/M_2.avi train/002/K_2.avi 2\n"
        "train/002/M_3.avi train/002/K_3.avi 2\n"
    )
    stats = tools.how_many_classes(txt)
    assert stats == {"min": 1, "max": 2, "num_classes": 2, "num_videos": 3}
    rc = main(["tools", "how-many-classes", str(txt)])
    assert rc == 0
    assert "num of videos: 3" in capsys.readouterr().out


def test_render_iuv(tmp_path):
    import cv2
    import pickle

    video = tmp_path / "v.avi"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    for _ in range(3):
        w.write(np.zeros((48, 64, 3), np.uint8))
    w.release()
    results = [
        {"pred_boxes_XYXY": np.asarray([[40.0, 30.0, 90.0, 70.0]]),
         "scores": np.asarray([0.9])}
        for _ in range(3)
    ]
    pkl = tmp_path / "v.pkl"
    with pkl.open("wb") as f:
        pickle.dump(results, f)
    n = tools.render_iuv_boxes(pkl, video, tmp_path / "out")
    assert n == 3
    assert (tmp_path / "out" / "00000.jpg").exists()


def test_cli_help_paths():
    import pytest

    with pytest.raises(SystemExit):
        main(["--help"])
