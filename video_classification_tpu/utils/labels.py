"""ChaLearn IsoGD label I/O.

Parses the ``1_Sample/<set>.txt`` files whose lines are ``"M K L"`` — RGB video
relative path, depth video relative path, integer class label (1..249). Behavior
matches `/root/reference/utils/chalearn.py:7-35`, minus that module's eager
import-time loading (which required the dataset to exist just to import the code).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

LabelEntry = Tuple[str, str, int]


def parse_label_lines(lines: List[str]) -> List[LabelEntry]:
    labels = [line.split(" ") for line in lines if line.strip()]
    return [(m, k, int(l)) for (m, k, l) in labels]


def get_labels(cfg, name_of_set: str) -> List[LabelEntry]:
    """Label list for one split. ``name_of_set`` in {'train','test','valid'}."""
    assert name_of_set in ("train", "test", "valid"), name_of_set
    txt = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.SAMPLE, name_of_set + ".txt")
    with txt.open("r") as f:
        return parse_label_lines(f.readlines())


def write_labels(cfg, name_of_set: str, labels: List[LabelEntry]) -> Path:
    txt = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.SAMPLE, name_of_set + ".txt")
    txt.parent.mkdir(parents=True, exist_ok=True)
    with txt.open("w") as f:
        f.writelines(f"{m} {k} {l}\n" for (m, k, l) in labels)
    return txt


class Labels:
    """cfg-injected label reader (reference utils/chalearn.py:19-35)."""

    def __init__(self, cfg) -> None:
        self.cfg = cfg
        self.sample_root = Path(cfg.CHALEARN.ROOT, cfg.CHALEARN.SAMPLE)

    def from_set(self, name_of_set: str) -> List[LabelEntry]:
        return get_labels(self.cfg, name_of_set)
