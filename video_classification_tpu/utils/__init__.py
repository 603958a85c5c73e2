from .labels import Labels, get_labels, parse_label_lines, write_labels
from .chapath import ChaPath
from .logging import MetricsLogger
from .profiling import trace, StepTimer

__all__ = [
    "Labels",
    "get_labels",
    "parse_label_lines",
    "write_labels",
    "ChaPath",
    "MetricsLogger",
    "trace",
    "StepTimer",
]
