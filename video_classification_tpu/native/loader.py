"""ctypes bindings + build driver for the native clip loader (vcloader.cc).

Builds the shared library on first use (g++ -O3, links libjpeg) and caches it
next to the source. ``NativeClipLoader`` mirrors the Python frame-stack loader's
semantics (9-file 21-channel stack, pad-to-square + INTER_CUBIC resize,
missing -> 127) with a C++ pthread worker pool doing the decode work.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

NUM_FILES = 9
NUM_CHANNELS = 21

_SRC = Path(__file__).parent / "vcloader.cc"
_SO = Path(__file__).parent / "libvcloader.so"
_build_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_SO), "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return None
    except subprocess.CalledProcessError as e:
        return e.stderr
    except FileNotFoundError as e:
        return str(e)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    with _build_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            err = _build()
            if err is not None:
                _build_error = err
                return None
        lib = ctypes.CDLL(str(_SO))
        lib.vcl_create.restype = ctypes.c_void_p
        lib.vcl_create.argtypes = [ctypes.c_int]
        lib.vcl_destroy.argtypes = [ctypes.c_void_p]
        lib.vcl_submit_clip.restype = ctypes.c_long
        lib.vcl_submit_clip.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.vcl_wait.restype = ctypes.c_int
        lib.vcl_wait.argtypes = [ctypes.c_void_p, ctypes.c_long]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


class NativeClipLoader:
    """Submit/wait interface over the C++ worker pool.

    ``submit(paths, t, size)`` takes t*9 file paths (frame-major, order
    [rgb, U, V, F0..F4, D]; '' marks a missing frame) and returns (ticket, out
    array); ``wait(ticket)`` blocks until the clip's (t, size, size, 21) uint8
    stack is filled.
    """

    def __init__(self, num_threads: int = 4):
        lib = get_lib()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self._handle = lib.vcl_create(num_threads)
        self._outs = {}

    def close(self):
        if self._handle:
            self._lib.vcl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def submit(self, paths: Sequence[str], t: int, size: int):
        assert len(paths) == t * NUM_FILES, (len(paths), t)
        out = np.empty((t, size, size, NUM_CHANNELS), np.uint8)
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        ticket = self._lib.vcl_submit_clip(
            self._handle,
            arr,
            t,
            size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        # Keep the paths array + buffer alive until wait().
        self._outs[ticket] = (out, arr)
        return ticket

    def wait(self, ticket) -> np.ndarray:
        status = self._lib.vcl_wait(self._handle, ticket)
        out, _ = self._outs.pop(ticket)
        if status != 0:
            raise RuntimeError("native clip load failed")
        return out

    def load_clip(self, paths: Sequence[str], t: int, size: int) -> np.ndarray:
        return self.wait(self.submit(paths, t, size))


def frame_paths_for(root: Path, crop_folder: str, nsetx3x5img: Path) -> List[str]:
    """The 9 modality file paths of one frame (order matches BuildFrame)."""
    frame = Path(root, crop_folder, nsetx3x5img)
    parent, name = frame.parent, frame.name
    if not frame.exists():
        return [""] * NUM_FILES
    return (
        [str(frame)]
        + [str(parent / f"{p}{name}") for p in ("U_", "V_")]
        + [str(parent / f"F{i}_{name}") for i in range(5)]
        + [str(parent / f"D_{name}")]
    )
