"""Frame feed: native prefetching loader with pure-Python fallback.

Wraps the C++ runtime (`vslam_tpu/native/dataloader.cpp` -> libvtdata.so)
via ctypes: TUM parsing + libpng decode + pthread prefetch ring, so frame
ingest overlaps device compute (the reference decodes on the SLAM thread,
`src/main.cpp:1097-1104`). Falls back to the cv2-based Python path
(`vslam_tpu.data.tum`) when the library is not built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native", "libvtdata.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vt_open_sequence.restype = ctypes.c_void_p
    lib.vt_open_sequence.argtypes = [ctypes.c_char_p]
    lib.vt_seq_len.restype = ctypes.c_int
    lib.vt_seq_len.argtypes = [ctypes.c_void_p]
    lib.vt_timestamp.restype = ctypes.c_double
    lib.vt_timestamp.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.vt_has_depth.restype = ctypes.c_int
    lib.vt_has_depth.argtypes = [ctypes.c_void_p, ctypes.c_int]
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    for fn in (lib.vt_get_frame, lib.vt_fetch):
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_int, u8p, u16p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
        ]
    lib.vt_prefetch.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 4
    lib.vt_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeSequenceLoader:
    """Prefetching TUM sequence reader backed by the C++ runtime."""

    def __init__(self, root: str, width=640, height=480, depth_scale=5000.0,
                 workers: int = 2):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "libvtdata.so not built — run `make -C vslam_tpu/native` "
                "or use PythonSequenceLoader"
            )
        self._lib = lib
        self._h = lib.vt_open_sequence(root.encode())
        self.width = width
        self.height = height
        self.depth_scale = depth_scale
        self.workers = workers
        self._prefetched = False

    def __len__(self):
        return self._lib.vt_seq_len(self._h)

    def timestamps(self):
        return np.array([self._lib.vt_timestamp(self._h, i) for i in range(len(self))])

    def prefetch(self, start=0, step=1, count=None):
        if count is None:
            count = (len(self) - start + step - 1) // step
        self._lib.vt_prefetch(self._h, start, step, count, self.workers)
        self._prefetched = True

    def get(self, idx) -> Tuple[np.ndarray, np.ndarray, float]:
        """Returns (rgb uint8 (H, W, 3), depth float32 meters (H, W), ts)."""
        rgb = np.empty((self.height, self.width, 3), np.uint8)
        depth_raw = np.empty((self.height, self.width), np.uint16)
        w = ctypes.c_int()
        h = ctypes.c_int()
        ts = ctypes.c_double()
        fn = self._lib.vt_fetch if self._prefetched else self._lib.vt_get_frame
        ok = fn(self._h, idx, rgb, depth_raw, ctypes.byref(w), ctypes.byref(h),
                ctypes.byref(ts))
        if not ok:
            raise IOError(f"frame {idx} failed to decode")
        if (h.value, w.value) != (self.height, self.width):
            raise ValueError(
                f"frame {idx} is {w.value}x{h.value}, expected "
                f"{self.width}x{self.height}"
            )
        depth = depth_raw.astype(np.float32) / self.depth_scale
        return rgb, depth, ts.value

    def frames(self, step=1) -> Iterator[Tuple[np.ndarray, np.ndarray, float]]:
        self.prefetch(0, step)
        for i in range(0, len(self), step):
            yield self.get(i)

    def close(self):
        if self._h:
            self._lib.vt_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class PythonSequenceLoader:
    """cv2-based fallback with the same interface."""

    def __init__(self, root: str, width=640, height=480, depth_scale=5000.0, workers=0):
        from vslam_tpu.data import tum

        self.seq = tum.load_sequence(root)
        self.width = width
        self.height = height
        self.depth_scale = depth_scale

    def __len__(self):
        return len(self.seq)

    def timestamps(self):
        return np.array([f.timestamp for f in self.seq.frames])

    def prefetch(self, *a, **k):
        pass

    def get(self, idx):
        from vslam_tpu.data import tum

        e = self.seq.frames[idx]
        rgb = tum.load_rgb(e.rgb_path)
        depth = (
            tum.load_depth(e.depth_path, self.depth_scale)
            if e.depth_path
            else np.zeros(rgb.shape[:2], np.float32)
        )
        return rgb, depth, e.timestamp

    def frames(self, step=1):
        for i in range(0, len(self), step):
            yield self.get(i)

    def close(self):
        pass


def open_sequence(root: str, prefer_native=True, **kw):
    if prefer_native and os.path.exists(_LIB_PATH):
        try:
            return NativeSequenceLoader(root, **kw)
        except Exception:
            pass
    return PythonSequenceLoader(root, **kw)
