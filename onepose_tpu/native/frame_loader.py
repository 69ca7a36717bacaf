"""Python interface to the native threaded frame loader.

`FrameLoader` streams decoded (and optionally affine-warped) grayscale
float32 frames in order while C++ worker threads run file IO + decode +
warp ahead of the consumer — the framework's data-loading runtime,
replacing the reference's on-thread cv2.imread/warpAffine feed
(src/datasets/normalized_dataset.py:8-44). Falls back to cv2 when the
native library is unavailable, with identical output semantics (BT.601
grayscale, inverse-map bilinear warp, zero border, [0, 1] float).
"""

from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

from onepose_tpu.native import get_lib


def native_available() -> bool:
    lib = get_lib()
    return lib is not None and hasattr(lib, "fl_create")


def read_gray(path: str) -> Optional[np.ndarray]:
    """Decode one image to grayscale float32 [0, 1] via the native codecs.

    Returns None if the native library is unavailable or decode fails
    (callers fall back to cv2).
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "fl_probe"):
        return None
    hw = np.zeros(2, np.int32)
    if not lib.fl_probe(path.encode(), hw):
        return None
    out = np.empty(int(hw[0]) * int(hw[1]), np.float32)
    if not lib.fl_read_gray(path.encode(), out, out.size):
        return None
    return out.reshape(int(hw[0]), int(hw[1]))


class FrameLoader:
    """Ordered prefetching frame iterator.

    Args:
      paths: image files (PNG or JPEG).
      out_hw: output (H, W); None keeps each frame's native size (then all
        frames must share one size, checked on first frame).
      affines: optional [N, 2, 3] OUTPUT->SOURCE affines (the `inv=True`
        result of geometry.transforms.get_affine_transform) applied per
        frame; requires out_hw.
      n_threads / queue_cap: worker pool size and max frames decoded ahead.

    Iterating yields (index, frame [H, W] float32 | None-on-decode-failure).
    """

    def __init__(
        self,
        paths: Sequence[str],
        out_hw: Optional[tuple] = None,
        affines: Optional[np.ndarray] = None,
        n_threads: int = 2,
        queue_cap: int = 4,
    ):
        if affines is not None and out_hw is None:
            raise ValueError("affines requires out_hw")
        self.paths = [str(p) for p in paths]
        self.out_hw = tuple(out_hw) if out_hw else None
        self.affines = (
            np.ascontiguousarray(affines, np.float32).reshape(-1, 6)
            if affines is not None
            else None
        )
        if self.affines is not None and len(self.affines) != len(self.paths):
            raise ValueError("one affine per frame required")
        self.n_threads = n_threads
        self.queue_cap = queue_cap
        self._lib = get_lib() if self.paths else None
        self._native = self._lib is not None and hasattr(self._lib, "fl_create")
        self._handle = None

    # -- native path -------------------------------------------------------
    def _start_native(self):
        enc = [p.encode() for p in self.paths]
        arr = (ctypes.c_char_p * len(enc))(*enc)
        oh, ow = self.out_hw if self.out_hw else (0, 0)
        aff = None
        if self.affines is not None:
            self._aff_buf = np.ascontiguousarray(self.affines, np.float32)
            aff = self._aff_buf.ctypes.data_as(ctypes.c_void_p)
        self._handle = self._lib.fl_create(
            arr, len(enc), oh, ow, aff, self.n_threads, self.queue_cap
        )
        self._paths_keepalive = arr  # the C side copies, but be safe

    def __iter__(self):
        if not self.paths:
            return
        if self._native:
            self._start_native()
            try:
                hw = self.out_hw
                src_hw = np.zeros(2, np.int32)
                for i in range(len(self.paths)):
                    if hw is None:
                        # Probe the first frame's size; all must match.
                        probe = np.zeros(2, np.int32)
                        if not self._lib.fl_probe(
                            self.paths[i].encode(), probe
                        ):
                            yield i, None
                            continue
                        hw = (int(probe[0]), int(probe[1]))
                    out = np.empty(hw, np.float32)
                    rc = self._lib.fl_next(
                        self._handle, out.reshape(-1), out.size, src_hw
                    )
                    if rc == 1:
                        yield i, out
                    elif rc == 0:
                        yield i, None
                    else:
                        return
            finally:
                self._lib.fl_destroy(self._handle)
                self._handle = None
            return
        yield from self._iter_fallback()

    # -- cv2 fallback ------------------------------------------------------
    def _iter_fallback(self):
        import cv2

        for i, p in enumerate(self.paths):
            img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            if img is None:
                yield i, None
                continue
            img = img.astype(np.float32) / 255.0
            if self.affines is not None:
                h, w = self.out_hw
                img = cv2.warpAffine(
                    img,
                    self.affines[i].reshape(2, 3),
                    (w, h),
                    flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                )
            elif self.out_hw and img.shape != self.out_hw:
                h, w = self.out_hw
                img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
            yield i, img
