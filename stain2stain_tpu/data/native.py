"""ctypes bindings for the native batch tile decoder (native/s2s_loader.cc).

The reference runs its host hot loop — cv2.imread + resize per tile — inside
torch DataLoader worker *processes* (/root/reference/src/data/
paired_data_module.py:162-211). Here the whole batch is decoded and resized by
ONE extern-C call into a contiguous uint8 array via an internal C++ thread
pool; ctypes releases the GIL for the duration, so the prefetch thread never
blocks Python. Datasets call :func:`decode_batch` from their ``get_batch``
fast path and fall back to the per-item cv2/PIL path when :func:`available`
is False (library missing and unbuildable, or ``S2S_DISABLE_NATIVE=1``).

The shared library is built on first use with ``make -C native`` (g++,
libpng/libjpeg — all baked into the image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libs2s_loader.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    with _lock:
        if _load_attempted:
            return _lib
        _load_attempted = True
        if not _LIB_PATH.exists() and (_NATIVE_DIR / "Makefile").exists():
            try:
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)],
                    capture_output=True,
                    timeout=180,
                    check=True,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.s2s_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.c_int,  # n
            ctypes.POINTER(ctypes.c_uint8),  # out
            ctypes.c_int,  # size
            ctypes.c_int,  # channels
            ctypes.c_int,  # nearest
            ctypes.c_int,  # n_threads
        ]
        lib.s2s_decode_batch.restype = ctypes.c_int
        lib.s2s_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
        lib.s2s_probe.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native decoder can be used (built/buildable, not disabled)."""
    if os.environ.get("S2S_DISABLE_NATIVE") == "1":
        return False
    return _load() is not None


def decode_batch(
    paths: Sequence[str],
    size: int,
    channels: int = 3,
    nearest: bool = False,
    n_threads: int = 0,
) -> np.ndarray:
    """Decode+resize ``paths`` into one ``(n, size, size, channels)`` uint8 array.

    ``nearest=True`` uses nearest-neighbour resize (masks: class ids stay
    exact); the default is bilinear with cv2 half-pixel-center convention.
    Raises if the library is unavailable or any file fails to decode — the
    same failure surface as the per-item cv2/PIL fallback path.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native tile decoder unavailable (check native.available() first)")
    n = len(paths)
    out = np.zeros((n, size, size, channels), dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    ok = lib.s2s_decode_batch(
        c_paths,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size,
        channels,
        1 if nearest else 0,
        n_threads,
    )
    if ok != n:
        bad = [p for p in paths if not lib.s2s_probe(os.fsencode(p), (ctypes.c_int * 2)())]
        if bad:
            detail = f"headers unreadable for e.g. {bad[:3]}"
        else:
            # every header probes fine — the failure happened during the full
            # decode (e.g. a file truncated after its header); name candidates
            # instead of printing an empty list
            detail = (
                "all headers probe OK, so a tile failed mid-decode "
                f"(truncated/corrupt body); batch paths e.g. {list(paths)[:3]}"
            )
        raise RuntimeError(f"native decode failed for {n - ok}/{n} tiles: {detail}")
    return out


def probe(path: str) -> Optional[tuple[int, int]]:
    """(height, width) of an image file, or None if it cannot be decoded."""
    lib = _load()
    if lib is None:
        return None
    dims = (ctypes.c_int * 2)()
    if not lib.s2s_probe(os.fsencode(path), dims):
        return None
    return int(dims[0]), int(dims[1])


__all__ = ["available", "decode_batch", "probe"]
