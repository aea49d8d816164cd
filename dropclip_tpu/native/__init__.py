"""Native (C) components, loaded via ctypes with pure-python fallbacks.

Build once with ``make -C dropclip_tpu/native`` (or the automatic
first-import build below). Nothing here is required — every native entry
point has a numpy fallback — but the RLE codec is ~100x faster than the
python loop on real COCO annotation sizes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdropclip_native.so")


def _build() -> bool:
    src = os.path.join(_DIR, "rle.c")
    cc = os.environ.get("CC", "cc")
    try:
        subprocess.run([cc, "-O3", "-shared", "-fPIC", "-o", _SO, src],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # noqa: BLE001 — any failure -> python fallback
        print(f"[dropclip_tpu.native] build failed ({e}); using python "
              f"fallbacks", file=sys.stderr)
        return False


def load() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(os.path.join(_DIR, "rle.c"))):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.rle_decode.restype = ctypes.c_int
    lib.rle_decode.argtypes = [ctypes.c_char_p, ctypes.c_long,
                               ctypes.POINTER(ctypes.c_uint8),
                               ctypes.c_long, ctypes.c_long]
    lib.rle_encode.restype = ctypes.c_long
    lib.rle_encode.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                               ctypes.c_long, ctypes.c_char_p, ctypes.c_long]
    return lib
