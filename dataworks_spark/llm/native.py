"""Optional compiled fast path for per-byte sequential codec loops.

The PNG Average/Paeth unfilter is a true left-to-right recurrence —
``out[i]`` depends on ``out[i-bpp]`` — so it cannot be expressed as
vectorized numpy (r12 measured pure-python beating per-column numpy
12× at this granularity, and r14 measured the best pure-python
restructuring — per-lane zip iteration — at only 1.21×). The next
honest lever is the one every production PNG stack (libpng, stb_image)
uses: the byte loop in C. This module compiles a ~50-line C kernel
once per machine with the system C compiler and loads it via ctypes —
measured 29× over the python loop on 512×384 mixed-filter scanlines
(BASELINE r14), pixel-identical by exhaustive differential test.

STRICTLY OPTIONAL: every caller keeps its pure-python loop and treats
``None`` from :func:`png_unfilter` as "no native path" — no compiler,
a failed compile, a sandboxed /tmp, or ``SPARK_GRAFT_DISABLE_NATIVE=1``
all degrade to the r13 behavior, never to an error. At cluster scale
the kernel runs inside mapInPandas workers: the package ships via
``ensure_package_shipped`` (source only — nothing binary rides the
job), each HOST compiles once into a uid-scoped cache directory and
every worker process dlopens the cached object.

Scope note: this accelerates only the decode inner loop of the
from-spec PNG codec (reference parity itself needs no codecs at all —
the reference keeps blobs opaque); the JPEG Huffman walk is the other
candidate consumer and is recorded in NEXT_STEPS, not silently done.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

#: per-process memo: source-hash -> CDLL or None (failed / disabled)
_LIBS: dict[str, ctypes.CDLL | None] = {}

_PNG_UNFILTER_SRC = r"""
#include <stdint.h>
/* Reverse PNG scanline filters (RFC 2083 section 6) for a whole
   (sub-)image in one call. flt: h rows of (1 + row_bytes) bytes, the
   leading byte of each row is its filter type. out: h x row_bytes
   reconstructed bytes. bpp: the byte stride (pixel size floored at
   1). Returns 0, or the offending filter type when one is > 4 (the
   caller raises the same error as the python path). All arithmetic
   is mod 256 via the uint8_t stores, exactly like the python loop. */
int png_unfilter(const uint8_t *flt, uint8_t *out,
                 long h, long row_bytes, long bpp) {
    const uint8_t *prev = 0;
    for (long y = 0; y < h; y++) {
        int ft = flt[y * (row_bytes + 1)];
        const uint8_t *raw = flt + y * (row_bytes + 1) + 1;
        uint8_t *o = out + y * row_bytes;
        if (ft == 0) {
            for (long i = 0; i < row_bytes; i++) o[i] = raw[i];
        } else if (ft == 1) {
            for (long i = 0; i < row_bytes; i++) {
                int left = i >= bpp ? o[i - bpp] : 0;
                o[i] = (uint8_t)(raw[i] + left);
            }
        } else if (ft == 2) {
            for (long i = 0; i < row_bytes; i++) {
                int up = prev ? prev[i] : 0;
                o[i] = (uint8_t)(raw[i] + up);
            }
        } else if (ft == 3) {
            for (long i = 0; i < row_bytes; i++) {
                int left = i >= bpp ? o[i - bpp] : 0;
                int up = prev ? prev[i] : 0;
                o[i] = (uint8_t)(raw[i] + ((left + up) >> 1));
            }
        } else if (ft == 4) {
            for (long i = 0; i < row_bytes; i++) {
                int a = i >= bpp ? o[i - bpp] : 0;
                int b = prev ? prev[i] : 0;
                int c = (prev && i >= bpp) ? prev[i - bpp] : 0;
                int p = a + b - c;
                int pa = p >= a ? p - a : a - p;
                int pb = p >= b ? p - b : b - p;
                int pc = p >= c ? p - c : c - p;
                int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                o[i] = (uint8_t)(raw[i] + pred);
            }
        } else {
            return ft;
        }
        prev = o;
    }
    return 0;
}
"""


def _load(src: str) -> ctypes.CDLL | None:
    """Compile-once-per-HOST, load-once-per-PROCESS. The shared object
    is cached under a uid-scoped 0700 directory keyed by the source
    hash (a world-writable /tmp path would let another uid pre-plant a
    library at a predictable name); the compile writes to a unique
    temp name and renames atomically, so concurrent workers race
    safely. Any failure memoizes None — callers fall back to python."""
    key = hashlib.md5(src.encode()).hexdigest()
    if key in _LIBS:
        return _LIBS[key]
    lib: ctypes.CDLL | None = None
    try:
        if os.environ.get("SPARK_GRAFT_DISABLE_NATIVE"):
            raise RuntimeError("native kernels disabled by env")
        cache = os.path.join(
            tempfile.gettempdir(), f"dwspark_native_{os.getuid()}"
        )
        os.makedirs(cache, mode=0o700, exist_ok=True)
        if os.stat(cache).st_uid != os.getuid():
            raise RuntimeError("native cache dir owned by another uid")
        so = os.path.join(cache, f"{key}.so")
        if not os.path.exists(so):
            c_path = os.path.join(cache, f"{key}.c")
            with open(c_path, "w") as f:
                f.write(src)
            tmp_so = os.path.join(cache, f"{key}.{os.getpid()}.so.tmp")
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, c_path],
                check=True, capture_output=True, timeout=60,
            )
            os.rename(tmp_so, so)
        lib = ctypes.CDLL(so)
    except Exception:  # noqa: BLE001 — no cc / sandbox / bad cache: python path
        lib = None
    _LIBS[key] = lib
    return lib


def png_unfilter(
    flt: np.ndarray, h: int, row_bytes: int, bpp: int
) -> np.ndarray | None:
    """Whole-image PNG unfilter through the C kernel, or ``None`` when
    the native path is unavailable. ``flt`` is the (h, 1 + row_bytes)
    uint8 filtered scanline block. Raises the same unknown-filter
    ValueError as the python loop so the two paths stay contract-
    identical."""
    lib = _load(_PNG_UNFILTER_SRC)
    if lib is None:
        return None
    fn = lib.png_unfilter
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                   ctypes.c_long, ctypes.c_long, ctypes.c_long]
    buf = np.ascontiguousarray(flt, dtype=np.uint8)
    out = np.zeros(h * row_bytes, dtype=np.uint8)
    rc = fn(buf.tobytes(), out.ctypes.data_as(ctypes.c_char_p),
            h, row_bytes, bpp)
    if rc != 0:
        raise ValueError(f"unknown filter type {rc}")
    return out.reshape(h, row_bytes)
