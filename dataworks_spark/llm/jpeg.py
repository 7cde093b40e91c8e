"""Pure-numpy baseline JPEG codec (SURVEY §2 L5 — the compressed-codec
gate, r10 VERDICT #6).

The build image carries no PIL/libjpeg, so compressed image payloads
previously hit an honest ``NotImplementedError`` gate. Baseline JPEG
(ITU-T T.81 SOF0: 8-bit sequential DCT, Huffman entropy coding) is
small enough to implement faithfully from the PUBLIC specification —
this module does exactly that, in numpy, so `decode_image_features`
can serve real JPEG corpora without native codec libraries:

* :func:`decode_baseline_jpeg` — marker parse (DQT/DHT/SOF0/SOS/DRI,
  APPn/COM skipped), Huffman + RLE entropy decode with byte
  de-stuffing and restart markers, dequantize → inverse zigzag →
  IDCT-II (8×8 basis matmul), chroma upsampling by replication (any
  integer sampling factors, so 4:4:4 / 4:2:2 / 4:2:0 and grayscale all
  decode), JFIF YCbCr→RGB. Progressive (SOF2) streams decode through
  :mod:`dataworks_spark.llm.jpeg_progressive` via the
  :func:`decode_jpeg` dispatcher (r12); arithmetic-coded streams raise
  ``ValueError``, which the caller treats exactly like any other
  undecodable payload.
* :func:`encode_baseline_jpeg` — the matching encoder (Annex K example
  quantization + Huffman tables, quality scaling per the public IJG
  formula, optional 4:2:0), used by the media fixtures and the
  round-trip tests. Decoder correctness is NOT argued from the
  round-trip alone: the suite also decodes foreign-encoder fixtures
  checked in features (dimension/marker structure), and the decoder
  was validated during development against real libjpeg-produced
  files (grayscale, 4:2:0 and 4:4:4 variants).

Scale shape: this is a PER-ROW kernel executed inside Arrow batches
(`multimodal.decode_image_features`) — payload bytes stay inside the
executor batch; only feature rows leave. Entropy decode routes through
the optional compiled segment kernel in llm/native.py when a system C
compiler exists (r14 — same pattern as the PNG unfilter: bit-for-bit
pinned, python block loop as the fallback, nothing binary ships with
the job); de-stuffing is the shared find/slice `_entropy_segments`,
and the peek-16 LUTs build directly as int32 arrays. MEASURED on the
512×384 q85 4:2:0 A/B methodology, single core: python path
1.06 Mpx/s/core, native path **6.19 Mpx/s/core (5.9×)** — what
remains is the batched numpy dequant/IDCT/color pipeline. A
production deployment with libjpeg available should still prefer a
PIL kernel (arithmetic-coded coverage).

PIL swap recipe (verbatim): in ``multimodal.decode_image_features``
and ``multimodal.resize_images``, replace the body of the FFD8 branch

    a = decode_jpeg(bytes(payload))

with

    import io
    from PIL import Image

    with Image.open(io.BytesIO(bytes(payload))) as im:
        a = _np.asarray(im.convert("RGB"))

and widen the surrounding ``except ValueError`` to
``except Exception`` (PIL raises ``UnidentifiedImageError``/``OSError``
where this module raises ``ValueError``). Nothing else changes: both
produce (h, w, 3) uint8, and every downstream feature/resize line is
shape-generic; PIL brings native-speed decode and arithmetic-coded
coverage, narrowing the strict-mode gate to MP3 alone.
"""

from __future__ import annotations

import struct

import numpy as np

# -- shared constants (ITU-T T.81 / JFIF, public spec) -----------------

#: zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

#: 8×8 DCT-II basis: C[u, x] = a(u)·cos((2x+1)uπ/16)
_DCT = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)

# Annex K example tables (the spec's own illustrative tables — also
# what libjpeg ships as its defaults), in zigzag order for DQT emission
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
])
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
])

# Annex K Huffman table specs: (BITS counts per code length 1..16, VALUES)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


class _HuffTable(dict):
    """(code_length, code_value) → symbol map, plus a lazily-built
    16-bit-peek LUT (symbol and length per 16-bit prefix) for the
    accumulator reader — one table lookup per symbol instead of up to
    16 per-bit loop iterations (measured ~4× on the entropy decode,
    r12). Subclasses dict so the encoder's inverse map and every
    existing ``.get``/``.items`` call keep working."""

    __slots__ = ("_lut", "_lut_np")

    def __init__(self, *a):
        super().__init__(*a)
        self._lut = None
        self._lut_np = None

    @property
    def lut(self):
        if self._lut is None:
            sym = [0] * 65536
            ln = [0] * 65536
            for (length, code), s in self.items():
                start = code << (16 - length)
                span = 1 << (16 - length)
                sym[start : start + span] = [s] * span
                ln[start : start + span] = [length] * span
            self._lut = (sym, ln)
        return self._lut

    @property
    def lut_np(self):
        """The peek-16 LUT as int32 arrays — the layout the native
        entropy kernel consumes (llm/native.py). Built directly with
        numpy slice assignments (one per code), NOT from the python
        list form: converting two 65536-element lists cost ~17 ms per
        image (tables are parsed fresh from each stream's DHT), which
        was a third of native-path decode wall. The python-list
        ``lut`` stays lazy and is only built when the python block
        loop actually runs."""
        if self._lut_np is None:
            sym = np.zeros(65536, dtype=np.int32)
            ln = np.zeros(65536, dtype=np.int32)
            for (length, code), s in self.items():
                start = code << (16 - length)
                span = 1 << (16 - length)
                sym[start : start + span] = s
                ln[start : start + span] = length
            self._lut_np = (sym, ln)
        return self._lut_np


def _huff_decode_map(bits: list[int], vals: list[int]) -> "_HuffTable":
    """(code_length, code_value) → symbol, per T.81 C.2 canonical code
    assignment (codes of each length are consecutive, shorter lengths
    first)."""
    out = _HuffTable()
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_encode_map(bits: list[int], vals: list[int]) -> dict:
    """symbol → (code_value, code_length) — the encoder's inverse."""
    return {sym: (code, ln) for (ln, code), sym in _huff_decode_map(bits, vals).items()}


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a ``size``-bit magnitude to its signed
    coefficient value."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment that has
    already been de-stuffed (FF00 → FF) and stripped of restart
    markers by the caller. Accumulator-based: symbols resolve with ONE
    peek-16 LUT lookup (the r12 rewrite of the per-bit loop — this is
    the decoder's hot path), bit fields with one shift+mask."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1  # keep the int small
        return v

    def read_bit(self) -> int:
        return self.read_bits(1)

    def read_symbol(self, table: "_HuffTable") -> int:
        sym_l, len_l = table.lut
        while self.nbits < 16 and self.pos < len(self.data):
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        if self.nbits >= 16:
            idx = (self.acc >> (self.nbits - 16)) & 0xFFFF
        else:
            # stream tail: pad the peek with 1s (T.81 F.1.2.3 padding);
            # a code longer than the REAL remaining bits is truncation
            pad = 16 - self.nbits
            idx = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFFFF
        length = len_l[idx]
        if length == 0:
            raise ValueError("invalid Huffman code in JPEG stream")
        if length > self.nbits:
            raise ValueError("truncated JPEG entropy stream")
        self.nbits -= length
        self.acc &= (1 << self.nbits) - 1
        return sym_l[idx]


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Dispatch an FFD8 payload to the right decoder by its SOF marker:
    SOF0/SOF1 → the baseline decoder here; SOF2 → the progressive
    decoder (llm/jpeg_progressive.py, r12). Anything else (arithmetic,
    lossless, hierarchical, 12-bit) raises ``ValueError`` like every
    other undecodable payload."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i, n = 2, len(payload)
    while i < n - 1:
        if payload[i] != 0xFF:
            raise ValueError(f"marker expected at offset {i}")
        marker = payload[i + 1]
        if marker in (0xC0, 0xC1):
            return decode_baseline_jpeg(payload)
        if marker == 0xC2:
            from dataworks_spark.llm.jpeg_progressive import decode_progressive_jpeg

            return decode_progressive_jpeg(payload)
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode SOF{marker - 0xC0} "
                "(baseline SOF0/SOF1 and progressive SOF2 only)"
            )
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9 or i + 4 > n:
            break
        i += 2 + ((payload[i + 2] << 8) | payload[i + 3])
    raise ValueError("no SOF marker in JPEG stream")


def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG to an ``(H, W, C)`` uint8 array
    (C = 1 grayscale / 3 RGB). Raises ``ValueError`` on ANYTHING that
    is not a well-formed baseline stream (progressive, arithmetic,
    12-bit, truncated, internally inconsistent) — the callers'
    non-strict contract maps exactly ValueError to a NULL row, so a
    malformed stream must never escape as IndexError/StopIteration and
    kill the task (r11 review: a truncated DHT raised IndexError out
    of _huff_decode_map, an SOS naming an unknown component raised
    StopIteration)."""
    try:
        return _decode_baseline_jpeg(payload)
    except ValueError:
        raise
    except (IndexError, KeyError, StopIteration, struct.error, OverflowError) as exc:
        raise ValueError(f"malformed JPEG stream: {type(exc).__name__}: {exc}") from exc


def _decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) → map
    frame = None  # (h, w, components)
    restart_interval = 0
    i = 2
    n = len(payload)
    while i < n - 1:
        if payload[i] != 0xFF:
            raise ValueError(f"marker expected at offset {i}")
        marker = payload[i + 1]
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 4 > n:
            raise ValueError("truncated JPEG header")
        seg_len = (payload[i + 2] << 8) | payload[i + 3]
        if i + 2 + seg_len > n:
            raise ValueError("truncated JPEG segment")
        seg = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT — one or more tables per segment
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                if prec == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                full = np.zeros((8, 8), dtype=np.int32)
                full[_ZZ_ROWS, _ZZ_COLS] = tbl
                qt[tid] = full
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(cls, tid)] = _huff_decode_map(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext. sequential
            if seg[0] != 8:
                raise ValueError("only 8-bit precision JPEG is supported")
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            nc = seg[5]
            comps = []
            for k in range(nc):
                cid = seg[6 + 3 * k]
                hv = seg[7 + 3 * k]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "q": seg[8 + 3 * k]})
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode SOF{marker - 0xC0} (baseline SOF0 only)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = []
            for k in range(ns):
                cid = seg[1 + 2 * k]
                tbls = seg[2 + 2 * k]
                comp = next(c for c in frame[2] if c["id"] == cid)
                scan.append((comp, tbls >> 4, tbls & 15))
            data_start = i + 2 + seg_len
            return _decode_scan(
                payload, data_start, frame, scan, qt, huff, restart_interval
            )
        # APPn / COM / others: skip
        i += 2 + seg_len
    raise ValueError("no SOS in JPEG stream")


def _entropy_segments(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """De-stuff one scan's entropy data into restart-delimited
    segments; returns (segments, offset of the terminating marker).

    r13: hops FF positions with ``bytes.find`` and slices the spans
    between them (the previous per-byte bytearray walk appended ~every
    byte of every scan — with ~10 scans per image it profiled at ~12%
    of decode; C-speed find/slice removes it)."""
    segments: list[bytes] = []
    parts: list[bytes] = []
    i = start
    n = len(payload)
    while True:
        j = payload.find(b"\xff", i)
        if j < 0:
            parts.append(payload[i:n])
            i = n
            break
        nxt = payload[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:
            parts.append(payload[i : j + 1])  # keep the FF, drop the 00
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:
            parts.append(payload[i:j])
            segments.append(b"".join(parts))
            parts = []
            i = j + 2
        else:
            parts.append(payload[i:j])
            i = j
            break  # next true marker ends the scan
    segments.append(b"".join(parts))
    return segments, min(i, n)


def _decode_scan_native(segments, scan, huff, qt, total_mcus, per_seg):
    """Entropy decode through the compiled segment kernel
    (llm/native.py jpeg_decode_segment), or ``None`` when no native
    path exists (the caller runs the python block loop). Matches the
    python loop exactly: same append order (MCU-major, scan order,
    v×h blocks per component — single-component scans use one block
    per MCU), DC predictors reset per restart segment, the same
    missing-segment / undefined-table / truncation / invalid-code /
    run-overflow ValueErrors. Returns {component id: (n_blocks, 64)
    int32 zigzag coefficients}."""
    from dataworks_spark.llm import native

    if native._load(native._JPEG_SEGMENT_SRC) is None:
        return None
    interleaved = len(scan) > 1
    for comp, dct, act in scan:
        if (
            huff.get((0, dct)) is None
            or huff.get((1, act)) is None
            or qt.get(comp["q"]) is None
        ):
            raise ValueError("JPEG scan references an undefined table")
    tables: list = []

    def _pool(tbl):
        for i, t in enumerate(tables):
            if t is tbl:
                return i
        tables.append(tbl)
        return len(tables) - 1

    dc_idx = np.array([_pool(huff[(0, dct)]) for _, dct, _ in scan], np.int32)
    ac_idx = np.array([_pool(huff[(1, act)]) for _, _, act in scan], np.int32)
    pool_sym = np.concatenate([t.lut_np[0] for t in tables])
    pool_len = np.concatenate([t.lut_np[1] for t in tables])
    nblk = np.array(
        [c["v"] * c["h"] if interleaved else 1 for c, _, _ in scan], np.int32
    )
    sum_blk = int(nblk.sum())
    parts: dict = {c["id"]: [] for c, _, _ in scan}
    mcu_done = 0
    seg_idx = 0
    while mcu_done < total_mcus:
        if seg_idx >= len(segments):
            raise ValueError("missing restart segment in JPEG stream")
        n_mcus = min(per_seg, total_mcus - mcu_done)
        preds = np.zeros(len(scan), np.int32)  # reset per restart segment
        out = np.zeros((n_mcus * sum_blk, 64), np.int32)
        rc = native.jpeg_decode_segment(
            segments[seg_idx], n_mcus, nblk, dc_idx, ac_idx,
            pool_sym, pool_len, preds, out,
        )
        if rc is None:  # pragma: no cover — loader raced to unavailable
            return None
        if rc != 0:
            raise ValueError(native.JPEG_SEGMENT_ERRORS[rc])
        blocks = out.reshape(n_mcus, sum_blk, 64)
        off = 0
        for (comp, _, _), nb in zip(scan, nblk.tolist()):
            parts[comp["id"]].append(blocks[:, off : off + nb, :].reshape(-1, 64))
            off += nb
        mcu_done += n_mcus
        seg_idx += 1
    return {cid: np.concatenate(p) for cid, p in parts.items()}


def _decode_scan(payload, start, frame, scan, qt, huff, restart_interval):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(scan) < len(comps):
        # T.81 allows baseline frames whose components arrive in
        # SEPARATE non-interleaved scans; supporting that needs
        # multi-SOS assembly this decoder doesn't do. Single-component
        # FRAMES (grayscale) take the len(scan)==1 path below.
        raise ValueError("non-interleaved multi-scan baseline JPEG is unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    if len(scan) == 1:
        # single-component scan: MCU = one block over the component's
        # own sampling grid (comp dims = ceil(dim · samp / sampmax))
        c = scan[0][0]
        cw = -(-w * c["h"] // hmax)
        chh = -(-h * c["v"] // vmax)
        mcux = -(-cw // 8)
        mcuy = -(-chh // 8)

    # de-stuff the entropy segment, recording restart boundaries —
    # the find/slice form shared with the progressive decoder (r14:
    # the per-byte bytearray walk was 824k appends on a 512×384 q85
    # image and profiled as HALF of native-path decode wall)
    segments, _ = _entropy_segments(payload, start)

    # per-component zigzag coefficient stores (block-major): the
    # entropy loop only APPENDS 64-vectors; dequantization and the
    # IDCT run once per component as ONE batched matmul afterwards —
    # per-block numpy calls were ~40% of decode wall (r12)
    dims = {
        c["id"]: ((mcuy * c["v"], mcux * c["h"]) if len(scan) > 1 else (mcuy, mcux))
        for c, _, _ in scan
    }
    total_mcus = mcux * mcuy
    per_seg = restart_interval if restart_interval else total_mcus
    # native C entropy kernel when a system compiler is available
    # (r14, the llm/native.py pattern's second consumer) — identical
    # bit semantics and errors, pinned by the differential tests
    coeffs = _decode_scan_native(segments, scan, huff, qt, total_mcus, per_seg)
    if coeffs is None:
        coeffs = {c["id"]: [] for c, _, _ in scan}
        pred = {c["id"]: 0 for c, _, _ in scan}
        mcu = 0
        seg_idx = 0
        reader = _BitReader(segments[0])
        while mcu < total_mcus:
            if restart_interval and mcu and mcu % per_seg == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing restart segment in JPEG stream")
                reader = _BitReader(segments[seg_idx])
                pred = {k: 0 for k in pred}
            for comp, dct, act in scan:
                ch, cv = (comp["h"], comp["v"]) if len(scan) > 1 else (1, 1)
                for _ in range(cv * ch):
                    coeffs[comp["id"]].append(
                        _decode_block(
                            reader, huff.get((0, dct)), huff.get((1, act)),
                            qt.get(comp["q"]), pred, comp["id"],
                        )
                    )
            mcu += 1

    # batched dequantize → inverse zigzag → IDCT → plane assembly,
    # then replicate chroma up to (h, w)
    out = []
    for comp in comps:
        bh, bw = dims[comp["id"]]
        zz = np.array(coeffs[comp["id"]], dtype=np.float64)  # (nblk, 64)
        q = qt[comp["q"]]
        deq = zz * q[_ZZ_ROWS, _ZZ_COLS][None, :]
        full = np.zeros((len(zz), 8, 8))
        full[:, _ZZ_ROWS, _ZZ_COLS] = deq
        spatial = _DCT.T @ full @ _DCT
        if len(scan) > 1 and (comp["h"] > 1 or comp["v"] > 1):
            # interleaved order: MCU-major, then v×h blocks per MCU
            cv, ch = comp["v"], comp["h"]
            spatial = (
                spatial.reshape(mcuy, mcux, cv, ch, 8, 8)
                .transpose(0, 2, 4, 1, 3, 5)
                .reshape(bh * 8, bw * 8)
            )
        else:
            spatial = (
                spatial.reshape(bh, bw, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(bh * 8, bw * 8)
            )
        p = spatial
        if len(scan) > 1:
            ry, rx = vmax // comp["v"], hmax // comp["h"]
            if ry > 1 or rx > 1:
                p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        img = np.clip(out[0] + 128.0, 0, 255).astype(np.uint8)
        return img[:, :, None]
    y, cb, cr = (o + 128.0 for o in out)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_tbl, ac_tbl, q, pred, cid):
    """Entropy-decode one block to its ZIGZAG coefficient list —
    dequantization and the IDCT happen batched per component in
    _decode_scan (r12: per-block numpy work dominated decode wall).

    r13: the symbol/value loop runs on LOCAL ints with the reader state
    written back once per block — after the r12 peek-16 LUT, attribute
    access and per-call overhead WERE the remaining entropy-decode cost
    (read_symbol/read_bits/_extend totalled ~60% of decode wall;
    measured ~1.8× whole-decode from this inlining alone). Semantics
    are bit-for-bit the reader's: same refills, same T.81 F.1.2.3
    tail padding on the symbol peek, same truncation errors, same
    F.2.2.1 EXTEND."""
    if dc_tbl is None or ac_tbl is None or q is None:
        raise ValueError("JPEG scan references an undefined table")
    data = reader.data
    ndata = len(data)
    pos = reader.pos
    acc = reader.acc
    nbits = reader.nbits
    sym_a, len_a = ac_tbl.lut
    sym_d, len_d = dc_tbl.lut
    coeffs = [0] * 64

    # DC: one symbol + t value bits, EXTENDed
    while nbits < 16 and pos < ndata:
        acc = (acc << 8) | data[pos]
        pos += 1
        nbits += 8
    if nbits >= 16:
        idx = (acc >> (nbits - 16)) & 0xFFFF
    else:
        pad = 16 - nbits
        idx = ((acc << pad) | ((1 << pad) - 1)) & 0xFFFF
    length = len_d[idx]
    if length == 0:
        raise ValueError("invalid Huffman code in JPEG stream")
    if length > nbits:
        raise ValueError("truncated JPEG entropy stream")
    nbits -= length
    acc &= (1 << nbits) - 1
    t = sym_d[idx]
    if t:
        while nbits < t:
            if pos >= ndata:
                raise ValueError("truncated JPEG entropy stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= t
        v = (acc >> nbits) & ((1 << t) - 1)
        acc &= (1 << nbits) - 1
        pred[cid] += v - (1 << t) + 1 if v < (1 << (t - 1)) else v
    coeffs[0] = pred[cid]

    k = 1
    while k < 64:
        while nbits < 16 and pos < ndata:
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        if nbits >= 16:
            idx = (acc >> (nbits - 16)) & 0xFFFF
        else:
            pad = 16 - nbits
            idx = ((acc << pad) | ((1 << pad) - 1)) & 0xFFFF
        length = len_a[idx]
        if length == 0:
            raise ValueError("invalid Huffman code in JPEG stream")
        if length > nbits:
            raise ValueError("truncated JPEG entropy stream")
        nbits -= length
        acc &= (1 << nbits) - 1
        rs = sym_a[idx]
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        while nbits < s:
            if pos >= ndata:
                raise ValueError("truncated JPEG entropy stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= s
        v = (acc >> nbits) & ((1 << s) - 1)
        acc &= (1 << nbits) - 1
        coeffs[k] = v - (1 << s) + 1 if v < (1 << (s - 1)) else v
        k += 1

    reader.pos = pos
    reader.acc = acc
    reader.nbits = nbits
    return coeffs


# -- encoder (fixtures / round-trip tests) ------------------------------

def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """Public IJG quality scaling."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s (T.81 F.1.2.3)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _size_of(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw, block, q, dc_map, ac_map, pred, cid):
    coeffs = _DCT @ block @ _DCT.T
    zz = np.round(coeffs[_ZZ_ROWS, _ZZ_COLS] / q[_ZZ_ROWS, _ZZ_COLS]).astype(np.int64)
    dc = int(zz[0])
    diff = dc - pred[cid]
    pred[cid] = dc
    s = _size_of(diff)
    code, ln = dc_map[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_map[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _size_of(v)
        code, ln = ac_map[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_map[0x00]  # EOB
        bw.write(code, ln)


def encode_baseline_jpeg(
    img: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """Encode an ``(H, W, 3)`` or ``(H, W)`` uint8 array as baseline
    JPEG (Annex K tables, IJG quality scaling; ``subsample=True`` emits
    4:2:0, else 4:4:4; grayscale input emits a one-component stream).
    Fixture/test encoder — favors clarity over speed."""
    img = np.asarray(img)
    gray = img.ndim == 2 or img.shape[2] == 1
    if gray:
        y = img.reshape(img.shape[0], img.shape[1]).astype(np.float64) - 128.0
        planes = [y]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    h, w = planes[0].shape
    ql = _scaled_q(_Q_LUMA, quality)
    qc = _scaled_q(_Q_CHROMA, quality)

    def pad_to(p, mult_y, mult_x):
        ph = -(-p.shape[0] // mult_y) * mult_y
        pw = -(-p.shape[1] // mult_x) * mult_x
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")

    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "q": 0, "plane": pad_to(planes[0], 8, 8)}]
    elif subsample:
        # 4:2:0 — chroma block-mean downsampled by 2
        cpad = [pad_to(p, 16, 16) for p in planes[1:]]
        sub = [p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3)) for p in cpad]
        comps = [
            {"id": 1, "h": 2, "v": 2, "q": 0, "plane": pad_to(planes[0], 16, 16)},
            {"id": 2, "h": 1, "v": 1, "q": 1, "plane": sub[0]},
            {"id": 3, "h": 1, "v": 1, "q": 1, "plane": sub[1]},
        ]
    else:
        comps = [
            {"id": 1, "h": 1, "v": 1, "q": 0, "plane": pad_to(planes[0], 8, 8)},
            {"id": 2, "h": 1, "v": 1, "q": 1, "plane": pad_to(planes[1], 8, 8)},
            {"id": 3, "h": 1, "v": 1, "q": 1, "plane": pad_to(planes[2], 8, 8)},
        ]

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    for tid, q in ((0, ql), (1, qc))[: 1 if gray else 2]:
        zz = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz
    nc = len(comps)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["q"]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    tables = [
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ] + ([] if gray else [
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ])
    for cls, tid, bits, vals in tables:
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    sos = bytes([nc])
    for c in comps:
        t = 0 if c["id"] == 1 else 1
        sos += bytes([c["id"], (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_l, ac_l = _huff_encode_map(_DC_LUMA_BITS, _DC_LUMA_VALS), _huff_encode_map(
        _AC_LUMA_BITS, _AC_LUMA_VALS
    )
    dc_c, ac_c = _huff_encode_map(_DC_CHROMA_BITS, _DC_CHROMA_VALS), _huff_encode_map(
        _AC_CHROMA_BITS, _AC_CHROMA_VALS
    )
    bw = _BitWriter()
    pred = {c["id"]: 0 for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for my in range(mcuy):
        for mx in range(mcux):
            for c in comps:
                q = ql if c["q"] == 0 else qc
                dcm, acm = (dc_l, ac_l) if c["id"] == 1 else (dc_c, ac_c)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        blk = c["plane"][y0 : y0 + 8, x0 : x0 + 8]
                        _encode_block(bw, blk, q, dcm, acm, pred, c["id"])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
