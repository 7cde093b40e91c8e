"""Progressive JPEG (ITU-T T.81 Annex G, Huffman) — closing the last
JPEG gate left by the baseline codec (llm/jpeg.py).

Progressive streams carry the SAME quantized DCT coefficients as a
sequential stream, split across multiple scans two ways (G.1.1):

* **spectral selection** — each scan carries one zigzag band
  [Ss, Se] of one component (DC scans may interleave components);
* **successive approximation** — a band arrives high-bits-first: the
  FIRST scan for a band sends the coefficients right-shifted by Al,
  and each REFINEMENT scan (Ah = Al+1 → Al) appends one magnitude bit
  per already-nonzero coefficient plus newly-significant ±1·2^Al
  values, with run lengths counted over zero-HISTORY positions only
  (G.1.2.3 — the intricate part of this module).

The decoder accumulates per-component coefficient arrays across scans
and reconstructs once at EOI (dequantize → inverse zigzag → the same
IDCT basis matmul the baseline decoder uses), so a progressive and a
baseline encoding of the same quantized coefficients decode to
BIT-IDENTICAL pixels — which is exactly how the tests anchor this
decoder against the independently-validated baseline path.

The matching fixture encoder emits the standard libjpeg scan script
(DC Al=1 interleaved → per-component AC first scans with successive
approximation → DC/AC refinement scans) so every decode path — EOB
runs spanning blocks, ZRL inside refinement scans, correction bits,
restart resets — is exercised by round-trips. Progressive scans need
EOBn symbols (0x10…0xE0) that the Annex K example tables do not
define, so the encoder ships flat 9-bit Huffman tables covering all
256 symbols (a valid canonical code: 256 of 512 nine-bit codewords,
all-ones never used — T.81 C.2); compression is mediocre but these
are fixtures, and the DECODER takes its tables from the stream's DHT
like any conforming reader.

Scale shape: same as llm/jpeg.py — a per-row Arrow-batch kernel;
payloads never leave the executor. The scan walks route through the
optional compiled kernel in llm/native.py when a system C compiler
exists (r14, bit-for-bit pinned with the python walks as the
fallback): 512×384 q85 4:2:0 A/B reads python 1.05 → native
**6.85 Mpx/s/core (6.6×)**. Reference parity note: the Clojure
reference has no image codecs; this serves the mandated multimodal
extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

from dataworks_spark.llm.jpeg import (
    _DCT,
    _ZZ_COLS,
    _ZZ_ROWS,
    _BitReader,
    _BitWriter,
    _extend,
    _huff_decode_map,
    _huff_encode_map,
    _Q_CHROMA,
    _Q_LUMA,
    _scaled_q,
    _entropy_segments,
    _size_of,
)

#: near-flat Huffman table over all 256 symbols (see module doc):
#: DHT length counts are single BYTES, so 256 can't sit at one length —
#: 255 nine-bit codes + one ten-bit code (code 510, never all-ones)
_FLAT_BITS = [0] * 16
_FLAT_BITS[8] = 255  # lengths are 1-indexed: index 8 = length 9
_FLAT_BITS[9] = 1
_FLAT_VALS = list(range(256))


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_progressive_jpeg(payload: bytes) -> np.ndarray:
    """Decode a progressive (SOF2, Huffman) JPEG to ``(H, W, C)`` uint8
    (C = 1 grayscale / 3 RGB). Raises ``ValueError`` on anything that
    is not a well-formed progressive stream — same error contract as
    the baseline decoder (non-strict callers map it to a NULL row)."""
    try:
        return _decode_progressive(payload)
    except ValueError:
        raise
    except (IndexError, KeyError, StopIteration, struct.error, OverflowError) as exc:
        raise ValueError(
            f"malformed progressive JPEG: {type(exc).__name__}: {exc}"
        ) from exc


def _decode_progressive(payload: bytes) -> np.ndarray:
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    coeff: dict[int, np.ndarray] = {}  # cid → (by, bx, 64) int32 zigzag
    eobrun = 0  # persists across blocks WITHIN a scan
    i = 2
    n = len(payload)
    saw_scan = False
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
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                if prec == 0:
                    qt[tid] = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.int32)
                    p += 64
                else:
                    qt[tid] = np.frombuffer(seg[p : p + 128], ">u2").astype(np.int32)
                    p += 128
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(cls, tid)] = _huff_decode_map(bits, vals)
                p += 17 + nv
        elif marker == 0xC2:  # SOF2 — progressive DCT, Huffman
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
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                # padded to the interleaved MCU grid; non-interleaved
                # scans visit only the component's own ceil-block grid
                c["bw_mcu"], c["bh_mcu"] = mcux * c["h"], mcuy * c["v"]
                cw = -(-w * c["h"] // hmax)
                chh = -(-h * c["v"] // vmax)
                c["bw"], c["bh"] = -(-cw // 8), -(-chh // 8)
                coeff[c["id"]] = np.zeros(
                    (c["bh_mcu"], c["bw_mcu"], 64), dtype=np.int32
                )
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"not a progressive stream (SOF{marker - 0xC0}); use the "
                "baseline decoder or the decode_jpeg dispatcher"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF2")
            ns = seg[0]
            scomps = []
            for k in range(ns):
                cid = seg[1 + 2 * k]
                tbls = seg[2 + 2 * k]
                comp = next(c for c in frame[2] if c["id"] == cid)
                scomps.append((comp, tbls >> 4, tbls & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if not (0 <= ss <= se <= 63):
                raise ValueError(f"illegal spectral band [{ss}, {se}]")
            if ss == 0 and se != 0:
                raise ValueError("progressive scan mixes DC and AC")
            if ss > 0 and ns != 1:
                raise ValueError("progressive AC scan must be single-component")
            data_start = i + 2 + seg_len
            i = _decode_one_scan(
                payload, data_start, frame, scomps, (ss, se, ah, al),
                huff, coeff, restart_interval,
            )
            saw_scan = True
            continue
        i += 2 + seg_len
    if frame is None or not saw_scan:
        raise ValueError("no SOF2/SOS in progressive JPEG stream")
    return _reconstruct(frame, coeff, qt)


def _decode_one_scan(payload, start, frame, scomps, band, huff, coeff,
                     restart_interval):
    h, w, comps = frame
    ss, se, ah, al = band
    segments, end = _entropy_segments(payload, start)

    # scan geometry: interleaved (ns > 1) walks the MCU grid with each
    # component contributing h×v blocks per MCU; single-component scans
    # walk that component's own block grid one block per "MCU"
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(scomps) > 1:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        units = [
            (c, dc_t, ac_t, c["h"], c["v"]) for (c, dc_t, ac_t) in scomps
        ]
    else:
        c, dc_t, ac_t = scomps[0]
        mcux, mcuy = c["bw"], c["bh"]
        units = [(c, dc_t, ac_t, 1, 1)]

    total_mcus = mcux * mcuy
    per_seg = restart_interval if restart_interval else total_mcus
    # native C scan kernel when a system compiler is available (r14 —
    # llm/native.py's third consumer): identical bit semantics and
    # errors, pinned by the pixel-identity differential tests
    if _decode_scan_segments_native(
        segments, units, band, huff, coeff, total_mcus, per_seg, mcux
    ):
        return end
    pred = {c["id"]: 0 for c, *_ in scomps}
    state = {"eobrun": 0}
    seg_idx = 0
    reader = _BitReader(segments[0])
    mcu = 0
    while mcu < total_mcus:
        if restart_interval and mcu and mcu % per_seg == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment in progressive scan")
            reader = _BitReader(segments[seg_idx])
            pred = {k: 0 for k in pred}
            state["eobrun"] = 0
        my, mx = divmod(mcu, mcux)
        for comp, dc_t, ac_t, ch, cv in units:
            blocks = coeff[comp["id"]]
            for by in range(cv):
                for bx in range(ch):
                    if len(scomps) > 1:
                        ry, rx = my * cv + by, mx * ch + bx
                    else:
                        ry, rx = my, mx
                    blk = blocks[ry, rx]
                    if ss == 0:
                        if ah == 0:
                            t = reader.read_symbol(huff_get(huff, 0, dc_t))
                            diff = _extend(reader.read_bits(t), t) if t else 0
                            pred[comp["id"]] += diff
                            blk[0] = pred[comp["id"]] << al
                        else:  # DC refinement: one raw bit per block
                            if reader.read_bit():
                                blk[0] |= 1 << al
                    else:
                        if ah == 0:
                            _ac_first(reader, huff_get(huff, 1, ac_t), blk,
                                      ss, se, al, state)
                        else:
                            _ac_refine(reader, huff_get(huff, 1, ac_t), blk,
                                       ss, se, al, state)
        mcu += 1
    return end


def _decode_scan_segments_native(
    segments, units, band, huff, coeff, total_mcus, per_seg, mcux
):
    """Run the scan's restart segments through the compiled kernel
    (llm/native.py jpeg_prog_segment); returns True when decoded
    natively, False when no native path exists (the caller runs the
    python walk). Semantics mirror the python loop exactly: DC
    predictors and the EOB run reset per restart segment, the same
    missing-segment / undefined-table errors, coefficients written in
    place in the same order. Only the table class a scan type actually
    reads is resolved (DC-refinement scans read raw bits — no table),
    matching huff_get's lazy error behavior."""
    import numpy as np

    from dataworks_spark.llm import native

    if native._load(native._JPEG_PROG_SRC) is None:
        return False
    ss, se, ah, al = band
    tables: list = []

    def _pool(tbl):
        for i, t in enumerate(tables):
            if t is tbl:
                return i
        tables.append(tbl)
        return len(tables) - 1

    nunits = len(units)
    dc_idx = np.zeros(nunits, np.int32)
    ac_idx = np.zeros(nunits, np.int32)
    for u, (comp, dc_t, ac_t, ch_u, cv_u) in enumerate(units):
        if ss == 0 and ah == 0:
            dc_idx[u] = _pool(huff_get(huff, 0, dc_t))
        if ss > 0:
            ac_idx[u] = _pool(huff_get(huff, 1, ac_t))
    if tables:
        pool_sym = np.concatenate([t.lut_np[0] for t in tables])
        pool_len = np.concatenate([t.lut_np[1] for t in tables])
    else:  # DC refinement: raw bits only, no Huffman table touched
        pool_sym = np.zeros(65536, np.int32)
        pool_len = np.zeros(65536, np.int32)
    ch = np.array([u[3] for u in units], np.int32)
    cv = np.array([u[4] for u in units], np.int32)
    grids = [coeff[u[0]["id"]] for u in units]
    for g in grids:
        assert g.flags["C_CONTIGUOUS"] and g.dtype == np.int32
    bw = np.array([g.shape[1] for g in grids], np.int32)
    addrs = np.array([g.ctypes.data for g in grids], np.uint64)
    mcu_done = 0
    seg_idx = 0
    while mcu_done < total_mcus:
        if seg_idx >= len(segments):
            raise ValueError("missing restart segment in progressive scan")
        n_mcus = min(per_seg, total_mcus - mcu_done)
        preds = np.zeros(nunits, np.int32)  # reset per restart segment
        eob = np.zeros(1, np.int64)
        rc = native.jpeg_prog_segment(
            segments[seg_idx], mcu_done, n_mcus, mcux, band,
            ch, cv, bw, addrs, dc_idx, ac_idx, pool_sym, pool_len,
            preds, eob,
        )
        if rc is None:  # pragma: no cover — loader raced to unavailable
            return False
        if rc != 0:
            raise ValueError(native.JPEG_PROG_ERRORS[rc])
        mcu_done += n_mcus
        seg_idx += 1
    return True


def huff_get(huff, cls, tid):
    tbl = huff.get((cls, tid))
    if tbl is None:
        raise ValueError("progressive scan references an undefined table")
    return tbl


def _ac_first(reader, tbl, blk, ss, se, al, state):
    """G.1.2.2: first scan for an AC band — baseline-style (run, size)
    with EOBn symbols whose runs span BLOCKS.

    r13: symbol/value decode inlined on LOCAL ints, reader state
    written back once per block — the same measured trade as the
    baseline _decode_block (attribute access and call overhead were
    the cost after the r12 peek-16 LUT). Semantics bit-for-bit:
    same refills, same T.81 tail padding, same truncation errors."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    data = reader.data
    ndata = len(data)
    pos = reader.pos
    acc = reader.acc
    nbits = reader.nbits
    sym_l, len_l = tbl.lut
    k = ss
    while k <= se:
        while nbits < 16 and pos < ndata:
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        if nbits >= 16:
            idx = (acc >> (nbits - 16)) & 0xFFFF
        else:
            pad = 16 - nbits
            idx = ((acc << pad) | ((1 << pad) - 1)) & 0xFFFF
        length = len_l[idx]
        if length == 0:
            raise ValueError("invalid Huffman code in JPEG stream")
        if length > nbits:
            raise ValueError("truncated JPEG entropy stream")
        nbits -= length
        acc &= (1 << nbits) - 1
        rs = sym_l[idx]
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:  # EOBn
                eob = (1 << r) - 1
                if r:
                    while nbits < r:
                        if pos >= ndata:
                            raise ValueError("truncated JPEG entropy stream")
                        acc = (acc << 8) | data[pos]
                        pos += 1
                        nbits += 8
                    nbits -= r
                    eob += (acc >> nbits) & ((1 << r) - 1)
                    acc &= (1 << nbits) - 1
                state["eobrun"] = eob
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past spectral band")
        while nbits < s:
            if pos >= ndata:
                raise ValueError("truncated JPEG entropy stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= s
        v = (acc >> nbits) & ((1 << s) - 1)
        acc &= (1 << nbits) - 1
        blk[k] = (v - (1 << s) + 1 if v < (1 << (s - 1)) else v) << al
        k += 1
    reader.pos = pos
    reader.acc = acc
    reader.nbits = nbits


def _refine_correct_span(reader, blk, lo, hi, p1, m1):
    """Correction-bit sweep over [lo, hi]: one appended bit per
    NONZERO-history coefficient, 1 → step the magnitude by 2^Al.
    The EOB-run fast path (r12 VERDICT #5): np.nonzero finds the
    positions that owe a bit, so the sweep costs O(#nonzero) instead of
    walking all 63 band positions per block — and blocks whose band is
    still all-zero (the common case deep in an EOB run) cost one
    vectorized scan and zero bit reads."""
    sl = blk[lo : hi + 1]
    for j in np.nonzero(sl)[0].tolist():
        if reader.read_bit() and (sl[j] & p1) == 0:
            sl[j] += p1 if sl[j] > 0 else m1


def _ac_refine(reader, tbl, blk, ss, se, al, state):
    """G.1.2.3: refinement scan for an AC band — newly-significant
    coefficients arrive as ±2^Al with runs counted over ZERO-HISTORY
    positions; every nonzero-history coefficient passed on the way
    contributes one correction bit. Control flow mirrors the spec's
    decode procedure (and libjpeg's decode_mcu_AC_refine): the inner
    advance consumes corrections at nonzero positions, spends the run
    at zero positions, and the position that TERMINATES the run (new
    value placed, or a ZRL's 16th zero) is itself consumed.

    Perf shape (r13): blocks fully inside an EOB run take the
    :func:`_refine_correct_span` fast path; the symbol-driven walk
    copies the band to a plain list first (python-int scalar access is
    ~10× a numpy scalar read at this granularity — the same measured
    trade as the PNG unfilter loops) and writes it back once."""
    p1, m1 = 1 << al, -1 << al
    if state["eobrun"] > 0:
        _refine_correct_span(reader, blk, ss, se, p1, m1)
        state["eobrun"] -= 1
        return

    # symbol/bit decode inlined on LOCAL ints (r13, same trade as
    # _decode_block/_ac_first): this walk is the dense-image hot path —
    # one symbol per (run, value) plus one raw bit per nonzero passed
    data = reader.data
    ndata = len(data)
    pos = reader.pos
    acc = reader.acc
    nbits = reader.nbits
    sym_l, len_l = tbl.lut
    vals = blk[ss : se + 1].tolist()
    n = se - ss + 1
    k = 0
    while k < n:
        while nbits < 16 and pos < ndata:
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        if nbits >= 16:
            idx = (acc >> (nbits - 16)) & 0xFFFF
        else:
            pad = 16 - nbits
            idx = ((acc << pad) | ((1 << pad) - 1)) & 0xFFFF
        length = len_l[idx]
        if length == 0:
            raise ValueError("invalid Huffman code in JPEG stream")
        if length > nbits:
            raise ValueError("truncated JPEG entropy stream")
        nbits -= length
        acc &= (1 << nbits) - 1
        rs = sym_l[idx]
        r, s = rs >> 4, rs & 15
        val = 0
        if s:
            if s != 1:
                raise ValueError("refinement scan size code must be 1")
            if nbits == 0:
                if pos >= ndata:
                    raise ValueError("truncated JPEG entropy stream")
                acc = data[pos]
                pos += 1
                nbits = 8
            nbits -= 1
            val = p1 if (acc >> nbits) & 1 else m1
            acc &= (1 << nbits) - 1
        else:
            if r != 15:  # EOBn: corrections continue below
                eob = 1 << r
                if r:
                    while nbits < r:
                        if pos >= ndata:
                            raise ValueError("truncated JPEG entropy stream")
                        acc = (acc << 8) | data[pos]
                        pos += 1
                        nbits += 8
                    nbits -= r
                    eob += (acc >> nbits) & ((1 << r) - 1)
                    acc &= (1 << nbits) - 1
                state["eobrun"] = eob
                break
            # ZRL: skip 16 zero-history positions (with corrections)
        while k < n:
            v = vals[k]
            if v != 0:
                # one appended bit per nonzero coefficient passed
                if nbits == 0:
                    if pos >= ndata:
                        raise ValueError("truncated JPEG entropy stream")
                    acc = data[pos]
                    pos += 1
                    nbits = 8
                nbits -= 1
                b = (acc >> nbits) & 1
                acc &= (1 << nbits) - 1
                if b and (v & p1) == 0:
                    vals[k] = v + (p1 if v > 0 else m1)
            else:
                if r == 0:
                    if val:
                        vals[k] = val
                    k += 1  # the terminating position is consumed
                    break
                r -= 1
            k += 1
    if state["eobrun"] > 0:
        # EOBn hit mid-block: only correction bits for the remainder
        i = k
        while i < n:
            v = vals[i]
            if v != 0:
                if nbits == 0:
                    if pos >= ndata:
                        raise ValueError("truncated JPEG entropy stream")
                    acc = data[pos]
                    pos += 1
                    nbits = 8
                nbits -= 1
                b = (acc >> nbits) & 1
                acc &= (1 << nbits) - 1
                if b and (v & p1) == 0:
                    vals[i] = v + (p1 if v > 0 else m1)
            i += 1
        state["eobrun"] -= 1
    blk[ss : se + 1] = vals
    reader.pos = pos
    reader.acc = acc
    reader.nbits = nbits


def _reconstruct(frame, coeff, qt):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    for c in comps:
        q = qt.get(c["q"])
        if q is None:
            raise ValueError("frame references an undefined quantization table")
        blocks = coeff[c["id"]].astype(np.float64)  # (bh, bw, 64) zigzag
        bh, bw = blocks.shape[:2]
        deq = blocks * q[None, None, :]
        full = np.zeros((bh, bw, 8, 8))
        full[:, :, _ZZ_ROWS, _ZZ_COLS] = deq
        spatial = _DCT.T @ full @ _DCT  # broadcast over (bh, bw)
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        return np.clip(out[0] + 128.0, 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = (o + 128.0 for o in out)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encode (fixtures / round-trip tests)
# ---------------------------------------------------------------------------

class _ScanWriter:
    """Per-scan entropy writer with the progressive extras: EOB-run
    accumulation and (for refinement scans) the ``be`` buffer of
    correction bits belonging to blocks inside the pending EOB run,
    flushed together with the EOBn symbol."""

    def __init__(self, enc_map):
        self.bw = _BitWriter()
        self.map = enc_map
        self.eobrun = 0
        self.be: list[int] = []  # buffered with the pending EOB run

    def sym(self, s):
        code, ln = self.map[s]
        self.bw.write(code, ln)

    def bits(self, v, n):
        if n:
            self.bw.write(v, n)

    def flush_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            self.bits(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
            for b in self.be:
                self.bw.write(b, 1)
            self.be = []

    def end_block_in_eob(self):
        """The block ended in trailing zeros — it joins the pending
        EOB run."""
        self.eobrun += 1
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()

    def finish(self) -> bytes:
        self.flush_eobrun()
        self.bw.flush()
        return bytes(self.bw.out)


def _enc_dc_first(sw, blocks_iter, al, pred):
    for cid, blk in blocks_iter:
        t = int(blk[0]) >> al  # arithmetic shift, per G.1.2.1
        diff = t - pred[cid]
        pred[cid] = t
        s = _size_of(diff)
        sw.sym(s)
        sw.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _enc_dc_refine(sw, blocks_iter, al):
    for _cid, blk in blocks_iter:
        sw.bits((int(blk[0]) >> al) & 1, 1)


def _enc_ac_first(sw, blk, ss, se, al):
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = abs(v) >> al  # magnitude shift, per G.1.2.2
        if t == 0:
            r += 1
            continue
        sw.flush_eobrun()
        while r > 15:
            sw.sym(0xF0)
            r -= 16
        s = t.bit_length()
        sw.sym((r << 4) | s)
        sw.bits(t if v >= 0 else (-t) + (1 << s) - 1, s)
        r = 0
    if r > 0:  # block ends in zeros → joins/extends the EOB run
        sw.end_block_in_eob()


def _enc_ac_refine(sw, blk, ss, se, al):
    """Emit one block of an AC refinement scan by SIMULATING the
    decoder's cursor walk, so every correction bit lands exactly where
    the decoder's advance loop will consume it — in particular across
    multi-ZRL runs, where a lazily-flushed buffer would put span-2
    corrections before the second ZRL symbol."""
    t = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    n = len(t)

    def corrections(a, b):  # bits for already-significant positions in [a, b)
        for tv in t[a:b]:
            if tv > 1:
                sw.bits(tv & 1, 1)

    cursor = 0
    for kn in (i for i, tv in enumerate(t) if tv == 1):  # newly significant
        r = sum(1 for tv in t[cursor:kn] if tv == 0)
        while r > 15:
            sw.flush_eobrun()
            sw.sym(0xF0)
            # the decoder's ZRL advance consumes corrections up to and
            # including its 16th zero-history position
            cnt, p = 0, cursor
            while True:
                if t[p] == 0:
                    cnt += 1
                    if cnt == 16:
                        break
                p += 1
            corrections(cursor, p + 1)
            cursor = p + 1
            r -= 16
        sw.flush_eobrun()
        sw.sym((r << 4) | 1)
        sw.bits(1 if int(blk[ss + kn]) >= 0 else 0, 1)
        corrections(cursor, kn)
        cursor = kn + 1
    if cursor < n:
        # band has a tail the decoder only reaches via an EOB run —
        # this block joins it, with its tail corrections buffered
        sw.eobrun += 1
        sw.be.extend(tv & 1 for tv in t[cursor:n] if tv > 1)
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def encode_progressive_jpeg(
    img: np.ndarray, quality: int = 85, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode ``(H, W, 3)`` / ``(H, W)`` uint8 as a progressive JPEG
    carrying the SAME quantized coefficients the baseline encoder
    would emit at this quality — so its decode is pixel-identical to
    the baseline round-trip (the tests' differential anchor). Scan
    script: the standard libjpeg progression (successive-approximation
    DC, split AC bands at Al>0, then refinements), which exercises
    every decoder path."""
    img = np.asarray(img)
    gray = img.ndim == 2 or img.shape[2] == 1
    if gray:
        planes = [img.reshape(img.shape[0], img.shape[1]).astype(np.float64) - 128.0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b - 128.0,
            -0.168736 * r - 0.331264 * g + 0.5 * b,
            0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    h, w = planes[0].shape
    ql = _scaled_q(_Q_LUMA, quality)
    qc = _scaled_q(_Q_CHROMA, quality)

    def pad_to(p, my, mx):
        ph = -(-p.shape[0] // my) * my
        pw = -(-p.shape[1] // mx) * mx
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")

    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "q": 0, "plane": pad_to(planes[0], 8, 8)}]
    elif subsample:
        cpad = [pad_to(p, 16, 16) for p in planes[1:]]
        sub = [p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
               for p in cpad]
        comps = [
            {"id": 1, "h": 2, "v": 2, "q": 0, "plane": pad_to(planes[0], 16, 16)},
            {"id": 2, "h": 1, "v": 1, "q": 1, "plane": sub[0]},
            {"id": 3, "h": 1, "v": 1, "q": 1, "plane": sub[1]},
        ]
    else:
        comps = [
            {"id": k + 1, "h": 1, "v": 1, "q": min(k, 1), "plane": pad_to(p, 8, 8)}
            for k, p in enumerate(planes)
        ]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # quantized zigzag coefficients, padded to the interleaved MCU grid
    for c in comps:
        q = ql if c["q"] == 0 else qc
        qzz = q[_ZZ_ROWS, _ZZ_COLS].astype(np.float64)
        bh, bw = mcuy * c["v"], mcux * c["h"]
        # extend the (already 8-padded) plane to the MCU grid
        plane = np.pad(
            c["plane"],
            ((0, bh * 8 - c["plane"].shape[0]), (0, bw * 8 - c["plane"].shape[1])),
            mode="edge",
        )
        blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        co = _DCT @ blocks @ _DCT.T
        zz = np.round(co[:, :, _ZZ_ROWS, _ZZ_COLS] / qzz).astype(np.int64)
        c["zz"] = zz
        cw = -(-w * c["h"] // hmax)
        chh = -(-h * c["v"] // vmax)
        c["bw"], c["bh"] = -(-cw // 8), -(-chh // 8)

    # headers
    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    for tid, q in ((0, ql), (1, qc))[: 1 if gray else 2]:
        zzb = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zzb
    nc = len(comps)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["q"]])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    for cls in (0, 1):  # flat tables, id 0, shared by every component
        body = bytes([(cls << 4) | 0]) + bytes(_FLAT_BITS) + bytes(_FLAT_VALS)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    enc_map = _huff_encode_map(_FLAT_BITS, _FLAT_VALS)

    def sos_header(scomps, ss, se, ah, al):
        sos = bytes([len(scomps)])
        for c in scomps:
            sos += bytes([c["id"], 0x00])  # DC table 0 / AC table 0
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    def restart(sw, idx, rst):
        # RSTn every restart_interval MCUs: byte-align, emit the
        # marker (markers are never stuffed), reset entropy state
        if restart_interval and idx and idx % restart_interval == 0:
            sw.flush_eobrun()
            sw.bw.flush()
            sw.bw.out += bytes([0xFF, 0xD0 + (rst[0] % 8)])
            rst[0] += 1
            return True
        return False

    def dc_scan(ah, al):
        sw = _ScanWriter(enc_map)
        pred = {c["id"]: 0 for c in comps}
        rst = [0]
        for my in range(mcuy):
            for mx in range(mcux):
                if restart(sw, my * mcux + mx, rst):
                    pred = {c["id"]: 0 for c in comps}
                blocks = []
                for c in comps:
                    for by in range(c["v"] if nc > 1 else 1):
                        for bx in range(c["h"] if nc > 1 else 1):
                            blocks.append(
                                (c["id"], c["zz"][my * c["v"] + by, mx * c["h"] + bx])
                            )
                if ah == 0:
                    _enc_dc_first(sw, blocks, al, pred)
                else:
                    _enc_dc_refine(sw, blocks, al)
        return sos_header(comps, 0, 0, ah, al) + sw.finish()

    def ac_scan(c, ss, se, ah, al):
        sw = _ScanWriter(enc_map)
        rst = [0]
        for ry in range(c["bh"]):
            for rx in range(c["bw"]):
                restart(sw, ry * c["bw"] + rx, rst)
                blk = c["zz"][ry, rx]
                if ah == 0:
                    _enc_ac_first(sw, blk, ss, se, al)
                else:
                    _enc_ac_refine(sw, blk, ss, se, al)
        return sos_header([c], ss, se, ah, al) + sw.finish()

    # the standard libjpeg simple progression
    y = comps[0]
    out += dc_scan(0, 1)
    if gray:
        out += ac_scan(y, 1, 63, 0, 1)
        out += dc_scan(1, 0)
        out += ac_scan(y, 1, 63, 1, 0)
    else:
        cb, cr = comps[1], comps[2]
        out += ac_scan(y, 1, 5, 0, 2)
        out += ac_scan(cb, 1, 63, 0, 1)
        out += ac_scan(cr, 1, 63, 0, 1)
        out += ac_scan(y, 6, 63, 0, 2)
        out += ac_scan(y, 1, 63, 2, 1)   # AC refine 2→1
        out += dc_scan(1, 0)             # DC refine
        out += ac_scan(cb, 1, 63, 1, 0)
        out += ac_scan(cr, 1, 63, 1, 0)
        out += ac_scan(y, 1, 63, 1, 0)   # AC refine 1→0
    out += b"\xff\xd9"
    return bytes(out)
