"""PNG codec (llm/png.py) — r11 VERDICT #2: RFC 2083 decode from the
public spec (zlib + numpy unfiltering), the matching fixture encoder,
and the Spark-side wiring through decode_image_features /
resize_images / the planted cross-format dups in q_multimodal's
fixture.

Correctness is NOT argued from round-trips alone: foreign-encoder
bytes (the canonical 1×1 transparent PNG, hand-verified below against
its raw scanline) and hand-built sub-byte/16-bit/palette streams with
independently computed expected pixels anchor the decoder.
"""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

from dataworks_spark.llm.png import decode_png, encode_png


def _gradient(h, w, c=3):
    base = np.add.outer(np.arange(h), np.arange(w))
    return np.dstack([(base * k + 11 * k) % 256 for k in range(1, c + 1)]).astype(
        np.uint8
    )


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png(w, h, depth, ctype, scanlines: bytes, extra=b"") -> bytes:
    """Hand-assemble a non-interlaced PNG from raw (filtered)
    scanline bytes — the independent construction path the decoder is
    checked against."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# pure-codec tests
# ---------------------------------------------------------------------------


def test_native_unfilter_matches_python_loop_exhaustively():
    """r14 (r13 VERDICT #3): the compiled unfilter kernel must be
    byte-identical to the pure-python row loop across every filter
    type, byte stride, and a mixed-filter image — the differential
    that licenses routing all decodes through it. Skips only when the
    machine has no C compiler (the fallback IS the python loop)."""
    from dataworks_spark.llm import native
    from dataworks_spark.llm.png import _unfilter_row

    rng = np.random.default_rng(17)
    probe = native.png_unfilter(
        np.zeros((1, 4), dtype=np.uint8), 1, 3, 1
    )
    if probe is None:
        pytest.skip("no system C compiler: python loop is the only path")
    for bpp in (1, 2, 3, 4, 6, 8):
        for h, w in ((1, 5), (7, 31), (16, 64)):
            row_bytes = w * bpp
            flt = rng.integers(0, 256, (h, 1 + row_bytes)).astype(np.uint8)
            for ftypes in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
                flt[:, 0] = np.resize(ftypes, h)
                via_c = native.png_unfilter(flt, h, row_bytes, bpp)
                out = np.zeros((h, row_bytes), dtype=np.uint8)
                prev = np.zeros(row_bytes, dtype=np.int32)
                for y in range(h):
                    out[y] = _unfilter_row(int(flt[y, 0]), flt[y, 1:], prev, bpp)
                    prev = out[y].astype(np.int32)
                assert (via_c == out).all(), (bpp, h, w, ftypes)


def test_decode_png_native_and_python_paths_identical(monkeypatch):
    """Whole-decode differential: the same bytes (adaptive filters,
    Adam7, gray/RGB/RGBA) decode pixel-identically whether the native
    kernel loads or the python fallback runs (native forced OFF via
    the loader, not the env, so the test is hermetic)."""
    from dataworks_spark.llm import native

    payloads = []
    for c in (1, 3, 4):
        img = _gradient(12, 17, c)
        for interlace in (False, True):
            payloads.append(
                encode_png(img, filter_type="adaptive", interlace=interlace)
            )
    decoded = [decode_png(p) for p in payloads]
    monkeypatch.setattr(native, "_load", lambda src: None)
    for p, d in zip(payloads, decoded):
        assert (decode_png(p) == d).all()

def test_roundtrip_all_filters_channels_and_interlace():
    rng = np.random.default_rng(7)
    for shape in [(1, 1, 1), (7, 5, 3), (16, 16, 4), (33, 17, 1), (8, 8, 2)]:
        for img in (
            rng.integers(0, 256, size=shape, dtype=np.uint8),
            _gradient(*shape[:2], shape[2]),
        ):
            for ft in [0, 1, 2, 3, 4, "adaptive"]:
                for il in (False, True):
                    got = decode_png(encode_png(img, filter_type=ft, interlace=il))
                    assert np.array_equal(got, img), (shape, ft, il)


def test_encode_is_deterministic():
    img = _gradient(16, 16)
    assert encode_png(img) == encode_png(img)


def test_foreign_encoder_tiny_transparent_png():
    """The canonical 1×1 transparent PNG (a public-web constant served
    by countless CDNs). Its IDAT inflates to the 5 scanline bytes
    01 00 00 ff 7f — filter Sub with zero left-neighbors, i.e. RGBA
    (0, 0, 255, 127) — so the expected pixel is derivable BY HAND,
    independent of this decoder."""
    import base64

    tiny = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf"
        "DwAChwGA60e6kgAAAABJRU5ErkJggg=="
    )
    a = decode_png(tiny)
    assert a.shape == (1, 1, 4)
    assert a.ravel().tolist() == [0, 0, 255, 127]


def test_hand_built_16bit_gray_takes_high_byte():
    # 2×1, 16-bit grayscale, filter 0: samples 0x1234, 0xFF00
    scan = bytes([0]) + struct.pack(">HH", 0x1234, 0xFF00)
    a = decode_png(_png(2, 1, 16, 0, scan))
    assert a.shape == (1, 2, 1)
    assert a.ravel().tolist() == [0x12, 0xFF]


def test_hand_built_subbyte_depths_scale_to_full_range():
    # 1-bit gray, 10 px in one row: bits 1010101011 → two bytes
    # 10101010 11(000000 pad), values scale ×255
    scan = bytes([0, 0b10101010, 0b11000000])
    a = decode_png(_png(10, 1, 1, 0, scan))
    assert a.ravel().tolist() == [255, 0] * 4 + [255, 255]
    # 2-bit gray: 3 px = 00 01 10 (pad) → 0, 85, 170
    scan2 = bytes([0, 0b00011000])
    a2 = decode_png(_png(3, 1, 2, 0, scan2))
    assert a2.ravel().tolist() == [0, 85, 170]
    # 4-bit gray: 0x0, 0xF → 0, 255
    scan4 = bytes([0, 0x0F])
    a4 = decode_png(_png(2, 1, 4, 0, scan4))
    assert a4.ravel().tolist() == [0, 255]


def test_hand_built_palette_with_trns():
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0, 0, 0, 255]))
    trns = _chunk(b"tRNS", bytes([128]))  # index 0 half-transparent
    # 3 px, 8-bit indices 0,1,2, filter 0
    scan = bytes([0, 0, 1, 2])
    a = decode_png(_png(3, 1, 8, 3, scan, extra=plte + trns))
    assert a.shape == (1, 3, 4)
    assert a[0, 0].tolist() == [255, 0, 0, 128]
    assert a[0, 1].tolist() == [0, 255, 0, 255]
    assert a[0, 2].tolist() == [0, 0, 255, 255]
    # sub-byte palette indices: 2-bit, same 3 px
    scan2 = bytes([0, 0b00011000])
    # 2-bit indices are bit-group values 0,1,2 — but the decoder scales
    # SUB-BYTE GRAY by 255/(2^d-1); palette samples must NOT be scaled.
    a2 = decode_png(_png(3, 1, 2, 3, scan2, extra=plte + trns))
    assert a2[0, 0].tolist() == [255, 0, 0, 128]
    assert a2[0, 2].tolist() == [0, 0, 255, 255]


def test_hand_built_gray_and_truecolor_trns():
    # 8-bit gray, 3 px [7, 8, 7], tRNS gray value 7 → alpha 0,255,0
    trns = _chunk(b"tRNS", struct.pack(">H", 7))
    a = decode_png(_png(3, 1, 8, 0, bytes([0, 7, 8, 7]), extra=trns))
    assert a.shape == (1, 3, 2)
    assert a[0, :, 1].tolist() == [0, 255, 0]
    assert a[0, :, 0].tolist() == [7, 8, 7]
    # 16-bit gray: tRNS 0x1234 must match ONLY the exact 16-bit sample,
    # not its high-byte neighbor 0x1235 (native-depth matching)
    trns16 = _chunk(b"tRNS", struct.pack(">H", 0x1234))
    scan = bytes([0]) + struct.pack(">HH", 0x1234, 0x1235)
    a16 = decode_png(_png(2, 1, 16, 0, scan, extra=trns16))
    assert a16.shape == (1, 2, 2)
    assert a16[0, :, 0].tolist() == [0x12, 0x12]
    assert a16[0, :, 1].tolist() == [0, 255]
    # 1-bit gray: spec keeps only the depth's least-significant bits of
    # the 2-byte value — 0xFF01 & 1 == 1 → the set pixels go transparent
    trns1 = _chunk(b"tRNS", struct.pack(">H", 0xFF01))
    a1 = decode_png(_png(10, 1, 1, 0, bytes([0, 0b10101010, 0b11000000]),
                         extra=trns1))
    assert a1[0, :, 0].tolist() == [255, 0] * 4 + [255, 255]
    assert a1[0, :, 1].tolist() == [0, 255] * 4 + [0, 0]
    # truecolor: 2 px, only the exact (1,2,3) triple is transparent
    trns_rgb = _chunk(b"tRNS", struct.pack(">HHH", 1, 2, 3))
    scan_rgb = bytes([0, 1, 2, 3, 1, 2, 4])
    argb = decode_png(_png(2, 1, 8, 2, scan_rgb, extra=trns_rgb))
    assert argb.shape == (1, 2, 4)
    assert argb[0, 0].tolist() == [1, 2, 3, 0]
    assert argb[0, 1].tolist() == [1, 2, 4, 255]


def test_gray_trns_through_adam7_interlace():
    # splice a tRNS chunk into an encoder-produced Adam7 gray stream:
    # the mask must land on the SAME pixels the de-interlace puts them
    img = _gradient(9, 11, 1) % 32  # plenty of repeats of each value
    data = encode_png(img, interlace=True)
    ihdr_end = 8 + 12 + 13  # signature + IHDR chunk
    trns = _chunk(b"tRNS", struct.pack(">H", 13))
    a = decode_png(data[:ihdr_end] + trns + data[ihdr_end:])
    assert a.shape == (9, 11, 2)
    assert np.array_equal(a[:, :, 0], img[:, :, 0])
    assert np.array_equal(a[:, :, 1] == 0, img[:, :, 0] == 13)
    assert (img[:, :, 0] == 13).any()  # the test actually bites


def test_trns_rejected_for_alpha_color_types():
    # gray+alpha (type 4) with a tRNS chunk is a spec violation
    trns = _chunk(b"tRNS", struct.pack(">H", 0))
    scan = bytes([0, 10, 20, 30, 40])
    with pytest.raises(ValueError):
        decode_png(_png(2, 1, 8, 4, scan, extra=trns))
    # and a wrong-length gray tRNS is rejected too
    bad = _chunk(b"tRNS", b"\x01")
    with pytest.raises(ValueError):
        decode_png(_png(1, 1, 8, 0, bytes([0, 5]), extra=bad))


def test_decoder_rejects_malformed():
    img = _gradient(8, 8)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\xff\xd8" + good)
    with pytest.raises(ValueError, match="CRC"):
        bad = bytearray(good)
        bad[20] ^= 0xFF  # corrupt IHDR body
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated|IEND|IDAT"):
        decode_png(good[:40])
    with pytest.raises(ValueError, match="filter type"):
        scan = bytes([9, 1, 2, 3])
        decode_png(_png(1, 1, 8, 2, scan))
    with pytest.raises(ValueError, match="palette"):
        decode_png(_png(1, 1, 8, 3, bytes([0, 0])))  # PLTE missing
    with pytest.raises(ValueError, match="zlib"):
        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
        decode_png(
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", b"notzlib")
            + _chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="geometry"):
        # declared 2×2 but only one scanline of data
        scan = bytes([0, 7])
        decode_png(_png(2, 2, 8, 0, scan))


def test_roundtrip_property_random_shapes():
    rng = np.random.default_rng(42)
    for _ in range(20):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        c = int(rng.choice([1, 2, 3, 4]))
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        il = bool(rng.integers(0, 2))
        ft = rng.choice([0, 1, 2, 3, 4, "adaptive"])
        ft = int(ft) if ft != "adaptive" else ft
        got = decode_png(encode_png(img, filter_type=ft, interlace=il))
        assert np.array_equal(got, img), (h, w, c, ft, il)


def test_trns_property_random_images():
    """Property (r13): for ANY 8-bit gray or truecolor image and any
    transparent value, the decoded alpha is exactly the equality mask
    and the color planes are untouched — both interlace methods."""
    rng = np.random.default_rng(99)
    for trial in range(20):
        h = int(rng.integers(1, 24))
        w = int(rng.integers(1, 24))
        gray = bool(rng.integers(0, 2))
        il = bool(rng.integers(0, 2))
        c = 1 if gray else 3
        # small value range so matches actually occur
        img = rng.integers(0, 6, size=(h, w, c), dtype=np.uint8)
        data = encode_png(img, interlace=il)
        ihdr_end = 8 + 12 + 13
        if gray:
            v = int(rng.integers(0, 6))
            trns = _chunk(b"tRNS", struct.pack(">H", v))
            mask = img[:, :, 0] == v
        else:
            vr, vg, vb = (int(rng.integers(0, 6)) for _ in range(3))
            trns = _chunk(b"tRNS", struct.pack(">HHH", vr, vg, vb))
            mask = (img == np.array([vr, vg, vb])).all(axis=2)
        got = decode_png(data[:ihdr_end] + trns + data[ihdr_end:])
        assert got.shape == (h, w, c + 1), (trial, h, w, gray, il)
        assert np.array_equal(got[:, :, :c], img), (trial, gray, il)
        assert np.array_equal(got[:, :, c] == 0, mask), (trial, gray, il)
        assert set(np.unique(got[:, :, c])) <= {0, 255}


# ---------------------------------------------------------------------------
# Spark-side wiring
# ---------------------------------------------------------------------------

def test_decode_image_features_handles_png(spark):
    """L5 wiring: \\x89PNG payloads flow through the zlib+numpy codec
    inside the Arrow batch — real dims, channel means (alpha dropped),
    and an aHash identical to the lossless netpbm path's (PNG is
    lossless, unlike the JPEG near-dup case)."""
    from dataworks_spark.llm.multimodal import decode_image_features

    img = _gradient(32, 48)
    png = encode_png(img, interlace=True)
    ppm = b"P6\n48 32\n255\n" + img.tobytes()
    corrupt = bytearray(encode_png(img))
    corrupt[-8] ^= 0xFF  # break the IEND CRC
    rows = [(1, bytearray(png)), (2, bytearray(ppm)), (3, corrupt)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in decode_image_features(df).collect()}
    assert out[1].format == "PNG" and (out[1].width, out[1].height) == (48, 32)
    assert out[2].format == "P6"
    assert out[3].format is None  # malformed → NULL row, task survives
    for ch in ("mean_r", "mean_g", "mean_b"):
        assert getattr(out[1], ch) == pytest.approx(getattr(out[2], ch))
    assert out[1].ahash == out[2].ahash  # lossless → identical aHash
    # strict mode: the corrupt stream raises out of the executor
    with pytest.raises(Exception, match="PNG"):
        decode_image_features(
            spark.createDataFrame([(9, corrupt)], "media_id long, payload binary"),
            strict=True,
        ).collect()


def test_decode_image_features_png_gray_alpha_and_rgba(spark):
    from dataworks_spark.llm.multimodal import decode_image_features

    gray = _gradient(16, 16, 1)
    ga = np.dstack([gray, np.full((16, 16, 1), 200, np.uint8)])
    rgba = np.dstack([_gradient(16, 16, 3), np.full((16, 16, 1), 7, np.uint8)])
    rows = [(1, bytearray(encode_png(ga))), (2, bytearray(encode_png(rgba)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in decode_image_features(df).collect()}
    # gray+alpha: features over the gray channel, replicated to RGB
    assert out[1].mean_r == pytest.approx(float(gray.mean()))
    assert out[1].mean_r == out[1].mean_g == out[1].mean_b
    # RGBA: alpha dropped, means are the RGB planes'
    assert out[2].mean_g == pytest.approx(float(rgba[:, :, 1].mean()))


def test_resize_images_handles_png(spark):
    from dataworks_spark.llm.multimodal import decode_image_features, resize_images

    img = _gradient(64, 64)
    png = encode_png(img, filter_type=4)
    df = spark.createDataFrame([(1, bytearray(png))], "media_id long, payload binary")
    resized = resize_images(df, 16, 12)
    r = resized.collect()[0]
    assert (r.width, r.height) == (16, 12) and bytes(r.payload).startswith(b"P6")
    feats = decode_image_features(resized.select("media_id", "payload")).collect()[0]
    assert (feats.width, feats.height) == (16, 12) and feats.format == "P6"


def test_fixture_pngs_pair_exactly_with_their_ppm_sources(spark):
    """The r12 fixture plants CROSS-FORMAT EXACT dups: png 20000+i is a
    lossless re-encode of ppm i (filter strategies rotating, every 3rd
    interlaced). The Hamming kernel must pair each at distance 0 —
    exercising the PNG codec inside the exact binaryFile → decode →
    near-dup pipeline q_multimodal ships."""
    from dataworks_spark.llm.multimodal import (
        decode_image_features,
        image_near_dup_pairs,
        read_binary_dir,
        write_decodable_fixture,
    )

    path = write_decodable_fixture("t_png")
    ppms = read_binary_dir(spark, path, id_pattern=r"img_(\d+)\.", glob="*.ppm")
    pngs = read_binary_dir(spark, path, id_pattern=r"png_(\d+)\.", glob="*.png")
    feats = decode_image_features(ppms.unionByName(pngs))
    rows = {r.media_id: r for r in feats.collect()}
    assert sum(1 for r in rows.values() if r.format == "PNG") == 16
    for i in range(12):
        g, p = rows[20000 + i], rows[i]
        assert (g.width, g.height) == (16, 16)
        assert g.mean_r == pytest.approx(p.mean_r)
        assert g.ahash == p.ahash  # lossless: identical perceptual hash
    # r13 tRNS fixtures (+40000): gray/type-0 on even ids decode through
    # the gray+alpha branch; truecolor/type-2 on odd ids carry the SAME
    # pixels as ppm i (alpha dropped for features) → exact feature twin
    for i in range(4):
        t = rows[40000 + i]
        assert (t.width, t.height) == (16, 16) and t.format == "PNG"
        if i % 2 == 1:
            p = rows[i]
            assert t.ahash == p.ahash and t.mean_g == pytest.approx(p.mean_g)
        else:
            assert t.mean_r == pytest.approx(t.mean_b)  # gray: channels equal
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in image_near_dup_pairs(feats).collect()}
    planted = {(i, 20000 + i) for i in range(12)} | {(i, 40000 + i) for i in (1, 3)}
    found = planted & set(pairs)
    assert found == planted, f"missing exact cross-format pairs: {planted - found}"
    assert all(pairs[p] == 0 for p in planted)
