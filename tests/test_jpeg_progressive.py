"""Progressive JPEG codec (llm/jpeg_progressive.py, T.81 Annex G) and
the decode_jpeg dispatcher.

The load-bearing anchor is DIFFERENTIAL, not a self-round-trip: a
progressive and a baseline encoding at the same quality carry the same
quantized coefficients, so their decodes must be PIXEL-IDENTICAL —
two completely different entropy layouts (multi-scan successive
approximation with EOB runs vs sequential Huffman) converging on the
same bytes pins both sides against each other, and the baseline side
is already validated against foreign libjpeg files (tests/test_jpeg.py).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

from dataworks_spark.llm.jpeg import (
    decode_baseline_jpeg,
    decode_jpeg,
    encode_baseline_jpeg,
)
from dataworks_spark.llm.jpeg_progressive import (
    decode_progressive_jpeg,
    encode_progressive_jpeg,
)


def _gradient(h, w):
    base = np.add.outer(np.arange(h), np.arange(w))
    return np.dstack([(base * k + 7 * k) % 256 for k in (1, 2, 3)]).astype(np.uint8)


def test_progressive_decode_equals_baseline_decode_pixelwise():
    """Same quantized coefficients → identical pixels, across color/
    gray, 4:4:4 / 4:2:0, block-aligned and ragged dims, and content
    shapes that stress different entropy paths (noise → dense AC,
    sparse → EOB runs spanning many blocks)."""
    rng = np.random.default_rng(1)
    cases = []
    for (h, w), sub in [((16, 16), False), ((33, 47), False), ((35, 49), True)]:
        cases.append((rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8), sub))
        cases.append((_gradient(h, w), sub))
        sparse = np.full((h, w, 3), 128, np.uint8)
        sparse[h // 2, w // 2] = [255, 0, 255]
        cases.append((sparse, sub))
    for img, sub in cases:
        for q in (50, 92):
            base = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=q, subsample=sub))
            prog = decode_progressive_jpeg(
                encode_progressive_jpeg(img, quality=q, subsample=sub)
            )
            assert np.array_equal(base, prog), (img.shape, sub, q)
    g = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    assert np.array_equal(
        decode_baseline_jpeg(encode_baseline_jpeg(g, quality=80)),
        decode_progressive_jpeg(encode_progressive_jpeg(g, quality=80)),
    )


def test_progressive_native_and_python_paths_identical(monkeypatch):
    """r14: the compiled progressive scan kernel must be
    indistinguishable from the python walks — identical pixels across
    the dense/sparse/gray/subsampled matrix (every scan type: DC
    first/refine, AC first/refine, EOB runs, restart segments) and
    identical errors on truncated streams."""
    from dataworks_spark.llm import native

    if native._load(native._JPEG_PROG_SRC) is None:
        pytest.skip("no system C compiler: python walks are the only path")

    rng = np.random.default_rng(9)
    payloads = []
    for (h, w), sub in [((33, 47), False), ((35, 49), True)]:
        noisy = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        sparse = np.full((h, w, 3), 128, np.uint8)
        sparse[h // 2, w // 2] = [255, 0, 255]
        for img in (noisy, _gradient(h, w), sparse):
            payloads.append(encode_progressive_jpeg(img, quality=85, subsample=sub))
    payloads.append(
        encode_progressive_jpeg(
            rng.integers(0, 256, size=(24, 40), dtype=np.uint8), quality=80
        )
    )
    native_out = [decode_progressive_jpeg(p) for p in payloads]
    truncated = payloads[0][: len(payloads[0]) - 60]
    with pytest.raises(ValueError) as e_native:
        decode_progressive_jpeg(truncated)

    monkeypatch.setattr(native, "_load", lambda src: None)
    for p, d in zip(payloads, native_out):
        assert np.array_equal(decode_progressive_jpeg(p), d)
    with pytest.raises(ValueError) as e_python:
        decode_progressive_jpeg(truncated)
    assert str(e_native.value) == str(e_python.value)


def test_progressive_restart_markers_roundtrip():
    """RSTn inside progressive scans: entropy state (DC predictors,
    EOB runs, bit alignment) resets per segment and the result is
    unchanged for any interval."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    want = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=85, subsample=True))
    for interval in (1, 2, 7):
        got = decode_progressive_jpeg(
            encode_progressive_jpeg(
                img, quality=85, subsample=True, restart_interval=interval
            )
        )
        assert np.array_equal(got, want), interval


def test_decode_jpeg_dispatches_by_sof_marker():
    img = _gradient(24, 24)
    b = encode_baseline_jpeg(img, quality=85)
    p = encode_progressive_jpeg(img, quality=85)
    assert np.array_equal(decode_jpeg(b), decode_jpeg(p))
    # non-DCT modes still refuse with the callers' ValueError contract
    lossless = bytearray(b)
    i = lossless.index(b"\xff\xc0") + 1
    lossless[i] = 0xC3  # rewrite SOF0 → SOF3 (lossless)
    with pytest.raises(ValueError, match="SOF3"):
        decode_jpeg(bytes(lossless))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG")


def test_progressive_decoder_rejects_malformed():
    img = _gradient(16, 16)
    good = encode_progressive_jpeg(img, quality=85)
    with pytest.raises(ValueError, match="SOI"):
        decode_progressive_jpeg(good[2:])
    with pytest.raises(ValueError):
        decode_progressive_jpeg(good[:40])  # truncated header
    # a baseline stream through the progressive entry point
    with pytest.raises(ValueError, match="SOF0"):
        decode_progressive_jpeg(encode_baseline_jpeg(img, quality=85))
    # AC scan declaring two components is illegal in progressive mode
    # (constructed by patching the SOS of a real stream would need a
    # byte hunt; the validation path is unit-hit via the dims guard)


def test_decode_image_features_handles_progressive(spark):
    """L5 wiring end-to-end: SOF2 payloads decode inside the Arrow
    batch via the dispatcher; a progressive re-encode is a perceptual
    near-dup of its source (same quantization as baseline q92)."""
    from dataworks_spark.llm.multimodal import decode_image_features

    img = _gradient(32, 48)
    prog = encode_progressive_jpeg(img, quality=92)
    ppm = b"P6\n48 32\n255\n" + img.tobytes()
    df = spark.createDataFrame(
        [(1, bytearray(prog)), (2, bytearray(ppm))], "media_id long, payload binary"
    )
    out = {r.media_id: r for r in decode_image_features(df).collect()}
    assert out[1].format == "JPEG" and (out[1].width, out[1].height) == (48, 32)
    ham = bin((out[1].ahash ^ out[2].ahash) & ((1 << 64) - 1)).count("1")
    assert ham <= 6, f"aHash drifted {ham} bits across progressive encode"


def test_fixture_progressive_jpegs_match_their_baseline_twins(spark):
    """The r12 fixture plants jpg 30000+i as a PROGRESSIVE re-encode of
    the same pixels baseline jpg 10000+i encodes at the same quality —
    through the real binaryFile → decode pipeline their features must
    be IDENTICAL (same coefficients), and both near-dup their ppm
    source."""
    from dataworks_spark.llm.multimodal import (
        decode_image_features,
        read_binary_dir,
        write_decodable_fixture,
    )

    path = write_decodable_fixture("t_prog")
    jpgs = read_binary_dir(spark, path, id_pattern=r"jpg_(\d+)\.", glob="*.jpg")
    feats = decode_image_features(jpgs)
    rows = {r.media_id: r for r in feats.collect()}
    progressive = [m for m in rows if m >= 30000]
    assert len(progressive) == 6
    for m in progressive:
        p, b = rows[m], rows[m - 20000]  # 30000+i vs 10000+i
        assert (p.width, p.height) == (16, 16)
        assert p.ahash == b.ahash and p.mean_r == b.mean_r
