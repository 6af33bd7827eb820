"""Baseline-JPEG codec tests (extensions/jpeg.py): exact coefficient
round-trip through the entropy layer, fixed-point IDCT accuracy vs the
float reference, 4:2:0 interleave, restart markers, and the Spark decode
surface's corrupt-payload behavior."""

from __future__ import annotations

import math
import random
import struct

import numpy as np
import pytest

from bicis_spark.extensions.jpeg import (
    IDCT_T,
    SYNTH_QTAB,
    ZIGZAG,
    _idct_block,
    decode_jpeg,
    encode_baseline_jpeg,
    synth_jpeg,
    synth_jpeg_coeffs,
    synth_jpeg_color_420,
)


def test_idct_table_pinned():
    """The oracle inlines IDCT_T rows 0-3 as SQL literals — pin them so a
    constant drift breaks here before it breaks the hash gate."""
    assert IDCT_T[0] == [2896] * 8
    assert IDCT_T[1] == [4017, 3406, 2276, 799, -799, -2276, -3406, -4017]
    assert IDCT_T[2] == [3784, 1567, -1567, -3784, -3784, -1567, 1567, 3784]
    assert IDCT_T[3] == [3406, -799, -4017, -2276, 2276, 4017, 799, -3406]
    # and the quant constants the oracle uses at zigzag 0/1/5/17
    nat = [ZIGZAG[k][0] * 8 + ZIGZAG[k][1] for k in (0, 1, 5, 17)]
    assert [SYNTH_QTAB[i] for i in nat] == [8, 11, 14, 17]


def test_zigzag_is_the_standard_order():
    """Spot-pin the generated zigzag walk against known T.81 positions."""
    assert ZIGZAG[0] == (0, 0)
    assert ZIGZAG[1] == (0, 1)
    assert ZIGZAG[2] == (1, 0)
    assert ZIGZAG[5] == (0, 2)
    assert ZIGZAG[17] == (2, 3)
    assert ZIGZAG[63] == (7, 7)
    assert sorted(ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]


def _expected_coef_sums(blocks):
    q = SYNTH_QTAB
    dc = sum(bl[0] * q[0] for bl in blocks)
    ab = sum(
        abs(v) * q[ZIGZAG[k][0] * 8 + ZIGZAG[k][1]]
        for bl in blocks
        for k, v in enumerate(bl)
    )
    return dc, ab


def test_entropy_roundtrip_random_blocks():
    """decode(encode(C)) recovers the dequantized coefficient sums exactly
    for random sparse blocks — variable runs, ZRL, EOB, negative values,
    all DC/AC size categories in range."""
    rng = random.Random(1234)
    for _ in range(25):
        bx, by = rng.randint(1, 4), rng.randint(1, 3)
        blocks = []
        for _ in range(bx * by):
            zz = [0] * 64
            for _ in range(rng.randint(0, 24)):
                zz[rng.randint(0, 63)] = rng.randint(-255, 255)
            blocks.append(zz)
        payload = encode_baseline_jpeg(bx * 8, by * 8, [blocks])
        feats = decode_jpeg(payload)
        dc, ab = _expected_coef_sums(blocks)
        assert feats["width"] == bx * 8 and feats["height"] == by * 8
        assert feats["n_blocks"] == bx * by
        assert feats["dc_dequant_sum"] == dc
        assert feats["coef_abs_sum"] == ab


def test_restart_markers_roundtrip():
    """DRI + RSTn: predictors reset per restart interval; features match
    the no-restart encoding of the same coefficients."""
    _, _, blocks = synth_jpeg_coeffs(11)  # 11 -> 3x2 = 6 blocks
    w, h = 3 * 8, 2 * 8
    base = decode_jpeg(encode_baseline_jpeg(w, h, [blocks]))
    for ri in (1, 2, 5):
        withr = decode_jpeg(
            encode_baseline_jpeg(w, h, [blocks], restart_interval=ri)
        )
        assert withr == base


def test_idct_within_one_of_float_reference():
    """The fixed-point IDCT tracks the exact float IDCT within ±1 over
    random legal coefficient blocks — the standard integer-IDCT accuracy
    class."""

    def float_idct(fm):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        au = 1 / math.sqrt(2) if u == 0 else 1.0
                        av = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (
                            au
                            * av
                            * fm[v][u]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                out[y, x] = s / 4
        return np.clip(np.round(out) + 128, 0, 255)

    rng = random.Random(7)
    for _ in range(10):
        fm = np.zeros((8, 8), dtype=np.int64)
        for _ in range(rng.randint(1, 30)):
            fm[rng.randint(0, 7), rng.randint(0, 7)] = rng.randint(-1024, 1024)
        assert int(np.abs(_idct_block(fm) - float_idct(fm)).max()) <= 1


def test_color_420_interleave():
    """4:2:0 YCbCr: 4 luma + 2 chroma blocks per MCU, DC-only components
    decode to closed-form constants (luma pixel sum replayed exactly;
    chroma DCs land in the coefficient sums)."""
    for d in (0, 7, 100, 333):
        feats = decode_jpeg(synth_jpeg_color_420(d))
        assert (feats["width"], feats["height"], feats["n_blocks"]) == (16, 16, 6)
        q0 = SYNTH_QTAB[0]
        dcs = [((d + j) % 21 - 10) * q0 for j in range(4)]
        dcs += [(d % 11 - 5) * q0, (d % 9 - 4) * q0]
        assert feats["dc_dequant_sum"] == sum(dcs)
        assert feats["coef_abs_sum"] == sum(abs(v) for v in dcs)
        luma = 0
        for j in range(4):
            f00 = ((d + j) % 21 - 10) * q0
            pv = ((f00 * 2896 * 2896 + (1 << 25)) >> 26) + 128
            luma += 64 * max(0, min(255, pv))
        assert feats["pixel_sum"] == luma


def test_decoder_rejects_progressive_and_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n")
    # flip SOF0 (FFC0) to SOF2 (FFC2): progressive must fail loudly
    payload = bytearray(synth_jpeg(3))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(payload))


def test_spark_decode_surface(spark, sf_dir):
    """decode_jpeg_features over the synthetic corpus: strict decode of
    every payload; a corrupted payload yields a NULL-feature row (not an
    aborted job) when strict=False and raises when strict=True."""
    from bicis_spark.extensions.multimodal import (
        decode_jpeg_features,
        synth_media_jpeg,
    )
    from bicis_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents").limit(40)
    media = synth_media_jpeg(docs)
    feats = {r["doc_id"]: r for r in decode_jpeg_features(media, strict=True).collect()}
    for d, row in feats.items():
        want = decode_jpeg(synth_jpeg(d))
        assert row["pixel_sum"] == want["pixel_sum"]
        assert row["coef_abs_sum"] == want["coef_abs_sum"]

    import pyspark.sql.functions as F

    corrupted = media.withColumn(
        "content",
        F.when(F.col("doc_id") % 7 == 0, F.lit(b"\xff\xd8junk")).otherwise(
            F.col("content")
        ),
    )
    rows = decode_jpeg_features(corrupted, strict=False).collect()
    bad = [r for r in rows if r["doc_id"] % 7 == 0]
    good = [r for r in rows if r["doc_id"] % 7 != 0]
    assert bad and all(r["pixel_sum"] is None for r in bad)
    assert good and all(r["pixel_sum"] is not None for r in good)
    with pytest.raises(Exception):  # strict: the struct/Value error surfaces
        decode_jpeg_features(corrupted, strict=True).collect()


def test_codec_dispatch_handles_jpeg(spark, sf_dir):
    """decode_codec_features routes SOI-magic payloads through the real
    JPEG decoder into the shared codec schema."""
    from bicis_spark.extensions.multimodal import (
        decode_codec_features,
        synth_media_jpeg,
    )
    from bicis_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents").limit(12)
    rows = decode_codec_features(synth_media_jpeg(docs), strict=True).collect()
    assert rows
    for r in rows:
        want = decode_jpeg(synth_jpeg(r["doc_id"]))
        assert (r["width"], r["height"], r["pixel_sum"]) == (
            want["width"],
            want["height"],
            want["pixel_sum"],
        )
        assert r["sample_rate"] is None  # audio fields stay NULL
