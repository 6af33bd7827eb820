"""PNG codec tests (extensions/png.py): formula round-trip, CRC
verification, all-filter defiltering, hypothesis random-pixel coverage,
and the Spark decode surface."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bicis_spark.extensions.png import (
    _SIG,
    decode_png,
    encode_png,
    synth_png,
)


def _expected(doc_id: int) -> dict:
    w, h = 4 + doc_id % 5, 3 + doc_id % 4
    nch = 1 if doc_id % 2 == 0 else 3
    return {
        "width": w,
        "height": h,
        "color_type": 0 if nch == 1 else 2,
        "n_pixels": w * h,
        "pixel_sum": sum(
            (doc_id * 31 + (y * w + x) * nch + ch) % 256
            for y in range(h)
            for x in range(w)
            for ch in range(nch)
        ),
        "filter_type_sum": sum((doc_id + y) % 5 for y in range(h)),
    }


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 7, 19, 123, 4999])
def test_decode_inverts_synth(doc_id):
    assert decode_png(synth_png(doc_id)) == _expected(doc_id)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    nch=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31),
    data=st.data(),
)
def test_random_pixels_round_trip(w, h, nch, seed, data):
    """encode→decode is the identity on ARBITRARY pixel matrices under
    arbitrary per-row filter choices — every defilter path against every
    content, not just the synth formulas."""
    pixels = [
        [
            tuple(
                data.draw(st.integers(0, 255)) for _ in range(nch)
            )
            for _ in range(w)
        ]
        for _ in range(h)
    ]
    filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
    d = decode_png(encode_png(w, h, pixels, filters))
    assert d["width"] == w and d["height"] == h
    assert d["pixel_sum"] == sum(v for row in pixels for px in row for v in px)
    assert d["filter_type_sum"] == sum(filters)


def test_crc_verification_is_loud():
    payload = bytearray(synth_png(3))
    at = payload.index(b"IDAT")
    payload[at + 6] ^= 0x01  # flip a compressed byte; CRC now wrong
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_corrupt_payloads_raise():
    good = synth_png(5)
    with pytest.raises(ValueError):
        decode_png(b"")
    with pytest.raises(ValueError):
        decode_png(b"\x89PNX" + good[4:])
    with pytest.raises(ValueError):
        decode_png(good[:-4])  # truncated IEND CRC
    with pytest.raises(ValueError):
        decode_png(good + b"\x00")  # trailing byte


def test_interlace_and_depth_rejected():
    """The decoder's declared envelope: non-interlaced 8-bit gray/RGB.
    Rebuild IHDR with interlace=1 (re-CRC'd, so the chunk itself is
    valid) and expect a loud schema rejection, not silent garbage."""
    w, h = 4, 3
    pixels = [[(1,)] * w for _ in range(h)]
    good = encode_png(w, h, pixels, [0] * h)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)  # interlace=1
    bad = (
        _SIG
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + good[len(_SIG) + 12 + len(ihdr) :]
    )
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bad)


def test_spark_surfaces_and_dispatch(spark):
    """decode_png_features strict path matches the formula replay;
    decode_codec_features routes the PNG signature onto the image
    columns; garbage NULLs out leniently (including zlib.error)."""
    from bicis_spark.extensions.multimodal import (
        decode_codec_features,
        decode_png_features,
        synth_media_png,
    )

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id long, text string"
    )
    media = synth_media_png(docs)
    feats = {
        r["doc_id"]: r for r in decode_png_features(media, strict=True).collect()
    }
    for i in range(8):
        for key, val in _expected(i).items():
            assert feats[i][key] == val, (i, key)

    routed = {
        r["doc_id"]: r
        for r in decode_codec_features(media, strict=True).collect()
    }
    for i in range(8):
        exp = _expected(i)
        assert routed[i]["width"] == exp["width"]
        assert routed[i]["pixel_sum"] == exp["pixel_sum"]
        assert routed[i]["sample_rate"] is None

    # corrupt IDAT bytes but FIX the CRC so the failure happens inside
    # zlib.decompress — the lenient path must swallow zlib.error too
    payload = bytearray(synth_png(2))
    at = payload.index(b"IDAT")
    (ln,) = struct.unpack_from(">I", payload, at - 4)
    body = bytes(payload[at + 4 : at + 4 + ln])
    body = body[:2] + bytes([body[2] ^ 0xFF]) + body[3:]
    crc = struct.pack(">I", zlib.crc32(b"IDAT" + body) & 0xFFFFFFFF)
    payload[at + 4 : at + 4 + ln + 4] = body + crc
    garbage = spark.createDataFrame(
        [(1, "image/png", bytes(payload), len(payload))],
        "doc_id long, media_type string, content binary, n_bytes long",
    )
    lenient = decode_png_features(garbage).collect()[0]
    assert lenient["pixel_sum"] is None
    lenient2 = decode_codec_features(garbage).collect()[0]
    assert lenient2["width"] is None
