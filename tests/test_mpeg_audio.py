"""MPEG-1 Layer I codec tests (extensions/mpeg_audio.py): exact
bitstream round-trip, pinned scalefactor table, frame-walk robustness,
and the Spark decode surface (strict + NULL-tolerant paths)."""

from __future__ import annotations

import math

import pytest

from bicis_spark.extensions.mpeg_audio import (
    BITRATE_KBPS,
    SAMPLE_RATE,
    SF_Q,
    decode_layer1,
    encode_layer1_frame,
    frame_bytes,
    synth_alloc,
    synth_layer1,
    synth_raw,
    synth_scf,
)


def _expected_features(doc_id: int) -> dict:
    """Independent replay of the synth formulas (the same arithmetic the
    SQL oracle runs) — NOT via the codec."""
    nf = 1 + doc_id % 3
    exp = {
        "sample_rate": 32000,
        "bitrate_kbps": BITRATE_KBPS[7 + doc_id % 8],
        "n_frames": nf,
        "n_alloc": 0,
        "scf_sum": 0,
        "requant_abs_sum": 0,
        "pcm_fix_sum": 0,
    }
    for f in range(nf):
        for sb in range(32):
            code = synth_alloc(doc_id, f, sb)
            if not code:
                continue
            nb = code + 1
            scf = synth_scf(doc_id, f, sb)
            exp["n_alloc"] += 1
            exp["scf_sum"] += scf
            for s in range(12):
                c = synth_raw(doc_id, f, sb, s, nb) + 1 - (1 << (nb - 1))
                exp["requant_abs_sum"] += abs(c)
                exp["pcm_fix_sum"] += math.floor(
                    SF_Q[scf] * 2.0 * c / ((1 << nb) - 1)
                )
    exp["n_samples_coded"] = 12 * exp["n_alloc"]
    return exp


@pytest.mark.parametrize("doc_id", [0, 1, 2, 7, 17, 101, 4999, 49_999])
def test_decode_inverts_synth(doc_id):
    assert decode_layer1(synth_layer1(doc_id)) == _expected_features(doc_id)


def test_sfq_goldens():
    # spec Table B.1 anchors: sf(0)=2.0, sf(3)=1.0, sf(6)=0.5 — exact
    # powers of two land exactly on the 20-bit lattice.
    assert SF_Q[0] == 2 << 20
    assert SF_Q[3] == 1 << 20
    assert SF_Q[6] == 1 << 19
    # golden-pin two irrational entries so a table regen on a different
    # libm would be caught (floor(2^(2/3)·2^20+0.5), floor(2^(1/3)·2^20+0.5))
    assert SF_Q[1] == 1664511
    assert SF_Q[2] == 1321123
    assert len(SF_Q) == 63
    # geometric decay; the 20-bit lattice collapses the tail (sf ~1e-6 of
    # sf(0)) to equal small integers, so non-increasing is the invariant
    assert all(a >= b for a, b in zip(SF_Q, SF_Q[1:]))
    assert SF_Q[62] >= 1


def test_frame_length_header_math():
    # Layer I: slots = floor(12·bitrate/fs), 4 bytes each
    assert frame_bytes(224, 32000) == (12 * 224000 // 32000) * 4
    assert frame_bytes(448, 32000, padding=1) == ((12 * 448000 // 32000) + 1) * 4
    for d in range(11):
        payload = synth_layer1(d)
        nf = 1 + d % 3
        assert len(payload) == nf * frame_bytes(BITRATE_KBPS[7 + d % 8], 32000)


def test_corrupt_payloads_raise():
    with pytest.raises(ValueError):
        decode_layer1(b"\x00\x01\x02\x03")  # no sync
    with pytest.raises(ValueError):
        decode_layer1(synth_layer1(5)[:-3])  # truncated last frame
    good = bytearray(synth_layer1(4))
    good[1] = (good[1] & 0x0F) | 0xE0  # flip ID bit to MPEG-2
    with pytest.raises(ValueError):
        decode_layer1(bytes(good))


def test_alloc_code_15_rejected_both_ways():
    alloc = [0] * 32
    alloc[3] = 15
    with pytest.raises(ValueError):
        encode_layer1_frame(7, 2, alloc, [0] * 32, [[0] * 32 for _ in range(12)])
    # craft a frame whose first alloc nibble is 15: header (32 bits) then
    # 4 bits of 0b1111
    frame = bytearray(synth_layer1(0))
    frame[4] |= 0xF0
    with pytest.raises(ValueError):
        decode_layer1(bytes(frame))


def test_requantization_lattice_bounds():
    # c = raw + 1 - 2^(nb-1) spans [1 - 2^(nb-1), 2^(nb-1)] and is never 0
    # at raw = 2^(nb-1) - 1... (c=0 IS reachable: raw = 2^(nb-1)-1 → c=0)
    for nb in range(2, 16):
        cs = [raw + 1 - (1 << (nb - 1)) for raw in range(1 << nb)]
        assert min(cs) == 1 - (1 << (nb - 1))
        assert max(cs) == 1 << (nb - 1)
        # fixed-point product magnitude stays double-exact (< 2^53)
        assert SF_Q[0] * 2 * (1 << (nb - 1)) < 2**53


def test_spark_decode_surface(spark):
    from bicis_spark.extensions.multimodal import (
        decode_codec_features,
        decode_mpeg1_features,
        synth_media_mpeg1,
    )

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = synth_media_mpeg1(docs)
    out = {r["doc_id"]: r.asDict() for r in decode_mpeg1_features(media, strict=True).collect()}
    assert len(out) == 40
    for d in (0, 7, 39):
        exp = _expected_features(d)
        got = out[d]
        got.pop("doc_id")
        assert got == exp
    # the magic-dispatched production path maps onto the audio columns
    prod = {
        r["doc_id"]: r.asDict()
        for r in decode_codec_features(media, strict=True).collect()
    }
    exp = _expected_features(3)
    assert prod[3]["sample_rate"] == 32000
    assert prod[3]["n_samples"] == exp["n_samples_coded"]
    assert prod[3]["sample_abs_sum"] == exp["requant_abs_sum"]
    assert prod[3]["pixel_sum"] is None


def test_spark_null_payload_tolerant(spark):
    from pyspark.sql import functions as F

    from bicis_spark.extensions.multimodal import decode_mpeg1_features

    df = spark.range(0, 3).select(
        F.col("id").alias("doc_id"),
        F.lit("audio/mpeg").alias("media_type"),
        F.lit(None).cast("binary").alias("content"),
        F.lit(None).cast("long").alias("n_bytes"),
    )
    rows = decode_mpeg1_features(df, strict=False).collect()
    assert len(rows) == 3
    assert all(r["n_frames"] is None for r in rows)
