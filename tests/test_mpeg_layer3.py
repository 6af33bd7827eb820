"""MPEG-1 Layer III codec tests (extensions/mpeg_layer3.py): exact
bitstream round-trip against a formula replay, bit-reservoir mechanics,
scfsi sharing, codebook Kraft completeness, pinned fixed-point tables,
frame-walk robustness, and the Spark decode surface."""

from __future__ import annotations

import math

import pytest

from bicis_spark.extensions.mpeg_layer3 import (
    BITRATE_KBPS_L3,
    GAIN_Q,
    PAIR_TABLES,
    POW43_Q,
    SCFSI_GROUPS,
    SLEN,
    _PAIR_BOOKS,
    _QUAD_BOOKS,
    _region_of_pair,
    decode_layer3,
    frame_bytes_l3,
    synth_gr_field,
    synth_layer3,
    synth_main_begin,
    synth_pair,
    synth_quad,
    synth_scalefac,
    synth_scfsi,
)


def _expected_features(doc_id: int) -> dict:
    """Independent replay of the synth formulas (the same arithmetic the
    SQL oracle runs) — NOT via the codec."""
    nf = 1 + doc_id % 3
    e = dict(
        sample_rate=32000,
        bitrate_kbps=BITRATE_KBPS_L3[9 + doc_id % 5],
        n_frames=nf, n_granules=2 * nf, big_values_sum=0, count1_sum=0,
        global_gain_sum=0, scalefac_sum=0, scfsi_sum=0, table_select_sum=0,
        region_count_sum=0, side_flags_sum=0, main_begin_sum=0,
        huff_abs_sum=0, xr_fix_sum=0,
    )
    for f in range(nf):
        scfsi = synth_scfsi(doc_id, f)
        e["scfsi_sum"] += sum(scfsi)
        e["main_begin_sum"] += synth_main_begin(doc_id, f)
        for g in range(2):
            fld = synth_gr_field(doc_id, f, g)
            gq = GAIN_Q[fld["global_gain"]]
            e["big_values_sum"] += fld["big_values"]
            e["count1_sum"] += fld["n_quads"]
            e["global_gain_sum"] += fld["global_gain"]
            e["table_select_sum"] += sum(fld["table_select"])
            e["region_count_sum"] += fld["region0_count"] + fld["region1_count"]
            e["side_flags_sum"] += (
                4 * fld["preflag"] + 2 * fld["scalefac_scale"]
                + fld["count1table_select"]
            )
            for b in range(21):
                src_g = (
                    0
                    if g == 1
                    and any(scfsi[k] and b in SCFSI_GROUPS[k] for k in range(4))
                    else g
                )
                e["scalefac_sum"] += synth_scalefac(doc_id, f, src_g, b)
            for p in range(fld["big_values"]):
                r = _region_of_pair(
                    p, fld["region0_count"], fld["region1_count"]
                )
                m, linbits = PAIR_TABLES[fld["table_select"][r]]
                X, Y = synth_pair(doc_id, f, g, p, m, linbits)
                e["huff_abs_sum"] += abs(X) + abs(Y)
                for v in (X, Y):
                    if v:
                        e["xr_fix_sum"] += (1 if v > 0 else -1) * (
                            (POW43_Q[abs(v)] * gq) >> 20
                        )
            for j in range(fld["n_quads"]):
                for v in synth_quad(doc_id, f, g, j):
                    e["huff_abs_sum"] += abs(v)
                    if v:
                        e["xr_fix_sum"] += (1 if v > 0 else -1) * (
                            (POW43_Q[1] * gq) >> 20
                        )
    return e


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 7, 17, 59, 123, 456, 4999])
def test_decode_inverts_synth(doc_id):
    assert decode_layer3(synth_layer3(doc_id)) == _expected_features(doc_id)


def test_fixed_point_goldens():
    """Pin the requantization tables to their defining formulas at spot
    values (the same literals inlined into the oracle SQL)."""
    assert POW43_Q[0] == 0 and POW43_Q[1] == 1 << 20
    assert POW43_Q[8] == 16 << 20  # 8^(4/3) = 16 exactly
    assert POW43_Q[27] == math.floor(math.pow(27, 4 / 3) * (1 << 20) + 0.5)
    assert GAIN_Q[210] == 1 << 20  # 2^0
    assert GAIN_Q[214] == 1 << 21  # 2^1
    assert GAIN_Q[140] == math.floor(2 ** (-70 / 4) * (1 << 20) + 0.5)
    # slen table row checks (ISO scalefac_compress semantics)
    assert SLEN[0] == (0, 0) and SLEN[4] == (3, 0) and SLEN[15] == (4, 3)


def test_codebooks_are_kraft_complete_prefix_codes():
    """Every generated codebook is a COMPLETE prefix code: Kraft sum
    exactly 1 and no codeword a prefix of another — the property that
    makes the bit-budget count1 termination sound."""
    from fractions import Fraction

    for book in list(_PAIR_BOOKS.values()) + list(_QUAD_BOOKS.values()):
        assert sum(Fraction(1, 2 ** ln) for _, ln in book.values()) == 1
        codes = sorted(
            format(code, f"0{ln}b") for code, ln in book.values()
        )
        for a, b in zip(codes, codes[1:]):
            assert not b.startswith(a)


def test_reservoir_walk_is_real():
    """Multi-frame docs carry nonzero main_data_begin (granule data living
    in the PREVIOUS frame's slot area) and still decode exactly; zeroing
    the begin field of a frame that depends on it breaks the budget check
    loudly instead of silently shifting the read."""
    doc_id = 2  # 3 frames; begins (0, 20, 33)
    assert [synth_main_begin(doc_id, f) for f in range(3)] == [0, 27, 40]
    payload = bytearray(synth_layer3(doc_id))
    feats = decode_layer3(bytes(payload))
    assert feats["main_begin_sum"] == 67
    # frame 1 starts at frame_bytes; its side info begins 4 bytes in —
    # main_data_begin is the first 9 bits of side info
    fb = frame_bytes_l3(feats["bitrate_kbps"], 32000)
    payload[fb + 4] = 0
    payload[fb + 5] &= 0x7F  # clear all 9 begin bits
    with pytest.raises(ValueError):
        decode_layer3(bytes(payload))


def test_scfsi_shares_granule0_scalefactors():
    """A (doc, frame) with a set scfsi bit must DECODE granule 1's bands
    in that group to granule 0's values even though the two granules'
    value formulas differ."""
    doc_id, f, k = 1, 0, 3  # scfsi[3] set: (1+0+3)%4 == 0
    assert synth_scfsi(doc_id, f)[k] == 1
    grp = list(SCFSI_GROUPS[k])
    g0 = [synth_scalefac(doc_id, f, 0, b) for b in grp]
    g1 = [synth_scalefac(doc_id, f, 1, b) for b in grp]
    assert g0 != g1  # the copy is observable
    assert decode_layer3(synth_layer3(doc_id)) == _expected_features(doc_id)


def test_corrupt_payloads_raise():
    good = synth_layer3(5)
    with pytest.raises(ValueError):
        decode_layer3(b"")
    with pytest.raises(ValueError):
        decode_layer3(b"\x00" + good[1:])  # broken sync
    with pytest.raises(ValueError):
        decode_layer3(good[:-10])  # truncated frame
    with pytest.raises(ValueError):
        decode_layer3(good + b"\x00\x01")  # trailing bytes
    # a Layer I stream must be rejected by the Layer III decoder
    from bicis_spark.extensions.mpeg_audio import synth_layer1

    with pytest.raises(ValueError, match="Layer III"):
        decode_layer3(synth_layer1(5))


def test_bit_budget_mismatch_raises():
    """Corrupting part2_3_length (bits 18..29 of side info) must fail the
    exact-budget check, not silently mis-split the granules."""
    payload = bytearray(synth_layer3(0))
    # side info starts at byte 4; part2_3_length of granule 0 begins
    # after main_data_begin(9)+private(5)+scfsi(4) = 18 bits
    payload[4 + 2] ^= 0x20  # flip a bit inside the 12-bit length field
    with pytest.raises(ValueError):
        decode_layer3(bytes(payload))


def test_spark_decode_surface(spark):
    """decode_mp3_features over a synthesized frame: strict decode of good
    payloads matches the formula replay; garbage rows are NULL-feature in
    lenient mode and raise in strict."""
    from bicis_spark.extensions.multimodal import (
        decode_mp3_features,
        synth_media_mp3,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    feats = {
        r["doc_id"]: r
        for r in decode_mp3_features(synth_media_mp3(docs), strict=True).collect()
    }
    for i in range(8):
        exp = _expected_features(i)
        for k, v in exp.items():
            assert feats[i][k] == v, (i, k)

    garbage = spark.createDataFrame(
        [(1, "x", bytearray(b"\xff\xe2junk"), 6), (2, "x", None, 0)],
        "doc_id long, media_type string, content binary, n_bytes long",
    )
    lenient = {r["doc_id"]: r for r in decode_mp3_features(garbage).collect()}
    assert lenient[1]["n_frames"] is None and lenient[2]["n_frames"] is None
    with pytest.raises(Exception):
        decode_mp3_features(garbage, strict=True).collect()


def test_codec_dispatch_routes_layer3(spark):
    """decode_codec_features tells Layer III from Layer I by the header
    layer bits and maps MP3 features onto the audio columns."""
    from bicis_spark.extensions.multimodal import (
        decode_codec_features,
        synth_media_mp3,
    )

    docs = spark.createDataFrame(
        [(3, "a"), (4, "b")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in decode_codec_features(
            synth_media_mp3(docs), strict=True
        ).collect()
    }
    for i in (3, 4):
        exp = _expected_features(i)
        assert rows[i]["sample_rate"] == 32000
        assert rows[i]["n_samples"] == (
            2 * exp["big_values_sum"] + 4 * exp["count1_sum"]
        )
        assert rows[i]["sample_abs_sum"] == exp["huff_abs_sum"]
        assert rows[i]["width"] is None


# --- hypothesis property layer: random granule content beyond the synth
# formulas (encoder edge cases: empty big-values region, zero quads,
# all-scfsi-copied granule 1, escape-heavy tables, slen=0 bands) ---

from hypothesis import given, settings
from hypothesis import strategies as st

from bicis_spark.extensions.mpeg_layer3 import (
    GranuleSpec,
    decode_layer3 as _dec,
    encode_layer3_stream,
)


def _granule_strategy():
    def build(draw):
        sc = draw(st.integers(0, 15))
        slen1, slen2 = SLEN[sc]
        r0c = draw(st.integers(0, 1))
        r1c = draw(st.integers(0, 1))
        bv = draw(st.integers(0, 24))
        tsel = tuple(draw(st.integers(1, 3)) for _ in range(3))
        pairs = []
        for p in range(bv):
            m, linbits = PAIR_TABLES[tsel[_region_of_pair(p, r0c, r1c)]]
            hi = m + (((1 << linbits) - 1) if linbits else 0)
            x = draw(st.integers(-hi, hi))
            y = draw(st.integers(-hi, hi))
            pairs.append((x, y))
        quads = [
            tuple(draw(st.sampled_from([-1, 0, 1])) for _ in range(4))
            for _ in range(draw(st.integers(0, 5)))
        ]
        scalefacs = [
            draw(st.integers(0, (1 << (slen1 if b < 11 else slen2)) - 1))
            for b in range(21)
        ]
        return GranuleSpec(
            bv, draw(st.integers(0, 255)), sc, tsel, r0c, r1c,
            draw(st.integers(0, 1)), draw(st.integers(0, 1)),
            draw(st.integers(0, 1)), scalefacs, pairs, quads,
        )

    return st.composite(lambda draw: build(draw))()


@settings(max_examples=40, deadline=None)
@given(
    frames=st.lists(
        st.tuples(
            st.lists(st.integers(0, 1), min_size=4, max_size=4),
            st.tuples(_granule_strategy(), _granule_strategy()),
        ),
        min_size=1,
        max_size=3,
    ),
    bidx=st.integers(9, 14),
    begins=st.lists(st.integers(0, 48), min_size=3, max_size=3),
)
def test_random_granules_round_trip(frames, bidx, begins):
    """encode→decode is the identity on ARBITRARY spec-valid granule
    content, through the reservoir: every side field, effective
    scalefactor, |value| sum, and the requant lattice must come back
    exactly — not just for the synth formulas."""
    spec_frames = []
    for f, (scfsi, (g0, g1)) in enumerate(frames):
        begin = 0 if f == 0 else begins[f]
        spec_frames.append((begin, list(scfsi), [g0, g1]))
    payload = encode_layer3_stream(bidx, 2, spec_frames)
    feats = _dec(payload)

    exp_bv = exp_gg = exp_sf = exp_habs = exp_xr = exp_quads = 0
    for f, (scfsi, (g0, g1)) in enumerate(frames):
        for gi, g in enumerate((g0, g1)):
            exp_bv += g.big_values
            exp_gg += g.global_gain
            exp_quads += len(g.quads)
            gq = GAIN_Q[g.global_gain]
            for b in range(21):
                src = g0 if (
                    gi == 1
                    and any(scfsi[k] and b in SCFSI_GROUPS[k] for k in range(4))
                ) else g
                exp_sf += src.scalefacs[b]
            for X, Y in g.pairs:
                exp_habs += abs(X) + abs(Y)
                for v in (X, Y):
                    if v:
                        exp_xr += (1 if v > 0 else -1) * (
                            (POW43_Q[abs(v)] * gq) >> 20
                        )
            for quad in g.quads:
                for v in quad:
                    exp_habs += abs(v)
                    if v:
                        exp_xr += (1 if v > 0 else -1) * (
                            (POW43_Q[1] * gq) >> 20
                        )
    assert feats["n_frames"] == len(frames)
    assert feats["big_values_sum"] == exp_bv
    assert feats["count1_sum"] == exp_quads
    assert feats["global_gain_sum"] == exp_gg
    assert feats["scalefac_sum"] == exp_sf
    assert feats["huff_abs_sum"] == exp_habs
    assert feats["xr_fix_sum"] == exp_xr
