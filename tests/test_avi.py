"""RIFF/AVI MJPEG container tests (extensions/avi.py): demux + per-frame
JPEG decode round-trip, idx1 verification, header invariants, and the
Spark video surfaces."""

from __future__ import annotations

import struct

import pytest

from bicis_spark.extensions.avi import (
    decode_avi_features,
    demux_avi,
    synth_avi,
    synth_frame_id,
    synth_n_frames,
    synth_us_per_frame,
)
from bicis_spark.extensions.jpeg import decode_jpeg, synth_jpeg


def _expected(doc_id: int) -> dict:
    nf = synth_n_frames(doc_id)
    per = [decode_jpeg(synth_jpeg(synth_frame_id(doc_id, f))) for f in range(nf)]
    return {
        "width": per[0]["width"],
        "height": per[0]["height"],
        "n_frames": nf,
        "us_per_frame": synth_us_per_frame(doc_id),
        "duration_us": nf * synth_us_per_frame(doc_id),
        "pixel_sum": sum(d["pixel_sum"] for d in per),
        "dc_dequant_sum": sum(d["dc_dequant_sum"] for d in per),
        "coef_abs_sum": sum(d["coef_abs_sum"] for d in per),
    }


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 7, 17, 123, 999])
def test_decode_inverts_synth(doc_id):
    assert decode_avi_features(synth_avi(doc_id)) == _expected(doc_id)


def test_frames_share_dimensions():
    """synth_frame_id ≡ doc_id mod 6 ⇒ one video's frames all decode to
    the header dimensions (the stream contract decode enforces)."""
    for doc_id in (1, 5, 11):
        v = demux_avi(synth_avi(doc_id))
        dims = {
            (decode_jpeg(fr)["width"], decode_jpeg(fr)["height"])
            for fr in v["frames"]
        }
        assert dims == {(v["width"], v["height"])}


def test_idx1_corruption_is_loud():
    """Flipping an idx1 offset must raise — the index is VERIFIED against
    the walked movi layout, not skipped."""
    payload = bytearray(synth_avi(3))
    at = payload.rindex(b"idx1")
    # entry 0's offset field: idx1(4) + size(4) + ckid(4) + flags(4) = +16
    (off,) = struct.unpack_from("<I", payload, at + 16)
    struct.pack_into("<I", payload, at + 16, off + 2)
    with pytest.raises(ValueError, match="idx1"):
        demux_avi(bytes(payload))


def test_header_frame_count_mismatch_is_loud():
    """avih total_frames is cross-checked against the walked movi chunks."""
    payload = bytearray(synth_avi(2))
    at = payload.index(b"avih")
    # avih body: us_per_frame, maxbytes, padding, flags, total_frames
    struct.pack_into("<I", payload, at + 8 + 16, 99)
    with pytest.raises(ValueError, match="total_frames"):
        demux_avi(bytes(payload))


def test_corrupt_payloads_raise():
    good = synth_avi(5)
    with pytest.raises(ValueError):
        demux_avi(b"")
    with pytest.raises(ValueError):
        demux_avi(b"RIFX" + good[4:])
    with pytest.raises(ValueError):
        demux_avi(good[:-6])  # RIFF size no longer matches


def test_spark_video_surfaces(spark):
    """decode_video_features and the REAL frame sampler over synthesized
    videos: strict decode matches the formula replay; sampling keeps
    every 2nd frame and decodes only those; garbage rows NULL out in
    lenient mode."""
    from bicis_spark.extensions.multimodal import (
        decode_video_features,
        synth_media_video,
        video_frame_features,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    media = synth_media_video(docs)
    feats = {
        r["doc_id"]: r for r in decode_video_features(media, strict=True).collect()
    }
    for i in range(6):
        exp = _expected(i)
        for key, val in exp.items():
            assert feats[i][key] == val, (i, key)

    sampled = video_frame_features(media, every_n=2, strict=True).collect()
    by_doc: dict[int, dict[int, tuple]] = {}
    for r in sampled:
        by_doc.setdefault(r["doc_id"], {})[r["frame_no"]] = (
            r["pixel_sum"], r["dc_dequant_sum"]
        )
    for i in range(6):
        nf = synth_n_frames(i)
        assert set(by_doc[i]) == set(range(0, nf, 2))
        for f in range(0, nf, 2):
            d = decode_jpeg(synth_jpeg(synth_frame_id(i, f)))
            assert by_doc[i][f] == (d["pixel_sum"], d["dc_dequant_sum"])

    garbage = spark.createDataFrame(
        [(1, "x", bytearray(b"RIFFjunkAVI junk"), 16), (2, "x", None, 0)],
        "doc_id long, media_type string, content binary, n_bytes long",
    )
    lenient = {r["doc_id"]: r for r in decode_video_features(garbage).collect()}
    assert lenient[1]["n_frames"] is None and lenient[2]["n_frames"] is None
    assert video_frame_features(garbage).count() == 0
    with pytest.raises(Exception):
        decode_video_features(garbage, strict=True).collect()
