"""GIF89a codec tests (extensions/gif.py): LZW round-trip matrix
(including KwKwK, dictionary resets, width-boundary flushes), container
walk robustness, and the Spark decode surface."""

from __future__ import annotations

import random

import pytest

from bicis_spark.extensions.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
    synth_gif,
)


def _expected(doc_id: int) -> dict:
    w, h = 5 + doc_id % 4, 4 + doc_id % 3
    nc = 2 << (1 + doc_id % 3)
    nf = 1 + doc_id % 3
    pal = [
        ((doc_id + j * 17) % 256)
        + ((doc_id * 3 + j * 29) % 256)
        + ((doc_id * 7 + j * 41) % 256)
        for j in range(nc)
    ]
    idx = [
        (doc_id * 31 + f * 7 + y * w + x) % nc
        for f in range(nf)
        for y in range(h)
        for x in range(w)
    ]
    return {
        "width": w,
        "height": h,
        "n_colors": nc,
        "n_frames": nf,
        "delay_cs_sum": sum(3 + (doc_id + f) % 7 for f in range(nf)),
        "index_sum": sum(idx),
        "rgb_sum": sum(pal[i] for i in idx),
    }


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 5, 7, 11, 123, 4999])
def test_decode_inverts_synth(doc_id):
    assert decode_gif(synth_gif(doc_id)) == _expected(doc_id)


def test_lzw_matrix():
    """Variable-width LZW round-trips random / repetitive / constant /
    run-structured streams across code sizes — covering KwKwK (constant
    runs), width growth at every boundary, the add-less final flush on a
    boundary (the mcs=3 zeros case), and the 4096 dictionary reset."""
    rng = random.Random(7)
    for mcs in (2, 3, 4, 8):
        for n in (1, 2, 3, 20, 257, 4100):
            for idx in (
                [rng.randrange(1 << mcs) for _ in range(n)],
                [i % (1 << mcs) for i in range(n)],
                [0] * n,
                [(i // 7) % (1 << mcs) for i in range(n)],
            ):
                assert lzw_decode(lzw_encode(idx, mcs), mcs, n) == idx


def test_sub_block_framing_above_255_bytes():
    """A frame whose LZW stream exceeds one 255-byte sub-block must
    reassemble exactly (random indices compress poorly, forcing multiple
    sub-blocks)."""
    rng = random.Random(3)
    w = h = 40  # 1600 random 4-bit indices -> ~1 KB of LZW data
    palette = [(i, i, i) for i in range(16)]
    frame = [rng.randrange(16) for _ in range(w * h)]
    payload = encode_gif(w, h, palette, [frame], [5])
    d = decode_gif(payload)
    assert d["n_frames"] == 1 and d["index_sum"] == sum(frame)


def test_corrupt_payloads_raise():
    good = synth_gif(5)
    with pytest.raises(ValueError):
        decode_gif(b"")
    with pytest.raises(ValueError):
        decode_gif(b"GIF88a" + good[6:])
    with pytest.raises(ValueError):
        decode_gif(good[:-1])  # missing trailer
    with pytest.raises(ValueError):
        decode_gif(good + b"\x00")  # trailing byte
    # corrupting an LZW byte either fails the walk/frame-size checks or
    # decodes to DIFFERENT pixels — it must never reproduce the original
    # features (GIF carries no payload checksum, so a lucky corruption
    # can be a valid other stream; silence is the only failure mode)
    payload = bytearray(good)
    at = payload.index(b"\x2c") + 11  # inside the first frame's data
    payload[at + 2] ^= 0x55
    try:
        assert decode_gif(bytes(payload)) != decode_gif(good)
    except ValueError:
        pass


def test_spark_surfaces(spark):
    """decode_gif_features strict path matches the formula replay;
    garbage rows NULL out leniently."""
    from bicis_spark.extensions.multimodal import (
        decode_gif_features,
        synth_media_gif,
    )

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id long, text string"
    )
    feats = {
        r["doc_id"]: r
        for r in decode_gif_features(synth_media_gif(docs), strict=True).collect()
    }
    for i in range(8):
        for key, val in _expected(i).items():
            assert feats[i][key] == val, (i, key)

    garbage = spark.createDataFrame(
        [(1, "image/gif", bytearray(b"GIF89a junk"), 11), (2, "x", None, 0)],
        "doc_id long, media_type string, content binary, n_bytes long",
    )
    lenient = {r["doc_id"]: r for r in decode_gif_features(garbage).collect()}
    assert lenient[1]["n_frames"] is None and lenient[2]["n_frames"] is None
    with pytest.raises(Exception):
        decode_gif_features(garbage, strict=True).collect()
