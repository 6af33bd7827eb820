"""Pure-Python RIFF/AVI (MJPEG) container for the multimodal VIDEO
surface — the round-9 upgrade of ``frame_sample``'s byte-slicing stand-in
to a real demux-then-decode pipeline. Reference analogue: none (the
bicis reference has no multimodal surface; BASELINE.json north-star).

An AVI file is plain RIFF structure (the same chunk discipline as WAV,
public spec): ``RIFF('AVI ')`` containing a ``LIST('hdrl')`` with the
56-byte ``avih`` main header and a per-stream ``LIST('strl')``
(``strh`` stream header + ``strf`` BITMAPINFOHEADER), a ``LIST('movi')``
whose ``00dc`` chunks each carry one compressed frame, and an ``idx1``
index whose entries point back at the movi chunks. With the codec
``MJPG``, every frame payload is a standalone baseline JPEG — so the
container walk composes with the real JPEG decoder in
``extensions/jpeg.py`` and the whole video pipeline (demux → per-frame
entropy decode → IDCT features) is implementable from public structure
with zero codec libraries.

Determinism contract: the synthesizer derives frame ``f`` of video
``doc_id`` from the existing JPEG formulas at ``jid = doc_id +
6000·(f+1)`` (6000 ≡ 0 mod 6 keeps width/height — functions of id%3 and
id%2 — constant across a video's frames, as a real stream requires),
so the SQL oracle replays per-frame features arithmetically and a hash
MATCH proves the demux walk, the idx1 verification, AND the per-frame
JPEG decode.

Scale shape: videos are single binary cells decoded row-at-a-time
inside Arrow-batched ``mapInPandas`` (one batch in flight per task);
at 100 TB, >>1 MB assets live behind object-store URIs and the demux
stage streams frames without materializing the whole file per row —
the per-frame decode cost is the same either way.
"""

from __future__ import annotations

import struct

from bicis_spark.extensions.jpeg import decode_jpeg, synth_jpeg, synth_jpeg_coeffs

#: AVIF_HASINDEX / AVIIF_KEYFRAME (spec flag constants)
_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def synth_frame_id(doc_id: int, f: int) -> int:
    """Frame f's JPEG-formula id: ≡ doc_id mod 6, so all frames of one
    video share dimensions (the stream-header contract)."""
    return doc_id + 6000 * (f + 1)


def synth_n_frames(doc_id: int) -> int:
    return 2 + doc_id % 4


def synth_us_per_frame(doc_id: int) -> int:
    return 33333 + (doc_id % 5) * 1000


def synth_avi(doc_id: int) -> bytes:
    """Deterministic MJPEG AVI: 2 + id%4 frames of the JPEG-formula
    payloads at ``synth_frame_id``, full hdrl/strl headers, even-padded
    00dc movi chunks, and a spec idx1 (offsets from the 'movi' fourcc)."""
    nf = synth_n_frames(doc_id)
    frames = [synth_jpeg(synth_frame_id(doc_id, f)) for f in range(nf)]
    width, height, _ = synth_jpeg_coeffs(synth_frame_id(doc_id, 0))
    usf = synth_us_per_frame(doc_id)
    sug = max(len(fr) for fr in frames)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        usf, 0, 0, _AVIF_HASINDEX, nf, 0, 1, sug, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI4H", 0, 0, 0, 0, usf, 1_000_000, 0, nf,
                      sug, -1, 0, 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = bytearray()
    idx = bytearray()
    for fr in frames:
        # idx1 offsets point at the chunk fourcc, measured from the
        # 'movi' fourcc itself (offset 4 = first chunk)
        idx += struct.pack("<4sII I".replace(" ", ""), b"00dc",
                           _AVIIF_KEYFRAME, 4 + len(movi_payload), len(fr))
        movi_payload += _chunk(b"00dc", fr)
    movi = _list(b"movi", bytes(movi_payload))
    idx1 = _chunk(b"idx1", bytes(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def demux_avi(payload: bytes) -> dict:
    """Walk a single-video-stream MJPEG AVI: verify RIFF/AVI framing,
    parse avih + strh/strf (handler and compression must be MJPG), list
    the movi 00dc frames, and CHECK the idx1 index against the walked
    chunks (ckid, offset, size — a corrupt index is a loud error, not a
    skipped structure). Returns header fields + raw frame payloads."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_size != len(payload):
        raise ValueError("RIFF size does not match payload length")

    avih = None
    strh = strf = None
    frames: list[bytes] = []
    frame_offsets: list[tuple[int, int]] = []  # (offset from movi fourcc, size)
    idx_entries: list[tuple[bytes, int, int]] = []

    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated chunk")
        if fourcc == b"LIST":
            kind = body[:4]
            if kind == b"hdrl":
                sub = 4
                while sub + 8 <= len(body):
                    sf = body[sub : sub + 4]
                    (ss,) = struct.unpack_from("<I", body, sub + 4)
                    sb = body[sub + 8 : sub + 8 + ss]
                    if sf == b"avih":
                        if ss < 56:
                            raise ValueError("short avih header")
                        avih = struct.unpack_from("<IIIIIIIIII", sb, 0)
                    elif sf == b"LIST" and sb[:4] == b"strl":
                        s2 = 4
                        while s2 + 8 <= len(sb):
                            f2 = sb[s2 : s2 + 4]
                            (z2,) = struct.unpack_from("<I", sb, s2 + 4)
                            b2 = sb[s2 + 8 : s2 + 8 + z2]
                            if f2 == b"strh":
                                strh = b2
                            elif f2 == b"strf":
                                strf = b2
                            s2 += 8 + z2 + (z2 % 2)
                    sub += 8 + ss + (ss % 2)
            elif kind == b"movi":
                sub = 4
                while sub + 8 <= len(body):
                    sf = body[sub : sub + 4]
                    (ss,) = struct.unpack_from("<I", body, sub + 4)
                    if sf == b"00dc":
                        frames.append(bytes(body[sub + 8 : sub + 8 + ss]))
                        frame_offsets.append((sub, ss))
                    sub += 8 + ss + (ss % 2)
        elif fourcc == b"idx1":
            for e in range(size // 16):
                ck, fl, off, sz = struct.unpack_from("<4sIII", body, e * 16)
                idx_entries.append((ck, off, sz))
        pos += 8 + size + (size % 2)
    if pos != len(payload):
        raise ValueError("trailing bytes after last RIFF chunk")

    if avih is None or strh is None or strf is None:
        raise ValueError("missing avih/strh/strf headers")
    if strh[:4] != b"vids" or strh[4:8] != b"MJPG":
        raise ValueError("not an MJPG video stream")
    if strf[16:20] != b"MJPG":
        raise ValueError("strf compression is not MJPG")
    us_per_frame, _, _, flags, total_frames = avih[:5]
    width, height = avih[8], avih[9]
    if total_frames != len(frames):
        raise ValueError("avih total_frames does not match movi chunks")
    if flags & _AVIF_HASINDEX:
        if len(idx_entries) != len(frames):
            raise ValueError("idx1 entry count does not match frames")
        for (ck, off, sz), (foff, fsz) in zip(idx_entries, frame_offsets):
            if ck != b"00dc" or off != foff or sz != fsz:
                raise ValueError("idx1 entry disagrees with movi layout")
    return {
        "us_per_frame": us_per_frame,
        "n_frames": len(frames),
        "width": width,
        "height": height,
        "frames": frames,
    }


def decode_avi_features(payload: bytes) -> dict:
    """Demux + per-frame JPEG decode: aggregate integer-exact features
    over every frame, enforcing that each frame's decoded dimensions
    match the stream header (a real container invariant)."""
    v = demux_avi(payload)
    pixel_sum = dc_sum = coef_sum = 0
    for fr in v["frames"]:
        d = decode_jpeg(fr)
        if (d["width"], d["height"]) != (v["width"], v["height"]):
            raise ValueError("frame dimensions disagree with stream header")
        pixel_sum += d["pixel_sum"]
        dc_sum += d["dc_dequant_sum"]
        coef_sum += d["coef_abs_sum"]
    return {
        "width": v["width"],
        "height": v["height"],
        "n_frames": v["n_frames"],
        "us_per_frame": v["us_per_frame"],
        "duration_us": v["n_frames"] * v["us_per_frame"],
        "pixel_sum": pixel_sum,
        "dc_dequant_sum": dc_sum,
        "coef_abs_sum": coef_sum,
    }
