"""Pure-Python PNG (ISO/IEC 15948 / RFC 2083) encode/decode for the
multimodal decode surface. Reference analogue: none (the bicis reference
has no multimodal surface; BASELINE.json north-star extension).

Unlike JPEG (canonical-Huffman tables built in-stream) and MPEG Layer
III (spec-DATA code tables, parameterized seam), PNG needs NO table
data at all: the entropy layer is DEFLATE via the stdlib ``zlib`` (a
public-spec codec shipped with CPython), and everything above it is
pure structure — the 8-byte signature, length/type/CRC32 chunk framing,
IHDR geometry, and the five per-scanline prediction filters (None, Sub,
Up, Average, Paeth). This decoder is therefore WIRE-FORMAT REAL: any
non-interlaced 8-bit grayscale/truecolor PNG from any writer decodes
here, and these synthetic payloads open in any image viewer.

Determinism contract: decode features are functions of the decoded
PIXELS (and filter-type bytes), never of the compressed representation
(zlib output length varies across zlib builds; pixel values cannot), so
the SQL oracle replays the synth pixel formulas arithmetically and a
hash MATCH proves chunk walk + CRC verification + inflate + defilter
are the exact inverse of the encoder.

Scale shape: identical to the other codecs — row-at-a-time decode
inside Arrow-batched ``mapInPandas``, one batch in flight per task; a
corrupt payload yields a NULL-feature row instead of aborting a 100 TB
scan.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left to
    the linear estimate a + b − c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward-apply filter ``ftype`` to a raw scanline (encoder side)."""
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError("invalid filter type")
        out[i] = (x - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, filt: bytes, prev: bytes, bpp: int) -> bytes:
    """Invert filter ``ftype`` over a filtered scanline (decoder side) —
    sequential because Sub/Paeth reference already-reconstructed bytes."""
    out = bytearray(len(filt))
    for i, x in enumerate(filt):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"invalid filter type {ftype}")
        out[i] = (x + pred) & 0xFF
    return bytes(out)


def encode_png(
    width: int, height: int, pixels: list[list[tuple[int, ...]]],
    filters: list[int],
) -> bytes:
    """Encode a non-interlaced 8-bit PNG. ``pixels[y][x]`` is a 1-tuple
    (grayscale, color type 0) or 3-tuple (truecolor, color type 2);
    ``filters[y]`` picks each scanline's prediction filter — the
    synthesizer cycles all five so the decoder's defilter paths are all
    exercised."""
    n_ch = len(pixels[0][0])
    color_type = 0 if n_ch == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width * n_ch)
    for y in range(height):
        row = bytes(v for px in pixels[y] for v in px)
        raw.append(filters[y])
        raw += _filter_row(filters[y], row, prev, n_ch)
        prev = row
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Walk and decode a non-interlaced 8-bit grayscale/truecolor PNG:
    signature, chunk framing with CRC32 VERIFICATION on every chunk,
    IHDR geometry checks, multi-IDAT concatenation, full inflate, and
    per-scanline defiltering (all five filter types). Integer-exact
    features:

    * ``width`` / ``height`` / ``color_type`` / ``n_pixels``
    * ``pixel_sum`` — sum over every reconstructed channel byte
    * ``filter_type_sum`` — sum of the per-scanline filter bytes (pins
      that the decoder read the filter column the encoder wrote)
    """
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG stream")
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    ended = False
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            ended = True
            pos += 12 + length
            break
        pos += 12 + length
    if pos != len(payload):
        raise ValueError("trailing bytes after IEND")
    if ihdr is None or not ended or not idat:
        raise ValueError("missing IHDR/IDAT/IEND")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if bit_depth != 8 or color_type not in (0, 2):
        raise ValueError("only 8-bit grayscale/truecolor supported")
    if comp != 0 or filt != 0:
        raise ValueError("unknown compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    n_ch = 1 if color_type == 0 else 3
    raw = zlib.decompress(bytes(idat))
    stride = width * n_ch
    if len(raw) != height * (1 + stride):
        raise ValueError("inflated size disagrees with IHDR geometry")
    pixel_sum = 0
    filter_sum = 0
    prev = bytes(stride)
    for y in range(height):
        at = y * (1 + stride)
        ftype = raw[at]
        filter_sum += ftype
        row = _unfilter_row(ftype, raw[at + 1 : at + 1 + stride], prev, n_ch)
        pixel_sum += sum(row)
        prev = row
    return {
        "width": width,
        "height": height,
        "color_type": color_type,
        "n_pixels": width * height,
        "pixel_sum": pixel_sum,
        "filter_type_sum": filter_sum,
    }


# --- deterministic synthesis (the test-data encoder the oracle replays) ---


def synth_png(doc_id: int) -> bytes:
    """Deterministic PNG: width 4 + id%5, height 3 + id%4; even ids are
    grayscale v(x,y) = (id·31 + y·w·1 + x·1) % 256, odd ids truecolor
    with channel ch at (id·31 + (y·w + x)·3 + ch) % 256; scanline y uses
    filter (id + y) % 5 — every defilter path exercised across the
    corpus. The oracle replays these formulas; the compressed bytes in
    between are zlib's business."""
    w = 4 + doc_id % 5
    h = 3 + doc_id % 4
    n_ch = 1 if doc_id % 2 == 0 else 3
    pixels = [
        [
            tuple(
                (doc_id * 31 + (y * w + x) * n_ch + ch) % 256
                for ch in range(n_ch)
            )
            for x in range(w)
        ]
        for y in range(h)
    ]
    filters = [(doc_id + y) % 5 for y in range(h)]
    return encode_png(w, h, pixels, filters)
