"""Pure-Python GIF89a encode/decode for the multimodal decode surface.
Reference analogue: none (BASELINE.json north-star extension).

Like PNG (and unlike JPEG/MP3), GIF needs ZERO table data: the entropy
layer is LZW, whose dictionary is built FROM THE STREAM by construction
— so this decoder is WIRE-FORMAT REAL. The implementation covers the
public-spec structure end to end: the GIF89a header and logical screen
descriptor, the global color table, graphic-control extensions (frame
delays), per-frame image descriptors, the variable-width LSB-first LZW
code stream (clear/EOI codes, width growth at dictionary boundaries,
the KwKwK self-referencing case), sub-block framing, and the trailer.
Animated GIFs decode as multi-frame sequences — a second real
animation container beside the MJPEG AVI.

Determinism contract: features are functions of decoded pixel INDICES
and the color table (never of the compressed representation), so the
SQL oracle replays the synth formulas arithmetically and a hash MATCH
proves the LZW round-trip, the sub-block walk, AND the palette mapping.

Scale shape: identical to the other codecs — row-at-a-time decode
inside Arrow-batched ``mapInPandas``; a corrupt payload yields a
NULL-feature row instead of aborting a 100 TB scan.
"""

from __future__ import annotations

import struct


def lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Real LZW (GIF variant): variable-width codes, LSB-first bit
    packing, leading CLEAR, trailing EOI, dictionary reset at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w: tuple[int, ...] = ()
    for k in indices:
        if k >= clear:
            raise ValueError("index out of palette range")
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        # canonical GIF pairing: grow as soon as next_code REACHES the
        # width ceiling (wasting one code point), so the decoder — whose
        # table runs one entry behind and cannot see that the final
        # flush emission adds no entry — can grow deterministically one
        # entry earlier and stay in sync through the eoi
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w], width)
        # the decoder builds a (phantom) entry from EVERY code it reads,
        # including this final flush — mirror its count so the width for
        # the EOI stays paired when the flush lands on a growth boundary
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> list[int]:
    """Invert the GIF LZW stream: variable-width LSB-first codes, clear
    resets, width growth one step EARLIER than the encoder's emit side
    (the decoder's table is one entry behind — the standard off-by-one),
    and the KwKwK case where a code references the entry being built."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0

    def read(width: int) -> int:
        nonlocal pos
        end = pos + width
        if end > len(data) * 8:
            raise ValueError("truncated LZW stream")
        first, last = pos >> 3, (end + 7) >> 3
        chunk = int.from_bytes(data[first:last], "little")
        v = (chunk >> (pos - (first << 3))) & ((1 << width) - 1)
        pos = end
        return v

    out: list[int] = []
    table: list[tuple[int, ...]] = []
    width = min_code_size + 1
    prev: tuple[int, ...] | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW code before dictionary seeded")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            # deferred-clear convention (GIF89a appendix F): encoders stop
            # growing the dictionary at the 12-bit ceiling of 4096 entries
            # and keep emitting 12-bit codes without a clear — the decoder
            # must freeze its table at the same point or subsequent codes
            # map to wrong strings
            if len(table) < 4096:
                table.append(prev + (entry[0],))
        elif code == len(table) and len(table) < 4096:
            entry = prev + (prev[0],)  # KwKwK
            table.append(entry)
        else:
            raise ValueError("LZW code beyond dictionary")
        out.extend(entry)
        if len(out) > n_expected:
            raise ValueError("LZW output exceeds frame size")
        prev = entry
        # one code EARLIER than the encoder's next_code == 2^w rule —
        # the decoder's table is one entry behind (see encoder comment)
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    if len(out) != n_expected:
        raise ValueError("LZW output does not fill the frame")
    return out


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap raw bytes in GIF sub-block framing (≤255-byte runs + 0)."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        run = payload[i : i + 255]
        out.append(len(run))
        out += run
    out.append(0)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: list[list[int]],
    delays: list[int],
) -> bytes:
    """Encode an animated GIF89a: global color table (power-of-two
    sized), one graphic-control extension + image descriptor + LZW
    stream per frame."""
    n_colors = len(palette)
    if n_colors & (n_colors - 1) or not 2 <= n_colors <= 256:
        raise ValueError("palette size must be a power of two in [2, 256]")
    gct_bits = n_colors.bit_length() - 1
    mcs = max(2, gct_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (gct_bits - 1), 0, 0)
    for r, g, b in palette:
        out += bytes((r, g, b))
    for idx, (frame, delay) in enumerate(zip(frames, delays)):
        out += bytes((0x21, 0xF9, 4, 0x04, delay & 0xFF, delay >> 8, 0, 0))
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(mcs)
        out += _sub_blocks(lzw_encode(frame, mcs))
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> dict:
    """Walk and decode a GIF89a/87a: screen descriptor, global color
    table, extensions (graphic-control delays summed; others skipped by
    sub-block framing), per-frame image descriptors + LZW streams.
    Integer-exact features:

    * ``width`` / ``height`` / ``n_colors`` / ``n_frames``
    * ``delay_cs_sum`` — Σ graphic-control delays (centiseconds)
    * ``index_sum`` — Σ decoded pixel indices over all frames
    * ``rgb_sum`` — Σ (r+g+b) of each pixel's palette entry (pins the
      color-table parse AND the index→palette mapping)
    """
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF stream")
    if len(payload) < 13:
        raise ValueError("truncated screen descriptor")
    width, height, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if not packed & 0x80:
        raise ValueError("global color table required")
    n_colors = 2 << (packed & 0x07)
    pos = 13
    gct = []
    for _ in range(n_colors):
        gct.append(tuple(payload[pos : pos + 3]))
        pos += 3
    palette_rgb = [sum(c) for c in gct]
    n_frames = delay_sum = index_sum = rgb_sum = 0
    while True:
        if pos >= len(payload):
            raise ValueError("missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            while True:
                size = payload[pos]
                pos += 1
                if size == 0:
                    break
                if label == 0xF9 and size == 4:
                    delay_sum += struct.unpack_from("<H", payload, pos + 1)[0]
                pos += size
        elif block == 0x2C:  # image descriptor
            left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if (left, top, fw, fh) != (0, 0, width, height):
                raise ValueError("partial-canvas frames unsupported")
            if ipacked & 0x80:
                raise ValueError("local color tables unsupported")
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while True:
                size = payload[pos]
                pos += 1
                if size == 0:
                    break
                data += payload[pos : pos + size]
                pos += size
            indices = lzw_decode(bytes(data), mcs, fw * fh)
            if any(i >= n_colors for i in indices):
                raise ValueError("pixel index beyond color table")
            index_sum += sum(indices)
            rgb_sum += sum(palette_rgb[i] for i in indices)
            n_frames += 1
        else:
            raise ValueError(f"unknown block 0x{block:02x}")
    if pos != len(payload):
        raise ValueError("trailing bytes after trailer")
    if n_frames == 0:
        raise ValueError("no image frames")
    return {
        "width": width,
        "height": height,
        "n_colors": n_colors,
        "n_frames": n_frames,
        "delay_cs_sum": delay_sum,
        "index_sum": index_sum,
        "rgb_sum": rgb_sum,
    }


# --- deterministic synthesis (the test-data encoder the oracle replays) ---


def synth_gif(doc_id: int) -> bytes:
    """Deterministic animated GIF: width 5 + id%4, height 4 + id%3,
    2^(2 + id%3) colors with channel formulas, 1 + id%3 frames of pixel
    indices (id·31 + f·7 + y·w + x) % n_colors, frame delays
    3 + (id + f) % 7 cs — every formula SQL-replayable."""
    w = 5 + doc_id % 4
    h = 4 + doc_id % 3
    n_colors = 2 << (1 + doc_id % 3)  # 4/8/16
    palette = [
        (
            (doc_id + i * 17) % 256,
            (doc_id * 3 + i * 29) % 256,
            (doc_id * 7 + i * 41) % 256,
        )
        for i in range(n_colors)
    ]
    nf = 1 + doc_id % 3
    frames = [
        [
            (doc_id * 31 + f * 7 + y * w + x) % n_colors
            for y in range(h)
            for x in range(w)
        ]
        for f in range(nf)
    ]
    delays = [3 + (doc_id + f) % 7 for f in range(nf)]
    return encode_gif(w, h, palette, frames, delays)
