"""From-scratch baseline-TIFF codec — pure stdlib.

TIFF is THE classic scanned-document format, the native habitat of OCR
pipelines (the reference repo ingests document images through OpenCV,
``cv2.imread`` /root/reference/ocrfw/ocr.py:18-24, which reads TIFF via
libtiff).  This module decodes the baseline profile that covers real
scanner output:

- both byte orders (``II`` little-endian, ``MM`` big-endian),
- 8-bit samples, 1 (grayscale) / 3 (RGB) / 4 (RGBA) samples per pixel,
- strip organisation (``RowsPerStrip`` / ``StripOffsets`` /
  ``StripByteCounts``),
- Compression 1 (none), 32773 (PackBits RLE) and 5 (TIFF-LZW: MSB-first
  code packing with the early code-size change — NOT the GIF LZW in
  ``imagecodec``, which is LSB-first without early change),
- Predictor 2 (horizontal differencing per sample channel).

The ENCODER is the fixture source: a real writer for the same profile so
round-trip tests drive every decoder path (each compression × predictor ×
endianness × channel count) with independent forward code.

Divergence contract: tiled TIFFs, bit depths other than 8, planar
configuration 2 and exotic compressions (G4 fax, JPEG-in-TIFF) raise
``ValueError`` — same per-row containment contract as the other codecs
(one hostile payload in a 100 TB crawl becomes an auditable error row,
never a stage failure).  Hostile headers are refused before any
allocation proportional to the claimed dims (``MAX_DECODED_BYTES``),
LZW output is capped at the expected strip size, and every strip read is
bounds-checked against the payload.
"""

from __future__ import annotations

import struct

from .imagecodec import MAX_DECODED_BYTES, _check_decoded_size

#: hostile-header guard: a crafted IFD can claim millions of entries
MAX_IFD_ENTRIES = 4096

# Baseline tag ids (TIFF 6.0 specification, Adobe, public)
_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS_PER_SAMPLE = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTE_COUNTS = 279
_TAG_PREDICTOR = 317

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4, 11: 4, 12: 8}


def _read_ifd(data: bytes, endian: str) -> dict:
    """First-IFD tag map: tag -> list of integer values (types 1/3/4)."""
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF IFD offset out of range")
    (n_entries,) = struct.unpack_from(endian + "H", data, ifd_off)
    if n_entries > MAX_IFD_ENTRIES:
        raise ValueError("TIFF IFD entry count over cap")
    tags: dict = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        if base + 12 > len(data):
            raise ValueError("TIFF IFD truncated")
        tag, typ, count = struct.unpack_from(endian + "HHI", data, base)
        size = _TYPE_SIZES.get(typ)
        if size is None or count == 0 or count > MAX_DECODED_BYTES:
            continue  # unknown type / empty value: skip tag (spec-sanctioned)
        total = size * count
        if total <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(endian + "I", data, base + 8)
        if voff + total > len(data):
            raise ValueError("TIFF tag value out of range")
        if typ in (3,):  # SHORT
            vals = list(struct.unpack_from(endian + f"{count}H", data, voff))
        elif typ in (4,):  # LONG
            vals = list(struct.unpack_from(endian + f"{count}I", data, voff))
        elif typ in (1, 6, 7):  # BYTE-ish
            vals = list(data[voff : voff + count])
        else:
            continue  # ASCII/RATIONAL etc.: not needed for baseline decode
        tags[tag] = vals
    return tags


def _unpackbits(src: bytes, expected: int) -> bytes:
    """PackBits RLE (Apple, in TIFF 6.0 spec): output capped at expected."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < expected:
        b = src[i]
        i += 1
        if b < 128:  # literal run of b+1 bytes
            if i + b + 1 > n:
                raise ValueError("PackBits literal overruns strip")
            out += src[i : i + b + 1]
            i += b + 1
        elif b > 128:  # replicate next byte 257-b times
            if i >= n:
                raise ValueError("PackBits replicate overruns strip")
            out += bytes([src[i]]) * (257 - b)
            i += 1
        # b == 128: no-op per spec
    if len(out) < expected:
        raise ValueError("PackBits strip shorter than expected")
    return bytes(out[:expected])


def _lzw_decode(src: bytes, expected: int) -> bytes:
    """TIFF-LZW: 256=Clear, 257=EOI, MSB-first bit packing, EARLY code
    width change (width bumps when next code would be table size + 1 —
    one code earlier than GIF).  Output capped at ``expected``."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    bitbuf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in src:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                reset()
                prev = None
                continue
            if code == 257:
                if len(out) < expected:
                    raise ValueError("TIFF LZW ended before expected output")
                return bytes(out[:expected])
            if prev is None:
                if code >= len(table) or not table[code]:
                    raise ValueError("TIFF LZW bad first code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if not entry:
                    raise ValueError("TIFF LZW reference to empty slot")
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("TIFF LZW code out of range")
            out += entry
            if len(out) > expected:
                raise ValueError("TIFF LZW output over expected strip size")
            prev = entry
            # EARLY change, decoder side: the decoder's table lags the
            # encoder's by ONE entry at read time (the encoder adds its
            # entry before emitting the next code), so it must widen one
            # entry earlier than the encoder's 511/1023/2047 thresholds
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
    raise ValueError("TIFF LZW stream ended without EOI")


def _undo_predictor(row: bytearray, spp: int) -> None:
    for i in range(spp, len(row)):
        row[i] = (row[i] + row[i - spp]) & 0xFF


def decode_tiff(payload: bytes) -> dict:
    """Decode a baseline TIFF to {'format','width','height','channels',
    'pixels'} (8-bit interleaved samples, rows top-down)."""
    if len(payload) < 8:
        raise ValueError("TIFF payload too short")
    if payload[:4] == b"II*\x00":
        endian = "<"
    elif payload[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF payload")
    tags = _read_ifd(payload, endian)

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w = one(_TAG_WIDTH)
    h = one(_TAG_HEIGHT)
    spp = one(_TAG_SAMPLES_PER_PIXEL, 1)
    if spp not in (1, 3, 4):
        raise ValueError(f"unsupported TIFF samples/pixel {spp}")
    bps = tags.get(_TAG_BITS_PER_SAMPLE, [8])
    if any(b != 8 for b in bps):
        raise ValueError("only 8-bit TIFF samples supported")
    _check_decoded_size(w, h, spp)
    compression = one(_TAG_COMPRESSION, 1)
    predictor = one(_TAG_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    rows_per_strip = one(_TAG_ROWS_PER_STRIP, h)
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_BYTE_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip tables missing or mismatched")
    if rows_per_strip <= 0:
        raise ValueError("TIFF RowsPerStrip non-positive")
    expected_strips = (h + rows_per_strip - 1) // rows_per_strip
    if len(offsets) != expected_strips:
        raise ValueError("TIFF strip count does not match dims")

    row_bytes = w * spp
    out = bytearray()
    rows_done = 0
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(payload):
            raise ValueError("TIFF strip out of range")
        strip_rows = min(rows_per_strip, h - rows_done)
        expected = strip_rows * row_bytes
        raw = payload[off : off + cnt]
        if compression == 1:
            if len(raw) < expected:
                raise ValueError("TIFF uncompressed strip too short")
            data = raw[:expected]
        elif compression == 32773:
            data = _unpackbits(raw, expected)
        elif compression == 5:
            data = _lzw_decode(raw, expected)
        else:
            raise ValueError(f"unsupported TIFF compression {compression}")
        if predictor == 2:
            buf = bytearray(data)
            for r in range(strip_rows):
                row = buf[r * row_bytes : (r + 1) * row_bytes]
                _undo_predictor(row, spp)
                buf[r * row_bytes : (r + 1) * row_bytes] = row
            data = bytes(buf)
        out += data
        rows_done += strip_rows
    if rows_done != h:
        raise ValueError("TIFF strips do not cover image height")
    return {
        "format": "tiff",
        "width": w,
        "height": h,
        "channels": spp,
        "pixels": bytes(out),
    }


def sniff_tiff_meta(payload: bytes) -> dict | None:
    """Header-only dims probe (the sniff_image_meta contract: never
    raises, no dim-proportional allocation)."""
    try:
        if payload[:4] == b"II*\x00":
            endian = "<"
        elif payload[:4] == b"MM\x00*":
            endian = ">"
        else:
            return None
        tags = _read_ifd(payload, endian)
        w = tags.get(_TAG_WIDTH, [0])[0]
        h = tags.get(_TAG_HEIGHT, [0])[0]
        if 0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF:
            return {"format": "tiff", "width": w, "height": h}
        return None
    except (ValueError, struct.error, IndexError):
        return None


# ---------------------------------------------------------------------------
# Encoder (fixture source; forward twin of every decoder path)
# ---------------------------------------------------------------------------


def _packbits(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal stretch until the next >=3 run (2-runs inside literals
        # are cheaper left literal)
        start = i
        i += 1
        while i < n and i - start < 128:
            run = 1
            while i + run < n and data[i + run] == data[i] and run < 128:
                run += 1
            if run >= 3:
                break
            i += run
            if i - start > 128:
                i = start + 128
                break
        out += bytes([i - start - 1]) + data[start:i]
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-LZW forward twin: fresh string table, MSB-first packing,
    early code-width change, Clear at start + on table full, EOI at end."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9

    def emit(code: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    emit(256)  # Clear
    s = b""
    for byte in data:
        c = s + bytes([byte])
        if c in table:
            s = c
            continue
        emit(table[s])
        table[c] = next_code
        next_code += 1
        # decoder bumps when len(table)+1 >= 1<<width; mirror it: after
        # adding code N the decoder's table holds N-257 entries... keep
        # the simple invariant: widen when the next code to EMIT needs it
        if next_code + 1 >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # near 12-bit cap: reset the dictionary
            emit(256)
            table = fresh()
            next_code = 258
            width = 9
        s = bytes([byte])
    if s:
        emit(table[s])
    emit(257)  # EOI
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    compression: int = 1,
    predictor: int = 1,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Real (fixture-grade) baseline-TIFF writer: strips, both endians,
    none/PackBits/LZW compression, optional horizontal predictor."""
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer length mismatch")
    if channels not in (1, 3, 4):
        raise ValueError("channels must be 1, 3 or 4")
    if compression not in (1, 5, 32773):
        raise ValueError("unsupported compression")
    endian = ">" if big_endian else "<"
    rps = rows_per_strip or height
    row_bytes = width * channels
    strips = []
    for y0 in range(0, height, rps):
        rows = min(rps, height - y0)
        data = bytearray(pixels[y0 * row_bytes : (y0 + rows) * row_bytes])
        if predictor == 2:
            for r in range(rows):
                row = data[r * row_bytes : (r + 1) * row_bytes]
                for i in range(len(row) - 1, channels - 1, -1):
                    row[i] = (row[i] - row[i - channels]) & 0xFF
                data[r * row_bytes : (r + 1) * row_bytes] = row
        raw = bytes(data)
        if compression == 32773:
            raw = _packbits(raw)
        elif compression == 5:
            raw = _lzw_encode(raw)
        strips.append(raw)

    n_strips = len(strips)
    # layout: header(8) | IFD | [offset arrays] | strip data
    tag_list = [
        (_TAG_WIDTH, 4, 1, [width]),
        (_TAG_HEIGHT, 4, 1, [height]),
        (_TAG_BITS_PER_SAMPLE, 3, channels, [8] * channels),
        (_TAG_COMPRESSION, 3, 1, [compression]),
        (_TAG_PHOTOMETRIC, 3, 1, [1 if channels == 1 else 2]),
        (_TAG_STRIP_OFFSETS, 4, n_strips, None),  # patched below
        (_TAG_SAMPLES_PER_PIXEL, 3, 1, [channels]),
        (_TAG_ROWS_PER_STRIP, 4, 1, [rps]),
        (_TAG_STRIP_BYTE_COUNTS, 4, n_strips, [len(s) for s in strips]),
    ]
    if predictor == 2:
        tag_list.append((_TAG_PREDICTOR, 3, 1, [2]))
    tag_list.sort()
    ifd_off = 8
    extra_off = ifd_off + 2 + 12 * len(tag_list) + 4
    # extra block layout is order-deterministic, so strip offsets are
    # computable before encoding: sum the sizes of all >4-byte values
    extra_len = sum(
        _TYPE_SIZES[typ] * count
        for _, typ, count, _ in tag_list
        if _TYPE_SIZES[typ] * count > 4
    )
    data_off = extra_off + extra_len
    offsets = []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)

    extra = bytearray()
    out = bytearray()
    out += b"MM\x00*" if big_endian else b"II*\x00"
    out += struct.pack(endian + "I", ifd_off)
    out += struct.pack(endian + "H", len(tag_list))
    for tag, typ, count, vals in tag_list:
        if tag == _TAG_STRIP_OFFSETS:
            vals = offsets
        fmt = {3: "H", 4: "I"}[typ]
        packed = struct.pack(endian + fmt * count, *vals)
        if len(packed) <= 4:
            vf = packed.ljust(4, b"\x00")
        else:
            vf = struct.pack(endian + "I", extra_off + len(extra))
            extra += packed
        out += struct.pack(endian + "HHI", tag, typ, count) + vf
    out += struct.pack(endian + "I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def synth_tiff(doc_id: int) -> bytes:
    """Deterministic baseline TIFF with the same closed-form pixel pattern
    as the other fixture codecs: w = 4*(1+d%4), h = 4*(1+(3d)%4), RGB with
      r = (11x + 17y + 23d) % 256
      g = (7x + 13y + 31d) % 256
      b = (5x + 3y + d) % 256.
    The encoder variant cycles with d over compression (none / PackBits /
    LZW), predictor, endianness and multi-strip layout — decoded pixels
    are IDENTICAL regardless (lossless), so the oracle replays only the
    formula."""
    d = int(doc_id)
    w = 4 * (1 + d % 4)
    h = 4 * (1 + (3 * d) % 4)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(
                (
                    (11 * x + 17 * y + 23 * d) % 256,
                    (7 * x + 13 * y + 31 * d) % 256,
                    (5 * x + 3 * y + d) % 256,
                )
            )
    variant = d % 6
    return encode_tiff(
        w,
        h,
        bytes(px),
        channels=3,
        compression=[1, 32773, 5, 5, 1, 32773][variant],
        predictor=2 if variant in (3, 5) else 1,
        big_endian=variant in (1, 4),
        rows_per_strip=5 if variant >= 3 else None,  # multi-strip + ragged tail
    )
