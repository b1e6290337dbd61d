"""Pure-stdlib image codecs for the multimodal decode seam.

The container has no Pillow/libvips/ffmpeg, but PNG needs only ``zlib``
(stdlib) plus the five RFC-2083 scanline filters, and uncompressed BMP /
GIF headers need only ``struct``.  This module turns the multimodal
metadata operator from header-sniffing into REAL decoded-pixel statistics
(reference analog: the brightness/contrast probe of the OCR preprocessing
family, /root/reference/ocrfw/preprocessing.py:48-53) with no new
dependency.

Decoders:
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA), non-interlaced; full IDAT inflate + unfiltering (None/Sub/
  Up/Average/Paeth).
- BMP: BITMAPINFOHEADER, 24 bpp, BI_RGB (uncompressed), bottom-up rows.
- GIF: GIF87a/GIF89a single-frame FULL decode — logical-screen header,
  global/local palette, LZW image data (LSB-first codes, CLEAR/END,
  12-bit dictionary growth) -> RGB pixels.

Statistics use INTEGER luma accumulation (luma1000 = 299R + 587G + 114B,
or 1000V for gray) so the sums are exact in any engine's 64-bit integers
— the DuckDB oracle replays brightness/contrast bit-for-bit from the
synthetic pixel pattern without ever decoding a PNG.

``encode_png`` is the deterministic fixture source: it can emit every
filter type (row index mod 5) so decode exercises all five predictors.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> channel count (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

#: decoded-buffer ceiling (bytes): headers are UNTRUSTED, and a 54-byte
#: payload advertising 2^31 x 2^31 dims (or a zlib bomb) must fail as a
#: contained ValueError, never as a near-2^63 allocation / MemoryError
#: that defeats per-row containment.  256 MB ~ a 9000x9000 RGBA frame —
#: far above anything a crawl-pipeline thumbnail stage should decode.
MAX_DECODED_BYTES = 1 << 28


def _check_decoded_size(width: int, height: int, channels: int) -> None:
    if width <= 0 or height <= 0 or width * height * channels > MAX_DECODED_BYTES:
        raise ValueError(
            f"refusing image of {width}x{height}x{channels} "
            f"(> {MAX_DECODED_BYTES} decoded bytes or non-positive dims)"
        )


# --------------------------------------------------------------------------
# PNG encode (fixture source)
# --------------------------------------------------------------------------


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to a raw scanline (encoder side)."""
    n = len(row)
    out = bytearray(n)
    for i in range(n):
        x = row[i]
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            v = x
        elif ftype == 1:
            v = x - a
        elif ftype == 2:
            v = x - b
        elif ftype == 3:
            v = x - (a + b) // 2
        elif ftype == 4:
            v = x - _paeth(a, b, c)
        else:
            raise ValueError(f"bad filter {ftype}")
        out[i] = v & 0xFF
    return bytes(out)


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filter_choice=lambda y: 0,
) -> bytes:
    """Encode 8-bit pixels (row-major, ``channels`` bytes per pixel) as a
    valid PNG.  ``filter_choice(y)`` picks the filter per scanline —
    fixtures use ``y % 5`` so a decoder must invert all five predictors to
    recover the pattern."""
    ch = _PNG_CHANNELS[color_type]
    # ValueError (not assert): asserts strip under `python -O`, which would
    # let a mismatched buffer silently encode a corrupt PNG — fail fast
    # with the same error contract as the decoders (ADVICE r4)
    if len(pixels) != width * height * ch:
        raise ValueError(
            f"pixel buffer {len(pixels)} bytes does not match "
            f"{width}x{height}x{ch} dims"
        )
    stride = width * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        f = filter_choice(y)
        raw.append(f)
        raw += _filter_row(f, row, prev, ch)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# PNG decode
# --------------------------------------------------------------------------


def _unfilter_row(ftype: int, row: bytearray, prev: bytes, bpp: int) -> None:
    """Invert PNG filter ``ftype`` in place (decoder side)."""
    n = len(row)
    for i in range(n):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            v = row[i]
        elif ftype == 1:
            v = row[i] + a
        elif ftype == 2:
            v = row[i] + b
        elif ftype == 3:
            v = row[i] + (a + b) // 2
        elif ftype == 4:
            v = row[i] + _paeth(a, b, c)
        else:
            raise ValueError(f"bad filter {ftype}")
        row[i] = v & 0xFF


def decode_png(payload: bytes) -> dict:
    """Full PNG decode -> {format, width, height, channels, pixels}.

    ``pixels`` is the raw 8-bit row-major buffer (``channels`` bytes per
    pixel).  Supports bit depth 8, color types 0/2/4/6, non-interlaced —
    the envelope ``encode_png`` emits plus common real-world truecolor
    files.  Raises ValueError on anything else (palette/16-bit/interlace
    need a fuller library; the seam stays explicit)."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color_type={color_type} interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color_type]
    _check_decoded_size(width, height, ch)
    stride = width * ch
    expected = (stride + 1) * height
    # capped inflate: a zlib bomb must not expand past the advertised
    # size before the length check can reject it
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) != expected or d.unconsumed_tail or d.decompress(b"", 1):
        raise ValueError("PNG data length mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        _unfilter_row(f, row, prev, ch)
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return {
        "format": "png",
        "width": width,
        "height": height,
        "channels": ch,
        "pixels": bytes(out),
    }


# --------------------------------------------------------------------------
# BMP decode (24 bpp uncompressed)
# --------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> dict:
    """Uncompressed 24-bpp BITMAPINFOHEADER BMP -> RGB pixel buffer.

    BMP stores BGR bottom-up with rows padded to 4 bytes; the decoder
    normalises to top-down RGB so stats match PNG semantics."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} compression={compression})")
    top_down = height < 0
    height = abs(height)
    _check_decoded_size(width, height, 3)
    row_size = (width * 3 + 3) & ~3
    if data_off + row_size * height > len(payload):
        raise ValueError("BMP pixel data truncated")
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row = payload[data_off + src_y * row_size : data_off + src_y * row_size + width * 3]
        for x in range(width):
            b, g, r = row[3 * x : 3 * x + 3]
            i = (y * width + x) * 3
            out[i : i + 3] = bytes((r, g, b))
    return {
        "format": "bmp",
        "width": width,
        "height": height,
        "channels": 3,
        "pixels": bytes(out),
    }


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bpp BI_RGB BMP from a top-down RGB buffer (fixture source)."""
    row_size = (width * 3 + 3) & ~3
    img = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            i = (y * width + x) * 3
            r, g, b = rgb[i : i + 3]
            row += bytes((b, g, r))
        row += bytes(row_size - len(row))
        img += row
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(img), 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(img), 2835, 2835, 0, 0)
    return header + info + img


# --------------------------------------------------------------------------
# GIF decode (header + full LZW pixel decode)
# --------------------------------------------------------------------------


def decode_gif_header(payload: bytes) -> dict:
    """GIF87a/89a logical-screen descriptor + global palette size (no
    pixel decode — the cheap metadata probe)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    has_gct = bool(packed & 0x80)
    gct_size = 2 ** ((packed & 0x07) + 1) if has_gct else 0
    return {
        "format": "gif",
        "width": width,
        "height": height,
        "channels": 3,
        "pixels": None,
        "palette_size": gct_size,
        "version": payload[3:6].decode("ascii"),
    }


def _lzw_decode(min_code_size: int, data: bytes, max_symbols: int | None = None) -> list[int]:
    """GIF-flavor LZW decode (LSB-first bit packing, CLEAR/END codes,
    code size grows to 12 bits as the dictionary fills).

    ``max_symbols`` bounds the OUTPUT: a crafted stream of n codes can
    legally expand to ~n^2/2 symbols, so callers pass the pixel count
    they actually need and a bomb fails as ValueError, not as an
    unbounded allocation."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    table: dict[int, list[int]] = {i: [i] for i in range(clear)}
    next_code = end + 1
    out: list[int] = []
    prev: list[int] | None = None
    pos, total = 0, len(data) * 8
    while True:
        if pos + code_size > total:
            break
        code = 0
        for i in range(code_size):
            if (data[(pos + i) >> 3] >> ((pos + i) & 7)) & 1:
                code |= 1 << i
        pos += code_size
        if code == end:
            break
        if code == clear:
            table = {i: [i] for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if prev is None:
            if code not in table:
                raise ValueError(f"corrupt LZW stream (first code {code} not in table)")
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + [entry[0]]
            next_code += 1
        elif code == next_code:
            entry = prev + [prev[0]]
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError(f"corrupt LZW stream (code {code} > next {next_code})")
        out.extend(entry)
        if max_symbols is not None and len(out) > max_symbols:
            raise ValueError("LZW stream expands past the declared pixel count")
        prev = entry
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
    return out


def decode_gif(payload: bytes) -> dict:
    """Full GIF decode: global/local palette + LZW image data -> RGB.

    Single non-interlaced image frame; extensions skipped; transparency
    ignored (pixels keep their palette color)."""
    head = decode_gif_header(payload)
    width, height = head["width"], head["height"]
    pos = 13
    gct = None
    if head["palette_size"]:
        gct = payload[pos : pos + 3 * head["palette_size"]]
        if len(gct) < 3 * head["palette_size"]:
            raise ValueError("GIF truncated inside the global color table")
        pos += 3 * head["palette_size"]
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _left, _top, iw, ih = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
        flags = payload[pos + 9]
        pos += 10
        if flags & 0x40:
            raise ValueError("interlaced GIF unsupported")
        palette = gct
        if flags & 0x80:  # local color table
            n = 2 ** ((flags & 0x07) + 1)
            palette = payload[pos : pos + 3 * n]
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image without a color table")
        _check_decoded_size(iw, ih, 3)
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        indices = _lzw_decode(min_code_size, bytes(data), max_symbols=iw * ih + 254)
        if len(indices) < iw * ih:
            raise ValueError("GIF pixel data truncated")
        out = bytearray(iw * ih * 3)
        for i in range(iw * ih):
            ci = indices[i] * 3
            out[3 * i : 3 * i + 3] = palette[ci : ci + 3]
        return {
            "format": "gif",
            "width": iw,
            "height": ih,
            "channels": 3,
            "pixels": bytes(out),
            "palette_size": head["palette_size"],
            "version": head["version"],
        }
    # no image block: header-only payload (legacy fixtures)
    return head


def encode_gif(width: int, height: int, indices: bytes, palette: bytes) -> bytes:
    """Single-frame GIF87a from palette indices (fixture source).

    Uses the classic 'uncompressed GIF' encoding: every index emitted as a
    literal 9-bit code with a CLEAR every 254 symbols, so the decoder's
    dictionary never forces a code-size change — trivially correct, and
    the DECODER's dictionary-growth paths are covered separately by the
    hand-derived LZW known-answer test."""
    assert len(palette) == 256 * 3, "fixture encoder uses a full 256-entry palette"
    min_code_size = 8
    clear, end = 256, 257
    bits: list[int] = []

    def emit(code: int) -> None:
        for i in range(9):
            bits.append((code >> i) & 1)

    emit(clear)
    for j, idx in enumerate(indices):
        if j and j % 254 == 0:
            emit(clear)
        emit(idx)
    emit(end)
    data = bytearray((len(bits) + 7) // 8)
    for i, bit in enumerate(bits):
        if bit:
            data[i >> 3] |= 1 << (i & 7)
    out = bytearray()
    out += b"GIF87a"
    out += struct.pack("<HH", width, height)
    out += bytes((0x80 | 0x07, 0, 0))  # GCT present, 256 entries
    out += palette
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out.append(min_code_size)
    d = bytes(data)
    for off in range(0, len(d), 255):
        chunk = d[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00;"
    return bytes(out)


# --------------------------------------------------------------------------
# decode dispatch + statistics
# --------------------------------------------------------------------------


def decode_image(payload: bytes) -> dict:
    """Sniff + decode: PNG / BMP / GIF, all to full pixel buffers (a GIF
    with no image block — a bare header — decodes to pixels None).

    ALWAYS raises ValueError on undecodable input: truncated payloads
    that would otherwise escape as IndexError / struct.error / zlib.error
    from the parsers are normalised here, so per-row error containment in
    callers needs exactly one except clause."""
    try:
        if payload[:8] == PNG_SIG:
            return decode_png(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return decode_gif(payload)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error, zlib.error) as e:
        raise ValueError(f"truncated/corrupt image payload: {e}") from e
    raise ValueError("unknown image format")


def sniff_image_meta(payload: bytes) -> dict | None:
    """Header-only format + dimensions probe — no pixel decode, no
    allocation proportional to the claimed dims (reference analog: the
    metadata probe before full decode, ocrfw/preprocessing.py:115-135).

    Returns ``{"format", "width", "height"}`` for recognised PNG / BMP /
    GIF / JPEG / WebP headers, ``None`` for anything else — the caller
    decides the fallback.  (JPEG/WebP get header-sniffed dims here even
    though their pixel DECODE still needs a real library.)
    Malformed-but-signatured headers (truncated IHDR, zero dims, dims
    past the PNG spec's 2^31-1 cap) also return None: a sniff must never
    raise, it runs on arbitrary crawl bytes."""
    try:
        if payload[:8] == PNG_SIG:
            if len(payload) >= 24 and payload[12:16] == b"IHDR":
                width, height = struct.unpack(">II", payload[16:24])
                # PNG dims are unsigned on the wire but the spec caps them
                # at 2^31-1; larger values are invalid AND would overflow
                # the int32 metadata schema (review finding)
                if 0 < width <= 0x7FFFFFFF and 0 < height <= 0x7FFFFFFF:
                    return {"format": "png", "width": width, "height": height}
            return None
        if payload[:2] == b"BM" and len(payload) >= 22:
            # 'BM' alone is a 2-byte magic — far too weak against arbitrary
            # crawl bytes (any text starting "BM" would sniff as an image).
            # Require the two reserved zero words and a known header size,
            # like `file`'s magic does.
            if payload[6:10] != b"\x00\x00\x00\x00":
                return None
            (hdr_size,) = struct.unpack("<I", payload[14:18])
            if hdr_size == 12:  # BITMAPCOREHEADER: 16-bit dims
                width, height = struct.unpack("<HH", payload[18:22])
            elif hdr_size in (40, 52, 56, 64, 108, 124) and len(payload) >= 26:
                width, height = struct.unpack("<ii", payload[18:26])
            else:
                return None
            # negative BMP height = top-down row order; dims still |height|
            if width > 0 and height != 0:
                return {"format": "bmp", "width": width, "height": abs(height)}
            return None
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            width, height = struct.unpack("<HH", payload[6:10])
            if width > 0 and height > 0:
                return {"format": "gif", "width": width, "height": height}
            return None
        if payload[:2] == b"\xff\xd8":
            return _sniff_jpeg(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            return _sniff_webp(payload)
    except (struct.error, IndexError):
        return None
    return None


def _sniff_jpeg(payload: bytes) -> dict | None:
    """JPEG dims from the first SOF0-SOF15 marker (JFIF/EXIF segment walk;
    public marker layout, ITU T.81 §B.2.2).  The pixel DECODE still needs
    a real library — this reads only the frame header."""
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None  # desynchronised marker stream
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if seg_len < 2:
            return None
        # SOF0-SOF15 except the DHT/DAC/JPG pseudo-markers C4/C8/CC
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > n:
                return None
            height, width = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            if width > 0 and height > 0:
                return {"format": "jpeg", "width": width, "height": height}
            return None
        if marker in (0xD9, 0xDA):  # EOI / start-of-scan before any SOF
            return None
        pos += 2 + seg_len
    return None


def _sniff_webp(payload: bytes) -> dict | None:
    """WebP dims from the first chunk header: VP8 (lossy frame tag),
    VP8L (lossless 14-bit packed dims) or VP8X (extended, 24-bit minus
    one).  Public container layout (RIFF + WebP bitstream specs)."""
    if len(payload) < 30:
        return None
    tag = payload[12:16]
    if tag == b"VP8 ":
        # lossy: 3-byte frame tag, then the 0x9d012a sync code, then dims
        if payload[23:26] != b"\x9d\x01\x2a":
            return None
        width, height = struct.unpack("<HH", payload[26:30])
        width &= 0x3FFF
        height &= 0x3FFF
    elif tag == b"VP8L":
        if payload[20] != 0x2F:  # lossless signature byte
            return None
        (bits,) = struct.unpack("<I", payload[21:25])
        width = (bits & 0x3FFF) + 1
        height = ((bits >> 14) & 0x3FFF) + 1
    elif tag == b"VP8X":
        width = 1 + int.from_bytes(payload[24:27], "little")
        height = 1 + int.from_bytes(payload[27:30], "little")
    else:
        return None
    if width > 0 and height > 0:
        return {"format": "webp", "width": width, "height": height}
    return None


def image_stats(decoded: dict) -> dict:
    """Integer-exact luminance statistics of a decoded image.

    luma1000 per pixel = 299R + 587G + 114B (gray: 1000V; alpha ignored).
    brightness = mean(luma1000)/1000, contrast = population-std of
    luma1000/1000 — both derived from exact integer sums, so any engine
    reproduces them bit-for-bit from the same pixel values."""
    px, ch = decoded["pixels"], decoded["channels"]
    n = decoded["width"] * decoded["height"]
    if px is None or n == 0:
        return {"brightness": None, "contrast": None, "min_luma": None, "max_luma": None}
    import numpy as np  # exact int64 accumulation, vectorised

    a = np.frombuffer(px, dtype=np.uint8).reshape(n, ch).astype(np.int64)
    if ch >= 3:
        luma = 299 * a[:, 0] + 587 * a[:, 1] + 114 * a[:, 2]
    else:
        luma = 1000 * a[:, 0]
    s = int(luma.sum())
    s2 = int((luma * luma).sum())
    lo, hi = int(luma.min()), int(luma.max())
    mean = s / n
    var = s2 / n - mean * mean
    import math  # math.sqrt == SQL sqrt (IEEE correctly rounded); x**0.5 is pow()

    return {
        "brightness": mean / 1000.0,
        "contrast": math.sqrt(max(var, 0.0)) / 1000.0,
        "min_luma": lo / 1000.0,
        "max_luma": hi / 1000.0,
    }


# --------------------------------------------------------------------------
# deterministic fixture source
# --------------------------------------------------------------------------


def synth_image(doc_id: int) -> bytes:
    """Deterministic synthetic image for ``doc_id`` — REAL encoded bytes.

    The pixel pattern has a closed form the DuckDB oracle recomputes
    analytically (it never decodes a PNG):

        kind   = doc_id % 4   (0: PNG RGB, 1: PNG gray, 2: BMP,
                               3: GIF gray-palette — analytic luma 1000*v)
        w      = 8 + doc_id % 9;  h = 8 + (3*doc_id) % 9
        px(x, y, c) = (7x + 13y + 31*doc_id + 57c) % 256

    PNGs cycle the scanline filter (y % 5), so decoding them exercises all
    five RFC-2083 predictors — a decoder bug shifts the pixels and the
    analytic stats stop matching."""
    d = int(doc_id)
    w, h = 8 + d % 9, 8 + (3 * d) % 9
    kind = d % 4

    def val(x: int, y: int, c: int) -> int:
        return (7 * x + 13 * y + 31 * d + 57 * c) % 256

    if kind == 3:
        # real single-frame GIF: grayscale 256-entry palette (palette[i] =
        # (i,i,i)) with the kind-1 gray pattern as palette indices, so the
        # oracle's analytic luma is 1000*v exactly like PNG-gray
        palette = bytes(v for i in range(256) for v in (i, i, i))
        idx = bytes(val(x, y, 0) for y in range(h) for x in range(w))
        return encode_gif(w, h, idx, palette)

    if kind == 1:
        px = bytes(val(x, y, 0) for y in range(h) for x in range(w))
        return encode_png(w, h, px, color_type=0, filter_choice=lambda y: y % 5)
    px = bytes(val(x, y, c) for y in range(h) for x in range(w) for c in range(3))
    if kind == 0:
        return encode_png(w, h, px, color_type=2, filter_choice=lambda y: y % 5)
    return encode_bmp(w, h, px)
