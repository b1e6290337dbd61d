"""From-scratch WebP-lossless (VP8L) codec — pure stdlib.

Decoder for the VP8L bitstream (the WebP *lossless* format): LSB-first
bit reader, canonical prefix codes (DEFLATE-convention bit order, simple
and normal code descriptions with 16/17/18 repeat symbols), LZ77 backward
references with the 120-entry 2D distance mapping, color cache, optional
meta-prefix (entropy image) group selection, and all four transforms
(predictor, color, subtract-green, color-indexing with sub-byte index
packing) inverted in reverse stream order.

The ENCODER here is the fixture source: a real, self-contained VP8L
writer (simple + normal code descriptions with zero-run 17/18 repeats,
optional distance-1 LZ77 runs, optional color cache, optional
subtract-green / predictor / color-transform / color-indexing forward
transforms, optional 2-group meta-prefix entropy image) so round-trip
tests drive every decoder path with independent forward code.

Reference analog: the reference repo reads document images through
OpenCV (``cv2.imread``, /root/reference/ocrfw/ocr.py:18-24) which decodes
WebP via libwebp; this engine ships its own decoder for the lossless
profile (lossy VP8 needs a full DCT video intra-frame decoder and stays
behind the documented Pillow seam in ``multimodal.py``).

Format notes are from the public "WebP Lossless Bitstream Specification"
(Google, BSD-licensed libwebp documentation).  Divergence contract:
reads past the end of a truncated stream raise ``ValueError`` (libwebp
zero-fills and renders garbage); out-of-range palette indices decode as
transparent black, matching libwebp.
"""

from __future__ import annotations

import struct

from .imagecodec import _check_decoded_size

#: hostile-header guard: same policy as the other codecs (imagecodec)
MAX_HUFFMAN_GROUPS = 1 << 16

# ---------------------------------------------------------------------------
# LSB-first bit I/O (VP8L convention; the JPEG writer in imagecodec is
# MSB-first with marker stuffing — not reusable here)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "nbytes", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position
        self.nbytes = len(data)
        self.nbits = len(data) * 8

    def peek8(self) -> int:
        """Next 8 bits without consuming (zero-padded past the end —
        callers bound-check on consume)."""
        p = self.pos
        i = p >> 3
        d = self.data
        n = self.nbytes
        v = d[i] if i < n else 0
        if i + 1 < n:
            v |= d[i + 1] << 8
        return (v >> (p & 7)) & 0xFF

    def bits(self, n: int) -> int:
        p = self.pos
        end = p + n
        if end > self.nbytes * 8:
            raise ValueError("truncated VP8L stream")
        self.pos = end
        v = 0
        shift = 0
        while n > 0:
            byte = self.data[p >> 3]
            avail = 8 - (p & 7)
            take = avail if avail < n else n
            v |= ((byte >> (p & 7)) & ((1 << take) - 1)) << shift
            shift += take
            p += take
            n -= take
        return v

    def bit(self) -> int:
        p = self.pos
        if p >= self.nbytes * 8:
            raise ValueError("truncated VP8L stream")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Canonical prefix codes (DEFLATE convention: codes assigned by (length,
# symbol), each code read/written most-significant code bit first)
# ---------------------------------------------------------------------------

#: stream order of the code-length-code lengths
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_MAX_CODE_LEN = 15


def _canonical_codes(code_lengths: list[int]) -> dict:
    """symbol -> (code, length) for nonzero lengths, canonical order."""
    by_len: dict = {}
    for sym, ln in enumerate(code_lengths):  # ascending sym: lists presorted
        if ln > 0:
            by_len.setdefault(ln, []).append(sym)
    codes: dict = {}
    code = 0
    for ln in range(1, _MAX_CODE_LEN + 1):
        for sym in by_len.get(ln, ()):
            codes[sym] = (code, ln)
            code += 1
        code <<= 1
    return codes


#: byte bit-reversal lookup: _revbits(code, n<=8) == _REV8[code << (8-n)]
_REV8 = tuple(
    sum(((b >> i) & 1) << (7 - i) for i in range(8)) for b in range(256)
)


def _revbits(v: int, n: int) -> int:
    if n <= 8:
        return _REV8[(v << (8 - n)) & 0xFF]
    r = 0
    for _ in range(n):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


class _PrefixCode:
    """Decode table: 8-bit root lookup (codes are read MSB-of-code-first
    from an LSB-first stream, so root entries are keyed by the REVERSED
    code bits), a (length, code) dict fallback for codes longer than 8
    bits, plus the 0-bit degenerate case (single used symbol decodes
    without reading).  The root is capped at 256 entries so a hostile
    stream full of 15-bit codes cannot force 32k-entry table builds per
    group."""

    __slots__ = ("table", "single", "root")

    def __init__(self, code_lengths: list[int]) -> None:
        used = [s for s, ln in enumerate(code_lengths) if ln > 0]
        if not used:
            raise ValueError("VP8L prefix code with no symbols")
        if len(used) == 1:
            self.single = used[0]
            self.table = None
            self.root = None
            return
        self.single = None
        # over-subscribed / incomplete codes are invalid streams
        kraft = sum(1 << (_MAX_CODE_LEN - ln) for ln in code_lengths if ln > 0)
        if kraft != 1 << _MAX_CODE_LEN:
            raise ValueError("invalid VP8L prefix code (Kraft sum mismatch)")
        codes = _canonical_codes(code_lengths)
        root: list = [None] * 256
        long_codes = False
        rev8 = _REV8
        for sym, (code, ln) in codes.items():
            if ln <= 8:
                entry = (sym, ln)
                for idx in range(rev8[(code << (8 - ln)) & 0xFF], 256, 1 << ln):
                    root[idx] = entry
            else:
                # codes longer than 8 leave their root slots as None ->
                # the dict walk in read() resolves them
                long_codes = True
        # the fallback dict is only reachable when a >8-bit code exists
        # (the prefix property means any <=8-bit code resolves via root)
        self.table = (
            {(ln, code): sym for sym, (code, ln) in codes.items()}
            if long_codes
            else None
        )
        self.root = root

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        entry = self.root[br.peek8()]
        if entry is not None:
            sym, ln = entry
            p = br.pos + ln
            if p > br.nbits:
                raise ValueError("truncated VP8L stream")
            br.pos = p
            return sym
        # long code (> 8 bits): bit-by-bit dict walk.  With no long codes
        # a Kraft-complete root covers all 256 slots, so a None entry is
        # unreachable — guard anyway for belt and braces.
        table = self.table
        if table is None:
            raise ValueError("corrupt VP8L prefix code stream")
        code = 0
        for ln in range(1, _MAX_CODE_LEN + 1):
            code = (code << 1) | br.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt VP8L prefix code stream")


def _read_code_lengths(br: _BitReader, alphabet_size: int) -> list[int]:
    """A 'normal' code description: code-length-code, then run-length
    coded symbol lengths (16=repeat prev nonzero, 17/18=zero runs)."""
    num_cl = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_code = _PrefixCode(cl_lengths)

    if br.bit():  # explicit max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8  # spec default when a repeat-16 precedes any literal
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev_len = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.bits(2), prev_len
            elif cl == 17:
                repeat, fill = 3 + br.bits(3), 0
            else:
                repeat, fill = 11 + br.bits(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.bit():  # simple code: 1 or 2 symbols
        num_symbols = br.bit() + 1
        if br.bit():  # first symbol is 8 bits
            sym0 = br.bits(8)
        else:
            sym0 = br.bit()
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of range")
        if num_symbols == 2:
            sym1 = br.bits(8)
            if sym1 >= alphabet_size or sym1 == sym0:
                raise ValueError("VP8L simple-code symbol invalid")
            lengths[sym0] = lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        return _PrefixCode(lengths)
    return _PrefixCode(_read_code_lengths(br, alphabet_size))


# ---------------------------------------------------------------------------
# LZ77 prefix values and the 2D distance map
# ---------------------------------------------------------------------------

#: the 120 short-distance codes map to 2D offsets, ordered by squared
#: distance then |dx| (positive dx first) — regenerated from the spec's
#: construction (offsets dx in [-7, 8], dy in [0, 7], strictly-earlier
#: pixels only); the first ten entries match the spec's table verbatim:
#: (0,1),(1,0),(1,1),(-1,1),(0,2),(2,0),(1,2),(-1,2),(2,1),(-2,1)
_DIST_MAP = sorted(
    ((dx, dy) for dy in range(8) for dx in range(-7, 9) if dy > 0 or dx > 0),
    key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0),
)
assert len(_DIST_MAP) == 120
_DIST_CODE_OF = {p: i + 1 for i, p in enumerate(_DIST_MAP)}


def _prefix_value(br: _BitReader, symbol: int) -> int:
    """length/distance value from its prefix symbol + extra bits."""
    if symbol < 4:
        return symbol + 1
    extra = (symbol - 2) >> 1
    offset = (2 + (symbol & 1)) << extra
    return offset + br.bits(extra) + 1


def _prefix_symbol(value: int) -> tuple[int, int, int]:
    """(symbol, extra_bits, extra_value) — encoder inverse of above."""
    u = value - 1
    if u < 4:
        return u, 0, 0
    hb = u.bit_length() - 1
    if u < (3 << (hb - 1)):
        return 2 * hb, hb - 1, u - (2 << (hb - 1))
    return 2 * hb + 1, hb - 1, u - (3 << (hb - 1))


def _plane_code_to_distance(width: int, plane_code: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _DIST_MAP[plane_code - 1]
    dist = dy * width + dx
    return dist if dist >= 1 else 1


# ---------------------------------------------------------------------------
# Entropy-coded image (shared by the main image, transform data, palette
# and the entropy image itself)
# ---------------------------------------------------------------------------

_CACHE_MULT = 0x1E35A7BD


def _read_huffman_group(br: _BitReader, cache_size: int) -> list[_PrefixCode]:
    return [
        _read_prefix_code(br, 256 + 24 + cache_size),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 40),
    ]


def _decode_image_stream(br: _BitReader, w: int, h: int, level0: bool):
    """Returns (argb_pixels, transforms) — transforms only at level 0."""
    transforms = []
    if level0:
        seen = set()
        while br.bit():
            ttype = br.bits(2)
            if ttype in seen:
                raise ValueError("VP8L transform repeated")
            seen.add(ttype)
            if ttype == 0:  # predictor
                size_bits = br.bits(3) + 2
                bw = (w + (1 << size_bits) - 1) >> size_bits
                bh = (h + (1 << size_bits) - 1) >> size_bits
                data, _, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append(("predictor", size_bits, data))
            elif ttype == 1:  # color transform
                size_bits = br.bits(3) + 2
                bw = (w + (1 << size_bits) - 1) >> size_bits
                bh = (h + (1 << size_bits) - 1) >> size_bits
                data, _, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append(("color", size_bits, data))
            elif ttype == 2:  # subtract green
                transforms.append(("subtract_green",))
            else:  # color indexing
                n_colors = br.bits(8) + 1
                palette, _, _ = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are delta-coded per channel
                for i in range(1, n_colors):
                    palette[i] = _add_pixels(palette[i], palette[i - 1])
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append(("color_indexing", width_bits, palette, w))
                w = (w + (1 << width_bits) - 1) >> width_bits

    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L color-cache bits out of range")
    cache_size = (1 << cache_bits) if cache_bits else 0

    n_groups, group_of, meta_bits, meta_w = 1, None, 0, 0
    if level0 and br.bit():  # meta prefix codes
        meta_bits = br.bits(3) + 2
        meta_w = (w + (1 << meta_bits) - 1) >> meta_bits
        meta_h = (h + (1 << meta_bits) - 1) >> meta_bits
        entropy_img, _, _ = _decode_image_stream(br, meta_w, meta_h, False)
        group_of = [((px >> 8) & 0xFFFF) for px in entropy_img]
        n_groups = max(group_of) + 1
        if n_groups > MAX_HUFFMAN_GROUPS:
            raise ValueError("VP8L meta-prefix group count over cap")
    groups = [_read_huffman_group(br, cache_size) for _ in range(n_groups)]

    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    pixels: list[int] = []
    npix = w * h
    x = 0
    group = groups[0]
    last_meta_key = -1
    while len(pixels) < npix:
        if group_of is not None:
            y = len(pixels) // w
            meta_key = (y >> meta_bits) * meta_w + (x >> meta_bits)
            if meta_key != last_meta_key:
                group = groups[group_of[meta_key]]
                last_meta_key = meta_key
        sym = group[0].read(br)
        if sym < 256:  # literal: green, then red, blue, alpha
            g = sym
            r = group[1].read(br)
            b = group[2].read(br)
            a = group[3].read(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            pixels.append(px)
            if cache_bits:
                cache[(_CACHE_MULT * px & 0xFFFFFFFF) >> shift] = px
            x += 1
        elif sym < 256 + 24:  # backward reference
            length = _prefix_value(br, sym - 256)
            dist_code = _prefix_value(br, group[4].read(br))
            dist = _plane_code_to_distance(w, dist_code)
            if dist > len(pixels):
                raise ValueError("VP8L backward reference before image start")
            if len(pixels) + length > npix:
                raise ValueError("VP8L backward reference past image end")
            base = len(pixels) - dist
            for i in range(length):
                px = pixels[base + i]
                pixels.append(px)
                if cache_bits:
                    cache[(_CACHE_MULT * px & 0xFFFFFFFF) >> shift] = px
            x = (x + length) % w
        else:  # color-cache reference
            idx = sym - 256 - 24
            if idx >= cache_size:
                raise ValueError("VP8L cache index out of range")
            pixels.append(cache[idx])
            x += 1
        if x >= w:
            x -= w
    return pixels, transforms, w


# ---------------------------------------------------------------------------
# Transform inverses
# ---------------------------------------------------------------------------


def _add_pixels(a: int, b: int) -> int:
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) & 0xFF) << 24
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) & 0xFF) << 16
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) & 0xFF) << 8
        | ((((a & 0xFF) + (b & 0xFF)) >> 1) & 0xFF)
    )


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp255(((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)) << sh
    return out


def _clamp_add_sub_half(ave: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        av = (ave >> sh) & 0xFF
        d = av - ((c >> sh) & 0xFF)
        # C truncation toward zero, NOT floor — matters for negative d
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp255(av + half) << sh
    return out


def _select(t: int, l: int, tl: int) -> int:  # noqa: E741 — spec names
    pa = sum(abs(((l >> sh) & 0xFF) - ((tl >> sh) & 0xFF)) for sh in (24, 16, 8, 0))
    pb = sum(abs(((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)) for sh in (24, 16, 8, 0))
    return t if pa <= pb else l


def _predict(mode: int, px: list[int], x: int, y: int, w: int) -> int:
    """Predicted ARGB for pixel (x, y) from already-reconstructed px.

    Edge rules per spec: (0,0) predicts opaque black; the rest of the top
    row predicts L; the left column predicts T.  TR at the row's last
    pixel wraps to the CURRENT row's first pixel (the flat-array read
    libwebp performs)."""
    i = y * w + x
    if y == 0:
        return 0xFF000000 if x == 0 else px[i - 1]
    if x == 0:
        return px[i - w]
    L = px[i - 1]
    T = px[i - w]
    TL = px[i - w - 1]
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 0:
        return 0xFF000000
    TR = px[i - w + 1]  # at x == w-1 this reads px[y*w] — intended
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        return _select(T, L, TL)
    if mode == 12:
        return _clamp_add_sub_full(L, T, TL)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(L, T), TL)
    raise ValueError(f"VP8L predictor mode {mode} out of range")


def _inverse_predictor(px: list[int], w: int, h: int, size_bits: int, data: list[int]):
    bw = (w + (1 << size_bits) - 1) >> size_bits
    for y in range(h):
        row_blocks = (y >> size_bits) * bw
        for x in range(w):
            mode = (data[row_blocks + (x >> size_bits)] >> 8) & 0xFF
            i = y * w + x
            px[i] = _add_pixels(px[i], _predict(mode, px, x, y, w))


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_s8(t) * _s8(c)) >> 5


def _inverse_color_transform(px: list[int], w: int, h: int, size_bits: int, data: list[int]):
    bw = (w + (1 << size_bits) - 1) >> size_bits
    for y in range(h):
        row_blocks = (y >> size_bits) * bw
        for x in range(w):
            cte = data[row_blocks + (x >> size_bits)]
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            i = y * w + x
            v = px[i]
            g = (v >> 8) & 0xFF
            r = ((v >> 16) & 0xFF) + _ct_delta(g2r, g)
            r &= 0xFF
            b = (v & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, r)
            px[i] = (v & 0xFF00FF00) | (r << 16) | (b & 0xFF)


def _inverse_subtract_green(px: list[int]):
    for i, v in enumerate(px):
        g = (v >> 8) & 0xFF
        r = (((v >> 16) & 0xFF) + g) & 0xFF
        b = ((v & 0xFF) + g) & 0xFF
        px[i] = (v & 0xFF00FF00) | (r << 16) | b


def _inverse_color_indexing(
    px: list[int], packed_w: int, h: int, width_bits: int, palette: list[int], w: int
) -> list[int]:
    n_colors = len(palette)
    out = [0] * (w * h)
    if width_bits == 0:
        for i, v in enumerate(px):
            idx = (v >> 8) & 0xFF
            out[i] = palette[idx] if idx < n_colors else 0
        return out
    per_byte = 1 << width_bits
    ibits = 8 >> width_bits
    mask = (1 << ibits) - 1
    for y in range(h):
        for xp in range(packed_w):
            packed = (px[y * packed_w + xp] >> 8) & 0xFF
            for k in range(per_byte):
                x = xp * per_byte + k
                if x >= w:
                    break
                idx = (packed >> (k * ibits)) & mask
                out[y * w + x] = palette[idx] if idx < n_colors else 0
    return out


# ---------------------------------------------------------------------------
# Container + top-level decode
# ---------------------------------------------------------------------------


def decode_webp(payload: bytes) -> dict:
    """Decode a lossless WebP to {'format','width','height','channels',
    'pixels' (RGBA bytes)}.  Lossy VP8 raises ValueError (see module
    docstring)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return _decode_vp8l(body)
        if tag == b"VP8 ":
            raise ValueError("lossy VP8 decode not supported (see multimodal seam)")
        # VP8X extended header: keep walking to the embedded VP8L/VP8
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L chunk in WebP payload")


def _decode_vp8l(data: bytes) -> dict:
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(data[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha-is-used hint (informational)
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    _check_decoded_size(w, h, 4)
    px, transforms, cur_w = _decode_image_stream(br, w, h, True)
    # invert in reverse stream order, tracking the width each transform
    # actually saw at read time (color-indexing packs sub-byte indices,
    # so transforms read AFTER it operated on the packed width)
    for t in reversed(transforms):
        if t[0] == "color_indexing":
            _, width_bits, palette, orig_w = t
            packed_w = (orig_w + (1 << width_bits) - 1) >> width_bits if width_bits else orig_w
            px = _inverse_color_indexing(
                px, packed_w, h, width_bits, palette, orig_w
            )
            cur_w = orig_w
        elif t[0] == "color":
            _inverse_color_transform(px, cur_w, h, t[1], t[2])
        elif t[0] == "subtract_green":
            _inverse_subtract_green(px)
        else:
            _inverse_predictor(px, cur_w, h, t[1], t[2])
    if cur_w != w:
        raise ValueError("VP8L color-indexing width not restored")
    rgba = bytearray(w * h * 4)
    for i, v in enumerate(px):
        j = i * 4
        rgba[j] = (v >> 16) & 0xFF
        rgba[j + 1] = (v >> 8) & 0xFF
        rgba[j + 2] = v & 0xFF
        rgba[j + 3] = (v >> 24) & 0xFF
    return {
        "format": "webp",
        "width": w,
        "height": h,
        "channels": 4,
        "pixels": bytes(rgba),
    }


# ---------------------------------------------------------------------------
# Encoder (fixture source; every decoder path has a forward twin here)
# ---------------------------------------------------------------------------


def _huffman_code_lengths(freqs: dict, max_len: int = _MAX_CODE_LEN) -> dict:
    """Plain Huffman code lengths from frequencies; fixtures are small so
    depth never approaches the 15-bit cap — refuse rather than emit an
    invalid stream if one ever does."""
    import heapq

    items = [(f, i, [s]) for i, (s, f) in enumerate(sorted(freqs.items())) if f > 0]
    if not items:
        raise ValueError("empty alphabet")
    if len(items) == 1:
        return {items[0][2][0]: 1}
    heapq.heapify(items)
    lengths = {s: 0 for _, _, syms in items for s in syms}
    tiebreak = len(items)
    while len(items) > 1:
        f1, _, s1 = heapq.heappop(items)
        f2, _, s2 = heapq.heappop(items)
        for s in s1 + s2:
            lengths[s] += 1
        tiebreak += 1
        heapq.heappush(items, (f1 + f2, tiebreak, s1 + s2))
    if max(lengths.values()) > max_len:
        raise ValueError("fixture Huffman depth over VP8L cap")
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths_by_sym: dict, alphabet_size: int) -> dict:
    """Write a code description; returns symbol -> (code, length)."""
    used = sorted(lengths_by_sym)
    if len(used) <= 2 and all(s < 256 for s in used):
        # simple code
        bw.write(1, 1)
        bw.write(len(used) - 1, 1)
        first = used[0]
        if first <= 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        return {used[0]: (0, 0)}

    bw.write(0, 1)  # normal code
    code_lengths = [0] * alphabet_size
    for s, ln in lengths_by_sym.items():
        code_lengths[s] = ln

    # run-length encode the lengths: literals + 17/18 zero runs (exercises
    # the decoder's repeat paths on every fixture)
    cl_stream: list[tuple] = []  # (cl_symbol, extra_bits, extra_val)
    i = 0
    while i < alphabet_size:
        if code_lengths[i] == 0:
            run = 1
            while i + run < alphabet_size and code_lengths[i + run] == 0:
                run += 1
            rest = run
            while rest >= 11:
                take = min(rest, 138)
                cl_stream.append((18, 7, take - 11))
                rest -= take
            while rest >= 3:
                take = min(rest, 10)
                cl_stream.append((17, 3, take - 3))
                rest -= take
            for _ in range(rest):
                cl_stream.append((0, 0, 0))
            i += run
        else:
            cl_stream.append((code_lengths[i], 0, 0))
            i += 1

    cl_freqs: dict = {}
    for s, _, _ in cl_stream:
        cl_freqs[s] = cl_freqs.get(s, 0) + 1
    cl_lengths = _huffman_code_lengths(cl_freqs, max_len=7)
    cl_full = [0] * 19
    for s, ln in cl_lengths.items():
        cl_full[s] = ln
    # number of 3-bit fields: enough of _CL_ORDER to cover every used one
    num_cl = max(
        (idx + 1 for idx, s in enumerate(_CL_ORDER) if cl_full[s] > 0), default=4
    )
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for idx in range(num_cl):
        bw.write(cl_full[_CL_ORDER[idx]], 3)
    cl_codes = _canonical_codes(cl_full)
    bw.write(0, 1)  # no explicit max_symbol
    for s, nb, ev in cl_stream:
        _emit(bw, cl_codes, s)
        if nb:
            bw.write(ev, nb)
    return _canonical_codes(code_lengths)


_EMIT_CACHE: dict = {}


def _emit(bw: _BitWriter, codes: dict, sym: int) -> None:
    """Write one symbol: MSB-of-code-first through the LSB-first writer =
    a single write of the bit-reversed code (reversals memoised — the
    encoder is the fixture source but also a bench cost)."""
    code, ln = codes[sym]
    key = (code, ln)
    rev = _EMIT_CACHE.get(key)
    if rev is None:
        rev = _revbits(code, ln)
        _EMIT_CACHE[key] = rev
    bw.write(rev, ln)


def encode_webp_lossless(
    width: int,
    height: int,
    rgba: bytes,
    use_lz77: bool = False,
    cache_bits: int = 0,
    subtract_green: bool = False,
    predictor_bits: int = 0,
    palette: bool = False,
    color_transform_bits: int = 0,
    meta_bits: int = 0,
) -> bytes:
    """Real (fixture-grade) VP8L encoder.

    Literal streams by default; ``use_lz77`` adds distance-1 runs,
    ``cache_bits`` a color cache, ``subtract_green``/``predictor_bits``/
    ``palette``/``color_transform_bits`` the forward transforms, and
    ``meta_bits`` a 2-group meta-prefix entropy image — each the
    independent twin of a decoder path, so round-trips localise bugs."""
    if len(rgba) != width * height * 4:
        raise ValueError("pixel buffer length mismatch")
    px = [
        (rgba[i + 3] << 24) | (rgba[i] << 16) | (rgba[i + 1] << 8) | rgba[i + 2]
        for i in range(0, len(rgba), 4)
    ]
    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(int(any((v >> 24) & 0xFF != 0xFF for v in px)), 1)
    bw.write(0, 3)  # version

    w = width
    if palette:
        if subtract_green or predictor_bits:
            raise ValueError("fixture encoder: palette excludes other transforms")
        colors = sorted(set(px))
        if len(colors) > 256:
            raise ValueError("palette transform needs <=256 distinct colors")
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(len(colors) - 1, 8)
        deltas = [colors[0]] + [
            _sub_pixels(colors[i], colors[i - 1]) for i in range(1, len(colors))
        ]
        _encode_entropy_image(bw, deltas)
        index_of = {c: i for i, c in enumerate(colors)}
        n = len(colors)
        width_bits = 3 if n <= 2 else (2 if n <= 4 else (1 if n <= 16 else 0))
        if width_bits:
            per_byte = 1 << width_bits
            ibits = 8 >> width_bits
            packed_w = (w + per_byte - 1) // per_byte
            rows = []
            for y in range(height):
                for xp in range(packed_w):
                    b = 0
                    for k in range(per_byte):
                        x = xp * per_byte + k
                        if x < w:
                            b |= index_of[px[y * w + x]] << (k * ibits)
                    rows.append(0xFF000000 | (b << 8))
            px = rows
            w = packed_w
        else:
            px = [0xFF000000 | (index_of[v] << 8) for v in px]
    if predictor_bits:
        if not 2 <= predictor_bits <= 9:
            raise ValueError("predictor_bits out of range")
        bw.write(1, 1)
        bw.write(0, 2)  # predictor
        bw.write(predictor_bits - 2, 3)
        bs = 1 << predictor_bits
        bwn = (w + bs - 1) >> predictor_bits
        bhn = (height + bs - 1) >> predictor_bits
        # deterministic mode per block, cycling through all 14
        modes = [0xFF000000 | (((i % 14)) << 8) for i in range(bwn * bhn)]
        residuals = list(px)
        for y in range(height):
            for x in range(w):
                mode = (modes[(y >> predictor_bits) * bwn + (x >> predictor_bits)] >> 8) & 0xFF
                i = y * w + x
                residuals[i] = _sub_pixels(px[i], _predict(mode, px, x, y, w))
        px = residuals
        _encode_entropy_image(bw, modes)
    if color_transform_bits:
        if palette:
            raise ValueError("fixture encoder: palette excludes other transforms")
        if not 2 <= color_transform_bits <= 9:
            raise ValueError("color_transform_bits out of range")
        bw.write(1, 1)
        bw.write(1, 2)  # color transform
        bw.write(color_transform_bits - 2, 3)
        cbs = color_transform_bits
        cbw = (w + (1 << cbs) - 1) >> cbs
        cbh = (height + (1 << cbs) - 1) >> cbs
        # deterministic per-block cross-channel multipliers: cte pixel is
        # (r2b << 16) | (g2b << 8) | g2r, matching the decoder's unpack
        ctes = [
            0xFF000000
            | (((41 * i + 11) % 256) << 16)
            | (((29 * i + 7) % 256) << 8)
            | ((17 * i + 3) % 256)
            for i in range(cbw * cbh)
        ]
        out = list(px)
        for y in range(height):
            row_blocks = (y >> cbs) * cbw
            for x in range(w):
                cte = ctes[row_blocks + (x >> cbs)]
                g2r = cte & 0xFF
                g2b = (cte >> 8) & 0xFF
                r2b = (cte >> 16) & 0xFF
                i = y * w + x
                v = px[i]
                g = (v >> 8) & 0xFF
                r = (v >> 16) & 0xFF
                b = v & 0xFF
                # forward of _inverse_color_transform: subtract the deltas
                # the decoder will add back (r2b uses the FINAL red, which
                # is the original r — the decoder reconstructs r first)
                nr = (r - _ct_delta(g2r, g)) & 0xFF
                nb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
                out[i] = (v & 0xFF00FF00) | (nr << 16) | nb
        px = out
        _encode_entropy_image(bw, ctes)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        px = [
            (v & 0xFF00FF00)
            | (((((v >> 16) & 0xFF) - ((v >> 8) & 0xFF)) & 0xFF) << 16)
            | (((v & 0xFF) - ((v >> 8) & 0xFF)) & 0xFF)
            for v in px
        ]
    bw.write(0, 1)  # end of transforms

    _encode_entropy_image(
        bw, px, w=w, use_lz77=use_lz77, cache_bits=cache_bits, meta_bits=meta_bits
    )
    body = bw.flush()
    return _riff_wrap(b"\x2f" + body)


def _sub_pixels(a: int, b: int) -> int:
    return (
        (((a >> 24) - (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def _encode_entropy_image(
    bw: _BitWriter, px: list[int], w: int | None = None, use_lz77: bool = False,
    cache_bits: int = 0, meta_bits: int = 0,
) -> None:
    """One huffman group by default; ``meta_bits`` (level-0 only) writes a
    2-group meta-prefix entropy image instead — the forward twin of the
    decoder's group_of selection.  Tokenise, then write codes+tokens."""
    if meta_bits:
        if w is None:
            raise ValueError("meta prefix codes are a level-0 feature")
        if use_lz77 or cache_bits:
            # keep per-group token bookkeeping trivial in the fixture
            raise ValueError("fixture encoder: meta_bits excludes lz77/cache")
        _encode_meta_entropy_image(bw, px, w, meta_bits)
        return
    # tokens: ('lit', px) | ('copy', length, dist_code) | ('cache', idx)
    tokens: list[tuple] = []
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    i = 0
    n = len(px)
    while i < n:
        v = px[i]
        if use_lz77 and i >= 1 and px[i - 1] == v:
            run = 1
            while i + run < n and px[i + run] == v and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("copy", run, 1))  # distance 1 == plane code for (1,0)
                # copied pixels enter the cache on the decoder side too
                if cache_bits:
                    for k in range(run):
                        cache[(_CACHE_MULT * px[i + k] & 0xFFFFFFFF) >> shift] = px[i + k]
                i += run
                continue
        if cache_bits:
            slot = (_CACHE_MULT * v & 0xFFFFFFFF) >> shift
            if cache[slot] == v:
                tokens.append(("cache", slot))
                i += 1
                continue
            cache[slot] = v
        tokens.append(("lit", v))
        i += 1

    g_freq: dict = {}
    r_freq: dict = {}
    b_freq: dict = {}
    a_freq: dict = {}
    d_freq: dict = {}
    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            g_freq[(v >> 8) & 0xFF] = g_freq.get((v >> 8) & 0xFF, 0) + 1
            r_freq[(v >> 16) & 0xFF] = r_freq.get((v >> 16) & 0xFF, 0) + 1
            b_freq[v & 0xFF] = b_freq.get(v & 0xFF, 0) + 1
            a_freq[(v >> 24) & 0xFF] = a_freq.get((v >> 24) & 0xFF, 0) + 1
        elif t[0] == "copy":
            s, _, _ = _prefix_symbol(t[1])
            g_freq[256 + s] = g_freq.get(256 + s, 0) + 1
            ds, _, _ = _prefix_symbol(_DIST_CODE_OF[(1, 0)]) if t[2] == 1 else (0, 0, 0)
            d_freq[ds] = d_freq.get(ds, 0) + 1
        else:
            g_freq[256 + 24 + t[1]] = g_freq.get(256 + 24 + t[1], 0) + 1

    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    if w is not None:
        bw.write(0, 1)  # no meta prefix codes (level-0 image only)
    all_codes = []
    for freq, alpha in (
        (g_freq, 256 + 24 + cache_size),
        (r_freq, 256),
        (b_freq, 256),
        (a_freq, 256),
        (d_freq, 40),
    ):
        if not freq:
            freq = {0: 1}  # unused channel: minimal 1-symbol code
        lens = _huffman_code_lengths(freq)
        all_codes.append(_write_prefix_code(bw, lens, alpha))
    g_codes, r_codes, b_codes, a_codes, d_codes = all_codes

    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            _emit(bw, g_codes, (v >> 8) & 0xFF)
            _emit(bw, r_codes, (v >> 16) & 0xFF)
            _emit(bw, b_codes, v & 0xFF)
            _emit(bw, a_codes, (v >> 24) & 0xFF)
        elif t[0] == "copy":
            s, nb, ev = _prefix_symbol(t[1])
            _emit(bw, g_codes, 256 + s)
            if nb:
                bw.write(ev, nb)
            ds, dnb, dev = _prefix_symbol(_DIST_CODE_OF[(1, 0)])
            _emit(bw, d_codes, ds)
            if dnb:
                bw.write(dev, dnb)
        else:
            _emit(bw, g_codes, 256 + 24 + t[1])


def _encode_meta_entropy_image(
    bw: _BitWriter, px: list[int], w: int, meta_bits: int
) -> None:
    """Level-0 stream with a meta-prefix entropy image: meta blocks get a
    checkerboard 2-group assignment, each group its own literal codes —
    exercises the decoder's per-block group_of switch."""
    if not 2 <= meta_bits <= 9:
        raise ValueError("meta_bits out of range")
    h = len(px) // w
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix codes present
    bw.write(meta_bits - 2, 3)
    meta_w = (w + (1 << meta_bits) - 1) >> meta_bits
    meta_h = (h + (1 << meta_bits) - 1) >> meta_bits
    group_of = [(bx + by) & 1 for by in range(meta_h) for bx in range(meta_w)]
    n_groups = max(group_of) + 1
    entropy_px = [0xFF000000 | (g << 8) for g in group_of]
    _encode_entropy_image(bw, entropy_px)  # level-1 sub-image
    per_group: list[list[dict]] = [
        [{}, {}, {}, {}] for _ in range(n_groups)
    ]  # g, r, b, a freqs
    for y in range(h):
        row_meta = (y >> meta_bits) * meta_w
        for x in range(w):
            f = per_group[group_of[row_meta + (x >> meta_bits)]]
            v = px[y * w + x]
            for d, val in zip(
                f, ((v >> 8) & 0xFF, (v >> 16) & 0xFF, v & 0xFF, (v >> 24) & 0xFF)
            ):
                d[val] = d.get(val, 0) + 1
    codes = []
    for f in per_group:
        gc = []
        for freq, alpha in zip(f, (256 + 24, 256, 256, 256)):
            gc.append(_write_prefix_code(bw, _huffman_code_lengths(freq or {0: 1}), alpha))
        gc.append(_write_prefix_code(bw, {0: 1}, 40))  # distances unused
        codes.append(gc)
    for y in range(h):
        row_meta = (y >> meta_bits) * meta_w
        for x in range(w):
            gc = codes[group_of[row_meta + (x >> meta_bits)]]
            v = px[y * w + x]
            _emit(bw, gc[0], (v >> 8) & 0xFF)
            _emit(bw, gc[1], (v >> 16) & 0xFF)
            _emit(bw, gc[2], v & 0xFF)
            _emit(bw, gc[3], (v >> 24) & 0xFF)


def _riff_wrap(vp8l_payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def synth_webp(doc_id: int) -> bytes:
    """Deterministic lossless WebP with a closed-form pixel pattern:
    w = 4*(1+d%4), h = 4*(1+(3d)%4), and per (x, y):
      r = (11x + 17y + 23d) % 256
      g = (7x + 13y + 31d) % 256
      b = (5x + 3y + d) % 256,  alpha 255.
    The encoder variant cycles with d so the corpus exercises plain
    literals, LZ77 runs, the color cache, subtract-green, the predictor,
    the color transform and meta-prefix groups — the decoded pixels are
    IDENTICAL regardless of variant (lossless), so the DuckDB oracle
    replays only the formula."""
    d = int(doc_id)
    w = 4 * (1 + d % 4)
    h = 4 * (1 + (3 * d) % 4)
    rgba = bytearray()
    for y in range(h):
        for x in range(w):
            rgba += bytes(
                (
                    (11 * x + 17 * y + 23 * d) % 256,
                    (7 * x + 13 * y + 31 * d) % 256,
                    (5 * x + 3 * y + d) % 256,
                    255,
                )
            )
    variant = d % 6
    return encode_webp_lossless(
        w,
        h,
        bytes(rgba),
        use_lz77=(variant == 1),
        cache_bits=4 if variant == 2 else 0,
        subtract_green=(variant == 3),
        predictor_bits=2 if variant == 4 else 0,
        color_transform_bits=2 if variant == 4 else 0,
        meta_bits=2 if variant == 5 else 0,
    )
