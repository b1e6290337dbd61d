"""Stdlib image codec tests (VERDICT r3 #4).

The PNG known-answer tests decode HAND-CONSTRUCTED byte streams whose
filtered bytes and expected pixels were derived by hand from RFC 2083 —
independent of ``encode_png``, so a symmetric encoder/decoder bug in a
filter predictor cannot cancel out (the round-trip tests alone could not
catch that).
"""

import struct
import zlib

import pytest

from universal_key_value_based_text_processing_with_ocr_spark.operators import imagecodec as ic


def _png(width, height, color_type, idat_raw):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        ic.PNG_SIG
        + ic._chunk(b"IHDR", ihdr)
        + ic._chunk(b"IDAT", zlib.compress(idat_raw))
        + ic._chunk(b"IEND", b"")
    )


def test_png_known_answer_sub_up_paeth_filters():
    """2x3 RGB, rows filtered Sub/Up/Paeth — filtered bytes hand-computed."""
    raw_rows = [
        [10, 20, 30, 40, 60, 80],
        [5, 10, 15, 200, 210, 220],
        [100, 110, 120, 130, 140, 150],
    ]
    filtered = (
        b"\x01" + bytes([10, 20, 30, 30, 40, 50])          # Sub: x - left
        + b"\x02" + bytes([251, 246, 241, 160, 150, 140])   # Up: x - above (mod 256)
        + b"\x04" + bytes([95, 100, 105, 186, 186, 186])    # Paeth (hand-derived)
    )
    dec = ic.decode_png(_png(2, 3, 2, filtered))
    assert dec["width"] == 2 and dec["height"] == 3 and dec["channels"] == 3
    assert list(dec["pixels"]) == [v for row in raw_rows for v in row]


def test_png_known_answer_average_filter_gray():
    """4x2 grayscale, row1 filtered Average — hand-computed."""
    filtered = (
        b"\x00" + bytes([10, 20, 30, 40])
        + b"\x03" + bytes([45, 25, 25, 25])  # x - (left+above)//2
    )
    dec = ic.decode_png(_png(4, 2, 0, filtered))
    assert dec["channels"] == 1
    assert list(dec["pixels"]) == [10, 20, 30, 40, 50, 60, 70, 80]


def test_png_roundtrip_all_filters_all_color_types():
    """encode(filter=y%5) -> decode recovers the exact pixel buffer for
    every supported color type, including RGBA/LA alpha channels."""
    for ct in (0, 2, 4, 6):
        ch = ic._PNG_CHANNELS[ct]
        w, h = 9, 11  # odd sizes exercise stride edges
        px = bytes((7 * x + 13 * y + 57 * c) % 256 for y in range(h) for x in range(w) for c in range(ch))
        payload = ic.encode_png(w, h, px, color_type=ct, filter_choice=lambda y: y % 5)
        dec = ic.decode_png(payload)
        assert dec["pixels"] == px, f"color_type {ct}"


def test_png_mixed_filters_decode_equals_filter0_decode():
    """The same pixels encoded with filter 0 only and with cycling filters
    must decode identically (filter choice is an encoding detail)."""
    w, h = 8, 8
    px = bytes((x * y * 3 + x + 5 * y) % 256 for y in range(h) for x in range(w) for _ in range(3))
    a = ic.decode_png(ic.encode_png(w, h, px, 2, lambda y: 0))
    b = ic.decode_png(ic.encode_png(w, h, px, 2, lambda y: y % 5))
    assert a["pixels"] == b["pixels"] == px


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        ic.decode_png(b"nonsense bytes")
    # ILLEGAL combos rejected explicitly (16-bit palette, depth 3)
    for depth, ctype in ((16, 3), (3, 0), (4, 2)):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, 0)
        bad = ic.PNG_SIG + ic._chunk(b"IHDR", ihdr) + ic._chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="invalid"):
            ic.decode_png(bad)
    # legal 16-bit header with no IDAT: clean length-mismatch ValueError
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = ic.PNG_SIG + ic._chunk(b"IHDR", ihdr) + ic._chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="length mismatch"):
        ic.decode_png(bad)


def test_bmp_known_answer_bottom_up_bgr_padding():
    """Hand-built 2x2 24bpp BMP: BGR byte order, bottom-up rows, 4-byte
    row padding — decoder must normalise to top-down RGB."""
    # target top-down RGB: row0 = (1,2,3) (4,5,6); row1 = (7,8,9) (10,11,12)
    # stored bottom-up BGR, rows padded from 6 to 8 bytes
    img = bytes([9, 8, 7, 12, 11, 10, 0, 0]) + bytes([3, 2, 1, 6, 5, 4, 0, 0])
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(img), 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(img), 0, 0, 0, 0)
    dec = ic.decode_bmp(header + info + img)
    assert dec["width"] == 2 and dec["height"] == 2
    assert list(dec["pixels"]) == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]


def test_bmp_roundtrip():
    w, h = 5, 4
    px = bytes((11 * x + 3 * y + c) % 256 for y in range(h) for x in range(w) for c in range(3))
    dec = ic.decode_bmp(ic.encode_bmp(w, h, px))
    assert dec["pixels"] == px


def test_gif_header():
    dec = ic.decode_gif_header(ic.synth_image(3))  # kind 3 -> gif
    assert dec["format"] == "gif" and dec["pixels"] is None  # header probe only
    assert dec["width"] == 8 + 3 % 9 and dec["height"] == 8 + 9 % 9
    assert dec["palette_size"] == 256 and dec["version"] == "87a"


def test_gif_lzw_known_answer_dictionary_growth():
    """Hand-derived LZW stream: codes [CLEAR, 1, 6, END] at min_code_size 2
    (3-bit codes, LSB-first packed to bytes 0x8C 0x0B by hand).  Code 6 is
    the not-yet-defined next code — the classic KwKwK case — and must
    decode to prev + prev[0], giving [1, 1, 1].  Independent of the
    encoder (which never grows the dictionary), so a symmetric
    encoder/decoder bug cannot hide here."""
    assert ic._lzw_decode(2, bytes([0x8C, 0x0B])) == [1, 1, 1]


def test_gif_full_decode_roundtrip_and_pattern():
    """Encoded GIF pixels decode back exactly; spans >254 symbols so the
    uncompressed encoder's periodic CLEAR path is exercised, and >255
    compressed bytes so multi-sub-block reassembly is too."""
    palette = bytes(v for i in range(256) for v in (i, i, i))
    idx = bytes((i * 37 + 11) % 256 for i in range(40 * 30))
    dec = ic.decode_gif(ic.encode_gif(40, 30, idx, palette))
    assert dec["width"] == 40 and dec["height"] == 30 and dec["channels"] == 3
    assert dec["pixels"] == bytes(v for i in idx for v in (i, i, i))
    # synth kind-3 now carries real pixels matching the analytic pattern
    d = 7  # 7 % 4 == 3 -> gif
    g = ic.decode_image(ic.synth_image(d))
    w, h = 8 + d % 9, 8 + (3 * d) % 9
    expect = bytes(
        v for y in range(h) for x in range(w)
        for v in [(7 * x + 13 * y + 31 * d) % 256] * 3
    )
    assert g["pixels"] == expect


def test_image_stats_integer_exactness():
    """Solid-color image: brightness == the exact luma, contrast == 0."""
    px = bytes([100, 150, 200] * 16)
    dec = {"format": "png", "width": 4, "height": 4, "channels": 3, "pixels": px}
    st = ic.image_stats(dec)
    assert st["brightness"] == (299 * 100 + 587 * 150 + 114 * 200) / 1000.0
    assert st["contrast"] == 0.0
    assert st["min_luma"] == st["max_luma"] == st["brightness"]


def test_synth_image_dispatch_and_stats_match_pattern():
    """decode_image sniffs all three formats; decoded pixels reproduce the
    analytic pattern (the oracle's ground truth) for PNG and BMP."""
    import math

    for d in (0, 1, 2, 3, 17, 42, 101):
        dec = ic.decode_image(ic.synth_image(d))
        kind = d % 4
        assert dec["format"] == {0: "png", 1: "png", 2: "bmp", 3: "gif"}[kind]
        assert dec["width"] == 8 + d % 9 and dec["height"] == 8 + (3 * d) % 9
        if kind == 3:
            continue
        w, h, ch = dec["width"], dec["height"], dec["channels"]
        expect = bytes(
            (7 * x + 13 * y + 31 * d + 57 * c) % 256
            for y in range(h) for x in range(w) for c in range(ch)
        )
        assert dec["pixels"] == expect
        st = ic.image_stats(dec)
        assert st["contrast"] >= 0 and math.isfinite(st["brightness"])


def test_decoders_reject_garbage_without_hanging():
    """Malformed payloads raise ValueError (or zlib/struct errors) fast —
    never hang, never return corrupt pixel buffers silently."""
    import random

    rng = random.Random(99)
    seeds = [
        b"", b"BM", b"GIF87a", b"GIF89a\x01\x00", ic.PNG_SIG, ic.PNG_SIG + b"\x00" * 6,
        bytes(rng.randrange(256) for _ in range(64)),
    ]
    # truncations and byte-flips of every valid format
    for d in (0, 1, 2, 3):
        full = bytearray(ic.synth_image(d))
        seeds.append(bytes(full[: len(full) // 2]))
        flipped = bytearray(full)
        for _ in range(6):
            flipped[rng.randrange(len(flipped))] ^= 0xFF
        seeds.append(bytes(flipped))
    for payload in seeds:
        try:
            dec = ic.decode_image(bytes(payload))
        except Exception:
            continue  # rejection is the expected common case
        # an accepted payload must be internally consistent
        if dec["pixels"] is not None:
            assert len(dec["pixels"]) == dec["width"] * dec["height"] * dec["channels"]


def test_hostile_headers_fail_contained():
    """Untrusted header dims / compressed bombs must fail as ValueError
    BEFORE any giant allocation — per-row containment depends on it."""
    # 54-byte BMP advertising 2^31-1 x 2^31-1
    info = struct.pack("<IiiHHIIiiII", 40, 2**31 - 1, 2**31 - 1, 1, 24, 0, 0, 0, 0, 0, 0)
    bomb_bmp = b"BM" + struct.pack("<IHHI", 60, 0, 0, 54) + info + b"\x00" * 6
    with pytest.raises(ValueError, match="refusing"):
        ic.decode_bmp(bomb_bmp)

    # PNG advertising huge dims (zlib data irrelevant — dims reject first)
    ihdr = struct.pack(">IIBBBBB", 2**20, 2**20, 8, 6, 0, 0, 0)
    big_png = ic.PNG_SIG + ic._chunk(b"IHDR", ihdr) + ic._chunk(b"IDAT", zlib.compress(b"x")) + ic._chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="refusing"):
        ic.decode_png(big_png)

    # zlib bomb: sane dims, IDAT inflating far past the expected size
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = ic.PNG_SIG + ic._chunk(b"IHDR", ihdr) + ic._chunk(
        b"IDAT", zlib.compress(b"\x00" * 10_000_000)
    ) + ic._chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="mismatch"):
        ic.decode_png(bomb)

    # corrupt LZW: first code after CLEAR is out of table -> ValueError,
    # not KeyError (reproduced in review)
    with pytest.raises(ValueError, match="LZW"):
        # min_code_size 2: CLEAR=4; craft 3-bit codes [4, 7] (7 undefined)
        ic._lzw_decode(2, bytes([0b00111100]))

    # LZW expansion cap: a 1200-symbol stream against declared 1x1 dims
    # (the decoder only budgets iw*ih plus one CLEAR-period of slack)
    palette = bytes(v for i in range(256) for v in (i, i, i))
    gif = bytearray(ic.encode_gif(40, 30, bytes(i % 256 for i in range(1200)), palette))
    struct.pack_into("<HH", gif, 6, 1, 1)
    off = 13 + 256 * 3  # image descriptor follows header + 256-entry GCT
    assert gif[off] == 0x2C
    struct.pack_into("<HH", gif, off + 5, 1, 1)
    with pytest.raises(ValueError, match="expands past"):
        ic.decode_gif(bytes(gif))


def test_sniff_image_meta_real_headers():
    """Header-only sniff agrees with the full decoder on every synth kind."""
    for d in range(8):  # covers kinds 0-3 twice
        payload = ic.synth_image(d)
        meta = ic.sniff_image_meta(payload)
        full = ic.decode_image(payload)
        assert meta is not None
        assert (meta["format"], meta["width"], meta["height"]) == (
            full["format"], full["width"], full["height"]
        )


def test_sniff_image_meta_rejects_non_images():
    """A sniff must return None (never raise) on arbitrary crawl bytes —
    including text that happens to start with a short magic."""
    assert ic.sniff_image_meta(b"") is None
    assert ic.sniff_image_meta(b"hello world " * 10) is None
    # text starting with the 2-byte BMP magic: reserved words are ASCII,
    # not zero, so the strengthened sniff rejects it
    assert ic.sniff_image_meta(b"BMW dealers in Berlin: list of addresses") is None
    # truncated real headers: signature present, dims absent
    assert ic.sniff_image_meta(ic.PNG_SIG + b"\x00\x00") is None
    assert ic.sniff_image_meta(b"GIF89a") is None
    # PNG signature but zero dims
    ihdr = struct.pack(">IIBBBBB", 0, 5, 8, 0, 0, 0, 0)
    assert ic.sniff_image_meta(ic.PNG_SIG + ic._chunk(b"IHDR", ihdr)) is None


def test_sniff_bmp_core_header_and_topdown():
    """BITMAPCOREHEADER (12-byte) 16-bit dims and negative-height
    (top-down) BITMAPINFOHEADER both sniff correctly."""
    core = (b"BM" + struct.pack("<IHHI", 26, 0, 0, 26)
            + struct.pack("<IHHHH", 12, 7, 9, 1, 24))
    meta = ic.sniff_image_meta(core)
    assert meta == {"format": "bmp", "width": 7, "height": 9}
    topdown = bytearray(ic.encode_bmp(5, 4, bytes(5 * 4 * 3)))
    struct.pack_into("<i", topdown, 22, -4)
    meta = ic.sniff_image_meta(bytes(topdown))
    assert meta == {"format": "bmp", "width": 5, "height": 4}


def test_sniff_jpeg_sof_dims():
    """JPEG dims from the SOF0 frame header after an APP0 segment walk."""
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 30, 20)
        + b"\x03" + bytes(9)
    )
    assert ic.sniff_image_meta(jpeg) == {"format": "jpeg", "width": 20, "height": 30}
    # SOS before any SOF -> None (no dims recoverable)
    trunc = b"\xff\xd8" + b"\xff\xda" + struct.pack(">H", 4) + bytes(2)
    assert ic.sniff_image_meta(trunc) is None
    # desynchronised marker stream -> None, no exception
    assert ic.sniff_image_meta(b"\xff\xd8garbage here") is None


def test_sniff_webp_all_three_chunk_kinds():
    def riff(tag, body):
        chunk = tag + struct.pack("<I", len(body)) + body
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    lossy = riff(b"VP8 ", b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 64, 48) + bytes(4))
    assert ic.sniff_image_meta(lossy) == {"format": "webp", "width": 64, "height": 48}

    bits = (63) | (41 << 14)  # width-1=63, height-1=41
    lossless = riff(b"VP8L", b"\x2f" + struct.pack("<I", bits) + bytes(8))
    assert ic.sniff_image_meta(lossless) == {"format": "webp", "width": 64, "height": 42}

    ext = riff(b"VP8X", bytes(4) + (99).to_bytes(3, "little") + (59).to_bytes(3, "little") + bytes(4))
    assert ic.sniff_image_meta(ext) == {"format": "webp", "width": 100, "height": 60}

    # bad sync / signature bytes -> None
    bad = riff(b"VP8 ", b"\x00\x00\x00" + b"\xff\xff\xff" + struct.pack("<HH", 64, 48))
    assert ic.sniff_image_meta(bad) is None


# --------------------------------------------------------------------------
# baseline JPEG codec
# --------------------------------------------------------------------------


def test_jpeg_constant_block_gray_is_bit_exact():
    """Constant 8x8 blocks + unit quantisation: DC-only spectrum, exact
    integer DC, IDCT returns the constant — the oracle fixtures' setting."""
    for d in (0, 3, 5, 11):
        payload = ic.synth_jpeg(d)
        dec = ic.decode_jpeg(payload)
        w, h = 8 * (1 + d % 4), 8 * (1 + (3 * d) % 4)
        assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 1)
        expect = bytes(
            (7 * (x // 8) + 13 * (y // 8) + 31 * d) % 256
            for y in range(h) for x in range(w)
        )
        assert dec["pixels"] == expect
        assert ic.sniff_image_meta(payload) == {"format": "jpeg", "width": w, "height": h}
        assert ic.decode_image(payload)["format"] == "jpeg"


def test_jpeg_gradient_gray_near_lossless_with_unit_quant():
    import numpy as np

    w, h = 40, 24
    px = bytes((3 * x + 5 * y) % 256 for y in range(h) for x in range(w))
    dec = ic.decode_jpeg(ic.encode_jpeg_gray(w, h, px))
    err = np.abs(
        np.frombuffer(dec["pixels"], np.uint8).astype(int)
        - np.frombuffer(px, np.uint8).astype(int)
    )
    assert err.max() <= 1  # unit quant: only DCT float rounding remains


def test_jpeg_color_444_and_420_roundtrip():
    import numpy as np

    # constant color: subsampling is exact, only YCbCr rounding remains
    for sub in ("4:4:4", "4:2:0"):
        w, h = 19, 13  # odd dims exercise MCU edge padding + crop
        rgb = bytes([64, 128, 255] * (w * h))
        dec = ic.decode_jpeg(ic.encode_jpeg_rgb(w, h, rgb, sub))
        assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 3)
        a = np.frombuffer(dec["pixels"], np.uint8).reshape(h, w, 3).astype(int)
        assert np.abs(a - [64, 128, 255]).max() <= 2, sub
    # photo-ish gradient at 4:2:0: bounded loss
    w, h = 32, 32
    rgb = bytes(
        ((x * 8) % 256, (y * 8) % 256, ((x + y) * 4) % 256)[c]
        for y in range(h) for x in range(w) for c in range(3)
    )
    dec = ic.decode_jpeg(ic.encode_jpeg_rgb(w, h, rgb, "4:2:0"))
    a = np.frombuffer(dec["pixels"], np.uint8).reshape(h, w, 3).astype(int)
    b = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(a - b).max() <= 16 and np.abs(a - b).mean() <= 4


def test_jpeg_hostile_inputs_contained():
    good = ic.encode_jpeg_gray(16, 16, bytes(256))
    # truncated anywhere: ValueError, never IndexError/KeyError
    for cut in (4, 20, 40, len(good) - 3):
        with pytest.raises(ValueError):
            ic.decode_jpeg(good[:cut])
    # a BASELINE scan script inside an SOF2 frame is malformed progressive
    # (Ss=0/Se=63 mixes bands): still a clean ValueError, never garbage
    prog = bytearray(good)
    sof = prog.index(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="mixes DC and AC"):
        ic.decode_jpeg(bytes(prog))
    # lossless SOF3 still rejected explicitly
    lossless = bytearray(good)
    lossless[sof + 1] = 0xC3
    with pytest.raises(ValueError, match="non-baseline"):
        ic.decode_jpeg(bytes(lossless))
    # dims bomb: SOF advertising huge dims fails the size cap, no alloc
    big = bytearray(good)
    struct.pack_into(">HH", big, sof + 5, 65000, 65000)
    with pytest.raises(ValueError, match="refusing"):
        ic.decode_jpeg(bytes(big))
    # encoder buffer mismatch
    with pytest.raises(ValueError, match="does not match"):
        ic.encode_jpeg_gray(8, 8, bytes(5))
    with pytest.raises(ValueError, match="does not match"):
        ic.encode_jpeg_rgb(8, 8, bytes(5))


def test_jpeg_huffman_tables_are_spec_valid():
    """The optimised DHT tables must keep the T.81 constraints: canonical
    codes, <= 16-bit lengths, and the all-ones code never assigned."""
    payload = ic.encode_jpeg_gray(
        32, 32, bytes((3 * x + 5 * y) % 256 for y in range(32) for x in range(32))
    )
    pos = 2
    saw_dht = 0
    while pos + 4 <= len(payload):
        marker = payload[pos + 1]
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker == 0xC4:
            saw_dht += 1
            body = payload[pos + 4 : pos + 2 + ln]
            bits = list(body[1:17])
            # canonical walk: no assigned code may be the all-ones
            # pattern of its length (T.81 K.2)
            code = 0
            for L in range(1, 17):
                for _ in range(bits[L - 1]):
                    assert code != (1 << L) - 1, "all-ones Huffman code assigned"
                    code += 1
                code <<= 1
        if marker == 0xDA:
            break
        pos += 2 + ln
    assert saw_dht == 2  # DC + AC table for the single component


def test_jpeg_single_component_scan_ignores_sampling_factors():
    """T.81 A.2.2: a one-component scan is non-interleaved — libjpeg-style
    grayscale files keep 2x2 luma factors in SOF and must NOT decode in
    MCU-tile order (review finding, was silently scrambled)."""
    w = h = 32
    px = bytes((3 * x + 5 * y) % 256 for y in range(h) for x in range(w))
    payload = bytearray(ic.encode_jpeg_gray(w, h, px))
    sof = payload.index(b"\xff\xc0")
    assert payload[sof + 11 : sof + 12] == b"\x11"
    payload[sof + 11] = 0x22  # claim 2x2 sampling on the single component
    dec = ic.decode_jpeg(bytes(payload))
    assert dec["pixels"] == px  # identical decode: factors ignored


def test_jpeg_zero_sampling_factor_contained():
    """hv byte 0x00 on a component must raise ValueError, not
    ZeroDivisionError (review finding, reproduced stage-killer)."""
    w = h = 16
    rgb = bytes([10, 200, 60] * (w * h))
    payload = bytearray(ic.encode_jpeg_rgb(w, h, rgb, "4:4:4"))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 14] = 0x00  # second component's sampling byte
    with pytest.raises(ValueError):
        ic.decode_jpeg(bytes(payload))


def test_jpeg_non_divisor_sampling_refused():
    """hmax=3 with a h=2 component needs fractional upsampling — must be
    refused explicitly (before any entropy decode), not mis-decoded."""
    w = h = 16
    rgb = bytes([10, 200, 60] * (w * h))
    payload = bytearray(ic.encode_jpeg_rgb(w, h, rgb, "4:4:4"))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 11] = 0x31  # luma h=3
    payload[sof + 14] = 0x21  # chroma h=2 under hmax=3: NON-divisor
    with pytest.raises(ValueError, match="non-divisor"):
        ic.decode_jpeg(bytes(payload))


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn with DC-predictor resets: constant-block exactness must
    hold through restart boundaries, gray and 4:2:0 color."""
    w, h = 32, 16
    px = bytes((7 * (x // 8) + 13 * (y // 8)) % 256 for y in range(h) for x in range(w))
    for interval in (1, 3):
        payload = ic.encode_jpeg_gray(w, h, px, restart_interval=interval)
        assert b"\xff\xdd" in payload  # DRI present
        assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))
        assert ic.decode_jpeg(payload)["pixels"] == px
    import numpy as np

    rgb = bytes([90, 30, 210] * (w * h))
    dec = ic.decode_jpeg(ic.encode_jpeg_rgb(w, h, rgb, "4:2:0", restart_interval=1))
    a = np.frombuffer(dec["pixels"], np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(a - [90, 30, 210]).max() <= 2


def test_jpeg_422_roundtrip():
    import numpy as np

    w, h = 21, 11  # odd width exercises the horizontal-pair edge pad
    rgb = bytes([64, 128, 255] * (w * h))
    dec = ic.decode_jpeg(ic.encode_jpeg_rgb(w, h, rgb, "4:2:2"))
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 3)
    a = np.frombuffer(dec["pixels"], np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(a - [64, 128, 255]).max() <= 2


def test_jpeg_standalone_markers_skipped_consistently():
    """A TEM (0x01) marker before SOS must not desync the decoder — the
    sniffer skips it, so the decoder must too (review finding)."""
    good = ic.encode_jpeg_gray(8, 8, bytes(range(0, 256, 4)))
    patched = good[:2] + b"\xff\x01" + good[2:]
    assert ic.sniff_image_meta(patched) == {"format": "jpeg", "width": 8, "height": 8}
    assert ic.decode_jpeg(patched)["pixels"] == ic.decode_jpeg(good)["pixels"]
