"""Full-range format coverage for the PNG/GIF/BMP codecs: every legal
PNG IHDR combination (depths 1-16, palette, tRNS, Adam7), GIF interlace/
transparency/animation, BMP palette + RLE + bitfield paths — each decoder
path driven by its independent fixture-encoder twin, plus hand-derived
known-answer vectors for the quirkiest wire rules (RLE escapes, Adam7
geometry on tiny images)."""

import struct

import numpy as np
import pytest

from universal_key_value_based_text_processing_with_ocr_spark.operators import (
    imagecodec as ic,
)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize("interlace", [0, 1])
@pytest.mark.parametrize("dims", [(1, 1), (7, 3), (13, 9), (16, 16)])
def test_png_8bit_all_types_interlace(color_type, ch, interlace, dims):
    w, h = dims
    px = np.random.RandomState(w * h * color_type + interlace).randint(
        0, 256, w * h * ch, dtype=np.uint8
    ).tobytes()
    dec = ic.decode_png(
        ic.encode_png(w, h, px, color_type, lambda y: y % 5, interlace=interlace)
    )
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, ch)
    assert dec["pixels"] == px


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_16bit_high_byte_roundtrip(color_type, ch):
    """16-bit samples are written as v*257; the decoder keeps the high
    byte, so the round-trip is exact — pinning the documented 8-bit
    normalisation."""
    w, h = 12, 5
    px = np.random.RandomState(color_type).randint(
        0, 256, w * h * ch, dtype=np.uint8
    ).tobytes()
    dec = ic.decode_png(
        ic.encode_png(w, h, px, color_type, lambda y: y % 5, depth=16, interlace=1)
    )
    assert dec["pixels"] == px


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_gray(depth):
    w, h = 11, 7
    scale = 255 // ((1 << depth) - 1)
    rng = np.random.RandomState(depth)
    px = bytes(int(rng.randint(0, 1 << depth)) * scale for _ in range(w * h))
    dec = ic.decode_png(
        ic.encode_png(w, h, px, 0, lambda y: (2 * y) % 5, depth=depth, interlace=1)
    )
    assert dec["channels"] == 1
    assert dec["pixels"] == px


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_png_palette_with_and_without_trns(depth):
    w, h = 10, 6
    n = 1 << depth
    rng = np.random.RandomState(depth + 50)
    pal = bytes(rng.randint(0, 256, 3 * n, dtype=np.uint8))
    idx = bytes(rng.randint(0, n, w * h, dtype=np.uint8))
    dec = ic.decode_png(
        ic.encode_png(w, h, idx, 3, lambda y: y % 5, depth=depth, palette=pal,
                      interlace=depth % 2)
    )
    assert dec["channels"] == 3
    assert dec["pixels"] == b"".join(pal[3 * i : 3 * i + 3] for i in idx)
    trns = bytes(rng.randint(0, 256, max(1, n // 2), dtype=np.uint8))
    dec = ic.decode_png(
        ic.encode_png(w, h, idx, 3, lambda y: y % 5, depth=depth, palette=pal,
                      trns=trns)
    )
    assert dec["channels"] == 4
    expect = b"".join(
        pal[3 * i : 3 * i + 3] + bytes([trns[i] if i < len(trns) else 255])
        for i in idx
    )
    assert dec["pixels"] == expect


def test_png_adam7_known_answer_tiny():
    """3x3 grayscale Adam7: only passes 1 (1px), 4 (1px), 5 (1px), 6
    (1px), 7 (3px... actually rows 1) contribute — hand-derived pass
    geometry pins the scatter arithmetic."""
    # pixel value = 10*y + x for readability
    px = bytes(10 * y + x for y in range(3) for x in range(3))
    payload = ic.encode_png(3, 3, px, 0, lambda y: 0, interlace=1)
    dec = ic.decode_png(payload)
    assert dec["pixels"] == px
    # independently verify pass sizes from the spec geometry: for w=h=3,
    # passes contribute 1,0,0,1,1,2,3 rows x cols: total pixels must be 9
    sizes = []
    for x0, y0, dx, dy in ((0,0,8,8),(4,0,8,8),(0,4,4,8),(2,0,4,4),(0,2,2,4),(1,0,2,2),(0,1,1,2)):
        pw = max(0, -(-(3 - x0) // dx)) if x0 < 3 else 0
        ph = max(0, -(-(3 - y0) // dy)) if y0 < 3 else 0
        sizes.append(pw * ph)
    assert sum(sizes) == 9


def test_png_palette_index_out_of_range_rejected():
    pal = bytes(range(3 * 4))  # 4 entries
    payload = bytearray(ic.encode_png(2, 2, bytes([0, 1, 2, 3]), 3, depth=8,
                                      palette=pal))
    # shrink the palette chunk claim: rebuild with a 3-entry palette but
    # indices up to 3 -> decoder must refuse
    bad = ic.PNG_SIG
    pos = 8
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"PLTE":
            body = body[:9]
        bad += ic._chunk(bytes(tag), bytes(body))
        pos += 12 + ln
    with pytest.raises(ValueError, match="palette index out of range"):
        ic.decode_png(bad)


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def _pal256(seed=8):
    return bytes(np.random.RandomState(seed).randint(0, 256, 768, dtype=np.uint8))


def test_gif_interlaced_roundtrip():
    w, h = 13, 11
    pal = _pal256()
    idx = bytes(np.random.RandomState(1).randint(0, 256, w * h, dtype=np.uint8))
    dec = ic.decode_gif(ic.encode_gif(w, h, idx, pal, interlace=True))
    assert dec["pixels"] == b"".join(pal[3 * i : 3 * i + 3] for i in idx)


def test_gif_interlace_row_order_known_answer():
    """h=10: stored order must be rows 0,8 | 4 | 2,6 | 1,3,5,7,9."""
    assert ic._gif_deinterlace(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]


def test_gif_transparency_rgba():
    w, h = 7, 5
    pal = _pal256(2)
    idx = bytes(np.random.RandomState(3).randint(0, 256, w * h, dtype=np.uint8))
    t = idx[6]
    dec = ic.decode_gif(ic.encode_gif(w, h, idx, pal, transparent_index=t))
    assert dec["channels"] == 4
    for i, v in enumerate(idx):
        assert dec["pixels"][4 * i + 3] == (0 if v == t else 255)


def test_gif_animation_first_frame_and_count():
    w, h = 9, 4
    pal = _pal256(4)
    rng = np.random.RandomState(5)
    f1 = bytes(rng.randint(0, 256, w * h, dtype=np.uint8))
    f2 = bytes(rng.randint(0, 16, w * h, dtype=np.uint8))
    f3 = bytes(rng.randint(0, 256, w * h, dtype=np.uint8))
    lct = bytes(rng.randint(0, 256, 3 * 16, dtype=np.uint8))
    dec = ic.decode_gif(
        ic.encode_gif(w, h, f1, pal, extra_frames=[f2, f3],
                      local_palettes=[lct, None])
    )
    assert dec["frames"] == 3
    assert dec["pixels"] == b"".join(pal[3 * i : 3 * i + 3] for i in f1)


def test_gif_single_frame_reports_frames_1():
    dec = ic.decode_gif(ic.encode_gif(4, 4, bytes(16), _pal256(6)))
    assert dec["frames"] == 1


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bpp", [1, 4, 8])
def test_bmp_paletted_uncompressed(bpp):
    w, h = 13, 7
    n = 1 << bpp
    rng = np.random.RandomState(bpp)
    pal = bytes(rng.randint(0, 256, 3 * n, dtype=np.uint8))
    idx = bytes(rng.randint(0, n, w * h, dtype=np.uint8))
    dec = ic.decode_bmp(ic.encode_bmp_paletted(w, h, idx, pal, bpp=bpp))
    assert dec["pixels"] == b"".join(pal[3 * i : 3 * i + 3] for i in idx)


@pytest.mark.parametrize("bpp", [4, 8])
def test_bmp_rle_runs_and_absolute(bpp):
    w, h = 17, 6
    n = 1 << bpp
    rng = np.random.RandomState(bpp + 9)
    pal = bytes(rng.randint(0, 256, 3 * n, dtype=np.uint8))
    idx = bytearray()
    for y in range(h):  # mix long runs (encoded) and noise (absolute)
        idx.extend([y % n] * 6)
        idx.extend(int(v) for v in rng.randint(0, n, w - 6))
    idx = bytes(idx)
    dec = ic.decode_bmp(ic.encode_bmp_paletted(w, h, idx, pal, bpp=bpp, rle=True))
    assert dec["pixels"] == b"".join(pal[3 * i : 3 * i + 3] for i in idx)


def test_bmp_rle8_escape_known_answer():
    """Hand-built RLE8 stream: run, absolute, EOL, delta, EOB — the
    delta-skipped pixels stay index 0 (documented Windows behavior)."""
    pal_rgb = bytes(v for i in range(4) for v in (10 * i, 10 * i + 1, 10 * i + 2))
    pal = b"".join(
        bytes((pal_rgb[3 * i + 2], pal_rgb[3 * i + 1], pal_rgb[3 * i], 0))
        for i in range(4)
    )
    # 4x2 image, bottom-up: stored row0 (display row1): run 2x idx1,
    # absolute 3 [2,3,1] padded; EOL; row1: delta (1,0) skips 1 px, run
    # 3x idx2; EOB
    rle = bytes((2, 1, 0, 3, 2, 3, 1, 0, 0, 0, 0, 2, 1, 0, 3, 2, 0, 1))
    data_off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(rle), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, len(rle), 0, 0, 4, 0)
    dec = ic.decode_bmp(hdr + info + pal + rle)
    px = dec["pixels"]
    def rgb(i):
        return pal_rgb[3 * i : 3 * i + 3]
    # display row 0 = stored row 1: idx0 (delta skip), idx2 x3
    assert px[0:12] == rgb(0) + rgb(2) + rgb(2) + rgb(2)
    # display row 1 = stored row 0: idx1 x2, then absolute 2,3,1 -> 4 wide
    assert px[12:24] == rgb(1) + rgb(1) + rgb(2) + rgb(3)


@pytest.mark.parametrize("bitfields", [False, True])
def test_bmp_32bpp(bitfields):
    w, h = 9, 5
    rgb = bytes(np.random.RandomState(7).randint(0, 256, w * h * 3, dtype=np.uint8))
    dec = ic.decode_bmp(ic.encode_bmp32(w, h, rgb, bitfields=bitfields))
    assert dec["pixels"] == rgb


@pytest.mark.parametrize("fmt,bits", [("565", (5, 6, 5)), ("555", (5, 5, 5))])
def test_bmp_16bpp_bitfields(fmt, bits):
    w, h = 9, 5
    rb, gb, bb = bits
    rng = np.random.RandomState(11)

    def snap(v, b):
        return (int(v) >> (8 - b)) * 255 // ((1 << b) - 1)

    raw = rng.randint(0, 256, w * h * 3, dtype=np.uint8)
    rgb = bytes(
        snap(raw[i], (rb, gb, bb)[i % 3]) for i in range(len(raw))
    )
    dec = ic.decode_bmp(ic.encode_bmp16(w, h, rgb, fmt=fmt))
    assert dec["pixels"] == rgb


def test_bmp_hostile_paths():
    with pytest.raises(ValueError):
        ic.decode_bmp(b"BMgarbage")
    good = ic.encode_bmp_paletted(4, 4, bytes(16), bytes(range(48)), bpp=8, rle=True)
    with pytest.raises(ValueError):
        ic.decode_bmp(good[: len(good) - 30])  # palette/data truncated
    # oversized claimed dims refused before allocation
    big = bytearray(ic.encode_bmp(2, 2, bytes(12)))
    struct.pack_into("<ii", big, 18, 60000, 60000)
    with pytest.raises(ValueError, match="refusing"):
        ic.decode_bmp(bytes(big))


def test_decode_image_dispatch_still_routes_all():
    pal = _pal256(12)
    samples = {
        "png": ic.encode_png(5, 4, bytes(60), 2, interlace=1),
        "gif": ic.encode_gif(5, 4, bytes(20), pal, interlace=True),
        "bmp": ic.encode_bmp_paletted(5, 4, bytes(20), pal[:48], bpp=4, rle=True),
    }
    for fmt, payload in samples.items():
        assert ic.decode_image(payload)["format"] == fmt
