"""Progressive JPEG (SOF2) tests.

The load-bearing property: a progressive and a baseline encode of the
SAME pixels with the SAME quantisation tables carry identical quantised
coefficients, so the two decoders must produce IDENTICAL pixels.  That
equivalence exercises every scan kind (interleaved DC first/refine,
per-component AC first with EOB runs, the AC refinement correction-bit
algorithm) against the independently-tested baseline decoder — an
encoder/decoder bug pair would additionally have to cancel across two
different coders to slip through.
"""

import struct

import numpy as np
import pytest

from universal_key_value_based_text_processing_with_ocr_spark.operators import (
    imagecodec as ic,
)
from universal_key_value_based_text_processing_with_ocr_spark.operators import (
    jpegprog as jp,
)

# a real (scaled) luma quantisation table: non-unit values make the AC
# bands sparse the way web JPEGs are, driving EOB runs and refinements
QTBL = [
    max(1, v // 8)
    for v in [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ]
]


@pytest.mark.parametrize("dims", [(8, 8), (16, 16), (13, 9), (24, 17), (40, 33)])
def test_gray_progressive_equals_baseline(dims):
    w, h = dims
    px = np.random.RandomState(w * 100 + h).randint(
        0, 256, (h, w), dtype=np.uint8
    ).tobytes()
    base = ic.decode_jpeg(ic.encode_jpeg_gray(w, h, px, quant=QTBL))
    prog = ic.decode_jpeg(jp.encode_jpeg_gray_progressive(w, h, px, quant=QTBL))
    assert (prog["width"], prog["height"], prog["channels"]) == (w, h, 1)
    assert prog["pixels"] == base["pixels"]


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
@pytest.mark.parametrize("dims", [(16, 16), (21, 11), (34, 18)])
def test_color_progressive_equals_baseline(sub, dims):
    w, h = dims
    rgb = np.random.RandomState(hash((w, h)) % 2**31).randint(
        0, 256, (h, w, 3), dtype=np.uint8
    ).tobytes()
    base = ic.decode_jpeg(ic.encode_jpeg_rgb(w, h, rgb, sub, quant=QTBL))
    prog = ic.decode_jpeg(jp.encode_jpeg_rgb_progressive(w, h, rgb, sub, quant=QTBL))
    assert prog["channels"] == 3
    assert prog["pixels"] == base["pixels"]


@pytest.mark.parametrize("interval", [1, 2, 5])
def test_restart_markers_inside_progressive_scans(interval):
    rgb = np.random.RandomState(interval).randint(
        0, 256, (24, 24, 3), dtype=np.uint8
    ).tobytes()
    base = ic.decode_jpeg(ic.encode_jpeg_rgb(24, 24, rgb, "4:2:0", quant=QTBL))
    prog = ic.decode_jpeg(
        jp.encode_jpeg_rgb_progressive(
            24, 24, rgb, "4:2:0", quant=QTBL, restart_interval=interval
        )
    )
    assert prog["pixels"] == base["pixels"]
    # the stream genuinely contains RST markers inside scans
    payload = jp.encode_jpeg_rgb_progressive(
        24, 24, rgb, "4:2:0", quant=QTBL, restart_interval=interval
    )
    assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))


def test_unit_quant_constant_blocks_bit_exact():
    """The oracle fixture setting: constant blocks + unit quant decode
    EXACTLY through the progressive path (synth_jpeg's odd-doc_id leg)."""
    for d in (1, 3, 5, 7):
        payload = ic.synth_jpeg(d)
        # odd doc_ids are progressive streams
        assert b"\xff\xc2" in payload
        dec = ic.decode_jpeg(payload)
        w, h = 8 * (1 + d % 4), 8 * (1 + (3 * d) % 4)
        expect = bytes(
            (7 * (x // 8) + 13 * (y // 8) + 31 * d) % 256
            for y in range(h) for x in range(w)
        )
        assert dec["pixels"] == expect
        assert ic.sniff_image_meta(payload) == {
            "format": "jpeg", "width": w, "height": h,
        }


def test_gradient_stress_all_scan_kinds():
    """A smooth gradient + noise mix produces coefficients at many
    magnitudes, driving newly-significant vs history refinement paths,
    ZRL-within-refinement and cross-block EOB-run correction bits."""
    w, h = 48, 32
    yy, xx = np.mgrid[0:h, 0:w]
    px = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    rng = np.random.RandomState(9)
    px = np.clip(px.astype(int) + rng.randint(-6, 7, px.shape), 0, 255).astype(np.uint8)
    base = ic.decode_jpeg(ic.encode_jpeg_gray(w, h, px.tobytes(), quant=QTBL))
    prog = ic.decode_jpeg(
        jp.encode_jpeg_gray_progressive(w, h, px.tobytes(), quant=QTBL)
    )
    assert prog["pixels"] == base["pixels"]


def test_hostile_inputs_contained():
    good = jp.encode_jpeg_gray_progressive(16, 16, bytes(256))
    for cut in (4, 30, 80, len(good) - 3):
        with pytest.raises(ValueError):
            ic.decode_jpeg(good[:cut])
    # dims bomb on the SOF2 header: size cap fires before allocation
    big = bytearray(good)
    sof = big.index(b"\xff\xc2")
    struct.pack_into(">HH", big, sof + 5, 65000, 65000)
    with pytest.raises(ValueError, match="refusing"):
        ic.decode_jpeg(bytes(big))


def test_bitflip_sweep_contained():
    payload = bytearray(jp.encode_jpeg_gray_progressive(16, 16, bytes(range(256))))
    for bit in range(0, min(len(payload), 160) * 8, 11):
        mutated = bytearray(payload)
        mutated[bit // 8] ^= 1 << (bit % 8)
        try:
            ic.decode_jpeg(bytes(mutated))
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001 — the assertion target
            pytest.fail(f"non-ValueError escape at bit {bit}: {type(e).__name__} {e}")


def test_dispatcher_routes_progressive():
    payload = jp.encode_jpeg_gray_progressive(8, 8, bytes(64))
    dec = ic.decode_image(payload)
    assert dec["format"] == "jpeg" and dec["channels"] == 1
