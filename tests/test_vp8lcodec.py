"""WebP-lossless (VP8L) codec tests: per-variant round-trips (each
encoder feature is the independent forward twin of one decoder path, so
a failure localises), hostile-input hardening, and dispatcher routing.

The pixel pattern is the synth_webp closed form, so these tests also pin
the contract the DuckDB oracle for `multimodal_webp_decode` relies on.
"""

import struct

import pytest

from universal_key_value_based_text_processing_with_ocr_spark.operators import (
    imagecodec as ic,
)
from universal_key_value_based_text_processing_with_ocr_spark.operators import (
    vp8lcodec as vc,
)


def _pattern(w, h, d=0):
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
    return bytes(rgba)


@pytest.mark.parametrize(
    "kwargs",
    [
        {},  # plain literals
        {"use_lz77": True},
        {"cache_bits": 4},
        {"use_lz77": True, "cache_bits": 6},
        {"subtract_green": True},
        {"predictor_bits": 2},
        {"predictor_bits": 3, "subtract_green": True},
        {"color_transform_bits": 2},
        {"color_transform_bits": 3, "subtract_green": True},
        {"predictor_bits": 2, "color_transform_bits": 2, "subtract_green": True},
        {"meta_bits": 2},
        {"meta_bits": 3, "subtract_green": True},
    ],
)
def test_roundtrip_variants(kwargs):
    w, h = 13, 9  # non-multiple of block sizes: edge blocks exercised
    rgba = _pattern(w, h, d=5)
    dec = vc.decode_webp(vc.encode_webp_lossless(w, h, rgba, **kwargs))
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 4)
    assert dec["pixels"] == rgba


@pytest.mark.parametrize("n_colors", [2, 3, 4, 5, 16, 17, 200])
def test_roundtrip_palette_all_packings(n_colors):
    """Color-indexing at every width_bits (3/2/1/0): sub-byte packing and
    the packed-width restore path."""
    w, h = 11, 6
    rgba = bytearray()
    for y in range(h):
        for x in range(w):
            c = (x + 3 * y) % n_colors
            rgba += bytes(((c * 37) % 256, (c * 11 + 3) % 256, (c * 5 + 9) % 256, 255))
    dec = vc.decode_webp(vc.encode_webp_lossless(w, h, bytes(rgba), palette=True))
    assert dec["pixels"] == bytes(rgba)


def test_roundtrip_alpha_channel():
    w, h = 6, 4
    rgba = bytearray()
    for i in range(w * h):
        rgba += bytes((i % 256, (2 * i) % 256, (3 * i) % 256, (40 + 7 * i) % 256))
    dec = vc.decode_webp(vc.encode_webp_lossless(w, h, bytes(rgba)))
    assert dec["pixels"] == bytes(rgba)


def test_synth_webp_all_variants_match_closed_form():
    for d in range(12):  # two full passes over the 6 variants
        out = vc.decode_webp(vc.synth_webp(d))
        w, h = 4 * (1 + d % 4), 4 * (1 + (3 * d) % 4)
        assert (out["width"], out["height"]) == (w, h)
        assert out["pixels"] == _pattern(w, h, d)


def test_dispatcher_routes_webp():
    payload = vc.synth_webp(3)
    dec = ic.decode_image(payload)
    assert dec["format"] == "webp"
    assert dec["pixels"] == _pattern(dec["width"], dec["height"], 3)


def test_lossy_vp8_raises_with_seam_message():
    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(ValueError, match="lossy VP8"):
        vc.decode_webp(lossy)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: p[:20],  # truncated mid-stream
        lambda p: p[:12],  # no VP8L chunk at all
        lambda p: b"XXXX" + p[4:],  # not RIFF
        lambda p: p.replace(b"VP8L", b"VP8L", 1)[:12]
        + b"VP8L" + struct.pack("<I", 1) + b"\x00",  # bad signature byte
    ],
)
def test_hostile_inputs_raise_valueerror(mutate):
    payload = vc.synth_webp(1)
    with pytest.raises(ValueError):
        vc.decode_webp(mutate(payload))


def test_hostile_dims_capped():
    """A 16383x16383 header (the format max) must be refused before any
    pixel allocation — same MAX_DECODED_BYTES policy as the other codecs."""
    bw = vc._BitWriter()
    bw.write(16382, 14)
    bw.write(16382, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    payload = vc._riff_wrap(b"\x2f" + bw.flush())
    with pytest.raises(ValueError, match="refusing image"):
        vc.decode_webp(payload)


def test_backward_reference_before_start_rejected():
    """Corrupt streams with an LZ77 copy reaching before pixel 0 must be
    a clean ValueError, not an index error or garbage pixels."""
    # encode with lz77 then flip bits until decode fails; assert every
    # failure mode is ValueError (the per-row containment contract)
    payload = bytearray(vc.synth_webp(7))  # variant 1 = lz77
    failures = 0
    for bit in range(21 * 8, min(len(payload) * 8, 45 * 8)):
        mutated = bytearray(payload)
        mutated[bit // 8] ^= 1 << (bit % 8)
        try:
            vc.decode_webp(bytes(mutated))
        except ValueError:
            failures += 1
        except Exception as e:  # noqa: BLE001 — the assertion target
            pytest.fail(f"non-ValueError escape on bit {bit}: {type(e).__name__} {e}")
    assert failures > 0  # the sweep actually hit the error paths


def test_sniff_matches_decode_dims():
    for d in (0, 5, 9):
        payload = vc.synth_webp(d)
        meta = ic.sniff_image_meta(payload)
        dec = vc.decode_webp(payload)
        assert meta == {
            "format": "webp",
            "width": dec["width"],
            "height": dec["height"],
        }


def test_encoder_guards():
    rgba = _pattern(4, 4)
    with pytest.raises(ValueError, match="length mismatch"):
        vc.encode_webp_lossless(5, 4, rgba)
    with pytest.raises(ValueError, match="meta_bits excludes"):
        vc.encode_webp_lossless(4, 4, rgba, meta_bits=2, use_lz77=True)
    with pytest.raises(ValueError, match="palette excludes"):
        vc.encode_webp_lossless(4, 4, rgba, palette=True, color_transform_bits=2)
