"""Pure-stdlib WAV (RIFF PCM) codec + deterministic fixture source.

The audio analog of ``imagecodec``: REAL encoded bytes in, REAL decoded
samples out, with a pixel-pattern-style closed form so the DuckDB oracle
recomputes the decoded-signal statistics analytically — it never parses a
RIFF header, so an encoder/decoder bug pair cannot cancel out.

Format scope (documented seam, same policy as the image codecs): 16-bit
signed little-endian PCM, mono or stereo, standard 44-byte-header RIFF
with ``fmt `` and ``data`` chunks in any order and unknown chunks
skipped.  Compressed formats (mp3/ogg/aac) need a real library
(ffmpeg/soundfile — not in this container) and raise ValueError at the
clearly-marked seam.

Hostile-input hardening mirrors the image decoders: every length is
validated against the actual payload, sample counts are capped before any
allocation, and a truncated data chunk raises a contained ValueError —
never a huge allocation or a silent partial read.
"""

from __future__ import annotations

import struct

#: refuse absurd decode requests before allocating (1e8 samples ~ 200 MB)
MAX_SAMPLES = 100_000_000


def encode_wav(sample_rate: int, samples: list[int], channels: int = 1) -> bytes:
    """Deterministic RIFF/PCM16 writer.  ``samples`` are interleaved
    int16 values (frame-major for stereo); raises ValueError on range or
    shape violations (never asserts — asserts strip under -O)."""
    if channels not in (1, 2):
        raise ValueError(f"channels must be 1 or 2, got {channels}")
    if len(samples) % channels != 0:
        raise ValueError("sample count not a multiple of channels")
    if not 1 <= sample_rate <= 1_000_000:
        raise ValueError(f"bad sample rate {sample_rate}")
    for v in samples:
        if not -32768 <= v <= 32767:
            raise ValueError(f"sample {v} out of int16 range")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """RIFF/PCM16 decoder -> dict(sample_rate, channels, n_frames,
    samples list[int]).  Walks the chunk list (skipping unknown chunks),
    validates every declared length against the real payload, and caps
    the sample count before allocating."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        start = pos + 8
        if clen > len(payload) - start:
            raise ValueError("chunk length overruns payload")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", payload, start)
        elif cid == b"data":
            data = payload[start:start + clen]
        pos = start + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        # the compressed/float seam: a real audio library decodes these
        raise ValueError(f"unsupported WAV (format={audio_format} bits={bits})")
    if channels not in (1, 2):
        raise ValueError(f"unsupported channel count {channels}")
    if len(data) % (2 * channels) != 0:
        raise ValueError("data chunk not frame-aligned")
    n_samples = len(data) // 2
    if n_samples > MAX_SAMPLES:
        raise ValueError("sample count exceeds decode cap")
    samples = list(struct.unpack(f"<{n_samples}h", data))
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "n_frames": n_samples // channels,
        "samples": samples,
    }


def audio_stats(decoded: dict) -> dict:
    """Integer-exact signal statistics of a decoded clip: every value
    derives from exact int64 sums so any engine reproduces it bit-for-bit
    (the image_stats policy).  rms/sqrt is the single float step and uses
    math.sqrt (IEEE correctly rounded, == SQL sqrt)."""
    s = decoded["samples"]
    n = len(s)
    if n == 0:
        return {"sum_abs": None, "peak": None, "rms": None}
    import math

    sum_abs = sum(abs(v) for v in s)
    sum_sq = sum(v * v for v in s)
    return {
        "sum_abs": sum_abs,
        "peak": max(abs(v) for v in s),
        "rms": math.sqrt(sum_sq / n),
    }


def synth_wav(doc_id: int) -> bytes:
    """Deterministic synthetic clip — REAL encoded RIFF bytes with a
    closed form the oracle replays analytically:

        channels = 1 + doc_id % 2
        rate     = 8000 * (1 + doc_id % 3)
        n        = 600 + 150 * (doc_id % 4)      (samples, interleaved)
        s[i]     = ((31 * doc_id + 7 * i) % 4096) - 2048

    A sawtooth with a per-doc phase: integer-exact, full negative range,
    wraps inside every clip."""
    d = int(doc_id)
    channels = 1 + d % 2
    rate = 8000 * (1 + d % 3)
    n = 600 + 150 * (d % 4)
    if n % channels:
        n += 1
    samples = [((31 * d + 7 * i) % 4096) - 2048 for i in range(n)]
    return encode_wav(rate, samples, channels)
