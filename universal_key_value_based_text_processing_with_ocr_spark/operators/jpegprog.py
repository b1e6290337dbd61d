"""Progressive JPEG (SOF2) — pure Python/numpy, ITU T.81 annex G.

Most large JPEGs on the web are progressive (libjpeg's default scan
script for quality web export), so this closes the biggest remaining
real-format gap behind the documented Pillow seam: the DECODER handles
multi-scan spectral selection + successive approximation — interleaved
and non-interleaved DC first/refine scans, AC first scans with EOB-run
batching, the AC refinement correction-bit algorithm (T.81 G.1.2.3),
tables redefined between scans, and restart markers inside progressive
scans.  Coefficients accumulate across scans in zigzag order; the final
reconstruction (dequant -> IDCT -> crop/upsample -> YCbCr->RGB) matches
the baseline decoder in ``imagecodec`` bit-for-bit, so a progressive and
a baseline encode of the SAME quantised coefficients decode to IDENTICAL
pixels — the equivalence the tests pin.

The ENCODER is the fixture source: a real progressive writer (the
standard 6-scan / 10-scan successive-approximation script with per-scan
Huffman tables built from each scan's own symbol stream, EOB-run
batching, buffered correction bits, optional restart markers) so every
decoder path has an independent forward twin.

Reference analog: the reference repo ingests document images through
OpenCV (``cv2.imread``, /root/reference/ocrfw/ocr.py:18-24), which
decodes progressive JPEG via libjpeg-turbo.
"""

from __future__ import annotations

import struct

import numpy as _np

from .imagecodec import (
    _DCT_C,
    _ZIGZAG,
    JPEG_UNIT_QUANT,
    _BitReader,
    _BitWriter,
    _canonical_codes,
    _category,
    _check_decoded_size,
    _extend,
    _huff_decode,
    _huffman_lengths,
    _pad_plane_to,
    _plane_qcoefs,
    _rgb_planes,
)

# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg_progressive(payload: bytes) -> dict:
    """Multi-scan progressive decode.  Raises ValueError on arithmetic
    coding, 12-bit precision, or malformed scan scripts (same contract as
    the baseline decoder)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict = {}
    huff: dict = {}
    comps: list = []
    width = height = None
    restart_interval = 0
    coefs: list = []  # per component: (nby, nbx, 64) int32, zigzag order
    eob_shift: list = []
    hmax = vmax = mcux = mcuy = 0
    pos = 2
    n = len(payload)
    saw_scan = False
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynchronised")
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > n:
            raise ValueError("JPEG segment truncated")
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quantisation tables unsupported")
                tbl = _np.zeros((8, 8))
                for k, (r, c) in enumerate(_ZIGZAG):
                    tbl[r, c] = body[i + 1 + k]
                qt[tid] = tbl
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nsym = sum(bits)
                vals = list(body[i + 17 : i + 17 + nsym])
                table: dict = {}
                code, vi = 0, 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(code, ln)] = vals[vi]
                        code += 1
                        vi += 1
                    code <<= 1
                huff[(cls, tid)] = table
                i += 17 + nsym
        elif marker == 0xC2:
            if body[0] != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            height, width = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            _check_decoded_size(width, height, 1 if ncomp == 1 else 3)
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                h_i, v_i = hv >> 4, hv & 0x0F
                if not (1 <= h_i <= 4 and 1 <= v_i <= 4):
                    raise ValueError("invalid JPEG sampling factors")
                comps.append({"id": cid, "h": h_i, "v": v_i, "tq": tq})
            if ncomp == 1:
                comps[0]["h"] = comps[0]["v"] = 1
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                if hmax % c["h"] or vmax % c["v"]:
                    raise ValueError("non-divisor JPEG sampling ratios unsupported")
            mcux = -(-width // (8 * hmax))
            mcuy = -(-height // (8 * vmax))
            for c in comps:
                # padded (MCU-covering) array dims; non-interleaved scans
                # touch only the leading bw x bh non-pad blocks
                c["bw"] = -(-(-(-width * c["h"] // hmax)) // 8)
                c["bh"] = -(-(-(-height * c["v"] // vmax)) // 8)
                coefs.append(
                    _np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=_np.int32)
                )
                eob_shift.append(0)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("mixed/other SOF in progressive decoder")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if not comps:
                raise ValueError("JPEG scan before SOF2 frame header")
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(i for i, x in enumerate(comps) if x["id"] == cid)
                scan.append((idx, tabs >> 4, tabs & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            data_start = pos + 2 + seg_len
            end = _decode_scan(
                payload, data_start, comps, coefs, scan, ss, se, ah, al,
                huff, restart_interval, mcux, mcuy,
            )
            saw_scan = True
            pos = end
            continue
        pos += 2 + seg_len
    if width is None or not saw_scan:
        raise ValueError("progressive JPEG has no SOF2/SOS")

    # reconstruction: dequant + IDCT per block, then crop/upsample —
    # identical arithmetic to the baseline decoder
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            raise ValueError("JPEG component references a missing quant table")
        q = qt[c["tq"]]
        nby, nbx, _ = coefs[ci].shape
        grid = _np.zeros((nby, nbx, 8, 8))
        zz = _np.array(_ZIGZAG)
        grid[:, :, zz[:, 0], zz[:, 1]] = coefs[ci]
        grid *= q
        pix = _np.einsum("xu,abuv,yv->abxy", _DCT_C.T, grid, _DCT_C.T) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        planes.append(plane)
    full = []
    for ci, c in enumerate(comps):
        cw = -(-width * c["h"] // hmax)
        ch = -(-height * c["v"] // vmax)
        p = planes[ci][:ch, :cw]
        p = _np.repeat(_np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:height, :width])
    if len(comps) == 1:
        gray = _np.clip(_np.rint(full[0]), 0, 255).astype(_np.uint8)
        return {
            "format": "jpeg", "width": width, "height": height,
            "channels": 1, "pixels": gray.tobytes(),
        }
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = _np.stack(
        [_np.clip(_np.rint(x), 0, 255).astype(_np.uint8) for x in (r, g, b)], axis=-1
    )
    return {
        "format": "jpeg", "width": width, "height": height,
        "channels": 3, "pixels": rgb.tobytes(),
    }


def _decode_scan(
    payload, data_start, comps, coefs, scan, ss, se, ah, al,
    huff, restart_interval, mcux, mcuy,
) -> int:
    """Entropy-decode one scan, updating ``coefs`` in place; returns the
    stream position of the next marker segment."""
    if se > 63 or ss > se:
        raise ValueError("invalid JPEG spectral selection")
    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixes DC and AC bands")
    if ah not in range(14) or al not in range(14):
        raise ValueError("invalid JPEG successive approximation")
    br = _BitReader(payload, data_start)
    interleaved = len(scan) > 1
    if interleaved and ss != 0:
        raise ValueError("interleaved progressive AC scan is illegal")
    for _ci, td, ta in scan:
        if ss == 0 and ah == 0 and (0, td) not in huff:
            raise ValueError("JPEG scan references a missing DC table")
        if ss > 0 and (1, ta) not in huff:
            raise ValueError("JPEG scan references a missing AC table")

    # per-scan state
    preds = {ci: 0 for ci, _, _ in scan}
    state = {"eobrun": 0}

    def check_restart(unit_index: int) -> None:
        if restart_interval and unit_index and unit_index % restart_interval == 0:
            if br.align_to_marker() is None:
                raise ValueError("missing JPEG restart marker")
            for k in preds:
                preds[k] = 0
            state["eobrun"] = 0

    if interleaved:  # DC scan over the MCU grid (pad blocks included)
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                check_restart(unit)
                for ci, td, _ta in scan:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
                            _dc_unit(br, blk, huff.get((0, td)), preds, ci, ah, al)
                unit += 1
    else:
        ci, td, ta = scan[0]
        c = comps[ci]
        unit = 0
        for byy in range(c["bh"]):
            for bxx in range(c["bw"]):
                check_restart(unit)
                blk = coefs[ci][byy, bxx]
                if ss == 0:
                    _dc_unit(br, blk, huff.get((0, td)), preds, ci, ah, al)
                elif ah == 0:
                    _ac_first_unit(br, blk, huff[(1, ta)], ss, se, al, state)
                else:
                    _ac_refine_unit(br, blk, huff[(1, ta)], ss, se, al, state)
                unit += 1

    # skip to the next marker segment (the reader may sit mid-byte)
    pos = br.pos
    while pos + 1 < len(payload):
        if payload[pos] == 0xFF and payload[pos + 1] not in (0x00,) and not (
            0xD0 <= payload[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return len(payload)


def _dc_unit(br, blk, dc_table, preds, ci, ah, al) -> None:
    if ah == 0:  # first pass: Huffman-coded shifted diffs
        t = _huff_decode(br, dc_table)
        if t > 11:
            raise ValueError("invalid JPEG DC category")
        diff = _extend(br.bits(t), t) if t else 0
        preds[ci] += diff
        blk[0] = preds[ci] << al
    else:  # refinement: one raw bit per block
        if br.bit():
            blk[0] = int(blk[0]) | (1 << al)


def _ac_first_unit(br, blk, ac_table, ss, se, al, state) -> None:
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        sym = _huff_decode(br, ac_table)
        r, s = sym >> 4, sym & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("JPEG AC coefficient index past Se")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1
        else:
            if r == 15:
                k += 16  # ZRL
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.bits(r)
            break


def _ac_refine_unit(br, blk, ac_table, ss, se, al, state) -> None:
    """T.81 G.1.2.3 correction-bit refinement (the jdphuff shape,
    reimplemented from the spec)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            sym = _huff_decode(br, ac_table)
            r, s = sym >> 4, sym & 0x0F
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("invalid JPEG AC refinement size")
                newval = p1 if br.bit() else m1
            else:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.bits(r)
                    break  # remaining coefficients handled by EOB logic
                # r == 15: ZRL — skip 16 zero-history coefficients
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if br.bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0:
                if br.bit() and (v & p1) == 0:
                    blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


# ---------------------------------------------------------------------------
# Encoder (fixture source; forward twin of every decoder path)
# ---------------------------------------------------------------------------


class _ScanWriter:
    """Per-scan symbol/bit stream with two-pass Huffman: record the
    symbol stream once, then emit with canonical tables built from the
    scan's own frequencies (mirrors the baseline encoder's policy)."""

    def __init__(self) -> None:
        self.items: list = []  # ("sym", class, table_id, symbol) | ("bits", v, n)
        self.freq: dict = {}  # (class, tid) -> {sym: count}

    def sym(self, cls: int, tid: int, s: int) -> None:
        self.items.append(("sym", cls, tid, s))
        f = self.freq.setdefault((cls, tid), {})
        f[s] = f.get(s, 0) + 1

    def bits(self, v: int, n: int) -> None:
        if n:
            self.items.append(("bits", v & ((1 << n) - 1), n))

    def rst(self) -> None:
        self.items.append(("rst",))

    def emit(self) -> tuple[bytes, dict]:
        tabs = {
            key: _canonical_codes(_huffman_lengths(f))
            for key, f in self.freq.items()
        }
        bw = _BitWriter()
        rst_no = 0
        for it in self.items:
            if it[0] == "sym":
                _, cls, tid, s = it
                code, ln = tabs[(cls, tid)][0][s]
                bw.write(code, ln)
            elif it[0] == "bits":
                bw.write(it[1], it[2])
            else:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst_no % 8)])
                rst_no += 1
        bw.flush()
        return bytes(bw.out), tabs


class _BitQueue:
    """EOB-run + buffered-correction-bit state for progressive AC scans
    (G.1.2.2/G.1.2.3: correction bits trail the symbol that flushes
    them, potentially across blocks)."""

    def __init__(self, sw: _ScanWriter, tid: int) -> None:
        self.sw = sw
        self.tid = tid
        self.eobrun = 0
        self.buffered: list[int] = []

    def flush_eob(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sw.sym(1, self.tid, nbits << 4)
            if nbits:
                self.sw.bits(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.buffered:
            self.sw.bits(b, 1)
        self.buffered = []

    def bump_eob(self) -> None:
        self.eobrun += 1
        if self.eobrun == 0x7FFF:
            self.flush_eob()


def _encode_dc_scan(sw, qcoefs, scan, comps, mcux, mcuy, al, restart_interval):
    preds = {ci: 0 for ci, _, _ in scan}
    unit = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and unit and unit % restart_interval == 0:
                sw.rst()
                for k in preds:
                    preds[k] = 0
            for ci, td, _ta in scan:
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        dc = int(qcoefs[ci][my * c["v"] + by, mx * c["h"] + bx, 0])
                        v = dc >> al  # arithmetic shift (T.81 G.1.2.1)
                        diff = v - preds[ci]
                        preds[ci] = v
                        cat = _category(diff)
                        sw.sym(0, td, cat)
                        if cat:
                            sw.bits(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
            unit += 1


def _encode_dc_refine_scan(sw, qcoefs, scan, comps, mcux, mcuy, al, restart_interval):
    unit = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and unit and unit % restart_interval == 0:
                sw.rst()
            for ci, _td, _ta in scan:
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        dc = int(qcoefs[ci][my * c["v"] + by, mx * c["h"] + bx, 0])
                        sw.bits((dc >> al) & 1, 1)
            unit += 1


def _encode_ac_first_scan(sw, qc, bh, bw_, ta, ss, se, al, restart_interval):
    q = _BitQueue(sw, ta)
    unit = 0
    for by in range(bh):
        for bx in range(bw_):
            if restart_interval and unit and unit % restart_interval == 0:
                q.flush_eob()
                sw.rst()
            unit += 1
            blk = qc[by, bx]
            run = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                mag = (v if v >= 0 else -v) >> al
                if mag == 0:
                    run += 1
                    continue
                q.flush_eob()
                while run > 15:
                    sw.sym(1, ta, 0xF0)
                    run -= 16
                size = _category(mag)
                sw.sym(1, ta, (run << 4) | size)
                sent = mag if v >= 0 else -mag
                sw.bits(sent if sent >= 0 else sent + (1 << size) - 1, size)
                run = 0
            if run > 0:
                q.bump_eob()
    q.flush_eob()


def _encode_ac_refine_scan(sw, qc, bh, bw_, ta, ss, se, al, restart_interval):
    q = _BitQueue(sw, ta)
    unit = 0
    for by in range(bh):
        for bx in range(bw_):
            if restart_interval and unit and unit % restart_interval == 0:
                q.flush_eob()
                sw.rst()
            unit += 1
            blk = qc[by, bx]
            mags = [(abs(int(blk[k])) >> al) for k in range(ss, se + 1)]
            eob = -1  # index of the LAST newly-significant coefficient
            for i, m in enumerate(mags):
                if m == 1:
                    eob = i
            run = 0
            pending: list[int] = []
            for i, m in enumerate(mags):
                k = ss + i
                if m == 0:
                    run += 1
                    continue
                # ZRL decision happens at EVERY nonzero position (history
                # included) so correction bits flush after exactly the
                # symbol whose decoder-side advance passes over them —
                # and only while a later newly-significant coefficient
                # exists in this block (otherwise the tail is EOB-run)
                while run > 15 and i <= eob:
                    q.flush_eob()
                    sw.sym(1, ta, 0xF0)
                    run -= 16
                    for b in pending:
                        sw.bits(b, 1)
                    pending = []
                if m > 1:  # history coefficient: buffered correction bit
                    pending.append(m & 1)
                    continue
                # newly significant (m == 1)
                q.flush_eob()
                sw.sym(1, ta, (run << 4) | 1)
                sw.bits(1 if int(blk[k]) >= 0 else 0, 1)
                for b in pending:
                    sw.bits(b, 1)
                pending = []
                run = 0
            if run > 0 or pending:
                q.buffered.extend(pending)
                q.bump_eob()
            # a block that ended exactly on its last newly-significant
            # coefficient with no trailing zeros/corrections needs no EOB
    q.flush_eob()


def encode_jpeg_progressive(
    width: int,
    height: int,
    planes: list,
    samplings: list,
    quants: list,
    restart_interval: int = 0,
) -> bytes:
    """Progressive encoder core: the standard successive-approximation
    script (DC Al=1 -> per-component AC 1-5 then 6-63 at Al=2 -> AC
    refinements to Al=0 -> DC refinement)."""
    ncomp = len(planes)
    hmax = max(h for h, _ in samplings)
    vmax = max(v for _, v in samplings)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    comps = []
    qcoefs = []
    for ci, plane in enumerate(planes):
        h_i, v_i = samplings[ci]
        padded = _pad_plane_to(plane, mcuy * 8 * v_i, mcux * 8 * h_i)
        qc = _plane_qcoefs(padded, quants[min(ci, 1)])
        nby, nbx = qc.shape[:2]
        zz = _np.array(_ZIGZAG)
        qcoefs.append(qc[:, :, zz[:, 0], zz[:, 1]].astype(_np.int64))
        comps.append(
            {
                "h": h_i, "v": v_i,
                "bw": -(-(-(-width * h_i // hmax)) // 8),
                "bh": -(-(-(-height * v_i // vmax)) // 8),
            }
        )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    ntab = 1 if ncomp == 1 else 2
    out = bytearray(b"\xff\xd8")
    for t in range(ntab):
        zzq = bytes(int(quants[t][r * 8 + c]) for (r, c) in _ZIGZAG)
        out += seg(0xDB, bytes([t]) + zzq)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        h_i, v_i = samplings[ci]
        sof += bytes([ci + 1, (h_i << 4) | v_i, min(ci, 1)])
    out += seg(0xC2, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    # scan script (grayscale: 6 scans; color: DC interleaved + per-comp AC)
    dc_scan = [(ci, min(ci, 1), 0) for ci in range(ncomp)]
    script: list = [("dc_first", dc_scan, 0, 0, 0, 1)]
    for ci in range(ncomp):
        t = min(ci, 1)
        script.append(("ac_first", [(ci, 0, t)], 1, 5, 0, 2))
        script.append(("ac_first", [(ci, 0, t)], 6, 63, 0, 2))
    for ci in range(ncomp):
        t = min(ci, 1)
        script.append(("ac_refine", [(ci, 0, t)], 1, 63, 2, 1))
        script.append(("ac_refine", [(ci, 0, t)], 1, 63, 1, 0))
    script.append(("dc_refine", dc_scan, 0, 0, 1, 0))

    for kind, scan, ss, se, ah, al in script:
        sw = _ScanWriter()
        if kind == "dc_first":
            _encode_dc_scan(sw, qcoefs, scan, comps, mcux, mcuy, al, restart_interval)
        elif kind == "dc_refine":
            _encode_dc_refine_scan(
                sw, qcoefs, scan, comps, mcux, mcuy, al, restart_interval
            )
        else:
            ci, _td, ta = scan[0]
            c = comps[ci]
            if kind == "ac_first":
                _encode_ac_first_scan(
                    sw, qcoefs[ci], c["bh"], c["bw"], ta, ss, se, al,
                    restart_interval,
                )
            else:
                _encode_ac_refine_scan(
                    sw, qcoefs[ci], c["bh"], c["bw"], ta, ss, se, al,
                    restart_interval,
                )
        data, tabs = sw.emit()
        for (cls, tid), (codes, bits_arr, vals) in tabs.items():
            out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits_arr) + bytes(vals))
        sos = bytes([len(scan)])
        for ci, td, ta in scan:
            sos += bytes([ci + 1, (td << 4) | ta])
        out += seg(0xDA, sos + bytes([ss, se, (ah << 4) | al]))
        out += data
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray_progressive(
    width: int, height: int, pixels: bytes, quant=None, restart_interval: int = 0
) -> bytes:
    if len(pixels) != width * height:
        raise ValueError("pixel buffer length mismatch")
    quant = list(JPEG_UNIT_QUANT if quant is None else quant)
    plane = _np.frombuffer(pixels, dtype=_np.uint8).reshape(height, width)
    return encode_jpeg_progressive(
        width, height, [plane], [(1, 1)], [quant], restart_interval=restart_interval
    )


def encode_jpeg_rgb_progressive(
    width: int,
    height: int,
    rgb: bytes,
    subsampling: str = "4:2:0",
    quant=None,
    chroma_quant=None,
    restart_interval: int = 0,
) -> bytes:
    if len(rgb) != width * height * 3:
        raise ValueError("pixel buffer length mismatch")
    if subsampling not in ("4:2:0", "4:2:2", "4:4:4"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    quant = list(JPEG_UNIT_QUANT if quant is None else quant)
    chroma_quant = list(quant if chroma_quant is None else chroma_quant)
    planes, samplings = _rgb_planes(width, height, rgb, subsampling)
    return encode_jpeg_progressive(
        width, height, planes, samplings, [quant, chroma_quant],
        restart_interval=restart_interval,
    )
