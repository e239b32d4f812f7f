"""Progressive JPEG (SOF2) — decoder and encoder, from the public ITU
T.81 spec (Annex G: spectral selection + successive approximation).

Most large-site web JPEGs are progressive, so a crawl-scale image
pipeline must decode them; reference analogue: darc archives fetched
image bodies as opaque blobs (darc/model/web/requests.py:50) and this
engine decodes them for per-row pixel invariants and phash dedup.

Decode model: every scan refines one persistent coefficient array —
DC scans (Ss=Se=0, interleaved or single-component) code DC diffs at
precision Al then one refinement bit per block per later scan; AC scans
(single-component, spectral band Ss..Se) code magnitudes at precision
Al with shared end-of-band (EOBn) runs, then refinement scans add one
correction bit per already-nonzero coefficient and place newly
significant ±2^Al values. Reconstruction (dequantize + IDCT + upsample
+ color) is shared with the baseline decoder.

The encoder emits the classic 8-scan script (DC first at Al=1 →
per-component AC 1..63 at Al=1 → DC refinement → per-component AC
refinement), which exercises every decode path; roundtrips reproduce
the EXACT quantized coefficients of the baseline encoder, so
``decode(encode_progressive(x)) == decode(encode_baseline(x))``
pixel-for-pixel — the strongest cheap oracle for both directions.

Everything raises ``ValueError`` on malformed input (never a raw
IndexError/KeyError/struct.error out of a Spark decode batch).
"""

from __future__ import annotations

import struct

import numpy as np

from darc_spark.functions.jpeg import (
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    _BitWriter,
    _build_codes,
    _build_lut,
    _category,
    _extend,
    _prepare_blocks,
    _reconstruct,
    _ScanReader,
    _seg,
)

_MAX_EOBRUN = 0x7FFF

# The Annex-K baseline AC tables define no EOBn (n>0) symbols — those
# exist only in progressive streams, whose encoders ship custom tables.
# This static table covers the FULL progressive AC alphabet (EOB0-14,
# ZRL, every run/size with size 1-10) as a flat 8-bit canonical code:
# valid (Kraft 176/256), deliberately simple — the encoder optimizes
# for exercising every decode path, not for entropy-optimal output.
PROG_AC_VALS = (
    [n << 4 for n in range(15)]
    + [0xF0]
    + [(r << 4) | sz for r in range(16) for sz in range(1, 11)]
)
PROG_AC_BITS = [0] * 16
PROG_AC_BITS[7] = len(PROG_AC_VALS)  # all codes 8 bits long


# ---------------------------------------------------------------------------
# bit-level reader helpers (over the baseline module's _ScanReader)


def _bits(r: _ScanReader, n: int) -> int:
    """Read ``n`` raw bits (n ≤ 16)."""
    if n == 0:
        return 0
    p = r.p
    v = (r.w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF
    r.p = p + n
    return v >> (16 - n)


def _sym(r: _ScanReader, tab) -> int:
    """Decode one Huffman SYMBOL, advancing past the code only.

    The baseline flat LUT packs "combined" entries (flag 0x8000) whose
    advance includes the magnitude bits; here the code length is
    recovered (total − SSSS) because progressive refinement scans put
    different bit kinds after the code."""
    p = r.p
    peek = (r.w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF
    e = tab[peek]
    if e == 0:
        raise ValueError("invalid Huffman code")
    s = e & 0xFF
    if e & 0x8000:
        codelen = ((e >> 8) & 0x7F) - (s & 0x0F)
    else:
        codelen = e >> 8
    r.p = p + codelen
    return s


# ---------------------------------------------------------------------------
# per-block scan decoders (T.81 Annex G decode procedures)


def _dc_first(r, dc_tab, pred: int, flat, base: int, al: int) -> int:
    size = _sym(r, dc_tab)
    diff = _extend(_bits(r, size), size) if size else 0
    pred += diff
    flat[base] = pred << al
    return pred


def _dc_refine(r, flat, base: int, al: int) -> None:
    if _bits(r, 1):
        flat[base] |= 1 << al  # two's-complement OR per G.1.2.1


def _ac_first(r, ac_tab, flat, base, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        s = _sym(r, ac_tab)
        rr, sz = s >> 4, s & 0x0F
        if sz:
            k += rr
            if k > se:
                raise ValueError("AC run past band end")
            flat[base + k] = _extend(_bits(r, sz), sz) << al
            k += 1
        elif rr == 15:
            k += 16  # ZRL
        else:
            eobrun = (1 << rr) - 1
            if rr:
                eobrun += _bits(r, rr)
            break
    return eobrun


def _ac_refine(r, ac_tab, flat, base, ss, se, al, eobrun) -> int:
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            s = _sym(r, ac_tab)
            rr, sz = s >> 4, s & 0x0F
            val = 0
            if sz == 0:
                if rr != 15:
                    eobrun = 1 << rr
                    if rr:
                        eobrun += _bits(r, rr)
                    break
                # rr == 15: ZRL — skip 16 zero-history coefficients
            else:
                if sz != 1:
                    raise ValueError("bad AC refinement symbol")
                val = p1 if _bits(r, 1) else m1
            # advance over already-nonzero coefs (reading correction
            # bits) and rr still-zero coefs, then place val
            while k <= se:
                c = flat[base + k]
                if c != 0:
                    if _bits(r, 1) and (c & p1) == 0:
                        flat[base + k] = c + (p1 if c >= 0 else m1)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val and k <= se:
                flat[base + k] = val
            k += 1
    if eobrun > 0:
        # end-of-band run covers this block: correction bits only
        while k <= se:
            c = flat[base + k]
            if c != 0:
                if _bits(r, 1) and (c & p1) == 0:
                    flat[base + k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


# ---------------------------------------------------------------------------
# scan-level walk


def _destuff_with_end(data: bytes, pos: int):
    """Like the baseline destuffer, but also returns the ABSOLUTE
    offset of the terminating marker so the header walk can continue
    parsing segments (DHT/SOS/EOI) after this scan's entropy data."""
    raw = np.frombuffer(data, dtype=np.uint8, count=len(data) - pos, offset=pos)
    segments: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    start = 0
    end = len(data)
    for i in np.flatnonzero(raw == 0xFF).tolist():
        if i < start:
            continue
        nxt = int(raw[i + 1]) if i + 1 < raw.size else -1
        if nxt == 0x00:
            cur.append((start, i + 1))
            start = i + 2
        elif 0xD0 <= nxt <= 0xD7:
            cur.append((start, i))
            segments.append(cur)
            cur = []
            start = i + 2
        else:
            cur.append((start, i))
            segments.append(cur)
            end = pos + i
            cur = None
            break
    if cur is not None:
        cur.append((start, raw.size))
        segments.append(cur)
    segs = [
        np.concatenate([raw[a:b] for a, b in seg])
        if seg
        else np.zeros(0, np.uint8)
        for seg in segments
    ]
    return segs, end


def _scan_geometry(frame, scan_ids):
    """(blocks per restart-unit iteration) for this scan: a list of
    (comp_index, base_offset_fn) is too slow — instead return the flat
    base index of every block of the scan, in scan order, paired with
    its component index."""
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
    shapes = [(mcus_y * c["v"], mcus_x * c["h"]) for c in comps]
    offsets, total = [], 0
    for nby, nbx in shapes:
        offsets.append(total)
        total += nby * nbx * 64
    order: list[tuple[int, int]] = []  # (comp_index, flat base)
    if len(scan_ids) == 1:
        matches = [
            i for i, c in enumerate(comps) if c["id"] == scan_ids[0]
        ]
        if not matches:
            raise ValueError("scan references unknown component")
        ci = matches[0]
        c = comps[ci]
        cw = (fw * c["h"] + hmax - 1) // hmax
        chh = (fh * c["v"] + vmax - 1) // vmax
        bw_n = (cw + 7) // 8
        bh_n = (chh + 7) // 8
        nbx = shapes[ci][1]
        for by in range(bh_n):
            for bx in range(bw_n):
                order.append((ci, offsets[ci] + (by * nbx + bx) * 64))
    else:
        id_to_ci = {c["id"]: i for i, c in enumerate(comps)}
        if any(s not in id_to_ci for s in scan_ids):
            raise ValueError("scan references unknown component")
        scan_cis = [id_to_ci[s] for s in scan_ids]
        if sorted(scan_cis) != list(range(len(comps))):
            raise ValueError(
                "unsupported progressive scan layout (partial interleave)"
            )
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in scan_cis:
                    c = comps[ci]
                    nbx = shapes[ci][1]
                    for by in range(c["v"]):
                        row = (my * c["v"] + by) * nbx + mx * c["h"]
                        for bx in range(c["h"]):
                            order.append(
                                (ci, offsets[ci] + (row + bx) * 64)
                            )
    return order, shapes, offsets, total, len(scan_ids)


def decode_progressive(data: bytes) -> np.ndarray:
    """SOF2 JPEG bytes → RGB8 HxWx3. Raises ValueError on malformed
    input (wrapped by the caller contract in ``decode_jpeg_py``)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], object] = {}
    frame = None
    restart_interval = 0
    flat: np.ndarray | None = None
    shapes = offsets = None
    from darc_spark.functions.jpeg import UNZIGZAG

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(payload, dtype=np.uint8, count=64, offset=p)
                qts[tq] = tbl.astype(np.int64)[UNZIGZAG]
                p += 64
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                bits = list(payload[p : p + 16])
                p += 16
                n = sum(bits)
                vals = list(payload[p : p + n])
                p += n
                huff[(tc, th)] = _build_lut(
                    bits, vals, tc == 1, progressive=True
                )
        elif marker == 0xC2:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unexpected second SOF in progressive stream")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", payload)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan_ids = []
            scan_tabs = {}
            for i in range(ns):
                cs, tdta = payload[1 + 2 * i], payload[2 + 2 * i]
                scan_ids.append(cs)
                scan_tabs[cs] = (tdta >> 4, tdta & 0x0F)
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            order, shapes, offsets, total, _ = _scan_geometry(
                frame, scan_ids
            )
            if flat is None:
                if total > 1 << 26:
                    # the pure-Python progressive path is for crawl-tile
                    # and mid-size web images; a (possibly corrupt)
                    # header asking for >2^26 coefficients must fail
                    # cleanly, not exhaust memory
                    raise ValueError("progressive image too large")
                flat = np.zeros(total, dtype=np.int64)
            if ss == 0 and se != 0:
                raise ValueError("DC+AC mixed scan is not legal (G.1.1.1)")
            if ss != 0 and len(scan_ids) != 1:
                raise ValueError("AC scan must be single-component")
            if se > 63 or ss > 63:
                raise ValueError("bad spectral band")
            segs, end = _destuff_with_end(data, pos)
            _decode_one_scan(
                segs, order, frame, scan_tabs, huff,
                ss, se, ah, al, restart_interval, flat,
            )
            pos = end
        # other markers (APPn/COM/DNL): skipped via the generic
        # length-prefixed payload consumption above
    if flat is None or frame is None:
        raise ValueError("no scan data found")
    return _reconstruct(flat, frame, qts, shapes, offsets)


def _decode_one_scan(
    segs, order, frame, scan_tabs, huff, ss, se, ah, al,
    restart_interval, flat,
):
    comps = frame["comps"]
    td_ta = {}
    for ci, c in enumerate(comps):
        if c["id"] in scan_tabs:
            td, ta = scan_tabs[c["id"]]
            dc_tab = huff.get((0, td)) if ss == 0 else None
            ac_tab = huff.get((1, ta)) if se > 0 else None
            if ss == 0 and ah == 0 and dc_tab is None:
                raise ValueError(f"missing DC table {td}")
            if ss > 0 and ac_tab is None:
                raise ValueError(f"missing AC table {ta}")
            td_ta[ci] = (dc_tab, ac_tab)
    n_units = len(order)
    unit = 0
    seg_iter = iter(segs)
    r = _ScanReader(next(seg_iter))
    preds = {ci: 0 for ci in td_ta}
    eobrun = 0
    while unit < n_units:
        if restart_interval and unit and unit % restart_interval == 0:
            try:
                r = _ScanReader(next(seg_iter))
            except StopIteration:
                raise ValueError("expected restart marker") from None
            preds = {ci: 0 for ci in td_ta}
            eobrun = 0
        ci, base = order[unit]
        dc_tab, ac_tab = td_ta[ci]
        if ss == 0:
            if ah == 0:
                preds[ci] = _dc_first(r, dc_tab, preds[ci], flat, base, al)
            else:
                _dc_refine(r, flat, base, al)
        else:
            if ah == 0:
                eobrun = _ac_first(
                    r, ac_tab, flat, base, ss, se, al, eobrun
                )
            else:
                eobrun = _ac_refine(
                    r, ac_tab, flat, base, ss, se, al, eobrun
                )
        if r.p > r.nbits:
            raise ValueError("truncated scan")
        unit += 1


# ---------------------------------------------------------------------------
# encoder (T.81 Annex G encode procedures; classic 8-scan script)


class _ScanWriter:
    """BitWriter + the shared end-of-band run state of one scan:
    ``eobrun`` counts blocks ending in EOB; refinement scans also
    buffer the correction bits riding with the pending run."""

    def __init__(self, ac_codes) -> None:
        self.bw = _BitWriter()
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []

    def flush_eob(self) -> None:
        if self.eobrun > 0:
            rr = self.eobrun.bit_length() - 1
            code, ln = self.ac[rr << 4]
            self.bw.write(code, ln)
            if rr:
                self.bw.write(self.eobrun - (1 << rr), rr)
            self.eobrun = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def bump_eob(self) -> None:
        self.eobrun += 1
        if self.eobrun == _MAX_EOBRUN:
            self.flush_eob()


def _enc_ac_first_block(sw: _ScanWriter, zz, ss, se, al) -> None:
    """One block of an AC first scan: runs/sizes over the point-
    transformed band (magnitude truncation toward zero per G.1.2.2),
    trailing zeros folded into the shared EOB run."""
    t = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v) >> al
        t.append(a if v >= 0 else -a)
    last = -1
    for i in range(len(t) - 1, -1, -1):
        if t[i]:
            last = i
            break
    if last < 0:
        sw.bump_eob()
        return
    sw.flush_eob()
    run = 0
    for i in range(last + 1):
        v = t[i]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = sw.ac[0xF0]
            sw.bw.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = sw.ac[(run << 4) | size]
        sw.bw.write(code, ln)
        sw.bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last < se - ss:
        sw.bump_eob()


def _enc_ac_refine_block(sw: _ScanWriter, zz, ss, se, al) -> None:
    """One block of an AC refinement scan (G.1.2.3 encode): newly
    significant coefficients (|v|>>Al == 1) emit (run,1)+sign;
    correction bits of already-nonzero coefficients ride buffered
    after the symbol (or with the pending EOB run)."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    sign = [1 if int(zz[k]) >= 0 else 0 for k in range(ss, se + 1)]
    eob = -1  # index of last newly-significant coefficient
    for i, a in enumerate(absv):
        if a == 1:
            eob = i
    run = 0
    br: list[int] = []
    for i, a in enumerate(absv):
        if a == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            sw.flush_eob()
            code, ln = sw.ac[0xF0]
            sw.bw.write(code, ln)
            run -= 16
            for b in br:
                sw.bw.write(b, 1)
            br = []
        if a > 1:
            br.append(a & 1)
            continue
        sw.flush_eob()
        code, ln = sw.ac[(run << 4) | 1]
        sw.bw.write(code, ln)
        sw.bw.write(sign[i], 1)
        for b in br:
            sw.bw.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        sw.eobrun += 1
        sw.pending.extend(br)
        if sw.eobrun == _MAX_EOBRUN:
            sw.flush_eob()


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 92, subsample: bool = False
) -> bytes:
    """RGB8 HxWx3 → progressive (SOF2) JFIF bytes.

    Scan script: interleaved DC first at Al=1; per-component AC 1..63
    first at Al=1; interleaved DC refinement to Al=0; per-component AC
    refinement to Al=0. Quantized coefficients are identical to
    :func:`darc_spark.functions.jpeg.encode_jpeg` at equal settings, so
    both decode to the same pixels. Deterministic."""
    comp_blocks, samp, qt_l, qt_c, mcus_x, mcus_y = _prepare_blocks(
        arr, quality, subsample
    )
    h, w = arr.shape[:2]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    enc_dc = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)] + [
        _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ] * 2
    enc_ac_prog = _build_codes(PROG_AC_BITS, PROG_AC_VALS)

    # per-component non-interleaved block geometry (scan order of the
    # AC scans; the STORAGE grid is the MCU-padded one)
    nonint = []
    for ci in range(3):
        sh, sv = samp[ci]
        cw = (w * sh + hmax - 1) // hmax
        chh = (h * sv + vmax - 1) // vmax
        nonint.append(((chh + 7) // 8, (cw + 7) // 8))

    def dc_scan(al: int, refine: bool) -> bytes:
        bw = _BitWriter()
        pred = [0, 0, 0]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(3):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            dc = int(
                                comp_blocks[ci][my * sv + by, mx * sh + bx, 0]
                            )
                            if refine:
                                bw.write((dc >> al) & 1, 1)
                                continue
                            v = dc >> al  # arithmetic shift per G.1.2.1
                            diff = v - pred[ci]
                            pred[ci] = v
                            size = _category(diff)
                            code, ln = enc_dc[ci][size]
                            bw.write(code, ln)
                            if size:
                                bw.write(
                                    diff if diff >= 0
                                    else diff + (1 << size) - 1,
                                    size,
                                )
        return bw.flush()

    def ac_scan(ci: int, al: int, refine: bool) -> bytes:
        sw = _ScanWriter(enc_ac_prog)
        bh_n, bw_n = nonint[ci]
        for by in range(bh_n):
            for bx in range(bw_n):
                zz = comp_blocks[ci][by, bx]
                if refine:
                    _enc_ac_refine_block(sw, zz, 1, 63, al)
                else:
                    _enc_ac_first_block(sw, zz, 1, 63, al)
        sw.flush_eob()
        return sw.bw.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    from darc_spark.functions.jpeg import ZIGZAG

    out += _seg(0xDB, bytes([0]) + bytes(qt_l[ZIGZAG].tolist()))
    out += _seg(0xDB, bytes([1]) + bytes(qt_c[ZIGZAG].tolist()))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, 3))
    for ci in range(3):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += _seg(0xC2, bytes(sof))  # SOF2 progressive
    out += _seg(0xC4, bytes([0x00] + DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x01] + DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
    out += _seg(0xC4, bytes([0x12] + PROG_AC_BITS) + bytes(PROG_AC_VALS))

    def sos(ids_tabs: list[tuple[int, int]], ss, se, ah, al) -> bytes:
        p = bytearray([len(ids_tabs)])
        for cid, tab in ids_tabs:
            p += bytes([cid, tab])
        p += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, bytes(p))

    # scan 1: DC first, all components, Al=1 (tab byte = (Td<<4)|Ta)
    out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, 1)
    out += dc_scan(1, refine=False)
    # scans 2-4: AC first per component, band 1..63, Al=1
    for ci in range(3):
        out += sos([(ci + 1, 0x02)], 1, 63, 0, 1)
        out += ac_scan(ci, 1, refine=False)
    # scan 5: DC refinement to Al=0
    out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 1, 0)
    out += dc_scan(0, refine=True)
    # scans 6-8: AC refinement per component to Al=0
    for ci in range(3):
        out += sos([(ci + 1, 0x02)], 1, 63, 1, 0)
        out += ac_scan(ci, 0, refine=True)
    out += b"\xff\xd9"
    return bytes(out)
