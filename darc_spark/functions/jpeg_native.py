"""Optional ctypes-compiled fast path for the JPEG entropy decoder.

The pure-Python scan decoder in :mod:`darc_spark.functions.jpeg` is the
reference implementation (and the fallback): bit-identical, fuzzed, and
dependency-free. Its per-symbol cost is CPython's interpreter floor
(~0.15 µs/op), which caps decode at ~3-4× the round-4 speed. Real
deployments decode with native code (PIL when importable); this module
provides the same escape hatch for the no-PIL case by compiling a
~100-line C transcription of the SAME scan loop with the system C
compiler at first use, loaded via ctypes.

Strictly optional: no compiler, a failed compile, or
``DARC_SPARK_NO_NATIVE=1`` silently selects the Python path. The C
loop is kept semantically identical — same LUT entries (including the
combined code+value encoding), same error conditions, same output
array — and ``tests/test_jpeg.py`` runs both paths differentially over
the fuzz corpus.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>

/* Decode one entropy-coded scan into a flat zig-zag coefficient array.
   Transcription of darc_spark.functions.jpeg._decode_block /
   _decode_scan's MCU loop; LUT entries are the Python module's:
   0 invalid; 0x8000|(total<<8)|sym combined; (len<<8)|sym plain.
   Returns 0 ok, 1 invalid code, 2 truncated, 3 AC run past end,
   4 missing restart segment. */

typedef struct {
    const uint8_t *data;
    int64_t size;     /* bytes */
    int64_t p;        /* bit position */
} reader_t;

static inline uint32_t peek16(const reader_t *r) {
    int64_t i = r->p >> 3;
    uint32_t w = 0;
    for (int k = 0; k < 3; k++) {        /* 16 bits + ≤7 skew fit in 24 */
        uint32_t b = (i + k < r->size) ? r->data[i + k] : 0xFF;
        w = (w << 8) | b;
    }
    return (w >> (8 - (r->p & 7))) & 0xFFFF;
}

static int decode_block(reader_t *r, const uint16_t *dc_tab,
                        const uint16_t *ac_tab, int32_t *pred,
                        int32_t *zz) {
    uint32_t peek = peek16(r);
    uint32_t e = dc_tab[peek];
    if (e == 0) return 1;
    int32_t size = e & 0xFF, diff;
    if (e & 0x8000) {
        int32_t total = (e >> 8) & 0x7F;
        int32_t v = (peek >> (16 - total)) & ((1 << size) - 1);
        r->p += total;
        diff = (v >= (1 << (size - 1))) ? v : v - (1 << size) + 1;
    } else if (size) {
        r->p += e >> 8;
        int32_t v = (peek16(r) >> (16 - size)) & ((1 << size) - 1);
        r->p += size;
        diff = (v >= (1 << (size - 1))) ? v : v - (1 << size) + 1;
    } else {
        r->p += e >> 8;
        diff = 0;
    }
    *pred += diff;
    zz[0] = *pred;
    int k = 1;
    while (k < 64) {
        peek = peek16(r);
        e = ac_tab[peek];
        if (e == 0) return 1;
        uint32_t sym = e & 0xFF;
        if (e & 0x8000) {
            size = sym & 0x0F;
            k += sym >> 4;
            if (k > 63) return 3;
            int32_t total = (e >> 8) & 0x7F;
            int32_t v = (peek >> (16 - total)) & ((1 << size) - 1);
            r->p += total;
            zz[k++] = (v >= (1 << (size - 1))) ? v : v - (1 << size) + 1;
            continue;
        }
        r->p += e >> 8;
        if (sym == 0x00) break;            /* EOB */
        if (sym == 0xF0) { k += 16; continue; }  /* ZRL */
        size = sym & 0x0F;
        k += sym >> 4;
        if (k > 63) return 3;
        int32_t v = (peek16(r) >> (16 - size)) & ((1 << size) - 1);
        r->p += size;
        zz[k++] = (v >= (1 << (size - 1))) ? v : v - (1 << size) + 1;
    }
    if (r->p > r->size * 8) return 2;
    return 0;
}

int darc_decode_scan(
    const uint8_t *seg_data, const int64_t *seg_ends, int32_t n_segs,
    const uint16_t *luts,          /* n_comps × 2 × 65536 (dc, ac) */
    const int32_t *comp_v, const int32_t *comp_h,
    const int32_t *comp_nbx, const int64_t *comp_off,
    int32_t n_comps, int32_t mcus_y, int32_t mcus_x,
    int32_t restart_interval, int32_t *out)
{
    reader_t r;
    int seg = 0;
    r.data = seg_data;
    r.size = seg_ends[0];
    r.p = 0;
    int64_t seg_base = 0;
    int32_t pred[8] = {0};
    int64_t mcu_count = 0;
    for (int my = 0; my < mcus_y; my++)
        for (int mx = 0; mx < mcus_x; mx++) {
            if (restart_interval && mcu_count &&
                mcu_count % restart_interval == 0) {
                if (++seg >= n_segs) return 4;
                seg_base = seg_ends[seg - 1];
                r.data = seg_data + seg_base;
                r.size = seg_ends[seg] - seg_base;
                r.p = 0;
                for (int i = 0; i < n_comps; i++) pred[i] = 0;
            }
            for (int ci = 0; ci < n_comps; ci++) {
                const uint16_t *dc = luts + (int64_t)ci * 2 * 65536;
                const uint16_t *ac = dc + 65536;
                int cv = comp_v[ci], ch = comp_h[ci], nbx = comp_nbx[ci];
                for (int by = 0; by < cv; by++) {
                    int64_t row = ((int64_t)my * cv + by) * nbx
                                  + (int64_t)mx * ch;
                    for (int bx = 0; bx < ch; bx++) {
                        int rc = decode_block(
                            &r, dc, ac, &pred[ci],
                            out + comp_off[ci] + (row + bx) * 64);
                        if (rc) return rc;
                    }
                }
            }
            mcu_count++;
        }
    return 0;
}
"""

_lib = None
_tried = False

_ERRORS = {
    1: "invalid Huffman code",
    2: "truncated scan",
    3: "AC run past block end",
    4: "expected restart marker",
}


def _load() -> "ctypes.CDLL | None":
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("DARC_SPARK_NO_NATIVE"):
        return None
    try:
        d = tempfile.mkdtemp(prefix="darc_jpeg_native_")
        src = os.path.join(d, "jpeg_scan.c")
        so = os.path.join(d, "jpeg_scan.so")
        with open(src, "w") as f:
            f.write(_C_SRC)
        subprocess.run(
            # -fwrapv: defined wraparound so adversarial DC chains can't
            # hit signed-overflow UB (Python's unbounded ints just grow)
            ["cc", "-O2", "-fwrapv", "-shared", "-fPIC", "-o", so, src],
            check=True,
            capture_output=True,
            timeout=60,
        )
        lib = ctypes.CDLL(so)
        fn = lib.darc_decode_scan
        fn.restype = ctypes.c_int32
        fn.argtypes = [
            ctypes.c_void_p,  # seg_data
            ctypes.c_void_p,  # seg_ends
            ctypes.c_int32,   # n_segs
            ctypes.c_void_p,  # luts
            ctypes.c_void_p,  # comp_v
            ctypes.c_void_p,  # comp_h
            ctypes.c_void_p,  # comp_nbx
            ctypes.c_void_p,  # comp_off
            ctypes.c_int32,   # n_comps
            ctypes.c_int32,   # mcus_y
            ctypes.c_int32,   # mcus_x
            ctypes.c_int32,   # restart_interval
            ctypes.c_void_p,  # out
        ]
        _lib = lib
    except Exception:  # noqa: BLE001 - any failure means "no native path"
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_scan(
    segs: list[np.ndarray],
    luts: np.ndarray,
    comp_v: np.ndarray,
    comp_h: np.ndarray,
    comp_nbx: np.ndarray,
    comp_off: np.ndarray,
    n_coefs: int,
    mcus_y: int,
    mcus_x: int,
    restart_interval: int,
) -> np.ndarray:
    """Run the native scan decode; raises ValueError exactly like the
    Python path on malformed streams. Caller guarantees n_comps ≤ 8."""
    lib = _load()
    assert lib is not None
    seg_data = np.concatenate(segs) if len(segs) > 1 else segs[0]
    seg_data = np.ascontiguousarray(seg_data)
    seg_ends = np.cumsum(
        np.array([s.size for s in segs], dtype=np.int64)
    )
    out = np.zeros(n_coefs, dtype=np.int32)
    rc = lib.darc_decode_scan(
        seg_data.ctypes.data,
        seg_ends.ctypes.data,
        len(segs),
        luts.ctypes.data,
        comp_v.ctypes.data,
        comp_h.ctypes.data,
        comp_nbx.ctypes.data,
        comp_off.ctypes.data,
        len(comp_v),
        mcus_y,
        mcus_x,
        restart_interval,
        out.ctypes.data,
    )
    if rc:
        raise ValueError(_ERRORS.get(rc, f"scan decode error {rc}"))
    return out
