"""Baseline sequential JPEG encoder/decoder in pure numpy + stdlib.

The reference's default tile format is JPEG (quality 85) with the alpha
plane split out (/root/reference/src/processor.rs:496-541, args.rs:51-57).
This sandbox has no JPEG library, so this module implements baseline
JFIF (SOI/DQT/SOF0/DHT/SOS, standard Annex-K Huffman tables, libjpeg
quality->quantization scaling, 4:4:4 — no chroma subsampling) from the
public JPEG spec (ITU T.81). Correctness contract: decode(encode(x))
round-trips through this module (the resume path decodes only our own
output), and decoded pixels are compared, never byte streams
(SURVEY.md §7.5).

DCT + quantization are fully vectorized; the entropy coding loops only
over nonzero coefficients per block.
"""

from __future__ import annotations

import struct

import numpy as np

# --- standard tables (JPEG Annex K) ---------------------------------------

QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], np.int32).reshape(8, 8)

QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], np.int32).reshape(8, 8)

_Z = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])  # zigzag: index i -> raster position

# standard Huffman specs: (bits counts per length 1..16, values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _huff_codes(spec):
    """-> {symbol: (code, length)} built per the canonical procedure."""
    counts, values = spec
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


_C = None


def _dct_matrix():
    global _C
    if _C is None:
        k = np.arange(8)
        _C = np.sqrt(2.0 / 8.0) * np.cos((2 * k[None, :] + 1) * k[:, None]
                                         * np.pi / 16.0)
        _C[0] *= 1.0 / np.sqrt(2.0)
    return _C


def _to_blocks(plane: np.ndarray):
    """(H, W) -> (nby, nbx, 8, 8) with edge replication padding."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = plane.shape
    return (plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3),
            h, w)


def _magnitude(v: int):
    """JPEG magnitude category + offset bits for value v."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _lut(codes_dict, size=256):
    code = np.zeros(size, np.uint64)
    ln = np.zeros(size, np.int64)
    for sym, (c, l) in codes_dict.items():
        code[sym] = c
        ln[sym] = l
    return code, ln


def _bitlen(v: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for |v| < 2^24 (frexp exponent)."""
    return np.frexp(np.abs(v).astype(np.float64))[1].astype(np.int64)


_LUT_CACHE: dict = {}


def _luts(ncomp):
    """Huffman LUT pairs per component, built once per process (they
    are pure functions of the standard Annex-K specs)."""
    if ncomp not in _LUT_CACHE:
        luts = [(_lut(_huff_codes(DC_LUM), 12), _lut(_huff_codes(AC_LUM)))]
        if ncomp > 1:
            luts += [(_lut(_huff_codes(DC_CHROM), 12),
                      _lut(_huff_codes(AC_CHROM)))] * (ncomp - 1)
        _LUT_CACHE[ncomp] = luts
    return _LUT_CACHE[ncomp]


def _entropy_symbols(coef_sets, dc_diffs, ncomp, return_sizes=False):
    """Fully vectorized Huffman symbol stream with NO sort: every
    symbol's position in the interleaved (mcu, comp, seq) stream is a
    closed-form function of the per-block nonzero structure, so symbols
    scatter-write straight into their final slots.

    Per (block, comp) group the stream is: DC category code, DC offset
    bits, then per nonzero AC coefficient j its ZRL run symbols
    followed by the (run, size) code and offset bits, then EOB unless
    the last nonzero is coefficient 63. A group's size is therefore
    2 + total_zrl + 2*nnz + need_eob, and a symbol's rank inside its
    group is 2 + 2*j + zrls_before_j (+ own ZRLs for the code/bits).
    This replaces an earlier sort-based interleave whose cost was
    dominated by a multi-key sort once megatile batches pushed the
    symbol stream out of cache.

    Returns (codes uint64, lens int64) ready for _pack_bits; with
    return_sizes also the per-(block,comp-major) group sizes, from
    which the batch encoder derives per-image stream boundaries."""
    luts = _luts(ncomp)
    n = coef_sets[0].shape[0]
    sizes = np.empty((n, ncomp), np.int64)
    per = []                                   # analysis per component
    for ci in range(ncomp):
        blk = coef_sets[ci]
        rows, cols = np.nonzero(blk[:, 1:])
        if len(rows):
            vals = blk[rows, cols + 1].astype(np.int64)
            first = np.empty(len(rows), bool)
            first[0] = True
            first[1:] = rows[1:] != rows[:-1]
            prevc = np.empty_like(cols)
            prevc[0] = 0
            prevc[1:] = cols[:-1]
            run = np.where(first, cols, cols - prevc - 1).astype(np.int64)
            nzrl = run >> 4
            seg_first = np.flatnonzero(first)
            counts = np.diff(np.r_[seg_first, len(rows)])
            nz_idx = np.arange(len(rows), dtype=np.int64)
            j = nz_idx - np.repeat(seg_first, counts)
            czp = np.cumsum(nzrl) - nzrl       # exclusive global cumsum
            czrl = czp - np.repeat(czp[seg_first], counts)  # per block
            # last nonzero at coefficient 63 (col 62 of blk[:, 1:]) -> no EOB
            last = np.zeros(n, np.int64) - 1
            last[rows] = cols                  # rows ascending: max wins
            need = last != 62
            nnzb = np.bincount(rows, minlength=n)
            zrlb = np.bincount(rows, weights=nzrl,
                               minlength=n).astype(np.int64)
            sizes[:, ci] = 2 + zrlb + 2 * nnzb + need
            per.append((rows, vals, run, nzrl, j, czrl, need))
        else:
            sizes[:, ci] = 3                   # DC code + bits + EOB
            per.append(None)

    starts = np.zeros(n * ncomp, np.int64)
    np.cumsum(sizes.reshape(-1)[:-1], out=starts[1:])
    total = int(starts[-1] + sizes.reshape(-1)[-1])
    out_codes = np.empty(total, np.uint64)
    out_lens = np.empty(total, np.int64)
    gstarts = starts.reshape(n, ncomp)

    for ci in range(ncomp):
        (dc_code, dc_len), (ac_code, ac_len) = luts[ci]
        g = gstarts[:, ci]
        d = dc_diffs[ci]
        dsize = _bitlen(d)
        dbits = np.where(d >= 0, d, d + (np.int64(1) << dsize) - 1)
        out_codes[g] = dc_code[dsize]
        out_lens[g] = dc_len[dsize]
        out_codes[g + 1] = dbits.astype(np.uint64)
        out_lens[g + 1] = dsize
        if per[ci] is None:
            out_codes[g + 2] = ac_code[0x00]
            out_lens[g + 2] = ac_len[0x00]
            continue
        rows, vals, run, nzrl, j, czrl, need = per[ci]
        gb = g[rows]
        zrl_start = gb + 2 + 2 * j + czrl      # first ZRL slot of nonzero j
        if nzrl.any():
            pos = np.repeat(zrl_start, nzrl) \
                + np.arange(int(nzrl.sum()), dtype=np.int64) \
                - np.repeat(np.cumsum(nzrl) - nzrl, nzrl)
            out_codes[pos] = ac_code[0xF0]
            out_lens[pos] = ac_len[0xF0]
        asize = _bitlen(vals)
        abits = np.where(vals >= 0, vals,
                         vals + (np.int64(1) << asize) - 1)
        sym = ((run & 15) << 4) | asize
        cpos = zrl_start + nzrl
        out_codes[cpos] = ac_code[sym]
        out_lens[cpos] = ac_len[sym]
        out_codes[cpos + 1] = abits.astype(np.uint64)
        out_lens[cpos + 1] = asize
        eb = np.flatnonzero(need)
        pos = g[eb] + sizes[eb, ci] - 1
        out_codes[pos] = ac_code[0x00]
        out_lens[pos] = ac_len[0x00]

    if return_sizes:
        return out_codes, out_lens, sizes
    return out_codes, out_lens


def _pack_bits(codes, lens) -> bytes:
    """Vectorized bit packing + 0xFF byte stuffing + 1-padding."""
    c = np.asarray(codes, np.uint64)
    ln = np.asarray(lens, np.int64)
    keep = ln > 0
    c, ln = c[keep], ln[keep]
    total = int(ln.sum())
    starts = np.concatenate([[0], np.cumsum(ln)[:-1]])
    rep_c = np.repeat(c, ln)
    rep_l = np.repeat(ln, ln)
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, ln)
    bits = (rep_c >> (rep_l - 1 - within).astype(np.uint64)) & np.uint64(1)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, np.uint64)])
    raw = np.packbits(bits.astype(np.uint8))
    stuffed = np.flatnonzero(raw == 0xFF)
    if len(stuffed):
        out = np.insert(raw, stuffed + 1, 0)
    else:
        out = raw
    return out.tobytes()


def _dqt_payload(tid, tbl):
    return bytes([tid]) + bytes(int(tbl.reshape(-1)[_Z[i]]) for i in range(64))


def _dht_payload(tc_th, spec):
    counts, values = spec
    return bytes([tc_th]) + bytes(counts) + bytes(values)


def _seg(marker, payload):
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _jfif_header(h: int, w: int, gray: bool, qt_l: np.ndarray,
                 qt_c: np.ndarray) -> bytes:
    """SOI..SOS header — a pure function of (h, w, gray, quality), so
    the batch encoder builds it once per batch."""
    out = bytearray(b"\xff\xd8")                              # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, _dqt_payload(0, qt_l))
    if not gray:
        out += _seg(0xFFDB, _dqt_payload(1, qt_c))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])     # 4:4:4
    out += _seg(0xFFC0, sof)
    out += _seg(0xFFC4, _dht_payload(0x00, DC_LUM))
    out += _seg(0xFFC4, _dht_payload(0x10, AC_LUM))
    if not gray:
        out += _seg(0xFFC4, _dht_payload(0x01, DC_CHROM))
        out += _seg(0xFFC4, _dht_payload(0x11, AC_CHROM))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)
    return bytes(out)


def jpeg_encode(img: np.ndarray, quality: int = 85) -> bytes:
    """img: (H, W) grayscale or (H, W, 3) RGB uint8 -> baseline JFIF."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt_l = scaled_qtable(QT_LUM, quality)
    qt_c = scaled_qtable(QT_CHROM, quality)
    C = _dct_matrix()

    if gray:
        planes = [(img.astype(np.float32) - 128.0, qt_l)]
    else:
        r = img[:, :, 0].astype(np.float32)
        g = img[:, :, 1].astype(np.float32)
        b = img[:, :, 2].astype(np.float32)
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b
        planes = [(y, qt_l), (cb, qt_c), (cr, qt_c)]

    coef_sets = []
    for plane, qt in planes:
        blocks, _, _ = _to_blocks(plane)
        B = blocks.reshape(-1, 8, 8).astype(np.float64)
        D = np.matmul(np.matmul(C[None], B), C.T[None])
        Q = np.rint(D / qt[None]).astype(np.int32)
        coef_sets.append(Q.reshape(-1, 64)[:, _Z])

    out = bytearray(_jfif_header(h, w, gray, qt_l, qt_c))
    ncomp = 1 if gray else 3

    # DC differentials vectorized per component (sequential pred = diff)
    dc_diffs = []
    for ci in range(ncomp):
        dc = coef_sets[ci][:, 0].astype(np.int64)
        d = dc.copy()
        d[1:] = dc[1:] - dc[:-1]
        dc_diffs.append(d)
    codes, lens = _entropy_symbols(coef_sets, dc_diffs, ncomp)
    out += _pack_bits(codes, lens)
    out += b"\xff\xd9"                                        # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24 and self.pos < len(self.d):
            byte = self.d[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.d[self.pos] if self.pos < len(self.d) else 0
                if nxt == 0x00:
                    self.pos += 1
                else:          # marker: stop feeding
                    self.pos -= 1
                    break
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:      # pad (end of stream)
            self.acc <<= (n - self.nbits)
            self.nbits = n
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_huff(self, lut) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read(1)
            ln += 1
            if (ln, code) in lut:
                return lut[(ln, code)]
        raise ValueError("bad huffman code")


def _huff_lut(spec):
    return {(ln, code): sym for sym, (code, ln) in _huff_codes(spec).items()}


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF stream produced by jpeg_encode (also reads
    any single-scan baseline 4:4:4 stream with standard-shaped tables).
    -> (H, W) or (H, W, 3) uint8."""
    pos = 0
    qts, hufs, comps = {}, {}, []
    h = w = ncomp = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = struct.unpack(">H", data[pos:pos + 2])[0]
        pos += 2
        if marker in (0xFFD8, 0xFFD9):
            continue
        (ln,) = struct.unpack(">H", data[pos:pos + 2])
        payload = data[pos + 2:pos + ln]
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                tid = payload[p] & 0x0F
                tbl = np.zeros(64, np.int32)
                for i in range(64):
                    tbl[_Z[i]] = payload[p + 1 + i]
                qts[tid] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xFFC0:
            _, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            comps = []
            for ci in range(ncomp):
                cid, samp, qtid = payload[6 + 3 * ci:9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError("only 4:4:4 supported")
                comps.append({"id": cid, "qt": qtid})
        elif marker == 0xFFC4:
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                counts = list(payload[p + 1:p + 17])
                nvals = sum(counts)
                values = list(payload[p + 17:p + 17 + nvals])
                hufs[tc_th] = _huff_lut((counts, values))
                p += 17 + nvals
        elif marker == 0xFFDA:
            ns = payload[0]
            scan = []
            for ci in range(ns):
                cid, tt = payload[1 + 2 * ci:3 + 2 * ci]
                scan.append({"id": cid, "dc": tt >> 4, "ac": tt & 0x0F})
            pos += ln
            break
        pos += ln

    br = _BitReader(data[pos:])
    C = _dct_matrix()
    nbx, nby = (w + 7) // 8, (h + 7) // 8
    planes = [np.zeros((nby * 8, nbx * 8), np.float32) for _ in range(ncomp)]
    preds = [0] * ncomp
    for m in range(nbx * nby):
        by, bx = divmod(m, nbx)
        for ci in range(ncomp):
            dc_lut = hufs[0x00 | scan[ci]["dc"]]
            ac_lut = hufs[0x10 | scan[ci]["ac"]]
            blk = np.zeros(64, np.int32)
            size = br.read_huff(dc_lut)
            preds[ci] += _extend(br.read(size), size)
            blk[0] = preds[ci]
            k = 1
            while k < 64:
                rs = br.read_huff(ac_lut)
                if rs == 0x00:
                    break
                if rs == 0xF0:
                    k += 16
                    continue
                k += rs >> 4
                size = rs & 0x0F
                blk[k] = _extend(br.read(size), size)
                k += 1
            raster = np.zeros(64, np.int32)
            raster[_Z] = blk
            dq = raster.reshape(8, 8) * qts[comps[ci]["qt"]]
            pix = C.T @ dq.astype(np.float32) @ C
            planes[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = pix

    planes = [p[:h, :w] + (128.0 if i == 0 else 0.0)
              for i, p in enumerate(planes)]
    if ncomp == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
