"""Baseline JPEG (ITU-T T.81) grayscale codec in pure numpy — no image
library. Closes the JPEG half of the "pixel-level features are stubbed"
gap the same way the PNG path did (multimodal.decode_png_pixels): the
container has no codecs, so the repo carries its own spec-conformant
implementation of the public byte format.

Scope: baseline DCT (SOF0), 8-bit precision, DRI/RSTn restart
intervals (encode + decode, baseline gray and color), five profiles:
single-component grayscale (encode_jpeg_gray/decode_jpeg_gray) and
3-component YCbCr color at 4:4:4 (encode_jpeg_color), 4:2:0 — the
camera/web layout, 16x16 MCUs of four Y blocks + box-averaged Cb/Cr
(encode_jpeg_420) — 4:2:2 — the broadcast/video layout, 16x8 MCUs
of two Y blocks + horizontally box-averaged Cb/Cr (encode_jpeg_422) —
and 4:1:1 — the DV/camcorder layout, 32x8 MCUs (encode_jpeg_411).
decode_jpeg_color handles all four color layouts with ONE
sampling-factor-general MCU walk (T.81 A.2.3 interleave, replicate
upsample). PROGRESSIVE (SOF2) is supported in FULL: both profiles —
spectral selection AND successive approximation (Ah/Al != 0, T.81
G.1.2.2/G.1.2.3, libjpeg's standard scan scripts incl. AC
correction-bit refinement) — for grayscale AND multi-component color
at every baseline sampling layout (4:4:4/4:2:0/4:2:2/4:1:1:
interleaved DC scans with A.2.4 dummy blocks at MCU edges,
single-component AC scans over each component's own raster grid per
B.2.3). Progressive reorganizes the same quantized coefficients, so
its decode equals the baseline round trip EXACTLY (pinned in pytest
and by the shared driver oracles). Out of scope (rejected cleanly,
never misdecoded): arithmetic coding, 12-bit precision, lossless and
hierarchical modes, progressive restart intervals.

Conformance evidence without a reference codec in the container:
- encoder and decoder are independent directions of the spec sharing
  only constant tables — the decoder parses DQT/SOF0/DHT from the FILE
  (canonical Huffman reconstruction per F.2.2.3), never from the
  encoder's in-memory tables, so a table-emission bug breaks round-trip;
- the zigzag order is GENERATED from the anti-diagonal walk rather than
  transcribed (transcription errors impossible);
- round-trip error is bounded by quantization analytically: a constant
  block is DC-only and reconstructs EXACTLY (pinned in pytest), and
  smooth gradients reconstruct within the quant-table bound;
- bit-stuffing (0xFF -> 0xFF 0x00) and byte padding (1-fill) follow
  B.1.1.5/F.1.2.3 and are exercised by fixtures whose entropy stream
  contains 0xFF bytes.

Reference parity note: CLD2 itself has no media path; this module exists
for the training-pipeline multimodal mandate (SURVEY.md §2.13).
"""

from __future__ import annotations

import re
import struct
from functools import lru_cache

import numpy as np

# Annex K Table K.1 — luminance quantization (quality 50)
QTABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int64)

# Annex K Tables K.3/K.5 — luminance DC/AC Huffman (BITS, HUFFVAL)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _zigzag_order() -> np.ndarray:
    """The T.81 Figure A.6 zigzag scan, generated from the anti-diagonal
    walk (even diagonals ascend, odd descend) instead of transcribed."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        order += [r * 8 + c for r, c in diag]
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: FDCT = D @ B @ D.T, IDCT = D.T @ C @ D."""
    k, n = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    d = np.cos((2 * n + 1) * k * np.pi / 16) * 0.5
    d[0, :] = 1 / np.sqrt(8)
    return d


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical assignment (C.2)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:           # B.1.1.5 byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # 1-fill padding (F.1.2.3)
        return bytes(self.buf)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


_RST_SPLIT = re.compile(b"\xff[\xd0-\xd7]")


def _split_restart_segments(scan: bytes, ri: int, n_mcus: int
                            ) -> list[bytes] | None:
    """Split entropy data at RSTn markers (B.2.1.2). Unambiguous: a real
    0xFF inside entropy data is always stuffed to FF00, so FF D0-D7 can
    only be a restart marker. Returns None when the segment count does
    not match ceil(n_mcus / ri) — a malformed stream, not a profile gap.
    """
    segs = _RST_SPLIT.split(scan)
    if ri <= 0:
        return [scan]
    if len(segs) != -(-n_mcus // ri):
        return None
    return segs


def encode_jpeg_gray(pixels: np.ndarray,
                     restart_interval: int = 0) -> bytes:
    """Baseline grayscale JPEG of a uint8 (h, w) array: edge-replication
    pad to 8x8 multiples, level shift, FDCT, Annex-K quantization,
    zigzag, DC differencing, canonical Huffman entropy coding.
    `restart_interval` > 0 emits a DRI segment and byte-aligned RSTn
    markers every that many MCUs (DC predictor reset, marker id cycling
    D0-D7 per B.2.1.2)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(px, ((0, ph - h), (0, pw - w)), mode="edge")
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    pieces: list[bytes] = []
    n_done = 0
    blocks = (padded.astype(np.float64) - 128.0).reshape(
        ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and n_done and \
                    n_done % restart_interval == 0:
                pieces.append(bw.flush())
                pieces.append(bytes([0xFF, 0xD0 +
                                     (n_done // restart_interval - 1) % 8]))
                bw = _BitWriter()
                prev_dc = 0
            n_done += 1
            coef = _DCT @ blocks[by, bx] @ _DCT.T
            q = np.round(coef / QTABLE).astype(np.int64)
            zz = q.reshape(64)[ZIGZAG]
            # DC: category + amplitude bits
            diff = int(zz[0] - prev_dc)
            prev_dc = int(zz[0])
            s = _csize(diff)
            c, ln = dc_codes[s]
            bw.write(c, ln)
            if s:
                amp = diff if diff > 0 else diff + (1 << s) - 1
                bw.write(amp, s)
            # AC: run/size with ZRL and EOB
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for i in range(1, 64):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]     # ZRL
                    bw.write(c, ln)
                    run -= 16
                s = _csize(v)
                c, ln = ac_codes[(run << 4) | s]
                bw.write(c, ln)
                amp = v if v > 0 else v + (1 << s) - 1
                bw.write(amp, s)
                run = 0
                if i == last_nz:
                    break
            if last_nz < 63:
                c, ln = ac_codes[0x00]         # EOB
                bw.write(c, ln)
    pieces.append(bw.flush())
    scan = b"".join(pieces)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qz = QTABLE.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    dqt = seg(0xFFDB, b"\x00" + qz)
    dri = (seg(0xFFDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht = (seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
           + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)))
    sos = seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    return b"\xff\xd8" + dqt + dri + sof + dht + sos + scan + b"\xff\xd9"


class _BitReader:
    def __init__(self, data: bytes) -> None:
        # un-stuff FF00 -> FF once, up front
        self.data = data.replace(b"\xff\x00", b"\xff")
        self.pos = 0    # bit position
        self.nbits = 8 * len(self.data)
        # 4 zero pad bytes so the inlined 40-bit window read in
        # _decode_block_zz never slices short near end-of-stream (the
        # nbits check still rejects actual over-reads)
        self.pdata = self.data + b"\x00\x00\x00\x00"

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def peek16(self) -> int:
        """The next 16 bits (zero-padded past end-of-data) WITHOUT
        consuming them — the Huffman LUT key. A valid final symbol may be
        shorter than 16 bits; _read_symbol checks the consumed length
        against nbits so zero-padding can never fabricate data."""
        bp = self.pos >> 3
        chunk = self.data[bp:bp + 4]
        if len(chunk) < 4:
            chunk = chunk + b"\x00" * (4 - len(chunk))
        v = int.from_bytes(chunk, "big")
        return (v >> (16 - (self.pos & 7))) & 0xFFFF

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("bit stream exhausted")
        bp = self.pos >> 3
        off = self.pos & 7
        need = (off + n + 7) >> 3
        v = int.from_bytes(self.data[bp:bp + need], "big")
        self.pos += n
        return (v >> (8 * need - off - n)) & ((1 << n) - 1)


class _HuffTable:
    """Canonical Huffman table with a 16-bit-peek decode LUT: one lookup
    replaces the per-bit tree walk (codes are <=16 bits, T.81 F.2.2.3).
    The LUTs are `bytes` (not ndarrays): CPython indexes bytes to a plain
    int with no numpy-scalar boxing, ~3x faster in the hot loop. `map`
    keeps the {(length, code): symbol} form for tests/debugging."""

    __slots__ = ("map", "lut_sym", "lut_len")

    def __init__(self, table: dict[tuple[int, int], int]) -> None:
        self.map = table
        sym = np.zeros(1 << 16, dtype=np.uint8)
        ln_arr = np.zeros(1 << 16, dtype=np.uint8)
        for (ln, code), s in table.items():
            start = code << (16 - ln)
            span = 1 << (16 - ln)
            sym[start:start + span] = s
            ln_arr[start:start + span] = ln
        self.lut_sym = sym.tobytes()
        self.lut_len = ln_arr.tobytes()


@lru_cache(maxsize=256)
def _huff_table_cached(defn: bytes) -> _HuffTable:
    """LUT construction is ~100x the cost of decoding one small image's
    blocks, and real corpora reuse a handful of tables (our encoder's,
    Annex K's, libjpeg's defaults) across millions of files — so tables
    are memoized by their exact DHT definition bytes (bits + vals)."""
    bits = list(defn[:16])
    nvals = sum(bits)
    vals = list(defn[16:16 + nvals])
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return _HuffTable(table)


def _decode_huff_tables(payload: bytes) -> dict[int, _HuffTable]:
    """DHT payload -> {table_class<<4|id: _HuffTable} (canonical
    reconstruction, F.2.2.3). One DHT segment may carry multiple tables
    back to back."""
    out = {}
    i = 0
    while i < len(payload):
        tc_id = payload[i]
        nvals = sum(payload[i + 1:i + 17])
        out[tc_id] = _huff_table_cached(payload[i + 1:i + 17 + nvals])
        i += 17 + nvals
    return out


def _read_symbol(br: _BitReader, table: _HuffTable) -> int:
    idx = br.peek16()
    ln = table.lut_len[idx]
    if ln == 0 or br.pos + ln > br.nbits:
        raise ValueError("invalid Huffman code")
    br.pos += ln
    return table.lut_sym[idx]


def _decode_block_zz(br: _BitReader, dc_t: _HuffTable, ac_t: _HuffTable,
                     prev_dc: int, Z: np.ndarray, row: int) -> int:
    """Entropy-decode ONE block's zigzag coefficients into Z[row]
    (T.81 F.2.2: DC diff then run-length AC), returning the new DC
    predictor. This is the bit-serial floor of JPEG decode, so the loop
    is hand-inlined: each symbol reads a single 40-bit window that covers
    the <=16-bit Huffman code AND its <=11-bit value bits (off<=7 +
    16 + 11 = 34 < 40), one int.from_bytes per coefficient."""
    data = br.pdata
    pos = br.pos
    nbits = br.nbits
    dlen = dc_t.lut_len
    dsym = dc_t.lut_sym
    alen = ac_t.lut_len
    asym = ac_t.lut_sym
    # DC
    bp = pos >> 3
    off = pos & 7
    v = int.from_bytes(data[bp:bp + 5], "big")
    idx = (v >> (24 - off)) & 0xFFFF
    ln = dlen[idx]
    if ln == 0 or pos + ln > nbits:
        raise ValueError("invalid Huffman code")
    s = dsym[idx]
    pos += ln
    if s:
        if pos + s > nbits:
            raise ValueError("bit stream exhausted")
        val = (v >> (40 - off - ln - s)) & ((1 << s) - 1)
        pos += s
        if val < (1 << (s - 1)):
            val += 1 - (1 << s)
        prev_dc += val
    Z[row, 0] = prev_dc
    k = 1
    while k < 64:
        bp = pos >> 3
        off = pos & 7
        v = int.from_bytes(data[bp:bp + 5], "big")
        idx = (v >> (24 - off)) & 0xFFFF
        ln = alen[idx]
        if ln == 0 or pos + ln > nbits:
            raise ValueError("invalid Huffman code")
        rs = asym[idx]
        pos += ln
        if rs == 0:            # EOB
            break
        if rs == 0xF0:         # ZRL
            k += 16
            continue
        k += rs >> 4
        s = rs & 0x0F
        if k > 63:
            raise ValueError("AC index overrun")
        if s:  # s==0 outside EOB/ZRL: malformed, but decode as 0 like
               # the reference loop did (read_bits(0) -> _extend -> 0)
            if pos + s > nbits:
                raise ValueError("bit stream exhausted")
            val = (v >> (40 - off - ln - s)) & ((1 << s) - 1)
            pos += s
            if val < (1 << (s - 1)):
                val += 1 - (1 << s)
            Z[row, k] = val
        k += 1
    br.pos = pos
    return prev_dc


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg_gray(buf: bytes) -> np.ndarray | None:
    """Decode a baseline single-component JPEG produced by any conformant
    encoder (not just encode_jpeg_gray): marker walk, DQT/SOF0/DHT from
    the file, Huffman entropy decode, dequantize, dezigzag, IDCT.
    Returns a uint8 (h, w) array, or None for anything unparseable or
    outside the supported profile (progressive and color go to their
    own decoders). DRI/RSTn restart intervals are decoded (predictor
    reset + byte-aligned segment per E.2.4).
    """
    try:
        if len(buf) < 4 or buf[:2] != b"\xff\xd8":
            return None
        qts: dict[int, np.ndarray] = {}
        dims = None
        comp_q = 0
        td = ta = 0
        ri = 0
        huff: dict[int, dict[tuple[int, int], int]] = {}
        i = 2
        scan = None
        while i + 4 <= len(buf):
            if buf[i] != 0xFF:
                return None
            marker = (buf[i] << 8) | buf[i + 1]
            if marker == 0xFFD9:
                break
            (ln,) = struct.unpack_from(">H", buf, i + 2)
            payload = buf[i + 4:i + 2 + ln]
            if marker == 0xFFDB:
                j = 0
                while j < len(payload):
                    if payload[j] & 0xF0:
                        return None    # 16-bit table: out of profile
                    t = np.zeros(64, dtype=np.int64)
                    t[ZIGZAG] = np.frombuffer(
                        payload[j + 1:j + 65], dtype=np.uint8)
                    qts[payload[j] & 0x0F] = t.reshape(8, 8)
                    j += 65
            elif marker == 0xFFC0:
                prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
                if prec != 8 or nc != 1:
                    return None        # color / high precision: stubbed
                comp_q = payload[8]    # the component's Tq selector
                dims = (h, w)
            elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
                return None            # extended/progressive/lossless
            elif marker == 0xFFC4:
                huff.update(_decode_huff_tables(payload))
            elif marker == 0xFFDD:
                (ri,) = struct.unpack_from(">H", payload, 0)
            elif marker == 0xFFDA:
                if payload[0] != 1:    # Ns: single-component scan only
                    return None
                td, ta = payload[2] >> 4, payload[2] & 0x0F
                scan = buf[i + 2 + ln:]
                break
            i += 2 + ln
        if scan is None or dims is None or comp_q not in qts \
                or td not in huff or (0x10 | ta) not in huff:
            return None
        qt = qts[comp_q]
        h, w = dims
        if h == 0 or w == 0:
            return None
        end = scan.rfind(b"\xff\xd9")
        if end >= 0:
            scan = scan[:end]
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        nby, nbx = ph // 8, pw // 8
        segs = _split_restart_segments(scan, ri, nby * nbx)
        if segs is None:
            return None
        # entropy pass fills one (n_blocks, 64) zigzag matrix; dezigzag,
        # dequantize and IDCT then run BATCHED over all blocks at once
        Z = np.zeros((nby * nbx, 64), dtype=np.int64)
        dc_t, ac_t = huff[td], huff[0x10 | ta]
        br = _BitReader(segs[0])
        prev_dc = 0
        for row in range(nby * nbx):
            if ri and row and row % ri == 0:   # restart boundary (E.2.4)
                br = _BitReader(segs[row // ri])
                prev_dc = 0
            prev_dc = _decode_block_zz(br, dc_t, ac_t, prev_dc, Z, row)
        blocks = _idct_blocks(Z, qt)
        out = (blocks.reshape(nby, nbx, 8, 8)
               .transpose(0, 2, 1, 3).reshape(ph, pw))
        return np.clip(np.round(out + 128.0), 0, 255).astype(
            np.uint8)[:h, :w]
    except (IndexError, ValueError, struct.error):
        return None


def _idct_blocks(Z: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Dezigzag + dequantize + 2-D IDCT for a whole (n, 64) zigzag
    matrix in three vectorized ops (one fancy index, one broadcast
    multiply, two batched 8x8 matmuls) instead of per-block numpy calls."""
    dense = np.zeros_like(Z)
    dense[:, ZIGZAG] = Z
    coefs = dense.reshape(-1, 8, 8) * qt
    return _DCT.T @ coefs @ _DCT


def gray_fixture_pixels(media_id: int) -> np.ndarray:
    """Deterministic grayscale test image for media_id: a diagonal ramp
    with id-dependent slope/phase (smooth -> small quantization error,
    non-trivial AC coefficients). Dims exercise non-multiple-of-8 crops."""
    h = 8 * (2 + media_id % 3) + media_id % 5
    w = 8 * (2 + media_id % 4) + media_id % 7
    a = 1 + media_id % 5
    b = 1 + media_id % 3
    y, x = np.mgrid[0:h, 0:w]
    # triangle wave: continuous (no 255->0 wrap edges), so quantized-DCT
    # ringing stays small and the round-trip error bound is meaningful
    return np.abs(((a * x + b * y + media_id) % 510) - 255).astype(np.uint8)


def jpeg_gray_features(px: np.ndarray) -> tuple[int, ...]:
    """Integer-exact features of a decoded grayscale image: dims, sum,
    sum of squares, min, max, 4-bin histogram."""
    v = px.astype(np.int64)
    hist = np.bincount(v.reshape(-1) >> 6, minlength=4)
    return (px.shape[1], px.shape[0], int(v.sum()), int((v * v).sum()),
            int(v.min()), int(v.max()),
            int(hist[0]), int(hist[1]), int(hist[2]), int(hist[3]))


def jpeg_feature_extract(df, id_col: str = "media_id",
                         payload_col: str = "payload"):
    """mapInPandas: decode baseline grayscale JPEG payloads and emit the
    integer-exact feature row per decodable payload (others dropped).
    Per-row Python is inherent here — entropy decoding is bit-serial by
    design (each Huffman symbol's position depends on all previous ones);
    the production scale-out is rows-across-executors, not SIMD."""
    import pandas as pd

    schema = ("media_id long, width long, height long, px_sum long, "
              "px_sumsq long, px_min long, px_max long, "
              "h0 long, h1 long, h2 long, h3 long")

    def fn(batches):
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                px = decode_jpeg_gray(bytes(buf)) if buf is not None else None
                if px is None:
                    continue
                rows.append((int(mid),) + jpeg_gray_features(px))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "px_sum", "px_sumsq",
                "px_min", "px_max", "h0", "h1", "h2", "h3"])

    return df.mapInPandas(fn, schema)


# ------------------------------------------------------------- color ----

# Annex K Table K.2 — chrominance quantization
QTABLE_C = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int64)

# Annex K Tables K.4/K.6 — chrominance DC/AC Huffman
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range RGB -> YCbCr (float64, unclipped)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """JFIF YCbCr -> RGB uint8 (clipped)."""
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


def _encode_block(bw: _BitWriter, block: np.ndarray, qt: np.ndarray,
                  prev_dc: int, dc_codes, ac_codes) -> int:
    coef = _DCT @ block @ _DCT.T
    q = np.round(coef / qt).astype(np.int64)
    zz = q.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - prev_dc
    s = _csize(diff)
    c, ln = dc_codes[s]
    bw.write(c, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        s = _csize(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.write(c, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
        if i == last_nz:
            break
    if last_nz < 63:
        c, ln = ac_codes[0x00]
        bw.write(c, ln)
    return int(zz[0])


def encode_jpeg_color(rgb: np.ndarray, restart_interval: int = 0) -> bytes:
    """Baseline color JPEG at 4:4:4 (no chroma subsampling): RGB ->
    YCbCr, interleaved Y/Cb/Cr MCUs of one 8x8 block each, luminance
    tables for Y and chrominance tables for Cb/Cr (quant table ids 0/1,
    Huffman table ids 0/1 per class) — the T.81 A.2.3 interleave order.
    `restart_interval` > 0 emits DRI + RSTn every that many MCUs, all
    three DC predictors reset at each marker."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    ycc = rgb_to_ycbcr(np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)),
                              mode="edge")) - 128.0
    dc_l = _canonical_codes(DC_BITS, DC_VALS)
    ac_l = _canonical_codes(AC_BITS, AC_VALS)
    dc_c = _canonical_codes(DC_BITS_C, DC_VALS_C)
    ac_c = _canonical_codes(AC_BITS_C, AC_VALS_C)
    bw = _BitWriter()
    prev = [0, 0, 0]
    pieces: list[bytes] = []
    n_done = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and n_done and \
                    n_done % restart_interval == 0:
                pieces.append(bw.flush())
                pieces.append(bytes([0xFF, 0xD0 +
                                     (n_done // restart_interval - 1) % 8]))
                bw = _BitWriter()
                prev = [0, 0, 0]
            n_done += 1
            tile = ycc[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            for comp, (qt, dc, ac) in enumerate(
                    [(QTABLE, dc_l, ac_l), (QTABLE_C, dc_c, ac_c),
                     (QTABLE_C, dc_c, ac_c)]):
                prev[comp] = _encode_block(
                    bw, tile[:, :, comp], qt, prev[comp], dc, ac)
    pieces.append(bw.flush())
    scan = b"".join(pieces)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qzl = QTABLE.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    qzc = QTABLE_C.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    dqt = seg(0xFFDB, b"\x00" + qzl) + seg(0xFFDB, b"\x01" + qzc)
    if restart_interval:
        dqt += seg(0xFFDD, struct.pack(">H", restart_interval))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
              + b"\x01\x11\x00" + b"\x02\x11\x01" + b"\x03\x11\x01")
    dht = (seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
           + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
           + seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
           + seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C)))
    sos = seg(0xFFDA, b"\x03" + b"\x01\x00" + b"\x02\x11" + b"\x03\x11"
              + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"



def decode_jpeg_color(buf: bytes) -> np.ndarray | None:
    """Decode a baseline 4:4:4 color JPEG (3 components, all sampling
    factors 1x1): returns uint8 (h, w, 3) RGB, or None for anything
    unparseable / out of profile (grayscale goes to decode_jpeg_gray;
    subsampled 4:2:0/4:2:2 streams are rejected, not misdecoded)."""
    import struct as _struct

    try:
        if len(buf) < 4 or buf[:2] != b"\xff\xd8":
            return None
        qts: dict[int, np.ndarray] = {}
        huff: dict[int, dict[tuple[int, int], int]] = {}
        dims = None
        comp_q: list[int] = []
        scan = None
        ri = 0
        comp_huff: list[tuple[int, int]] = []
        i = 2
        while i + 4 <= len(buf):
            if buf[i] != 0xFF:
                return None
            marker = (buf[i] << 8) | buf[i + 1]
            if marker == 0xFFD9:
                break
            (ln,) = _struct.unpack_from(">H", buf, i + 2)
            payload = buf[i + 4:i + 2 + ln]
            if marker == 0xFFDB:
                j = 0
                while j < len(payload):
                    if payload[j] & 0xF0:
                        return None
                    t = np.zeros(64, dtype=np.int64)
                    t[ZIGZAG] = np.frombuffer(
                        payload[j + 1:j + 65], dtype=np.uint8)
                    qts[payload[j] & 0x0F] = t.reshape(8, 8)
                    j += 65
            elif marker == 0xFFC0:
                prec, h, w, nc = _struct.unpack_from(">BHHB", payload, 0)
                if prec != 8 or nc != 3:
                    return None
                samps = []
                for c in range(3):
                    samp = payload[6 + 3 * c + 1]
                    samps.append((samp >> 4, samp & 0x0F))
                    comp_q.append(payload[6 + 3 * c + 2])
                # supported layouts: 4:4:4 (all 1x1), 4:2:0 (Y 2x2),
                # 4:2:2 (Y 2x1) and 4:1:1 (Y 4x1), chroma 1x1; anything
                # else is out of profile (the MCU walk below is sampling-
                # factor-general: a layout is a whitelist entry + fixtures)
                if samps not in ([(1, 1)] * 3,
                                 [(2, 2), (1, 1), (1, 1)],
                                 [(2, 1), (1, 1), (1, 1)],
                                 [(4, 1), (1, 1), (1, 1)]):
                    return None
                dims = (h, w)
            elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
                return None
            elif marker == 0xFFC4:
                huff.update(_decode_huff_tables(payload))
            elif marker == 0xFFDD:
                (ri,) = _struct.unpack_from(">H", payload, 0)
            elif marker == 0xFFDA:
                ns = payload[0]
                if ns != 3:
                    return None
                for c in range(3):
                    td_ta = payload[2 + 2 * c]
                    comp_huff.append((td_ta >> 4, td_ta & 0x0F))
                scan = buf[i + 2 + ln:]
                break
            i += 2 + ln
        if scan is None or dims is None or len(comp_q) != 3:
            return None
        h, w = dims
        if h == 0 or w == 0:
            return None
        end = scan.rfind(b"\xff\xd9")
        if end >= 0:
            scan = scan[:end]
        hmax = max(s[0] for s in samps)
        vmax = max(s[1] for s in samps)
        mcu_w, mcu_h = 8 * hmax, 8 * vmax
        ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
        H, W = ph // mcu_h, pw // mcu_w
        n_mcu = H * W
        segs = _split_restart_segments(scan, ri, n_mcu)
        if segs is None:
            return None
        br = _BitReader(segs[0])
        # entropy pass fills one (n_blocks, 64) zigzag matrix per
        # component; dezigzag/dequant/IDCT run BATCHED per component
        # (_idct_blocks), and the MCU-interleaved block order maps onto
        # the plane with a pure reshape/transpose — no per-block scatter
        Zs = [np.zeros((n_mcu * hc * vc, 64), dtype=np.int64)
              for hc, vc in samps]
        prev = [0, 0, 0]
        rows = [0, 0, 0]
        tabs = [(huff[td], huff[0x10 | ta]) for td, ta in comp_huff]
        bpm = [hc * vc for hc, vc in samps]
        for m in range(n_mcu):
            if ri and m and m % ri == 0:       # restart boundary (E.2.4)
                br = _BitReader(segs[m // ri])
                prev = [0, 0, 0]
            # T.81 A.2.3 interleave: per component, vc x hc blocks
            for c in range(3):
                dc_t, ac_t = tabs[c]
                Z = Zs[c]
                r = rows[c]
                p = prev[c]
                for _ in range(bpm[c]):
                    p = _decode_block_zz(br, dc_t, ac_t, p, Z, r)
                    r += 1
                prev[c] = p
                rows[c] = r
        planes = []
        for c, (hc, vc) in enumerate(samps):
            blocks = _idct_blocks(Zs[c], qts[comp_q[c]])
            # block index = ((my*W + mx)*vc + byy)*hc + bxx; plane row
            # my*vc + byy, col mx*hc + bxx -> one transpose
            planes.append(blocks.reshape(H, W, vc, hc, 8, 8)
                          .transpose(0, 2, 4, 1, 3, 5)
                          .reshape(H * vc * 8, W * hc * 8))
        out = np.zeros((ph, pw, 3), dtype=np.float64)
        for c, (hc, vc) in enumerate(samps):
            p = planes[c]
            if hc < hmax:
                p = np.repeat(p, hmax // hc, axis=1)   # replicate upsample
            if vc < vmax:
                p = np.repeat(p, vmax // vc, axis=0)
            out[:, :, c] = p
        return ycbcr_to_rgb(out + 128.0)[:h, :w]
    except (IndexError, KeyError, ValueError, _struct.error):
        return None


def color_fixture_pixels(media_id: int) -> np.ndarray:
    """Deterministic RGB test image: three phase-shifted triangle ramps
    (continuous per channel, so quantized-DCT error stays small)."""
    h = 8 * (2 + media_id % 3) + media_id % 5
    w = 8 * (2 + media_id % 4) + media_id % 7
    y, x = np.mgrid[0:h, 0:w]
    r = np.abs(((x + 2 * y + media_id) % 510) - 255)
    g = np.abs(((2 * x + y + 3 * media_id) % 510) - 255)
    b = np.abs(((x + y + 7 * media_id) % 510) - 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def jpeg_color_features(px: np.ndarray) -> tuple[int, ...]:
    """Integer-exact features of a decoded RGB image: dims + per-channel
    sum/min/max of the decoded uint8 planes."""
    v = px.astype(np.int64)
    out = [px.shape[1], px.shape[0]]
    for c in range(3):
        out += [int(v[..., c].sum()), int(v[..., c].min()),
                int(v[..., c].max())]
    return tuple(out)


def jpeg_color_feature_extract(df, id_col: str = "media_id",
                               payload_col: str = "payload"):
    """mapInPandas: decode color JPEG payloads — baseline (4:4:4/4:2:0/
    4:2:2) with a progressive (SOF2) fallback, the profile sniff a real
    ingest pipeline does — and emit integer-exact per-channel features
    (undecodable rows dropped)."""
    import pandas as pd

    cols = ["media_id", "width", "height",
            "r_sum", "r_min", "r_max", "g_sum", "g_min", "g_max",
            "b_sum", "b_min", "b_max"]
    schema = ", ".join(f"{c} long" for c in cols)

    def fn(batches):
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                px = None
                if buf is not None:
                    b = bytes(buf)
                    px = decode_jpeg_color(b)
                    if px is None:
                        px = decode_jpeg_progressive_color(b)
                if px is None:
                    continue
                rows.append((int(mid),) + jpeg_color_features(px))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(fn, schema)


def encode_jpeg_420(rgb: np.ndarray) -> bytes:
    """Baseline color JPEG with 4:2:0 chroma subsampling — the layout
    virtually every camera/web JPEG uses: 16x16 MCUs of four Y blocks
    (2x2) plus one Cb and one Cr block from 2x2 box-averaged chroma."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    ycc = rgb_to_ycbcr(np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)),
                              mode="edge")) - 128.0
    yp = ycc[:, :, 0]
    # 2x2 box-filter chroma downsample
    sub = [(ycc[0::2, 0::2, c] + ycc[1::2, 0::2, c]
            + ycc[0::2, 1::2, c] + ycc[1::2, 1::2, c]) / 4.0
           for c in (1, 2)]
    dc_l = _canonical_codes(DC_BITS, DC_VALS)
    ac_l = _canonical_codes(AC_BITS, AC_VALS)
    dc_c = _canonical_codes(DC_BITS_C, DC_VALS_C)
    ac_c = _canonical_codes(AC_BITS_C, AC_VALS_C)
    bw = _BitWriter()
    prev = [0, 0, 0]
    for my in range(ph // 16):
        for mx in range(pw // 16):
            for byy in range(2):          # four Y blocks, raster order
                for bxx in range(2):
                    y0, x0 = my * 16 + byy * 8, mx * 16 + bxx * 8
                    prev[0] = _encode_block(
                        bw, yp[y0:y0 + 8, x0:x0 + 8], QTABLE,
                        prev[0], dc_l, ac_l)
            for c in (0, 1):              # one Cb, one Cr block
                y0, x0 = my * 8, mx * 8
                prev[c + 1] = _encode_block(
                    bw, sub[c][y0:y0 + 8, x0:x0 + 8], QTABLE_C,
                    prev[c + 1], dc_c, ac_c)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qzl = QTABLE.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    qzc = QTABLE_C.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    dqt = seg(0xFFDB, b"\x00" + qzl) + seg(0xFFDB, b"\x01" + qzc)
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
              + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01")
    dht = (seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
           + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
           + seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
           + seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C)))
    sos = seg(0xFFDA, b"\x03" + b"\x01\x00" + b"\x02\x11" + b"\x03\x11"
              + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


def encode_jpeg_422(rgb: np.ndarray) -> bytes:
    """Baseline color JPEG with 4:2:2 chroma subsampling (Y 2x1, chroma
    1x1 — the broadcast/video-frame layout): 16x8 MCUs of two Y blocks
    side by side plus one Cb and one Cr block from 2x1 box-averaged
    chroma. Closes the 'rejected cleanly' gap: decode_jpeg_color's
    sampling-factor-general MCU walk handles it once whitelisted."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    ph, pw = -(-h // 8) * 8, -(-w // 16) * 16
    ycc = rgb_to_ycbcr(np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)),
                              mode="edge")) - 128.0
    yp = ycc[:, :, 0]
    # 2x1 box-filter chroma downsample (horizontal only)
    sub = [(ycc[:, 0::2, c] + ycc[:, 1::2, c]) / 2.0 for c in (1, 2)]
    dc_l = _canonical_codes(DC_BITS, DC_VALS)
    ac_l = _canonical_codes(AC_BITS, AC_VALS)
    dc_c = _canonical_codes(DC_BITS_C, DC_VALS_C)
    ac_c = _canonical_codes(AC_BITS_C, AC_VALS_C)
    bw = _BitWriter()
    prev = [0, 0, 0]
    for my in range(ph // 8):
        for mx in range(pw // 16):
            for bxx in range(2):          # two Y blocks, left to right
                y0, x0 = my * 8, mx * 16 + bxx * 8
                prev[0] = _encode_block(
                    bw, yp[y0:y0 + 8, x0:x0 + 8], QTABLE,
                    prev[0], dc_l, ac_l)
            for c in (0, 1):              # one Cb, one Cr block
                y0, x0 = my * 8, mx * 8
                prev[c + 1] = _encode_block(
                    bw, sub[c][y0:y0 + 8, x0:x0 + 8], QTABLE_C,
                    prev[c + 1], dc_c, ac_c)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qzl = QTABLE.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    qzc = QTABLE_C.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    dqt = seg(0xFFDB, b"\x00" + qzl) + seg(0xFFDB, b"\x01" + qzc)
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
              + b"\x01\x21\x00" + b"\x02\x11\x01" + b"\x03\x11\x01")
    dht = (seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
           + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
           + seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
           + seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C)))
    sos = seg(0xFFDA, b"\x03" + b"\x01\x00" + b"\x02\x11" + b"\x03\x11"
              + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


def encode_jpeg_411(rgb: np.ndarray) -> bytes:
    """Baseline color JPEG with 4:1:1 chroma subsampling (Y 4x1, chroma
    1x1 — the DV/camcorder layout): 32x8 MCUs of four Y blocks side by
    side plus one Cb and one Cr block from 4x1 box-averaged chroma.
    The last baseline sampling layout; decode_jpeg_color's sampling-
    factor-general MCU walk handles it once whitelisted."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    ph, pw = -(-h // 8) * 8, -(-w // 32) * 32
    ycc = rgb_to_ycbcr(np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)),
                              mode="edge")) - 128.0
    yp = ycc[:, :, 0]
    # 4x1 box-filter chroma downsample (horizontal only)
    sub = [(ycc[:, 0::4, c] + ycc[:, 1::4, c]
            + ycc[:, 2::4, c] + ycc[:, 3::4, c]) / 4.0 for c in (1, 2)]
    dc_l = _canonical_codes(DC_BITS, DC_VALS)
    ac_l = _canonical_codes(AC_BITS, AC_VALS)
    dc_c = _canonical_codes(DC_BITS_C, DC_VALS_C)
    ac_c = _canonical_codes(AC_BITS_C, AC_VALS_C)
    bw = _BitWriter()
    prev = [0, 0, 0]
    for my in range(ph // 8):
        for mx in range(pw // 32):
            for bxx in range(4):          # four Y blocks, left to right
                y0, x0 = my * 8, mx * 32 + bxx * 8
                prev[0] = _encode_block(
                    bw, yp[y0:y0 + 8, x0:x0 + 8], QTABLE,
                    prev[0], dc_l, ac_l)
            for c in (0, 1):              # one Cb, one Cr block
                y0, x0 = my * 8, mx * 8
                prev[c + 1] = _encode_block(
                    bw, sub[c][y0:y0 + 8, x0:x0 + 8], QTABLE_C,
                    prev[c + 1], dc_c, ac_c)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qzl = QTABLE.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    qzc = QTABLE_C.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    dqt = seg(0xFFDB, b"\x00" + qzl) + seg(0xFFDB, b"\x01" + qzc)
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
              + b"\x01\x41\x00" + b"\x02\x11\x01" + b"\x03\x11\x01")
    dht = (seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
           + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
           + seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
           + seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C)))
    sos = seg(0xFFDA, b"\x03" + b"\x01\x00" + b"\x02\x11" + b"\x03\x11"
              + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


# ---- progressive JPEG (SOF2) ----------------------------------------------
# Progressive scans split the zigzag spectrum across multiple SOS scans
# (T.81 G.1): a DC scan (Ss=Se=0) then AC band scans (Ss..Se), with the
# EOBRUN run-length mechanism coding runs of band-empty blocks.
# Implemented in FULL: spectral selection AND successive approximation
# (point-transformed first scans + one-bit refinement scans with spec
# correction-bit ordering), single-component AND multi-component color
# at every baseline sampling layout (A.2.4 dummy blocks at MCU edges in
# interleaved DC scans; per-component raster grids for AC scans).

PROG_BANDS = ((1, 5), (6, 63))   # AC scans after the DC scan


def encode_jpeg_progressive_gray(pixels: np.ndarray) -> bytes:
    """Spectral-selection progressive grayscale JPEG: SOF2 + three scans
    (DC coefficients; AC 1-5; AC 6-63). Each AC scan codes band-empty
    blocks as single EOBs (EOBRUN=1 — always legal) so the decoder's
    EOBRUN path is exercised without a run accumulator here."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(px, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (padded.astype(np.float64) - 128.0).reshape(
        ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coefs = np.round((_DCT @ blocks @ _DCT.T) / QTABLE).astype(np.int64)
    zz = coefs.reshape(-1, 64)[:, ZIGZAG]   # natural -> zigzag order
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    # scan 1: DC, differential like baseline
    bw = _BitWriter()
    prev = 0
    for b in range(len(zz)):
        diff = int(zz[b, 0]) - prev
        prev = int(zz[b, 0])
        s = _csize(diff)
        c, ln = dc_codes[s]
        bw.write(c, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    scans = [(0, 0, bw.flush())]
    # AC band scans
    for ss, se in PROG_BANDS:
        bw = _BitWriter()
        for b in range(len(zz)):
            band = zz[b, ss:se + 1]
            nz = np.flatnonzero(band)
            if len(nz) == 0:
                c, ln = ac_codes[0x00]      # EOB (EOBRUN=1)
                bw.write(c, ln)
                continue
            run = 0
            for k in range(len(band)):
                v = int(band[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    bw.write(c, ln)
                    run -= 16
                s = _csize(v)
                c, ln = ac_codes[(run << 4) | s]
                bw.write(c, ln)
                bw.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if nz[-1] != len(band) - 1:
                c, ln = ac_codes[0x00]      # EOB for the band tail
                bw.write(c, ln)
        scans.append((ss, se, bw.flush()))

    qzl = QTABLE.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out = b"\xff\xd8" + seg(0xFFDB, b"\x00" + qzl)
    out += seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += (seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
            + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)))
    for ss, se, scan in scans:
        out += seg(0xFFDA, b"\x01\x01" + (b"\x00" if ss == 0 else b"\x10")
                   + struct.pack(">BBB", ss, se, 0))
        out += scan
    return out + b"\xff\xd9"


def _emit_dc_first_scan(bw: _BitWriter, zzs: list, dc_codes_list: list,
                        al: int) -> None:
    """DC first scan at Al (interleaved when len(zzs) > 1, all 1x1):
    arithmetic-shift point transform, per-component differencing."""
    prevs = [0] * len(zzs)
    for b in range(len(zzs[0])):
        for ci, zz in enumerate(zzs):
            v = int(zz[b, 0]) >> al              # arithmetic shift (T.81)
            diff = v - prevs[ci]
            prevs[ci] = v
            s = _csize(diff)
            c, ln = dc_codes_list[ci][s]
            bw.write(c, ln)
            if s:
                bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)


def _emit_dc_refine_scan(bw: _BitWriter, zzs: list, al: int) -> None:
    for b in range(len(zzs[0])):
        for zz in zzs:
            bw.write((int(zz[b, 0]) >> al) & 1, 1)


def _emit_ac_first_scan(bw: _BitWriter, zz: np.ndarray, ac_codes: dict,
                        ss: int, se: int, al: int) -> None:
    """AC first scan at Al: magnitude point transform (truncate toward
    zero), run/size with per-block EOB (EOBRUN=1 — always legal)."""
    for b in range(len(zz)):
        band = zz[b, ss:se + 1]
        t = np.sign(band) * (np.abs(band) >> al)
        nz = np.flatnonzero(t)
        if len(nz) == 0:
            c, ln = ac_codes[0x00]
            bw.write(c, ln)
            continue
        run = 0
        for k in range(int(nz[-1]) + 1):
            v = int(t[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]
                bw.write(c, ln)
                run -= 16
            s = _csize(v)
            c, ln = ac_codes[(run << 4) | s]
            bw.write(c, ln)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if nz[-1] != len(band) - 1:
            c, ln = ac_codes[0x00]
            bw.write(c, ln)


def _emit_ac_refine_scan(bw: _BitWriter, zz: np.ndarray, ac_codes: dict,
                         ss: int, se: int, al: int) -> None:
    """AC refinement (Ah = Al+1), T.81 G.1.2.3 correction-bit order."""
    for b in range(len(zz)):
        band = zz[b, ss:se + 1]
        absv = (np.abs(band) >> al).astype(np.int64)
        ones = np.flatnonzero(absv == 1)
        eob = int(ones[-1]) if len(ones) else -1
        run, pending = 0, []
        for k in range(len(band)):
            t = int(absv[k])
            if t == 0:
                run += 1
                continue
            # ZRL before ANY nonzero (history included), but only
            # while a newly-nonzero still follows (k <= eob) —
            # otherwise the run folds into the EOB
            while run > 15 and k <= eob:
                c, ln = ac_codes[0xF0]
                bw.write(c, ln)
                for bit in pending:
                    bw.write(bit, 1)
                pending = []
                run -= 16
            if t > 1:                    # history: correction bit
                pending.append(t & 1)
                continue
            c, ln = ac_codes[(run << 4) | 1]
            bw.write(c, ln)
            bw.write(1 if band[k] > 0 else 0, 1)
            for bit in pending:
                bw.write(bit, 1)
            pending = []
            run = 0
        if run > 0 or pending:           # EOB (EOBRUN=1) + flush
            c, ln = ac_codes[0x00]
            bw.write(c, ln)
            for bit in pending:
                bw.write(bit, 1)


# libjpeg's standard progressive script for a single-component image
# (jcparam.c jpeg_simple_progression): DC MSBs, coarse AC bands, then
# one AC refinement per bit plane and the DC LSB. This is what
# `cjpeg -progressive` emits for grayscale — the web's progressive
# profile, successive approximation included.
SA_SCRIPT = (
    ("dc", 0, 0, 0, 1),
    ("ac", 1, 5, 0, 2),
    ("ac", 6, 63, 0, 2),
    ("ac", 1, 63, 2, 1),
    ("dc", 0, 0, 1, 0),
    ("ac", 1, 63, 1, 0),
)


def encode_jpeg_progressive_sa_gray(pixels: np.ndarray) -> bytes:
    """Progressive grayscale JPEG with SUCCESSIVE APPROXIMATION (T.81
    G.1.2.2/G.1.2.3), libjpeg's standard 6-scan script (SA_SCRIPT).

    First scans send point-transformed coefficients (DC: arithmetic
    shift; AC: magnitude shift, sign reapplied); refinement scans send
    one bit per already-nonzero coefficient (buffered and flushed after
    the next emitted symbol, exactly the spec's correction-bit order)
    and code newly-nonzero coefficients as size-1 symbols with a raw
    sign bit. Every scan reorganizes the SAME quantized coefficients,
    so the full decode equals the baseline round trip EXACTLY."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(px, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (padded.astype(np.float64) - 128.0).reshape(
        ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coefs = np.round((_DCT @ blocks @ _DCT.T) / QTABLE).astype(np.int64)
    zz = coefs.reshape(-1, 64)[:, ZIGZAG]
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    scans = []
    for kind, ss, se, ah, al in SA_SCRIPT:
        bw = _BitWriter()
        if kind == "dc" and ah == 0:
            _emit_dc_first_scan(bw, [zz], [dc_codes], al)
        elif kind == "dc":
            _emit_dc_refine_scan(bw, [zz], al)
        elif ah == 0:
            _emit_ac_first_scan(bw, zz, ac_codes, ss, se, al)
        else:
            _emit_ac_refine_scan(bw, zz, ac_codes, ss, se, al)
        scans.append((ss, se, ah, al, bw.flush()))

    qzl = QTABLE.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out = b"\xff\xd8" + seg(0xFFDB, b"\x00" + qzl)
    out += seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += (seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
            + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)))
    for ss, se, ah, al, scan in scans:
        out += seg(0xFFDA, b"\x01\x01" + (b"\x00" if ss == 0 else b"\x10")
                   + struct.pack(">BBB", ss, se, (ah << 4) | al))
        out += scan
    return out + b"\xff\xd9"


# libjpeg's standard progressive script for 3 components
# (jcparam.c jpeg_simple_progression): interleaved-DC MSBs, coarse Y AC
# band, full chroma AC, Y AC tail, one refinement per bit plane.
SA_SCRIPT_COLOR = (
    ("dc", (0, 1, 2), 0, 0, 0, 1),
    ("ac", (0,), 1, 5, 0, 2),
    ("ac", (2,), 1, 63, 0, 1),
    ("ac", (1,), 1, 63, 0, 1),
    ("ac", (0,), 6, 63, 0, 2),
    ("ac", (0,), 1, 63, 2, 1),
    ("dc", (0, 1, 2), 0, 0, 1, 0),
    ("ac", (2,), 1, 63, 1, 0),
    ("ac", (1,), 1, 63, 1, 0),
    ("ac", (0,), 1, 63, 1, 0),
)


def _encode_jpeg_progressive_ycc(planes, samps, h, w) -> bytes:
    """Shared SOF2 color encoder core: per-component level-shifted YCC
    planes at their TRUE sample dims -> libjpeg's 10-scan script
    (SA_SCRIPT_COLOR). Interleaved DC scans walk the MCU grid with
    DUMMY blocks (diff 0 / refinement bit 0) at edges per A.2.4; AC
    scans walk each component's own raster block grid."""
    hmax = max(sx for sx, _ in samps)
    vmax = max(sy for _, sy in samps)
    zzs, grids = [], []
    for ci, (pl, qt) in enumerate(zip(planes,
                                      (QTABLE, QTABLE_C, QTABLE_C))):
        ch, cw = pl.shape
        bh, bw_ = -(-ch // 8), -(-cw // 8)
        grids.append((bh, bw_))
        pad = np.pad(pl, ((0, bh * 8 - ch), (0, bw_ * 8 - cw)),
                     mode="edge")
        blocks = pad.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)\
                    .reshape(-1, 8, 8)
        coefs = np.round((_DCT @ blocks @ _DCT.T) / qt).astype(np.int64)
        zzs.append(coefs.reshape(-1, 64)[:, ZIGZAG])
    mcu_rows, mcu_cols = -(-h // (8 * vmax)), -(-w // (8 * hmax))
    dc_codes = [_canonical_codes(DC_BITS, DC_VALS),
                _canonical_codes(DC_BITS_C, DC_VALS_C),
                _canonical_codes(DC_BITS_C, DC_VALS_C)]
    ac_codes = [_canonical_codes(AC_BITS, AC_VALS),
                _canonical_codes(AC_BITS_C, AC_VALS_C),
                _canonical_codes(AC_BITS_C, AC_VALS_C)]

    def dc_positions(comps):
        for my in range(mcu_rows):
            for mx in range(mcu_cols):
                for ci, c in enumerate(comps):
                    hc, vc = samps[c]
                    bh, bw_ = grids[c]
                    for byy in range(vc):
                        for bxx in range(hc):
                            r, col = my * vc + byy, mx * hc + bxx
                            yield ci, (r * bw_ + col
                                       if r < bh and col < bw_ else -1)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    scans = []
    for kind, comps, ss, se, ah, al in SA_SCRIPT_COLOR:
        bw = _BitWriter()
        if kind == "dc" and ah == 0:
            prevs = [0] * len(comps)
            for ci, b in dc_positions(comps):
                # dummy blocks code diff 0 (predictor unchanged)
                v = (int(zzs[comps[ci]][b, 0]) >> al) if b >= 0 \
                    else prevs[ci]
                diff = v - prevs[ci]
                prevs[ci] = v
                s_ = _csize(diff)
                c_, ln = dc_codes[comps[ci]][s_]
                bw.write(c_, ln)
                if s_:
                    bw.write(diff if diff > 0 else diff + (1 << s_) - 1,
                             s_)
        elif kind == "dc":
            for ci, b in dc_positions(comps):
                bw.write((int(zzs[comps[ci]][b, 0]) >> al) & 1
                         if b >= 0 else 0, 1)
        elif ah == 0:
            _emit_ac_first_scan(bw, zzs[comps[0]], ac_codes[comps[0]],
                                ss, se, al)
        else:
            _emit_ac_refine_scan(bw, zzs[comps[0]], ac_codes[comps[0]],
                                 ss, se, al)
        scans.append((comps, ss, se, ah, al, bw.flush()))

    qzl = QTABLE.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    qzc = QTABLE_C.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out = (b"\xff\xd8" + seg(0xFFDB, b"\x00" + qzl)
           + seg(0xFFDB, b"\x01" + qzc))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for c, (hc, vc) in enumerate(samps):
        sof += bytes([c + 1, (hc << 4) | vc, 0 if c == 0 else 1])
    out += seg(0xFFC2, sof)
    out += (seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
            + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
            + seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
            + seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C)))
    for comps, ss, se, ah, al, scan in scans:
        hdr = bytes([len(comps)])
        for c in comps:
            hdr += bytes([c + 1, (0 if c == 0 else 0x11)])
        hdr += bytes([ss, se, (ah << 4) | al])
        out += seg(0xFFDA, hdr) + scan
    return out + b"\xff\xd9"


def _ycc_planes(rgb: np.ndarray, fx: int, fy: int):
    """Level-shifted Y + box-downsampled chroma planes for a layout with
    chroma factors (fx, fy). The image is edge-padded to full MCU
    multiples BEFORE downsampling — the same edge content the baseline
    encoders use — so the chroma edge blocks carry identical samples
    and progressive-subsampled decode equals baseline-subsampled decode
    bit for bit. The resulting chroma dims are exactly the raster block
    grid (ceil(ceil(w/fx)/8)*8 == ceil(w/(8*fx))*8)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    mh, mw = 8 * fy, 8 * fx                    # MCU dims for these layouts
    ph, pw = -(-h // mh) * mh, -(-w // mw) * mw
    ycc = rgb_to_ycbcr(np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)),
                              mode="edge")) - 128.0
    planes = [ycc[:h, :w, 0]]
    for c in (1, 2):
        acc = np.zeros((ph // fy, pw // fx))
        for dy in range(fy):
            for dx in range(fx):
                acc += ycc[dy::fy, dx::fx, c]
        planes.append(acc / (fx * fy))
    return planes, h, w


def encode_jpeg_progressive_color(rgb: np.ndarray) -> bytes:
    """Progressive (SOF2) 4:4:4 COLOR JPEG — libjpeg's standard 10-scan
    script: interleaved 3-component DC scans, single-component AC band
    scans (B.2.3), successive approximation in both. Same quantized
    coefficients as encode_jpeg_color, so decode equals the baseline
    color round trip EXACTLY."""
    planes, h, w = _ycc_planes(rgb, 1, 1)
    return _encode_jpeg_progressive_ycc(planes, [(1, 1)] * 3, h, w)


def encode_jpeg_progressive_420(rgb: np.ndarray) -> bytes:
    """Progressive 4:2:0 — what `cjpeg -progressive` emits for a web
    photo: SOF2 + chroma subsampling + interleaved-DC dummy blocks at
    MCU edges + per-component AC raster scans."""
    planes, h, w = _ycc_planes(rgb, 2, 2)
    return _encode_jpeg_progressive_ycc(
        planes, [(2, 2), (1, 1), (1, 1)], h, w)


def encode_jpeg_progressive_422(rgb: np.ndarray) -> bytes:
    """Progressive 4:2:2 (broadcast layout)."""
    planes, h, w = _ycc_planes(rgb, 2, 1)
    return _encode_jpeg_progressive_ycc(
        planes, [(2, 1), (1, 1), (1, 1)], h, w)


def encode_jpeg_progressive_411(rgb: np.ndarray) -> bytes:
    """Progressive 4:1:1 (DV layout)."""
    planes, h, w = _ycc_planes(rgb, 4, 1)
    return _encode_jpeg_progressive_ycc(
        planes, [(4, 1), (1, 1), (1, 1)], h, w)


def _decode_progressive_coefs(buf: bytes):
    """Shared progressive (SOF2) scan walker for 1 or 3 components at
    the baseline sampling layouts (gray, 4:4:4, 4:2:0, 4:2:2, 4:1:1):
    parses every SOS and accumulates zigzag coefficients across scans.

    DC scans may be interleaved (Ns = nc) or single-component; AC scans
    are single-component by spec (B.2.3). Per T.81 A.2.4 each component
    owns TWO block geometries: the raster grid derived from the true
    image dims (what AC scans and the output walk) and the MCU-padded
    grid (what interleaved DC scans walk — edge positions outside the
    raster grid are DUMMY blocks that are entropy-coded but discarded,
    predictor updates included). Handles all four scan kinds
    (first/refinement x DC/AC, successive approximation included).
    Returns (Zs, qts, comp_qs, dims, samps) or None."""
    try:
        if len(buf) < 4 or buf[:2] != b"\xff\xd8":
            return None
        qts: dict[int, np.ndarray] = {}
        comp_qs: list[int] = []
        comp_ids: list[int] = []
        samps: list[tuple[int, int]] = []
        dims = None
        nc = 0
        huff: dict[int, _HuffTable] = {}
        scans = []   # ([comp], [tdta], ss, se, ah, al, data)
        i = 2
        progressive = False
        while i + 4 <= len(buf):
            if buf[i] != 0xFF:
                return None
            marker = (buf[i] << 8) | buf[i + 1]
            if marker == 0xFFD9:
                break
            (ln,) = struct.unpack_from(">H", buf, i + 2)
            payload = buf[i + 4:i + 2 + ln]
            if marker == 0xFFDB:
                j = 0
                while j < len(payload):
                    if payload[j] & 0xF0:
                        return None
                    t = np.zeros(64, dtype=np.int64)
                    t[ZIGZAG] = np.frombuffer(
                        payload[j + 1:j + 65], dtype=np.uint8)
                    qts[payload[j] & 0x0F] = t.reshape(8, 8)
                    j += 65
            elif marker == 0xFFC2:
                prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
                if prec != 8 or nc not in (1, 3):
                    return None
                for c in range(nc):
                    comp_ids.append(payload[6 + 3 * c])
                    samp = payload[6 + 3 * c + 1]
                    samps.append((samp >> 4, samp & 0x0F))
                    comp_qs.append(payload[6 + 3 * c + 2])
                if samps not in ([(1, 1)],
                                 [(1, 1)] * 3,
                                 [(2, 2), (1, 1), (1, 1)],
                                 [(2, 1), (1, 1), (1, 1)],
                                 [(4, 1), (1, 1), (1, 1)]):
                    return None
                dims = (h, w)
                progressive = True
            elif marker in (0xFFC0, 0xFFC1, 0xFFC3):
                return None       # baseline/lossless go to the other paths
            elif marker == 0xFFC4:
                huff.update(_decode_huff_tables(payload))
            elif marker == 0xFFDD:
                return None
            elif marker == 0xFFDA:
                ns = payload[0]
                comps, tdtas = [], []
                for c in range(ns):
                    cid = payload[1 + 2 * c]
                    if cid not in comp_ids:
                        return None
                    comps.append(comp_ids.index(cid))
                    tdtas.append(payload[2 + 2 * c])
                ss, se, ahal = (payload[1 + 2 * ns], payload[2 + 2 * ns],
                                payload[3 + 2 * ns])
                ah, al = ahal >> 4, ahal & 0x0F
                if ah != 0 and ah != al + 1:
                    return None   # malformed successive-approx sequence
                if ss != 0 and ns != 1:
                    return None   # AC scans are single-component (B.2.3)
                if ss == 0 and ns not in (1, nc):
                    return None
                # scan data runs to the next marker (FF xx with xx != 00)
                j = i + 2 + ln
                k = j
                while k + 1 < len(buf):
                    if buf[k] == 0xFF and buf[k + 1] not in (0x00,):
                        break
                    k += 1
                scans.append((comps, tdtas, ss, se, ah, al, buf[j:k]))
                i = k
                continue
            i += 2 + ln
        if not progressive or dims is None or not scans \
                or any(q not in qts for q in comp_qs):
            return None
        h, w = dims
        if h == 0 or w == 0:
            return None
        hmax = max(sx for sx, _ in samps)
        vmax = max(sy for _, sy in samps)
        # raster grid per component (true-dims geometry, A.2.4)
        grids = []
        for hc, vc in samps:
            cw = -(-(w * hc) // hmax)
            ch = -(-(h * vc) // vmax)
            grids.append((-(-ch // 8), -(-cw // 8)))   # (block rows, cols)
        mcu_rows, mcu_cols = -(-h // (8 * vmax)), -(-w // (8 * hmax))
        Zs = [np.zeros((bh * bw, 64), dtype=np.int64) for bh, bw in grids]
        band_seen = [np.zeros(64, dtype=bool) for _ in range(nc)]
        for comps, tdtas, ss, se, ah, al, data in scans:
            for c in comps:
                if ah == 0:
                    band_seen[c][ss:se + 1] = True
                elif not band_seen[c][ss:se + 1].all():
                    return None   # refinement before any first scan
            br = _BitReader(data)
            interleaved = ss == 0 and len(comps) > 1

            def _dc_positions():
                """(ci, flat raster index | -1 for dummy) in scan order."""
                if interleaved:
                    for my in range(mcu_rows):
                        for mx in range(mcu_cols):
                            for ci, c in enumerate(comps):
                                hc, vc = samps[c]
                                bh, bw_ = grids[c]
                                for byy in range(vc):
                                    for bxx in range(hc):
                                        r = my * vc + byy
                                        col = mx * hc + bxx
                                        if r < bh and col < bw_:
                                            yield ci, r * bw_ + col
                                        else:
                                            yield ci, -1
                else:
                    bh, bw_ = grids[comps[0]]
                    for b in range(bh * bw_):
                        yield 0, b

            if ss == 0 and ah == 0:           # DC first scan (Al >= 0)
                if se != 0:
                    return None
                dc_ts = [huff.get(t >> 4) for t in tdtas]
                if any(t is None for t in dc_ts):
                    return None
                prevs = [0] * len(comps)
                for ci, b in _dc_positions():
                    s_ = _read_symbol(br, dc_ts[ci])
                    if s_:
                        prevs[ci] += _extend(br.read_bits(s_), s_)
                    if b >= 0:
                        Zs[comps[ci]][b, 0] = prevs[ci] << al
            elif ss == 0:                     # DC refinement: 1 raw bit
                if se != 0:
                    return None
                for ci, b in _dc_positions():
                    bit = br.read_bit()
                    if bit and b >= 0:
                        Zs[comps[ci]][b, 0] |= 1 << al
            elif ah == 0:                     # AC first scan (Al >= 0)
                Z = Zs[comps[0]]
                nb = len(Z)
                ac_t = huff.get(0x10 | (tdtas[0] & 0x0F))
                if ac_t is None or not (1 <= ss <= se <= 63):
                    return None
                eobrun = 0
                for b in range(nb):
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _read_symbol(br, ac_t)
                        r, s_ = rs >> 4, rs & 0x0F
                        if s_ == 0:
                            if r == 15:       # ZRL
                                k += 16
                                continue
                            # EOB with EOBRUN = 2^r + bits - 1 MORE blocks
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("band overrun")
                        Z[b, k] = _extend(br.read_bits(s_), s_) << al
                        k += 1
            else:                             # AC refinement (Ah = Al+1)
                Z = Zs[comps[0]]
                nb = len(Z)
                ac_t = huff.get(0x10 | (tdtas[0] & 0x0F))
                if ac_t is None or not (1 <= ss <= se <= 63):
                    return None
                p1, m1 = 1 << al, -(1 << al)

                def _correct(b: int, k: int) -> None:
                    # T.81 G.1.2.3: one correction bit per nonzero-
                    # history coefficient; append p1 toward its sign
                    # when bit=1 and bit Al not yet set
                    if br.read_bit() and (int(Z[b, k]) & p1) == 0:
                        Z[b, k] += p1 if Z[b, k] >= 0 else m1

                eobrun = 0
                for b in range(nb):
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = _read_symbol(br, ac_t)
                            r, s_ = rs >> 4, rs & 0x0F
                            newval = 0
                            if s_:
                                if s_ != 1:
                                    raise ValueError("bad refine size")
                                newval = p1 if br.read_bit() else m1
                            elif r != 15:     # EOB: run of ended blocks
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            # advance: corrections on nonzero history,
                            # r counts down over zero-history slots
                            while k <= se:
                                if Z[b, k] != 0:
                                    _correct(b, k)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if newval and k <= se:
                                Z[b, k] = newval
                            k += 1
                    if eobrun > 0:
                        # rest of this block (and whole following
                        # blocks) only refine existing coefficients
                        while k <= se:
                            if Z[b, k] != 0:
                                _correct(b, k)
                            k += 1
                        eobrun -= 1
        return Zs, qts, comp_qs, dims, samps
    except (IndexError, ValueError, struct.error):
        return None


def _progressive_planes(buf: bytes, want_nc: int):
    got = _decode_progressive_coefs(buf)
    if got is None:
        return None
    Zs, qts, comp_qs, (h, w), samps = got
    if len(samps) != want_nc:
        return None
    hmax = max(sx for sx, _ in samps)
    vmax = max(sy for _, sy in samps)
    planes = []
    for c, (hc, vc) in enumerate(samps):
        cw = -(-(w * hc) // hmax)
        ch = -(-(h * vc) // vmax)
        bh, bw_ = -(-ch // 8), -(-cw // 8)
        blocks = _idct_blocks(Zs[c], qts[comp_qs[c]])
        plane = (blocks.reshape(bh, bw_, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8))[:ch, :cw]
        if hc < hmax:
            plane = np.repeat(plane, hmax // hc, axis=1)
        if vc < vmax:
            plane = np.repeat(plane, vmax // vc, axis=0)
        planes.append(plane[:h, :w])
    return planes, (h, w)


def decode_jpeg_progressive_gray(buf: bytes) -> np.ndarray | None:
    """Decode a progressive (SOF2) grayscale JPEG — spectral selection
    AND successive approximation — by multi-scan coefficient
    accumulation, then one batched dequant/IDCT. Returns None for
    baseline files and anything malformed (refinement before first
    scan, bad SA sequence, unknown sampling layout)."""
    got = _progressive_planes(buf, 1)
    if got is None:
        return None
    planes, (h, w) = got
    return np.clip(np.round(planes[0] + 128.0), 0, 255).astype(
        np.uint8)[:h, :w]


def decode_jpeg_progressive_color(buf: bytes) -> np.ndarray | None:
    """Decode a progressive (SOF2) COLOR JPEG at 4:4:4, 4:2:0, 4:2:2 or
    4:1:1 — the multi-component profile: interleaved DC scans (dummy
    blocks at MCU edges decoded-and-discarded per A.2.4), single-
    component AC band scans over each component's OWN raster block grid
    (B.2.3), successive approximation in both. Returns uint8 (h, w, 3)
    RGB or None."""
    got = _progressive_planes(buf, 3)
    if got is None:
        return None
    planes, (h, w) = got
    ycc = np.stack(planes, axis=-1) + 128.0
    return ycbcr_to_rgb(ycc)[:h, :w]
