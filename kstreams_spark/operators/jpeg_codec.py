"""Baseline-sequential JPEG codec, pure stdlib (VERDICT r8 task 8) —
the honest closure of the multimodal family's one env-gated gap: the
container ships no PIL/ffmpeg, so compressed-image decode had stayed
behind `decode_stub`. Baseline JPEG (ITU-T T.81 / ISO 10918-1, the
public spec) needs nothing beyond integer/float arithmetic: marker
parse, Huffman entropy decode (canonical codes from DHT bits/huffvals,
0xFF00 byte unstuffing, RSTn restart handling), DC prediction, zigzag,
dequantization, 2-D IDCT, and the JFIF YCbCr↔RGB transform.

Decoder scope (stated, not hidden): baseline DCT (SOF0), 8-bit,
Huffman coding, 1- or 3-component scans, sampling factors 1-2 per axis
(4:4:4, 4:2:2, 4:2:0 — chroma upsampled by pixel replication per JFIF),
DRI/RSTn intervals; r13 adds PROGRESSIVE (SOF2, Huffman — the full
Annex-G scan machinery: spectral selection, successive approximation,
DC/AC first + refinement scans, EOBRUN; see the progressive section
below), and r14 extends progressive to sampling factors 1-2 per axis
(4:2:0/4:2:2 — the dominant real-world progressive layouts) and
DRI/RSTn restart intervals inside progressive scans (VERDICT r13
task 3). Lossless/differential/arithmetic variants raise ValueError
naming the variant.

Encoder: 4:4:4 three-component baseline with the spec's Annex-K
standard Huffman tables, selectable quantization tables (default:
all-ones — maximum-fidelity, every dequantized coefficient equals the
rounded FDCT output), optional restart intervals. It exists to PLANT
fixtures: the decoder is general, the encoder makes the planted
bitstreams real (full entropy coding, byte stuffing, DC differentials).

The oracle-replays-pixels contract (the BMP/WAV/AVI doctrine, applied
to a LOSSY format): the registered query's fixtures are tile-constant
GRAYSCALE images on the 8×8 block grid. For those, every step is
exactly invertible — gray RGB→YCbCr is (v, 128, 128) to <1e-12 before
rounding, a constant block's FDCT is DC-only with an integer DC (8·s),
all-ones quantization preserves it, and the IDCT of a DC-only block is
exactly flat — so the decoded pixels EQUAL the synthesized ones and
DuckDB replays the synthesis arithmetic in SQL (tests additionally pin
the general lossy path on gradient/noise images with a ±3 bound, and
bit-level features: stuffed bytes, restarts, truncation errors).

Cost model: pure-Python IDCT is O(64·64) per block — fixture-sized by
design. At 100 TB the mapInPandas stage swaps this module for a native
codec (PIL/libjpeg-turbo) behind the same (bytes → grid) signature; the
Spark-side plumbing (schema, Arrow batching, partition shape) is
identical, which is the multimodal family's standing contract.
"""

from __future__ import annotations

import math
import struct

# --- public-spec constant tables (ITU-T T.81) ------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K "typical" Huffman tables: (bits[1..16], huffvals)
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

UNIT_QUANT = [1] * 64  # maximum-fidelity table (valid per spec)

# Annex K Table K.1/K.2 — the spec's example quantization tables, kept
# for the lossy-path tests (a codec that only ever sees q=1 never
# exercises dequantization).
STD_LUM_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
STD_CHR_QUANT = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _clamp(v: float) -> int:
    iv = int(round(v))
    return 0 if iv < 0 else 255 if iv > 255 else iv


# --- canonical Huffman -------------------------------------------------------


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) canonical assignment (spec C.2)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol lookup for the bit-serial decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _huff_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (spec F.1.2.3)."""
        while self.n:
            self.put(1, 1)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated entropy-coded segment")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"marker 0xFF{marker:02X} inside entropy data"
                    )
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self, expect: int) -> None:
        """Byte-align and consume the RSTn marker (spec E.2.4)."""
        self.n = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + expect
        ):
            raise ValueError(f"expected RST{expect} marker")
        self.pos += 2

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """Magnitude-category decode (spec F.2.2.1 EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


# --- color transforms (JFIF) -------------------------------------------------


def _rgb_to_ycc(r: int, g: int, b: int) -> tuple[int, int, int]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return _clamp(y), _clamp(cb), _clamp(cr)


def _ycc_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return _clamp(r), _clamp(g), _clamp(b)


# --- DCT ----------------------------------------------------------------------


def _fdct_quant(block: list[list[float]], quant: list[int]) -> list[int]:
    """8×8 spatial block (level-shifted) → 64 quantized coefficients in
    zigzag order."""
    coefs = [0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                cv = _COS[v][y]
                row = block[y]
                for x in range(8):
                    s += row[x] * _COS[u][x] * cv
            val = 0.25 * _C[u] * _C[v] * s
            coefs[ZIGZAG.index(v * 8 + u)] = int(
                round(val / quant[ZIGZAG.index(v * 8 + u)])
            )
    return coefs


def _dequant_idct(zz: list[int], quant: list[int]) -> list[list[int]]:
    """64 zigzag coefficients → 8×8 spatial samples (0..255)."""
    F2 = [0.0] * 64
    for i in range(64):
        F2[ZIGZAG[i]] = zz[i] * quant[i]
    out = []
    for y in range(8):
        row = []
        for x in range(8):
            s = 0.0
            for v in range(8):
                base = v * 8
                cv = _C[v] * _COS[v][y]
                for u in range(8):
                    f = F2[base + u]
                    if f:
                        s += _C[u] * f * _COS[u][x] * cv
            row.append(_clamp(0.25 * s + 128))
        out.append(row)
    return out


# --- encoder ------------------------------------------------------------------


def encode_jpeg(
    grid: list[list[tuple[int, int, int]]],
    quant_lum: list[int] = UNIT_QUANT,
    quant_chr: list[int] = UNIT_QUANT,
    restart_interval: int = 0,
) -> bytes:
    """grid[y][x] = (r, g, b) → a complete baseline JFIF file: 4:4:4,
    Annex-K Huffman tables, the given zigzag-order quantization tables,
    optional DRI/RSTn restart intervals."""
    h, w = len(grid), len(grid[0])
    bw, bh = (w + 7) // 8, (h + 7) // 8
    planes = [[[0] * (bw * 8) for _ in range(bh * 8)] for _ in range(3)]
    for y in range(bh * 8):
        sy = min(y, h - 1)  # edge replication
        for x in range(bw * 8):
            sx = min(x, w - 1)
            ycc = _rgb_to_ycc(*grid[sy][sx])
            for c in range(3):
                planes[c][y][x] = ycc[c]

    dc_codes = [_huff_codes(*DC_LUM), _huff_codes(*DC_CHR)]
    ac_codes = [_huff_codes(*AC_LUM), _huff_codes(*AC_CHR)]
    quants = [quant_lum, quant_chr, quant_chr]
    writer = _BitWriter()
    pred = [0, 0, 0]
    mcu_i, rst = 0, 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                writer.align()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0, 0, 0]
            mcu_i += 1
            for c in range(3):
                t = 0 if c == 0 else 1
                block = [
                    [
                        planes[c][by * 8 + y][bx * 8 + x] - 128.0
                        for x in range(8)
                    ]
                    for y in range(8)
                ]
                zz = _fdct_quant(block, quants[c])
                diff = zz[0] - pred[c]
                pred[c] = zz[0]
                cat = _category(diff)
                writer.put(*dc_codes[t][cat])
                if cat:
                    writer.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
                run = 0
                for i in range(1, 64):
                    v = zz[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        writer.put(*ac_codes[t][0xF0])  # ZRL
                        run -= 16
                    cat = _category(v)
                    writer.put(*ac_codes[t][(run << 4) | cat])
                    writer.put(v if v >= 0 else v + (1 << cat) - 1, cat)
                    run = 0
                if run:
                    writer.put(*ac_codes[t][0x00])  # EOB
    writer.align()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(quant_lum))
    out += seg(0xDB, bytes([0x01]) + bytes(quant_chr))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # h=v=1 (4:4:4)
    out += seg(0xC0, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, DC_LUM), (1, 0, AC_LUM), (0, 1, DC_CHR), (1, 1, AC_CHR)
    ):
        out += seg(0xC4, bytes([(cls << 4) | tid] + bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += bytes([cid, tdta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> list[list[tuple[int, int, int]]]:
    """Baseline JPEG bytes → grid[y][x] = (r, g, b). See module
    docstring for the supported profile; unsupported variants raise
    ValueError naming what they are."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (no SOI)")
    pos = 2
    quants: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    while True:
        if pos + 1 >= len(payload):
            raise ValueError("truncated JPEG (no SOS)")
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        (ln,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                quants[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _huff_decoder(
                    bits, vals
                )
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            h, w = struct.unpack_from(">HH", body, 1)
            n_comp = body[5]
            comps = []
            for c in range(n_comp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            for c in comps:
                if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
                    raise ValueError(
                        f"sampling factors {c['h']}x{c['v']} unsupported"
                    )
        elif marker == 0xC2:  # SOF2: progressive (r13 — in scope)
            return _decode_progressive(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported — "
                "lossless/differential/arithmetic variants are out of scope"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if not comps:
                raise ValueError("SOS before SOF")
            n_scan = body[0]
            scan_sel = {}
            for c in range(n_scan):
                cid, tdta = body[1 + 2 * c : 3 + 2 * c]
                scan_sel[cid] = (tdta >> 4, tdta & 0x0F)
            break
        # APPn / COM / anything else: skipped via its length field
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        pw, ph = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        planes.append([[0] * pw for _ in range(ph)])

    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu_i = my * mcus_x + mx
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                reader.sync_restart(rst)
                rst = (rst + 1) % 8
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan_sel[c["id"]]
                for bv in range(c["v"]):
                    for bu in range(c["h"]):
                        t = reader.decode_symbol(huff_dc[td])
                        diff = _extend(reader.bits(t), t) if t else 0
                        pred[ci] += diff
                        zz = [0] * 64
                        zz[0] = pred[ci]
                        i = 1
                        while i < 64:
                            sym = reader.decode_symbol(huff_ac[ta])
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                i += 16
                                continue
                            i += sym >> 4
                            size = sym & 0x0F
                            if i > 63:
                                raise ValueError("AC run past block end")
                            zz[i] = _extend(reader.bits(size), size)
                            i += 1
                        block = _dequant_idct(zz, quants[c["tq"]])
                        oy = (my * c["v"] + bv) * 8
                        ox = (mx * c["h"] + bu) * 8
                        for y in range(8):
                            row = planes[ci][oy + y]
                            brow = block[y]
                            for x in range(8):
                                row[ox + x] = brow[x]

    grid = []
    if len(comps) == 1:
        for y in range(h):
            grid.append([(v, v, v) for v in planes[0][y][:w]])
        return grid
    for y in range(h):
        row = []
        for x in range(w):
            yv = planes[0][(y * comps[0]["v"]) // vmax][(x * comps[0]["h"]) // hmax]
            cb = planes[1][(y * comps[1]["v"]) // vmax][(x * comps[1]["h"]) // hmax]
            cr = planes[2][(y * comps[2]["v"]) // vmax][(x * comps[2]["h"]) // hmax]
            row.append(_ycc_to_rgb(yv, cb, cr))
        grid.append(row)
    return grid


# --- fixture synthesis + features (the oracle-replayable contract) -----------


def _jpeg_dims(doc_id: int) -> tuple[int, int]:
    """8..16 × 8..12 — spans 1 and 2 blocks per axis, multiple-of-8 and
    ragged dims both (edge-replication padding must stay tile-pure)."""
    return 8 + doc_id % 9, 8 + doc_id % 5


def _jpeg_tile_value(doc_id: int, tx: int, ty: int) -> int:
    """Gray value of the 8×8-aligned tile (tx, ty) — grayscale keeps the
    JFIF color transform exactly invertible (Cb = Cr = 128)."""
    return (doc_id * 37 + tx * 101 + ty * 53) % 256


def synth_jpeg(doc_id: int) -> bytes:
    """The planted fixture: a REAL baseline JPEG (full Huffman entropy
    coding, DC differentials, byte stuffing) whose tile-constant
    grayscale content makes the lossy pipeline exactly lossless — see
    module docstring."""
    w, h = _jpeg_dims(doc_id)
    grid = []
    for y in range(h):
        row = []
        for x in range(w):
            v = _jpeg_tile_value(doc_id, x // 8, y // 8)
            row.append((v, v, v))
        grid.append(row)
    return encode_jpeg(grid)


def parse_jpeg_features(payload: bytes) -> dict:
    """Exact integer features over the really-decoded pixel grid — the
    same shape as multimodal.parse_bmp, so the two formats' feature rows
    are interchangeable downstream."""
    grid = decode_jpeg(payload)
    h, w = len(grid), len(grid[0])
    sum_r = sum_g = sum_b = checksum = 0
    for y in range(h):
        for x in range(w):
            r, g, b = grid[y][x]
            sum_r += r
            sum_g += g
            sum_b += b
            checksum += (y * w + x) * (r + g + b)
    return {
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
        "px_checksum": checksum,
    }


# --- progressive mode (SOF2, Huffman) — r13, VERDICT r12 item 5 --------------
# T.81 Annex G: the frame's quantized coefficients are delivered over
# MULTIPLE scans — spectral selection (each AC scan covers a zigzag
# band [Ss, Se] of ONE component; DC scans cover coefficient 0 of all
# scan components interleaved) and successive approximation (first
# scans deliver coefficients at reduced precision, point-transformed
# by Al; refinement scans with Ah = Al+1 append one bit of precision).
# The encoder below emits a 9-scan script exercising every code path —
# DC first + DC refinement (raw bits, no Huffman), AC first scans with
# EOBRUN run-length across blocks and ZRL, AC refinement with
# correction bits over nonzero-history coefficients — and the decoder
# implements the full Annex-G Huffman procedures (the libjpeg
# decode_mcu_{DC,AC}_{first,refine} structure, re-derived from the
# spec's figures G.2/G.7). Scope: 8-bit, Huffman, sampling factors 1-2
# per axis (r14; interleaved DC scans walk the MCU grid, AC scans the
# component's true block grid), DRI/RSTn restarts inside progressive
# scans (r14). Matched-pair contract: progressive and baseline
# encode the SAME quantized coefficients, so decode(progressive(grid))
# must equal decode(baseline(grid)) BIT-FOR-BIT on any input — pinned
# in tests; the oracle query reuses the tile-constant construction.

# AC Huffman table for progressive scans: Annex K's tables lack the
# EOBn symbols (r<<4, s=0 for r=1..14) progressive run-length needs, so
# fixtures carry this canonical table — every RRRRSSSS with s <= 10
# (176 symbols), all at code length 8 (176 < 256 codes: valid, and the
# all-ones code stays unused).
AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)


def _pt_dc(v: int, al: int) -> int:
    """DC point transform: arithmetic shift right (G.1.2.1)."""
    return v >> al


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward ZERO
    (G.1.2.2) — a plain >> would round negatives away from zero."""
    return v >> al if v >= 0 else -((-v) >> al)


def _quantized_blocks(
    grid,
    quant_lum,
    quant_chr,
    sampling=((1, 1), (1, 1), (1, 1)),
):
    """grid → per-component zigzag coefficient blocks + layout facts
    (r14: generalized from the 4:4:4-only shape to sampling factors
    1–2 per axis). Per component: coefficient blocks in PADDED raster
    order covering whole MCUs (interleaved DC scans address pad
    blocks), plus the TRUE block-grid dims (non-interleaved AC scans
    cover only those — A.2.2 vs A.2.3). Subsampled planes are
    box-averaged (rounded mean over the fx×fy source group,
    edge-replicated), the conventional encoder downsample."""
    h, w = len(grid), len(grid[0])
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    for hi, vi in sampling:
        if not (1 <= hi <= 2 and 1 <= vi <= 2) or hmax % hi or vmax % vi:
            raise ValueError(f"sampling factors {hi}x{vi} unsupported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    ycc_planes = [[[0] * w for _ in range(h)] for _ in range(3)]
    for y in range(h):
        for x in range(w):
            t = _rgb_to_ycc(*grid[y][x])
            for c in range(3):
                ycc_planes[c][y][x] = t[c]
    quants = [quant_lum, quant_chr, quant_chr]
    comps = []
    for c, (hi, vi) in enumerate(sampling):
        fx, fy = hmax // hi, vmax // vi
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        bw_p, bh_p = mcux * hi, mcuy * vi
        plane = [[0] * (bw_p * 8) for _ in range(bh_p * 8)]
        for y in range(bh_p * 8):
            for x in range(bw_p * 8):
                acc = 0
                for dy in range(fy):
                    for dx in range(fx):
                        sy = min(y * fy + dy, h - 1)
                        sx = min(x * fx + dx, w - 1)
                        acc += ycc_planes[c][sy][sx]
                plane[y][x] = (acc + (fx * fy) // 2) // (fx * fy)
        coefs = []
        for by in range(bh_p):
            for bx in range(bw_p):
                block = [
                    [
                        plane[by * 8 + y][bx * 8 + x] - 128.0
                        for x in range(8)
                    ]
                    for y in range(8)
                ]
                coefs.append(_fdct_quant(block, quants[c]))
        comps.append(
            {
                "hi": hi,
                "vi": vi,
                "coefs": coefs,
                "bw_p": bw_p,
                "bh_p": bh_p,
                "bw_t": (cw + 7) // 8,
                "bh_t": (ch + 7) // 8,
            }
        )
    return comps, w, h, mcux, mcuy


class _ProgScanWriter:
    """One AC scan's run-length state: EOBRUN accumulation across
    blocks plus (for refinement) the buffered correction bits that
    must follow the next emitted symbol (G.1.2.3 / figure G.7)."""

    def __init__(self, writer: _BitWriter, table) -> None:
        self.w = writer
        self.codes = _huff_codes(*table)
        self.eobrun = 0
        self.be: list[int] = []  # correction bits owed after next EOBn

    def sym(self, s: int) -> None:
        self.w.put(*self.codes[s])

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.w.put(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.be:
            self.w.put(b, 1)
        self.be = []


def encode_jpeg_progressive(
    grid,
    quant_lum: list[int] = UNIT_QUANT,
    quant_chr: list[int] = UNIT_QUANT,
    sampling=((1, 1), (1, 1), (1, 1)),
    restart_interval: int = 0,
) -> bytes:
    """grid[y][x] = (r, g, b) → a complete PROGRESSIVE JFIF file
    (SOF2) carrying the same quantized coefficients as encode_jpeg
    would at the same sampling. Scan script (every Annex-G path): DC
    first (Al=1, interleaved) → AC first per component over two Y
    bands + full chroma bands (Al=1, EOBRUN/ZRL live) → DC refinement
    (raw bits) → AC refinement per component (correction bits).

    r14 extends the r13 4:4:4-only encoder with `sampling` (factors
    1–2 per axis — 4:2:0 is ((2,2),(1,1),(1,1))) and
    `restart_interval` (DRI/RSTn): interleaved scans restart every Ri
    MCUs, non-interleaved AC scans every Ri blocks of that component
    (B.2.4.4), resetting DC predictors and flushing EOBRUN + owed
    correction bits first (a run may never span a restart)."""
    comps, w, h, mcux, mcuy = _quantized_blocks(
        grid, quant_lum, quant_chr, sampling
    )

    def seg(marker: int, payload: bytes) -> bytes:
        return (
            bytes([0xFF, marker])
            + struct.pack(">H", len(payload) + 2)
            + payload
        )

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(quant_lum))
    out += seg(0xDB, bytes([0x01]) + bytes(quant_chr))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for c, (cid, tq) in zip(comps, ((1, 0), (2, 1), (3, 1))):
        sof += bytes([cid, (c["hi"] << 4) | c["vi"], tq])
    out += seg(0xC2, sof)  # SOF2: progressive
    for cls, tid, (bits, vals) in (
        (0, 0, DC_LUM),
        (0, 1, DC_CHR),
        (1, 0, AC_PROG),
        (1, 1, AC_PROG),
    ):
        out += seg(0xC4, bytes([(cls << 4) | tid] + bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    def sos_header(comp_specs, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, tdta in comp_specs:
            body += bytes([cid, tdta])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dc_first_scan(al: int) -> bytes:
        wtr = _BitWriter()
        dc_codes = [_huff_codes(*DC_LUM), _huff_codes(*DC_CHR)]
        pred = [0, 0, 0]
        rst = 0
        for mcu_i in range(mcuy * mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wtr.align()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0, 0, 0]
            my, mx = divmod(mcu_i, mcux)
            for ci, c in enumerate(comps):
                for bv in range(c["vi"]):
                    for bu in range(c["hi"]):
                        bi = (my * c["vi"] + bv) * c["bw_p"] + (
                            mx * c["hi"] + bu
                        )
                        v = _pt_dc(c["coefs"][bi][0], al)
                        diff = v - pred[ci]
                        pred[ci] = v
                        cat = _category(diff)
                        wtr.put(*dc_codes[0 if ci == 0 else 1][cat])
                        if cat:
                            wtr.put(
                                diff if diff >= 0 else diff + (1 << cat) - 1,
                                cat,
                            )
        wtr.align()
        return sos_header(
            [(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, al
        ) + wtr.out

    def dc_refine_scan(ah: int, al: int) -> bytes:
        wtr = _BitWriter()  # raw bits — DC refinement uses no Huffman
        rst = 0
        for mcu_i in range(mcuy * mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wtr.align()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
            my, mx = divmod(mcu_i, mcux)
            for c in comps:
                for bv in range(c["vi"]):
                    for bu in range(c["hi"]):
                        bi = (my * c["vi"] + bv) * c["bw_p"] + (
                            mx * c["hi"] + bu
                        )
                        wtr.put((c["coefs"][bi][0] >> al) & 1, 1)
        wtr.align()
        return sos_header(
            [(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, ah, al
        ) + wtr.out

    def _true_blocks(c):
        """Non-interleaved scan order: the component's TRUE block grid
        (A.2.2), indexed into the padded raster storage."""
        for by in range(c["bh_t"]):
            for bx in range(c["bw_t"]):
                yield by * c["bw_p"] + bx

    def _ac_restart(st, wtr, blk_i, rst):
        if (
            restart_interval
            and blk_i
            and blk_i % restart_interval == 0
        ):
            st.flush_eobrun()
            wtr.align()
            wtr.out += bytes([0xFF, 0xD0 + rst])
            return (rst + 1) % 8
        return rst

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        wtr = _BitWriter()
        c = comps[ci]
        ta = 0 if ci == 0 else 1
        st = _ProgScanWriter(wtr, AC_PROG)
        rst = 0
        for blk_i, bi in enumerate(_true_blocks(c)):
            rst = _ac_restart(st, wtr, blk_i, rst)
            band = [
                _pt_ac(c["coefs"][bi][k], al) for k in range(ss, se + 1)
            ]
            if not any(band):
                st.eobrun += 1
                if st.eobrun == 0x7FFF:
                    st.flush_eobrun()
                continue
            st.flush_eobrun()
            r = 0
            for v in band:
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    st.sym(0xF0)
                    r -= 16
                cat = _category(v)
                st.sym((r << 4) | cat)
                wtr.put(v if v >= 0 else v + (1 << cat) - 1, cat)
                r = 0
            if r:
                st.eobrun += 1
        st.flush_eobrun()
        wtr.align()
        return sos_header([(ci + 1, ta)], ss, se, 0, al) + wtr.out

    def ac_refine_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        wtr = _BitWriter()
        c = comps[ci]
        ta = 0 if ci == 0 else 1
        st = _ProgScanWriter(wtr, AC_PROG)
        rst = 0
        for blk_i, bi in enumerate(_true_blocks(c)):
            rst = _ac_restart(st, wtr, blk_i, rst)
            zz = c["coefs"][bi]
            absv = [_pt_ac(abs(zz[k]), al) for k in range(ss, se + 1)]
            eob = 0  # index AFTER the last newly-significant coefficient
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i + 1
            r = 0
            br: list[int] = []
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i < eob:
                    st.flush_eobrun()
                    st.sym(0xF0)
                    r -= 16
                    for b in br:
                        wtr.put(b, 1)
                    br = []
                if t > 1:  # already significant: one correction bit
                    br.append(t & 1)
                    continue
                st.flush_eobrun()
                st.sym((r << 4) | 1)
                wtr.put(1 if zz[ss + i] >= 0 else 0, 1)
                for b in br:
                    wtr.put(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                st.eobrun += 1
                st.be.extend(br)
                if st.eobrun == 0x7FFF or len(st.be) > 900:
                    st.flush_eobrun()
        st.flush_eobrun()
        wtr.align()
        return sos_header([(ci + 1, ta)], ss, se, ah, al) + wtr.out

    out += dc_first_scan(1)
    out += ac_first_scan(0, 1, 5, 1)
    out += ac_first_scan(1, 1, 63, 1)
    out += ac_first_scan(2, 1, 63, 1)
    out += ac_first_scan(0, 6, 63, 1)
    out += dc_refine_scan(1, 0)
    out += ac_refine_scan(0, 1, 63, 1, 0)
    out += ac_refine_scan(1, 1, 63, 1, 0)
    out += ac_refine_scan(2, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)



def _decode_progressive(payload: bytes) -> list[list[tuple[int, int, int]]]:
    """Progressive (SOF2, Huffman) decode: accumulate every scan's
    contribution into per-block coefficient arrays, then dequantize +
    IDCT once at the end (Annex G; structure mirrors libjpeg's
    decode_mcu_{DC,AC}_{first,refine}). r14 scope extension (VERDICT
    r13 task 3): sampling factors 1-2 per axis (4:2:0/4:2:2 — the
    dominant real-world progressive layouts) and DRI/RSTn restart
    intervals inside progressive scans. Interleaved DC scans walk the
    MCU grid (pad blocks included, A.2.3); non-interleaved scans walk
    the component's TRUE block grid (A.2.2); restarts reset DC
    predictors and EOBRUN and resync the bit reader every Ri MCUs
    (interleaved) or Ri blocks (single-component scans, B.2.4.4)."""
    pos = 2
    quants: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    mcux = mcuy = 0
    restart_interval = 0
    coefs: list[list[list[int]]] = []
    eobrun = 0
    while True:
        if pos + 1 >= len(payload):
            raise ValueError("truncated progressive JPEG (no EOI)")
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                quants[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _huff_decoder(
                    bits, vals
                )
                i += 17 + n
        elif marker == 0xC2:
            h, w = struct.unpack_from(">HH", body, 1)
            n_comp = body[5]
            for c in range(n_comp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise ValueError(
                        f"sampling factors {hi}x{vi} unsupported"
                    )
                comps.append({"id": cid, "tq": tq, "hi": hi, "vi": vi})
            hmax = max(c["hi"] for c in comps)
            vmax = max(c["vi"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                if hmax % c["hi"] or vmax % c["vi"]:
                    raise ValueError(
                        "non-integer sampling ratio unsupported"
                    )
                c["bw_p"] = mcux * c["hi"]
                c["bh_p"] = mcuy * c["vi"]
                c["cw"] = (w * c["hi"] + hmax - 1) // hmax
                c["ch"] = (h * c["vi"] + vmax - 1) // vmax
                c["bw_t"] = (c["cw"] + 7) // 8
                c["bh_t"] = (c["ch"] + 7) // 8
            coefs = [
                [[0] * 64 for _ in range(c["bw_p"] * c["bh_p"])]
                for c in comps
            ]
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF2")
            n_scan = body[0]
            scan = []
            for c in range(n_scan):
                cid, tdta = body[1 + 2 * c : 3 + 2 * c]
                ci = next(
                    i for i, cc in enumerate(comps) if cc["id"] == cid
                )
                scan.append((ci, tdta >> 4, tdta & 0x0F))
            ss, se, ahal = body[1 + 2 * n_scan : 4 + 2 * n_scan]
            ah, al = ahal >> 4, ahal & 0x0F
            reader = _BitReader(payload, pos)
            eobrun = 0
            rst = 0
            if ss == 0:  # DC scan
                if se != 0:
                    raise ValueError("DC scan with Se != 0")
                pred = [0] * len(scan)
                if len(scan) > 1:  # interleaved: MCU walk, pad blocks in
                    for mcu_i in range(mcuy * mcux):
                        if (
                            restart_interval
                            and mcu_i
                            and mcu_i % restart_interval == 0
                        ):
                            reader.sync_restart(rst)
                            rst = (rst + 1) % 8
                            pred = [0] * len(scan)
                        my, mx = divmod(mcu_i, mcux)
                        for si, (ci, td, _ta) in enumerate(scan):
                            cc = comps[ci]
                            for bv in range(cc["vi"]):
                                for bu in range(cc["hi"]):
                                    bi = (my * cc["vi"] + bv) * cc[
                                        "bw_p"
                                    ] + (mx * cc["hi"] + bu)
                                    blk = coefs[ci][bi]
                                    if ah == 0:
                                        t = reader.decode_symbol(
                                            huff_dc[td]
                                        )
                                        diff = (
                                            _extend(reader.bits(t), t)
                                            if t
                                            else 0
                                        )
                                        pred[si] += diff
                                        blk[0] = pred[si] << al
                                    else:  # refinement: one raw bit
                                        if reader.bit():
                                            blk[0] |= 1 << al
                else:  # single component: true block grid
                    ci, td, _ta = scan[0]
                    cc = comps[ci]
                    blk_i = 0
                    for by in range(cc["bh_t"]):
                        for bx in range(cc["bw_t"]):
                            if (
                                restart_interval
                                and blk_i
                                and blk_i % restart_interval == 0
                            ):
                                reader.sync_restart(rst)
                                rst = (rst + 1) % 8
                                pred = [0]
                            blk_i += 1
                            blk = coefs[ci][by * cc["bw_p"] + bx]
                            if ah == 0:
                                t = reader.decode_symbol(huff_dc[td])
                                diff = (
                                    _extend(reader.bits(t), t) if t else 0
                                )
                                pred[0] += diff
                                blk[0] = pred[0] << al
                            else:
                                if reader.bit():
                                    blk[0] |= 1 << al
            else:  # AC scan: exactly one component, true block grid
                if len(scan) != 1:
                    raise ValueError("AC scan must cover one component")
                ci, _td, ta = scan[0]
                cc = comps[ci]
                table = huff_ac[ta]
                p1, m1 = 1 << al, -1 << al
                blk_i = 0
                for by in range(cc["bh_t"]):
                    for bx in range(cc["bw_t"]):
                        if (
                            restart_interval
                            and blk_i
                            and blk_i % restart_interval == 0
                        ):
                            reader.sync_restart(rst)
                            rst = (rst + 1) % 8
                            eobrun = 0
                        blk_i += 1
                        blk = coefs[ci][by * cc["bw_p"] + bx]
                        if ah == 0:  # first scan (figure G.2)
                            if eobrun > 0:
                                eobrun -= 1
                                continue
                            k = ss
                            while k <= se:
                                sym = reader.decode_symbol(table)
                                r, s = sym >> 4, sym & 0x0F
                                if s == 0:
                                    if r == 15:  # ZRL
                                        k += 16
                                        continue
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += reader.bits(r)
                                    break
                                k += r
                                if k > se:
                                    raise ValueError(
                                        "AC run past band end"
                                    )
                                blk[k] = _extend(reader.bits(s), s) << al
                                k += 1
                        else:  # refinement (figure G.7)
                            k = ss
                            if eobrun == 0:
                                while k <= se:
                                    sym = reader.decode_symbol(table)
                                    r, s = sym >> 4, sym & 0x0F
                                    newval = 0
                                    if s:
                                        if s != 1:
                                            raise ValueError(
                                                "AC refinement size != 1"
                                            )
                                        newval = p1 if reader.bit() else m1
                                    elif r != 15:
                                        eobrun = 1 << r
                                        if r:
                                            eobrun += reader.bits(r)
                                        break
                                    while k <= se:
                                        if blk[k] != 0:
                                            if reader.bit() and not (
                                                blk[k] & p1
                                            ):
                                                blk[k] += (
                                                    p1
                                                    if blk[k] >= 0
                                                    else m1
                                                )
                                        else:
                                            if r == 0:
                                                break
                                            r -= 1
                                        k += 1
                                    if newval:
                                        if k > se:
                                            raise ValueError(
                                                "refinement run past "
                                                "band end"
                                            )
                                        blk[k] = newval
                                    k += 1
                            if eobrun > 0:
                                while k <= se:
                                    if blk[k] != 0:
                                        if reader.bit() and not (
                                            blk[k] & p1
                                        ):
                                            blk[k] += (
                                                p1 if blk[k] >= 0 else m1
                                            )
                                    k += 1
                                eobrun -= 1
            pos = reader.pos  # scan consumed; resume at the next marker
        # APPn/COM: skipped via the length field
    if not comps or not coefs:
        raise ValueError("no SOF2/scan data before EOI")
    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        plane = [[0] * (c["bw_p"] * 8) for _ in range(c["bh_p"] * 8)]
        for bi, zz in enumerate(coefs[ci]):
            block = _dequant_idct(zz, quants[c["tq"]])
            oy, ox = (bi // c["bw_p"]) * 8, (bi % c["bw_p"]) * 8
            for y in range(8):
                row = plane[oy + y]
                brow = block[y]
                for x in range(8):
                    row[ox + x] = brow[x]
        planes.append(plane)
    if len(comps) == 1:
        return [[(v, v, v) for v in planes[0][y][:w]] for y in range(h)]
    return [
        [
            _ycc_to_rgb(
                planes[0][(y * comps[0]["vi"]) // vmax][
                    (x * comps[0]["hi"]) // hmax
                ],
                planes[1][(y * comps[1]["vi"]) // vmax][
                    (x * comps[1]["hi"]) // hmax
                ],
                planes[2][(y * comps[2]["vi"]) // vmax][
                    (x * comps[2]["hi"]) // hmax
                ],
            )
            for x in range(w)
        ]
        for y in range(h)
    ]



def synth_jpeg_progressive(doc_id: int) -> bytes:
    """The tile-constant fixture serialized PROGRESSIVE (r13): same
    pixels as synth_jpeg, delivered over the 9-scan Annex-G script —
    DC-only blocks make every AC first scan a pure EOBRUN stream and
    every AC refinement a correction-bit-free EOBRUN, so the
    exactly-lossless oracle contract holds unchanged while the scan
    machinery (multi-SOS parse, DC successive approximation, EOBRUN
    accounting) is what the hash certifies. The AC value/refinement
    paths are pinned bit-for-bit against the baseline decoder on
    arbitrary (lossy) images in tests/test_jpeg_codec.py."""
    w, h = _jpeg_dims(doc_id)
    grid = []
    for y in range(h):
        row = []
        for x in range(w):
            v = _jpeg_tile_value(doc_id, x // 8, y // 8)
            row.append((v, v, v))
        grid.append(row)
    return encode_jpeg_progressive(grid)


def synth_jpeg_progressive_420(doc_id: int) -> bytes:
    """The tile-constant fixture serialized PROGRESSIVE at 4:2:0 with
    DRI=2 (r14, VERDICT r13 task 3): dims 8+doc_id%25 × 8+doc_id%17
    span 1–4 MCUs (16×16 at 4:2:0), so restarts fire inside DC
    interleaved scans for the larger docs and inside every multi-block
    AC scan, and the true-vs-MCU-padded block-grid distinction is live
    (odd dims → pad blocks the AC scans must NOT visit). Exactness
    survives subsampling because gray pixels carry constant chroma
    (Cb=Cr=128 — box-downsampling and replication-upsampling are
    identities) and the 8×8-aligned luma tiles stay DC-only; the lossy
    color paths are pinned against a downsample/upsample reference in
    tests/test_jpeg_codec.py."""
    w, h = 8 + doc_id % 25, 8 + doc_id % 17
    grid = []
    for y in range(h):
        row = []
        for x in range(w):
            v = _jpeg_tile_value(doc_id, x // 8, y // 8)
            row.append((v, v, v))
        grid.append(row)
    return encode_jpeg_progressive(
        grid, sampling=((2, 2), (1, 1), (1, 1)), restart_interval=2
    )
