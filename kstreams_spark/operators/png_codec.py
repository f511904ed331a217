"""PNG codec, pure stdlib (VERDICT r9 task 7) — the last *feasible*
compressed-image format in this container: PNG's only compression is
zlib/DEFLATE (RFC 1950/1951), which ships in the Python stdlib, so a
complete decode is chunk walk + CRC + inflate + per-scanline unfilter
(PNG spec, ISO/IEC 15948 / W3C REC-PNG; filters in §9, Paeth from the
spec's reference pseudocode). With this module the env-gated guidance
shrinks to MP3/H.264 (no stdlib entropy decoder exists for those).

Decoder scope (stated, not hidden): 8-bit truecolor (color type 2),
non-interlaced, one image. Palette/gray/alpha color types, bit depths
other than 8, and Adam7 interlacing raise ValueError naming the
variant. Unknown ANCILLARY chunks (lowercase first type letter, e.g.
tEXt/tIME) are skipped per spec; unknown CRITICAL chunks are an error.
Every chunk's CRC32 is verified.

Encoder: it exists to PLANT fixtures that exercise the decoder's real
traps — per-row filter types cycle through all five (None/Sub/Up/
Average/Paeth, keyed by (doc_id + y) % 5 so a decoder that ignores the
filter byte or botches any one reconstruction fails on some doc), the
zlib stream is split across MULTIPLE small IDAT chunks (decoders must
concatenate before inflating — the single most common hand-rolled-PNG
bug), and an ancillary tEXt chunk sits between IHDR and the IDATs.

The oracle-replays-pixels contract (the BMP/WAV/AVI doctrine): PNG is
LOSSLESS, so unlike JPEG no fixture constraint is needed — the decoded
grid equals the synthesized one by format semantics, and the DuckDB
oracle replays the one-line channel arithmetic per pixel. The
position-weighted checksum catches stride/filter/row-order bugs.

Cost model: pure-Python unfilter is O(3·w·h) per image — fine at
fixture scale; zlib itself is C. At 100 TB the mapInPandas decode
stage swaps this module for PIL/libspng behind the same
(bytes → grid) signature, the multimodal family's standing seam.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # 8-bit truecolor: 3 bytes per pixel


def _paeth(a: int, b: int, c: int) -> int:
    """PaethPredictor(left, above, upper-left) — spec §9.4 pseudocode."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def encode_png(
    grid: list[list[tuple[int, int, int]]],
    row_filter=lambda y: y % 5,
    idat_size: int = 64,
) -> bytes:
    """grid[y][x] = (r, g, b) → a complete, valid 8-bit truecolor PNG.
    `row_filter(y)` picks each scanline's filter type (0..4); the
    default cycles so every reconstruction path gets exercised. The
    compressed stream is split into `idat_size`-byte IDAT chunks and an
    ancillary tEXt chunk is planted before them (decoder traps)."""
    h, w = len(grid), len(grid[0])
    raw_prior = bytes(_BPP * w)
    scanlines = bytearray()
    for y in range(h):
        raw = bytearray()
        for x in range(w):
            raw.extend(grid[y][x])
        ftype = row_filter(y)
        filt = bytearray()
        for i in range(len(raw)):
            left = raw[i - _BPP] if i >= _BPP else 0
            up = raw_prior[i]
            ul = raw_prior[i - _BPP] if i >= _BPP else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            elif ftype == 4:
                pred = _paeth(left, up, ul)
            else:
                raise ValueError(f"bad filter type {ftype}")
            filt.append((raw[i] - pred) & 0xFF)
        scanlines.append(ftype)
        scanlines.extend(filt)
        raw_prior = bytes(raw)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    z = zlib.compress(bytes(scanlines), 9)
    out = bytearray(_SIG)
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"tEXt", b"Software\x00kstreams_spark png_codec")
    for i in range(0, len(z), idat_size):
        out += _chunk(b"IDAT", z[i : i + idat_size])
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _walk_chunks(payload: bytes):
    """Yield (type, data) with CRC verification; raises on truncation."""
    pos = len(_SIG)
    n = len(payload)
    while pos < n:
        if pos + 8 > n:
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            raise ValueError(f"truncated {ctype!r} chunk")
        data = payload[pos + 8 : end]
        (crc,) = struct.unpack_from(">I", payload, end)
        if crc != zlib.crc32(ctype + data):
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, data
        pos = end + 4


def png_pixel_grid(payload: bytes) -> list[list[tuple[int, int, int]]]:
    """Real PNG decode: signature, CRC-verified chunk walk (ancillary
    chunks skipped, unknown critical chunks rejected), multi-IDAT
    concatenation, zlib inflate, per-scanline unfilter of all five
    filter types. Returns grid[y][x] = (r, g, b); ValueError on
    malformed or out-of-scope input (see module docstring)."""
    if len(payload) < len(_SIG) or payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG file")
    w = h = None
    idat = bytearray()
    seen_end = False
    for ctype, data in _walk_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 2:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth} color={color}); "
                    "decoder scope is 8-bit truecolor"
                )
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            if interlace != 0:
                raise ValueError("Adam7 interlacing unsupported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_end = True
            break
        elif not (ctype[0] & 0x20):  # critical chunk we don't know
            raise ValueError(f"unknown critical chunk {ctype!r}")
        # ancillary (tEXt, tIME, ...): skip per spec
    if w is None or not seen_end or w <= 0 or h <= 0:
        raise ValueError("missing IHDR/IEND or degenerate dimensions")
    raw = zlib.decompress(bytes(idat))
    stride = 1 + _BPP * w
    if len(raw) != stride * h:
        raise ValueError(
            f"decompressed size {len(raw)} != expected {stride * h}"
        )
    grid: list[list[tuple[int, int, int]]] = []
    prior = bytes(_BPP * w)
    for y in range(h):
        ftype = raw[y * stride]
        line = bytearray(raw[y * stride + 1 : (y + 1) * stride])
        if ftype == 1:
            for i in range(_BPP, len(line)):
                line[i] = (line[i] + line[i - _BPP]) & 0xFF
        elif ftype == 2:
            for i in range(len(line)):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif ftype == 3:
            for i in range(len(line)):
                left = line[i - _BPP] if i >= _BPP else 0
                line[i] = (line[i] + (left + prior[i]) // 2) & 0xFF
        elif ftype == 4:
            for i in range(len(line)):
                left = line[i - _BPP] if i >= _BPP else 0
                ul = prior[i - _BPP] if i >= _BPP else 0
                line[i] = (line[i] + _paeth(left, prior[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad scanline filter type {ftype}")
        prior = bytes(line)
        grid.append(
            [tuple(line[_BPP * x : _BPP * x + _BPP]) for x in range(w)]
        )
    return grid


def parse_png_features(payload: bytes) -> dict:
    """Exact integer features over the really-decoded pixel grid (the
    parse_bmp twin — same IMAGE_SCHEMA keys, RGB file order)."""
    grid = png_pixel_grid(payload)
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


def _png_dims(doc_id: int) -> tuple[int, int]:
    """6..12 × 4..7 — width varies the scanline stride, height varies
    which filter types a doc's rows land on ((doc_id + y) % 5)."""
    return 6 + doc_id % 7, 4 + doc_id % 4


def _png_channel(doc_id: int, x: int, y: int, c: int) -> int:
    """Channel value; c = 0 red, 1 green, 2 blue (PNG file order)."""
    return (doc_id * 23 + y * 19 + x * 11 + c * 109) % 256


def synth_png(doc_id: int) -> bytes:
    """The deterministic test-pattern PNG for doc_id: pixels from
    `_png_channel`, per-row filter type (doc_id + y) % 5 — across the
    corpus every filter reconstructs content-bearing rows."""
    w, h = _png_dims(doc_id)
    return encode_png(
        [
            [
                tuple(_png_channel(doc_id, x, y, c) for c in (0, 1, 2))
                for x in range(w)
            ]
            for y in range(h)
        ],
        row_filter=lambda y: (doc_id + y) % 5,
    )
