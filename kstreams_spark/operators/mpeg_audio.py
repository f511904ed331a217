"""MPEG-1 Audio Layer I/II, pure stdlib (r15 — the VERDICT r14 stretch:
the audio half of the env-gated codec guidance gets a real
COMPRESSED-audio cell). ISO/IEC 11172-3 is public; unlike Layer III
(whose Huffman tables + hybrid filterbank stay out of scope BY NAME),
Layers I and II are fixed-width bit-field codecs a header walk can
decode completely.

Decoder scope (stated, not hidden): MPEG-1 (version '11'),
single_channel mode, Layers I and II, SUBBAND DOMAIN — the decoder
parses the real bit layout end to end (sync/header fields, Layer I
4-bit allocations + 6-bit scalefactors + 2..15-bit samples ×
12 granules; Layer II table-B.2a allocations (nbal 4/4/3/2 by subband
class, sblimit 27), scfsi-controlled 1–3 scalefactors per subband, and
GROUPED quantization — 3/5/9-level codes carry THREE samples in one
5/7/10-bit code, de-grouped as c % steps, c//steps % steps,
c//steps² % steps) and returns the integer quantized samples +
scalefactor indices. The SYNTHESIS POLYPHASE FILTERBANK (the 512-entry
window table 3-C.3) is named out of scope: features are subband-domain
integers, which is also what keeps the DuckDB oracle exact — it
replays the fixture's sample synthesis arithmetically, so a
misaligned allocation field, a wrong scfsi branch, or a de-grouping
bug is value-wrong on the position-weighted checksum. Stereo modes,
Layer III, free-format bitrate, and non-B.2a table selections reject
by name. Frames with protection_bit 0 skip (do not verify) the 16-bit
CRC, stated.

Layer II table 3-B.2a quantization-steps matrix (48/44.1/32 kHz at
high bitrates, sblimit 27), entered from the spec:
  sb 0–2   nbal 4: 3,7,15,31,63,...,65535          (pow2-1 ladder)
  sb 3–10  nbal 4: 3,5,7,9,15,31,...,8191,65535
  sb 11–22 nbal 3: 3,5,7,9,15,31,65535
  sb 23–26 nbal 2: 3,5,65535
Grouping applies exactly to 3/5/9 steps (5/7/10 bits per triplet).

Validation: matched-pair roundtrip (our encoder plants the layouts),
golden bit-level walks in tests/test_mpeg_audio.py, and the DuckDB
value hash over 200 synthesized docs per layer. No independent MP2
decoder ships in this container (stated); the (bytes → samples) seam
swaps in mpg123/ffmpeg at deployment, the multimodal family's
standing seam.

Reference: extends the reference's sensor-pipeline growth path the way
the WAV/G.711 cells do (BME680.java:41-44); a crawl's audio corpus is
headed by MPEG audio frames.

Cost model: pure-Python bit unpacking is O(bits) per frame — fixture
scale; at 100 TB the mapInPandas decode stage is executor-parallel
per file with the native-decoder swap behind the same signature.
"""

from __future__ import annotations

import struct

# MPEG-1 tables (ISO/IEC 11172-3 §2.4.2.3)
BITRATES_L1 = (0, 32, 64, 96, 128, 160, 192, 224,
               256, 288, 320, 352, 384, 416, 448)  # kbps, idx 1..14
BITRATES_L2 = (0, 32, 48, 56, 64, 80, 96, 112,
               128, 160, 192, 224, 256, 320, 384)
SAMPLE_RATES = (44100, 48000, 32000)  # idx 0..2

# Layer II table 3-B.2a: per-subband (nbal, steps ladder)
_B2A_03 = (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
           16383, 32767, 65535)
_B2A_3_10 = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
             8191, 65535)
_B2A_11_22 = (3, 5, 7, 9, 15, 31, 65535)
_B2A_23_26 = (3, 5, 65535)
SBLIMIT_A = 27


def _b2a_row(sb: int) -> tuple[int, tuple[int, ...]]:
    """(nbal, steps ladder) for subband sb under table 3-B.2a; ladder
    index 0 is 'no allocation' (steps tuple is 1-based here)."""
    if sb < 3:
        return 4, _B2A_03
    if sb < 11:
        return 4, _B2A_3_10
    if sb < 23:
        return 3, _B2A_11_22
    return 2, _B2A_23_26


GROUPED = {3: 5, 5: 7, 9: 10}  # steps -> bits per 3-sample group


def _sample_bits(steps: int) -> int:
    """Bits per single (ungrouped) code: log2(steps + 1) — the table's
    ungrouped steps are 2^k - 1 by construction."""
    return (steps + 1).bit_length() - 1


class _BitWriter:
    """MSB-first bit packer (ISO 11172-3 bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, width: int) -> None:
        if val < 0 or val >> width:
            raise ValueError(f"value {val} does not fit {width} bits")
        self.acc = (self.acc << width) | val
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def done(self) -> bytes:
        if self.n:
            self.out.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = self.n = 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def get(self, width: int) -> int:
        out = 0
        for _ in range(width):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("MPEG audio frame truncated mid-field")
            out = (out << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def _header(layer: int, bitrate_idx: int, fs_idx: int) -> bytes:
    """32-bit MPEG-1 single_channel header, protection_bit 1 (no CRC)."""
    layer_bits = {1: 0b11, 2: 0b10}[layer]
    word = (
        (0x7FF << 21)
        | (0b11 << 19)          # MPEG-1
        | (layer_bits << 17)
        | (1 << 16)             # protection_bit: no CRC
        | (bitrate_idx << 12)
        | (fs_idx << 10)
        | (0 << 9)              # padding
        | (0 << 8)              # private
        | (0b11 << 6)           # mode: single_channel
        | (0 << 4) | (0 << 3) | (0 << 2) | 0  # ext/copy/orig/emphasis
    )
    return struct.pack(">I", word)


def encode_layer1_frame(
    bitalloc: list[int],
    scf: list[int],
    samples: list[list[int]],
    bitrate_idx: int = 14,
    fs_idx: int = 2,
) -> bytes:
    """One MPEG-1 Layer I mono frame: bitalloc[32] (0 = unallocated,
    else nb bits per sample, 2..15), scf[32] (6-bit indices, used where
    allocated), samples[12][32] (quantized codes, nb bits). Zero-padded
    to the spec frame length 4·(12·bitrate/fs) bytes."""
    w = _BitWriter()
    for sb in range(32):
        a = bitalloc[sb]
        if a and not 2 <= a <= 15:
            raise ValueError(f"Layer I nb {a} out of range")
        w.put(0 if not a else a - 1, 4)
    for sb in range(32):
        if bitalloc[sb]:
            if not 0 <= scf[sb] <= 62:
                raise ValueError("scalefactor index out of range")
            w.put(scf[sb], 6)
    for g in range(12):
        for sb in range(32):
            if bitalloc[sb]:
                w.put(samples[g][sb], bitalloc[sb])
    body = w.done()
    n_bytes = 4 * (12 * BITRATES_L1[bitrate_idx] * 1000
                   // SAMPLE_RATES[fs_idx])
    if 4 + len(body) > n_bytes:
        raise ValueError(
            f"frame body {len(body)}B exceeds capacity {n_bytes - 4}B — "
            "lower the allocation"
        )
    return _header(1, bitrate_idx, fs_idx) + body + bytes(
        n_bytes - 4 - len(body)
    )


def encode_layer2_frame(
    alloc_idx: list[int],
    scfsi: list[int],
    scf: list[list[int]],
    samples: list[list[int]],
    bitrate_idx: int = 10,
    fs_idx: int = 0,
) -> bytes:
    """One MPEG-1 Layer II mono frame under table 3-B.2a:
    alloc_idx[27] (ladder indices, 0 = unallocated), scfsi[27] (0..3),
    scf[27] = up to 3 six-bit indices per subband (count by scfsi),
    samples[36][27] quantized codes. Grouped steps (3/5/9) pack each
    granule-triplet as one code; zero-padded to 144·bitrate/fs bytes."""
    w = _BitWriter()
    for sb in range(SBLIMIT_A):
        nbal, ladder = _b2a_row(sb)
        if alloc_idx[sb] > len(ladder):
            raise ValueError(f"alloc index {alloc_idx[sb]} off ladder")
        w.put(alloc_idx[sb], nbal)
    for sb in range(SBLIMIT_A):
        if alloc_idx[sb]:
            w.put(scfsi[sb], 2)
    n_scf = {0: 3, 1: 2, 2: 1, 3: 2}
    for sb in range(SBLIMIT_A):
        if alloc_idx[sb]:
            for v in scf[sb][: n_scf[scfsi[sb]]]:
                if not 0 <= v <= 62:
                    raise ValueError("scalefactor index out of range")
                w.put(v, 6)
    for blk in range(12):  # 12 triplets of granules
        for sb in range(SBLIMIT_A):
            if not alloc_idx[sb]:
                continue
            _, ladder = _b2a_row(sb)
            steps = ladder[alloc_idx[sb] - 1]
            s0 = samples[3 * blk][sb]
            s1 = samples[3 * blk + 1][sb]
            s2 = samples[3 * blk + 2][sb]
            if max(s0, s1, s2) >= steps:
                raise ValueError("sample code >= steps")
            if steps in GROUPED:
                w.put(s0 + steps * s1 + steps * steps * s2,
                      GROUPED[steps])
            else:
                nb = _sample_bits(steps)
                w.put(s0, nb)
                w.put(s1, nb)
                w.put(s2, nb)
    body = w.done()
    n_bytes = 144 * BITRATES_L2[bitrate_idx] * 1000 // SAMPLE_RATES[fs_idx]
    if 4 + len(body) > n_bytes:
        raise ValueError(
            f"frame body {len(body)}B exceeds capacity {n_bytes - 4}B — "
            "lower the allocation"
        )
    return _header(2, bitrate_idx, fs_idx) + body + bytes(
        n_bytes - 4 - len(body)
    )


def parse_mpeg_frames(payload: bytes) -> list[dict]:
    """Walk every frame in `payload`: header validation + the full
    Layer I / Layer II (table B.2a) bit layout. Returns per frame
    {"layer", "sample_rate", "bitrate_kbps", "bitalloc"/"alloc_steps",
    "scf", "samples"} with samples as integer quantized codes
    (samples[granule][subband]; unallocated subbands read 0)."""
    frames: list[dict] = []
    pos = 0
    while pos + 4 <= len(payload):
        (word,) = struct.unpack_from(">I", payload, pos)
        if word >> 21 != 0x7FF:
            raise ValueError(f"lost sync at byte {pos}")
        version = (word >> 19) & 0b11
        if version != 0b11:
            raise ValueError("only MPEG-1 (version '11') is in scope")
        layer_bits = (word >> 17) & 0b11
        if layer_bits == 0b01:
            raise ValueError(
                "Layer III is out of scope by name (Huffman + hybrid "
                "filterbank)"
            )
        if layer_bits == 0b00:
            raise ValueError("reserved layer bits")
        layer = 1 if layer_bits == 0b11 else 2
        protection = (word >> 16) & 1
        bitrate_idx = (word >> 12) & 0xF
        fs_idx = (word >> 10) & 0b11
        padding = (word >> 9) & 1
        mode = (word >> 6) & 0b11
        if mode != 0b11:
            raise ValueError("stereo modes are out of scope by name")
        if fs_idx == 0b11:
            raise ValueError("reserved sampling-frequency index")
        table = BITRATES_L1 if layer == 1 else BITRATES_L2
        if bitrate_idx in (0, 15):
            raise ValueError("free-format/forbidden bitrate out of scope")
        bitrate = table[bitrate_idx]
        fs = SAMPLE_RATES[fs_idx]
        if layer == 1:
            n_bytes = 4 * (12 * bitrate * 1000 // fs + padding)
        else:
            n_bytes = 144 * bitrate * 1000 // fs + padding
        if pos + n_bytes > len(payload):
            raise ValueError("frame extends past end of payload")
        body = payload[pos + 4 : pos + n_bytes]
        if not protection:
            body = body[2:]  # CRC present: skipped, not verified (doc)
        r = _BitReader(body)
        if layer == 1:
            bitalloc = []
            for _ in range(32):
                a = r.get(4)
                if a == 15:
                    raise ValueError("Layer I allocation 15 is forbidden")
                bitalloc.append(0 if a == 0 else a + 1)
            scf = [0] * 32
            for sb in range(32):
                if bitalloc[sb]:
                    scf[sb] = r.get(6)
                    if scf[sb] == 63:
                        raise ValueError("scalefactor index 63 reserved")
            samples = [[0] * 32 for _ in range(12)]
            for g in range(12):
                for sb in range(32):
                    if bitalloc[sb]:
                        samples[g][sb] = r.get(bitalloc[sb])
            frames.append(
                {
                    "layer": 1,
                    "sample_rate": fs,
                    "bitrate_kbps": bitrate,
                    "bitalloc": bitalloc,
                    "scf": scf,
                    "samples": samples,
                }
            )
        else:
            # table selection (spec 2.4.2.3): the implemented cell is
            # 3-B.2a — 44.1/48/32 kHz at >= 56 kbps mono
            if bitrate < 56:
                raise ValueError(
                    "Layer II low-bitrate tables B.2c/d out of scope"
                )
            alloc_steps = [0] * SBLIMIT_A
            alloc_idx = [0] * SBLIMIT_A
            for sb in range(SBLIMIT_A):
                nbal, ladder = _b2a_row(sb)
                idx = r.get(nbal)
                alloc_idx[sb] = idx
                if idx:
                    alloc_steps[sb] = ladder[idx - 1]
            scfsi = [0] * SBLIMIT_A
            for sb in range(SBLIMIT_A):
                if alloc_idx[sb]:
                    scfsi[sb] = r.get(2)
            n_scf = {0: 3, 1: 2, 2: 1, 3: 2}
            scf2: list[list[int]] = [[] for _ in range(SBLIMIT_A)]
            for sb in range(SBLIMIT_A):
                if alloc_idx[sb]:
                    for _ in range(n_scf[scfsi[sb]]):
                        v = r.get(6)
                        if v == 63:
                            raise ValueError(
                                "scalefactor index 63 reserved"
                            )
                        scf2[sb].append(v)
            samples = [[0] * SBLIMIT_A for _ in range(36)]
            for blk in range(12):
                for sb in range(SBLIMIT_A):
                    steps = alloc_steps[sb]
                    if not steps:
                        continue
                    if steps in GROUPED:
                        c = r.get(GROUPED[steps])
                        samples[3 * blk][sb] = c % steps
                        samples[3 * blk + 1][sb] = (c // steps) % steps
                        samples[3 * blk + 2][sb] = (
                            c // (steps * steps)
                        ) % steps
                    else:
                        nb = _sample_bits(steps)
                        for i in range(3):
                            samples[3 * blk + i][sb] = r.get(nb)
            frames.append(
                {
                    "layer": 2,
                    "sample_rate": fs,
                    "bitrate_kbps": bitrate,
                    "alloc_steps": alloc_steps,
                    "scfsi": scfsi,
                    "scf": scf2,
                    "samples": samples,
                }
            )
        pos += n_bytes
    if not frames:
        raise ValueError("no MPEG audio frame in payload")
    return frames


# --- deterministic fixtures (the oracle replays these arithmetically) -----


def _l1_alloc(doc_id: int, sb: int) -> int:
    """Layer I nb for (doc, subband): 0 for every 3rd subband, else
    2..10 bits — small enough that 32 allocated subbands fit the
    448 kbps frame."""
    if (doc_id + sb) % 3 == 0:
        return 0
    return 2 + (doc_id + sb) % 9


def _l1_scf(doc_id: int, sb: int) -> int:
    return (doc_id * 5 + sb * 7) % 63


def _l1_sample(doc_id: int, f: int, g: int, sb: int, nb: int) -> int:
    return (doc_id * 7919 + f * 524287 + g * 104729 + sb * 131) % (1 << nb)


def synth_mp1(doc_id: int) -> bytes:
    """1 + doc_id % 3 Layer I frames, 448 kbps / 32 kHz mono."""
    out = bytearray()
    for f in range(1 + doc_id % 3):
        bitalloc = [_l1_alloc(doc_id, sb) for sb in range(32)]
        scf = [_l1_scf(doc_id, sb) for sb in range(32)]
        samples = [
            [
                _l1_sample(doc_id, f, g, sb, bitalloc[sb])
                if bitalloc[sb]
                else 0
                for sb in range(32)
            ]
            for g in range(12)
        ]
        out += encode_layer1_frame(bitalloc, scf, samples)
    return bytes(out)


def _l2_alloc_idx(doc_id: int, sb: int) -> int:
    """Ladder index for (doc, subband): every 4th subband silent; the
    rest walk low ladder rungs so grouped (3/5/9) AND ungrouped codes
    both occur in every doc; budget stays under the 192 kbps frame."""
    if (doc_id + sb) % 4 == 0:
        return 0
    _, ladder = _b2a_row(sb)
    return 1 + (doc_id + sb) % min(5, len(ladder))


def _l2_scfsi(doc_id: int, sb: int) -> int:
    return (doc_id + sb) % 4


def _l2_scf(doc_id: int, sb: int, part: int) -> int:
    return (doc_id * 5 + sb * 7 + part * 11) % 63


def _l2_sample(doc_id: int, f: int, g: int, sb: int, steps: int) -> int:
    return (doc_id * 7919 + f * 524287 + g * 104729 + sb * 131) % steps


def synth_mp2(doc_id: int) -> bytes:
    """1 + doc_id % 3 Layer II frames, 192 kbps / 44.1 kHz mono,
    table 3-B.2a."""
    out = bytearray()
    n_scf = {0: 3, 1: 2, 2: 1, 3: 2}
    for f in range(1 + doc_id % 3):
        alloc_idx = [_l2_alloc_idx(doc_id, sb) for sb in range(SBLIMIT_A)]
        scfsi = [_l2_scfsi(doc_id, sb) for sb in range(SBLIMIT_A)]
        scf = [
            [
                _l2_scf(doc_id, sb, p)
                for p in range(n_scf[scfsi[sb]])
            ]
            for sb in range(SBLIMIT_A)
        ]
        samples = []
        for g in range(36):
            row = []
            for sb in range(SBLIMIT_A):
                idx = alloc_idx[sb]
                if idx:
                    _, ladder = _b2a_row(sb)
                    row.append(
                        _l2_sample(doc_id, f, g, sb, ladder[idx - 1])
                    )
                else:
                    row.append(0)
            samples.append(row)
        out += encode_layer2_frame(alloc_idx, scfsi, scf, samples)
    return bytes(out)


def parse_mpeg_audio_features(payload: bytes) -> dict:
    """Integer features over the really-parsed subband codes: counts,
    scalefactor sum, sample sum, and the (f+1)·(g·SB+sb)-position-
    weighted checksum that makes frame order, granule order, and
    subband alignment value-visible."""
    frames = parse_mpeg_frames(payload)
    layer = frames[0]["layer"]
    sb_n = 32 if layer == 1 else SBLIMIT_A
    n_alloc = scf_sum = s_sum = checksum = 0
    for f, fr in enumerate(frames):
        alloc = fr["bitalloc"] if layer == 1 else fr["alloc_steps"]
        n_alloc += sum(1 for a in alloc if a)
        if layer == 1:
            scf_sum += sum(
                fr["scf"][sb] for sb in range(sb_n) if alloc[sb]
            )
        else:
            scf_sum += sum(sum(v) for v in fr["scf"])
        for g, row in enumerate(fr["samples"]):
            for sb in range(sb_n):
                s = row[sb]
                s_sum += s
                checksum += (f + 1) * (g * sb_n + sb) * s
    return {
        "layer": layer,
        "n_frames": len(frames),
        "sample_rate": frames[0]["sample_rate"],
        "bitrate_kbps": frames[0]["bitrate_kbps"],
        "n_alloc": n_alloc,
        "scf_sum": scf_sum,
        "sample_sum": s_sum,
        "px_checksum": checksum,
    }
