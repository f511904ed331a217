"""Multimodal operator tests: the audio path is REAL (RIFF/PCM16
encode + parse in pure stdlib) unlike the image/video stubs, so its
parser is tested like a parser."""

from __future__ import annotations


def test_wav_parser_is_a_real_parser():
    """The audio path must actually parse RIFF — reject non-WAV bytes,
    tolerate extra chunks before fmt/data (per spec), and notice payload
    corruption (a flipped sample byte changes the exact features)."""
    import struct

    import pytest

    from kstreams_spark.operators.multimodal import parse_wav, synth_wav

    wav = synth_wav(7, 123)
    base = parse_wav(wav)
    assert base["sample_rate"] == 16000 and base["n_samples"] == (123 % 100) + 50

    with pytest.raises(ValueError, match="RIFF"):
        parse_wav(b"not audio at all")
    with pytest.raises(ValueError, match="missing fmt"):
        parse_wav(wav[:12])  # magic only, no chunks

    # extra LIST chunk between WAVE magic and fmt must be skipped
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    padded = wav[:12] + extra + wav[12:]
    assert parse_wav(padded) == base

    # flip one sample byte: checksum/sum_sq must change (real decode,
    # not metadata-derived fakes)
    corrupt = bytearray(wav)
    corrupt[-1] ^= 0x40
    got = parse_wav(bytes(corrupt))
    assert got["n_samples"] == base["n_samples"]
    assert got["checksum"] != base["checksum"]


def test_bmp_parser_is_a_real_parser():
    """BMP path: reject non-BMP, honor the declared pixel-data offset
    (extra bytes between header and pixels must be skipped), and detect
    a corrupted pixel byte. Row order is position-weighted into
    px_checksum, so a top-down misread cannot hash-match the oracle."""
    import struct

    import pytest

    from kstreams_spark.operators.multimodal import parse_bmp, synth_bmp

    bmp = synth_bmp(3)
    base = parse_bmp(bmp)
    assert (base["width"], base["height"]) == (5 + 3 % 6, 4 + 3 % 3)

    with pytest.raises(ValueError, match="not a BMP"):
        parse_bmp(b"PNG?" + bmp[4:])
    with pytest.raises(ValueError, match="truncated"):
        parse_bmp(bmp[:-4])

    # gap between headers and pixels: parser must honor the offset field
    gap = b"\xee" * 6
    moved = bytearray(bmp[:54] + gap + bmp[54:])
    struct.pack_into("<I", moved, 10, 54 + len(gap))
    struct.pack_into("<I", moved, 2, len(moved))
    assert parse_bmp(bytes(moved)) == base

    corrupt = bytearray(bmp)
    corrupt[-2] ^= 0x10  # a pixel byte in the top image row
    assert parse_bmp(bytes(corrupt)) != base


def test_bmp_resize_roundtrip():
    """resize_bmp_half: the resized file is itself a valid BMP whose
    pixels are exactly the source's even-coordinate pixels (nearest
    neighbor), including odd source dimensions (ceiling halving)."""
    from kstreams_spark.operators.multimodal import (
        bmp_pixel_grid,
        resize_bmp_half,
        synth_bmp,
    )

    for doc_id in (0, 2, 4):  # covers odd/even width and height mixes
        src = bmp_pixel_grid(synth_bmp(doc_id))
        small = bmp_pixel_grid(resize_bmp_half(synth_bmp(doc_id)))
        assert len(small) == (len(src) + 1) // 2
        assert len(small[0]) == (len(src[0]) + 1) // 2
        for y, row in enumerate(small):
            for x, px in enumerate(row):
                assert px == src[2 * y][2 * x], (doc_id, x, y)


def test_avi_parser_is_a_real_parser():
    """AVI path: reject non-AVI, cross-check the header's declared frame
    count against the movi content, and make frame order value-visible
    (swapping two frames changes the (f+1)-weighted checksum)."""
    import struct

    import pytest

    from kstreams_spark.operators.multimodal import parse_avi, synth_avi

    avi = synth_avi(5)
    base = parse_avi(avi)
    assert base["n_frames"] == 2 + 5 % 3

    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"RIFF" + avi[4:8] + b"WAVE" + avi[12:])

    # drop the last movi frame: header/content mismatch must be caught
    idx = avi.rfind(b"00db")
    truncated = bytearray(avi[:idx])
    # (RIFF/LIST sizes now overstate, but frame-count check fires first)
    with pytest.raises(ValueError, match="frame count mismatch"):
        parse_avi(bytes(truncated))

    # swap the two frames' payloads: same pixels, different order ->
    # checksum must differ (a real per-frame decode, not a global sum)
    i1 = avi.find(b"00db")
    (sz,) = struct.unpack_from("<I", avi, i1 + 4)
    i2 = avi.find(b"00db", i1 + 8 + sz)
    f1 = avi[i1 + 8 : i1 + 8 + sz]
    f2 = avi[i2 + 8 : i2 + 8 + sz]
    swapped = avi[: i1 + 8] + f2 + avi[i1 + 8 + sz : i2 + 8] + f1 + avi[i2 + 8 + sz :]
    got = parse_avi(swapped)
    assert got["sum_r"] == base["sum_r"]  # same pixel multiset
    assert got["px_checksum"] != base["px_checksum"]  # order observed


def test_wav_downsample_roundtrip():
    """downsample_wav_half: the output is itself a valid WAV at half the
    rate whose samples are exactly the source's even-index samples."""
    from kstreams_spark.operators.multimodal import (
        downsample_wav_half,
        synth_wav,
        wav_pcm,
    )

    for doc_id, nb in ((1, 77), (2, 100)):  # odd and even sample counts
        sr, src = wav_pcm(synth_wav(doc_id, nb))
        sr2, small = wav_pcm(downsample_wav_half(synth_wav(doc_id, nb)))
        assert sr2 == sr // 2
        assert small == src[::2]


def test_avi_resize_roundtrip():
    """resize_avi_half: valid AVI out, frame count preserved, every
    frame's pixels are exactly the source frame's even-coordinate
    pixels."""
    from kstreams_spark.operators.multimodal import (
        avi_frame_grids,
        resize_avi_half,
        synth_avi,
    )

    for doc_id in (0, 4):
        _, src = avi_frame_grids(synth_avi(doc_id))
        _, small = avi_frame_grids(resize_avi_half(synth_avi(doc_id)))
        assert len(small) == len(src)
        for f, grid in enumerate(small):
            assert len(grid) == (len(src[f]) + 1) // 2
            assert len(grid[0]) == (len(src[f][0]) + 1) // 2
            for y, row in enumerate(grid):
                for x, px in enumerate(row):
                    assert px == src[f][2 * y][2 * x], (doc_id, f, x, y)


def test_g711_expansion_matches_spec_golden_values():
    """r14: G.711 µ-law/A-law byte→linear expansion against golden
    values from the ITU-T G.711 tables (Sun/CCITT reference
    convention): code extremes, segment boundaries, and the
    sign symmetry both laws guarantee."""
    from kstreams_spark.operators.multimodal import (
        _alaw_to_linear,
        _ulaw_to_linear,
    )

    # µ-law: 0x80/0x00 are the +/- extremes; 0xFF/0x7F decode to 0
    assert _ulaw_to_linear(0x80) == 32124
    assert _ulaw_to_linear(0x00) == -32124
    assert _ulaw_to_linear(0xFF) == 0
    assert _ulaw_to_linear(0x7F) == 0
    # sign symmetry: code and code^0x80 are exact negatives
    assert all(
        _ulaw_to_linear(b) == -_ulaw_to_linear(b ^ 0x80)
        for b in range(256)
    )
    # A-law: extremes and the segment-0/1 boundary values
    assert _alaw_to_linear(0xAA) == 32256  # 0xAA ^ 0x55 = 0xFF: max +
    assert _alaw_to_linear(0x2A) == -32256
    assert _alaw_to_linear(0xD5) == 8  # 0xD5 ^ 0x55 = 0x80: smallest +
    assert _alaw_to_linear(0x55) == -8
    assert all(
        _alaw_to_linear(b) == -_alaw_to_linear(b ^ 0x80)
        for b in range(256)
    )


def test_g711_wav_roundtrip_through_parser():
    """The fixture's G.711 RIFF files parse back to the expanded
    linear features; PCM16 files still parse; a G.711 format code with
    the wrong bit depth refuses."""
    import pytest as _pytest

    from kstreams_spark.operators.multimodal import (
        _ulaw_to_linear,
        parse_wav,
        synth_wav_g711,
    )

    for doc in (0, 1, 7, 12):
        payload = synth_wav_g711(doc)
        feats = parse_wav(payload)
        n = 50 + doc % 80
        assert feats["sample_rate"] == 8000
        assert feats["n_samples"] == n
        if doc % 2 == 0:  # µ-law: replay the expansion directly
            lin = [
                _ulaw_to_linear((doc * 13 + i * 7) % 256) for i in range(n)
            ]
            assert feats["checksum"] == sum(lin)
            assert feats["peak"] == max(abs(s) for s in lin)
    # wrong bits for a G.711 format code refuses by name
    bad = bytearray(synth_wav_g711(0))
    at = bad.index(b"fmt ") + 8
    bad[at + 14] = 16  # bits field inside fmt
    with _pytest.raises(ValueError, match="unsupported format"):
        parse_wav(bytes(bad))
