"""MPEG-1 Audio Layer I/II codec (operators/mpeg_audio.py, r15):
golden bit-level header walk, matched-pair roundtrips across the
fixture corpus, grouped-code de-grouping, and the named reject
surface (Layer III, stereo, free-format, forbidden fields)."""

from __future__ import annotations


import pytest

from kstreams_spark.operators.mpeg_audio import (
    GROUPED,
    SBLIMIT_A,
    _b2a_row,
    encode_layer1_frame,
    encode_layer2_frame,
    parse_mpeg_audio_features,
    parse_mpeg_frames,
    synth_mp1,
    synth_mp2,
)


def test_header_golden_bits():
    """Hand-assembled header word: 448 kbps / 32 kHz Layer I mono =
    FF FF E8 C0 — sync 11111111111, version '11', layer '11',
    protection '1' (first two bytes all ones), then bitrate 1110 +
    fs 10 + padding 0 + private 0 = 0xE8, mode '11' single_channel in
    the top bits of the last byte = 0xC0."""
    frame = encode_layer1_frame(
        [0] * 31 + [2], [0] * 32, [[0] * 32 for _ in range(12)]
    )
    assert frame[:4] == bytes.fromhex("FFFFE8C0")
    # frame length = 4 * (12 * 448000 / 32000) = 672 bytes
    assert len(frame) == 672


def test_layer1_roundtrip_golden_samples():
    bitalloc = [0] * 32
    bitalloc[0], bitalloc[5], bitalloc[31] = 2, 7, 15
    scf = [0] * 32
    scf[0], scf[5], scf[31] = 1, 33, 62
    samples = [[0] * 32 for _ in range(12)]
    samples[0][0] = 3          # 2-bit max
    samples[11][5] = 127       # 7-bit max
    samples[6][31] = 32767     # 15-bit max
    fr = parse_mpeg_frames(
        encode_layer1_frame(bitalloc, scf, samples)
    )[0]
    assert fr["bitalloc"] == bitalloc and fr["scf"] == scf
    assert fr["samples"] == samples
    assert (fr["sample_rate"], fr["bitrate_kbps"]) == (32000, 448)


def test_layer2_grouping_degroups_exactly():
    """A 3-level subband packs three samples into one 5-bit code —
    decode must return them in granule order."""
    alloc_idx = [0] * SBLIMIT_A
    alloc_idx[23] = 1  # class D rung 1 -> steps 3 (grouped)
    alloc_idx[0] = 2   # class A rung 2 -> steps 7 (ungrouped, 3 bits)
    scfsi = [0] * SBLIMIT_A
    scf = [[0, 0, 0] for _ in range(SBLIMIT_A)]
    samples = [[0] * SBLIMIT_A for _ in range(36)]
    samples[0][23], samples[1][23], samples[2][23] = 2, 0, 1
    samples[33][0], samples[34][0], samples[35][0] = 6, 1, 5
    fr = parse_mpeg_frames(
        encode_layer2_frame(alloc_idx, scfsi, scf, samples)
    )[0]
    assert fr["samples"] == samples
    assert fr["alloc_steps"][23] == 3 and fr["alloc_steps"][0] == 7


def test_layer2_scfsi_counts():
    """scfsi 0/1/2/3 carry 3/2/1/2 scalefactors — a wrong count shifts
    every later bit field, so parse equality pins it."""
    alloc_idx = [0] * SBLIMIT_A
    scfsi = [0] * SBLIMIT_A
    scf = [[] for _ in range(SBLIMIT_A)]
    for sb, si in ((0, 0), (1, 1), (2, 2), (3, 3)):
        alloc_idx[sb] = 1
        scfsi[sb] = si
        scf[sb] = [10 + sb, 20 + sb, 30 + sb][: {0: 3, 1: 2, 2: 1, 3: 2}[si]]
    samples = [[0] * SBLIMIT_A for _ in range(36)]
    fr = parse_mpeg_frames(
        encode_layer2_frame(alloc_idx, scfsi, scf, samples)
    )[0]
    assert fr["scfsi"][:4] == [0, 1, 2, 3]
    assert [fr["scf"][sb] for sb in range(4)] == [
        [10, 20, 30], [11, 21], [12], [13, 23]
    ]


def test_fixture_corpus_roundtrips_and_multiframe():
    for d in range(16):
        f1 = parse_mpeg_audio_features(synth_mp1(d))
        f2 = parse_mpeg_audio_features(synth_mp2(d))
        assert f1["n_frames"] == f2["n_frames"] == 1 + d % 3
        assert f1["layer"] == 1 and f2["layer"] == 2
        # every doc exercises grouped AND ungrouped Layer II codes
        frames = parse_mpeg_frames(synth_mp2(d))
        steps = {s for fr in frames for s in fr["alloc_steps"] if s}
        assert steps & set(GROUPED) and steps - set(GROUPED)


def test_reject_surface_by_name():
    good = synth_mp1(1)
    # Layer III: layer bits '01'
    ba = bytearray(good)
    ba[1] = (ba[1] & ~0b110) | 0b010
    with pytest.raises(ValueError, match="Layer III"):
        parse_mpeg_frames(bytes(ba))
    # stereo mode '00'
    ba = bytearray(good)
    ba[3] = ba[3] & ~0xC0
    with pytest.raises(ValueError, match="stereo"):
        parse_mpeg_frames(bytes(ba))
    # free-format bitrate (index 0)
    ba = bytearray(good)
    ba[2] = ba[2] & 0x0F
    with pytest.raises(ValueError, match="free-format"):
        parse_mpeg_frames(bytes(ba))
    # lost sync
    with pytest.raises(ValueError, match="lost sync"):
        parse_mpeg_frames(b"\x00\x00\x00\x00")
    # MPEG-2 (version '10')
    ba = bytearray(good)
    ba[1] = ba[1] & ~0b1000
    with pytest.raises(ValueError, match="MPEG-1"):
        parse_mpeg_frames(bytes(ba))
    # Layer I allocation 15 is forbidden
    with pytest.raises(ValueError, match="out of range"):
        encode_layer1_frame(
            [16] + [0] * 31, [0] * 32, [[0] * 32 for _ in range(12)]
        )
    # truncated frame (mid-frame cut; a clean frame-boundary cut is a
    # legal shorter stream)
    with pytest.raises(ValueError, match="past end"):
        parse_mpeg_frames(good[:100])


def test_b2a_table_shape():
    """The entered table's structural invariants: nbal by class, every
    ungrouped rung is 2^k - 1, grouped rungs are exactly {3, 5, 9}."""
    for sb in range(SBLIMIT_A):
        nbal, ladder = _b2a_row(sb)
        assert nbal == (4 if sb < 11 else 3 if sb < 23 else 2)
        assert len(ladder) == (1 << nbal) - 1
        for s in ladder:
            assert s in GROUPED or (s + 1) & s == 0  # 2^k - 1
