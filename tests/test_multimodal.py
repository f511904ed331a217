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
