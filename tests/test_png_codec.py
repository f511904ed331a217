"""operators/png_codec.py: the pure-stdlib PNG codec. PNG is lossless,
so every fixture must roundtrip EXACTLY (the oracle-replays-pixels
contract needs no tile trick here); the decoder's real traps —
per-row filter reconstruction for all five types, multi-IDAT
concatenation, CRC verification, ancillary-chunk skipping — each get a
structural assertion; unsupported variants fail loudly by name."""

from __future__ import annotations

import struct
import zlib

import pytest

from kstreams_spark.operators.png_codec import (
    _png_channel,
    _png_dims,
    encode_png,
    parse_png_features,
    png_pixel_grid,
    synth_png,
)


def _grid(doc_id, w, h):
    return [
        [
            tuple(_png_channel(doc_id, x, y, c) for c in (0, 1, 2))
            for x in range(w)
        ]
        for y in range(h)
    ]


def _chunks(payload):
    out, pos = [], 8
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        out.append(payload[pos + 4 : pos + 8])
        pos += 12 + length
    return out


def test_roundtrip_exact_across_docs():
    for doc_id in range(0, 40, 3):
        w, h = _png_dims(doc_id)
        assert png_pixel_grid(synth_png(doc_id)) == _grid(doc_id, w, h)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_each_filter_type_reconstructs(ftype):
    g = _grid(7, 9, 6)
    payload = encode_png(g, row_filter=lambda y: ftype)
    assert png_pixel_grid(payload) == g


def test_edge_dims_roundtrip():
    for w, h in [(1, 1), (1, 5), (5, 1), (2, 2)]:
        g = _grid(3, w, h)
        assert png_pixel_grid(encode_png(g)) == g


def test_fixture_corpus_covers_all_filters():
    """The synthesized corpus must exercise every filter type on rows
    with real content (not just row 0), or the oracle proves less than
    the docstring claims."""
    seen = set()
    for doc_id in range(20):
        _, h = _png_dims(doc_id)
        seen |= {(doc_id + y) % 5 for y in range(1, h)}
    assert seen == {0, 1, 2, 3, 4}


def test_multi_idat_and_ancillary_chunks_present_and_handled():
    payload = synth_png(11)
    kinds = _chunks(payload)
    assert kinds.count(b"IDAT") >= 2, "fixture must split the zlib stream"
    assert b"tEXt" in kinds  # ancillary chunk the decoder must skip
    assert kinds[0] == b"IHDR" and kinds[-1] == b"IEND"
    # and a single-IDAT encode of the same grid decodes identically
    w, h = _png_dims(11)
    one = encode_png(_grid(11, w, h), row_filter=lambda y: (11 + y) % 5,
                     idat_size=1 << 20)
    assert _chunks(one).count(b"IDAT") == 1
    assert png_pixel_grid(one) == png_pixel_grid(payload)


def test_crc_corruption_rejected():
    payload = bytearray(synth_png(5))
    # flip a byte inside the first IDAT's data
    idx = payload.index(b"IDAT") + 4
    payload[idx] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_pixel_grid(bytes(payload))


def test_truncation_rejected():
    payload = synth_png(5)
    with pytest.raises(ValueError):
        png_pixel_grid(payload[: len(payload) // 2])
    with pytest.raises(ValueError, match="not a PNG"):
        png_pixel_grid(b"\x89PNX" + payload[4:])


def test_unsupported_variants_named():
    # grayscale (color type 0) IHDR
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    with pytest.raises(ValueError, match="color=0"):
        png_pixel_grid(payload)
    # Adam7 interlace
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    with pytest.raises(ValueError, match="[Ii]nterlac"):
        png_pixel_grid(payload)


def test_unknown_critical_chunk_rejected():
    payload = synth_png(2)
    pos = payload.index(b"IDAT") - 4
    fake = b"XRIT"  # uppercase first letter = critical
    injected = (
        payload[:pos]
        + struct.pack(">I", 0)
        + fake
        + struct.pack(">I", zlib.crc32(fake))
        + payload[pos:]
    )
    with pytest.raises(ValueError, match="critical"):
        png_pixel_grid(injected)


def test_features_match_direct_pixel_math():
    doc_id = 13
    w, h = _png_dims(doc_id)
    feats = parse_png_features(synth_png(doc_id))
    g = _grid(doc_id, w, h)
    assert feats["width"] == w and feats["height"] == h
    assert feats["n_pixels"] == w * h
    assert feats["sum_r"] == sum(p[0] for row in g for p in row)
    assert feats["px_checksum"] == sum(
        (y * w + x) * sum(g[y][x]) for y in range(h) for x in range(w)
    )


def test_roundtrip_property_random_grids():
    """Hypothesis: ANY 8-bit RGB grid with ANY per-row filter choice
    roundtrips exactly — PNG is lossless, so this is the codec's whole
    contract in one property."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(1, 10),
        st.integers(1, 8),
        st.randoms(use_true_random=False),
    )
    def prop(w, h, rng):
        g = [
            [
                (rng.randrange(256), rng.randrange(256), rng.randrange(256))
                for _ in range(w)
            ]
            for _ in range(h)
        ]
        filters = [rng.randrange(5) for _ in range(h)]
        payload = encode_png(g, row_filter=lambda y: filters[y])
        assert png_pixel_grid(payload) == g

    prop()
