"""WebP VP8L decoder tests (r7): encoder↔decoder roundtrips, then
hand-crafted bitstreams driving the decoder paths the deterministic
encoder doesn't use — LZ77 backrefs through the 2D distance map, the
color cache, color-indexing with sub-byte bundling, the predictor
transform, meta prefix groups — plus typed-error and mutation-fuzz
containment. Stream builders reuse the module's own bit-writer
primitives; expectations are computed from the spec by hand."""

import random
import struct

import pytest

from html5ever_elixir_spark.operators.multimodal import (
    CorruptRasterError,
    _decode_raster,
    _decode_webp,
    _Vp8lWriter,
    _vp8l_write_8bit_code,
    _vp8l_write_simple,
    encode_webp_vp8l,
)


def _container(body: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw: _Vp8lWriter, w: int, h: int):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _write_lengths(bw: _Vp8lWriter, lengths: dict[int, int], alphabet: int):
    """Emit a normal prefix code whose symbol lengths are ``lengths``
    (1 or 2 only, keeping the code-length code fixed at
    {1:2, 2:2, 17:2, 18:2} → canonical 1='00' 2='01' 17='10' 18='11')."""
    assert all(v in (1, 2) for v in lengths.values())
    bw.write(0, 1)  # not simple
    bw.write(5 - 4, 4)  # order (17, 18, 0, 1, 2)
    for sym in (17, 18, 0, 1, 2):
        bw.write(2 if sym in (17, 18, 1, 2) else 0, 3)
    bw.write(0, 1)  # no cap
    cl = {1: 0b00, 2: 0b01}
    pos = 0
    for sym in sorted(lengths):
        gap = sym - pos
        while gap:  # zeros via 17 (3-10) / 18 (11-138)
            if gap > 138:
                take = 138
            elif gap >= 11:
                take = gap
            elif gap >= 3:
                take = gap
            else:  # 1-2 zeros: must borrow from a larger run upstream
                raise AssertionError("gap too small for repeat codes")
            if take >= 11:
                bw.write_code(0b11, 2)
                bw.write(take - 11, 7)
            else:
                bw.write_code(0b10, 2)
                bw.write(take - 3, 3)
            gap -= take
        bw.write_code(cl[lengths[sym]], 2)
        pos = sym + 1
    tail = alphabet - pos
    while tail:
        take = min(138, tail)
        if take >= 11:
            bw.write_code(0b11, 2)
            bw.write(take - 11, 7)
        else:
            bw.write_code(0b10, 2)
            bw.write(take - 3, 3)
        tail -= take


def _write_simple2(bw: _Vp8lWriter, s0: int, s1: int):
    bw.write(1, 1)
    bw.write(1, 1)  # two symbols
    bw.write(1, 1)  # first in 8 bits
    bw.write(s0, 8)
    bw.write(s1, 8)


def test_roundtrip_text_payloads():
    rnd = random.Random(7)
    cases = [
        bytes(range(256)),
        b"\x00" * 40,
        b"The quick brown fox",
        bytes(rnd.randrange(256) for _ in range(999)),
    ]
    for data in cases:
        for sg in (False, True):
            webp = encode_webp_vp8l(data, len(data), 1, subtract_green=sg)
            w, h, px = _decode_raster(webp)
            assert (w, h) == (len(data), 1)
            assert bytes(px) == data


def test_roundtrip_2d():
    img = bytes((x * 7 + y * 13) % 256 for y in range(6) for x in range(11))
    webp = encode_webp_vp8l(img, 11, 6, subtract_green=True)
    assert bytes(_decode_webp(webp)[2]) == img


def test_lz77_backref_and_distance_map():
    # 1x10 image: literal A, literal B, then one backref of length 8 at
    # distance 2 (via 2D map entry (2,0) = code 6) -> ABABABABAB
    A, B = 0, 255
    bw = _Vp8lWriter()
    _header(bw, 10, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green: A len2, B len2, symbol 261 (length prefix code 5) len1
    _write_lengths(bw, {A: 2, B: 2, 261: 1}, 280)
    _vp8l_write_simple(bw, 0)  # red = 0
    _vp8l_write_simple(bw, 0)  # blue = 0
    _vp8l_write_simple(bw, 255)  # alpha
    _vp8l_write_simple(bw, 4)  # distance prefix code 4 (values 5-6)
    # canonical: 261 -> '0'; A=0 -> '10'; B=255 -> '11'
    bw.write_code(0b10, 2)  # A
    bw.write_code(0b11, 2)  # B
    bw.write_code(0b0, 1)  # length symbol 261: prefix 5 -> 7 + extra
    bw.write(1, 1)  # extra bit -> length 8
    bw.write(1, 1)  # distance extra bit -> value 6 -> map (2,0) -> 2
    w, h, px = _decode_webp(_container(b"\x2f" + bw.bytes()))
    lum = lambda g: (g * 587) // 1000
    assert (w, h) == (10, 1)
    assert px == [lum(A), lum(B)] * 5


def test_color_cache_hit():
    # literal green=71 (inserted into a 4-entry cache), then a cache
    # symbol reproducing the identical pixel
    g, cache_bits = 71, 2
    argb = (255 << 24) | (0 << 16) | (g << 8) | 0
    key = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _Vp8lWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    _write_lengths(bw, {g: 1, 280 + key: 1}, 280 + (1 << cache_bits))
    _vp8l_write_simple(bw, 0)
    _vp8l_write_simple(bw, 0)
    _vp8l_write_simple(bw, 255)
    _vp8l_write_simple(bw, 0)
    # canonical: g=71 -> '0'; cache symbol -> '1'
    bw.write_code(0, 1)
    bw.write_code(1, 1)
    w, h, px = _decode_webp(_container(b"\x2f" + bw.bytes()))
    assert (w, h) == (2, 1) and px[0] == px[1] == (g * 587) // 1000


def test_color_indexing_bundled():
    # 2-color palette -> width_bits 3 (8 px/byte): packed byte 150 =
    # indices 0,1,1,0,1,0,0,1 LSB-first; colors black / white
    bw = _Vp8lWriter()
    _header(bw, 8, 1)
    bw.write(1, 1)  # transform present
    bw.write(3, 2)  # color indexing
    bw.write(1, 8)  # 2 colors
    # palette subimage (2x1, delta-coded): d0 = (255,0,0,0),
    # d1 = (0,255,255,255); each channel is a 2-symbol simple code
    bw.write(0, 1)  # palette image: no color cache
    _write_simple2(bw, 0, 255)  # green: d0=0, d1=255
    _write_simple2(bw, 0, 255)  # red
    _write_simple2(bw, 0, 255)  # blue
    _write_simple2(bw, 0, 255)  # alpha: d0=255, d1=0
    _vp8l_write_simple(bw, 0)  # distance
    # canonical 2-symbol: 0 -> '0', 255 -> '1'; order G,R,B,A per pixel
    for gg, rr, bb, aa in ((0, 0, 0, 1), (1, 1, 1, 0)):
        bw.write_code(gg, 1)
        bw.write_code(rr, 1)
        bw.write_code(bb, 1)
        bw.write_code(aa, 1)
    bw.write(0, 1)  # no more transforms
    # main (packed) image: 1x1, green byte = 150
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _vp8l_write_simple(bw, 150)  # green
    _vp8l_write_simple(bw, 0)
    _vp8l_write_simple(bw, 0)
    _vp8l_write_simple(bw, 255)
    _vp8l_write_simple(bw, 0)
    w, h, px = _decode_webp(_container(b"\x2f" + bw.bytes()))
    assert (w, h) == (8, 1)
    assert px == [0, 255, 255, 0, 255, 0, 0, 255]


def test_predictor_transform():
    # 4x2 gray image through predictor mode 2 (T); row 0 uses the
    # spec-forced L chain, (0,0) the black pixel
    vals = [10, 30, 25, 200, 14, 40, 90, 199]
    res = []
    for y in range(2):
        for x in range(4):
            v = vals[y * 4 + x]
            if x == 0 and y == 0:
                # predicted = black 0xFF000000: green residual = v,
                # alpha residual = 255 - 255 = 0
                res.append((v, 0))
            elif y == 0:
                res.append(((v - vals[x - 1]) % 256, 0))
            else:
                res.append(((v - vals[(y - 1) * 4 + x]) % 256, 0))
    bw = _Vp8lWriter()
    _header(bw, 4, 2)
    bw.write(1, 1)
    bw.write(0, 2)  # predictor transform
    bw.write(1, 3)  # size_bits = 3 -> one 8x8 block covers all
    # predictor subimage 1x1: green = mode 2
    bw.write(0, 1)  # no cache
    _vp8l_write_simple(bw, 2)  # green = predictor mode
    _vp8l_write_simple(bw, 0)
    _vp8l_write_simple(bw, 0)
    _vp8l_write_simple(bw, 0)
    _vp8l_write_simple(bw, 0)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _vp8l_write_8bit_code(bw, tail_zeros=24)  # green residuals
    _vp8l_write_8bit_code(bw)  # red residuals (same bytes)
    _vp8l_write_8bit_code(bw)  # blue residuals
    _write_simple2(bw, 0, 1)  # alpha residual: 1 at origin, 0 after
    _vp8l_write_simple(bw, 0)
    for rv, ares in res:
        bw.write_code(rv, 8)  # green
        bw.write_code(rv, 8)  # red
        bw.write_code(rv, 8)  # blue
        bw.write_code(1 if ares else 0, 1)  # alpha: '1'->255? canonical
    w, h, px = _decode_webp(_container(b"\x2f" + bw.bytes()))
    assert (w, h) == (4, 2)
    assert px == vals


def test_meta_prefix_groups():
    # 1x8 with huffman_bits=2: two meta blocks, group 0 paints 100,
    # group 1 paints 200 (all channels equal -> luma == value)
    bw = _Vp8lWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix image present
    bw.write(0, 3)  # huffman_bits = 2
    # meta image 2x1: green = group id (R=0)
    bw.write(0, 1)  # no cache
    _write_simple2(bw, 0, 1)  # green: gid 0 / 1
    _vp8l_write_simple(bw, 0)
    _vp8l_write_simple(bw, 0)
    _vp8l_write_simple(bw, 255)
    _vp8l_write_simple(bw, 0)
    bw.write_code(0, 1)  # block 0 -> gid 0
    bw.write_code(1, 1)  # block 1 -> gid 1
    for c in (100, 200):  # two huffman groups, constant color c
        _vp8l_write_simple(bw, c)  # green
        _vp8l_write_simple(bw, c)  # red
        _vp8l_write_simple(bw, c)  # blue
        _vp8l_write_simple(bw, 255)
        _vp8l_write_simple(bw, 0)
    # all five codes are 0-bit: the pixel stream consumes no bits
    w, h, px = _decode_webp(_container(b"\x2f" + bw.bytes()))
    assert (w, h) == (8, 1)
    assert px == [100] * 4 + [200] * 4


def test_typed_errors():
    with pytest.raises(CorruptRasterError, match="lossy"):
        _decode_webp(b"RIFF\x00\x00\x00\x00WEBPVP8 \x02\x00\x00\x00ab")
    with pytest.raises(CorruptRasterError, match="animated"):
        _decode_webp(b"RIFF\x00\x00\x00\x00WEBPANMF\x02\x00\x00\x00ab")
    with pytest.raises(CorruptRasterError, match="no VP8L"):
        _decode_webp(b"RIFF\x00\x00\x00\x00WEBPMETA\x02\x00\x00\x00ab")
    with pytest.raises(CorruptRasterError, match="signature"):
        _decode_webp(_container(b"\x00abc"))
    with pytest.raises(CorruptRasterError, match="truncated"):
        _decode_webp(b"RIFF\x00\x00\x00\x00WEBPVP8L\xff\x00\x00\x00ab")
    # dispatch recognizes the magic (CorruptRasterError, not ValueError)
    with pytest.raises(CorruptRasterError):
        _decode_raster(b"RIFF1234WEBP")


def test_mutation_fuzz_containment():
    rnd = random.Random(99)
    base = encode_webp_vp8l(b"some text to mutate over " * 4, 100, 1)
    ok = err = 0
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(rnd.randrange(1, 4)):
            buf[rnd.randrange(12, len(buf))] = rnd.randrange(256)
        try:
            w, h, px = _decode_webp(bytes(buf))
            assert len(px) == w * h
            ok += 1
        except (CorruptRasterError, ValueError):
            err += 1
    assert ok + err == 300 and err > 0


def test_encoder_guards():
    with pytest.raises(ValueError, match="14 bits"):
        encode_webp_vp8l(bytes(20000), 20000, 1)
    with pytest.raises(ValueError, match="pixel count"):
        encode_webp_vp8l(b"abc", 2, 1)
