"""Pure-Python baseline JPEG decoder tests (r5 verdict ask #3).

The AC-path tests build JPEGs with an INDEPENDENT test-side encoder
(numpy FDCT + its own canonical Huffman layout), so decoder bugs can't
cancel against writer bugs the way a shared implementation would.
"""

import struct

import pytest

from html5ever_elixir_spark.operators.multimodal import (
    CorruptRasterError,
    _decode_jpeg,
    _decode_raster,
    encode_jpeg_gray_blocks,
)


def test_dc_only_roundtrip_all_values():
    vals = bytes(range(256))
    w, h, px = _decode_jpeg(encode_jpeg_gray_blocks(vals))
    assert (w, h) == (2048, 8)
    for i, v in enumerate(vals):
        for yy in (0, 3, 7):
            for xx in (0, 3, 7):
                assert px[yy * w + 8 * i + xx] == v


def test_restart_interval_roundtrip():
    vals = bytes((i * 37) % 256 for i in range(40))
    jp = encode_jpeg_gray_blocks(vals, restart_interval=7)
    assert b"\xff\xdd" in jp and b"\xff\xd0" in jp
    w, h, px = _decode_jpeg(jp)
    assert all(px[3 * w + 8 * i + 3] == v for i, v in enumerate(vals))


def test_decode_raster_dispatches_jpeg():
    w, h, px = _decode_raster(encode_jpeg_gray_blocks(b"ABC"))
    assert (w, h) == (24, 8) and px[0] == ord("A")


# -- independent encoder: numpy FDCT + general AC Huffman -------------------

def _dct_mat():
    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        cu = (0.5 ** 0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _Enc:
    """Test-side entropy encoder: every symbol gets an 8-bit canonical
    code equal to its index in the symbol list (all lengths 8 — a
    deliberately DIFFERENT table layout from the production writer)."""

    def __init__(self):
        self.data = bytearray()
        self.acc = 0
        self.nbits = 0
        self.dc_syms = list(range(12))
        self.ac_syms = sorted(
            {0x00, 0xF0} | {(r << 4) | s for r in range(16)
                            for s in range(1, 11)}
        )

    def put(self, code, k):
        self.acc = (self.acc << k) | code
        self.nbits += k
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.data.append(b)
            if b == 0xFF:
                self.data.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def dc_code(self, sym):
        self.put(self.dc_syms.index(sym), 8)

    def ac_code(self, sym):
        self.put(self.ac_syms.index(sym), 8)

    def dht(self, tc):
        syms = self.dc_syms if tc == 0 else self.ac_syms
        counts = [0] * 16
        counts[7] = len(syms)
        return (b"\xff\xc4"
                + struct.pack(">HB", 2 + 1 + 16 + len(syms), tc << 4)
                + bytes(counts) + bytes(syms))

    def block(self, coefs_zz, pred):
        dc = coefs_zz[0]
        diff = dc - pred
        t = abs(diff).bit_length()
        assert t <= 11
        self.dc_code(t)
        if t:
            self.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = max((k for k in range(1, 64) if coefs_zz[k]), default=0)
        for k in range(1, last_nz + 1):
            v = coefs_zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                self.ac_code(0xF0)
                run -= 16
            s = abs(v).bit_length()
            assert s <= 10
            self.ac_code((run << 4) | s)
            self.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            self.ac_code(0x00)
        return dc


def _encode_gray_full(pixels, w, h):
    """Full test-side grayscale encoder: real FDCT, quant all-ones."""
    import numpy as np

    m = _dct_mat()
    enc = _Enc()
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb\x00\x43\x00" + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    out += enc.dht(0) + enc.dht(1)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"
    arr = np.array(pixels, dtype=float).reshape(h, w) - 128.0
    pred = 0
    quant_blocks = []
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = arr[by : by + 8, bx : bx + 8]
            f = m @ blk @ m.T
            q = np.rint(f).astype(int)
            quant_blocks.append(q)
            zz = [int(q.flat[_ZZ[k]]) for k in range(64)]
            pred = enc.block(zz, pred)
    if enc.nbits:
        enc.put((1 << (8 - enc.nbits)) - 1, 8 - enc.nbits)
    out += enc.data
    out += b"\xff\xd9"
    return bytes(out), quant_blocks


def test_ac_path_against_numpy_idct():
    # pseudo-random pixels → FDCT has rich AC structure; the decoder's
    # reconstruction must match numpy's float IDCT of the SAME quantized
    # coefficients within 1 (independent float pipelines; ±1 covers
    # round-half ties at the ulp level)
    import numpy as np

    rng = [((i * 1103515245 + 12345) >> 8) % 256 for i in range(16 * 16)]
    jp, qblocks = _encode_gray_full(rng, 16, 16)
    w, h, px = _decode_jpeg(jp)
    assert (w, h) == (16, 16)
    m = _dct_mat()
    k = 0
    worst = 0
    for by in range(0, 16, 8):
        for bx in range(0, 16, 8):
            expect = m.T @ qblocks[k] @ m + 128.0
            k += 1
            for yy in range(8):
                for xx in range(8):
                    got = px[(by + yy) * 16 + bx + xx]
                    want = min(255, max(0, int(np.rint(expect[yy, xx]))))
                    worst = max(worst, abs(got - want))
    assert worst <= 1, worst


def test_color_420_dc_only_luma():
    # 16×16 single-MCU 4:2:0 YCbCr, every block DC-only: Y quadrants
    # carry 4 distinct values; chroma blocks must be entropy-consumed
    # without disturbing the luma output
    enc = _Enc()
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb\x00\x43\x00" + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += struct.pack(">BBB", 1, 0x22, 0)   # Y 2x2
    out += struct.pack(">BBB", 2, 0x11, 0)   # Cb
    out += struct.pack(">BBB", 3, 0x11, 0)   # Cr
    out += enc.dht(0) + enc.dht(1)
    out += (b"\xff\xda" + struct.pack(">HB", 12, 3)
            + b"\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00")
    yvals = [40, 90, 160, 220]
    # Y blocks in raster order within the MCU, then Cb, Cr
    pred = 0
    for v in yvals:
        pred = enc.block([8 * (v - 128)] + [0] * 63, pred)
    enc.block([8 * (100 - 128)] + [0] * 63, 0)
    enc.block([8 * (200 - 128)] + [0] * 63, 0)
    if enc.nbits:
        enc.put((1 << (8 - enc.nbits)) - 1, 8 - enc.nbits)
    out += enc.data
    out += b"\xff\xd9"
    w, h, px = _decode_jpeg(bytes(out))
    assert (w, h) == (16, 16)
    # quadrants: top-left 40, top-right 90, bottom-left 160, bottom-right 220
    assert px[0] == 40 and px[15] == 90
    assert px[3 * 16 + 3] == 40 and px[3 * 16 + 12] == 90
    assert px[12 * 16 + 3] == 160 and px[12 * 16 + 12] == 220
    assert px[15 * 16] == 160 and px[15 * 16 + 15] == 220


def test_unsupported_variants_are_typed_errors():
    good = encode_jpeg_gray_blocks(b"AB")
    # a baseline stream re-marked SOF2 routes into the progressive
    # player (r6), whose scan validation rejects the baseline-shaped
    # SOS (Ss=0 requires Se=0) as a typed error
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(CorruptRasterError, match="spectral"):
        _decode_jpeg(prog)
    # arithmetic coding (SOF9) stays a typed error
    with pytest.raises(CorruptRasterError, match="arithmetic"):
        _decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc9"))
    # 12-bit precision
    i = good.index(b"\xff\xc0")
    twelve = good[: i + 4] + b"\x0c" + good[i + 5 :]
    with pytest.raises(CorruptRasterError, match="precision"):
        _decode_jpeg(twelve)
    # truncated entropy stream
    with pytest.raises(CorruptRasterError):
        _decode_jpeg(good[:-20])


def test_mutation_fuzz_never_escapes_error_contract():
    # bit flips / truncations / deletions anywhere in the stream must
    # either decode or raise CorruptRasterError — never crash, hang, or
    # return wrong-sized output
    base = encode_jpeg_gray_blocks(bytes((i * 11) % 256 for i in range(20)),
                                   restart_interval=5)
    n = len(base)
    for trial in range(300):
        r = (trial * 2654435761) % (3 * n)
        if trial % 3 == 0:
            mut = base[: r % n] + base[r % n + 1 :]          # delete byte
        elif trial % 3 == 1:
            i = r % n
            mut = base[:i] + bytes([base[i] ^ (1 << (r % 8))]) + base[i + 1 :]
        else:
            mut = base[: r % n]                              # truncate
        try:
            w, h, px = _decode_jpeg(mut)
            assert len(px) == w * h
        except CorruptRasterError:
            pass


def test_jpeg_through_media_features(spark):
    from html5ever_elixir_spark.operators.multimodal import (
        extract_media_features,
    )

    jp = encode_jpeg_gray_blocks(b"Spark")
    bad = jp[:40]
    media = spark.createDataFrame(
        [(1, "image", bytearray(jp), (0, 0, "image/jpeg")),
         (2, "image", bytearray(bad), (0, 0, "image/jpeg"))],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int, height:int, mime:string>",
    )
    rows = {r.media_id: r for r in extract_media_features(media).collect()}
    assert rows[1].decode_error is None and rows[1].feature is not None
    assert rows[2].decode_error is not None and rows[2].feature is None


# -- progressive (SOF2) decode: spectral selection + successive approx ------

def _tz(v, sh):
    """Truncate toward zero (AC successive approximation semantics)."""
    return -((-v) >> sh) if v < 0 else v >> sh


def _sos(ss, se, ah, al, ncomp=1):
    if ncomp == 1:
        return (b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00"
                + bytes([ss, se, (ah << 4) | al]))
    body = bytes([ncomp]) + b"".join(
        bytes([cid, 0x00]) for cid in range(1, ncomp + 1)
    ) + bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _finish(enc):
    if enc.nbits:
        enc.put((1 << (8 - enc.nbits)) - 1, 8 - enc.nbits)
    return bytes(enc.data)


def _dc_first_scan(blocks, al):
    enc = _Enc()
    pred = 0
    for b in blocks:
        v = b[0] >> al
        diff = v - pred
        pred = v
        t = abs(diff).bit_length()
        enc.dc_code(t)
        if t:
            enc.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    return _finish(enc)


def _dc_refine_scan(blocks, al):
    enc = _Enc()
    for b in blocks:
        enc.put((b[0] >> al) & 1, 1)
    return _finish(enc)


def _ac_first_scan(blocks, ss, se, al):
    enc = _Enc()
    for b in blocks:
        r = 0
        for k in range(ss, se + 1):
            v = _tz(b[k], al)
            if v == 0:
                r += 1
                continue
            while r > 15:
                enc.ac_code(0xF0)
                r -= 16
            s = abs(v).bit_length()
            enc.ac_code((r << 4) | s)
            enc.put(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if r:
            enc.ac_code(0x00)  # EOB, eobrun=1 (this block only)
    return _finish(enc)


def _ac_refine_scan(blocks, ss, se, al):
    # T.81 G.1.2.3 emission: symbol, sign bit, then buffered correction
    # bits of nonzero-history coefficients passed over
    enc = _Enc()
    for b in blocks:
        hist = [_tz(b[k], al + 1) for k in range(64)]
        r = 0
        pending = []
        for k in range(ss, se + 1):
            bit = (abs(b[k]) >> al) & 1
            if hist[k] != 0:
                pending.append(bit)
            elif bit == 0:
                r += 1
            else:
                while r > 15:
                    enc.ac_code(0xF0)
                    for pb in pending:
                        enc.put(pb, 1)
                    pending = []
                    r -= 16
                enc.ac_code((r << 4) | 1)
                enc.put(1 if b[k] > 0 else 0, 1)
                for pb in pending:
                    enc.put(pb, 1)
                pending = []
                r = 0
        if r or pending:
            enc.ac_code(0x00)
            for pb in pending:
                enc.put(pb, 1)
    return _finish(enc)


def _encode_gray_progressive(pixels, w, h):
    """Progressive counterpart of _encode_gray_full over the SAME
    quantized coefficients: DC first(Al=1)+refine, 3 AC bands each
    first(Al=1)+refine — 8 scans total."""
    import numpy as np

    m = _dct_mat()
    arr = np.array(pixels, dtype=float).reshape(h, w) - 128.0
    blocks = []
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            q = np.rint(m @ arr[by : by + 8, bx : bx + 8] @ m.T).astype(int)
            blocks.append([int(q.flat[_ZZ[k]]) for k in range(64)])
    enc0 = _Enc()
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb\x00\x43\x00" + bytes([1] * 64)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    out += enc0.dht(0) + enc0.dht(1)
    out += _sos(0, 0, 0, 1) + _dc_first_scan(blocks, 1)
    out += _sos(0, 0, 1, 0) + _dc_refine_scan(blocks, 0)
    bands = ((1, 5), (6, 20), (21, 63))
    for ss, se in bands:
        out += _sos(ss, se, 0, 1) + _ac_first_scan(blocks, ss, se, 1)
    for ss, se in bands:
        out += _sos(ss, se, 1, 0) + _ac_refine_scan(blocks, ss, se, 0)
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_matches_baseline_decode():
    # same quantized coefficients through the baseline stream and an
    # 8-scan progressive stream must reconstruct IDENTICAL pixels
    rng = [((i * 48271 + 7) >> 4) % 256 for i in range(24 * 16)]
    base_jp, _ = _encode_gray_full(rng, 24, 16)
    prog_jp = _encode_gray_progressive(rng, 24, 16)
    bw, bh, bpx = _decode_jpeg(base_jp)
    pw, ph, ppx = _decode_jpeg(prog_jp)
    assert (bw, bh) == (pw, ph) == (24, 16)
    assert bpx == ppx


def test_progressive_dc_only_flat_blocks():
    # DC-only progressive (2 scans): flat blocks reconstruct exactly
    vals = [40, 90, 160, 220, 7, 255]
    pixels = []
    for row in range(8):
        for v in vals:
            pixels.extend([v] * 8)
    w, h = 8 * len(vals), 8
    import numpy as np

    m = _dct_mat()
    arr = np.array(pixels, dtype=float).reshape(h, w) - 128.0
    blocks = []
    for bx in range(0, w, 8):
        q = np.rint(m @ arr[0:8, bx : bx + 8] @ m.T).astype(int)
        blocks.append([int(q.flat[_ZZ[k]]) for k in range(64)])
    enc0 = _Enc()
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb\x00\x43\x00" + bytes([1] * 64)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    out += enc0.dht(0) + enc0.dht(1)
    out += _sos(0, 0, 0, 1) + _dc_first_scan(blocks, 1)
    out += _sos(0, 0, 1, 0) + _dc_refine_scan(blocks, 0)
    # AC first at full precision so the spectral bands complete
    for ss, se in ((1, 63),):
        out += _sos(ss, se, 0, 0) + _ac_first_scan(blocks, ss, se, 0)
    out += b"\xff\xd9"
    dw, dh, px = _decode_jpeg(bytes(out))
    assert (dw, dh) == (w, h)
    for i, v in enumerate(vals):
        assert px[3 * w + 8 * i + 3] == v


def test_progressive_color_interleaved_dc():
    # 3-component 4:2:0: interleaved DC scans (ns=3) + luma AC band —
    # exercises the MCU-ordered progressive branch
    enc0 = _Enc()
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb\x00\x43\x00" + bytes([1] * 64)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += struct.pack(">BBB", 1, 0x22, 0)
    out += struct.pack(">BBB", 2, 0x11, 0)
    out += struct.pack(">BBB", 3, 0x11, 0)
    out += enc0.dht(0) + enc0.dht(1)
    yvals = [40, 90, 160, 220]
    # MCU order: Y00 Y01 Y10 Y11 Cb Cr — one DC-first scan at Al=0
    enc = _Enc()
    pred = {1: 0, 2: 0, 3: 0}

    def put_dc(cid, value):
        v = 8 * (value - 128)
        diff = v - pred[cid]
        pred[cid] = v
        t = abs(diff).bit_length()
        enc.dc_code(t)
        if t:
            enc.put(diff if diff >= 0 else diff + (1 << t) - 1, t)

    for v in yvals:
        put_dc(1, v)
    put_dc(2, 100)
    put_dc(3, 200)
    out += _sos(0, 0, 0, 0, ncomp=3) + _finish(enc)
    # luma AC band scan: all zero (EOB per block)
    enc = _Enc()
    for _ in range(4):
        enc.ac_code(0x00)
    out += _sos(1, 63, 0, 0) + _finish(enc)
    out += b"\xff\xd9"
    w, h, px = _decode_jpeg(bytes(out))
    assert (w, h) == (16, 16)
    assert px[3 * 16 + 3] == 40 and px[3 * 16 + 12] == 90
    assert px[12 * 16 + 3] == 160 and px[12 * 16 + 12] == 220


def test_progressive_mutation_fuzz():
    rng = [((i * 69621 + 3) >> 3) % 256 for i in range(16 * 8)]
    base = _encode_gray_progressive(rng, 16, 8)
    n = len(base)
    for trial in range(200):
        r = (trial * 2654435761) % (2 * n)
        if trial % 2:
            i = r % n
            mut = base[:i] + bytes([base[i] ^ (1 << (r % 8))]) + base[i + 1 :]
        else:
            mut = base[: r % n]
        try:
            w, h, px = _decode_jpeg(mut)
            assert len(px) == w * h
        except CorruptRasterError:
            pass


def test_production_writer_progressive_mode():
    vals = bytes(range(256))
    jp = encode_jpeg_gray_blocks(vals, progressive=True)
    assert b"\xff\xc2" in jp and jp.count(b"\xff\xda") == 3
    w, h, px = _decode_jpeg(jp)
    assert (w, h) == (2048, 8)
    assert all(px[3 * w + 8 * i + 3] == v for i, v in enumerate(vals))
