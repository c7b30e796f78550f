"""Image perceptual hashing (dHash) + Hamming near-dup pairs."""

import pytest

from html5ever_elixir_spark.operators.multimodal import (
    dhash_from_pixels,
    docs_to_dhash_pnms,
    image_dhash,
    image_dhash_pairs,
)


def _ref_dhash(px, w, h, gw=8, gh=8):
    # independent slow reference: block means + gradient bits
    gw1 = gw + 1
    bits = []
    for r in range(gh):
        y0, y1 = r * h // gh, (r + 1) * h // gh
        row = []
        for c in range(gw1):
            x0, x1 = c * w // gw1, (c + 1) * w // gw1
            block = [px[y * w + x] for y in range(y0, y1)
                     for x in range(x0, x1)]
            row.append(sum(block) // len(block))
        bits.append(row)
    hi = lo = 0
    for r in range(gh):
        for c in range(gw):
            if bits[r][c] > bits[r][c + 1]:
                p = r * gw + c
                if p < 32:
                    hi |= 1 << p
                else:
                    lo |= 1 << (p - 32)
    return hi, lo


def _p5(w, h, px):
    return f"P5 {w} {h} 255\n".encode() + bytes(px)


def test_dhash_matches_reference_exact_grid():
    px = [(x * 13 + y * 31) % 251 for y in range(8) for x in range(9)]
    assert dhash_from_pixels(px, 9, 8) == _ref_dhash(px, 9, 8)


def test_dhash_matches_reference_downsampled():
    # 27x16 image: 3x2 blocks per cell — exercises the block-mean path
    px = [(x * 7 + y * 11 + (x * y) % 5) % 256
          for y in range(16) for x in range(27)]
    assert dhash_from_pixels(px, 27, 16) == _ref_dhash(px, 27, 16)


def test_dhash_too_small_raises():
    with pytest.raises(ValueError):
        dhash_from_pixels([0] * 16, 4, 4)


def test_image_dhash_real_decode(spark):
    px = [(x * 13 + y * 31) % 251 for y in range(8) for x in range(9)]
    media = spark.createDataFrame(
        [(1, bytearray(_p5(9, 8, px))), (2, bytearray(b"P5 2 2 255\nABCD"))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in image_dhash(media).collect()}
    hi, lo = _ref_dhash(px, 9, 8)
    assert rows[1].decode_error is None
    assert (rows[1].dhash_hi, rows[1].dhash_lo) == (hi, lo)
    assert (rows[1].width, rows[1].height) == (9, 8)
    # 2x2 decodes but is too small for the grid -> row-level error
    assert rows[2].decode_error is not None


def test_perturbed_twin_within_one_bit(spark):
    docs = spark.createDataFrame(
        [(11, "the quick brown fox " * 4), (12, "the quick brown fox " * 4)],
        "doc_id long, text string",
    )
    # doc 11 (%11 == 0) is perturbed, doc 12 is not -> hamming <= 1
    pairs = image_dhash_pairs(docs_to_dhash_pnms(docs)).collect()
    assert len(pairs) == 1
    assert (pairs[0].id_a, pairs[0].id_b) == (11, 12)
    assert pairs[0].hamming <= 1


def test_pairs_match_bruteforce(spark):
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota kappb",
        "totally different words here that share no common prefix",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts, start=1)), "doc_id long, text string"
    )
    media = docs_to_dhash_pnms(docs)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in image_dhash_pairs(media, max_hamming=3).collect()
    }

    # brute force over the same synthesized pixels
    def pxs(did, t):
        vals = bytearray(t[:72].ljust(72).encode())
        if did % 11 == 0:
            vals[-1] += 1
        return list(vals)

    hs = {d: _ref_dhash(pxs(d, t), 9, 8) for d, t in enumerate(texts, 1)}
    want = {}
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(hs[a][0] ^ hs[b][0]).count("1") + bin(
                hs[a][1] ^ hs[b][1]
            ).count("1")
            if d <= 3:
                want[(a, b)] = d
    assert got == want
    assert want[(1, 4)] == 0  # identical texts collide exactly


def test_dhash_pairs_plan_single_parse_stage(spark):
    docs = spark.createDataFrame(
        [(1, "x " * 40)], "doc_id long, text string"
    )
    plan = image_dhash_pairs(docs_to_dhash_pnms(docs))._jdf.queryExecution(
    ).executedPlan().toString()
    # r9: in-bucket pair generation gives the hash table a single
    # consumer, so each Arrow stage appears EXACTLY once in the whole
    # plan — one for the PNM synthesis (docs_to_dhash_pnms), one for
    # the decode+hash (image_dhash). r8's self-join needed an eager
    # localCheckpoint barrier to stop each join leg re-running them
    # (4 MapInArrow without it); the barrier job itself is now gone.
    assert plan.count("MapInArrow") == 2
    assert "ArrowEvalPython" not in plan


def test_clusters_match_union_find(spark):
    from html5ever_elixir_spark.operators.multimodal import (
        image_dhash_clusters,
    )

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota kappb",
        "totally different words here that share no common prefix",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "yet another unrelated document body with its own wording",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts, start=1)), "doc_id long, text string"
    )
    got = {
        r.media_id: r.cluster_id
        for r in image_dhash_clusters(docs_to_dhash_pnms(docs)).collect()
    }
    # brute union-find over brute-force hamming<=3 pairs
    def pxs(did, t):
        vals = bytearray(t[:72].ljust(72).encode())
        if did % 11 == 0:
            vals[-1] += 1
        return list(vals)

    hs = {d: _ref_dhash(pxs(d, t), 9, 8) for d, t in enumerate(texts, 1)}
    parent = {d: d for d in hs}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(hs[a][0] ^ hs[b][0]).count("1") + bin(
                hs[a][1] ^ hs[b][1]
            ).count("1")
            if d <= 3:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in hs}
    assert got == want
    assert want[4] == 1  # duplicate-text chain collapsed to min id
    assert len(got) == len(texts)  # pairless docs label themselves


def test_dhash_fuzz_never_raises_batchwise(spark):
    # corrupt/truncated/random containers must become row-level
    # decode_error rows — the decode gate's crash surface under crawl
    # garbage (same discipline as the raster/WAV fuzz gates)
    import random

    from html5ever_elixir_spark.operators.multimodal import (
        encode_gif,
        encode_webp_vp8l,
    )

    rng = random.Random(0xD4A5)
    payloads = []
    px = [rng.randrange(256) for _ in range(72)]
    good = [
        _p5(9, 8, px),
        encode_gif(bytes(px), 9, 8),
        encode_webp_vp8l(bytes(px), 9, 8),
    ]
    for g in good:
        payloads.append(g)                      # intact
        payloads.append(g[: len(g) // 2])       # truncated
        b = bytearray(g)                        # bit-flipped
        for _ in range(4):
            b[rng.randrange(len(b))] ^= 0xFF
        payloads.append(bytes(b))
    for _ in range(40):                         # pure noise
        payloads.append(bytes(rng.randrange(256)
                              for _ in range(rng.randrange(1, 200))))
    payloads.append(b"")
    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, payload binary",
    )
    rows = image_dhash(media).collect()
    assert len(rows) == len(payloads)  # every row comes back, job alive
    ok = [r for r in rows if r.decode_error is None]
    # the three intact containers must decode to the SAME hash (the
    # GIF/WebP writers are byte-lossless around the pixel values)
    assert len(ok) >= 3
    hashes = {(r.dhash_hi, r.dhash_lo) for r in ok if r.media_id % 3 == 0}
    assert len(hashes) == 1
