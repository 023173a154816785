"""media_phash_dedup: perceptual (difference-hash) image dedup over
decoded PNG pixels. Pins the property that makes it PERCEPTUAL — byte-
distinct brightness-shifted variants collapse to one fingerprint while
content-distinct images do not — plus the non-trivial group structure
on the driver fixture and bit-parity of the in-task dHash with an
independent scalar recomputation."""

from __future__ import annotations

import hashlib

import numpy as np

from multithreaded_mapreduce_spark.plans.registry import all_queries

Q = all_queries()


def _raster(doc_id: int) -> np.ndarray:
    g = doc_id // 3
    w, h = 16 + g % 13, 12 + g % 9
    need = w * h
    buf = bytearray()
    j = 0
    while len(buf) < need:
        buf += hashlib.md5(f"img:{g}:{j}".encode()).digest()
        j += 1
    b = np.frombuffer(bytes(buf[:need]), dtype=np.uint8).astype(np.int64)
    return ((b * 250) // 255 + doc_id % 3).astype(np.uint8).reshape(h, w)


def _dhash_hex(px: np.ndarray) -> str:
    h, w = px.shape
    bits = 0
    for y in range(8):
        yi = (y * h) // 8
        for x in range(8):
            xi, xj = (x * w) // 9, ((x + 1) * w) // 9
            if int(px[yi, xi]) < int(px[yi, xj]):
                bits |= 1 << (y * 8 + x)
    return "%016x" % bits


def test_brightness_shift_is_byte_distinct_but_hash_identical():
    """doc_ids 3,4,5 share content g=1 with shifts +0/+1/+2: every pair
    of rasters differs byte-wise, yet all three dHash identically —
    the exact near-dup class exact-digest dedup (media_frame_dedup,
    dedup_exact) cannot catch."""
    r3, r4, r5 = _raster(3), _raster(4), _raster(5)
    assert not (r3 == r4).all() and not (r4 == r5).all()
    assert _dhash_hex(r3) == _dhash_hex(r4) == _dhash_hex(r5)
    # different content must not collide here
    assert _dhash_hex(_raster(3)) != _dhash_hex(_raster(6))


def _near_raster(doc_id: int) -> np.ndarray:
    """media_phash_near_pairs' raster family (perturbed odd variants)."""
    b, v = doc_id // 2, doc_id % 2
    w, h = 18 + b % 11, 14 + b % 7
    need = w * h
    buf = bytearray()
    j = 0
    while len(buf) < need:
        buf += hashlib.md5(f"nearimg:{b}:{j}".encode()).digest()
        j += 1
    vals = (
        np.frombuffer(bytes(buf[:need]), dtype=np.uint8).astype(np.int64) * 250
    ) // 255
    if v == 1:
        py, pxi = (b % 8 * h) // 8, (b % 8 * w) // 9
        pxj = ((b % 8 + 1) * w) // 9
        vals[py * w + pxi] = 200
        vals[py * w + pxj] = 100
    return vals.astype(np.uint8).reshape(h, w)


def test_near_pairs_recovers_perturbed_variants(spark, sf_dir):
    """The planted (2b, 2b+1) pairs differ in fingerprint (so exact
    grouping misses them) yet surface through the Hamming banding with
    small distances; reported hammings match a scalar recomputation."""
    rows = {
        (r.doc_a, r.doc_b): r.hamming
        for r in Q["media_phash_near_pairs"].builder(spark, sf_dir).collect()
    }
    assert rows, "no near pairs surfaced"
    within = {(a, b): d for (a, b), d in rows.items() if a // 2 == b // 2}
    assert len(within) >= 10  # most planted perturbations flip >= 1 bit
    for (a, b), d in list(rows.items())[:20]:
        ha = _dhash_hex(_near_raster(a))
        hb = _dhash_hex(_near_raster(b))
        assert ha != hb  # near, not equal — the exact-group blind spot
        assert bin(int(ha, 16) ^ int(hb, 16)).count("1") == d
        assert 1 <= d <= 6


def test_query_groups_match_scalar_recomputation(spark, sf_dir):
    rows = {
        r.doc_id: (r.phash, r.dup_group_size)
        for r in Q["media_phash_dedup"].builder(spark, sf_dir).collect()
    }
    assert rows, "empty result"
    # in-task (codec-roundtripped) hash == scalar raster hash
    for i in list(rows)[:30]:
        assert rows[i][0] == _dhash_hex(_raster(i)), i
    # the id//3 construction makes interior groups size exactly 3
    from collections import Counter

    sizes = Counter(sz for _, sz in rows.values())
    assert sizes.get(3, 0) > 0
    assert set(sizes) <= {1, 2, 3}, sizes
    # every member of a group shares the fingerprint with its 2 peers
    i = next(d for d, (_, s) in rows.items() if s == 3 and d % 3 == 0)
    assert rows[i][0] == rows[i + 1][0] == rows[i + 2][0]
