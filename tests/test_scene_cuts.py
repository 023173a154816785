"""media_video_scene_cuts invariants, no SparkSession needed: the
per-frame dHash arithmetic, the gain-invariance claim the oracle
certifies (DuckDB hashes at SCENE granularity while Spark hashes the
jittered per-frame raster — they can only match if brightness shifts
cancel in the gradient bits), and the demux-driven frame count."""

from __future__ import annotations

import hashlib

import numpy as np

from multithreaded_mapreduce_spark.multimodal.mp4 import (
    encode_mp4_skeleton,
    parse_mp4_samples,
)


def _dhash(px: np.ndarray, w: int, h: int) -> int:
    ks = np.arange(64)
    yi = ((ks // 8) * h) // 8
    pa = yi * w + ((ks % 8) * w) // 9
    pb = yi * w + (((ks % 8) + 1) * w) // 9
    weights = np.array([1 << int(k) for k in range(64)], dtype=object)
    return int(np.sum(weights[px[pa] < px[pb]]))


def _scene_raster(i: int, s: int, w: int, h: int) -> np.ndarray:
    need = w * h
    raw = bytearray()
    j = 0
    while len(raw) < need:
        raw += hashlib.md5(f"vid:{i}:{s}:{j}".encode()).digest()
        j += 1
    return (np.frombuffer(bytes(raw[:need]), dtype=np.uint8).astype(np.int64) * 250) // 255


def test_dhash_is_gain_invariant():
    # a constant brightness shift never flips a strict-inequality
    # gradient bit — the property that makes within-scene Hamming 0
    for i in (0, 7, 23, 118):
        w, h = 12 + i % 9, 8 + i % 7
        base = _scene_raster(i, 0, w, h)
        bits = _dhash(base, w, h)
        for c in (1, 2, 5, 40):
            assert _dhash(base + c, w, h) == bits


def test_within_scene_zero_cross_scene_large():
    for i in (3, 50, 444):
        w, h = 12 + i % 9, 8 + i % 7
        length = 3 + i % 4
        a = _dhash(_scene_raster(i, 0, w, h) + (0 % 3), w, h)
        b = _dhash(_scene_raster(i, 0, w, h) + (1 % 3), w, h)
        assert a == b  # same scene, different jitter
        c = _dhash(_scene_raster(i, 1, w, h) + (length % 3), w, h)
        assert bin(a ^ c).count("1") >= 16  # scene boundary jumps


def test_demuxed_frame_count_matches_declared():
    for i in (0, 9, 31, 207):
        n = 8 + i % 25
        buf = encode_mp4_skeleton(
            width=16 * (2 + i % 9),
            height=16 * (2 + i % 7),
            timescale=600,
            n_samples=n,
            sample_delta=100 + (i % 5) * 10,
            sample_sizes=[50 + (i + k) % 17 for k in range(n)],
            seed=f"mp4:{i}",
        )
        assert len(parse_mp4_samples(buf)) == n


def test_every_video_has_at_least_one_cut_candidate():
    # n >= 8 frames and scene length <= 6 guarantee a scene boundary
    # inside every video, so the query is structurally non-empty
    for i in range(64):
        n, length = 8 + i % 25, 3 + i % 4
        assert n > length
