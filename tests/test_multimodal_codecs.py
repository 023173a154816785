"""REAL pure-numpy media codecs (Netpbm PGM/PPM, WAV PCM16) and the
Spark operators built on them — golden round-trips, spec corners
(header comments, RIFF chunk padding), and numpy parity for the
distributed decode/resize/energy paths."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from multithreaded_mapreduce_spark.multimodal.codecs import (
    decode_netpbm,
    decode_wav_pcm16,
    encode_netpbm,
    encode_wav_pcm16,
    resize_nearest,
)


def test_netpbm_round_trip_rgb_and_gray():
    rgb = np.arange(2 * 5 * 3, dtype=np.uint8).reshape(2, 5, 3)
    assert (decode_netpbm(encode_netpbm(rgb)) == rgb).all()
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert (decode_netpbm(encode_netpbm(gray)) == gray).all()


def test_netpbm_header_comments_and_whitespace():
    """Spec corner: '#' comment lines and arbitrary whitespace inside
    the header must parse (the part naive fixed-offset parsers miss)."""
    px = np.full((2, 3), 7, dtype=np.uint8)
    payload = b"P5\n# a comment\n 3   # trailing\n2\n255\n" + px.tobytes()
    assert (decode_netpbm(payload) == px).all()


def test_netpbm_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_netpbm(b"JFIF....")
    with pytest.raises(ValueError):
        decode_netpbm(b"P6\n4 4\n255\n\x00\x01")  # raster too short


def test_resize_nearest_known_checkerboard():
    """2x downsample of a 4x4 checkerboard picks the top-left of each
    2x2 block — exact expected raster, no interpolation fuzz."""
    board = np.array(
        [[0, 255, 0, 255],
         [255, 0, 255, 0],
         [0, 255, 0, 255],
         [255, 0, 255, 0]],
        dtype=np.uint8,
    )
    small = resize_nearest(board, 2, 2)
    assert (small == np.array([[0, 0], [0, 0]], dtype=np.uint8)).all()
    big = resize_nearest(board, 8, 8)
    assert big.shape == (8, 8)
    assert (big[0:2, 0:2] == 0).all() and (big[0:2, 2:4] == 255).all()


def test_wav_round_trip_and_chunk_walk():
    s = np.arange(-100, 100, dtype=np.int16)
    enc = encode_wav_pcm16(s, 22050)
    dec, rate = decode_wav_pcm16(enc)
    assert rate == 22050 and (dec == s).all()
    # insert a LIST chunk between fmt and data: the chunk walk must skip
    # it (real WAV files carry these; fixed-offset parsers break)
    fmt_end = 12 + 8 + 16
    listing = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded odd chunk
    padded = enc[:fmt_end] + listing + enc[fmt_end:]
    dec2, rate2 = decode_wav_pcm16(padded)
    assert rate2 == 22050 and (dec2 == s).all()


def test_wav_rejects_stereo_and_nonpcm():
    s = np.zeros(4, dtype=np.int16)
    enc = bytearray(encode_wav_pcm16(s, 8000))
    enc[22] = 2  # channels := 2
    with pytest.raises(ValueError):
        decode_wav_pcm16(bytes(enc))


# ---------------------------------------------------------------------------
# Spark operators over the real codecs
# ---------------------------------------------------------------------------


def _media(spark, n=24):
    from multithreaded_mapreduce_spark.multimodal.binary import synthesize_netpbm_media

    return synthesize_netpbm_media(spark, n=n)


def test_spark_netpbm_decode_matches_local_decode(spark):
    from multithreaded_mapreduce_spark.multimodal.binary import decode_netpbm_images

    media = _media(spark)
    got = {r.media_id: r for r in decode_netpbm_images(media).collect()}
    for row in media.filter("kind = 'image'").collect():
        px = decode_netpbm(bytes(row.payload))
        r = got[row.media_id]
        h, w = px.shape[:2]
        c = px.shape[2] if px.ndim == 3 else 1
        assert (r.width, r.height, r.n_channels) == (w, h, c)
        assert abs(r.mean_luma - float(px.astype(np.float64).mean())) < 1e-12


def test_spark_netpbm_resize_digest_matches_local_resample(spark):
    """The distributed thumbnail's md5 equals a driver-side decode →
    resize → encode of the same payload: the pixel path is byte-exact."""
    from multithreaded_mapreduce_spark.multimodal.binary import (
        RESIZE_TARGET,
        resize_netpbm_images,
    )

    media = _media(spark)
    got = {r.media_id: r for r in resize_netpbm_images(media).collect()}
    for row in media.filter("kind = 'image'").collect():
        px = decode_netpbm(bytes(row.payload))
        h, w = px.shape[:2]
        scale = RESIZE_TARGET / max(w, h)
        nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
        want = encode_netpbm(resize_nearest(px, nw, nh))
        r = got[row.media_id]
        assert r.resized_md5 == hashlib.md5(want).hexdigest()
        assert r.resized_bytes == len(want)
        assert max(r.width, r.height) == RESIZE_TARGET


def test_spark_wav_energy_matches_numpy(spark):
    from multithreaded_mapreduce_spark.multimodal.binary import (
        WAV_FRAME_SAMPLES,
        WAV_HOP_SAMPLES,
        wav_frame_energy,
    )

    media = _media(spark, n=18)
    got = {}
    for r in wav_frame_energy(media).collect():
        got.setdefault(r.media_id, []).append(r)
    for row in media.filter("kind = 'audio'").collect():
        samples, rate = decode_wav_pcm16(bytes(row.payload))
        x = samples.astype(np.float64)
        frames = got.get(row.media_id, [])
        expect_n = max(0, 1 + (len(x) - WAV_FRAME_SAMPLES) // WAV_HOP_SAMPLES)
        assert len(frames) == expect_n
        for fr in frames:
            seg = x[fr.start_sample : fr.start_sample + WAV_FRAME_SAMPLES]
            assert abs(fr.rms - float(np.sqrt(np.mean(seg * seg)))) < 1e-9
            assert fr.sample_rate == rate
