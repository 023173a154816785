"""GIF87a/89a codec (multimodal/gif.py): the family's only non-zlib
entropy coder — real LZW with variable 9-12-bit codes. These pin the
code-width handshake at every boundary (512/1024/2048), the 4096
dictionary reset, the KwKwK self-reference, deferred-clear tolerance,
palette handling, the 89a extension grammar, and the ValueError
contract on damage."""

from __future__ import annotations

import numpy as np
import pytest

from multithreaded_mapreduce_spark.multimodal.gif import (
    GIF_SIGNATURES,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_frames,
)


def _raster(h: int, w: int, seed: int = 0) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)


def test_lzw_roundtrip_across_every_width_boundary():
    rng = np.random.RandomState(7)
    for n in (0, 1, 2, 5, 100, 511, 512, 513, 1000, 3000, 5000, 20000, 60000):
        for mode in ("rand", "low", "runs"):
            if mode == "rand":
                d = rng.randint(0, 256, n).astype(np.uint8).tobytes()
            elif mode == "low":
                # low-entropy: long dictionary entries, deep width growth
                d = rng.randint(0, 4, n).astype(np.uint8).tobytes()
            else:
                # runs: exercises the KwKwK self-referential code
                d = (
                    np.repeat(rng.randint(0, 256, max(1, n // 50) + 1), 50)[:n]
                    .astype(np.uint8)
                    .tobytes()
                )
            enc = _lzw_encode(d, 8)
            assert _lzw_decode(enc, 8, len(d)) == d, (n, mode)


def test_lzw_4096_reset_path():
    # enough low-entropy data to fill the 12-bit dictionary and force
    # the in-band CLEAR reset (raster also exceeds 4096 entries)
    d = (np.indices((200, 300)).sum(0) % 7 * 30).astype(np.uint8)
    assert (decode_gif(encode_gif(d)) == d).all()


def test_kwkwk_minimal_case():
    # the canonical aaaa... stream hits code==len(table) immediately
    d = b"\x01" * 100
    assert _lzw_decode(_lzw_encode(d, 8), 8, len(d)) == d


def test_container_roundtrip_shapes():
    for h, w in ((1, 1), (1, 300), (300, 1), (13, 17), (60, 80)):
        px = _raster(h, w, seed=h * 1000 + w)
        back = decode_gif(encode_gif(px))
        assert back.shape == (h, w)
        assert (back == px).all()


def test_encode_is_deterministic():
    px = _raster(20, 30, seed=3)
    assert encode_gif(px) == encode_gif(px)
    assert encode_gif(px)[:6] in GIF_SIGNATURES


def test_gif89a_extension_blocks_are_skipped():
    px = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    buf = bytearray(encode_gif(px))
    buf[4:5] = b"9"  # GIF89a
    i = bytes(buf).index(0x2C, 13 + 768)  # first image descriptor
    # graphic control extension: introducer, label, 4-byte block, term
    buf[i:i] = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    assert (decode_gif(bytes(buf)) == px).all()


def test_non_grayscale_palette_returns_rgb():
    px = np.array([[0, 1]], dtype=np.uint8)
    buf = bytearray(encode_gif(px))
    # palette entry 1 -> pure red: decoder must emit (h, w, 3)
    buf[13 + 3 : 13 + 6] = bytes((255, 0, 0))
    back = decode_gif(bytes(buf))
    assert back.shape == (1, 2, 3)
    assert tuple(back[0, 1]) == (255, 0, 0)
    assert tuple(back[0, 0]) == (0, 0, 0)


def test_deferred_clear_stream_decodes():
    # a stream whose dictionary fills without an in-band reset: decode
    # must stop ADDING entries at 4096 and keep reading existing codes
    # (real encoders emit such "deferred clear" streams)
    d = bytes(np.tile(np.arange(64, dtype=np.uint8), 700))  # 44.8k idx
    enc = _lzw_encode(d, 8)
    assert _lzw_decode(enc, 8, len(d)) == d


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"",
        lambda b: b[:6],  # header only
        lambda b: b"NOT" + b[3:],  # bad signature
        lambda b: b[: len(b) // 2],  # truncated stream
        lambda b: b[:13],  # no color table
    ],
)
def test_damage_raises_valueerror(mutate):
    buf = encode_gif(_raster(20, 20, seed=9))
    with pytest.raises(ValueError):
        decode_gif(mutate(buf))


def test_interlaced_flag_rejected():
    buf = bytearray(encode_gif(_raster(4, 4, seed=1)))
    i = bytes(buf).index(0x2C, 13 + 768)
    buf[i + 9] |= 0x40  # set interlace flag in the image descriptor
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(buf))


def test_animated_roundtrip_frames_and_delays():
    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (9, 14)).astype(np.uint8) for _ in range(5)]
    delays = [3, 7, 0, 65535, 12]
    out = decode_gif_frames(encode_gif_frames(frames, delays))
    assert len(out) == 5
    for (px, d), f, ed in zip(out, frames, delays):
        assert (px == f).all()
        assert d == ed


def test_animated_first_frame_matches_decode_gif():
    frames = [_raster(6, 8, seed=s) for s in (1, 2, 3)]
    buf = encode_gif_frames(frames, [1, 2, 3])
    assert (decode_gif(buf) == frames[0]).all()


def test_still_87a_decodes_as_single_frame_with_zero_delay():
    px = _raster(7, 9, seed=4)
    out = decode_gif_frames(encode_gif(px))
    assert len(out) == 1
    assert (out[0][0] == px).all()
    assert out[0][1] == 0


def test_animated_error_paths():
    frames = [_raster(5, 5, seed=6)]
    with pytest.raises(ValueError):
        encode_gif_frames([])
    with pytest.raises(ValueError):
        encode_gif_frames(frames + [_raster(4, 4, seed=7)])  # dim mismatch
    with pytest.raises(ValueError):
        encode_gif_frames(frames, [70000])  # delay overflow
    with pytest.raises(ValueError):
        decode_gif_frames(encode_gif_frames(frames, [1])[:-1])  # no trailer


def test_binary_dispatch_decodes_gif_payloads():
    from multithreaded_mapreduce_spark.multimodal.binary import _decode_payload

    px = _raster(7, 11, seed=2)
    assert _decode_payload(encode_gif(px), fake_codec=False) == (11, 7, 1)
