"""REAL media codecs in pure numpy — no external image/audio library.

The container ships no PIL/libvips/soundfile, but two classic formats
need nothing beyond numpy and struct:

* **Netpbm binary images** (P5 = 8-bit grayscale PGM, P6 = 8-bit RGB
  PPM): an ASCII header (`magic width height maxval`) followed by raw
  samples row-major. This is a real, widely-used interchange format —
  `encode_netpbm`/`decode_netpbm` below are complete codecs for the
  8-bit binary variants, including comment lines and arbitrary header
  whitespace per the spec.
* **WAV PCM** (RIFF/WAVE, 16-bit little-endian): `encode_wav_pcm16`
  writes the canonical 44-byte header; `decode_wav_pcm16` walks the
  RIFF chunk list (not a fixed offset — real files carry LIST/fact
  chunks before `data`) and returns the int16 sample array + rate.

These power the multimodal operators' decode/resize/frame paths with
REAL pixel and sample math; only exotic codecs (JPEG/MP3/MP4) remain
behind the explicit NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# Netpbm (PGM P5 / PPM P6), 8-bit binary
# ---------------------------------------------------------------------------


def encode_netpbm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 array as binary PGM (P5) or an (h, w, 3)
    uint8 array as binary PPM (P6)."""
    if pixels.dtype != np.uint8:
        raise ValueError("8-bit Netpbm requires uint8 pixels")
    if pixels.ndim == 2:
        magic = b"P5"
        h, w = pixels.shape
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        magic = b"P6"
        h, w = pixels.shape[:2]
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    return magic + f"\n{w} {h}\n255\n".encode("ascii") + pixels.tobytes()


def _read_header_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited header token, skipping '#' comments
    (the part naive parsers get wrong)."""
    n = len(buf)
    while pos < n:
        c = buf[pos : pos + 1]
        if c == b"#":
            while pos < n and buf[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and not buf[pos : pos + 1].isspace():
        pos += 1
    if start == pos:
        raise ValueError("truncated Netpbm header")
    return buf[start:pos], pos


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Decode binary PGM/PPM to (h, w) or (h, w, 3) uint8."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary Netpbm payload (magic {magic!r})")
    pos = 2
    w_tok, pos = _read_header_token(payload, pos)
    h_tok, pos = _read_header_token(payload, pos)
    maxval_tok, pos = _read_header_token(payload, pos)
    w, h, maxval = int(w_tok), int(h_tok), int(maxval_tok)
    if maxval != 255:
        raise ValueError(f"only 8-bit Netpbm supported (maxval {maxval})")
    pos += 1  # exactly one whitespace byte separates header and raster
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    if raster.size != need:
        raise ValueError("truncated Netpbm raster")
    return raster.reshape((h, w, 3)) if channels == 3 else raster.reshape((h, w))


def resize_nearest(pixels: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample — real pixel math, deterministic, and
    identical everywhere (no interpolation library variance)."""
    h, w = pixels.shape[:2]
    rows = np.minimum((np.arange(new_h) * h) // new_h, h - 1)
    cols = np.minimum((np.arange(new_w) * w) // new_w, w - 1)
    return pixels[rows][:, cols]


# ---------------------------------------------------------------------------
# WAV PCM 16-bit
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode a mono int16 sample array as a canonical RIFF/WAVE file."""
    if samples.dtype != np.int16:
        raise ValueError("PCM16 requires int16 samples")
    data = samples.tobytes()
    byte_rate = sample_rate * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return header + data


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono 16-bit PCM WAV: walk the RIFF chunk list to find
    `fmt ` and `data` (never assume the 44-byte fast path)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, n_ch, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if (fmt, n_ch, bits) != (1, 1, 16):
                raise ValueError(f"only mono PCM16 supported (fmt={fmt}, ch={n_ch}, bits={bits})")
            sample_rate = rate
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return np.frombuffer(data, dtype="<i2"), sample_rate
