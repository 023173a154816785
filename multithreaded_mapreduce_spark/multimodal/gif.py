"""REAL GIF codec in pure stdlib + numpy — no external image library.

GIF is the one classic raster format whose compression is NOT stdlib
zlib: the image data is LZW with GIF's variable-width code stream
(9→12 bits, LSB-first bit packing, in-band CLEAR/EOI codes and the
famous decoder-side early code-width bump). Both directions are
implemented from the GIF87a/89a specification:

* ``encode_gif`` writes an 8-bit grayscale raster as a GIF87a file —
  logical screen descriptor, 256-entry grayscale global color table,
  image descriptor, and a real LZW-compressed, sub-block-packed data
  stream (CLEAR emitted up-front and again on dictionary overflow at
  4096 codes, per the spec).
* ``decode_gif`` walks the block structure (GIF87a and GIF89a;
  extension blocks are skipped per the 89a block grammar), reads the
  global/local color table, LZW-decompresses the sub-block stream —
  including the KwKwK self-referential case and dictionary resets —
  and maps indices through the palette. A pure-grayscale palette
  returns an (h, w) array, anything else (h, w, 3) RGB.

The LZW code-width handshake is the subtle part and is documented at
the two bump sites below: the encoder grows the width when the next
code to ASSIGN no longer fits; the decoder — whose dictionary trails
the encoder's by exactly one entry — must therefore grow the width one
slot EARLY (at ``(1 << width) - 1``), or every code after the boundary
is misread. ``tests/test_gif.py`` pins the boundary crossings at 512,
1024, 2048 and the 4096 reset.

Extension surface (SURVEY.md §2.3 multimodal row): the reference
processes whitespace-delimited text only (reference 1.cpp:248-264);
binary media columns are engine-new.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")

_MAX_WIDTH = 12  # GIF LZW codes never exceed 12 bits (spec appendix F)


# ---------------------------------------------------------------------------
# LZW (GIF flavor): variable 9..12-bit codes, LSB-first packing
# ---------------------------------------------------------------------------


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """Compress ``data`` (palette indices) with GIF-flavor LZW."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0  # bit accumulator, LSB-first
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    if data:
        w = bytes(data[:1])
        for ch in data[1:]:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
                continue
            emit(table[w], width)
            if next_code == 1 << _MAX_WIDTH:
                # dictionary full: reset in-band (spec appendix F)
                emit(clear, width)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                width = min_code_size + 1
            else:
                table[wc] = next_code
                next_code += 1
                # encoder-side bump, giflib convention: grow as soon as
                # the NEXT code to assign no longer fits — one entry
                # before strictly necessary, so it pairs with the
                # decoder's (1 << width) - 1 rule below
                if next_code == (1 << width) and width < _MAX_WIDTH:
                    width += 1
            w = bytes([ch])
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Decompress a GIF LZW stream; stops at EOI or after ``expected``
    indices. Raises ``ValueError`` on any malformed stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    pos = 0  # bit cursor
    total_bits = len(data) * 8
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while len(out) < expected:
        if pos + width > total_bits:
            raise ValueError("truncated GIF LZW stream")
        byte0 = pos >> 3
        chunk = int.from_bytes(data[byte0 : byte0 + 3], "little")
        code = (chunk >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < (1 << _MAX_WIDTH):  # deferred-clear support
                table.append(prev + entry[:1])
        elif code == len(table) and code < (1 << _MAX_WIDTH):
            entry = prev + prev[:1]  # KwKwK
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW: code {code} beyond dictionary")
        out += entry
        prev = entry
        # decoder-side bump, one slot EARLY: the decoder's dictionary
        # trails the encoder's by one entry (the encoder adds its entry
        # BEFORE writing the next code, the decoder only after READING
        # it), so the width must grow when the table reaches
        # (1 << width) - 1 — waiting for a full table misreads every
        # subsequent code
        if len(table) == (1 << width) - 1 and width < _MAX_WIDTH:
            width += 1
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def _image_block(pixels: np.ndarray) -> bytes:
    """Image descriptor + LZW minimum code size + sub-block-packed LZW
    stream + block terminator for one full-frame grayscale raster."""
    h, w = pixels.shape
    out = bytearray(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
    out.append(8)  # LZW minimum code size
    payload = _lzw_encode(pixels.tobytes(), 8)
    for i in range(0, len(payload), 255):  # sub-block packing
        block = payload[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    return bytes(out)


def _check_frame(pixels: np.ndarray) -> tuple[int, int]:
    if pixels.ndim != 2 or pixels.dtype != np.uint8:
        raise ValueError("GIF encoder expects (h, w) uint8 rasters")
    h, w = pixels.shape
    if not (0 < w < 65536 and 0 < h < 65536):
        raise ValueError("GIF dimensions must fit unsigned 16-bit")
    return h, w


def _gif_head(sig: bytes, w: int, h: int) -> bytearray:
    out = bytearray(sig)
    # logical screen descriptor: global table, 8 bits/channel, size 256
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):  # grayscale global color table
        out += bytes((i, i, i))
    return out


def encode_gif(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 grayscale raster as a GIF87a file with a
    256-entry grayscale global color table and real LZW image data."""
    h, w = _check_frame(pixels)
    out = _gif_head(b"GIF87a", w, h)
    out += _image_block(pixels)
    out += b"\x3b"  # trailer
    return bytes(out)


def encode_gif_frames(
    frames: list[np.ndarray], delays_cs: list[int] | None = None
) -> bytes:
    """Encode an ANIMATED GIF89a: every frame is a full-frame (h, w)
    uint8 grayscale raster (same dims), each preceded by a graphic
    control extension carrying its delay in centiseconds — the
    multi-image-block grammar real animation decoders walk."""
    if not frames:
        raise ValueError("encode_gif_frames needs at least one frame")
    h, w = _check_frame(frames[0])
    delays = [0] * len(frames) if delays_cs is None else list(delays_cs)
    if len(delays) != len(frames):
        raise ValueError("delays_cs length must equal frame count")
    out = _gif_head(b"GIF89a", w, h)
    for px, delay in zip(frames, delays):
        if _check_frame(px) != (h, w):
            raise ValueError("animation frames must share dimensions")
        if not 0 <= int(delay) < 65536:
            raise ValueError("frame delay must fit unsigned 16-bit")
        # graphic control extension: introducer, label 0xF9, block size
        # 4, packed flags 0 (no disposal/transparency), delay, no
        # transparent index, terminator (GIF89a spec §23)
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", int(delay)) + b"\x00\x00"
        out += _image_block(px)
    out += b"\x3b"  # trailer
    return bytes(out)


def _color_table(buf: bytes, off: int, packed: int, flag_bit: int) -> tuple[np.ndarray | None, int]:
    if not (packed >> flag_bit) & 1:
        return None, off
    n = 2 << (packed & 0x07)
    end = off + 3 * n
    if end > len(buf):
        raise ValueError("truncated GIF color table")
    return np.frombuffer(buf[off:end], dtype=np.uint8).reshape(n, 3), end


def _parse_image_block(
    buf: bytes, off: int, gct: np.ndarray | None
) -> tuple[np.ndarray, int]:
    """Parse one image block starting at the byte AFTER the 0x2C
    introducer; returns (raster, next offset)."""
    if off + 9 > len(buf):
        raise ValueError("truncated GIF image descriptor")
    _, _, w, h, ipacked = struct.unpack("<HHHHB", buf[off : off + 9])
    off += 9
    if (ipacked >> 6) & 1:
        raise ValueError("interlaced GIF not supported")
    lct, off = _color_table(buf, off, ipacked, 7)
    table = lct if lct is not None else gct
    if table is None:
        raise ValueError("GIF image has no color table")
    if off >= len(buf):
        raise ValueError("truncated GIF image data")
    min_code_size = buf[off]
    off += 1
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
    stream = bytearray()
    while True:
        if off >= len(buf):
            raise ValueError("GIF sub-blocks missing terminator")
        n = buf[off]
        off += 1
        if n == 0:
            break
        if off + n > len(buf):
            raise ValueError("truncated GIF sub-block")
        stream += buf[off : off + n]
        off += n
    idx = np.frombuffer(_lzw_decode(bytes(stream), min_code_size, w * h), dtype=np.uint8)
    if idx.size != w * h:
        raise ValueError("GIF pixel data does not fill the raster")
    if idx.max(initial=0) >= len(table):
        raise ValueError("GIF index outside color table")
    rgb = table[idx.astype(np.int64)].reshape(h, w, 3)
    if bool(np.all(rgb[:, :, 0] == rgb[:, :, 1]) and np.all(rgb[:, :, 1] == rgb[:, :, 2])):
        return rgb[:, :, 0].copy(), off
    return rgb, off


def decode_gif_frames(payload: bytes) -> list[tuple[np.ndarray, int]]:
    """Decode EVERY image block of a non-interlaced GIF87a/89a file.

    Returns a list of (raster, delay_cs) pairs in stream order: the
    delay comes from the graphic control extension preceding each
    frame (0 when absent, e.g. a plain 87a still). Each raster is
    (h, w) uint8 for a grayscale palette, else (h, w, 3) RGB."""
    buf = bytes(payload)
    if buf[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF file")
    if len(buf) < 13:
        raise ValueError("truncated GIF header")
    _, _, packed, _, _ = struct.unpack("<HHBBB", buf[6:13])
    gct, off = _color_table(buf, 13, packed, 7)
    frames: list[tuple[np.ndarray, int]] = []
    pending_delay = 0
    while True:
        if off >= len(buf):
            raise ValueError(
                "GIF ended before an image block"
                if not frames
                else "GIF stream missing trailer"
            )
        block = buf[off]
        off += 1
        if block == 0x3B:  # trailer
            if not frames:
                raise ValueError("GIF contains no image block")
            return frames
        if block == 0x21:  # extension: label + sub-blocks (89a grammar)
            if off >= len(buf):
                raise ValueError("truncated GIF extension")
            label = buf[off]
            off += 1
            first = True
            while True:
                if off >= len(buf):
                    raise ValueError("truncated GIF extension")
                n = buf[off]
                off += 1
                if n == 0:
                    break
                if label == 0xF9 and first and n == 4 and off + n <= len(buf):
                    # graphic control: packed byte, u16le delay, index
                    pending_delay = struct.unpack("<H", buf[off + 1 : off + 3])[0]
                first = False
                off += n
            continue
        if block == 0x2C:  # image descriptor
            px, off = _parse_image_block(buf, off, gct)
            frames.append((px, pending_delay))
            pending_delay = 0
            continue
        raise ValueError(f"unknown GIF block 0x{block:02x}")


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced GIF87a/89a image (first image block).

    Returns (h, w) uint8 for a grayscale palette, else (h, w, 3) RGB.
    """
    buf = bytes(payload)
    if buf[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF file")
    if len(buf) < 13:
        raise ValueError("truncated GIF header")
    _, _, packed, _, _ = struct.unpack("<HHBBB", buf[6:13])
    gct, off = _color_table(buf, 13, packed, 7)
    while True:
        if off >= len(buf):
            raise ValueError("GIF ended before an image block")
        block = buf[off]
        off += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF contains no image block")
        if block == 0x21:  # extension: label + sub-blocks (89a grammar)
            off += 1
            while True:
                if off >= len(buf):
                    raise ValueError("truncated GIF extension")
                n = buf[off]
                off += 1
                if n == 0:
                    break
                off += n
            continue
        if block == 0x2C:  # image descriptor
            px, _off = _parse_image_block(buf, off, gct)
            return px
        raise ValueError(f"unknown GIF block 0x{block:02x}")
