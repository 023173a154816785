"""Baseline JPEG codec in pure numpy + stdlib — no external image
library (VERDICT r8 task 8: the last stubbed IMAGE format with a
feasible pure-Python path; MP3/MP4 remain legitimately stubbed).

Scope is baseline sequential DCT JPEG per ITU-T T.81:

* ``decode_jpeg``: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/EOI marker walk,
  canonical Huffman decode (DC categories + AC run/size with EOB/ZRL),
  restart-interval handling, dequantize → un-zigzag → 2-D IDCT (batched
  orthonormal matrix form over all blocks at once), chroma upsampling
  for any (h,v) sampling factors ≤ 2 (4:4:4 and 4:2:0 in practice),
  JFIF YCbCr → RGB. 8-bit precision, 1- or 3-component frames;
  progressive (SOF2), arithmetic coding, and 12-bit are rejected
  explicitly.
* ``encode_jpeg``: the forward path with the spec's Annex K example
  tables (quantization K.1 scaled by the IJG quality formula, Huffman
  K.3) — level shift, batched DCT, quantize, zigzag, DC-differential +
  AC run-length Huffman, byte stuffing, 4:4:4 or 4:2:0 subsampling.

JPEG is lossy, so unlike the PNG path there is no bit-roundtrip
certification; the contract is decode(encode(x)) ≈ x within a
quantization-error bound (tight on smooth rasters), plus pinned-digest
determinism tests — the netpbm pattern prescribed by VERDICT r8.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# spec constants (ITU-T T.81 Annex K examples — the de-facto standard
# tables every baseline encoder ships)
# ---------------------------------------------------------------------------

#: zigzag position k -> row-major index in the 8x8 block (T.81 fig. 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

#: K.1 luminance / chrominance quantization tables (row-major)
QTABLE_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QTABLE_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

#: K.3 Huffman table specs: (BITS[1..16], HUFFVAL)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: orthonormal 8-point DCT-II basis: forward Y = D @ X @ D.T,
#: inverse X = D.T @ Y @ D
_DCT_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT_D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction
    (annex C): codes of each length assigned in huffval order."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the reader below."""
    return {(ln, c): s for s, (c, ln) in _canonical_codes(bits, huffval).items()}


def _quality_scaled(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = the Annex K table verbatim."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# color transforms (JFIF / BT.601)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# block helpers (batched over all blocks of a plane at once)
# ---------------------------------------------------------------------------


def _plane_to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to multiples of 8 and cut into (n, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    blocks = (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks, hh // 8, ww // 8

def _blocks_to_plane(blocks: np.ndarray, by: int, bx: int) -> np.ndarray:
    return (
        blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    )


def _fdct_quant(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Batched forward DCT + quantize -> (n, 64) zigzagged int coeffs."""
    shifted = blocks.astype(np.float64) - 128.0
    coef = np.einsum("ij,njk,lk->nil", _DCT_D, shifted, _DCT_D)
    q = np.round(coef / qtab.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _dequant_idct(zz: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Batched inverse of _fdct_quant: (n, 64) zigzag -> (n, 8, 8) u8."""
    coef = (zz[:, UNZIGZAG] * qtab).reshape(-1, 8, 8).astype(np.float64)
    spat = np.einsum("ji,njk,kl->nil", _DCT_D, coef, _DCT_D)
    return np.clip(np.round(spat + 128.0), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# bit I/O (scan-data layer: byte stuffing + restart markers)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 §B.1.1.5)
                self.out.append(0x00)

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """MSB-first reader over entropy-coded data; unstuffs 0xFF00 and
    stops at (reporting) any other marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated scan data")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated scan data")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} inside scan")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def bits(self, n: int) -> int:
        while self._nbits < n:
            self._fill()
        self._nbits -= n
        return (self._acc >> self._nbits) & ((1 << n) - 1)

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan data")

class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _extend(v: int, size: int) -> int:
    """DC/AC amplitude decode (T.81 F.12): low 'size' bits -> signed."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    """Number of bits to represent v per T.81 table F.1."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _encode_block(
    w: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, ln = dc_codes[size]
    w.write(code, ln)
    if size:
        amp = diff if diff >= 0 else diff + (1 << size) - 1
        w.write(amp, size)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_codes[(run << 4) | size]
        w.write(code, ln)
        amp = v if v >= 0 else v + (1 << size) - 1
        w.write(amp, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def encode_jpeg(
    pixels: np.ndarray,
    *,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 raster as a
    baseline JFIF JPEG with the Annex K example tables. ``subsampling``
    is '444' or '420' (ignored for grayscale); ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs (the
    error-resilience feature real camera files carry)."""
    if pixels.dtype != np.uint8:
        raise ValueError("8-bit JPEG requires uint8 pixels")
    if pixels.ndim == 2:
        ncomp = 1
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        ncomp = 3
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = pixels.shape[:2]
    qy = _quality_scaled(QTABLE_LUMA, quality)
    qc = _quality_scaled(QTABLE_CHROMA, quality)

    # --- plane extraction (+ chroma subsample for 420) ---
    if ncomp == 1:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        yp, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsampling == "420":
            # pad odd dims by edge-replication, then 2x2 mean
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [yp, cb, cr]

    # --- per-component zigzag coefficient grids ---
    comp_zz: list[np.ndarray] = []
    comp_grid: list[tuple[int, int]] = []
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        # pad the plane so its block grid covers exactly the MCU grid
        th, tw = mcuy * vi * 8, mcux * hi * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        blocks, by, bx = _plane_to_blocks(plane)
        comp_zz.append(_fdct_quant(blocks, qy if ci == 0 else qc))
        comp_grid.append((by, bx))

    # --- headers ---
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += seg(0xFFDB, bytes([0x00]) + bytes(int(v) for v in qy[ZIGZAG]))
    if ncomp == 3:
        out += seg(0xFFDB, bytes([0x01]) + bytes(int(v) for v in qc[ZIGZAG]))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += seg(0xFFC0, bytes(sof))
    for tc_th, (bits, vals) in (
        (0x00, HUFF_DC_LUMA),
        (0x10, HUFF_AC_LUMA),
        (0x01, HUFF_DC_CHROMA),
        (0x11, HUFF_AC_CHROMA),
    )[: 4 if ncomp == 3 else 2]:
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, bytes(sos))

    # --- entropy-coded scan, MCU interleaved ---
    dc_codes = [_canonical_codes(*HUFF_DC_LUMA), _canonical_codes(*HUFF_DC_CHROMA)]
    ac_codes = [_canonical_codes(*HUFF_AC_LUMA), _canonical_codes(*HUFF_AC_CHROMA)]
    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)])
                preds = [0] * ncomp
            mcu_count += 1
            for ci in range(ncomp):
                hi, vi = samp[ci]
                by, bx = comp_grid[ci]
                for dv in range(vi):
                    for dh in range(hi):
                        bidx = (my * vi + dv) * bx + (mx * hi + dh)
                        tsel = 0 if ci == 0 else 1
                        preds[ci] = _encode_block(
                            writer,
                            comp_zz[ci][bidx],
                            preds[ci],
                            dc_codes[tsel],
                            ac_codes[tsel],
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8: (h, w) for 1-component frames,
    (h, w, 3) RGB for 3-component YCbCr frames."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq)])
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        # T.81 §B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them instead of rejecting the stream
        while data[pos + 1] == 0xFF:
            pos += 1
            if pos + 4 > len(data):
                raise ValueError("JPEG truncated: no SOS/EOI")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                        np.int64
                    )
                    i += 64
                else:
                    vals = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(
                        np.int64
                    )
                    i += 128
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = vals
                qtables[tq] = tab
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htables[(tc, th)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # baseline SOF
            prec, fh, fw, nf = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported (precision {prec})")
            if nf not in (1, 3):
                raise ValueError(f"unsupported component count {nf}")
            comps = []
            for ci in range(nf):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF marker 0xFF{marker:02X}); "
                "only baseline sequential (SOF0/SOF1) decodes"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                scan_sel.append((cs, tt >> 4, tt & 0x0F))
            scan_pos = pos + 2 + ln
            return _decode_scan(
                data, scan_pos, frame, scan_sel, qtables, htables, restart_interval
            )
        # APPn / COM / others: skip
        pos += 2 + ln
    raise ValueError("JPEG truncated: no SOS/EOI")


def _decode_scan(
    data: bytes,
    pos: int,
    frame,
    scan_sel,
    qtables,
    htables,
    restart_interval: int,
) -> np.ndarray:
    fh, fw, comps = frame
    if len(scan_sel) != len(comps) and len(scan_sel) != 1:
        raise ValueError("partial (multi-scan) JPEG not supported")
    if len(scan_sel) == 1 and len(comps) > 1:
        # decode_jpeg returns after the FIRST scan, so decoding the
        # Y-only scan of a sequential non-interleaved color JPEG would
        # silently drop the chroma scans and misreport a color image
        # as grayscale — reject explicitly instead (the module's
        # ValueError contract; single-component FRAMES take the
        # non-interleaved path below)
        raise ValueError(
            f"multi-scan (non-interleaved) color JPEG not supported: frame "
            f"declares {len(comps)} components but the scan covers 1"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError(f"sampling factors up to 2 supported (got {hmax}x{vmax})")
    by_comp_id = {c[0]: i for i, c in enumerate(comps)}
    order = []
    zz_store: list[np.ndarray] = []
    grids: list[tuple[int, int]] = []
    if len(scan_sel) == 1:
        # T.81 §A.2.2: a single-component scan is NON-interleaved — the
        # MCU is one data unit and blocks traverse the component's OWN
        # grid (ceil(cw/8) x ceil(ch/8)), regardless of the frame's
        # declared sampling factors. Decoding it as interleaved would
        # read vi*hi blocks per MCU and desync the bit stream.
        cs, td, ta = scan_sel[0]
        ci = by_comp_id[cs]
        _, hi, vi, _tq = comps[ci]
        cw = (fw * hi + hmax - 1) // hmax
        ch = (fh * vi + vmax - 1) // vmax
        mcux = (cw + 7) // 8
        mcuy = (ch + 7) // 8
        grids.append((mcuy, mcux))
        zz_store.append(np.zeros((mcuy * mcux, 64), dtype=np.int64))
        order.append((ci, 1, 1, td, ta))  # one data unit per MCU
    else:
        mcux = (fw + 8 * hmax - 1) // (8 * hmax)
        mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
        for cs, td, ta in scan_sel:
            ci = by_comp_id[cs]
            _, hi, vi, _tq = comps[ci]
            grids.append((mcuy * vi, mcux * hi))
            zz_store.append(np.zeros((mcuy * vi * mcux * hi, 64), dtype=np.int64))
            order.append((ci, hi, vi, td, ta))

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # discard the pad bits to the byte boundary, then the
                # encoder must have emitted an RSTn marker here
                reader._acc = 0
                reader._nbits = 0
                if reader.pos + 1 >= len(reader.data):
                    raise ValueError("truncated scan data")
                if not (
                    reader.data[reader.pos] == 0xFF
                    and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7
                ):
                    raise ValueError("missing restart marker")
                reader.pos += 2
                preds = [0] * len(comps)
            try:
                for si, (ci, hi, vi, td, ta) in enumerate(order):
                    dct = htables.get((0, td))
                    act = htables.get((1, ta))
                    if dct is None or act is None:
                        raise ValueError("scan references undefined Huffman table")
                    _by, bx = grids[si]
                    for dv in range(vi):
                        for dh in range(hi):
                            zz = np.zeros(64, dtype=np.int64)
                            size = reader.huff(dct)
                            diff = _extend(reader.bits(size), size)
                            preds[ci] += diff
                            zz[0] = preds[ci]
                            k = 1
                            while k <= 63:
                                rs = reader.huff(act)
                                run, sz = rs >> 4, rs & 0x0F
                                if sz == 0:
                                    if run == 15:  # ZRL
                                        k += 16
                                        continue
                                    break  # EOB
                                k += run
                                if k > 63:
                                    raise ValueError("AC coefficient overrun")
                                zz[k] = _extend(reader.bits(sz), sz)
                                k += 1
                            bidx = (my * vi + dv) * bx + (mx * hi + dh)
                            zz_store[si][bidx] = zz
            except _RestartMarker:
                raise ValueError("restart marker misaligned with DRI interval")
            mcu_count += 1

    # --- reconstruct planes ---
    planes = []
    for si, (ci, _sh, _sv, _td, _ta) in enumerate(order):
        # upsample ratio comes from the component's TRUE sampling
        # factors, not the traversal steps in `order` (which are 1,1
        # for a non-interleaved single-component scan)
        _cid, hi, vi, tq = comps[ci]
        qt = qtables.get(tq)
        if qt is None:
            raise ValueError(f"frame references undefined quant table {tq}")
        by, bx = grids[si]
        blocks = _dequant_idct(zz_store[si], qt)
        plane = _blocks_to_plane(blocks, by, bx).astype(np.float64)
        # upsample to full-frame resolution (nearest, the JFIF default)
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
