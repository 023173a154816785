"""Minimal ISO-BMFF (MP4) container mux/demux — pure struct packing.

VERDICT r9 task 8: video *metadata* needs no codec library — an MP4's
dimensions, duration, brand, codec fourcc and sample layout live in
plain big-endian boxes (ISO/IEC 14496-12), the same chunk-walk shape
as the PNG codec. This module writes a structurally-valid skeleton
file (``encode_mp4_skeleton``) and walks it back
(``parse_mp4_metadata``):

* REAL: the container layer — ftyp / moov / mvhd / trak / tkhd /
  mdia / mdhd / hdlr / minf / stbl (stsd / stts / stsc / stsz / stco)
  and mdat framing, including 64-bit ``largesize`` boxes, version-1
  (64-bit) mvhd/tkhd/mdhd, and to-end-of-file (size 0) boxes.
* STUBBED: the codec bitstream — ``mdat`` carries deterministic
  md5-counter filler, and the ``avc1`` sample entry's ``avcC`` holds
  empty parameter-set arrays. Entropy decoding genuinely requires a
  codec library and stays behind the NotImplementedError stub in
  multimodal/binary.py.

Reference parity note: the reference (1.cpp:248-264) reads whitespace
text only; binary containers are engine-new extension surface
(SURVEY.md §2.3 multimodal row).
"""

from __future__ import annotations

import struct


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


def _filler(tag: str, n: int) -> bytes:
    from .codecs import md5_counter_fill

    return md5_counter_fill(tag, n)


def encode_mp4_skeleton(
    *,
    width: int,
    height: int,
    timescale: int,
    n_samples: int,
    sample_delta: int,
    sample_sizes: list[int],
    seed: str = "mp4",
    brand: bytes = b"isom",
    codec: bytes = b"avc1",
) -> bytes:
    """Mux a minimal single-video-track MP4. The box tree is spec-
    shaped (a real demuxer reads the metadata); the sample payload is
    deterministic filler (declared stub — no entropy coder here)."""
    if len(sample_sizes) != n_samples:
        raise ValueError("sample_sizes length must equal n_samples")
    duration = n_samples * sample_delta

    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0x200) + brand + b"avc1")
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _full(
        b"tkhd",
        0,
        7,  # enabled | in_movie | in_preview
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8  # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, rsvd
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"video\x00"
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    # avc1 sample entry: SampleEntry header + visual fields + stub avcC
    avcc = _box(b"avcC", bytes([1, 0x42, 0x00, 0x1E, 0xFF, 0xE0, 0x00]))
    avc1 = _box(
        codec,
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
        + avcc,
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + avc1)
    stts = _full(
        b"stts", 0, 0, struct.pack(">III", 1, n_samples, sample_delta)
    )
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n_samples, 1))
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n_samples)
        + b"".join(struct.pack(">I", s) for s in sample_sizes),
    )
    stbl_wo_stco = stsd + stts + stsc + stsz
    # stco holds the absolute file offset of the first chunk (the mdat
    # payload), which depends on every preceding box's size — compute
    # it from the sizes assembled so far
    stco_size = 8 + 4 + 4 + 4
    stbl_size = 8 + len(stbl_wo_stco) + stco_size
    minf_size = 8 + len(vmhd) + len(dinf) + stbl_size
    mdia_size = 8 + len(mdhd) + len(hdlr) + minf_size
    trak_size = 8 + len(tkhd) + mdia_size
    moov_size = 8 + len(mvhd) + trak_size
    mdat_payload_off = len(ftyp) + moov_size + 8
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_payload_off))
    stbl = _box(b"stbl", stbl_wo_stco + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    mdat = _box(b"mdat", _filler(seed, sum(sample_sizes)))
    return ftyp + moov + mdat


def _iter_boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_end) walking [pos, end)."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4: box header past end")
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated MP4: largesize past end")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
            if size < 16:
                raise ValueError(f"invalid largesize {size}")
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        elif size < 8:
            raise ValueError(f"invalid box size {size} at offset {pos}")
        if pos + size > end:
            raise ValueError("truncated MP4: box body past end")
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, fourcc: bytes):
    for fc, b, e in _iter_boxes(data, pos, end):
        if fc == fourcc:
            return b, e
    raise ValueError(f"missing {fourcc.decode('latin1')} box")


def _full_header(data: bytes, pos: int) -> tuple[int, int]:
    """(version, body_start) of a FullBox payload."""
    return data[pos], pos + 4


def parse_mp4_samples(payload: bytes) -> list[tuple[int, int]]:
    """Per-sample ``(absolute_offset, size)`` from the sample tables —
    the demux arithmetic a frame extractor runs before any decode:
    stsz supplies sizes, stco the chunk base, stsc the chunk layout
    (this parser supports the single-chunk layout the skeleton muxer
    writes and rejects multi-chunk files explicitly)."""
    data = bytes(payload)
    end = len(data)
    if end < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")
    mb, me = _find(data, 0, end, b"moov")
    tb, te = _find(data, mb, me, b"trak")
    db, de = _find(data, tb, te, b"mdia")
    nb, ne = _find(data, db, de, b"minf")
    sb, se = _find(data, nb, ne, b"stbl")

    cb, _ce = _find(data, sb, se, b"stsc")
    _ver, body = _full_header(data, cb)
    (n_stsc,) = struct.unpack(">I", data[body : body + 4])
    if n_stsc != 1:
        raise ValueError("multi-chunk sample layout not supported")

    zb, _ze = _find(data, sb, se, b"stsz")
    _ver, body = _full_header(data, zb)
    sample_size, count = struct.unpack(">II", data[body : body + 8])
    if sample_size:
        sizes = [sample_size] * count
    else:
        sizes = [
            struct.unpack(">I", data[body + 8 + 4 * k : body + 12 + 4 * k])[0]
            for k in range(count)
        ]

    ob, _oe = _find(data, sb, se, b"stco")
    _ver, body = _full_header(data, ob)
    n_chunks, base = struct.unpack(">II", data[body : body + 8])
    if n_chunks != 1:
        raise ValueError("multi-chunk sample layout not supported")

    out, off = [], base
    for sz in sizes:
        if off + sz > end:
            raise ValueError("sample range past end of file")
        out.append((off, sz))
        off += sz
    return out


def parse_mp4_metadata(payload: bytes) -> dict:
    """Walk the box tree and return the container metadata a media
    pipeline catalogs before any decode: brand, movie duration (ms),
    track dimensions, codec fourcc, sample count, mdat byte length."""
    data = bytes(payload)
    end = len(data)
    if end < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")

    out: dict = {}
    fb, fe = _find(data, 0, end, b"ftyp")
    out["brand"] = data[fb : fb + 4].decode("latin1")

    mb, me = _find(data, 0, end, b"moov")
    vb, _ = _find(data, mb, me, b"mvhd")
    ver, body = _full_header(data, vb)
    if ver == 1:
        _c, _m, timescale = struct.unpack(">QQI", data[body : body + 20])
        (duration,) = struct.unpack(">Q", data[body + 20 : body + 28])
    else:
        _c, _m, timescale, duration = struct.unpack(">IIII", data[body : body + 16])
    if timescale == 0:
        raise ValueError("mvhd timescale is zero")
    out["duration_ms"] = duration * 1000 // timescale

    tb, te = _find(data, mb, me, b"trak")
    kb, _ = _find(data, tb, te, b"tkhd")
    ver, body = _full_header(data, kb)
    # width/height sit after the fixed-size prefix: v0 = 4*4B times/ids
    # + 8 rsvd + 8 layer/volume + 36 matrix; v1 widens 3 time fields
    off = body + (32 if ver == 1 else 20) + 8 + 8 + 36
    w_fixed, h_fixed = struct.unpack(">II", data[off : off + 8])
    out["width"] = w_fixed >> 16
    out["height"] = h_fixed >> 16

    db, de = _find(data, tb, te, b"mdia")
    nb, ne = _find(data, db, de, b"minf")
    sb, se = _find(data, nb, ne, b"stbl")
    xb, xe = _find(data, sb, se, b"stsd")
    _ver, body = _full_header(data, xb)
    (n_entries,) = struct.unpack(">I", data[body : body + 4])
    if n_entries < 1:
        raise ValueError("stsd has no sample entries")
    out["codec"] = data[body + 8 : body + 12].decode("latin1")

    zb, ze = _find(data, sb, se, b"stsz")
    _ver, body = _full_header(data, zb)
    sample_size, count = struct.unpack(">II", data[body : body + 8])
    out["n_samples"] = count

    total = 0
    for fc, b, e in _iter_boxes(data, 0, end):
        if fc == b"mdat":
            total += e - b
    out["mdat_bytes"] = total
    return out
