"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs
over ``mapInPandas`` (SURVEY.md §2.3 extension surface).

The container has no image/audio codecs, so the *decode* step is
isolated behind ``_decode_payload``: by default it raises
``NotImplementedError`` (clearly marked stub); tests inject the
deterministic fake (``fake_codec=True``) which derives pixel metadata
from the payload bytes. Everything Spark-side — schema, partitioning,
UDF signatures, Arrow batch shapes — is real and tested.

Scale design: payloads never leave the executor as Python objects row
by row; ``mapInPandas`` streams Arrow record batches, so a 100 TB media
table decodes at batch granularity with bounded memory
(``spark.sql.execution.arrow.maxRecordsPerBatch`` sizes the batches).
Feature vectors come back as fixed-width ``array<float>`` ready for the
similarity operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

_MIME = {"image": "image/fake", "audio": "audio/fake", "video": "video/fake"}


def synthesize_media(spark: SparkSession, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table: payload bytes are sha256-derived
    from the media id, so every run (and every engine) sees identical
    binary content."""
    kinds = ("image", "audio", "video")
    rows = []
    for i in range(n):
        kind = kinds[i % len(kinds)]
        seed = hashlib.sha256(f"media-{i}".encode()).digest()
        payload = (seed * ((64 + i) // len(seed) + 1))[: 64 + i]
        rows.append((i, kind, payload, len(payload), _MIME[kind]))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions, "media_id")


def _decode_payload(payload: bytes, fake_codec: bool) -> tuple[int, int, int]:
    """Decode image metadata from payload bytes.

    REAL for PNG (the most common image format — pure stdlib zlib
    inflate + numpy scanline unfilter, golden-tested against the
    reference repo's own .png files) and for binary Netpbm; formats
    that genuinely need an external codec library (WebP/AVIF/…) raise
    ``NotImplementedError`` unless the clearly-marked deterministic
    fake is requested (``fake_codec=True`` — plumbing stand-in used by
    the stub-path unit tests, never by a registered query)."""
    from .codecs import PNG_SIGNATURE, decode_netpbm, decode_png
    from .gif import GIF_SIGNATURES, decode_gif
    from .jpeg import decode_jpeg

    head = bytes(payload[:8])
    if head == PNG_SIGNATURE:
        px = decode_png(payload)
        h, w = px.shape[:2]
        return w, h, (px.shape[2] if px.ndim == 3 else 1)
    if head[:2] in (b"P5", b"P6"):
        px = decode_netpbm(bytes(payload))
        h, w = px.shape[:2]
        return w, h, (px.shape[2] if px.ndim == 3 else 1)
    if head[:2] == b"\xff\xd8":
        px = decode_jpeg(payload)
        h, w = px.shape[:2]
        return w, h, (px.shape[2] if px.ndim == 3 else 1)
    if head[:6] in GIF_SIGNATURES:
        px = decode_gif(payload)
        h, w = px.shape[:2]
        return w, h, (px.shape[2] if px.ndim == 3 else 1)
    if not fake_codec:
        raise NotImplementedError(
            "PNG, baseline JPEG, GIF and binary Netpbm decode natively (pure "
            "stdlib/numpy); WebP/AVIF need a codec library (PIL/libvips) not "
            "present in this environment; pass fake_codec=True for the "
            "deterministic stub"
        )
    d = hashlib.sha256(payload).digest()
    width = 16 + d[0] % 240
    height = 16 + d[1] % 240
    channels = (1, 3, 4)[d[2] % 3]
    return width, height, channels


def decode_images(media: DataFrame, *, fake_codec: bool = False) -> DataFrame:
    """Decode metadata for image rows via mapInPandas (Arrow-batched)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                }
            )
            decoded = [_decode_payload(p, fake_codec) for p in pdf["payload"]]
            out["width"] = pd.array([d[0] for d in decoded], dtype="int32")
            out["height"] = pd.array([d[1] for d in decoded], dtype="int32")
            out["n_channels"] = pd.array([d[2] for d in decoded], dtype="int32")
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(decode, DECODED_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Intensity-histogram feature vectors (FEATURE_DIM floats,
    L1-normalized) via a scalar Pandas UDF — the Arrow-vectorized path
    a real encoder (CLIP etc.) would use. For PNG/Netpbm payloads the
    histogram is computed over the DECODED PIXEL intensities (a real,
    codec-backed image feature: 16 luma bins); for other payloads it
    falls back to the raw byte histogram (deterministic, codec-free —
    the audio/video stand-in)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def intensity_histogram(payloads: pd.Series) -> pd.Series:
        from .codecs import PNG_SIGNATURE, decode_netpbm, decode_png

        feats = []
        for p in payloads:
            head = bytes(p[:8])
            if head == PNG_SIGNATURE:
                arr = decode_png(p).ravel()
            elif head[:2] in (b"P5", b"P6"):
                arr = decode_netpbm(bytes(p)).ravel()
            else:
                arr = np.frombuffer(p, dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float64)
            total = hist.sum()
            feats.append((hist / total if total else hist).astype(np.float32))
        return pd.Series(feats)

    return media.select(
        "media_id", "kind", intensity_histogram(F.col("payload")).alias("features")
    )


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """'Video' frame sampling: split the payload into n_frames equal
    chunks (stand-in for keyframe extraction) and emit one row per
    frame with its digest — mapInPandas with a fan-out (rows out >
    rows in), the shape a real frame sampler has."""

    # media_id is nullable: an id-less record (NULL media_id with a
    # real payload) must ride through the fan-out as NULL, exactly as
    # a SQL engine would carry it — pandas' default int64 would raise
    # "cannot convert float NaN to integer" on it (caught by the
    # adversarial edge-document fixture)
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), True),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_md5", T.StringType(), False),
            T.StructField("frame_bytes", T.LongType(), False),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests, sizes = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                step = max(1, len(payload) // n_frames)
                for k in range(n_frames):
                    chunk = payload[k * step : (k + 1) * step]
                    if not chunk:
                        break
                    ids.append(None if pd.isna(mid) else int(mid))
                    idxs.append(k)
                    digests.append(hashlib.md5(chunk).hexdigest())
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_md5": digests,
                    "frame_bytes": pd.array(sizes, dtype="int64"),
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(frames, out_schema)


RESIZE_TARGET = 64  # longest-edge pixels after resize


def resize_images(
    media: DataFrame, target: int = RESIZE_TARGET, *, fake_codec: bool = False
) -> DataFrame:
    """Aspect-preserving thumbnail resize via mapInPandas.

    REAL for PNG and Netpbm payloads: decode the raster, nearest-
    neighbor resample the longest edge to ``target``, re-encode in the
    source format, and emit the resized FILE's digest + size. For
    formats needing an external codec the resample is STUBBED behind
    ``fake_codec`` (deterministic bytes standing in for the
    interpolated buffer). Output carries the digest and size, never
    the buffer — at 100 TB thumbnails write to object storage from
    the executor; only pointers and stats flow through the plan.
    """

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("orig_width", T.IntegerType(), False),
            T.StructField("orig_height", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("n_channels", T.IntegerType(), False),
            T.StructField("resized_md5", T.StringType(), False),
            T.StructField("resized_bytes", T.LongType(), False),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import (
            PNG_SIGNATURE,
            decode_netpbm,
            decode_png,
            encode_netpbm,
            encode_png,
            resize_nearest,
        )

        for pdf in batches:
            cols: dict[str, list] = {k: [] for k in out_schema.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                head = bytes(payload[:8])
                real = head == PNG_SIGNATURE or head[:2] in (b"P5", b"P6")
                if real:
                    is_png = head == PNG_SIGNATURE
                    px = decode_png(payload) if is_png else decode_netpbm(bytes(payload))
                    h, w = px.shape[:2]
                    c = px.shape[2] if px.ndim == 3 else 1
                else:
                    w, h, c = _decode_payload(payload, fake_codec)
                # shared thumbnail geometry: longest edge → target
                scale = target / max(w, h)
                nw = max(1, round(w * scale))
                nh = max(1, round(h * scale))
                if real:
                    resized = resize_nearest(px, nw, nh)
                    buf = encode_png(resized) if is_png else encode_netpbm(resized)
                else:
                    # STUB resample: deterministic bytes standing in for
                    # the interpolated pixel buffer
                    seed = hashlib.sha256(payload + f"{nw}x{nh}x{c}".encode()).digest()
                    buf = (seed * (nw * nh * c // len(seed) + 1))[: nw * nh * c]
                cols["media_id"].append(mid)
                cols["orig_width"].append(w)
                cols["orig_height"].append(h)
                cols["width"].append(nw)
                cols["height"].append(nh)
                cols["n_channels"].append(c)
                cols["resized_md5"].append(hashlib.md5(buf).hexdigest())
                cols["resized_bytes"].append(len(buf))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(cols["media_id"], dtype="int64"),
                    "orig_width": pd.array(cols["orig_width"], dtype="int32"),
                    "orig_height": pd.array(cols["orig_height"], dtype="int32"),
                    "width": pd.array(cols["width"], dtype="int32"),
                    "height": pd.array(cols["height"], dtype="int32"),
                    "n_channels": pd.array(cols["n_channels"], dtype="int32"),
                    "resized_md5": cols["resized_md5"],
                    "resized_bytes": pd.array(cols["resized_bytes"], dtype="int64"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(resize, out_schema)


AUDIO_FRAME_BYTES = 32
AUDIO_HOP_BYTES = 16


def window_audio_frames(
    media: DataFrame,
    frame_bytes: int = AUDIO_FRAME_BYTES,
    hop_bytes: int = AUDIO_HOP_BYTES,
) -> DataFrame:
    """'Audio' analysis windows: overlapped fixed-size byte frames over
    the payload (the PCM frame/hop chunking every audio featurizer
    starts with) with a per-frame byte-level energy statistic.

    Unlike the decode stub, the energy math is REAL — mean of squared
    centered byte values over the frame — because it needs no codec;
    only the interpretation of bytes as samples is the stand-in. Frames
    start every ``hop_bytes`` while a full ``frame_bytes`` window fits,
    so frame count = 1 + (len - frame_bytes) // hop_bytes (0 for
    payloads shorter than one frame) — asserted in tests.
    """

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("start_byte", T.LongType(), False),
            T.StructField("energy", T.DoubleType(), False),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, energies = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 128.0
                k = 0
                for start in range(0, len(buf) - frame_bytes + 1, hop_bytes):
                    frame = buf[start : start + frame_bytes]
                    ids.append(mid)
                    idxs.append(k)
                    starts.append(start)
                    energies.append(float(np.mean(frame * frame)))
                    k += 1
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "start_byte": pd.array(starts, dtype="int64"),
                    "energy": pd.array(energies, dtype="float64"),
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(frames, out_schema)


# ---------------------------------------------------------------------------
# REAL codec path (pure numpy — see multimodal/codecs.py): Netpbm images
# and WAV PCM16 audio need no external library, so decode / resize /
# sample-frame math below is genuine, not a stand-in. Only exotic
# BITSTREAMS (MP3/H.264 — psychoacoustic/entropy coders) remain behind
# the NotImplementedError stub; JPEG decodes natively since r9 (jpeg.py)
# and the MP4 CONTAINER layer demuxes natively since r10 (mp4.py).
# ---------------------------------------------------------------------------


def _det_bytes(tag: str, n: int) -> bytes:
    """Deterministic byte stream (sha256 counter mode) — every run and
    engine sees identical media content."""
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{tag}-{i}".encode()).digest()
        i += 1
    return bytes(out[:n])


def synthesize_netpbm_media(
    spark: SparkSession, n: int = 64, partitions: int = 4
) -> DataFrame:
    """Media table whose payloads are REAL files: binary PPM (P6, RGB)
    and PGM (P5, gray) images with deterministic pixel rasters, and
    RIFF/WAVE PCM16 audio with deterministic waveforms. The decode /
    resize / frame operators parse these with the pure-numpy codecs —
    actual pixels and samples, not digests."""
    from .codecs import encode_netpbm, encode_wav_pcm16

    rows = []
    for i in range(n):
        if i % 3 == 2:  # audio
            n_samples = 64 + 8 * i
            raw = _det_bytes(f"wav-{i}", n_samples * 2)
            samples = np.frombuffer(raw, dtype="<i2")
            payload = encode_wav_pcm16(samples, sample_rate=8000)
            rows.append((i, "audio", payload, len(payload), "audio/wav"))
        else:  # image: alternate RGB PPM and gray PGM
            w = 8 + (i * 3) % 25
            h = 6 + (i * 5) % 19
            c = 3 if i % 2 == 0 else 1
            raw = _det_bytes(f"img-{i}", w * h * c)
            px = np.frombuffer(raw, dtype=np.uint8)
            px = px.reshape((h, w, 3)) if c == 3 else px.reshape((h, w))
            payload = encode_netpbm(px)
            mime = "image/x-portable-pixmap" if c == 3 else "image/x-portable-graymap"
            rows.append((i, "image", payload, len(payload), mime))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions, "media_id")


def synthesize_png_media(
    spark: SparkSession, n: int = 64, partitions: int = 4
) -> DataFrame:
    """Media table whose image payloads are REAL PNG files (gray / RGB /
    RGBA rasters with deterministic pixels, encoded by the pure-stdlib
    codec) and whose audio payloads are RIFF/WAVE PCM16; video rows
    keep a raw deterministic byte stream (no container format decodes
    without an external library — the frame sampler chunks bytes, as
    documented). Every engine and run sees identical payload bytes."""
    from .codecs import encode_png, encode_wav_pcm16

    rows = []
    for i in range(n):
        if i % 3 == 2:  # audio
            n_samples = 64 + 8 * i
            raw = _det_bytes(f"wav-{i}", n_samples * 2)
            samples = np.frombuffer(raw, dtype="<i2")
            payload = encode_wav_pcm16(samples, sample_rate=8000)
            rows.append((i, "audio", payload, len(payload), "audio/wav"))
        elif i % 6 == 4:  # video: raw byte stream (chunk-sampled)
            payload = _det_bytes(f"vid-{i}", 256 + 16 * i)
            rows.append((i, "video", payload, len(payload), "application/octet-stream"))
        else:  # image: cycle gray / gray+alpha / RGB / RGBA PNG
            w = 8 + (i * 3) % 25
            h = 6 + (i * 5) % 19
            c = (1, 2, 3, 4)[(i // 3) % 4]  # i%3==2 is audio, so cycle by i//3
            raw = _det_bytes(f"png-{i}", w * h * c)
            px = np.frombuffer(raw, dtype=np.uint8)
            px = px.reshape((h, w)) if c == 1 else px.reshape((h, w, c))
            payload = encode_png(px)
            rows.append((i, "image", payload, len(payload), "image/png"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions, "media_id")


def decode_netpbm_images(media: DataFrame) -> DataFrame:
    """REAL image decode via mapInPandas: parse the Netpbm header and
    raster, return true (width, height, channels) plus a mean-luminance
    statistic computed from the actual pixels."""
    from .codecs import decode_netpbm

    out_schema = T.StructType(
        DECODED_SCHEMA.fields
        + [T.StructField("mean_luma", T.DoubleType(), True)]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, ws, hs, cs, lumas = [], [], [], [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                px = decode_netpbm(bytes(payload))
                h, w = px.shape[:2]
                c = px.shape[2] if px.ndim == 3 else 1
                ids.append(mid)
                kinds.append(kind)
                ws.append(w)
                hs.append(h)
                cs.append(c)
                lumas.append(float(px.astype(np.float64).mean()))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "kind": kinds,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "n_channels": pd.array(cs, dtype="int32"),
                    "mean_luma": pd.array(lumas, dtype="float64"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(decode, out_schema)


def resize_netpbm_images(media: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """REAL aspect-preserving thumbnail: decode the Netpbm raster,
    nearest-neighbor resample the longest edge to ``target``, re-encode,
    and emit the RESIZED FILE's digest + size (the buffer itself goes to
    object storage at scale, never through the plan)."""
    from .codecs import decode_netpbm, encode_netpbm, resize_nearest

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("orig_width", T.IntegerType(), False),
            T.StructField("orig_height", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("n_channels", T.IntegerType(), False),
            T.StructField("resized_md5", T.StringType(), False),
            T.StructField("resized_bytes", T.LongType(), False),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {k: [] for k in out_schema.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_netpbm(bytes(payload))
                h, w = px.shape[:2]
                c = px.shape[2] if px.ndim == 3 else 1
                scale = target / max(w, h)
                nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
                out = encode_netpbm(resize_nearest(px, nw, nh))
                cols["media_id"].append(mid)
                cols["orig_width"].append(w)
                cols["orig_height"].append(h)
                cols["width"].append(nw)
                cols["height"].append(nh)
                cols["n_channels"].append(c)
                cols["resized_md5"].append(hashlib.md5(out).hexdigest())
                cols["resized_bytes"].append(len(out))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(cols["media_id"], dtype="int64"),
                    "orig_width": pd.array(cols["orig_width"], dtype="int32"),
                    "orig_height": pd.array(cols["orig_height"], dtype="int32"),
                    "width": pd.array(cols["width"], dtype="int32"),
                    "height": pd.array(cols["height"], dtype="int32"),
                    "n_channels": pd.array(cols["n_channels"], dtype="int32"),
                    "resized_md5": cols["resized_md5"],
                    "resized_bytes": pd.array(cols["resized_bytes"], dtype="int64"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(resize, out_schema)


WAV_FRAME_SAMPLES = 64
WAV_HOP_SAMPLES = 32


def wav_frame_energy(
    media: DataFrame,
    frame_samples: int = WAV_FRAME_SAMPLES,
    hop_samples: int = WAV_HOP_SAMPLES,
) -> DataFrame:
    """REAL audio featurization: decode WAV PCM16 (RIFF chunk walk),
    window the int16 samples with frame/hop overlap, and emit each
    frame's RMS energy — actual sample math over an actual decode."""
    from .codecs import decode_wav_pcm16

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("start_sample", T.LongType(), False),
            T.StructField("rms", T.DoubleType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, rmss, rates = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_wav_pcm16(bytes(payload))
                x = samples.astype(np.float64)
                k = 0
                for start in range(0, len(x) - frame_samples + 1, hop_samples):
                    fr = x[start : start + frame_samples]
                    ids.append(mid)
                    idxs.append(k)
                    starts.append(start)
                    rmss.append(float(np.sqrt(np.mean(fr * fr))))
                    rates.append(rate)
                    k += 1
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "start_sample": pd.array(starts, dtype="int64"),
                    "rms": pd.array(rmss, dtype="float64"),
                    "sample_rate": pd.array(rates, dtype="int32"),
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(frames, out_schema)
