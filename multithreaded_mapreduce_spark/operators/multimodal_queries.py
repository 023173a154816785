"""Multimodal pipeline queries registered for the driver harness.

The media tables are synthesized deterministically (every engine and
every run sees identical payload bytes), and since r8 the image paths
are REAL end to end: payloads are genuine PNG (pure-stdlib zlib codec,
golden-tested against the reference repo's own .png inputs) or binary
Netpbm files, decoded/resampled/featurized from actual pixels. Only
formats that require an external codec library (MP3, video
BITSTREAMS) remain behind the clearly-marked stub (``fake_codec`` /
NotImplementedError), exercised by the plumbing unit tests — while
the MP4 CONTAINER layer demuxes natively since r10 (multimodal/mp4.py,
certified by media_mp4_metadata). What every query here exercises
for the 100 TB media pipeline: binary columns + typed metadata schema,
hash partitioning by media_id, Arrow-batched mapInPandas (bounded

r10 optimization note: every query here returns
``sortWithinPartitions(...)`` rather than a global ``orderBy`` — a
global sort's range partitioner runs a SAMPLING pass over its child,
and with an opaque mapInPandas codec subtree that pass re-executed the
whole Python encode/decode once per query (profiled: two ~14-16
exec-s codec stages in media_jpeg_roundtrip for one 500-row output).
The driver's comparison is order-insensitive (the r4 pair-producer
policy), so only the presentation order changes.

memory per batch), fan-out row production (frame sampling), and
fixed-width ``array<float>`` feature vectors compatible with the
similarity operators.

No DuckDB oracle for the synthesized-media queries (the media table is
built in-engine, not one of the driver's parquet tables): rows-only
checks there, with determinism/schema/batch-shape/fan-out asserted in
tests/test_multimodal.py. ``media_text_frames`` closes the gap: it runs
the same mapInPandas fan-out over documents.text cast to binary, where
DuckDB CAN compute the expected per-frame digests — the one multimodal
query with full value-level oracle parity.

Extension surface (SURVEY.md §2.3 multimodal row): the reference
processes whitespace-delimited text only (reference 1.cpp:248-264);
binary columns are engine-new.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..multimodal.binary import (
    decode_images,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)
from ..plans.registry import register

_N_MEDIA = 96


def _distinct_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct non-null, non-negative doc_ids, hash-distributed.

    The raster-from-id media queries derive their payload from doc_id
    ALONE, so their output contract is one row per DISTINCT id — a
    damaged corpus carrying a duplicated doc_id must not double-emit
    rows or inflate dup-group sizes (the oracles' id projections are
    DISTINCT for the same reason; the contract is pinned family-wide
    by tests/test_media_id_contract.py). spread() AFTER the dedup is
    load-bearing: AQE coalesces the dropDuplicates exchange's few-KB
    id shuffle into ONE partition, which would serialize all the
    downstream codec work onto a single core (measured: the r10 probe
    read media_png_roundtrip at 4.4 s/exp 0.84 without it vs
    ~1 s/exp 0.37 with — an explicit-count repartition is exempt from
    AQE coalescing).
    """
    from pyspark.sql import functions as F

    from ..sources.tables import load_table, spread

    return spread(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull() & (F.col("doc_id") >= 0))
        .select("doc_id")
        .dropDuplicates(["doc_id"])
    )


@register(
    "media_decode_metadata",
    oracle=None,
    description="REAL image decode via Arrow-batched mapInPandas: the "
    "image payloads are genuine PNG files (gray/RGB/RGBA) parsed by "
    "the pure-stdlib codec (zlib inflate + all five scanline "
    "unfilters) — true (width, height, channels) from actual chunk "
    "walking, not a digest stand-in. The decoder is golden-tested "
    "against the reference repo's own .png inputs (reference "
    "single.png 539x561 RGBA, vlarge1/2.png 558x672 RGBA) in "
    "tests/test_multimodal_codecs.py; only codec BITSTREAMS needing an "
    "external library (MP3, H.264) remain stubbed — the MP4 container "
    "itself demuxes natively (media_mp4_metadata).",
    tags=("multimodal", "image", "pandas-udf", "real-codec"),
)
def media_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary import synthesize_png_media

    return decode_images(synthesize_png_media(spark, n=_N_MEDIA)).sortWithinPartitions("media_id")


@register(
    "media_feature_vectors",
    oracle=None,
    description="REAL image feature extraction (16-dim L1-normalized "
    "array<float>) via scalar Pandas UDF: PNG payloads decode to "
    "pixels and the histogram runs over actual intensities (16 luma "
    "bins); non-image payloads fall back to the codec-free byte "
    "histogram. The Arrow-vectorized shape a real encoder "
    "(CLIP-style) plugs into.",
    tags=("multimodal", "features", "pandas-udf", "real-codec"),
)
def media_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary import synthesize_png_media

    return extract_features(synthesize_png_media(spark, n=_N_MEDIA))


@register(
    "media_frame_sample",
    oracle=None,
    description="Video frame sampling: mapInPandas fan-out (4 frames per "
    "video row) emitting per-frame digests — the keyframe-extraction "
    "plumbing with the codec stubbed.",
    tags=("multimodal", "video", "pandas-udf"),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(synthesize_media(spark, n=_N_MEDIA), n_frames=4)


@register(
    "media_text_frames",
    oracle="""
WITH params AS (
  -- payload = hex transcoding of the text: ASCII by construction, so
  -- the oracle's CHARACTER substr sees exactly the byte slices the
  -- Spark path takes (a raw-text payload would diverge on any
  -- multi-byte character: byte offsets vs char offsets)
  SELECT doc_id AS media_id, hex(encode(text)) AS htext,
         length(hex(encode(text))) AS len,
         greatest(1, length(hex(encode(text))) // 4) AS step
  FROM documents
  WHERE length(text) > 0
)
SELECT media_id,
       CAST(k AS INT) AS frame_idx,
       md5(substr(htext, CAST(k * step + 1 AS BIGINT), CAST(step AS BIGINT)))
         AS frame_md5,
       CAST(least(step, len - k * step) AS BIGINT) AS frame_bytes
FROM params, unnest(generate_series(0, 3)) AS u(k)
WHERE k * step < len
ORDER BY media_id, frame_idx
""",
    description="The frame-sampling mapInPandas fan-out VALUE-CHECKED "
    "against DuckDB: the hex transcoding of documents.text plays the "
    "video payload — ASCII by construction, so byte and character "
    "offsets agree for ANY input (raw text would diverge on the first "
    "multi-byte character); each doc splits into 4 equal chunks, and "
    "the per-frame md5 digests must match the oracle's substr+md5 "
    "exactly — proving the Arrow batch path (python slicing included) "
    "is byte-faithful, which the synthesized-media twins can only "
    "rows-check.",
    tags=("multimodal", "video", "pandas-udf", "oracle-checked"),
)
def media_text_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..sources.tables import load_table, spread

    docs = spread(
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            F.col("doc_id").alias("media_id"),
            F.lit("video").alias("kind"),
            F.hex("text").cast("binary").alias("payload"),
        )
    )
    return sample_frames(docs, n_frames=4).sortWithinPartitions("media_id", "frame_idx")


@register(
    "media_resize",
    oracle=None,
    description="REAL aspect-preserving thumbnails (longest edge → 64) "
    "via mapInPandas: PNG payloads decode to rasters, nearest-neighbor "
    "resample (deterministic integer index map), re-encode as PNG, and "
    "emit the resized file's digest + size — actual pixel resampling "
    "end to end. Emits digest + size per thumbnail, never the pixel "
    "buffer (at 100 TB thumbnails write to object storage from the "
    "executor).",
    tags=("multimodal", "image", "resize", "pandas-udf", "real-codec"),
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary import synthesize_png_media

    return resize_images(synthesize_png_media(spark, n=_N_MEDIA)).sortWithinPartitions("media_id")


@register(
    "media_audio_frames",
    oracle=None,
    description="Audio frame/hop windowing via mapInPandas: overlapped "
    "32-byte frames every 16 bytes over the payload (the PCM chunking "
    "every audio featurizer starts with) with REAL per-frame byte-level "
    "energy (mean squared centered byte value) — only the bytes-as-"
    "samples interpretation is a stand-in; frame-count/offset invariants "
    "are asserted in tests/test_multimodal.py. Rows-only check (binary "
    "synth input).",
    tags=("multimodal", "audio", "windowing", "pandas-udf"),
)
def media_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary import window_audio_frames

    return window_audio_frames(synthesize_media(spark, n=_N_MEDIA)).sortWithinPartitions(
        "media_id", "frame_idx"
    )


# ---------------------------------------------------------------------------
# REAL-codec queries (pure-numpy Netpbm + WAV — multimodal/codecs.py):
# unlike the *_fake twins above, decode/resize/energy below operate on
# actual pixels and samples. Still rows-only for the driver (the media
# table is synthesized in-engine, not a parquet input), but the codec
# itself is golden-tested: encode→decode round-trips, known-raster
# resizes, and RMS parity vs numpy in tests/test_multimodal_codecs.py.
# ---------------------------------------------------------------------------


@register(
    "media_netpbm_decode",
    oracle=None,
    description="REAL image decode via mapInPandas: binary PPM/PGM "
    "payloads parsed with the pure-numpy Netpbm codec — true width/"
    "height/channels from the header plus mean luminance from the "
    "actual raster. No external image library involved; only exotic "
    "codec bitstreams (MP3, H.264 etc.) remain stubbed.",
    tags=("multimodal", "image", "pandas-udf", "real-codec"),
)
def media_netpbm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary import decode_netpbm_images, synthesize_netpbm_media

    return decode_netpbm_images(synthesize_netpbm_media(spark, n=_N_MEDIA)).sortWithinPartitions(
        "media_id"
    )


@register(
    "media_netpbm_resize",
    oracle=None,
    description="REAL aspect-preserving thumbnails: decode the Netpbm "
    "raster, nearest-neighbor resample the longest edge to 64, re-encode "
    "and emit the resized file's digest + size — actual pixel resampling "
    "(deterministic integer index map), not a digest stand-in.",
    tags=("multimodal", "image", "resize", "pandas-udf", "real-codec"),
)
def media_netpbm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary import resize_netpbm_images, synthesize_netpbm_media

    return resize_netpbm_images(synthesize_netpbm_media(spark, n=_N_MEDIA)).sortWithinPartitions(
        "media_id"
    )


@register(
    "media_wav_energy",
    oracle=None,
    description="REAL audio featurization: RIFF/WAVE PCM16 payloads "
    "decoded with a chunk-walking parser, int16 samples windowed with "
    "64-sample frames every 32, per-frame RMS energy — actual sample "
    "math over an actual decode (pure numpy, no audio library).",
    tags=("multimodal", "audio", "windowing", "pandas-udf", "real-codec"),
)
def media_wav_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary import synthesize_netpbm_media, wav_frame_energy

    return wav_frame_energy(synthesize_netpbm_media(spark, n=_N_MEDIA)).sortWithinPartitions(
        "media_id", "frame_idx"
    )


@register(
    "media_png_roundtrip",
    oracle="""
WITH p AS (
  SELECT DISTINCT doc_id,
         4 + doc_id % 9 AS w,
         3 + doc_id % 7 AS h,
         CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS c
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
), blocks AS (
  SELECT doc_id, w, h, c, j,
         md5('png:' || CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS hx
  FROM p, unnest(range(0, CAST(ceil(w*h*c/16.0) AS BIGINT))) AS u(j)
), stream AS (
  SELECT doc_id, w, h, c, string_agg(hx, '' ORDER BY j) AS hexstream
  FROM blocks GROUP BY doc_id, w, h, c
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(c AS INT) AS n_channels,
       CAST(w*h*c AS BIGINT) AS n_px,
       md5(substr(hexstream, 1, CAST(w*h*c*2 AS BIGINT))) AS px_md5
FROM stream
ORDER BY doc_id
""",
    description="PNG codec certification, ORACLE-CHECKED: every doc_id "
    "derives a deterministic raster (md5-counter bytes; gray/RGB/RGBA "
    "cycling, dims from the id), the executor ENCODES it to a real "
    "PNG (scanlines forward-filtered with the doc_id-seeded rotation "
    "(doc_id + y) % 5, so all five spec-§9 filters — None/Sub/Up/"
    "Average/Paeth — are exercised by the hash match, not only filter "
    "0) and DECODES it back through the pure-stdlib codec, and the "
    "emitted digest is the md5 of the decoded raster's hex — while "
    "DuckDB reproduces the same digest from pure md5 string "
    "arithmetic, never touching a PNG. A hash match certifies the "
    "compress → filter → chunk → inflate → unfilter round trip is "
    "byte-lossless for every raster in the corpus — the driver-"
    "checkable closure of the codec-path family (the synthesized-"
    "media twins can only rows-check). The payload is built and "
    "consumed inside one mapInPandas task: pixels never shuffle, "
    "only (id, dims, 32-byte digest) rows leave the executor.",
    tags=("multimodal", "image", "pandas-udf", "real-codec", "oracle-checked"),
)
def media_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    docs = _distinct_ids(spark, sf_dir)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("n_channels", T.IntegerType(), False),
            T.StructField("n_px", T.LongType(), False),
            T.StructField("px_md5", T.StringType(), False),
        ]
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..multimodal.codecs import decode_png, encode_png, md5_counter_fill

        for pdf in batches:
            ids, ws, hs, cs, npx, digs = [], [], [], [], [], []
            for mid in pdf["doc_id"]:
                i = int(mid)
                w, h = 4 + i % 9, 3 + i % 7
                c = (1, 3, 4)[i % 3]
                need = w * h * c
                px = np.frombuffer(md5_counter_fill(f"png:{i}", need), dtype=np.uint8)
                px = px.reshape((h, w)) if c == 1 else px.reshape((h, w, c))
                # doc_id-seeded scanline filters: scanline y is
                # forward-filtered with type (i + y) % 5, so across the
                # corpus (and within any raster with h >= 5) every spec
                # §9 filter — None/Sub/Up/Average/Paeth — is exercised
                # by the driver-checked digest match, not only filter 0.
                back = decode_png(encode_png(px, filter_seed=i))
                ids.append(i)
                ws.append(back.shape[1])
                hs.append(back.shape[0])
                cs.append(back.shape[2] if back.ndim == 3 else 1)
                npx.append(back.size)
                digs.append(hashlib.md5(back.tobytes().hex().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "n_channels": pd.array(cs, dtype="int32"),
                    "n_px": pd.array(npx, dtype="int64"),
                    "px_md5": digs,
                }
            )

    return docs.mapInPandas(roundtrip, out_schema).sortWithinPartitions("doc_id")


@register(
    "media_jpeg_roundtrip",
    oracle="""
SELECT DISTINCT doc_id,
       CAST(16 + doc_id % 17 AS INT) AS width,
       CAST(16 + doc_id % 13 AS INT) AS height,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT) AS n_channels,
       CAST((16 + doc_id % 17) * (16 + doc_id % 13)
            * (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END) AS BIGINT) AS n_px,
       CASE WHEN doc_id % 3 = 0 THEN '420' ELSE '444' END AS subsampling,
       CAST(doc_id % 4 AS INT) AS restart_interval,
       TRUE AS within_tol
FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
ORDER BY doc_id
""",
    description="Baseline-JPEG codec certification, ORACLE-CHECKED: "
    "every doc_id derives a deterministic SMOOTH raster (linear ramp, "
    "gray/RGB alternating, dims from the id), the executor ENCODES it "
    "with the pure-numpy baseline JPEG coder (Annex K tables; quality, "
    "4:2:0/4:4:4 subsampling and DRI restart interval all cycled from "
    "the id so every encoder/decoder feature is exercised) and DECODES "
    "it back through the marker walk + Huffman + IDCT path. JPEG is "
    "lossy, so unlike media_png_roundtrip the certified artifact is "
    "the BOUNDED-ERROR CONTRACT: decoded dims must equal the oracle's "
    "arithmetic exactly and max|decoded - original| <= 4 (measured "
    "worst case 2 on this raster family) — a broken DCT, quant table, "
    "Huffman code or upsampler fails the bound or the dims hash. "
    "Bit-level determinism is pinned by digest tests in "
    "tests/test_jpeg_codec.py (the netpbm pattern). Pixels never "
    "shuffle: encode+decode live inside one mapInPandas task and only "
    "(id, dims, flags) rows leave the executor.",
    tags=("multimodal", "image", "pandas-udf", "real-codec", "oracle-checked"),
)
def media_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    docs = _distinct_ids(spark, sf_dir)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("n_channels", T.IntegerType(), False),
            T.StructField("n_px", T.LongType(), False),
            T.StructField("subsampling", T.StringType(), False),
            T.StructField("restart_interval", T.IntegerType(), False),
            T.StructField("within_tol", T.BooleanType(), False),
        ]
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..multimodal.jpeg import decode_jpeg, encode_jpeg

        for pdf in batches:
            rows = {k: [] for k in out_schema.fieldNames()}
            for mid in pdf["doc_id"]:
                i = int(mid)
                w, h = 16 + i % 17, 16 + i % 13
                c = 1 if i % 2 == 0 else 3
                yy, xx = np.mgrid[0:h, 0:w]
                if c == 1:
                    px = (((i * 37) % 128) + yy + xx).astype(np.uint8)
                else:
                    px = np.stack(
                        [(((i * 37 + ch * 40) % 128) + yy + xx) for ch in range(3)],
                        axis=-1,
                    ).astype(np.uint8)
                sub = "420" if i % 3 == 0 else "444"
                ri = i % 4
                back = decode_jpeg(
                    encode_jpeg(
                        px,
                        quality=85 + i % 11,
                        subsampling=sub,
                        restart_interval=ri,
                    )
                )
                ok = back.shape == px.shape and bool(
                    np.abs(back.astype(np.int64) - px.astype(np.int64)).max() <= 4
                )
                rows["doc_id"].append(i)
                rows["width"].append(back.shape[1])
                rows["height"].append(back.shape[0])
                rows["n_channels"].append(back.shape[2] if back.ndim == 3 else 1)
                rows["n_px"].append(int(back.size))
                rows["subsampling"].append(sub)
                rows["restart_interval"].append(ri)
                rows["within_tol"].append(ok)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(rows["doc_id"], dtype="int64"),
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "n_channels": pd.array(rows["n_channels"], dtype="int32"),
                    "n_px": pd.array(rows["n_px"], dtype="int64"),
                    "subsampling": rows["subsampling"],
                    "restart_interval": pd.array(
                        rows["restart_interval"], dtype="int32"
                    ),
                    "within_tol": pd.array(rows["within_tol"], dtype="boolean"),
                }
            )

    return docs.mapInPandas(roundtrip, out_schema).sortWithinPartitions("doc_id")


@register(
    "media_wav_roundtrip",
    oracle="""
WITH p AS (
  SELECT DISTINCT doc_id,
         64 + doc_id % 97 AS n,
         8000 + (doc_id % 4) * 4000 AS rate
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
), blocks AS (
  SELECT doc_id, n, rate, j,
         md5('wav:' || CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS hx
  FROM p, unnest(range(0, CAST(ceil(n*2/16.0) AS BIGINT))) AS u(j)
), stream AS (
  SELECT doc_id, n, rate, string_agg(hx, '' ORDER BY j) AS s
  FROM blocks GROUP BY doc_id, n, rate
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(rate AS INT) AS sample_rate,
       md5(substr(s, 1, CAST(n*4 AS BIGINT))) AS pcm_md5
FROM stream
ORDER BY doc_id
""",
    description="WAV PCM16 codec certification, ORACLE-CHECKED — the "
    "audio closure of the codec-certification family (PNG r8, JPEG "
    "r9): every doc_id derives a deterministic int16 sample stream "
    "(md5-counter bytes, little-endian; length and sample rate cycled "
    "from the id), the executor ENCODES it to a real RIFF/WAVE file "
    "and DECODES it back through the chunk-walking parser, and the "
    "emitted digest is the md5 of the decoded samples' byte hex — "
    "while DuckDB reproduces the same digest from pure md5 string "
    "arithmetic, never touching a WAV. WAV is lossless, so a hash "
    "match certifies header layout, chunk walk and sample byte order "
    "end to end (the rows-only media_wav_energy twin can now lean on "
    "a driver-checked codec). Samples never shuffle: encode+decode "
    "live inside one mapInPandas task and only (id, n, rate, digest) "
    "rows leave the executor.",
    tags=("multimodal", "audio", "pandas-udf", "real-codec", "oracle-checked"),
)
def media_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    docs = _distinct_ids(spark, sf_dir)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("pcm_md5", T.StringType(), False),
        ]
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..multimodal.codecs import decode_wav_pcm16, encode_wav_pcm16, md5_counter_fill

        for pdf in batches:
            ids, ns, rates, digs = [], [], [], []
            for mid in pdf["doc_id"]:
                i = int(mid)
                n = 64 + i % 97
                rate = 8000 + (i % 4) * 4000
                need = n * 2
                samples = np.frombuffer(md5_counter_fill(f"wav:{i}", need), dtype="<i2")
                back, back_rate = decode_wav_pcm16(encode_wav_pcm16(samples, rate))
                ids.append(i)
                ns.append(int(back.size))
                rates.append(int(back_rate))
                digs.append(
                    hashlib.md5(
                        back.astype("<i2").tobytes().hex().encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "n_samples": pd.array(ns, dtype="int64"),
                    "sample_rate": pd.array(rates, dtype="int32"),
                    "pcm_md5": digs,
                }
            )

    return docs.mapInPandas(roundtrip, out_schema).sortWithinPartitions("doc_id")


@register(
    "media_phash_dedup",
    oracle="""
WITH p AS (
  SELECT DISTINCT doc_id, doc_id // 3 AS g,
         16 + (doc_id // 3) % 13 AS w,
         12 + (doc_id // 3) % 9 AS h
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
), blocks AS (
  SELECT doc_id, g, w, h, j,
         md5('img:' || CAST(g AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS hx
  FROM p, unnest(range(0, CAST(ceil(w*h/16.0) AS BIGINT))) AS u(j)
), stream AS (
  SELECT doc_id, w, h, string_agg(hx, '' ORDER BY j) AS s
  FROM blocks GROUP BY doc_id, w, h
), cells AS (
  SELECT doc_id, k,
         ((k // 8) * h) // 8 AS yi,
         ((k % 8) * w) // 9 AS xi,
         (((k % 8) + 1) * w) // 9 AS xj,
         w, s
  FROM stream, unnest(range(0, 64)) AS u(k)
), vals AS (
  SELECT doc_id, k,
    ((strpos('0123456789abcdef', substr(substr(s, (yi*w+xi)*2+1, 2),1,1))-1)*16
     + (strpos('0123456789abcdef', substr(substr(s, (yi*w+xi)*2+1, 2),2,1))-1))*250//255 AS va,
    ((strpos('0123456789abcdef', substr(substr(s, (yi*w+xj)*2+1, 2),1,1))-1)*16
     + (strpos('0123456789abcdef', substr(substr(s, (yi*w+xj)*2+1, 2),2,1))-1))*250//255 AS vb
  FROM cells
), hashes AS (
  SELECT doc_id,
    printf('%08x%08x',
      CAST(sum(CASE WHEN va < vb AND k >= 32 THEN 1::BIGINT << (k-32) ELSE 0 END) AS BIGINT),
      CAST(sum(CASE WHEN va < vb AND k < 32 THEN 1::BIGINT << k ELSE 0 END) AS BIGINT)
    ) AS phash
  FROM vals GROUP BY doc_id
)
SELECT doc_id, phash,
       CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS dup_group_size
FROM hashes
ORDER BY doc_id
""",
    description="Perceptual-hash image dedup, ORACLE-CHECKED through "
    "the REAL codec: every doc_id derives a raster whose CONTENT "
    "repeats every 3 ids but whose BYTES differ (a per-id brightness "
    "shift — the re-encoded/re-uploaded image the exact-digest dedups "
    "cannot catch); the executor PNG-encodes it (doc_id-seeded "
    "scanline filters), decodes it back, and computes an 8x8 "
    "difference hash (dHash) from the DECODED pixels — floor-map "
    "nearest resample to 8x9, left<right gradient bits, 64-bit "
    "fingerprint as hex. Brightness shifts cancel in the gradient "
    "comparisons, so near-dup variants collapse to one fingerprint, "
    "which DuckDB reproduces from pure md5/strpos arithmetic without "
    "touching a pixel — certifying codec roundtrip, resample map, "
    "gradient bits and group sizes in one hash match. Scale shape: "
    "pixels never shuffle (hashing lives in one mapInPandas task); "
    "only (id, 8-byte fingerprint) rows reach the dup-group exchange, "
    "the same digest-groupBy plan as dedup_exact — at 100 TB swap "
    "dHash for any stronger perceptual hash inside the same task.",
    tags=("multimodal", "image", "dedup", "pandas-udf", "real-codec", "oracle-checked"),
)
def media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..plans.caching import tracked_persist
    docs = _distinct_ids(spark, sf_dir)
    hash_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("phash", T.StringType(), False),
        ]
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..multimodal.codecs import decode_png, encode_png, md5_counter_fill

        for pdf in batches:
            ids, hs = [], []
            for mid in pdf["doc_id"]:
                i = int(mid)
                g = i // 3
                w, h = 16 + g % 13, 12 + g % 9
                need = w * h
                b = np.frombuffer(md5_counter_fill(f"img:{g}", need), dtype=np.uint8).astype(np.int64)
                px = ((b * 250) // 255 + i % 3).astype(np.uint8).reshape(h, w)
                # real-codec roundtrip: hash what a decoder actually sees
                px = decode_png(encode_png(px, filter_seed=i))
                bits = 0
                for y in range(8):
                    yi = (y * h) // 8
                    row = px[yi].astype(np.int64)
                    for x in range(8):
                        xi, xj = (x * w) // 9, ((x + 1) * w) // 9
                        if row[xi] < row[xj]:
                            bits |= 1 << (y * 8 + x)
                ids.append(i)
                hs.append("%016x" % bits)
            yield pd.DataFrame(
                {"doc_id": pd.array(ids, dtype="int64"), "phash": hs}
            )

    hashes = docs.mapInPandas(hash_batch, hash_schema).transform(tracked_persist)
    groups = hashes.groupBy("phash").agg(
        F.count(F.lit(1)).cast("bigint").alias("dup_group_size")
    )
    return (
        hashes.join(groups, "phash")
        .select("doc_id", "phash", "dup_group_size")
        .sortWithinPartitions("doc_id")
    )


@register(
    "media_phash_near_pairs",
    oracle="""
WITH p AS (
  SELECT DISTINCT doc_id, doc_id // 2 AS b, doc_id % 2 AS v,
         18 + (doc_id // 2) % 11 AS w, 14 + (doc_id // 2) % 7 AS h
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
), blocks AS (
  SELECT doc_id, b, v, w, h, j,
         md5('nearimg:' || CAST(b AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS hx
  FROM p, unnest(range(0, CAST(ceil(w*h/16.0) AS BIGINT))) AS u(j)
), stream AS (
  SELECT doc_id, b, v, w, h, string_agg(hx, '' ORDER BY j) AS s
  FROM blocks GROUP BY ALL
), pert AS (
  SELECT *, ((b%8)*h)//8 AS py, ((b%8)*w)//9 AS pxi, (((b%8)+1)*w)//9 AS pxj
  FROM stream
), cells AS (
  SELECT doc_id, v, k,
         ((k // 8) * h) // 8 AS yi,
         ((k % 8) * w) // 9 AS xi,
         (((k % 8) + 1) * w) // 9 AS xj,
         w, s, py, pxi, pxj
  FROM pert, unnest(range(0, 64)) AS u(k)
), vals AS (
  SELECT doc_id, k,
    CASE WHEN v=1 AND yi*w+xi = py*w+pxi THEN 200
         WHEN v=1 AND yi*w+xi = py*w+pxj THEN 100
         ELSE ((strpos('0123456789abcdef', substr(substr(s,(yi*w+xi)*2+1,2),1,1))-1)*16
              + (strpos('0123456789abcdef', substr(substr(s,(yi*w+xi)*2+1,2),2,1))-1))*250//255
    END AS va,
    CASE WHEN v=1 AND yi*w+xj = py*w+pxi THEN 200
         WHEN v=1 AND yi*w+xj = py*w+pxj THEN 100
         ELSE ((strpos('0123456789abcdef', substr(substr(s,(yi*w+xj)*2+1,2),1,1))-1)*16
              + (strpos('0123456789abcdef', substr(substr(s,(yi*w+xj)*2+1,2),2,1))-1))*250//255
    END AS vb
  FROM cells
), hashes AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN va < vb AND k < 32 THEN 1::BIGINT << k ELSE 0 END) AS BIGINT) AS lo,
    CAST(sum(CASE WHEN va < vb AND k >= 32 THEN 1::BIGINT << (k-32) ELSE 0 END) AS BIGINT) AS hi
  FROM vals GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b,
         CAST(bit_count(CAST(xor(a.lo, bb.lo) AS BIGINT))
            + bit_count(CAST(xor(a.hi, bb.hi) AS BIGINT)) AS BIGINT) AS hamming
  FROM hashes a JOIN hashes bb ON a.doc_id < bb.doc_id
   AND ( (a.lo & 65535) = (bb.lo & 65535)
      OR ((a.lo >> 16) & 65535) = ((bb.lo >> 16) & 65535)
      OR (a.hi & 65535) = (bb.hi & 65535)
      OR ((a.hi >> 16) & 65535) = ((bb.hi >> 16) & 65535))
)
SELECT doc_a, doc_b, hamming FROM pairs
WHERE hamming BETWEEN 1 AND 6
ORDER BY doc_a, doc_b
""",
    description="Perceptual NEAR-duplicate image pairs, ORACLE-CHECKED "
    "through the real codec: the raster family plants pairs (2b, 2b+1) "
    "sharing content where the odd variant carries a deterministic "
    "localized pixel perturbation — a few dHash gradient bits flip, so "
    "exact-fingerprint grouping (media_phash_dedup) misses the pair "
    "but Hamming-banded LSH recovers it: each 64-bit dHash splits "
    "into 4x16-bit bands, candidates share at least one band "
    "(guaranteed complete for Hamming <= 3 by pigeonhole), survivors "
    "filter on true Hamming in [1, 6]. DuckDB reproduces the hashes "
    "from md5/strpos arithmetic and the SAME candidate rule as an "
    "OR-of-band-equalities, so the reported pair set — an LSH "
    "candidate geometry, not just values — is certified bit-for-bit "
    "(the dedup_minhash_verified pattern, transplanted to images). "
    "Scale shape: pixels stay in the mapInPandas task; the band "
    "self-join shuffles (band, 16-bit key) rows only — the banded "
    "near-dup plan class the text dedups already prove out.",
    tags=("multimodal", "image", "dedup", "lsh", "pandas-udf", "real-codec", "oracle-checked"),
)
def media_phash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..plans.caching import tracked_persist
    docs = _distinct_ids(spark, sf_dir)
    hash_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("lo", T.LongType(), False),
            T.StructField("hi", T.LongType(), False),
        ]
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..multimodal.codecs import decode_png, encode_png, md5_counter_fill

        for pdf in batches:
            ids, los, his = [], [], []
            for mid in pdf["doc_id"]:
                i = int(mid)
                b, v = i // 2, i % 2
                w, h = 18 + b % 11, 14 + b % 7
                need = w * h
                vals = (
                    np.frombuffer(md5_counter_fill(f"nearimg:{b}", need), dtype=np.uint8).astype(np.int64)
                    * 250
                ) // 255
                if v == 1:
                    py, px0 = (b % 8 * h) // 8, (b % 8 * w) // 9
                    pxj = ((b % 8 + 1) * w) // 9
                    vals[py * w + px0] = 200
                    vals[py * w + pxj] = 100
                px = vals.astype(np.uint8).reshape(h, w)
                px = decode_png(encode_png(px, filter_seed=i))
                bits = 0
                for y in range(8):
                    yi = (y * h) // 8
                    row = px[yi].astype(np.int64)
                    for x in range(8):
                        xi, xj = (x * w) // 9, ((x + 1) * w) // 9
                        if row[xi] < row[xj]:
                            bits |= 1 << (y * 8 + x)
                ids.append(i)
                los.append(bits & 0xFFFFFFFF)
                his.append(bits >> 32)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "lo": pd.array(los, dtype="int64"),
                    "hi": pd.array(his, dtype="int64"),
                }
            )

    hashes = docs.mapInPandas(hash_batch, hash_schema).transform(tracked_persist)
    mask = F.lit(65535)
    band_vals = F.array(
        F.col("lo").bitwiseAND(mask),
        F.shiftright("lo", 16).bitwiseAND(mask),
        F.col("hi").bitwiseAND(mask),
        F.shiftright("hi", 16).bitwiseAND(mask),
    )
    bands = hashes.select(
        "doc_id", "lo", "hi", F.posexplode(band_vals).alias("band", "band_val")
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
        "band",
        "band_val",
    )
    bb = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
        "band",
        "band_val",
    )
    cand = (
        a.join(bb, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "lo_a", "hi_a", "lo_b", "hi_b")
        .distinct()
    )
    hamming = (
        F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
        + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    ).cast("bigint")
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming").between(1, 6))
        .sortWithinPartitions("doc_a", "doc_b")
    )


@register(
    "media_audio_fp_dedup",
    oracle="""
WITH p AS (
  SELECT DISTINCT doc_id, doc_id // 3 AS g,
         256 + ((doc_id // 3) % 5) * 64 AS n
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
), blocks AS (
  SELECT doc_id, g, n, j,
         md5('afp:' || CAST(g AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS hx
  FROM p, unnest(range(0, CAST(ceil(n/16.0) AS BIGINT))) AS u(j)
), stream AS (
  SELECT doc_id, n, string_agg(hx, '' ORDER BY j) AS s
  FROM blocks GROUP BY doc_id, n
), cells AS (
  SELECT doc_id, k, k // (n // 32) AS w,
         abs((((strpos('0123456789abcdef', substr(s, k*2+1, 1))-1)*16
             + (strpos('0123456789abcdef', substr(s, k*2+2, 1))-1)) % 64) - 32) AS a
  FROM stream, unnest(range(0, CAST(n AS BIGINT))) AS u(k)
), energies AS (
  SELECT doc_id, w, sum(a) AS e FROM cells GROUP BY doc_id, w
), fps AS (
  SELECT a.doc_id,
         CAST(sum(CASE WHEN a.e < b.e THEN 1::BIGINT << a.w ELSE 0 END) AS BIGINT)
           AS afp
  FROM energies a JOIN energies b ON a.doc_id = b.doc_id AND b.w = a.w + 1
  GROUP BY a.doc_id
)
SELECT doc_id, afp,
       CAST(count(*) OVER (PARTITION BY afp) AS BIGINT) AS dup_group_size
FROM fps
ORDER BY doc_id
""",
    description="Perceptual AUDIO dedup, ORACLE-CHECKED through the "
    "real WAV codec — the audio twin of media_phash_dedup: every "
    "doc_id derives a PCM16 stream whose CONTENT repeats every 3 ids "
    "but whose BYTES differ (a per-id integer GAIN — the re-mastered/"
    "re-encoded upload exact-digest dedup cannot catch); the executor "
    "encodes it to a real RIFF/WAVE file, decodes it back through the "
    "chunk-walking parser, and fingerprints the DECODED samples with "
    "a 31-bit energy-profile signature (32 windows, per-window sum of "
    "|sample|, bit w = e_w < e_w+1). Gain scales every window energy "
    "by the same factor, so the strict comparisons — and the "
    "fingerprint — are gain-invariant: variants collapse to one "
    "fingerprint, which DuckDB reproduces from pure md5/strpos "
    "arithmetic without touching a WAV, certifying codec roundtrip, "
    "windowing, energy sums and group sizes in one hash match. Scale "
    "shape: samples never shuffle (fingerprinting lives in one "
    "mapInPandas task); only (id, 8-byte fingerprint) rows reach the "
    "dup-group exchange — the dedup_exact digest-groupBy plan. At "
    "100 TB swap the energy profile for a chromaprint-style "
    "spectrogram hash inside the same task shape.",
    tags=("multimodal", "audio", "dedup", "pandas-udf", "real-codec", "oracle-checked"),
)
def media_audio_fp_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..plans.caching import tracked_persist

    docs = _distinct_ids(spark, sf_dir)
    fp_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("afp", T.LongType(), False),
        ]
    )

    def fp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..multimodal.codecs import decode_wav_pcm16, encode_wav_pcm16, md5_counter_fill

        for pdf in batches:
            ids, fps = [], []
            for mid in pdf["doc_id"]:
                i = int(mid)
                g, gain = i // 3, 1 + i % 3
                n = 256 + (g % 5) * 64
                base = (
                    np.frombuffer(md5_counter_fill(f"afp:{g}", n), dtype=np.uint8).astype(np.int64)
                    % 64
                ) - 32
                samples = (base * gain).astype("<i2")
                # real-codec roundtrip: fingerprint what a decoder
                # actually hands back, not the synthesized array
                back, _rate = decode_wav_pcm16(
                    encode_wav_pcm16(samples, 8000 + (g % 4) * 4000)
                )
                x = np.abs(back.astype(np.int64)).reshape(32, n // 32)
                e = x.sum(axis=1)
                bits = 0
                for w in range(31):
                    if e[w] < e[w + 1]:
                        bits |= 1 << w
                ids.append(i)
                fps.append(bits)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "afp": pd.array(fps, dtype="int64"),
                }
            )

    fps = docs.mapInPandas(fp_batch, fp_schema).transform(tracked_persist)
    groups = fps.groupBy("afp").agg(
        F.count(F.lit(1)).cast("bigint").alias("dup_group_size")
    )
    return (
        fps.join(groups, "afp")
        .select("doc_id", "afp", "dup_group_size")
        .sortWithinPartitions("doc_id")
    )


@register(
    "media_mp4_metadata",
    oracle="""
WITH p AS (
  SELECT DISTINCT doc_id,
         8 + doc_id % 25 AS n,
         100 + (doc_id % 5) * 10 AS delta
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
), sizes AS (
  SELECT doc_id, sum(50 + (doc_id + k) % 17) AS mb
  FROM p, unnest(range(0, CAST(n AS BIGINT))) AS u(k)
  GROUP BY doc_id
)
SELECT p.doc_id,
       'isom' AS brand,
       'avc1' AS codec,
       CAST(16 * (2 + p.doc_id % 9) AS INT) AS width,
       CAST(16 * (2 + p.doc_id % 7) AS INT) AS height,
       CAST(p.n * p.delta * 1000 // 600 AS BIGINT) AS duration_ms,
       CAST(p.n AS BIGINT) AS n_samples,
       CAST(s.mb AS BIGINT) AS mdat_bytes
FROM p JOIN sizes s USING (doc_id)
ORDER BY p.doc_id
""",
    description="ISO-BMFF (MP4) container metadata, ORACLE-CHECKED "
    "(VERDICT r9 task 8): every doc_id derives deterministic video "
    "parameters (dims, sample count, per-sample duration and sizes), "
    "the executor MUXES a structurally-valid single-track MP4 — ftyp/"
    "moov/mvhd/tkhd/stsd(avc1)/stts/stsz/stco + mdat, pure struct "
    "packing, multimodal/mp4.py — and DEMUXES it back through the "
    "box walk, emitting brand, codec fourcc, 16.16-fixed track dims, "
    "movie duration in ms, stsz sample count and mdat byte length; "
    "DuckDB reproduces every value from pure arithmetic without "
    "touching a box. A hash match certifies the mux→demux round trip "
    "of the metadata layer — the part of 'video support' that needs "
    "no codec library (the mdat bitstream is declared filler; entropy "
    "decode stays stubbed). Pixels-never-shuffle shape as the other "
    "certifications: mux+demux live inside one mapInPandas task, only "
    "(id, metadata) rows leave the executor.",
    tags=("multimodal", "video", "pandas-udf", "real-codec", "oracle-checked"),
)
def media_mp4_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    docs = _distinct_ids(spark, sf_dir)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("brand", T.StringType(), False),
            T.StructField("codec", T.StringType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("duration_ms", T.LongType(), False),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("mdat_bytes", T.LongType(), False),
        ]
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..multimodal.mp4 import encode_mp4_skeleton, parse_mp4_metadata

        for pdf in batches:
            rows = {k: [] for k in out_schema.fieldNames()}
            for mid in pdf["doc_id"]:
                i = int(mid)
                n = 8 + i % 25
                delta = 100 + (i % 5) * 10
                sizes = [50 + (i + k) % 17 for k in range(n)]
                meta = parse_mp4_metadata(
                    encode_mp4_skeleton(
                        width=16 * (2 + i % 9),
                        height=16 * (2 + i % 7),
                        timescale=600,
                        n_samples=n,
                        sample_delta=delta,
                        sample_sizes=sizes,
                        seed=f"mp4:{i}",
                    )
                )
                rows["doc_id"].append(i)
                rows["brand"].append(meta["brand"])
                rows["codec"].append(meta["codec"])
                rows["width"].append(meta["width"])
                rows["height"].append(meta["height"])
                rows["duration_ms"].append(meta["duration_ms"])
                rows["n_samples"].append(meta["n_samples"])
                rows["mdat_bytes"].append(meta["mdat_bytes"])
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(rows["doc_id"], dtype="int64"),
                    "brand": rows["brand"],
                    "codec": rows["codec"],
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "duration_ms": pd.array(rows["duration_ms"], dtype="int64"),
                    "n_samples": pd.array(rows["n_samples"], dtype="int64"),
                    "mdat_bytes": pd.array(rows["mdat_bytes"], dtype="int64"),
                }
            )

    return docs.mapInPandas(roundtrip, out_schema).sortWithinPartitions("doc_id")


@register(
    "media_mp4_frame_sample",
    oracle="""
WITH p AS (
  SELECT DISTINCT doc_id, 8 + doc_id % 25 AS n
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
), sizes AS (
  SELECT doc_id, k, 50 + (doc_id + k) % 17 AS sz
  FROM p, unnest(range(0, CAST(n AS BIGINT))) AS u(k)
), offs AS (
  SELECT doc_id, k, sz,
         coalesce(sum(sz) OVER (PARTITION BY doc_id ORDER BY k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM sizes
), tot AS (
  SELECT doc_id, sum(sz) AS tot FROM sizes GROUP BY doc_id
), blocks AS (
  SELECT t.doc_id, j,
         md5('mp4:' || CAST(t.doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS hx
  FROM tot t, unnest(range(0, CAST(ceil(t.tot/16.0) AS BIGINT))) AS u(j)
), stream AS (
  SELECT doc_id, string_agg(hx, '' ORDER BY j) AS s
  FROM blocks GROUP BY doc_id
)
SELECT o.doc_id,
       CAST(o.k AS INT) AS frame_idx,
       CAST(o.sz AS BIGINT) AS frame_bytes,
       md5(substr(s.s, CAST(o.off*2 + 1 AS BIGINT), CAST(o.sz*2 AS BIGINT)))
         AS frame_md5
FROM offs o JOIN stream s USING (doc_id)
ORDER BY o.doc_id, frame_idx
""",
    description="Demux-driven frame extraction, ORACLE-CHECKED: the "
    "executor muxes each doc_id's skeleton MP4, demuxes the per-sample "
    "(offset, size) table from the REAL stsz/stsc/stco boxes "
    "(multimodal/mp4.py parse_mp4_samples), slices every sample's "
    "byte range out of the file, and digests it — while DuckDB "
    "rebuilds the expected digests from the md5-counter filler stream "
    "plus a windowed prefix-sum of the declared sample sizes, never "
    "touching a box. A hash match certifies the demux offset "
    "arithmetic byte-for-byte: stco's ABSOLUTE chunk base (computed "
    "by the muxer across every preceding box), stsz size decoding, "
    "and cumulative sample placement — the exact arithmetic a video "
    "keyframe extractor trusts before handing bytes to a decoder. "
    "Fan-out shape (one row per sample) like media_text_frames; "
    "payloads never shuffle — only (id, idx, size, digest) rows leave "
    "the mapInPandas task.",
    tags=("multimodal", "video", "pandas-udf", "real-codec", "oracle-checked"),
)
def media_mp4_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    docs = _distinct_ids(spark, sf_dir)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.LongType(), False),
            T.StructField("frame_md5", T.StringType(), False),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..multimodal.mp4 import encode_mp4_skeleton, parse_mp4_samples

        for pdf in batches:
            ids, idxs, szs, digs = [], [], [], []
            for mid in pdf["doc_id"]:
                i = int(mid)
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
                for k, (off, sz) in enumerate(parse_mp4_samples(buf)):
                    ids.append(i)
                    idxs.append(k)
                    szs.append(sz)
                    digs.append(
                        hashlib.md5(buf[off : off + sz].hex().encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_bytes": pd.array(szs, dtype="int64"),
                    "frame_md5": digs,
                }
            )

    return docs.mapInPandas(sample, out_schema).sortWithinPartitions("doc_id", "frame_idx")


@register(
    "media_frame_dedup",
    oracle="""
WITH params AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS htext,
         length(hex(encode(text))) AS len,
         greatest(1, length(hex(encode(text))) // 4) AS step
  FROM documents
  WHERE length(text) > 0
), frames AS (
  SELECT media_id,
         md5(substr(htext, CAST(k * step + 1 AS BIGINT), CAST(step AS BIGINT)))
           AS frame_md5
  FROM params, unnest(generate_series(0, 3)) AS u(k)
  WHERE k * step < len
), df AS (
  SELECT DISTINCT media_id, frame_md5 FROM frames
), shared AS (
  SELECT frame_md5 FROM df GROUP BY frame_md5
  HAVING count(DISTINCT media_id) >= 2
), stats AS (
  SELECT d.media_id, count(*) AS n_frames,
         CAST(sum(CASE WHEN s.frame_md5 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_frames
  FROM df d LEFT JOIN shared s USING (frame_md5)
  GROUP BY d.media_id
)
SELECT media_id, n_frames, dup_frames,
       round(CAST(dup_frames AS DOUBLE) / n_frames, 6) AS dup_frac
FROM stats
ORDER BY media_id
""",
    description="Cross-media frame-level dedup — the video-dedup "
    "primitive (catalog shorts, re-uploads, and stock intros share "
    "frames across otherwise-distinct media): the oracle-checkable "
    "frame fan-out of media_text_frames feeds the same shared-digest "
    "machinery as the text span dedups, reporting each medium's "
    "distinct-frame count, corpus-duplicated frames, and duplicated "
    "fraction. Scale notes: the mapInPandas decode/sample stage emits "
    "(media_id, 16-byte digest) rows only — pixels never shuffle; the "
    "shared-set groupBy and the join back reuse the digest "
    "partitioning. On real media the frame digest becomes a perceptual "
    "hash; the plan is unchanged.",
    tags=("multimodal", "video", "dedup", "pandas-udf", "oracle-checked"),
)
def media_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..plans.caching import tracked_persist
    from ..sources.tables import load_table, spread

    docs = spread(
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            F.col("doc_id").alias("media_id"),
            F.lit("video").alias("kind"),
            # hex transcoding: ASCII payload, so the oracle's character
            # substr equals the Spark path's byte slices on any input
            F.hex("text").cast("binary").alias("payload"),
        )
    )
    df = (
        sample_frames(docs, n_frames=4)
        .select("media_id", "frame_md5")
        .distinct()
        .transform(tracked_persist)
    )
    shared = (
        df.groupBy("frame_md5")
        .agg(F.countDistinct("media_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("frame_md5", F.lit(1).alias("is_shared"))
    )
    return (
        df.join(shared, "frame_md5", "left")
        .groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.coalesce("is_shared", F.lit(0)))
            .cast("bigint")
            .alias("dup_frames"),
        )
        .select(
            "media_id",
            "n_frames",
            "dup_frames",
            F.round(
                F.col("dup_frames").cast("double") / F.col("n_frames"), 6
            ).alias("dup_frac"),
        )
        .sortWithinPartitions("media_id")
    )


@register(
    "media_gif_roundtrip",
    oracle="""
WITH p AS (
  SELECT DISTINCT doc_id,
         6 + doc_id % 12 AS w,
         5 + doc_id % 9 AS h
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
), blocks AS (
  SELECT doc_id, w, h, j,
         md5('gif:' || CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS hx
  FROM p, unnest(range(0, CAST(ceil(w*h/16.0) AS BIGINT))) AS u(j)
), stream AS (
  SELECT doc_id, w, h, string_agg(hx, '' ORDER BY j) AS hexstream
  FROM blocks GROUP BY doc_id, w, h
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(w*h AS BIGINT) AS n_px,
       md5(substr(hexstream, 1, CAST(w*h*2 AS BIGINT))) AS px_md5
FROM stream
ORDER BY doc_id
""",
    description="GIF codec certification, ORACLE-CHECKED: every doc_id "
    "derives a deterministic grayscale raster (md5-counter bytes, dims "
    "from the id), the executor encodes it as a REAL GIF87a file — "
    "256-entry color table and a genuine LZW code stream "
    "(multimodal/gif.py: variable 9-12-bit codes, LSB-first packing, "
    "in-band CLEAR/EOI, the decoder-side early width bump, sub-block "
    "framing) — and decodes it back, emitting the md5 of the decoded "
    "raster's hex; DuckDB reproduces the digest from pure md5 string "
    "arithmetic, never touching a GIF. A hash match certifies the "
    "LZW compress -> pack -> unpack -> decompress round trip is "
    "byte-lossless for every raster in the corpus. GIF is the family's "
    "only non-zlib entropy coder — with PNG (inflate), JPEG (Huffman/"
    "DCT) and GIF (LZW) the three classic raster compression schemes "
    "all decode natively. Same pixels-never-shuffle shape as the other "
    "certifications: encode+decode live inside one mapInPandas task, "
    "only (id, dims, 32-byte digest) rows leave the executor.",
    tags=("multimodal", "image", "pandas-udf", "real-codec", "oracle-checked"),
)
def media_gif_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    docs = _distinct_ids(spark, sf_dir)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("n_px", T.LongType(), False),
            T.StructField("px_md5", T.StringType(), False),
        ]
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..multimodal.gif import decode_gif, encode_gif
        from ..multimodal.codecs import md5_counter_fill

        for pdf in batches:
            ids, ws, hs, npx, digs = [], [], [], [], []
            for mid in pdf["doc_id"]:
                i = int(mid)
                w, h = 6 + i % 12, 5 + i % 9
                need = w * h
                px = np.frombuffer(md5_counter_fill(f"gif:{i}", need), dtype=np.uint8).reshape(h, w)
                back = decode_gif(encode_gif(px))
                ids.append(i)
                ws.append(back.shape[1])
                hs.append(back.shape[0])
                npx.append(back.size)
                digs.append(hashlib.md5(back.tobytes().hex().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "n_px": pd.array(npx, dtype="int64"),
                    "px_md5": digs,
                }
            )

    return docs.mapInPandas(roundtrip, out_schema).sortWithinPartitions("doc_id")


@register(
    "media_gif_animation_frames",
    oracle="""
WITH p AS (
  SELECT DISTINCT doc_id,
         2 + doc_id % 5 AS nf,
         6 + doc_id % 10 AS w,
         5 + doc_id % 7 AS h
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
), frames AS (
  SELECT doc_id, w, h, f
  FROM p, unnest(range(0, CAST(nf AS BIGINT))) AS u(f)
), blocks AS (
  SELECT doc_id, f, w, h, j,
         md5('gifanim:' || CAST(doc_id AS VARCHAR) || ':' || CAST(f AS VARCHAR)
             || ':' || CAST(j AS VARCHAR)) AS hx
  FROM frames, unnest(range(0, CAST(ceil(w*h/16.0) AS BIGINT))) AS u(j)
), stream AS (
  SELECT doc_id, f, w, h, string_agg(hx, '' ORDER BY j) AS hexstream
  FROM blocks GROUP BY ALL
)
SELECT doc_id,
       CAST(f AS INT) AS frame_idx,
       CAST((doc_id + f) % 10 AS BIGINT) AS delay_cs,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       md5(substr(hexstream, 1, CAST(w*h*2 AS BIGINT))) AS frame_md5
FROM stream
ORDER BY doc_id, frame_idx
""",
    description="Animated-GIF demux certification, ORACLE-CHECKED: "
    "every doc_id derives a 2-6-frame animation (per-frame "
    "deterministic rasters, per-frame delays from the id), the "
    "executor muxes ONE multi-image-block GIF89a file — each frame "
    "preceded by a real graphic control extension carrying its delay, "
    "each frame its own LZW code stream — and demuxes it back with "
    "decode_gif_frames, emitting one row per frame with the parsed "
    "delay and the decoded raster's digest; DuckDB reproduces every "
    "value from md5/modular arithmetic, never touching a GIF. A hash "
    "match certifies the 89a multi-block grammar walk, the GCE "
    "delay-field parse, and per-frame LZW round trips in one shot — "
    "the fan-out shape (one row per contained frame) that an "
    "animation/sprite ingestion pipeline runs. Pixels never shuffle: "
    "mux+demux live inside one mapInPandas task; only (id, idx, "
    "delay, dims, 32-byte digest) rows leave the executor.",
    tags=("multimodal", "image", "pandas-udf", "real-codec", "oracle-checked"),
)
def media_gif_animation_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    docs = _distinct_ids(spark, sf_dir)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("delay_cs", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("frame_md5", T.StringType(), False),
        ]
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..multimodal.codecs import md5_counter_fill
        from ..multimodal.gif import decode_gif_frames, encode_gif_frames

        for pdf in batches:
            ids, idxs, dls, ws, hs, digs = [], [], [], [], [], []
            for mid in pdf["doc_id"]:
                i = int(mid)
                nf, w, h = 2 + i % 5, 6 + i % 10, 5 + i % 7
                frames = [
                    np.frombuffer(
                        md5_counter_fill(f"gifanim:{i}:{f}", w * h), dtype=np.uint8
                    ).reshape(h, w)
                    for f in range(nf)
                ]
                buf = encode_gif_frames(frames, [(i + f) % 10 for f in range(nf)])
                for f, (px, delay) in enumerate(decode_gif_frames(buf)):
                    ids.append(i)
                    idxs.append(f)
                    dls.append(delay)
                    ws.append(px.shape[1])
                    hs.append(px.shape[0])
                    digs.append(
                        hashlib.md5(px.tobytes().hex().encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "delay_cs": pd.array(dls, dtype="int64"),
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "frame_md5": digs,
                }
            )

    return docs.mapInPandas(roundtrip, out_schema).sortWithinPartitions("doc_id", "frame_idx")


@register(
    "media_video_scene_cuts",
    oracle="""
WITH p AS (
  SELECT DISTINCT doc_id,
         8 + doc_id % 25 AS n,
         3 + doc_id % 4 AS len,
         12 + doc_id % 9 AS w,
         8 + doc_id % 7 AS h
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0
), frames AS (
  SELECT doc_id, len, w, h, k, k // len AS s
  FROM p, unnest(range(0, CAST(n AS BIGINT))) AS u(k)
), scenes AS (
  SELECT DISTINCT doc_id, w, h, s FROM frames
), blocks AS (
  SELECT doc_id, s, w, h, j,
         md5('vid:' || CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)
             || ':' || CAST(j AS VARCHAR)) AS hx
  FROM scenes, unnest(range(0, CAST(ceil(w*h/16.0) AS BIGINT))) AS u(j)
), stream AS (
  SELECT doc_id, s, w, h, string_agg(hx, '' ORDER BY j) AS st
  FROM blocks GROUP BY ALL
), cells AS (
  SELECT doc_id, s, b,
         ((b // 8) * h) // 8 AS yi,
         ((b % 8) * w) // 9 AS xi,
         (((b % 8) + 1) * w) // 9 AS xj,
         w, st
  FROM stream, unnest(range(0, 64)) AS u(b)
), vals AS (
  SELECT doc_id, s, b,
    ((strpos('0123456789abcdef', substr(substr(st,(yi*w+xi)*2+1,2),1,1))-1)*16
     + (strpos('0123456789abcdef', substr(substr(st,(yi*w+xi)*2+1,2),2,1))-1))*250//255 AS va,
    ((strpos('0123456789abcdef', substr(substr(st,(yi*w+xj)*2+1,2),1,1))-1)*16
     + (strpos('0123456789abcdef', substr(substr(st,(yi*w+xj)*2+1,2),2,1))-1))*250//255 AS vb
  FROM cells
), hashes AS (
  SELECT doc_id, s,
    CAST(sum(CASE WHEN va < vb AND b < 32 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS lo,
    CAST(sum(CASE WHEN va < vb AND b >= 32 THEN 1::BIGINT << (b-32) ELSE 0 END) AS BIGINT) AS hi
  FROM vals GROUP BY doc_id, s
), seq AS (
  SELECT f.doc_id, f.k, hh.lo, hh.hi,
         lag(hh.lo) OVER (PARTITION BY f.doc_id ORDER BY f.k) AS plo,
         lag(hh.hi) OVER (PARTITION BY f.doc_id ORDER BY f.k) AS phi
  FROM frames f JOIN hashes hh ON f.doc_id = hh.doc_id AND f.s = hh.s
)
SELECT doc_id, CAST(k AS INT) AS frame_idx,
       CAST(bit_count(CAST(xor(lo, plo) AS BIGINT))
          + bit_count(CAST(xor(hi, phi) AS BIGINT)) AS BIGINT) AS hamming
FROM seq
WHERE plo IS NOT NULL
  AND bit_count(CAST(xor(lo, plo) AS BIGINT))
    + bit_count(CAST(xor(hi, phi) AS BIGINT)) >= 16
ORDER BY doc_id, frame_idx
""",
    description="Video scene-cut detection, ORACLE-CHECKED through the "
    "real container demux: every doc_id muxes the same ISO-BMFF "
    "skeleton media_mp4_metadata certifies, and the frame index stream "
    "comes from DEMUXING its stsz/stco sample table (parse_mp4_samples "
    "— the frame count the detector walks is read back out of real "
    "boxes, not assumed). Each frame's raster derives from the video's "
    "SCENE id (scene length 3-6 frames from the doc_id) plus a "
    "per-frame brightness jitter; the executor computes a 64-bit dHash "
    "per frame and a Spark lag-window takes the Hamming distance "
    "between CONSECUTIVE frames per video — within a scene the jitter "
    "cancels in the gradient bits (distance exactly 0, certifying gain "
    "invariance), across a scene boundary the content changes and the "
    "distance jumps; rows with distance >= 16 are the detected cuts. "
    "DuckDB reproduces every fingerprint from md5/strpos arithmetic at "
    "SCENE granularity and replays the same lag window, so a hash "
    "match certifies the per-frame fingerprints, the gain-invariance "
    "claim, AND the ordered-sequence geometry in one shot. Scale "
    "shape: a NEW plan class for the media family — ordered per-media "
    "sequence analysis: pixels and sample bytes never leave the "
    "mapInPandas task, the lag window shuffles (id, idx, 16-byte "
    "fingerprint) rows hash-partitioned by video, and window state is "
    "bounded by frames-per-video (an hours-long video chunks by "
    "(video, minute) with one context row carried forward — the "
    "events_zscore_anomalies pattern).",
    tags=("multimodal", "video", "dedup", "pandas-udf", "real-codec", "oracle-checked"),
)
def media_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    docs = _distinct_ids(spark, sf_dir)
    fp_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("lo", T.LongType(), False),
            T.StructField("hi", T.LongType(), False),
        ]
    )

    def fp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..multimodal.mp4 import encode_mp4_skeleton, parse_mp4_samples
        from ..multimodal.codecs import md5_counter_fill

        for pdf in batches:
            ids, idxs, los, his = [], [], [], []
            for mid in pdf["doc_id"]:
                i = int(mid)
                n = 8 + i % 25
                # the frame index stream comes from the REAL demux of
                # the muxed skeleton, not from the formula directly
                buf = encode_mp4_skeleton(
                    width=16 * (2 + i % 9),
                    height=16 * (2 + i % 7),
                    timescale=600,
                    n_samples=n,
                    sample_delta=100 + (i % 5) * 10,
                    sample_sizes=[50 + (i + k) % 17 for k in range(n)],
                    seed=f"mp4:{i}",
                )
                samples = parse_mp4_samples(buf)
                length, w, h = 3 + i % 4, 12 + i % 9, 8 + i % 7
                need = w * h
                # dHash cell index pairs (flat positions), fixed per video
                ks = np.arange(64)
                yi = ((ks // 8) * h) // 8
                pa = yi * w + ((ks % 8) * w) // 9
                pb = yi * w + (((ks % 8) + 1) * w) // 9
                weights = np.array([1 << int(k) for k in range(64)], dtype=object)
                base: dict[int, np.ndarray] = {}
                for k in range(len(samples)):
                    s = k // length
                    if s not in base:
                        base[s] = (
                            np.frombuffer(
                                md5_counter_fill(f"vid:{i}:{s}", need), dtype=np.uint8
                            ).astype(np.int64)
                            * 250
                        ) // 255
                    # per-frame brightness jitter: computed honestly on
                    # the jittered raster (the oracle hashes at scene
                    # granularity — a match certifies the invariance)
                    px = base[s] + (k % 3)
                    bits = int(np.sum(weights[px[pa] < px[pb]]))
                    ids.append(i)
                    idxs.append(k)
                    los.append(bits & 0xFFFFFFFF)
                    his.append(bits >> 32)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "lo": pd.array(los, dtype="int64"),
                    "hi": pd.array(his, dtype="int64"),
                }
            )

    fps = docs.mapInPandas(fp_batch, fp_schema)
    win = Window.partitionBy("doc_id").orderBy("frame_idx")
    seq = fps.select(
        "doc_id",
        "frame_idx",
        "lo",
        "hi",
        F.lag("lo").over(win).alias("plo"),
        F.lag("hi").over(win).alias("phi"),
    )
    hamming = (
        F.bit_count(F.col("lo").bitwiseXOR(F.col("plo")))
        + F.bit_count(F.col("hi").bitwiseXOR(F.col("phi")))
    ).cast("bigint")
    return (
        seq.filter(F.col("plo").isNotNull())
        .select("doc_id", "frame_idx", hamming.alias("hamming"))
        .filter(F.col("hamming") >= 16)
        .sortWithinPartitions("doc_id", "frame_idx")
    )
