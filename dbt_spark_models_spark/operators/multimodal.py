"""Multimodal column handling: opaque binary payloads + typed metadata.

Beyond-reference surface (BASELINE.json north star). Images/audio/video are
carried as ``binary`` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched Pandas UDFs
over ``mapInPandas`` (the real decode libs — PIL/ffmpeg — are not in this
container, so the decode step is STUBBED with a deterministic fake; the
Spark-side plumbing — schema, batching, partitioning — is real and tested).

Scale notes: ``mapInPandas`` streams Arrow batches through Python with
bounded memory per batch; binary payloads never hit the driver. At 100 TB,
partition by content-size buckets so batches stay balanced.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables, spread

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_checksum", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires PIL, not present in this container."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg; install pillow and replace the "
        "deterministic fake in _extract_features_batch"
    )


def _extract_features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction. The decode is a deterministic fake
    (byte stats standing in for pixel stats); the batch plumbing is real.

    r11 (guide §4.2 "heavy lifting in native code"): the checksum sums
    every payload byte — the former ``sum(bytes)`` iterated per byte in
    interpreted Python; now the batch's payloads concatenate into ONE
    uint8 buffer and per-doc sums come from a prefix-sum difference
    (handles empty payloads exactly, unlike ``reduceat``). Same integers,
    C speed. md5 stays per row (hashlib is already C)."""
    import hashlib

    import numpy as np

    for pdf in batches:
        payloads = pdf["payload"]
        n = len(payloads)
        lens = payloads.map(len).to_numpy(dtype=np.int64) if n else np.zeros(0, np.int64)
        flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        csum = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(flat, dtype=np.int64)]
        )
        offs = np.zeros(n, dtype=np.int64)
        if n > 1:
            np.cumsum(lens[:-1], out=offs[1:])
        sums = csum[offs + lens] - csum[offs]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pd.Series(lens, dtype="int64"),
                "byte_checksum": pd.Series(sums % 997, dtype="int64"),
                "fake_width": pd.Series(lens % 640, dtype="int32"),
                "fake_height": pd.Series(lens % 480, dtype="int32"),
                "content_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


@query(
    "multimodal_binary_features",
    oracle="""
WITH bytes AS (
    SELECT doc_id, text,
           octet_length(encode(text)) AS n_bytes,
           list_sum(list_transform(generate_series(1, len(text)),
                    i -> ascii(substring(text, i, 1)))) % 997 AS byte_checksum
    FROM documents
)
SELECT doc_id,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(byte_checksum AS BIGINT) AS byte_checksum,
       CAST(n_bytes % 640 AS INT) AS fake_width,
       CAST(n_bytes % 480 AS INT) AS fake_height,
       MD5(text) AS content_md5
FROM bytes
""",
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: build a ``binary`` payload column (here from
    text — documents are ASCII so byte stats equal char stats, which is what
    lets the DuckDB oracle verify the Pandas-UDF plumbing end-to-end), then
    extract features via ``mapInPandas``."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    with_payload = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return with_payload.mapInPandas(_extract_features_batch, _FEATURE_SCHEMA)


@query(
    "multimodal_metadata_partition_plan",
    oracle="""
SELECT size_bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS bucket_bytes
FROM (
    SELECT doc_id, n_chars,
           NTILE(8) OVER (ORDER BY n_chars, doc_id) AS size_bucket
    FROM documents
)
GROUP BY size_bucket
""",
)
def multimodal_metadata_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata layer: size-bucket partitioning plan for balanced
    Arrow batches (what you'd ``repartitionByRange`` on before heavy decode
    at 100 TB). Buckets are the distributed exact NTILE over (size,
    doc_id) — deterministic and hash-checkable against DuckDB's NTILE
    (unlike engine-specific ``percentile_approx`` boundaries), with no
    single-partition sort anywhere: a range shuffle + partitioned windows
    + a broadcast of per-partition offsets (see ``exact_ntile``)."""
    from dbt_spark_models_spark.operators.windows import exact_ntile

    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    meta = d.select(
        "doc_id",
        F.struct(
            F.col("n_chars").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.lit("utf-8").alias("encoding"),
        ).alias("media_meta"),
        F.col("n_chars").alias("__sz"),
    )
    bucketed = exact_ntile(meta, ["__sz", "doc_id"], 8, "size_bucket")
    return bucketed.groupBy("size_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("media_meta.n_bytes").cast("long").alias("bucket_bytes"),
    )


_FRAME_SIZE = 64
_FRAME_STRIDE = 4

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.IntegerType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def _sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame sampler: split each payload into fixed-size
    chunks ("frames" of the deterministic fake video) and keep every
    ``_FRAME_STRIDE``-th one. Real decode (ffmpeg keyframe extraction)
    would replace the chunking only — the batch shape is identical.

    r11 (guide §4.2): the former per-doc/per-frame Python loop (slice +
    ``sum(bytes)`` per frame) is one vectorized pass — payloads
    concatenate into a single uint8 buffer, sampled frame offsets/
    lengths derive arithmetically, and per-frame sums are prefix-sum
    differences. Same integers, no per-row Python."""
    import numpy as np

    for pdf in batches:
        payloads = pdf["payload"]
        n = len(payloads)
        lens = payloads.map(len).to_numpy(dtype=np.int64) if n else np.zeros(0, np.int64)
        flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        csum = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(flat, dtype=np.int64)]
        )
        doc_off = np.zeros(n, dtype=np.int64)
        if n > 1:
            np.cumsum(lens[:-1], out=doc_off[1:])
        n_frames = (lens + _FRAME_SIZE - 1) // _FRAME_SIZE
        n_samp = (n_frames + _FRAME_STRIDE - 1) // _FRAME_STRIDE
        tot = int(n_samp.sum())
        samp_start = np.zeros(n, dtype=np.int64)
        if n > 1:
            np.cumsum(n_samp[:-1], out=samp_start[1:])
        which_doc = np.repeat(np.arange(n, dtype=np.int64), n_samp)
        frame_idx = (
            np.arange(tot, dtype=np.int64) - samp_start[which_doc]
        ) * _FRAME_STRIDE
        starts = doc_off[which_doc] + frame_idx * _FRAME_SIZE
        flen = np.minimum(
            _FRAME_SIZE, lens[which_doc] - frame_idx * _FRAME_SIZE
        )
        sums = csum[starts + flen] - csum[starts]
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(
                    pdf["doc_id"].to_numpy(dtype="int64")[which_doc],
                    dtype="int64",
                ),
                "frame_idx": pd.Series(frame_idx, dtype="int32"),
                "frame_bytes": pd.Series(flen, dtype="int32"),
                "frame_checksum": pd.Series(sums % 997, dtype="int64"),
            }
        )


@query(
    "multimodal_frame_sample",
    oracle=f"""
WITH sized AS (
    SELECT doc_id, text, octet_length(encode(text)) AS n_bytes
    FROM documents
), frames AS (
    SELECT doc_id, text, n_bytes,
           UNNEST(generate_series(0,
               CAST(CEIL(n_bytes / {_FRAME_SIZE}.0) AS INT) - 1)) AS frame_idx
    FROM sized
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(LEAST({_FRAME_SIZE}, n_bytes - frame_idx * {_FRAME_SIZE}) AS INT)
           AS frame_bytes,
       CAST(list_sum(list_transform(
           generate_series(frame_idx * {_FRAME_SIZE} + 1,
                           LEAST((frame_idx + 1) * {_FRAME_SIZE}, n_bytes)),
           i -> ascii(substring(text, i, 1)))) % 997 AS BIGINT) AS frame_checksum
FROM frames
WHERE frame_idx % {_FRAME_STRIDE} = 0
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a binary "video" payload: every 4th fixed-size
    chunk survives, one output row per sampled frame — the keyframe
    subsampling stage of a video-curation pipeline, with the decode faked
    (chunking) and the ``mapInPandas`` row-expansion plumbing real.

    Scale: row-expanding Pandas UDFs keep Arrow batches bounded (the output
    is built per input batch); the payload never leaves the executor."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    with_payload = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return with_payload.mapInPandas(_sample_frames_batch, _FRAME_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("est_out_bytes", T.LongType()),
    ]
)

_FIT = 512  # target bounding box


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched aspect-preserving resize. The pixel work is the stub
    (real op: PIL ``Image.resize`` on the decoded payload); the dimension
    arithmetic, batch plumbing, and output schema are the real pipeline."""
    import numpy as np

    for pdf in batches:
        w = pdf["width"].to_numpy(dtype="float64")
        h = pdf["height"].to_numpy(dtype="float64")
        scale = np.minimum(np.minimum(_FIT / w, _FIT / h), 1.0)
        nw = np.floor(w * scale).astype("int32")
        nh = np.floor(h * scale).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pdf["width"],
                "height": pdf["height"],
                "new_width": nw,
                "new_height": nh,
                "est_out_bytes": (nw.astype("int64") * nh.astype("int64") * 3),
            }
        )


@query(
    "multimodal_resize_plan",
    oracle=f"""
WITH meta AS (
    SELECT doc_id,
           GREATEST(1, octet_length(encode(text)) % 1920) AS width,
           GREATEST(1, octet_length(encode(text)) % 1080) AS height
    FROM documents
), scaled AS (
    SELECT doc_id, width, height,
           LEAST(LEAST({_FIT}.0 / width, {_FIT}.0 / height), 1.0) AS scale
    FROM meta
)
SELECT doc_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       CAST(FLOOR(width * scale) AS INT) AS new_width,
       CAST(FLOOR(height * scale) AS INT) AS new_height,
       CAST(FLOOR(width * scale) AS BIGINT)
           * CAST(FLOOR(height * scale) AS BIGINT) * 3 AS est_out_bytes
FROM scaled
""",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage of the image pipeline (decode → **resize** →
    re-encode): aspect-preserving fit into a {_FIT}×{_FIT} box, no
    upscaling, computed per Arrow batch in ``mapInPandas`` (vectorized
    numpy — where the real PIL resize would run). Dimensions derive
    deterministically from byte lengths (no image libs in this
    container), which is what lets the oracle verify the Pandas-UDF
    arithmetic end-to-end. Row-local: zero shuffles at any scale."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    meta = d.select(
        "doc_id",
        F.greatest(
            F.lit(1), F.octet_length(F.encode(F.col("text"), "utf-8")) % 1920
        ).cast("int").alias("width"),
        F.greatest(
            F.lit(1), F.octet_length(F.encode(F.col("text"), "utf-8")) % 1080
        ).cast("int").alias("height"),
    )
    return meta.mapInPandas(_resize_batch, _RESIZE_SCHEMA)
