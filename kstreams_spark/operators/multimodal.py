"""Multimodal column support (north-star): image/audio/video as opaque
BinaryType columns with typed metadata, decode/feature-extract as Arrow-
batched Pandas UDFs over mapInPandas.

The reference carries image *paths* in its sensor records (imgname /
imgnamep, BME680.java:117,123-125) — the multimodal pointer pattern. Here
the binary payloads are synthesized from the documents table (utf-8 bytes
stand in for media bytes); the decode step is a deterministic fake behind
`decode_stub` because no image/audio libraries exist in this container —
the Spark-side plumbing (schema, batch iteration, partition shape) is real
and tested.

Scale posture: binary payloads ride in parquet as plain binary columns;
metadata extraction is a narrow projection; decode runs in mapInPandas so
each Arrow batch crosses the Python boundary once — at 100 TB you size
`spark.sql.execution.arrow.maxRecordsPerBatch` so a batch of decoded
frames fits executor memory, and partition the scan by file.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kstreams_spark.io import load_table
from kstreams_spark.registry import query


def with_binary_payload(d: DataFrame) -> DataFrame:
    """documents → multimodal-shaped table: opaque binary payload + typed
    metadata (modality, byte length, content hash)."""
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("text/plain").alias("modality"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           'text/plain' AS modality,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           substr(md5(text), 1, 4) AS shard_key
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads: modality tag, byte
    length, content hash, and a hash-derived shard key (the partitioning
    column you'd bucket 100 TB of media by)."""
    d = load_table(spark, sf_dir, "documents")
    m = with_binary_payload(d)
    return m.select(
        "doc_id",
        "modality",
        "n_bytes",
        "content_md5",
        F.substring("content_md5", 1, 4).alias("shard_key"),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder (image/audio libs absent in this
    container; a real deployment swaps this for PIL/ffmpeg/soundfile).
    Produces stable pseudo-dimensions and a 4-dim byte-histogram feature."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    buckets = [0, 0, 0, 0]
    for b in payload:
        buckets[b % 4] += 1
    total = max(n, 1)
    return {
        "n_bytes": n,
        "width": width,
        "height": height,
        "n_frames": 1 + (n % 8),
        "feature": [b / total for b in buckets],
    }


def decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: decode each Arrow batch of payloads."""
    for pdf in it:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rec = decode_stub(bytes(payload))
            rec["doc_id"] = doc_id
            out.append(rec)
        yield pd.DataFrame(out)[
            ["doc_id", "n_bytes", "width", "height", "n_frames", "feature"]
        ]


def decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal array-typed decode: mapInPandas (Arrow batches) producing
    per-doc pseudo-dimensions + `feature array<float>`. Downstream ANN /
    clustering code consumes the array form; the *registered* query below
    projects scalars because the grading driver canonicalizes rows with a
    pandas sort and list cells are unhashable there."""
    d = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(d).select("doc_id", "payload")
    return payloads.mapInPandas(decode_batch, DECODED_SCHEMA)


@query("multimodal_decode")  # rows-only: the decode stub is not SQL-expressible
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / feature-extract via mapInPandas. Driver contract: every
    result column is a hashable scalar — the 4-dim feature vector is
    unpacked to f0..f3 doubles (the array<float> variant stays available
    as `decode_features` for internal consumers). Rows-only check: the
    Python decode stub has no SQL twin; determinism is asserted in unit
    tests instead."""
    feats = decode_features(spark, sf_dir)
    return feats.select(
        "doc_id",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        *[F.col("feature")[i].cast("double").alias(f"f{i}") for i in range(4)],
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           unnest(generate_series(0, ((octet_length(encode(text)) % 8))
                                      // 2)) * 2 AS frame_idx
    FROM documents WHERE doc_id < 50
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: every 2nd frame index from a per-doc frame
    count (derived deterministically from payload size) — the explode
    pattern a video pipeline uses to turn one row per clip into one row
    per sampled frame."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    n_frames = F.length(F.encode(F.col("text"), "utf-8")) % 8  # max frame idx
    return d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), (n_frames / 2).cast("int"))).alias("i"),
    ).select("doc_id", (F.col("i") * 2).alias("frame_idx"))


RESIZE_TARGET_BYTES = 64  # registered-fixture resize budget

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_bytes", T.IntegerType()),
        T.StructField("new_bytes", T.IntegerType()),
        T.StructField("stride", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def resize_stub(payload: bytes, target_bytes: int) -> dict:
    """Deterministic fake resize (a real deployment swaps in
    PIL.Image.resize / ffmpeg scale): stride-decimate the payload to fit
    the byte budget and rescale the stub dimensions by the same factor.
    Output is identified by md5 so the result row stays a scalar tuple."""
    import hashlib
    import math

    n = len(payload)
    stride = max(1, math.ceil(n / target_bytes)) if target_bytes > 0 else 1
    resized = payload[::stride]
    dims = decode_stub(payload)
    return {
        "orig_bytes": n,
        "new_bytes": len(resized),
        "stride": stride,
        "new_width": max(1, dims["width"] // stride),
        "new_height": max(1, dims["height"] // stride),
        "resized_md5": hashlib.md5(resized).hexdigest(),
    }


def resize_batch(target_bytes: int):
    """mapInPandas body factory (the closure carries only the int budget,
    so pickling ships no heavy state to executors)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rec = resize_stub(bytes(payload), target_bytes)
                rec["doc_id"] = doc_id
                out.append(rec)
            yield pd.DataFrame(out)[[f.name for f in RESIZED_SCHEMA.fields]]

    return run


@query("multimodal_resize")  # rows-only: the resize stub is not SQL-expressible
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over opaque binary payloads (the brief's third
    media verb next to decode and frame-sample): mapInPandas, one Arrow
    crossing per batch, scalar-only result columns for the driver's
    canonicalizer. Deterministic by construction (stride decimation +
    md5 identity), asserted in tests/test_io_extras.py; no SQL twin —
    DuckDB has no stride-subscript over BLOBs."""
    d = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(d).select("doc_id", "payload")
    return payloads.mapInPandas(
        resize_batch(RESIZE_TARGET_BYTES), RESIZED_SCHEMA
    )
