"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: media lives in ``binary``
columns (or object-store pointers) beside typed metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes never
leave the executor and batches amortize Python crossing costs.

The container has no image/audio libraries, so the *decode* step is a
deterministic fake behind ``decode_stub`` (clearly marked; swap in PIL/
torchaudio per deployment) — everything Spark-side (schema, batch
iteration, partitioning, UDF signatures) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.session import load_table

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, n_bytes long, width int, height int"
)

FEATURE_SCHEMA = "doc_id long, n_bytes long, width int, height int, mean_byte double"


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → fake media rows: payload = utf-8 bytes of the text,
    metadata derived deterministically (stands in for real image blobs)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.length(F.encode(F.col("text"), "utf-8")).cast("long").alias("n_bytes"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
    )


def decode_stub(payload: bytes) -> dict:
    """STUB decoder — deterministic fake features from raw bytes.

    Replace with a real decoder (PIL.Image.open / soundfile / pyav) in
    a deployment image; the operator contract (bytes in → feature dict
    out) is what the pipeline depends on.
    """
    if payload is None:
        raise NotImplementedError("real media decode requires PIL/soundfile/pyav")
    return {"mean_byte": (sum(payload) / len(payload)) if payload else 0.0}


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_stub(p)["mean_byte"] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "mean_byte": feats,
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline: synthesize → decode(stub) → features.

    mean_byte is round-tripped to 4 decimals; the oracle recomputes the
    same quantity from text bytes SQL-side, so the whole binary-column
    path (encode → mapInPandas → features) is oracle-gated.
    """
    out = extract_media_features(synthesize_media(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_bytes",
        "width",
        "height",
        F.round("mean_byte", 4).alias("mean_byte"),
    ).orderBy("doc_id")


# texts are ASCII (a-z words + spaces), so utf-8 bytes == unicode code
# points — mean_byte is expressible exactly in SQL.
MEDIA_FEATURES_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(doc_id % 640 + 1 AS INTEGER) AS width,
       CAST(doc_id % 480 + 1 AS INTEGER) AS height,
       round(list_sum(list_transform(string_split(text, ''), c -> unicode(c)))
             / greatest(length(text), 1), 4) AS mean_byte
FROM documents ORDER BY doc_id
"""


QUERIES = {"media_features": media_features}
ORACLES = {"media_features": MEDIA_FEATURES_SQL}
