"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature-extract plumbing.

The container ships no image/audio codecs, so the decode step is a
deterministic fake (documented stub) — but everything Spark-side is
real and tested: BinaryType columns, metadata structs, mapInPandas
batch iteration, schema contracts, and partition sizing. Swapping
the stub for PIL/librosa/ffmpeg is a one-function change on the
executor, no plan changes.

Scale notes: binary payloads never pass through a groupBy — all
transforms are mapInPandas (narrow, no shuffle); metadata-only
queries select around the binary column so parquet column pruning
keeps payload IO out of them entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from maggy_spark.plans.fixtures import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("meta", T.StructType([
            T.StructField("n_bytes", T.LongType()),
            T.StructField("format", T.StringType()),
            T.StructField("source", T.StringType()),
        ])),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from `documents`: text bytes as the
    opaque payload (binary), typed metadata alongside — the storage
    layout (binary + struct metadata) is the real design."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.struct(
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.lit("raw/v1").alias("format"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


DECODE_SCHEMA = (
    "media_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, n_frames int, duration_sec double, checksum string"
)


def _fake_decode(payload: bytes, media_type: str) -> dict:
    """STUB: deterministic fake decoder.

    A real deployment replaces this with PIL.Image.open /
    soundfile.read / av.open — none of which exist in this
    container. The fake derives plausible, deterministic metadata
    from the payload bytes so the pipeline around it is fully
    testable. Raising NotImplementedError here would be the other
    documented option; the fake keeps the e2e path drivable.
    """
    import hashlib

    n = len(payload)
    h = hashlib.md5(payload).hexdigest()
    seed = int(h[:8], 16)
    if media_type == "image":
        return {"width": 64 + seed % 512, "height": 64 + (seed >> 9) % 512, "n_frames": 1,
                "duration_sec": 0.0, "checksum": h}
    if media_type == "audio":
        return {"width": 0, "height": 0, "n_frames": n,
                "duration_sec": n / 16_000.0, "checksum": h}
    return {"width": 320, "height": 240, "n_frames": 1 + seed % 300,
            "duration_sec": (1 + seed % 300) / 30.0, "checksum": h}


def mm1_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode pass over media payloads via mapInPandas: Arrow batches
    in, metadata rows out; binary stays executor-local (narrow op,
    zero shuffle). Decode itself is the documented stub."""
    media = media_table(spark, sf_dir)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                d = _fake_decode(payload, row["media_type"])
                out.append({"media_id": row["media_id"], "media_type": row["media_type"],
                            "n_bytes": len(payload), **d})
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, DECODE_SCHEMA)


def mm2_frame_sample(spark: SparkSession, sf_dir: str, every_n: int = 30) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled
    frame index (0, n, 2n, ... plus the last frame) — the A10
    interim-selection pattern applied to frames."""
    decoded = mm1_decode_metadata(spark, sf_dir).where(F.col("media_type") == "video")
    idx = F.explode(
        F.array_distinct(
            F.concat(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
                F.array(F.col("n_frames") - 1),
            )
        )
    )
    return decoded.select("media_id", "n_frames", idx.alias("frame_idx"))


def mm3_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation: bytes and duration per media type.
    Selects only meta fields -> parquet column pruning keeps the
    binary payload out of the scan entirely."""
    media = media_table(spark, sf_dir)
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.min(F.col("meta.n_bytes")).alias("min_bytes"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )


MM3_SQL = """
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       count(*) AS n_items,
       -- octet_length of the utf-8 encoding: the Spark side measures
       -- BYTES of the binary payload, and char length would silently
       -- diverge on any non-ASCII text
       cast(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       cast(min(octet_length(encode(text))) AS BIGINT) AS min_bytes,
       cast(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
GROUP BY 1
"""


OPERATORS = [
    ("mm1_decode_metadata", mm1_decode_metadata, None),  # stubbed decode: rows-only
    ("mm2_frame_sample", mm2_frame_sample, None),        # depends on stub: rows-only
    ("mm3_metadata_stats", mm3_metadata_stats, MM3_SQL),
]
