"""Multimodal column support: opaque binary payloads + typed metadata.

Pattern: an asset table with a `binary` content column and typed
metadata columns; decode / feature-extraction runs as Arrow-batched
mapInPandas stages. The image/audio codecs aren't available in this
container, so the decode kernels are STUBBED behind try-imports with a
deterministic fallback — the Spark-side plumbing (schema, batching,
partition layout) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),   # image|audio|video
    T.StructField("content", T.BinaryType(), True),     # opaque payload
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    T.StructField("decode_ok", T.BooleanType(), False),
])


def synthesize_assets(documents: DataFrame) -> DataFrame:
    """Build a deterministic asset table from the documents fixture:
    the utf-8 text bytes act as the opaque payload."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("modality"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


def _decode_image(payload: bytes) -> list[float]:
    """Stub decode kernel. Real deployments plug PIL/opencv here."""
    try:
        import PIL.Image  # noqa: F401  (not present in this container)
        raise NotImplementedError("real image decode not wired")
    except ImportError:
        # deterministic fake: byte histogram over 8 buckets, normalized
        if not payload:
            return [0.0] * 8
        hist = [0] * 8
        for b in payload:
            hist[b % 8] += 1
        n = float(len(payload))
        return [h / n for h in hist]


def extract_features(assets: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. The
    mapInPandas shape (schema, batch iteration, per-partition work) is
    the real production pattern; only the decode kernel is stubbed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok, nb = [], [], []
            for payload in pdf["content"]:
                raw = bytes(payload) if payload is not None else b""
                nb.append(len(raw))
                try:
                    feats.append(_decode_image(raw))
                    ok.append(True)
                except NotImplementedError:
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": nb,
                "feature": feats,
                "decode_ok": ok,
            })

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode —
    pure relational expansion (sequence+explode), ready to feed a
    decode stage. Demonstrates bounded fan-out at scale."""
    frames = F.sequence(F.lit(0), F.greatest(
        (F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0)))
    return (assets.where(F.col("modality") == "video")
            .select("asset_id",
                    F.explode(frames).alias("frame_idx"))
            .withColumn("t_ms", F.col("frame_idx") * every_ms))
