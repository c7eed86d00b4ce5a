"""Multimodal query registrations: metadata extraction is oracle-checked;
the stubbed decode path is registered rows-only (no SQL equivalent)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import attach_fake_media, decode_image_features, media_metadata
from ..sources.tables import table
from .registry import register


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           'image/png' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash
    FROM documents
    """,
    tags=("MM",),
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata extraction — the multimodal
    column contract (payload pruned, metadata pushed down)."""
    docs = table(spark, sf_dir, "documents")
    return media_metadata(attach_fake_media(docs))


@register("mm_decode_features_stub", oracle=None, tags=("MM", "UDF"))
def mm_decode_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode pipeline (stub kernel — rows-only
    check; the real codec isn't in this container, see multimodal/columns.py).

    The feature vector is reduced to scalar digests here (count + rounded sum)
    because the harness canonicalizes results via pandas sort, which cannot
    order array cells; the array-producing operator itself is
    `multimodal.decode_image_features`.
    """
    docs = table(spark, sf_dir, "documents")
    decoded = decode_image_features(attach_fake_media(docs))
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.size("features").cast("long").alias("n_features"),
        F.round(
            F.aggregate("features", F.lit(0.0), lambda acc, x: acc + x), 3
        ).alias("feature_sum"),
    )
