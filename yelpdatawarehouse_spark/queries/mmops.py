"""Multimodal query registrations: metadata extraction is oracle-checked;
the stubbed decode path is registered rows-only (no SQL equivalent)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    check; the real codec isn't in this container, see multimodal/columns.py)."""
    docs = table(spark, sf_dir, "documents")
    return decode_image_features(attach_fake_media(docs))
