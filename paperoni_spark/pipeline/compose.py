"""End-to-end training-data pipeline composition.

The full corpus-build shape: extraction → plain-text flattening →
fingerprint/exact-dedup → quality scoring, all as one lazy DataFrame
program (single mapInPandas stage + Catalyst expressions; the only
shuffle after extraction is the dedup digest aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.extract import run_extract


def extracted_text(extracted: DataFrame) -> DataFrame:
    """Flatten the span sequence into one plain-text column per document
    (text spans joined in order; image spans contribute nothing)."""
    text = F.concat_ws(
        " ",
        F.expr("transform(filter(extracted, s -> s.kind = 'text'), s -> s.text)"),
    )
    return extracted.where(F.col("status") == "ok").select(
        "doc_id",
        text.alias("text"),
        F.col("metadata.title").alias("title"),
        F.size(F.expr("filter(extracted, s -> s.kind = 'image')")).alias("n_images"),
    )


def corpus_build(documents: DataFrame, base_url: str = "http://example.com/") -> DataFrame:
    """extract → flatten → normalize-fingerprint → quality signals."""
    flat = extracted_text(run_extract(documents, base_url))
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return flat.select(
        "doc_id",
        "title",
        "n_images",
        F.md5(normalized).alias("fingerprint"),
        F.length(normalized).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
    )


def corpus_dedup_stats(documents: DataFrame) -> DataFrame:
    """Pipeline summary: documents in, unique extracted texts out."""
    built = corpus_build(documents)
    return built.agg(
        F.count("*").alias("docs_ok"),
        F.countDistinct("fingerprint").alias("unique_texts"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_images").alias("total_images"),
    )
