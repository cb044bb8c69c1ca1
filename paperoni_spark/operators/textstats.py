"""Text-analysis operators over a flat ``documents(text)`` corpus.

These are the pipeline-adjacent operators a large-scale training-data build
needs around the extraction kernel: token counting, quality scoring,
language-ID heuristics, and document fingerprinting.  All of them are pure
Catalyst expressions (no Python UDFs): a single scan, map-side computation,
and one partial-aggregated ``groupBy`` — the plan stays in whole-stage
codegen and scales linearly with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for")


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-language token counts (whitespace tokenization)."""
    toks = F.size(tokens_col(F.col("text")))
    return (
        documents.select("lang", toks.alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Per-document quality signals: length, punctuation ratio, stopword
    ratio, mean token length — the standard cheap quality filters."""
    text = F.col("text")
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    punct = n_chars - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.expr(f"size(filter(split(trim(text), '\\\\s+'), t -> t in ({stop_list})))")
    return documents.select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round(punct / n_chars, 6).alias("punct_ratio"),
        F.round(n_stop / n_tokens, 6).alias("stopword_ratio"),
        F.round((n_chars - n_tokens + 1) / n_tokens, 4).alias("mean_token_len"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-presence language-ID heuristic; confusion counts against the
    corpus's labeled ``lang`` column."""
    lower = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    guess = (
        F.when(
            lower.contains(" the ") | lower.contains(" and ") | lower.contains(" of "),
            F.lit("en"),
        )
        .otherwise(F.lit("und"))
    )
    return (
        documents.select("lang", guess.alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .count()
        .withColumnRenamed("count", "n_docs")
    )


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_stats(documents: DataFrame) -> DataFrame:
    """BPE-style regex token counting (letters / digit runs / punct runs —
    a lookaround-free, engine-portable cousin of the GPT-2 pre-tokenizer).
    Training-data budgeting uses these counts; pure map-side + one agg."""
    toks = F.expr(f"regexp_extract_all(text, '{BPE_ISH_PATTERN}', 0)")
    return (
        documents.select(
            "doc_id",
            "lang",
            F.size(toks).alias("n_bpe_tokens"),
            F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
            F.round(F.avg("n_unique_tokens"), 4).alias("avg_unique_tokens"),
        )
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Normalization fingerprint: md5 of lowercased, whitespace-collapsed
    text — the exact-dedup key for near-identical formatting variants."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return documents.select(
        "doc_id", F.md5(normalized).alias("fingerprint"), F.length(normalized).alias("norm_len")
    )
