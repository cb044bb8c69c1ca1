"""Deterministic corpus sampling for training-data pipelines.

Random sampling (``df.sample`` / ``sampleBy``) is RNG-seeded per task and
therefore neither reproducible across engines nor stable under
repartitioning — unacceptable for a corpus that must be rebuildable
bit-for-bit.  Hash sampling decides membership from ``md5(salt || doc_id)``
alone: pure map-side, no shuffle, identical on any engine and any
partitioning, and refreshable by salt rotation.  The selection predicate is
a lexicographic compare of the digest's first 8 hex chars against a literal
cutoff — no integer conversion, so the DuckDB oracle is the same one-liner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SAMPLE_SALT = "sample:"


def _cutoff_hex(fraction: float) -> str:
    """fraction -> lexicographic cutoff for an 8-hex-char key (strict <).
    fraction >= 1.0 returns 'g', which every hex key sorts below — a plain
    'ffffffff' cutoff would silently drop keys equal to it (~1 in 4.3e9
    docs, ~233 at 10^12 scale)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction out of range: {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * 16**8), "08x")


def sample_key(salt: str = SAMPLE_SALT):
    """The 8-hex-char membership key: md5(salt || doc_id).  Single source
    of truth — the DuckDB oracles mirror this expression verbatim."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 8
    )


def hash_sample(
    documents: DataFrame, fraction: float = 0.2, salt: str = SAMPLE_SALT
) -> DataFrame:
    """Keep each document iff the first 8 hex chars of ``md5(salt||doc_id)``
    fall below the fraction cutoff."""
    return documents.where(sample_key(salt) < F.lit(_cutoff_hex(fraction)))


def token_budget_sample(
    documents: DataFrame,
    budget_per_lang: dict[str, int],
    default_budget: int = 0,
    salt: str = SAMPLE_SALT,
) -> DataFrame:
    """Take documents per language until a token budget is filled — the
    training-mix primitive ("20B English tokens, 5B code tokens, ...").

    Selection order is the md5 hash of the doc id (deterministic,
    shuffle-independent, salt-rotatable), with doc_id as the tie-break;
    a cumulative token sum per language cuts at the budget.  One window
    shuffle partitioned by language; at cluster scale strata are large, so
    pre-aggregate per (lang, key-prefix) ranges or use an approximate
    quantile cut if a single stratum exceeds one executor's window."""
    from .textstats import tokens_col

    toks = F.size(tokens_col(F.col("text")))
    key = F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("lang")
        .orderBy(key.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.lit(default_budget)
    for lang, b in sorted(budget_per_lang.items()):
        budget = F.when(F.col("lang") == lang, F.lit(b)).otherwise(budget)
    return (
        documents.select("doc_id", "lang", toks.alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= budget)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


def stratified_hash_sample(
    documents: DataFrame,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    stratum_col: str = "lang",
    salt: str = SAMPLE_SALT,
) -> DataFrame:
    """Per-stratum hash sampling (e.g. language rebalancing for a training
    mix): each stratum gets its own cutoff; unknown strata fall back to
    ``default_fraction``.  Still pure map-side."""
    key = sample_key(salt)
    cutoff = F.lit(_cutoff_hex(default_fraction))
    for stratum, fraction in sorted(fractions.items()):
        cutoff = F.when(
            F.col(stratum_col) == stratum, F.lit(_cutoff_hex(fraction))
        ).otherwise(cutoff)
    return documents.where(key < cutoff)
