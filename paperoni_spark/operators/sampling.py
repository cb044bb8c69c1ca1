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
    """fraction -> 8-hex-digit lexicographic cutoff (floor(f * 16^8))."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction out of range: {fraction}")
    return format(min(int(fraction * 16**8), 16**8 - 1), "08x")


def hash_sample(
    documents: DataFrame, fraction: float = 0.2, salt: str = SAMPLE_SALT
) -> DataFrame:
    """Keep each document iff the first 8 hex chars of ``md5(salt||doc_id)``
    fall below the fraction cutoff."""
    key = F.substring(F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 8)
    return documents.where(key < F.lit(_cutoff_hex(fraction)))


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
    key = F.substring(F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 8)
    cutoff = F.lit(_cutoff_hex(default_fraction))
    for stratum, fraction in sorted(fractions.items()):
        cutoff = F.when(
            F.col(stratum_col) == stratum, F.lit(_cutoff_hex(fraction))
        ).otherwise(cutoff)
    return documents.where(key < cutoff)
